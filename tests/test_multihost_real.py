"""REAL multi-process execution of the shipped trainer (VERDICT r3 #4).

Two actual JAX processes (CPU backend, 4 virtual devices each, Gloo
collectives via ``jax.distributed.initialize``) run
``TrainInterface.train()`` with ``data_parallel=True``:

1. both processes compute identical global losses; checkpoints / exports /
   metrics are written by process 0 ONLY (``_is_writer_process`` +
   ``_host_fetch``'s fleet-wide allgather execute with process_count=2);
2. SIGTERM delivered to ONE process makes BOTH checkpoint-and-exit
   (``_preempt_fleet_agreed``'s allgather at the batch boundary is the
   fleet stop decision — a bug there is a production hang).
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from nps_tpu.data.synthetic import generate

    d = tmp_path_factory.mktemp("mhds")
    # splits 64/8/8: every split batch-divisible by the 8-device mesh
    generate(str(d / "twophase"), n_sims=80, n_channels=2, nt=21, nx1=16,
             nx2=16, seed=13)
    return str(d)


def _spawn(pid, port, dataset_dir, out, epochs, test_interval,
           extra_args=()):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "mh_worker.py"),
         "--pid", str(pid), "--port", str(port), "--data", dataset_dir,
         "--out", out, "--epochs", str(epochs),
         "--test-interval", str(test_interval), *extra_args],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)


def _result_line(out_bytes):
    for line in out_bytes.decode().splitlines():
        if line.startswith("MH_RESULT "):
            return json.loads(line[len("MH_RESULT "):])
    raise AssertionError(
        "worker printed no MH_RESULT line; output tail:\n"
        + "\n".join(out_bytes.decode().splitlines()[-25:]))


def test_two_process_training_losses_equal_and_writer_guard(dataset_dir,
                                                            tmp_path):
    port = _free_port()
    out = str(tmp_path)
    procs = [_spawn(i, port, dataset_dir, out, epochs=2, test_interval=2)
             for i in range(2)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    res = [_result_line(o) for o in outs]
    assert all(r["n_processes"] == 2 for r in res)
    assert all(r["n_global_devices"] == 8 for r in res)
    # the jitted DP step returns the GLOBAL loss on every process
    np.testing.assert_allclose(res[0]["train_losses"],
                               res[1]["train_losses"], rtol=1e-6)
    assert all(np.isfinite(res[0]["train_losses"]))
    assert not res[0]["preempted"] and not res[1]["preempted"]
    # writer guard: process 0's save dir has artifacts, process 1's none
    p0_files = os.listdir(os.path.join(out, "p0"))
    assert any(f.endswith(".msgpack") for f in p0_files), p0_files
    assert any("metrics.jsonl" in f for f in p0_files), p0_files
    p1 = os.path.join(out, "p1")
    assert not os.path.exists(p1) or not os.listdir(p1)


def test_two_process_spatial_parallel_training(dataset_dir, tmp_path):
    """REAL 2-process spatial parallelism (VERDICT r4 weak #5): the
    ("data","x") grid mesh spans both processes (data=4 rows x x=2), each
    process feeds its contiguous batch slice at full spatial extent, and
    assemble_global_grid_batch lifts them into x-sharded global arrays.
    Both processes must compute identical finite global losses and the
    writer guard must hold."""
    port = _free_port()
    out = str(tmp_path)
    procs = [_spawn(i, port, dataset_dir, out, epochs=2, test_interval=2,
                    extra_args=("--spatial", "2"))
             for i in range(2)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    res = [_result_line(o) for o in outs]
    assert all(r["n_processes"] == 2 for r in res)
    np.testing.assert_allclose(res[0]["train_losses"],
                               res[1]["train_losses"], rtol=1e-6)
    assert all(np.isfinite(res[0]["train_losses"]))
    v0 = res[0]["val_losses"]["default"]
    v1 = res[1]["val_losses"]["default"]
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    assert np.isfinite(v0).all()
    # writer guard holds on the grid mesh too
    p0_files = os.listdir(os.path.join(out, "p0"))
    assert any(f.endswith(".msgpack") for f in p0_files), p0_files
    p1 = os.path.join(out, "p1")
    assert not os.path.exists(p1) or not os.listdir(p1)


@pytest.fixture(scope="module")
def var_t_dataset_dir(tmp_path_factory):
    from nps_tpu.data.synthetic import generate_var_t

    d = tmp_path_factory.mktemp("mhvart")
    # 56 sims -> split 40/8/8: every eval split divides by the 8-shard
    # global batch, so no eval batch trims to zero
    generate_var_t(str(d / "sim1d"), n_sims=56, n_channels=2, nx=32,
                   t_min=20, t_max=50, seed=11)
    return str(d)


def test_two_process_var_t_training(var_t_dataset_dir, tmp_path):
    """REAL 2-process variable-time training: the synchronized sampler +
    global-extent collate (VariableTimeLoader multi-process path) must
    produce identical finite global losses on both processes, with
    masked evaluation running on batch-sharded global arrays."""
    port = _free_port()
    out = str(tmp_path)
    procs = [_spawn(i, port, var_t_dataset_dir, out, epochs=2,
                    test_interval=2, extra_args=("--var-t",))
             for i in range(2)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    res = [_result_line(o) for o in outs]
    np.testing.assert_allclose(res[0]["train_losses"],
                               res[1]["train_losses"], rtol=1e-6)
    assert all(np.isfinite(res[0]["train_losses"]))
    # masked eval produced a finite validation metric on both processes
    v0 = res[0]["val_losses"]["default"]
    v1 = res[1]["val_losses"]["default"]
    np.testing.assert_allclose(v0, v1, rtol=1e-6)
    assert np.isfinite(v0).all()


def test_cli_distributed_flag_two_processes(dataset_dir, tmp_path):
    """End-to-end CLI bring-up: two `python train.py` processes federated
    by --trainer.distributed=host:port,N,i train together (the launcher
    surface a multi-host user actually runs)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    port = _free_port()

    def spawn(i):
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=4"
                            ).strip()
        return subprocess.Popen(
            [sys.executable, "train.py",
             "-C", "nps_tpu/configs/train/cfg_twophase_drn.py",
             "--base_resolution=[21,16,16]", "--super_resolution=[21,16,16]",
             "--time_window=5", "--batch_size=8",
             f"--dataset.base_path={dataset_dir}", "--dataset.c_filter=[0]",
             "--model.hidden_features=8", "--model.hidden_blocks=1",
             "--model.kernel_size=3", "--model.dec_kernel_size=3",
             "--trainer.num_epochs=2", "--trainer.device=cpu",
             "--trainer.unrolling=1", "--trainer.lr_step_interval=1",
             "--trainer.test_interval=2", "--trainer.data_parallel=true",
             f"--trainer.distributed=localhost:{port},2,{i}",
             f"--experiment_path={tmp_path}/p{i}",
             "--experiment_name=cli_mh"],
            cwd=repo, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)

    procs = [spawn(i) for i in range(2)]
    try:
        outs = [p.communicate(timeout=900)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    texts = [o.decode() for o in outs]
    for p, t in zip(procs, texts):
        assert p.returncode == 0, t[-2000:]
    assert "Distributed: process 0 of 2" in texts[0]
    assert "Distributed: process 1 of 2" in texts[1]
    losses = []
    for t in texts:
        line = [ln for ln in t.splitlines()
                if ln.startswith("Train losses:")][-1]
        losses.append(json.loads(line.split(":", 1)[1]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
    # writer guard through the CLI: only process 0's dir gets artifacts
    assert any(f.endswith(".msgpack")
               for f in os.listdir(os.path.join(str(tmp_path), "p0")))
    p1 = os.path.join(str(tmp_path), "p1")
    assert not os.path.exists(p1) or not any(
        f.endswith(".msgpack") for f in os.listdir(p1))


def test_sigterm_to_one_process_stops_the_fleet(dataset_dir, tmp_path):
    port = _free_port()
    out = str(tmp_path)
    procs = [_spawn(i, port, dataset_dir, out, epochs=200, test_interval=999)
             for i in range(2)]
    metrics = os.path.join(out, "p0", "run_metrics.jsonl")
    try:
        # wait for real training progress (>= 2 completed epochs)
        deadline = time.monotonic() + 600
        while time.monotonic() < deadline:
            if os.path.exists(metrics) and \
                    sum(1 for _ in open(metrics)) >= 2:
                break
            if any(p.poll() is not None for p in procs):
                break
            time.sleep(0.5)
        else:
            raise AssertionError("fleet never reached epoch 2")
        # signal ONLY the NON-writer process; the stop must propagate to
        # process 0 through the batch-boundary allgather
        procs[1].send_signal(signal.SIGTERM)
        outs = [p.communicate(timeout=600)[0] for p in procs]
    finally:
        for p in procs:
            p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode()[-2000:]
    res = [_result_line(o) for o in outs]
    assert res[0]["preempted"] and res[1]["preempted"], res
    # checkpoint written by the writer process only
    p0_files = os.listdir(os.path.join(out, "p0"))
    assert any(f.endswith("_checkpoint.pkl") for f in p0_files), p0_files
    p1 = os.path.join(out, "p1")
    assert not os.path.exists(p1) or not any(
        f.endswith("_checkpoint.pkl") for f in os.listdir(p1))
