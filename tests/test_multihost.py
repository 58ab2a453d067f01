"""Multi-host input sharding + preemption-safe shutdown.

Multi-process JAX cannot be spawned in this harness, so the multihost
loader logic is tested with injected (process_index, process_count) — the
property that matters is that the per-process streams are an exact
partition of the single-process stream — and the global-array assembly is
tested in the degenerate single-process case where local == global.
"""

import os
import signal

import numpy as np
import pytest
import jax

from nps_tpu.data.pipeline import HostDataLoader, device_put_batch
from nps_tpu.parallel import (assemble_global_batch, batch_sharding,
                              make_mesh, process_slice,
                              shard_indices_for_process)


class _FakeDataset:
    """Index-able dataset of 6-tuples whose payload encodes the index."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        u = np.full((1, 4, 3, 3), float(i), np.float32)
        empty = np.zeros((0,), np.float32)
        return (empty, u, np.zeros((3, 3, 3), np.float32),
                np.array([float(i)], np.float32), empty, empty)


def test_process_slice_partitions():
    for n in (16, 17, 23):
        for p in (1, 2, 4):
            slices = [process_slice(n, i, p) for i in range(p)]
            # contiguous, disjoint, equal-sized, cover the trimmed prefix
            assert slices[0][0] == 0
            for (a0, a1), (b0, b1) in zip(slices, slices[1:]):
                assert a1 == b0 and (a1 - a0) == (b1 - b0)
            assert slices[-1][1] == n - n % p


def test_shard_indices_deterministic():
    idx = np.arange(10, 30)
    parts = [shard_indices_for_process(idx, i, 4) for i in range(4)]
    np.testing.assert_array_equal(np.concatenate(parts), idx)


@pytest.mark.parametrize("n,bs,p", [(19, 8, 4), (16, 4, 2), (10, 4, 4)])
def test_loader_shards_partition_global_stream(n, bs, p):
    """P loaders with the shared seed yield, per batch, slices that
    concatenate to the P=1 loader's (trimmed) global batch."""
    ds = _FakeDataset(n)
    global_loader = HostDataLoader(ds, bs, shuffle=True, seed=7,
                                   process_index=0, process_count=1)
    shard_loaders = [HostDataLoader(ds, bs, shuffle=True, seed=7,
                                    process_index=i, process_count=p,
                                    global_multiple=p) for i in range(p)]
    assert len({len(l) for l in shard_loaders}) == 1  # fleet-consistent
    streams = [list(l) for l in shard_loaders]
    global_batches = list(global_loader)
    assert len(streams[0]) == len(shard_loaders[0])
    for k, parts in enumerate(zip(*streams)):
        merged = np.concatenate([b[1] for b in parts], axis=0)
        expect = global_batches[k][1]
        trimmed = expect[:expect.shape[0] - expect.shape[0] % p]
        np.testing.assert_array_equal(merged, trimmed)
        # per-process shard sizes match and conditioning follows the field
        merged_c = np.concatenate([b[3] for b in parts], axis=0)
        np.testing.assert_array_equal(merged_c[:, 0], trimmed[:, 0, 0, 0, 0])


def test_loader_len_matches_iteration():
    ds = _FakeDataset(13)
    for bs, p, gm in ((4, 1, None), (4, 2, 2), (8, 4, 8)):
        l = HostDataLoader(ds, bs, shuffle=False, process_index=0,
                           process_count=p, global_multiple=gm)
        assert len(list(l)) == len(l)


def test_assemble_global_batch_single_process():
    """Degenerate P=1 case: assembly == plain sharded device_put."""
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    u = np.arange(8 * 2 * 3, dtype=np.float32).reshape(8, 2, 3)
    empty = np.zeros((8, 0), np.float32)
    got = assemble_global_batch((empty, u), sharding)
    assert got[1].shape == u.shape
    assert got[1].sharding == sharding
    np.testing.assert_array_equal(np.asarray(got[1]), u)
    np.testing.assert_array_equal(np.asarray(got[0]), empty)
    # device_put_batch stays on the single-process fast path here
    via_put = device_put_batch((empty, u), sharding)
    np.testing.assert_array_equal(np.asarray(via_put[1]), np.asarray(got[1]))


def test_assemble_global_batch_rejects_indivisible():
    mesh = make_mesh()
    sharding = batch_sharding(mesh)
    bad = np.zeros((6, 2), np.float32)  # 6 does not divide 8 devices
    with pytest.raises(ValueError, match="does not divide"):
        assemble_global_batch((bad,), sharding)


def test_assemble_global_grid_batch_single_process():
    """Degenerate P=1 case on the ("data","x") grid mesh: field tensors
    come back x-sharded exactly like GridBatchSharding.shard_batch."""
    from nps_tpu.parallel import GridBatchSharding, make_grid_mesh
    from nps_tpu.parallel.multihost import assemble_global_grid_batch

    mesh = make_grid_mesh(2)
    gs = GridBatchSharding(mesh)
    b, nx = 8, 4
    u = np.arange(b * 1 * 3 * nx * nx, dtype=np.float32).reshape(
        b, 1, 3, nx, nx)
    x = np.zeros((b, nx, nx, 2), np.float32)
    cond = np.ones((b, 2), np.float32)
    empty = np.zeros((b, 0), np.float32)
    batch = (np.zeros((0,), np.float32), u, x, cond, empty, empty)
    got = assemble_global_grid_batch(batch, gs)
    ref = gs.shard_batch(batch)
    for g, r in zip(got[1:], ref[1:]):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        if np.asarray(g).size:  # empties: shard_batch leaves them
            assert g.sharding.spec == r.sharding.spec, \
                (g.sharding, r.sharding)  # single-device, assembly replicates
    # the u field actually sharded its X axis over "x"
    assert "x" in str(got[1].sharding.spec)


def test_grid_mesh_process_layout_validation(monkeypatch):
    """Multi-host spatial preconditions fail loudly: the data axis must
    split over processes and x-rows must stay within a process."""
    from nps_tpu.parallel import make_grid_mesh
    from nps_tpu.parallel.multihost import validate_grid_mesh_process_layout

    mesh = make_grid_mesh(2)  # 8 devices -> data=4, x=2
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    with pytest.raises(ValueError, match="multiple of the process count"):
        validate_grid_mesh_process_layout(mesh)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "local_device_count", lambda: 3)
    with pytest.raises(ValueError, match="divide the per-process"):
        validate_grid_mesh_process_layout(mesh)
    monkeypatch.setattr(jax, "local_device_count", lambda: 4)
    validate_grid_mesh_process_layout(mesh)  # data=4 over 2 procs: OK


def test_loader_rejects_batch_below_multiple():
    with pytest.raises(ValueError, match="trim to zero"):
        HostDataLoader(_FakeDataset(16), 2, process_index=0,
                       process_count=4, global_multiple=4)


def test_multiprocess_without_mesh_rejected(dataset, tmp_path, monkeypatch):
    """Simulated 2-process run without a mesh must fail loudly instead of
    silently training divergent models."""
    tr = _make_trainer(dataset, str(tmp_path / "m3"), num_epochs=1)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="requires a device mesh"):
        tr.get_dataloaders()


# ---------------------------------------------------------------------------
# preemption-safe shutdown
# ---------------------------------------------------------------------------

TW = 5
NT = 41
NX1, NX2 = 24, 16


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from nps_tpu.data.pde2d import PDE2DDataset
    from nps_tpu.data.synthetic import generate

    d = tmp_path_factory.mktemp("twophase_mh")
    generate(str(d), n_sims=8, n_channels=3, nt=NT, nx1=NX1, nx2=NX2, seed=5)
    return PDE2DDataset(
        base_path=str(d.parent), experiment=d.name, data_format="memmap",
        data_file="snapshots", conditioning="conditioning",
        spatial_conditioning="spatial_conditioning", split_file="split",
        c_filter=[2], name="twophase")


def _make_trainer(dataset, save_path, num_epochs, epoch_callback=None,
                  resume=False):
    import nps_tpu.models as models
    from nps_tpu.models.activations import GELU
    from nps_tpu.train import (AutoregressivePushforwardTrainer,
                               build_criterion)

    model = models.EncProcDec(
        num_c=1, num_spatial_dims=2, time_window=TW,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="DilatedResnet", kernel_size=3, hidden_blocks=1,
        hidden_features=8, padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path=save_path, time_window=TW,
        base_resolution=(NT, NX1, NX2), super_resolution=(NT, NX1, NX2),
        device="cpu", batch_size=4, nr_gt_steps=1, nw=0,
        num_epochs=num_epochs, lr_step_interval=100, unrolling=0,
        print_interval=100, test_interval=2, process_settings={},
        epoch_callback=epoch_callback, resume=resume)


def test_sigterm_checkpoints_and_resume_completes(dataset, tmp_path):
    """SIGTERM mid-run -> graceful checkpoint + early return; a second
    trainer with resume=True continues from the saved epoch to the end."""
    save_path = str(tmp_path / "model")

    def kill_after_epoch(trainer, loader, epoch):
        if epoch == 1:
            os.kill(os.getpid(), signal.SIGTERM)

    tr = _make_trainer(dataset, save_path, num_epochs=5,
                       epoch_callback=kill_after_epoch)
    train_losses, _, _ = tr.train()
    assert tr.preempted
    # epoch 1's callback fired the signal after the epoch finished ->
    # losses for epochs 0 and 1 are kept, epoch 2 never ran a step
    assert len(train_losses) == 2
    ckpt = save_path + "_checkpoint.pkl"
    assert os.path.exists(ckpt)
    # handlers restored to the pre-train() disposition (pytest: SIG_DFL)
    assert signal.getsignal(signal.SIGTERM) == signal.SIG_DFL

    tr2 = _make_trainer(dataset, save_path, num_epochs=5, resume=True)
    losses2, _, _ = tr2.train()
    assert not tr2.preempted
    assert tr2.start_epoch == 2
    assert len(losses2) == 3  # epochs 2, 3, 4
    assert os.path.exists(save_path + "_final.msgpack")


def test_preempt_flag_stops_epoch_without_steps(dataset, tmp_path):
    """The batch-boundary check halts an epoch before any further step."""
    tr = _make_trainer(dataset, str(tmp_path / "m2"), num_epochs=1)
    loaders = tr.get_dataloaders()
    tr.ensure_initialized(loaders[0])
    tr._preempt_requested = True
    loss, n_samples = tr.train_one_epoch(loaders[0], 0)
    assert n_samples == 0


def test_eval_only_cli(dataset, tmp_path):
    """--trainer.eval_only evaluates without training and writes the eval
    summary pickle (in-process CLI, mirrors test_gnn_cli_end_to_end)."""
    import pickle
    import sys

    from nps_tpu.configs.parse import parse_args
    from nps_tpu.data.synthetic import generate
    from nps_tpu.train_cli import main

    d = tmp_path / "twophase"
    generate(str(d), n_sims=6, n_channels=7, nt=21, nx1=8, nx2=6, seed=3)
    old = sys.argv
    try:
        sys.argv = [
            "prog", "-C", "nps_tpu/configs/train/cfg_twophase_drn.py",
            "--base_resolution=[21,8,6]", "--super_resolution=[21,8,6]",
            "--time_window=5", "--batch_size=2",
            f"--dataset.base_path={tmp_path}",
            "--model.hidden_features=8", "--model.hidden_blocks=1",
            "--trainer.device=cpu", "--trainer.eval_only=true",
            f"--experiment_path={tmp_path / 'out'}",
            "--experiment_name=evalonly",
        ]
        args = parse_args()
    finally:
        sys.argv = old
    main(args)
    p = tmp_path / "out" / "evalonly_eval_summary.pickle"
    assert p.exists()
    with open(p, "rb") as f:
        summary = pickle.load(f)
    assert set(summary) == {"default/valid", "default/test"}
    for v in summary.values():
        assert np.isfinite(v["loss"])
    # no training artifacts were produced
    assert not (tmp_path / "out" / "evalonly_final.msgpack").exists()


def test_checkpoint_interval_independent_of_test_interval(dataset, tmp_path):
    """checkpoint_interval < test_interval checkpoints on its own schedule
    (regression: the check used to be nested in the test_interval block)."""
    tr = _make_trainer(dataset, str(tmp_path / "ck"), num_epochs=3)
    tr.config.checkpoint_interval = 1
    tr.config.test_interval = 100  # no validation inside this run
    tr.train()
    import pickle

    with open(str(tmp_path / "ck") + "_checkpoint.pkl", "rb") as f:
        assert pickle.load(f)["epoch"] == 3
