"""A/B: depth-generic dynamic-trip-count train step vs the static per-depth
step (VERDICT r4 item 1).

The static builder compiles one XLA program per pushforward depth — ~8
fresh remote compiles at 300-400 s each over a 500-epoch ramp
(BASELINE.md "Compile-ahead measured at fresh shapes"). The dynamic
builder traces the depth as a ``lax.fori_loop`` trip count so ONE compile
serves the whole ramp. This measures, on the real chip, through the exact
bench step (bench.build_trainer):

1. compile wall of the single dynamic step vs one static depth;
2. steady-state step rate of both arms at the requested depths — the
   ship gate is the dynamic arm being ≈neutral per step (the compile-tax
   win is then pure).

Usage: python tools/bench_dynamic_unroll.py [n_steps] [depths]
  depths: comma list (default "1,8,0")

Every completed stage prints one line, so a timeout mid-run still leaves
evidence; a final JSON summary line prints at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_depth, build_trainer  # noqa: E402


def bench_dynamic(trainer, device_batch, depths, n_steps=8):
    """Compile the dynamic step ONCE; time it at each depth."""
    import numpy as np
    import jax

    u_traj, pos, cond, t_cond, sc = device_batch
    batch = u_traj.shape[0]
    t_res = u_traj.shape[2]
    fn = trainer._make_train_step_dynamic(batch, t_res)
    t0 = time.monotonic()
    exe = fn.lower(trainer.params, trainer.opt_state, u_traj, pos, cond,
                   t_cond, sc, jax.random.PRNGKey(0),
                   np.int32(0)).compile()
    compile_s = time.monotonic() - t0

    rates = {}
    params, opt_state = trainer.params, trainer.opt_state
    for depth in depths:
        d = np.int32(depth)
        for i in range(2):  # warmup (executable already built)
            params, opt_state, loss = exe(params, opt_state, u_traj, pos,
                                          cond, t_cond, sc,
                                          jax.random.PRNGKey(i), d)
        float(loss)  # sync (block_until_ready is a no-op on axon)
        n = n_steps if depth < 8 else max(n_steps // 2, 2)
        t0 = time.perf_counter()
        for i in range(n):
            params, opt_state, loss = exe(params, opt_state, u_traj, pos,
                                          cond, t_cond, sc,
                                          jax.random.PRNGKey(100 + i), d)
        float(loss)
        dt = (time.perf_counter() - t0) / n
        rates[depth] = (batch / dt, dt)
    trainer.params, trainer.opt_state = params, opt_state
    return rates, compile_s


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    depths = ([int(d) for d in sys.argv[2].split(",")]
              if len(sys.argv) > 2 else [1, 8, 0])
    from nps_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    out = {}

    trainer, device_batch = build_trainer()
    rates, compile_s = bench_dynamic(trainer, device_batch, depths,
                                     n_steps=n_steps)
    out["dynamic_compile_s"] = round(compile_s, 1)
    print(f"dynamic step compiled ONCE in {compile_s:.0f}s", flush=True)
    for depth, (sps, dt) in rates.items():
        out[f"dynamic_depth{depth}_samples_per_sec"] = round(sps, 3)
        print(f"dynamic depth {depth}: {sps:.2f} samples/s "
              f"({dt*1e3:.1f} ms/step)", flush=True)

    for depth in depths:
        t0 = time.monotonic()
        sps, _flops, dt = bench_depth(trainer, device_batch, depth,
                                      n_steps=n_steps)
        out[f"static_depth{depth}_samples_per_sec"] = round(sps, 3)
        out[f"static_depth{depth}_stage_wall_s"] = round(
            time.monotonic() - t0, 1)
        print(f"static depth {depth}: {sps:.2f} samples/s "
              f"({dt*1e3:.1f} ms/step; stage wall incl compile "
              f"{time.monotonic()-t0:.0f}s)", flush=True)
        dyn = out.get(f"dynamic_depth{depth}_samples_per_sec")
        if dyn:
            out[f"depth{depth}_dyn_over_static"] = round(dyn / sps, 4)
            print(f"  dyn/static @ depth {depth}: {dyn/sps:.4f}", flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
