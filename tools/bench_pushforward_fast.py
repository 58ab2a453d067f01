"""A/B: --trainer.pushforward_fast on the shipped U-FNO train step.

The depth-8 / ramp-weighted regime is bounded by the no-grad pushforward
scan body (9 model applies per step, BASELINE.md "Remaining leads" item 3).
pushforward_fast swaps the body's GroupNorm statistics to bf16 and GELU to
the tanh approximation at trace time (models/config.py fast_forward_scope).
This measures THROUGHPUT of both arms at the requested depths through the
exact bench step (bench.build_trainer / bench.bench_depth). Numerical
safety of the fast body is covered separately: the swap only affects the
no-grad scan (next-window inputs, never a gradient path), and
tests/test_pushforward_fast-style parity plus the BASELINE.md round-4
A/B record carry that evidence — this tool does not re-measure loss
trajectories.

Usage: python tools/bench_pushforward_fast.py [n_steps] [arms] [depths]
  arms:   comma list of exact,fast   (default "exact,fast")
  depths: comma list of ints         (default "8,1" — the depth-8 regime
          is the lever; measure it first so a timeout still captures it)

A timeout mid-run leaves every completed stage printed (one line each),
so partial runs are still evidence; re-runs hit the persistent compile
cache for completed stages.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import bench_depth, build_trainer  # noqa: E402


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    arms = (sys.argv[2].split(",") if len(sys.argv) > 2
            else ["exact", "fast"])
    depths = ([int(d) for d in sys.argv[3].split(",")]
              if len(sys.argv) > 3 else [8, 1])
    from nps_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    out = {}
    for tag in arms:
        fast = tag == "fast"
        trainer, device_batch = build_trainer(
            trainer_kwargs=dict(pushforward_fast=fast))
        for depth in depths:
            t0 = time.monotonic()
            sps, flops, dt = bench_depth(trainer, device_batch, depth,
                                         n_steps=n_steps)
            out[f"{tag}_depth{depth}_samples_per_sec"] = round(sps, 3)
            out[f"{tag}_depth{depth}_ms_per_step"] = round(dt * 1e3, 1)
            print(f"{tag} depth {depth}: {sps:.2f} samples/s "
                  f"({dt*1e3:.1f} ms/step; stage wall "
                  f"{time.monotonic()-t0:.0f}s)", flush=True)
    for depth in depths:
        a = out.get(f"exact_depth{depth}_samples_per_sec")
        b = out.get(f"fast_depth{depth}_samples_per_sec")
        if a and b:
            out[f"depth{depth}_speedup"] = round(b / a, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
