"""Depth-1 U-FNO shipped-trainer step only — the headline number, without
compiling the depth-0/8/rollout programs bench.py also times.

Used for single-variable A/Bs where each variant pays a fresh ~20 min
remote compile (e.g. NPS_GN_STATS=mxu python tools/bench_depth1.py).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    trainer, device_batch = bench.build_trainer()
    sps, flops, dt = bench.bench_depth(trainer, device_batch, 1, n_steps=20)
    mfu = flops / dt / bench.V5E_BF16_PEAK_FLOPS if flops else None
    print(json.dumps({
        "depth1_samples_per_sec": round(sps, 3),
        "ms_per_step": round(dt * 1e3, 1),
        "mfu": round(mfu, 4) if mfu else None,
        "gn_stats": os.environ.get("NPS_GN_STATS", "reduce"),
    }))


if __name__ == "__main__":
    main()
