"""A/B: layout-alignment ceiling per U-Net region (shape mocks).

The circular-mode U-FNO runs its mini-U-Net at odd spatial sizes
(126/124/63/61/59 down+mid, 134/132/130 up) — BASELINE.md's device profile
attributes ~15% of the step to layout copies and the round-1 full-'ones'
A/B measured ~20% headroom. Before building an exact semantics-preserving
aligned path, this tool measures WHERE that headroom lives by forcing
'ones' conv geometry (shape mock, NOT semantics-preserving — throwaway)
per region via unet_modern._MOCK_ONES_ROLES:

  base      — shipped circular geometry
  down      — DownBlocks + Downsample aligned (128/64 down path)
  down+mid  — + MiddleBlock
  all       — + UpBlocks, Upsample (no pre-pad), final conv

Run on the real chip: python tools/bench_align_ab.py
"""

import json
import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nps_tpu.models.unet_modern as um  # noqa: E402

VARIANTS = [
    ("base", set()),
    ("down", {"down", "downsample"}),
    ("down+mid", {"down", "downsample", "mid"}),
    ("all", {"down", "downsample", "mid", "up", "upsample", "final"}),
]


def main():
    from bench import build_trainer, bench_depth

    results = {}
    for name, roles in VARIANTS:
        um._MOCK_ONES_ROLES.clear()
        um._MOCK_ONES_ROLES.update(roles)
        trainer, device_batch = build_trainer()
        sps, flops, dt = bench_depth(trainer, device_batch, 1, n_steps=10)
        results[name] = round(sps, 3)
        print(f"{name:10s}: {sps:8.3f} samples/s  ({dt * 1e3:.1f} ms/step)",
              flush=True)
    um._MOCK_ONES_ROLES.clear()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
