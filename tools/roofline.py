"""Roofline decomposition of the headline U-FNO depth-1 train step.

VERDICT round-2 item 2 asked to either break the MFU-0.236 "floor" or
prove it. The lane-aligned layout lead measured FLAT (tools/bench_align_ab.py),
so this tool proves the floor: it AOT-compiles the exact shipped train step
(cfg_twophase_ufno shape, batch 16, 128^2, bf16, no-remat — the same
executable bench.py times) against the v5e target and extracts XLA's
post-optimization cost analysis:

  - flops             → MXU-time floor   t_mxu = flops / 197e12  (bf16 peak)
  - bytes accessed    → HBM-time floor   t_hbm = bytes / 819e9   (v5e HBM BW)

The post-fusion "bytes accessed" is the HBM traffic of the optimized HLO
(operands + outputs per fusion, i.e. what actually crosses HBM after XLA
merged elementwise chains into the convs), so t_hbm is a genuine lower
bound for THIS program on this chip; max(t_mxu, t_hbm) assumes perfect
DMA/compute overlap and zero scheduling gaps — unattainable in practice.
Prints one JSON line with the floors vs the measured step time.

Run: python tools/roofline.py  (compiles on the axon chip; cached)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12   # FLOP/s
V5E_HBM_BW = 819e9       # B/s
# bench.py depth-1, batch 16. Override with argv[1] (ms) to pair the
# cost analysis with the measurement of the CURRENT program — the
# default is the shipped GELUTanh step (461 ms, BASELINE.md); the round-3
# erf analysis used 578 ms against the then-shipped exact-GELU step.
MEASURED_STEP_S = (float(sys.argv[1]) / 1e3 if len(sys.argv) > 1
                   else 0.461)

TW, NX, BATCH = 25, 128, 16
MAX_UNROLL = 8
T_RES = TW * (MAX_UNROLL + 2) + 1


def main():
    import jax

    import bench

    trainer, device_batch = bench.build_trainer()
    u_traj, pos, cond, t_cond, sc = device_batch
    fn = trainer._make_train_step(1, BATCH, int(u_traj.shape[2]))
    compiled = fn.lower(trainer.params, trainer.opt_state, u_traj, pos,
                        cond, t_cond, sc, jax.random.PRNGKey(0)).compile()
    cost = compiled.cost_analysis()
    c = cost[0] if isinstance(cost, (list, tuple)) else cost

    flops = float(c.get("flops", 0.0))
    byte_keys = {k: float(v) for k, v in c.items()
                 if "bytes accessed" in k}
    bytes_total = byte_keys.get("bytes accessed", 0.0)
    t_mxu = flops / V5E_BF16_PEAK
    t_hbm = bytes_total / V5E_HBM_BW
    floor = max(t_mxu, t_hbm)
    out = dict(
        flops_T=round(flops / 1e12, 3),
        bytes_GiB=round(bytes_total / 2**30, 3),
        t_mxu_ms=round(t_mxu * 1e3, 1),
        t_hbm_ms=round(t_hbm * 1e3, 1),
        floor_ms=round(floor * 1e3, 1),
        measured_ms=MEASURED_STEP_S * 1e3,
        x_over_floor=round(MEASURED_STEP_S / floor, 2),
        mfu_at_floor=round(flops / floor / V5E_BF16_PEAK, 3),
        byte_keys={k: round(v / 2**30, 3) for k, v in byte_keys.items()},
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
