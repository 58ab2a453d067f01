"""Serving reproduction from the round-4 convergence run's best checkpoint.

Loads the best msgpack exported by the 500-epoch on-chip production run
(experiments/convergence/) into the public SurrogateEngine, rolls out the
test split from one ground-truth bundle (tw frames) to t_res, and reports
rollout nRMSE vs ground truth — the served counterpart of the trainer's
"Unrolled forward losses" metric, and the direct comparison point to the
round-3 smoke serve (nRMSE_vs_gt=0.744, BASELINE.md "production cycle").

Usage: python tools/serve_convergence.py [n_test_sims]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from nps_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    from nps_tpu.data import PDE2DDataset
    from nps_tpu.inference import SurrogateEngine

    ds = PDE2DDataset(base_path="/tmp/convdata", experiment="twophase",
                      data_format="memmap", data_file="snapshots",
                      conditioning="conditioning",
                      spatial_conditioning="spatial_conditioning",
                      c_filter=[0], split_file="split", name="twophase")
    eng = SurrogateEngine.from_config(
        "nps_tpu/configs/train/cfg_twophase_ufno.py",
        checkpoint="experiments/convergence/conv_ufno_default.msgpack",
        overrides=["--base_resolution=[251,96,64]",
                   "--super_resolution=[251,96,64]",
                   "--model.activation=gelu_tanh",
                   "--trainer.compute_dtype=bfloat16"],
        dataset=ds)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    items = [ds.test[i] for i in range(n)]
    u = np.stack([np.asarray(it[1], np.float32) for it in items])
    cond = np.stack([np.asarray(it[3], np.float32) for it in items])
    sc = np.stack([np.asarray(it[5], np.float32) for it in items])
    tw = eng.tw
    t_res = u.shape[2]
    n_steps = (t_res - tw) // tw
    u0 = u[:, :, :tw]

    t0 = time.monotonic()
    pred = eng.rollout(u0, n_steps, cond=cond, spatial_cond=sc)
    cold = time.monotonic() - t0
    t0 = time.monotonic()
    pred = eng.rollout(u0, n_steps, cond=cond, spatial_cond=sc)
    warm = time.monotonic() - t0

    gt = u[:, :, tw:tw + n_steps * tw]
    err = pred - gt
    nrmse = float(np.sqrt(np.mean(err ** 2)) / np.sqrt(np.mean(gt ** 2)))
    per_sim = [float(np.sqrt(np.mean(err[i] ** 2) / np.mean(gt[i] ** 2)))
               for i in range(n)]
    print(json.dumps(dict(
        n_sims=n, n_steps=n_steps, frames=list(pred.shape),
        finite=bool(np.isfinite(pred).all()),
        nRMSE_vs_gt=round(nrmse, 4),
        per_sim_nRMSE=[round(v, 4) for v in per_sim],
        cold_s=round(cold, 2), warm_s=round(warm, 2))))


if __name__ == "__main__":
    main()
