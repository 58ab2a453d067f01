"""Validate the jax.export serving artifact on the real TPU (axon tunnel).

Answers the one question CPU tests can't: does an artifact exported with
``platforms=("cpu", "tpu")`` execute on the axon-tunneled chip (i.e. does
the PJRT platform name satisfy the export-time platform check)? If the
plugin reports a non-"tpu" platform name, fall back to an export with the
platform safety check disabled and record which variant serves.

Run via tools/run_chip_queue.sh; prints one verdict line per variant.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device platform: {dev.platform!r}")

    from nps_tpu.inference import SurrogateEngine, load_exported
    from nps_tpu.pde import PDE2D

    pde = PDE2D(tmin=0, tmax=10, nt=21, L1=1.0, L2=1.0, nx1=16, nx2=16,
                x=None, name="twophase", n_cond_static=2, n_cond_spatial=2)
    eng = SurrogateEngine.from_config(
        "nps_tpu/configs/train/cfg_twophase_drn.py", pde=pde,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1",
                   "--time_window=5", "--base_resolution=[21,16,16]"])
    rng = np.random.default_rng(0)
    u0 = (rng.random((2, 1, 5, 16, 16)) * 0.9).astype(np.float32)
    cond = rng.random((2, 2)).astype(np.float32)
    sc = np.zeros((2, 2, 16, 16), np.float32)
    eng.init_params(u0, cond=cond, spatial_cond=sc)
    ref = eng.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)

    for tag, kwargs in (
            ("platforms=cpu+tpu", dict(platforms=("cpu", "tpu"))),
            ("platform-check-disabled", dict(platforms=("cpu", "tpu"),
                                             disable_platform_check=True))):
        path = f"/tmp/export_tpu_{tag.replace('=', '_').replace('+', '_')}.npsx"
        try:
            eng.export_rollout(path, n_steps=2, example_u0=u0, cond=cond,
                               spatial_cond=sc, **kwargs)
            art = load_exported(path)
            out = art.rollout(u0, cond=cond, spatial_cond=sc)
            ok = np.allclose(out, ref, rtol=1e-3, atol=1e-4)
            print(f"EXPORT_TPU {tag}: served ok={ok} "
                  f"max|d|={float(np.abs(out - ref).max()):.2e}")
            if ok:
                break  # first working variant is the verdict
        except Exception as e:  # noqa: BLE001 — verdict line, not a crash
            print(f"EXPORT_TPU {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
