"""Export a trained surrogate as a self-contained AOT serving artifact.

Config + checkpoint in, one immutable ``jax.export`` StableHLO file out
(params and position grid baked in; serves without model code — see
``nps_tpu/inference.py``). The reference has no serving/export path at all
(checkpoints are consumed by external notebooks, ``src/train.py:22``).

    python tools/export_artifact.py -C nps_tpu/configs/train/cfg_twophase_ufno.py \
        --checkpoint experiments/run_default.msgpack --out surrogate.npsx \
        --n-steps 19 [--platforms cpu,tpu] [--static-batch 8] \
        [any --group.key config overrides]

The artifact is batch-polymorphic unless ``--static-batch`` pins it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-C", "--config", required=True)
    ap.add_argument("--checkpoint", required=True,
                    help=".msgpack export or torch reference .pt")
    ap.add_argument("--out", required=True, help="artifact path (.npsx)")
    ap.add_argument("--n-steps", type=int, required=True,
                    help="rollout steps baked into the artifact")
    ap.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering platforms")
    ap.add_argument("--static-batch", type=int, default=None,
                    help="pin the batch dim instead of exporting symbolic")
    # conditioning counts normally come from the dataset sidecar yaml; the
    # export tool runs dataset-free, so they must be stated to rebuild the
    # PDE metadata the checkpoint was trained with
    ap.add_argument("--n-cond-static", type=int, default=0)
    ap.add_argument("--n-cond-dynamic", type=int, default=0)
    ap.add_argument("--n-cond-spatial", type=int, default=0)
    ns, overrides = ap.parse_known_args(argv)

    import numpy as np

    from nps_tpu.configs.parse import parse_args
    from nps_tpu.inference import SurrogateEngine

    saved_argv = sys.argv
    try:
        sys.argv = ["export_artifact", "-C", ns.config, *overrides]
        args = parse_args()
    finally:
        sys.argv = saved_argv

    from nps_tpu.pde import PDE2D

    t_res, nx1, nx2 = args["trainer"]["base_resolution"]
    pde = PDE2D(tmin=0.0, tmax=1.0, nt=t_res, L1=1.0, L2=nx2 / nx1,
                nx1=nx1, nx2=nx2, x=None,
                name=args["dataset"].get("name", "pde"),
                n_cond_static=ns.n_cond_static,
                n_cond_dynamic=ns.n_cond_dynamic,
                n_cond_spatial=ns.n_cond_spatial)
    eng = SurrogateEngine.from_config(ns.config, checkpoint=ns.checkpoint,
                                      overrides=overrides, pde=pde)
    tw = eng.tw
    b = ns.static_batch or 1
    num_c = int(args["model"].get("num_c", 1))
    sp = tuple(int(s) for s in args["trainer"]["base_resolution"][1:])
    u0 = np.zeros((b, num_c, tw) + sp, np.float32)
    cond = (np.zeros((b, pde.n_cond_static + pde.n_cond_dynamic), np.float32)
            if (pde.n_cond_static + pde.n_cond_dynamic) > 0 else None)
    sc = (np.zeros((b, pde.n_cond_spatial) + sp, np.float32)
          if pde.n_cond_spatial > 0 else None)

    eng.export_rollout(ns.out, n_steps=ns.n_steps, example_u0=u0, cond=cond,
                       spatial_cond=sc,
                       platforms=tuple(ns.platforms.split(",")),
                       batch_poly=ns.static_batch is None)
    print(f"exported {ns.out}: n_steps={ns.n_steps} tw={tw} "
          f"batch={'symbolic' if ns.static_batch is None else b} "
          f"platforms={ns.platforms}")


if __name__ == "__main__":
    main()
