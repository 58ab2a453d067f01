"""Attribute the per-validation-boundary wall cost of a convergence run.

The round-5 U-FNO convergence logs show ~28 s of non-train wall at every
25-epoch boundary (BASELINE.md "U-FNO re-run through the round-5
trainer").  A boundary does up to four things: (1) a validation — ONE
jitted test-step dispatch on the device-cached valid batch, (2) on a new
best, a msgpack ``save_model`` (params fetch + write), (3) on a new best,
a test-split evaluation, (4) a full-state checkpoint
(params + opt-state fetch through the tunnel + 834 MB pickle write).
This probe times each component on the real chip at the exact production
shapes by resuming the committed convergence checkpoint.

Usage (chip must be free):
    python tools/probe_eval_ckpt.py [ckpt_experiment_dir]

Reference for the behavior being attributed:
/root/reference/src/trainers/base.py:378-470 (validate -> best-save ->
test-on-best loop; the reference has no full-state checkpoint).
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import nps_tpu.configs  # noqa: E402

sys.modules.setdefault("configs", nps_tpu.configs)


def t(label, fn):
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    print(f"[probe] {label}: {dt:.2f} s", flush=True)
    return out, dt


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "experiments/convergence_r5"
    device = os.environ.get("NPS_PROBE_DEVICE", "tpu")
    sys.argv = [
        "probe", "-C", "nps_tpu/configs/train/cfg_twophase_ufno.py",
        "--base_resolution=[251,96,64]", "--super_resolution=[251,96,64]",
        "--dataset.base_path=/tmp/convdata", "--dataset.c_filter=[0]",
        "--model.activation=gelu_tanh",
        f"--trainer.device={device}", "--trainer.device_cache=true",
        "--trainer.compute_dtype=bfloat16", "--trainer.eval_batch_size=20",
        "--trainer.resume=true",
        f"--experiment_path={exp}", "--experiment_name=conv_ufno",
    ]
    from nps_tpu.configs.parse import parse_args
    from nps_tpu.train_cli import get_config_static
    from nps_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    args = parse_args()
    (_dev, _ds, _name, _model, _crit, trainer, _o, _l) = \
        get_config_static(args, lazy_init=True)

    _, dt_resume = t("resume load (834 MB pickle read + device put)",
                     lambda: trainer.maybe_resume())

    loaders, _ = t("dataloaders + device-cache fill",
                   lambda: trainer.get_dataloaders())
    _train_loader, valid_loader, test_loader = loaders

    # (1) validation: first dispatch (compile or persistent-cache load),
    # then the steady-state warm dispatch every boundary pays
    _, dt_cold = t("validation, first call (compile/cache-load + run)",
                   lambda: trainer.test(valid_loader))
    _, dt_warm = t("validation, warm (the per-boundary steady cost)",
                   lambda: trainer.test(valid_loader))
    _, dt_warm2 = t("validation, warm repeat",
                    lambda: trainer.test(valid_loader))

    # (3) test-on-best evaluation (same shapes here: 20-sim split)
    _, dt_test = t("test-split evaluation, warm",
                   lambda: trainer.test(test_loader))

    # (2) best-model msgpack save: params fetch + 278 MB write
    _, dt_save = t("save_model (params fetch + msgpack write)",
                   lambda: trainer.save_model(
                       trainer.config.save_path + "_probe"))

    # (4) full-state checkpoint, split into its three parts
    fetched_p, dt_fp = t("host fetch params (278 MB over the tunnel)",
                         lambda: trainer._host_fetch(trainer.params))
    fetched_o, dt_fo = t("host fetch opt_state (2x278 MB over the tunnel)",
                         lambda: trainer._host_fetch(trainer.opt_state))
    state = dict(params=fetched_p, opt_state=fetched_o)

    def write():
        with open("/tmp/probe_ckpt.pkl", "wb") as f:
            pickle.dump(state, f)

    _, dt_pkl = t("pickle write 834 MB to disk", write)
    _, dt_ckpt = t("save_checkpoint end-to-end",
                   lambda: trainer.save_checkpoint(999))

    per_boundary = dt_warm + dt_ckpt
    per_best = dt_save + dt_test
    print(f"\n[probe] steady boundary (validate + checkpoint): "
          f"{per_boundary:.2f} s; new-best adds (best-save + test eval): "
          f"{per_best:.2f} s")
    print(f"[probe] summary: resume={dt_resume:.1f} cold_val={dt_cold:.1f} "
          f"warm_val={(dt_warm + dt_warm2) / 2:.2f} test={dt_test:.2f} "
          f"save_model={dt_save:.2f} fetch_p={dt_fp:.2f} "
          f"fetch_opt={dt_fo:.2f} pickle={dt_pkl:.2f} "
          f"ckpt_total={dt_ckpt:.2f}")
    for f in ("/tmp/probe_ckpt.pkl",):
        if os.path.exists(f):
            os.remove(f)
    probe_msgpack = trainer.config.save_path + "_probe.msgpack"
    if os.path.exists(probe_msgpack):
        os.remove(probe_msgpack)


if __name__ == "__main__":
    main()
