"""Secondary headline benchmark: autoregressive rollout throughput.

Measures bundled rollout steps/sec (one step = one U-FNO forward predicting
a tw=25 frame bundle) for a 50-step rollout at 128^2, batch 16 — the
inference regime of BASELINE.json ("50-step rollout steps/sec"). Uses the
same scan-based rollout core as ``AutoregressivePushforwardTrainer.simulate``.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


N_STEPS = 50
TW = 25
NX = 128
BATCH = 16


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model, _example_batch
    from nps_tpu.models.config import set_compute_dtype

    set_compute_dtype("bfloat16")
    model, pde = _build_model(NX, NX, TW)
    u, cond, sc, pos = _example_batch(BATCH, TW, NX, NX, pde)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), u, cond=cond,
                                 pos=pos, spatial_cond=sc)

    @jax.jit
    def rollout(params, u0):
        def body(pred, _):
            pred = model.apply(params, pred, cond=cond, pos=pos,
                               spatial_cond=sc)
            return pred, None

        pred, _ = jax.lax.scan(body, u0, None, length=N_STEPS)
        return jnp.sum(pred)

    u0 = jax.device_put(u)
    float(rollout(params, u0))  # compile + warmup (sync via readback)

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        v = rollout(params, u0)
    float(v)
    dt = (time.perf_counter() - t0) / reps

    steps_per_sec = N_STEPS / dt
    print(json.dumps({
        "metric": f"ufno_rollout_steps_per_sec_{NX}x{NX}_b{BATCH}",
        "value": round(steps_per_sec, 3),
        "unit": "bundled steps/s (x25 frames, x16 sims)",
        "frames_per_sec": round(steps_per_sec * TW * BATCH, 1),
    }))


if __name__ == "__main__":
    main()
