"""Headline benchmark: U-FNO train throughput (samples/sec/chip) at 128^2.

Runs the full pushforward training step (unroll depth 1: one no-grad model
step + one grad step + Adam update) of the cfg_twophase_ufno model
(192 features, 3 U-FNO blocks, 10 modes) on a 128x128 grid with the
reference training batch size (16), on whatever accelerator JAX exposes.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio to the PyTorch reference running the same step on this
host's CPU (the only reference hardware available here; measured by
tools/bench_reference_torch.py and recorded in BASELINE.md). None until
that measurement exists.
"""

import json
import time

import numpy as np

# torch reference, same step/shape, this host's CPU (1 vCPU; measured by
# tools/bench_reference_torch.py on 2026-08-16, see BASELINE.md)
REFERENCE_SAMPLES_PER_SEC = 0.030

TW = 25
NX = 128
BATCH = 16
UNROLLED = 1
T_RES = TW * (UNROLLED + 2) + 1


def build_step(compute_dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model, _example_batch
    from nps_tpu.models.config import set_compute_dtype
    from nps_tpu.train.losses import build_criterion
    from nps_tpu.train.optim import build_optimizer

    set_compute_dtype(compute_dtype)

    model, pde = _build_model(NX, NX, TW)
    u, cond, sc, pos = _example_batch(BATCH, TW, NX, NX, pde)
    rng = np.random.default_rng(1)
    u_traj = (rng.random((BATCH, 1, T_RES, NX, NX)) * 0.9).astype(np.float32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), u, cond=cond,
                                 pos=pos, spatial_cond=sc)
    tx, _ = build_optimizer(object="optim.Adam", lr=1e-4)
    opt_state = jax.jit(tx.init)(params)
    criterion = build_criterion(object="nn.MSELoss", reduction="sum")

    def train_step(params, opt_state, u_traj, cond, sc, pos, key):
        def loss_fn(params):
            steps0 = jax.random.randint(key, (BATCH,), TW,
                                        T_RES - TW - TW * UNROLLED + 1)
            sl = jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
                ui, s - TW, 2 * TW, axis=1))(u_traj, steps0)
            data, labels = sl[:, :, :TW], sl[:, :, TW:]
            for _ in range(UNROLLED):
                data = jax.lax.stop_gradient(model.apply(
                    params, data, cond=cond, pos=pos, spatial_cond=sc))
                steps0 = steps0 + TW
                labels = jax.vmap(lambda ui, s: jax.lax.dynamic_slice_in_dim(
                    ui, s, TW, axis=1))(u_traj, steps0)
            pred = model.apply(params, data, cond=cond, pos=pos,
                               spatial_cond=sc)
            return jnp.sqrt(criterion(pred, labels))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, du: p + du, params, updates)
        return params, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    inputs = [jax.device_put(x) for x in (u_traj, cond, sc, pos)]
    return step, params, opt_state, inputs


def main():
    import jax

    step, params, opt_state, (u_traj, cond, sc, pos) = build_step()

    # warmup / compile; NOTE: block_until_ready is unreliable on the axon
    # platform -- force a host readback to synchronize
    for i in range(2):
        key = jax.random.PRNGKey(i)
        params, opt_state, loss = step(params, opt_state, u_traj, cond, sc,
                                       pos, key)
    float(loss)

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        key = jax.random.PRNGKey(100 + i)
        params, opt_state, loss = step(params, opt_state, u_traj, cond, sc,
                                       pos, key)
    float(loss)  # synchronize
    dt = time.perf_counter() - t0

    sps = n_steps * BATCH / dt
    vs = (sps / REFERENCE_SAMPLES_PER_SEC
          if REFERENCE_SAMPLES_PER_SEC else None)
    print(json.dumps({
        "metric": "ufno_train_samples_per_sec_per_chip_128x128",
        "value": round(sps, 3),
        "unit": "samples/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
