"""Tensor-parallel (model-axis) tests on the 8-device virtual CPU mesh.

The weight-sharded step must be numerically equivalent to the unsharded
step — XLA's SPMD partitioner inserts the collectives; these tests pin the
sharding rules and the end-to-end equivalence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nps_tpu.parallel import (make_dp_tp_mesh, param_partition_specs,
                              shard_params)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_dp_tp_mesh(2, jax.devices()[:8])  # 4 dp x 2 tp


@pytest.fixture(scope="module")
def model_and_batch():
    from __graft_entry__ import _build_model, _example_batch

    tw, nx = 5, 16
    model, pde = _build_model(nx, nx, tw, hidden_features=16,
                              hidden_blocks=1, fno_modes=4)
    u, cond, sc, pos = _example_batch(8, tw, nx, nx, pde)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), u, cond=cond,
                                 pos=pos, spatial_cond=sc)
    return model, params, (u, cond, sc, pos)


def test_partition_spec_rules(model_and_batch):
    _, params, _ = model_and_batch
    specs = param_partition_specs(params, 2)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    by_name = {}
    for path, spec in flat:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        by_name.setdefault(name, []).append((path, spec))
    # conv/dense kernels: out-feature (last) axis on "model"
    assert any(s[-1] == "model" for _, s in by_name["kernel"])
    for _, s in by_name["kernel"]:
        assert s == P() or s[-1] == "model"
    # spectral weights [2, in, out, *modes]: axis 2 on "model"
    spectral = [v for n, vs in by_name.items() if n.startswith("weights")
                for v in vs]
    assert spectral
    for _, s in spectral:
        assert s == P() or s[2] == "model"
    # biases / norm params replicated
    for _, s in by_name.get("bias", []):
        assert s == P()


def test_tp_forward_matches_unsharded(mesh, model_and_batch):
    model, params, (u, cond, sc, pos) = model_and_batch

    def fwd(p, u, cond, sc, pos):
        return model.apply(p, u, cond=cond, pos=pos, spatial_cond=sc)

    ref = np.asarray(jax.jit(fwd)(params, u, cond, sc, pos))

    p_tp = shard_params(params, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    out = jax.jit(fwd)(p_tp, jax.device_put(u, data_sh),
                       jax.device_put(cond, data_sh),
                       jax.device_put(sc, data_sh),
                       jax.device_put(pos, data_sh))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)
    # weights really are sharded over the model axis
    sharded = [leaf for leaf in jax.tree_util.tree_leaves(p_tp)
               if any(e == "model" for e in tuple(leaf.sharding.spec))]
    assert sharded, "no leaf ended up model-sharded"


def test_tp_grad_step_matches_unsharded(mesh, model_and_batch):
    model, params, (u, cond, sc, pos) = model_and_batch
    rng = np.random.default_rng(0)
    target = (rng.random(u.shape) * 0.9).astype(np.float32)

    def loss_fn(p, u, target, cond, sc, pos):
        pred = model.apply(p, u, cond=cond, pos=pos, spatial_cond=sc)
        return jnp.sqrt(jnp.sum((pred - target) ** 2))

    g_ref = jax.jit(jax.grad(loss_fn))(params, u, target, cond, sc, pos)

    p_tp = shard_params(params, mesh)
    data_sh = NamedSharding(mesh, P("data"))
    g_tp = jax.jit(jax.grad(loss_fn))(
        p_tp, jax.device_put(u, data_sh), jax.device_put(target, data_sh),
        jax.device_put(cond, data_sh), jax.device_put(sc, data_sh),
        jax.device_put(pos, data_sh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-5)
