"""Model-level tests: shape contracts, interface derivation, composition."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import nps_tpu.models as models
from nps_tpu.common.interfaces import D, M
from nps_tpu.models.activations import GELU, Tanh
from nps_tpu.pde import PDE1D, PDE2D


def make_pde2d(nx1=16, nx2=12, n_static=2, n_spatial=2):
    return PDE2D(tmin=0, tmax=10, nt=41, L1=1.0, L2=0.7, nx1=nx1, nx2=nx2,
                 x=None, name="twophase", n_cond_static=n_static,
                 n_cond_dynamic=0, n_cond_spatial=n_spatial)


def make_batch(pde, b=2, c=1, tw=5, seed=0):
    rng = np.random.default_rng(seed)
    nx1, nx2 = pde.nx1, pde.nx2
    u = rng.random((b, c, tw, nx1, nx2), dtype=np.float32) + 0.5
    cond = rng.random((b, pde.n_cond_static), dtype=np.float32)
    sc = (rng.random((b, pde.n_cond_spatial, nx1, nx2)) > 0.8).astype(np.float32)
    pos = np.broadcast_to(pde.x[None], (b, nx1, nx2, 2)).astype(np.float32)
    return u, cond, sc, pos


PROC_SPECS = {
    "DilatedResnet": dict(processor="DilatedResnet", kernel_size=3,
                          hidden_blocks=1, hidden_features=16,
                          padding_mode="circular"),
    "UNetModern": dict(processor="UNetModern", ch_mults=[1, 2],
                       is_attn=[False, False], mid_attn=False, norm=True,
                       hidden_features=16, padding_mode="circular"),
    "FNO": dict(processor="FNO", fno_modes=4, hidden_blocks=2,
                hidden_features=16, fno_kernel_size=1,
                fno_conv_mode="single", padding_mode="circular"),
    "UFNO": dict(processor="UFNO", fno_modes=4, hidden_blocks=1,
                 hidden_features=16, ch_mults=[1, 1], is_attn=[False, False],
                 norm=True, use1x1=True, padding_mode="circular"),
}


def build(pde, tw=5, wrapper=True, **spec):
    kwargs = dict(
        num_c=1, num_spatial_dims=2, time_window=tw, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=GELU(), decoder="dec_grid.TimeConvDense",
        dec_delta_mode="per_step", pde=pde, **spec)
    if wrapper:
        return models.activation_wrapper(
            model_class="EncProcDec", activation_final=Tanh(),
            enforce_spatial_cond=True, spatial_cond_channel=0,
            approx_volume_preserve=True,
            approx_volume_preserve_mode="individual_static",
            max_pct_dif=1 / 25, **kwargs)
    return models.EncProcDec(**kwargs)


@pytest.mark.parametrize("name", list(PROC_SPECS))
def test_forward_shapes_2d(name):
    pde = make_pde2d()
    model = build(pde, **PROC_SPECS[name])
    u, cond, sc, pos = make_batch(pde)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    out = jax.jit(model.apply)(params, u, cond=cond, pos=pos, spatial_cond=sc)
    assert out.shape == u.shape
    assert np.isfinite(np.asarray(out)).all()


def test_model_interfaces():
    pde = make_pde2d()
    model = build(pde, **PROC_SPECS["UFNO"])
    assert model.model_interface == M.AR_TB
    assert D.sim2d in model.data_interface


def test_obstacle_mask_enforced():
    pde = make_pde2d()
    model = build(pde, **PROC_SPECS["DilatedResnet"])
    u, cond, sc, pos = make_batch(pde)
    sc[:, 0] = 0.0
    sc[:, 0, :4, :4] = 1.0  # obstacle block
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    out = np.asarray(jax.jit(model.apply)(
        params, u, cond=cond, pos=pos, spatial_cond=sc))
    assert np.abs(out[:, :, :, :4, :4]).max() == 0.0
    assert np.abs(out[:, :, :, 8:, 8:]).max() > 0.0


def test_chained_processors_and_residual():
    """FNO->UFNO chain (cfg_twophase_ufno_fno pattern)."""
    pde = make_pde2d()
    model = build(
        pde, wrapper=False,
        processor=[dict(object="FNO"), dict(object="UFNO")],
        fno_modes=4, hidden_blocks=1, hidden_features=16,
        fno_kernel_size=1, fno_conv_mode="single", padding_mode="circular",
        ch_mults=[1, 1], is_attn=[False, False], norm=True, use1x1=True)
    u, cond, sc, pos = make_batch(pde)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    out = jax.jit(model.apply)(params, u, cond=cond, pos=pos, spatial_cond=sc)
    assert out.shape == u.shape
    # both processors materialized
    assert "processor_0" in params["params"] and "processor_1" in params["params"]


def test_1d_path_with_bc_encoder():
    pde = PDE1D(tmin=0, tmax=4.0, nt=41, L=16.0, nx=32, x=None, name="DIV1Dish",
                n_cond_static=1, n_cond_dynamic=2)
    model = models.EncProcDec(
        pde=pde, encoder="enc_grid.ElementWise",
        processor="FNO", decoder="dec_grid.TimeConvDense",
        bc_encoder=dict(object="BCEncoder", bc_encoder_out=4,
                        bc_encoder_hidden=8, bc_encoder_kernel=3),
        num_c=2, num_spatial_dims=1, time_window=5, activation=GELU(),
        hidden_features=16, fno_modes=4, hidden_blocks=1)
    rng = np.random.default_rng(0)
    u = rng.random((2, 2, 5, 32), dtype=np.float32)
    cond = rng.random((2, 1), dtype=np.float32)
    bc = rng.random((2, 2, 5), dtype=np.float32)  # n_cond_dynamic=2 channels
    pos = np.broadcast_to(pde.x[None], (2, 32)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, bc=bc, pos=pos)
    out = jax.jit(model.apply)(params, u, cond=cond, bc=bc, pos=pos)
    assert out.shape == u.shape
    assert "bc_encoder" in params["params"]


def test_film_conditioning():
    pde = make_pde2d(n_spatial=0)
    model = build(pde, wrapper=False, cond_mode="film",
                  **{**PROC_SPECS["FNO"], "processor": "FNO"})
    u, cond, _, pos = make_batch(pde)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos)
    out = jax.jit(model.apply)(params, u, cond=cond, pos=pos)
    assert out.shape == u.shape
    # FiLM branch creates the weights_feat projection
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    assert any("weights_feat" in "/".join(str(p) for p in path)
               for path, _ in flat)


def test_param_dtypes_f32():
    pde = make_pde2d()
    model = build(pde, **PROC_SPECS["UFNO"])
    u, cond, sc, pos = make_batch(pde)
    params = model.init(jax.random.PRNGKey(0), u, cond=cond, pos=pos,
                        spatial_cond=sc)
    for leaf in jax.tree_util.tree_leaves(params):
        assert leaf.dtype == jnp.float32
