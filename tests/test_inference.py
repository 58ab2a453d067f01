"""Serving API tests: config-driven engine build, checkpoint load (both
formats), jitted rollout."""

import numpy as np
import pytest
import jax

from nps_tpu.inference import SurrogateEngine
from nps_tpu.pde import PDE2D

CFG = "nps_tpu/configs/train/cfg_twophase_drn.py"
TW = 25
NX1, NX2 = 24, 16


@pytest.fixture(scope="module")
def engine():
    pde = PDE2D(tmin=0, tmax=10, nt=101, L1=1.0, L2=0.7, nx1=NX1, nx2=NX2,
                x=None, name="twophase", n_cond_static=2, n_cond_spatial=2)
    eng = SurrogateEngine.from_config(
        CFG, pde=pde,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1"])
    rng = np.random.default_rng(0)
    u0 = (rng.random((2, 1, TW, NX1, NX2)) * 0.9).astype(np.float32)
    cond = rng.random((2, 2)).astype(np.float32)
    sc = np.zeros((2, 2, NX1, NX2), np.float32)
    eng.init_params(u0, cond=cond, spatial_cond=sc)
    return eng, u0, cond, sc


def test_rollout_shapes(engine):
    eng, u0, cond, sc = engine
    out = eng.rollout(u0, n_steps=3, cond=cond, spatial_cond=sc)
    assert out.shape == (2, 1, 3 * TW, NX1, NX2)
    assert np.isfinite(out).all()
    out2 = eng.rollout(u0, n_steps=3, cond=cond, spatial_cond=sc,
                       include_init=True)
    assert out2.shape == (2, 1, 4 * TW, NX1, NX2)
    np.testing.assert_array_equal(out2[:, :, TW:], out)


def test_rollout_matches_step_loop(engine):
    eng, u0, cond, sc = engine
    out = eng.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    p1 = eng.step(u0, cond=cond, spatial_cond=sc)
    p2 = eng.step(p1, cond=cond, spatial_cond=sc)
    # jitted-scan vs eager step differ by fusion reassociation, amplified by
    # the volume-preserve division (near-zero integrals at random init)
    np.testing.assert_allclose(out[:, :, :TW], p1, rtol=1e-2, atol=1e-3)
    np.testing.assert_allclose(out[:, :, TW:], p2, rtol=1e-2, atol=1e-3)


def test_save_load_roundtrip(engine, tmp_path):
    import flax.serialization

    eng, u0, cond, sc = engine
    path = str(tmp_path / "params.msgpack")
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(eng.params))
    pde = eng.pde
    eng2 = SurrogateEngine.from_config(
        CFG, pde=pde, checkpoint=path,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1"])
    out1 = eng.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    out2 = eng2.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    np.testing.assert_allclose(out1, out2, rtol=1e-6, atol=1e-7)


def test_load_torch_reference_checkpoint(engine, tmp_path):
    """A torch state dict saved like the reference's save_model loads."""
    torch = pytest.importorskip("torch")
    from tests.ref_loader import reference_available, load_reference

    if not reference_available():
        pytest.skip("reference unavailable")
    ref_models, ref_pdes = load_reference()
    eng, u0, cond, sc = engine
    pde_kw = dict(tmin=0.0, tmax=10.0, nt=101, L1=1.0, L2=0.7, nx1=NX1,
                  nx2=NX2, x=None, name="twophase", n_cond_static=2,
                  n_cond_dynamic=0, n_cond_spatial=2)
    torch.manual_seed(1)
    ref_model = ref_models.activation_wrapper(
        model_class="EncProcDec", activation_final=torch.nn.Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / 25,
        num_c=1, num_spatial_dims=2, time_window=TW, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=torch.nn.GELU(), processor="DilatedResnet", kernel_size=5,
        hidden_blocks=1, hidden_features=8, padding_mode="circular",
        dec_kernel_size=5, dec_padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=ref_pdes.PDE2D(**pde_kw))
    pt = str(tmp_path / "ref.pt")
    torch.save(ref_model.state_dict(), pt)

    eng3 = SurrogateEngine.from_config(
        CFG, pde=PDE2D(**pde_kw), checkpoint=pt,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1"])
    out = eng3.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    assert np.isfinite(out).all()

    with torch.no_grad():
        ref_model.eval()
        pos = np.broadcast_to(
            np.asarray(PDE2D(**pde_kw).x, np.float32)[None],
            (2, NX1, NX2, 2)).copy()
        p = ref_model(torch.tensor(u0), cond=torch.tensor(cond), bc=None,
                      pos=torch.tensor(pos), t_cond=None,
                      spatial_cond=torch.tensor(sc)).numpy()
    np.testing.assert_allclose(out[:, :, :TW], p, rtol=1e-3, atol=1e-4)


def test_moe_config_engine_rollout():
    """The beyond-reference MoE config serves through the same engine:
    config-driven build, init, jitted rollout (cfg_twophase_moe.py)."""
    pde = PDE2D(tmin=0, tmax=10, nt=101, L1=1.0, L2=0.7, nx1=NX1, nx2=NX2,
                x=None, name="twophase", n_cond_static=2, n_cond_spatial=2)
    eng = SurrogateEngine.from_config(
        "nps_tpu/configs/train/cfg_twophase_moe.py", pde=pde,
        overrides=["--model.hidden_features=8", "--model.hidden_blocks=1",
                   "--model.fno_modes=4", "--model.n_experts=2",
                   "--time_window=5"])
    rng = np.random.default_rng(1)
    u0 = (rng.random((2, 1, 5, NX1, NX2)) * 0.9).astype(np.float32)
    cond = rng.random((2, 2)).astype(np.float32)
    sc = np.zeros((2, 2, NX1, NX2), np.float32)
    eng.init_params(u0, cond=cond, spatial_cond=sc)
    out = eng.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    assert out.shape == (2, 1, 10, NX1, NX2)
    assert np.isfinite(out).all()


def test_export_rollout_artifact_roundtrip(engine, tmp_path):
    """AOT-exported StableHLO artifact (jax.export): reload and serve
    WITHOUT model code or params — results equal the live engine, and the
    symbolic batch dimension serves batch sizes not seen at export."""
    from nps_tpu.inference import load_exported

    eng, u0, cond, sc = engine
    path = str(tmp_path / "surrogate.npsx")
    eng.export_rollout(path, n_steps=2, example_u0=u0, cond=cond,
                       spatial_cond=sc, platforms=("cpu",))

    art = load_exported(path)
    assert art.meta["has_cond"] and art.meta["has_spatial_cond"]
    ref = eng.rollout(u0, n_steps=2, cond=cond, spatial_cond=sc)
    out = art.rollout(u0, cond=cond, spatial_cond=sc)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # batch polymorphism: a batch size never seen at export
    rng = np.random.default_rng(3)
    u4 = (rng.random((4, 1, TW, NX1, NX2)) * 0.9).astype(np.float32)
    c4 = rng.random((4, 2)).astype(np.float32)
    s4 = np.zeros((4, 2, NX1, NX2), np.float32)
    ref4 = eng.rollout(u4, n_steps=2, cond=c4, spatial_cond=s4)
    out4 = art.rollout(u4, cond=c4, spatial_cond=s4)
    np.testing.assert_allclose(out4, ref4, rtol=1e-5, atol=1e-6)

    # include_init concat matches the engine's
    np.testing.assert_array_equal(
        art.rollout(u0, cond=cond, spatial_cond=sc, include_init=True)[
            :, :, :TW], u0)

    # loud argument-presence validation
    with pytest.raises(ValueError, match="cond"):
        art.rollout(u0, spatial_cond=sc)


def test_export_rollout_rejects_missing_params_and_bad_magic(engine,
                                                             tmp_path):
    from nps_tpu.inference import load_exported

    bad = tmp_path / "notanartifact.npsx"
    bad.write_bytes(b"garbage-bytes")
    with pytest.raises(ValueError, match="artifact"):
        load_exported(str(bad))


def test_mesh_serving_matches_single_device(engine):
    """engine.shard(): DP and DP x spatial serving equal the single-device
    rollout (GSPMD from input placements, the trainer's mechanism)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    eng, u0, cond, sc = engine
    # batch 8 so both the (8,) data mesh and the (4, 2) grid mesh divide it
    rng = np.random.default_rng(11)
    u8 = (rng.random((8, 1, TW, NX1, NX2)) * 0.9).astype(np.float32)
    c8 = rng.random((8, 2)).astype(np.float32)
    s8 = np.zeros((8, 2, NX1, NX2), np.float32)
    ref = eng.rollout(u8, n_steps=2, cond=c8, spatial_cond=s8)

    try:
        eng.shard(devices=jax.devices()[:8])
        out_dp = eng.rollout(u8, n_steps=2, cond=c8, spatial_cond=s8)
        np.testing.assert_allclose(out_dp, ref, rtol=1e-5, atol=1e-6)

        eng.shard(spatial_parallel=2, devices=jax.devices()[:8])
        out_sp = eng.rollout(u8, n_steps=2, cond=c8, spatial_cond=s8)
        # halo/psum reassociation noise on a random-init DRN whose outputs
        # span ±5e3: bound the error relative to the field scale (measured
        # max ~7e-5 of scale), not elementwise near zero-crossings
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out_sp, ref, rtol=2e-4,
                                   atol=2e-4 * scale)

        with pytest.raises(ValueError, match="batch"):
            eng.rollout(u8[:3], n_steps=1, cond=c8[:3], spatial_cond=s8[:3])
    finally:
        eng.mesh = None
        eng._rollout_cache.clear()
        eng.params = jax.device_get(eng.params)
