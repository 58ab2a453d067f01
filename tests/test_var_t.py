"""Variable-time (D.sim1d_var_t) end-to-end tests: ragged storage, bucketed
loading with min-crop/max-pad collate, masked evaluation, training."""

import numpy as np
import pytest
import jax

import nps_tpu.models as models
from nps_tpu.common.interfaces import D
from nps_tpu.data.ragged import RaggedMemmap
from nps_tpu.data.synthetic import generate_var_t
from nps_tpu.data.pde1d_var_t import PDE1DVarTDataset
from nps_tpu.models.activations import GELU, Tanh
from nps_tpu.train import AutoregressivePushforwardTrainer, build_criterion

TW = 5
NX = 32


def test_ragged_memmap_roundtrip(tmp_path, rng):
    arrays = [rng.random((2, t, 8)).astype(np.float32) for t in (7, 13, 5)]
    rm = RaggedMemmap.save(str(tmp_path / "rag"), arrays)
    assert len(rm) == 3
    for a, i in zip(arrays, range(3)):
        np.testing.assert_array_equal(rm[i], a)
    rm2 = RaggedMemmap(str(tmp_path / "rag"))
    np.testing.assert_array_equal(rm2[1], arrays[1])


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("vart")
    generate_var_t(str(d / "sim1d"), n_sims=12, n_channels=2, nx=NX,
                   t_min=4 * TW, t_max=10 * TW, seed=7)
    return PDE1DVarTDataset(base_path=str(d), experiment="sim1d",
                            conditioning="conditioning", split_file="split",
                            name="var_t_test")


def test_dataset_contract(dataset):
    assert dataset.data_interface == D.sim1d_var_t
    u_base, u, x, cond, t_cond, sc = dataset.train[0]
    assert u.ndim == 3 and u.shape[0] == 2 and u.shape[2] == NX
    assert cond.shape == (2,)
    # lengths vary across elements
    lens = {dataset.train[i][1].shape[1] for i in range(len(dataset.train))}
    assert len(lens) > 1


@pytest.fixture(scope="module")
def trainer(dataset):
    model = models.EncProcDec(
        num_c=2, num_spatial_dims=1, time_window=TW,
        encoder="enc_grid.ElementWise", activation=GELU(),
        processor="FNO", fno_modes=4, hidden_blocks=1, hidden_features=16,
        padding_mode="circular",
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step",
        pde=dataset.pde)
    return AutoregressivePushforwardTrainer(
        model=model, data=dataset,
        criterion=build_criterion(object="nn.MSELoss", reduction="sum"),
        optimizer=dict(object="optim.Adam", lr=1e-3), lr_scheduler=None,
        save_path="/tmp/nps_tpu_test/vart", time_window=TW,
        base_resolution=(10 * TW, NX), super_resolution=(10 * TW, NX),
        device="cpu", batch_size=4, nr_gt_steps=1, nw=0, num_epochs=2,
        lr_step_interval=1, unrolling=1, print_interval=10, test_interval=2,
        process_settings={})


def test_var_t_loaders(trainer):
    train_loader, valid_loader, _ = trainer.get_dataloaders()
    batch = next(iter(train_loader))
    assert len(batch) == 7
    u = batch[1]
    assert u.shape[2] % TW == 0  # min-cropped to a tw multiple
    depth = train_loader.batch_sampler.get_t_batch(0)
    assert 0 <= depth <= 1
    vb = next(iter(valid_loader))
    assert vb[1].shape[2] % TW == 0  # max-padded to a tw multiple
    lengths = np.asarray(vb[6])
    assert (lengths <= vb[1].shape[2]).all()


@pytest.mark.parametrize("mode", ["min", "max"])
def test_var_t_loader_multiprocess_slices_match_global(dataset, mode):
    """Two injected-index process loaders must partition the exact global
    stream a single-process loader yields: same batches, same crop/pad
    extent (computed over the GLOBAL batch), same crop starts (lockstep
    RNG), each process holding its contiguous slice."""
    from nps_tpu.data.pipeline import VariableTimeLoader
    from nps_tpu.data.samplers import VariableTimeBatchSampler

    def mk(pi, pc):
        sampler = VariableTimeBatchSampler(
            dataset.train, batch_size=4, time_window=TW, max_unrolling=1,
            with_replacement=(mode == "min"), seed=3)
        return VariableTimeLoader(dataset.train, sampler, mode=mode,
                                  time_window=TW, seed=5,
                                  process_index=pi, process_count=pc,
                                  global_multiple=pc)

    full = list(mk(0, 1))
    p0 = list(mk(0, 2))
    p1 = list(mk(1, 2))
    assert len(p0) == len(p1) > 0
    # without replacement a final ragged batch may trim away fleet-wide;
    # every SURVIVING batch must reassemble to the single-process batch
    for bf, b0, b1 in zip(full, p0, p1):
        for rf, r0, r1 in zip(bf, b0, b1):
            rf, r0, r1 = map(np.asarray, (rf, r0, r1))
            cat = np.concatenate([r0, r1], axis=0)
            assert rf.shape[1:] == cat.shape[1:], (rf.shape, cat.shape)
            np.testing.assert_array_equal(rf[: cat.shape[0]], cat)


def test_var_t_multiprocess_rejects_fully_trimmed_split(dataset):
    """A split smaller than the mesh 'data' extent would yield ZERO
    batches after global trimming — that must fail loudly at loader
    construction, not as a ZeroDivisionError at the first evaluation."""
    from nps_tpu.data.pipeline import VariableTimeLoader
    from nps_tpu.data.samplers import VariableTimeBatchSampler

    sampler = VariableTimeBatchSampler(
        dataset.valid, batch_size=4, time_window=TW, max_unrolling=0,
        with_replacement=False, seed=3)
    with pytest.raises(ValueError, match="trims to zero"):
        VariableTimeLoader(dataset.valid, sampler, mode="max",
                           time_window=TW, process_index=0,
                           process_count=2, global_multiple=8)


def test_var_t_training_and_eval(trainer):
    train_losses, val_losses, val_stats = trainer.train()
    assert len(train_losses) == 2
    assert all(np.isfinite(v) for v in train_losses)
    assert np.isfinite(val_losses["default"][0])
    stats = val_stats["default"][0]
    assert np.isfinite(stats["Unrolled forward losses"])


def test_var_t_masked_eval_ignores_padding(trainer, dataset):
    """Evaluation on a max-padded batch must not count padded frames: the
    same simulations padded further must give the same loss."""
    _, valid_loader, _ = trainer.get_dataloaders()
    trainer.ensure_initialized(valid_loader)
    batch = list(next(iter(valid_loader)))
    loss1, _ = trainer.test_step(tuple(batch), 0)
    # pad the batch by one extra tw window of garbage
    u = np.asarray(batch[1])
    pad = np.concatenate([u, np.full(u.shape[:2] + (TW,) + u.shape[3:], 7.7,
                                     u.dtype)], axis=2)
    batch2 = batch.copy()
    batch2[1] = pad
    loss2, _ = trainer.test_step(tuple(batch2), 0)
    # the metric divides by the (padded) rollout length, as upstream; the
    # invariant is the SUM: fully-masked windows must contribute zero loss
    def n_t(t_res):
        return TW * len(range(TW, t_res - TW + 1, TW))

    s1 = float(loss1) * n_t(u.shape[2])
    s2 = float(loss2) * n_t(pad.shape[2])
    assert np.isclose(s1, s2, rtol=1e-4), \
        f"masked-out padding contributed loss: {s1} vs {s2}"
