"""Measure the PyTorch reference's U-FNO train-step throughput on this host
(CPU — the only reference hardware available here; the paper used a GPU).

Same workload as bench.py: cfg_twophase_ufno model (192 feat, 3 blocks,
10 modes) at 128x128, tw=25, batch 16, pushforward depth 1 (one no-grad
step + one grad step + Adam update). The result is recorded in BASELINE.md
and used as bench.py's vs_baseline denominator.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import torch

from tests.ref_loader import load_reference, reference_available


def main():
    assert reference_available()
    ref_models, ref_pdes = load_reference()
    torch.set_num_threads(torch.get_num_threads())

    NX, TW, B = 128, 25, 16
    pde = ref_pdes.PDE2D(tmin=0.0, tmax=10.0, nt=501, L1=1.0, L2=0.66,
                         nx1=NX, nx2=NX, x=None, name="twophase",
                         n_cond_static=2, n_cond_dynamic=0, n_cond_spatial=2)
    model = ref_models.activation_wrapper(
        model_class="EncProcDec", activation_final=torch.nn.Tanh(),
        enforce_spatial_cond=True, spatial_cond_channel=0,
        approx_volume_preserve=True,
        approx_volume_preserve_mode="individual_static", max_pct_dif=1 / 25,
        num_c=1, num_spatial_dims=2, time_window=TW, data_structure="grid",
        processor_residual=False, encoder="enc_grid.ElementWise",
        activation=torch.nn.GELU(), processor="UFNO", fno_modes=10,
        hidden_blocks=3, hidden_features=192, fno_kernel_size=1,
        fno_conv_mode="single", padding_mode="circular", ch_mults=[1, 1],
        is_attn=[False, False], mid_attn=False, norm=True, use1x1=True,
        decoder="dec_grid.TimeConvDense", dec_delta_mode="per_step", pde=pde)
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    crit = torch.nn.MSELoss(reduction="sum")

    rng = np.random.default_rng(0)
    u = torch.tensor((rng.random((B, 1, TW, NX, NX)) * 0.9).astype(np.float32))
    labels = torch.tensor(
        (rng.random((B, 1, TW, NX, NX)) * 0.9).astype(np.float32))
    cond = torch.tensor(rng.random((B, 2)).astype(np.float32))
    sc = torch.zeros((B, 2, NX, NX))
    sc[:, 0, 4:8, 4:8] = 1.0
    pos = torch.tensor(np.broadcast_to(
        pde.x.numpy()[None], (B, NX, NX, 2)).copy())

    def step():
        opt.zero_grad()
        with torch.no_grad():  # pushforward depth 1
            data = model(u, cond=cond, bc=None, pos=pos, t_cond=None,
                         spatial_cond=sc)
        pred = model(data, cond=cond, bc=None, pos=pos, t_cond=None,
                     spatial_cond=sc)
        loss = torch.sqrt(crit(pred, labels))
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = time.perf_counter() - t0
    print(f"torch reference CPU: {dt / n:.2f}s/step -> "
          f"{n * B / dt:.3f} samples/s  (threads={torch.get_num_threads()})")


if __name__ == "__main__":
    main()
