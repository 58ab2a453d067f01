"""Benchmark the SHIPPED trainer step for all four twophase families at
128^2 (bf16, batch 16, pushforward depth 1), through
``AutoregressivePushforwardTrainer._make_train_step`` — the same code path
``train_step`` dispatches in production.

Prints one JSON line per family (samples/sec/chip + MFU when XLA cost
analysis is available).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def family_kwargs(name):
    if name == "drn":
        return dict(processor="DilatedResnet", kernel_size=5, hidden_blocks=2,
                    hidden_features=128, padding_mode="circular",
                    dec_kernel_size=5, dec_padding_mode="circular")
    if name == "unet":
        return dict(processor="UNetModern", ch_mults=[2, 2, 1, 2],
                    is_attn=[False] * 4, mid_attn=False, hidden_features=32,
                    norm=True, use1x1=True, padding_mode="circular",
                    dec_kernel_size=5, dec_padding_mode="circular")
    if name == "ufno":
        return None  # the flagship spec built into bench.build_trainer
    if name == "ufno_fno":
        return dict(processor=[dict(object="FNO"), dict(object="UFNO")],
                    hidden_blocks=1, fno_modes=10, hidden_features=192,
                    fno_kernel_size=1, fno_conv_mode="single",
                    padding_mode="circular", ch_mults=[1, 1],
                    is_attn=[False, False], norm=True, use1x1=True)
    if name == "gnn":
        return dict(data_structure="graph", encoder="gnn.NodeElementWise",
                    processor="MPGNN", decoder="gnn.NodeTimeConvDense",
                    hidden_features=128, hidden_blocks=6, aggregate="mean",
                    remat=False,  # shifted-grid path: no [E,·] edge
                    # tensors; no-remat fits batch 8 and is fastest
                    # (44.4 vs 35.9 rematted; batch 16 no-remat OOMs,
                    # batch 16 rematted 29.4/s is per-sample slower)
                    dec_delta_mode="per_step")
    raise ValueError(name)


def main():
    for name in ("drn", "unet", "ufno", "ufno_fno", "gnn"):
        # the GNN benches the shipped cfg_twophase_gnn edge rule
        # (neighbors=2, ~29 edges/node at 128^2) at its largest fitting
        # per-chip batch: 8 (temps 15.05 GB measured). Batch 16 exceeds
        # HBM with or without remat — the [E, h] edge tensors are ~3.7 GB
        # each at 15.4M edges; edge-chunked message passing is the
        # BASELINE.md round-3 lead for larger per-chip batches.
        tkw = dict(neighbors=2) if name == "gnn" else None
        batch = 8 if name == "gnn" else bench.BATCH
        trainer, device_batch = bench.build_trainer(
            batch=batch, model_kwargs=family_kwargs(name),
            trainer_kwargs=tkw)
        sps, flops, dt = bench.bench_depth(trainer, device_batch, unrolled=1,
                                           n_steps=10)
        row = {"metric": f"{name}_train_samples_per_sec_per_chip_128x128",
               "value": round(sps, 3), "unit": "samples/s"}
        if flops:
            row["mfu"] = round(flops / dt / bench.V5E_BF16_PEAK_FLOPS, 4)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
