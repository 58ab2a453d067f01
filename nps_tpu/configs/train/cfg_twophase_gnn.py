"""MP-PDE-style message-passing GNN on twophase (TPU-native extension).

The reference keeps the ``M.AR_TB_GNN`` calling convention but ships no GNN
config (the path is deprecated upstream, ``src/models/enc_proc_dec.py:140``);
this config makes the restored GNN capability launchable end to end from the
CLI. The model consumes a static-shape :class:`~nps_tpu.common.graph.GridGraph`
built from the twophase grid with the reference's ``NS`` radius rule
(``src/common/data_creator.py:131-133``).
"""

from nps_tpu.configs.parse_component import load_config_modules, compose_config
from nps_tpu.configs.train._twophase_shared import (
    make_base, make_dataset, make_trainer)
from nps_tpu.models.activations import Swish

base_args, parser = make_base()

model = dict(
    object="EncProcDec",
    num_c=1,
    num_spatial_dims=2,
    time_window=base_args.time_window,
    data_structure="graph",
    processor_residual=False,
    encoder="gnn.NodeElementWise",
    processor="MPGNN",
    decoder="gnn.NodeTimeConvDense",
    activation=Swish(),
    hidden_features=128,
    hidden_blocks=6,
    aggregate="mean",
    remat=False,  # the shifted-grid message-passing path (auto-on for
    # regular grids, models/gnn.py) has no [E, hidden] edge tensors, so
    # the no-remat step fits at batch 8 and runs ~24% faster (44.4 vs
    # 35.9 samples/s measured). Set remat=True for irregular/knn graphs
    # on the gather path, where edge activations dominate memory.
    edge_chunks=1,  # >1 slices edge work into K rematted pieces — a
    # capacity knob for when the edge set itself exceeds HBM (BASELINE.md)
    dec_delta_mode="per_step",
)

_, optimizer, lr_scheduler, _, criterion, _ = load_config_modules(base_args)

trainer = dict(make_trainer(base_args), neighbors=2)

compose_config(parser,
               base_args=base_args,
               dataset=make_dataset(base_args),
               optimizer=optimizer.Adam,
               lr_scheduler=lr_scheduler.MultiStepLR,
               model=model,
               criterion=criterion.MSE_sum,
               trainer=trainer)
