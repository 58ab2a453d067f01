"""Tensor (model-axis) parallelism: shard weights over a ("data", "model")
mesh.

The reference has no distributed code at all (SURVEY.md §2.6); data
parallelism is this framework's primary strategy and TP was initially
declared out of scope (models are ≤ tens of M params). This module closes
that row anyway, TPU-natively: a 2-D mesh whose "model" axis shards the
output-feature dimension of every large weight —

- conv / conv-transpose kernels ``[*k, in, out]`` -> out on "model";
- dense kernels ``[in, out]`` -> out on "model";
- spectral weights ``weights1..4`` ``[2, in, out, *modes]`` -> out on
  "model" (axis 2);
- everything else (biases, norm scales) replicated.

No model-code changes: parameters are placed with these shardings and
XLA's SPMD partitioner propagates them through the jitted step, inserting
the all-gathers / reduce-scatters over ICI. Useful at the 512^2 stretch
scale where U-FNO spectral weights are ~60 MB per layer; at twophase scale
it is validated-capability rather than a speedup.
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def make_dp_tp_mesh(n_model, devices=None):
    """2-D ("data", "model") mesh: DP rows x TP columns."""
    from nps_tpu.parallel.mesh import make_dp_mesh
    return make_dp_mesh(n_model, "model", "tensor_parallel", devices)


def _leaf_spec(path, leaf, n_model):
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = getattr(leaf, "shape", ())
    if name == "kernel" and len(shape) >= 2 and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1)), "model")
    if name.startswith("weights") and len(shape) >= 3 \
            and shape[2] % n_model == 0:
        return P(None, None, "model", *([None] * (len(shape) - 3)))
    return P()


def param_partition_specs(params, n_model):
    """PartitionSpec pytree: out-feature sharding for large weights,
    replication for the rest. Dims not divisible by the axis stay
    replicated (correct, just unsharded)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, n_model), params)


def shard_params(params, mesh):
    """Place a param pytree on the mesh with model-axis weight sharding."""
    n_model = mesh.shape["model"]
    specs = param_partition_specs(params, n_model)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def param_shardings(params, mesh):
    """NamedSharding pytree (for jit in/out_shardings, optimizer init)."""
    n_model = mesh.shape["model"]
    specs = param_partition_specs(params, n_model)
    return jax.tree_util.tree_map(
        lambda _, s: NamedSharding(mesh, s), params, specs)
