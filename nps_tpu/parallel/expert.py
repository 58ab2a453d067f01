"""Expert parallelism: shard the MoE expert axis over an "expert" mesh axis.

Companion to :mod:`nps_tpu.models.moe_fno` (the reference has no MoE —
SURVEY.md §2.6; this closes the expert-parallel row with a real expert
dimension rather than a relabelled batch axis).

Mechanism — pure GSPMD, like tensor parallelism: every parameter leaf under
an ``experts_*`` module carries a leading ``n_experts`` axis (produced by
``nn.vmap(..., variable_axes={"params": 0})``). Those leaves are placed
with ``PartitionSpec("expert", ...)`` on a 2-D ("data", "expert") mesh and
everything else is replicated. Inside the jitted train step XLA propagates
the sharding through the vmapped expert compute (each device runs its
E/K experts) and lowers the gate contraction ``sum_e g[b,e]·out[e,b,...]``
to a ``psum`` over the 'expert' axis — no model-code changes, no explicit
collectives.
"""

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def make_dp_ep_mesh(n_expert, devices=None):
    """2-D ("data", "expert") mesh: DP rows x expert-parallel columns."""
    from nps_tpu.parallel.mesh import make_dp_mesh
    return make_dp_mesh(n_expert, "expert", "expert_parallel", devices)


def _in_expert_module(path):
    return any(getattr(k, "key", None) is not None
               and str(k.key).startswith("experts_") for k in path)


def _leaf_spec(path, leaf, n_expert):
    shape = getattr(leaf, "shape", ())
    if _in_expert_module(path):
        # loud, not silent: a non-divisible expert stack would otherwise
        # replicate everything and run K-times-redundant compute while the
        # user believes experts are sharded
        if len(shape) < 1 or shape[0] % n_expert != 0:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            raise ValueError(
                f"expert_parallel={n_expert} does not divide the expert "
                f"stack axis of '{name}' (shape {tuple(shape)}); set "
                f"model.n_experts to a multiple of expert_parallel")
        return P("expert", *([None] * (len(shape) - 1)))
    return P()


def expert_partition_specs(params, n_expert):
    """PartitionSpec pytree: leading-axis expert sharding for every leaf
    under an ``experts_*`` module, replication for the rest."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_spec(path, leaf, n_expert), params)


def shard_expert_params(params, mesh):
    """Place a param pytree on the mesh with expert-axis sharding."""
    n_expert = dict(mesh.shape)["expert"]
    specs = expert_partition_specs(params, n_expert)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
