"""ZeRO-1: shard optimizer state over the data-parallel axis.

Under plain data parallelism the Adam moments are replicated on every
chip — 2x the parameter bytes of pure overhead per device. ZeRO-1
(Rajbhandari et al. 2020) shards them: each data rank owns 1/K of every
moment tensor, updates its slice, and the parameter update is all-gathered.

TPU-native mechanism — no optimizer rewrite: the moments are placed with a
``PartitionSpec`` that splits each tensor's first K-divisible axis over
"data", and XLA's SPMD partitioner derives the rest inside the existing
jitted train step. Adam's moment update is elementwise (sharded moment x
replicated gradient -> sharded new moment, zero communication) and the
parameter write-back ``p + update`` forces exactly one all-gather of the
update — the ZeRO-1 schedule, derived by the compiler rather than
hand-coded. The step keeps donating ``opt_state``, so the moments update
in place in their shards.

Why it matters here: the 512² stretch config carries ~0.7 GB of f32 Adam
moments per chip; at batch 3/chip the step previously missed fitting HBM
by ~0.2 GB (BASELINE.md "ns512 layouts"). Sharding the moments over 8
ranks returns ~0.6 GB/chip — the difference between batch 2 and batch 3.

Enable with ``--trainer.zero1=true`` (requires a mesh with a "data" axis;
composes with dp/spatial/pipeline layouts; under tensor OR expert
parallelism the moments already follow the weight sharding from tx.init,
so zero1 is rejected there — re-placing them on "data" would just force a
per-step reshard).
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _leaf_spec(leaf, n_data, axis_name):
    shape = getattr(leaf, "shape", ())
    dtype = getattr(leaf, "dtype", None)
    if dtype is None or not hasattr(leaf, "ndim"):
        return P()
    for i, s in enumerate(shape):
        if s >= n_data and s % n_data == 0:
            return P(*([None] * i), axis_name,
                     *([None] * (len(shape) - i - 1)))
    return P()  # scalars / small leaves (counts, lr) stay replicated


def opt_state_specs(opt_state, mesh, axis_name="data"):
    """PartitionSpec pytree: each moment tensor split on its first
    axis divisible by the data extent; everything else replicated."""
    n_data = dict(mesh.shape)[axis_name]
    return jax.tree_util.tree_map(
        lambda x: _leaf_spec(x, n_data, axis_name), opt_state)


def shard_opt_state(opt_state, mesh, axis_name="data"):
    """Place an optax state pytree with ZeRO-1 sharding on the mesh."""
    specs = opt_state_specs(opt_state, mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs)
