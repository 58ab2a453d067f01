"""Device mesh + sharding layer — the distributed component the reference
lacks entirely (SURVEY.md §2.6: no DDP/NCCL/MPI anywhere upstream).

Data parallelism, TPU-native: a 1-D ``("data",)`` mesh over ICI; batches
sharded on their leading axis via NamedSharding; parameters replicated.
Inside a jitted train step XLA then partitions the computation SPMD-style
and inserts the gradient all-reduce over ICI automatically — no explicit
psum code, no comm backend to configure.

Multi-host (DCN) entry point: ``init_distributed`` wraps
``jax.distributed.initialize``.

The spatial-domain (sequence-parallel analogue) layer with halo exchange
lives in ``nps_tpu.parallel.spatial``.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(**kwargs):
    """Multi-host initialisation (DCN across slices); no-op if single-host."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def replicate(tree, mesh):
    """Place every leaf replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
