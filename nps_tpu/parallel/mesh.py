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
    """Multi-host initialisation (DCN across slices).

    Re-raises on failure: a misconfigured multi-host launch must die loudly,
    not silently degrade to single-host training. The only swallowed case is
    double-initialisation (idempotent re-entry).
    """
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            return
        print(f"[nps_tpu] jax.distributed.initialize FAILED: {e!r}")
        raise


def make_mesh(devices=None, axis_name="data"):
    """1-D data-parallel mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_dp_mesh(n_col, axis_name, flag_name, devices=None):
    """2-D ("data", axis_name) mesh: DP rows x ``n_col`` model-axis columns.

    Shared constructor behind make_dp_tp_mesh / make_dp_pp_mesh /
    make_dp_ep_mesh — one place for the divisibility check and device
    ordering."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_col != 0:
        raise ValueError(
            f"{n} devices not divisible by {flag_name}={n_col}")
    grid = np.asarray(devices).reshape(n // n_col, n_col)
    return Mesh(grid, ("data", axis_name))


def batch_sharding(mesh, axis_name="data"):
    """Shard the leading (batch) dim across the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def replicate(tree, mesh):
    """Place every leaf replicated across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_grid_mesh(n_spatial, devices=None):
    """2-D ("data", "x") mesh: data-parallel rows x spatial-parallel columns.

    The "x" axis shards the first spatial dimension of the PDE grid (the
    sequence-parallel analogue for fields too large for one chip, e.g. the
    512^2 NS config). Inside jit, XLA's SPMD partitioner inserts the halo
    exchanges for stencil convs and the psums for spectral contractions /
    norm statistics automatically — the model code is unchanged.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % n_spatial == 0, \
        f"{n} devices not divisible by spatial_parallel={n_spatial}"
    grid = np.asarray(devices).reshape(n // n_spatial, n_spatial)
    return Mesh(grid, ("data", "x"))


class GridBatchSharding:
    """Per-role shardings for the standard batch tuple
    ``(u_base, u_super, x, cond, t_cond, spatial_cond[, lengths])`` on a
    ("data", "x") grid mesh.

    Fields [b, c, t, X, Y] shard (data, -, -, x, -); the position grid
    [b, X, Y, d] shards (data, x, -, -); spatial conditioning [b, c, X, Y]
    shards (data, -, x, -); vectors shard on batch only. Arrays whose
    sharded dims don't divide evenly stay batch-sharded or replicated (one
    extra jit specialization, correct results).
    """

    # spatial-X axis index per batch-tuple position (None = batch-only)
    _SPATIAL_AXIS = (3, 3, 1, None, None, 2, None)

    def __init__(self, mesh):
        assert mesh.axis_names == ("data", "x")
        self.mesh = mesh

    def spec_for(self, index, ndim):
        axis = (self._SPATIAL_AXIS[index]
                if index < len(self._SPATIAL_AXIS) else None)
        spec = [None] * ndim
        if ndim >= 1:
            spec[0] = "data"
        # only 2D fields carry a shardable X here (1D grids are small)
        if axis is not None and axis < ndim - 1 and ndim >= 4:
            spec[axis] = "x"
        return P(*spec)

    def shard_batch(self, batch):
        assert jax.process_count() == 1, \
            "GridBatchSharding is single-process: device_put of a " \
            "per-process slice onto a multi-host mesh would treat it as " \
            "the full global batch (see parallel.multihost)"
        n_data = self.mesh.shape["data"]
        n_x = self.mesh.shape["x"]
        out = []
        for i, a in enumerate(batch):
            if a is None or getattr(a, "ndim", 0) == 0 or a.size == 0 \
                    or a.shape[0] % n_data != 0:
                out.append(jax.device_put(a))
                continue
            spec = list(self.spec_for(i, a.ndim))
            # drop the x axis if the spatial dim doesn't divide
            for d, name in enumerate(spec):
                if name == "x" and a.shape[d] % n_x != 0:
                    spec[d] = None
            out.append(jax.device_put(a, NamedSharding(self.mesh, P(*spec))))
        return tuple(out)
