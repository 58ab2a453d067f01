"""Multi-host (multi-process) input sharding over DCN.

In a multi-host run (one JAX process per host, brought up by
``nps_tpu.parallel.init_distributed``), every process must feed its own
addressable shard of each GLOBAL batch. The TPU-native recipe:

- all processes share the loader shuffle seed, so each derives the
  identical global epoch order;
- each process materialises only its contiguous slice of every global
  batch (`process_slice`), so host IO scales out with the fleet;
- `assemble_global_batch` lifts the per-process host arrays into global
  ``jax.Array``s via ``jax.make_array_from_process_local_data``; inside
  the jitted step GSPMD then behaves exactly as in the single-process
  case (gradient all-reduce over ICI/DCN inserted automatically).

The torch reference has no distributed story at all (SURVEY.md §2.6 — no
DDP/NCCL/MPI anywhere in ``src/``); this module is the DCN half of the
data-parallel design (the ICI half lives in ``nps_tpu/parallel/mesh.py``).
"""

import numpy as np
import jax


def process_slice(n, process_index=None, process_count=None):
    """Contiguous per-process slice of a global batch of ``n`` elements.

    The batch is first trimmed to a multiple of ``process_count`` (at most
    ``process_count - 1`` trailing elements of a final ragged batch are
    dropped — a global ``jax.Array`` cannot represent a batch axis that
    does not split evenly across processes). Returns ``(start, stop)``;
    ``start == stop`` means this batch is dropped fleet-wide.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per = n // process_count
    return process_index * per, (process_index + 1) * per


def shard_indices_for_process(idx, process_index=None, process_count=None):
    """Slice one global batch's element indices down to this process's."""
    start, stop = process_slice(len(idx), process_index, process_count)
    return idx[start:stop]


def assemble_global_batch(batch, sharding):
    """Lift per-process host arrays into global ``jax.Array``s.

    ``sharding`` must be a ``NamedSharding`` whose spec shards the leading
    (batch) axis — the standard DP layout from
    ``nps_tpu.parallel.batch_sharding``. Each local array is this
    process's contiguous slice of the global batch (see
    ``process_slice``); the global shape is inferred by JAX from the
    local shape and the sharding's process span.

    Empty conditioning roles (``[b, 0]``) and scalars are replicated —
    every process holds the same (trivial) value.
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = sharding.mesh
    replicated = NamedSharding(mesh, P())
    out = []
    for a in batch:
        a = np.asarray(a)
        if a.ndim == 0 or a.size == 0:
            # every process holds an identical copy -> replicate
            out.append(jax.make_array_from_process_local_data(
                replicated, jnp.asarray(a)))
        else:
            n_data = dict(mesh.shape).get("data", mesh.devices.size)
            n_global = a.shape[0] * jax.process_count()
            if n_global % n_data != 0:
                raise ValueError(
                    f"global batch {n_global} does not divide the mesh's "
                    f"'data' extent {n_data}; pick a batch_size divisible "
                    f"by it (or pass global_multiple={n_data} to the "
                    f"loader) — a multi-process run cannot fall back to "
                    f"replication, no process holds the full batch")
            out.append(jax.make_array_from_process_local_data(sharding, a))
    return tuple(out)


def validate_grid_mesh_process_layout(mesh):
    """Multi-host spatial precondition: every process's devices must cover
    whole data-rows of the ("data", "x") mesh, so a process's addressable
    portion of each global array is exactly its contiguous batch slice at
    FULL spatial extent — the shape the multi-host loader already yields.
    That holds when the data axis splits evenly over processes and each
    process's device block spans complete x-rows.
    """
    pc = jax.process_count()
    n_data = mesh.shape["data"]
    n_x = mesh.shape["x"]
    if n_data % pc:
        raise ValueError(
            f"multi-host spatial parallelism needs the mesh 'data' axis "
            f"({n_data}) to be a multiple of the process count ({pc}): "
            f"lower spatial_parallel so each process owns whole data-rows")
    if jax.local_device_count() % n_x:
        raise ValueError(
            f"multi-host spatial parallelism needs spatial_parallel "
            f"({n_x}) to divide the per-process device count "
            f"({jax.local_device_count()}): an x-row split across "
            f"processes would need a spatial input slice no loader "
            f"produces")


def assemble_global_grid_batch(batch, grid_sharding):
    """Lift per-process batch slices into global arrays on a ("data", "x")
    grid mesh (spatial parallelism, ``parallel.mesh.GridBatchSharding``).

    Same contract as :func:`assemble_global_batch` — each process holds
    its contiguous slice of the global batch at full spatial extent — but
    the per-role sharding comes from ``GridBatchSharding.spec_for`` so 2D
    field tensors additionally shard their X axis over the in-process "x"
    mesh axis (GSPMD halo exchanges ride ICI inside the jitted step;
    process boundaries only ever cut the batch axis, see
    :func:`validate_grid_mesh_process_layout`).
    """
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = grid_sharding.mesh
    validate_grid_mesh_process_layout(mesh)
    pc = jax.process_count()
    n_data = mesh.shape["data"]
    n_x = mesh.shape["x"]
    replicated = NamedSharding(mesh, P())
    out = []
    for i, a in enumerate(batch):
        a = np.asarray(a)
        if a.ndim == 0 or a.size == 0:
            out.append(jax.make_array_from_process_local_data(
                replicated, jnp.asarray(a), a.shape))
            continue
        n_global = a.shape[0] * pc
        if n_global % n_data != 0:
            raise ValueError(
                f"global batch {n_global} does not divide the mesh's "
                f"'data' extent {n_data}; pick a batch_size divisible by "
                f"it (or pass global_multiple={n_data} to the loader) — "
                f"a multi-process run cannot fall back to replication, "
                f"no process holds the full batch")
        spec = list(grid_sharding.spec_for(i, a.ndim))
        # mirror GridBatchSharding.shard_batch: drop the x axis when the
        # spatial dim does not divide (one extra jit specialization,
        # correct results)
        for d, name in enumerate(spec):
            if name == "x" and a.shape[d] % n_x != 0:
                spec[d] = None
        global_shape = (n_global,) + a.shape[1:]
        out.append(jax.make_array_from_process_local_data(
            NamedSharding(mesh, P(*spec)), a, global_shape))
    return tuple(out)
