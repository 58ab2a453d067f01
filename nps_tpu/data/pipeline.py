"""Host -> device input pipeline.

The reference relies on torch DataLoader workers + pin_memory
(``src/trainers/base.py:157-217``). The TPU-native replacement is a numpy
batcher with a background prefetch thread that stages batches onto the
device (optionally sharded across a mesh's 'data' axis) while the current
step computes — double-buffered ``jax.device_put`` per SURVEY.md §7.
"""

import queue
import threading

import numpy as np
import jax
import jax.numpy as jnp


def collate(elements):
    """Stack a list of 6-tuples into batch arrays; empty roles -> [b, 0]."""
    n = len(elements)
    out = []
    for i in range(len(elements[0])):
        parts = [e[i] for e in elements]
        if parts[0].size == 0:
            out.append(np.zeros((n, 0), dtype=np.float32))
        else:
            out.append(np.stack(parts).astype(np.float32, copy=False))
    return tuple(out)


class HostDataLoader:
    """Shuffled epoch iterator over an index-able dataset of 6-tuples.

    Multi-host: when ``process_count > 1`` (defaults read from
    ``jax.process_index()/process_count()``), every process derives the
    identical global epoch order from the shared ``seed`` and collates
    only its contiguous slice of each global batch; ragged trailing
    batches are trimmed to ``global_multiple`` (default: the process
    count; pass the mesh's 'data' extent so every batch stays shardable).
    ``__len__`` and the yielded order are identical across the fleet —
    see ``nps_tpu.parallel.multihost``.
    """

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=False, process_index=None, process_count=None,
                 global_multiple=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        self.global_multiple = (self.process_count if global_multiple is None
                                else global_multiple)
        assert self.global_multiple % self.process_count == 0, \
            "global_multiple must be a multiple of the process count"
        if self.process_count > 1 and batch_size < self.global_multiple:
            raise ValueError(
                f"batch_size={batch_size} < global_multiple="
                f"{self.global_multiple}: every batch would trim to zero; "
                f"use a global batch size of at least the mesh's 'data' "
                f"extent")
        if self.process_count > 1 and not self._global_batch_sizes():
            raise ValueError(
                f"every batch of this split trims to zero under "
                f"global_multiple={self.global_multiple} (split has "
                f"{len(dataset)} elements): a multi-process run needs "
                f"every split to hold at least global_multiple elements")

    def _global_batch_sizes(self):
        """Per-batch GLOBAL element counts for one epoch (same fleet-wide)."""
        n = len(self.dataset)
        sizes = []
        for start in range(0, n, self.batch_size):
            size = min(self.batch_size, n - start)
            if self.drop_last and size < self.batch_size:
                break
            if self.process_count > 1:
                size -= size % self.global_multiple
                if size == 0:
                    continue
            sizes.append(size)
        return sizes

    def __len__(self):
        return len(self._global_batch_sizes())

    def __iter__(self):
        from nps_tpu.parallel.multihost import shard_indices_for_process

        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            if self.process_count > 1:
                idx = idx[:len(idx) - len(idx) % self.global_multiple]
                if len(idx) == 0:
                    continue
                idx = shard_indices_for_process(
                    idx, self.process_index, self.process_count)
            yield collate([self.dataset[int(i)] for i in idx])


def device_put_batch(batch, sharding=None):
    """Stage a tuple of host arrays onto device(s).

    With a NamedSharding over the 'data' axis, each array is split on its
    leading (batch) dim across the mesh — the DP layer the reference lacks.
    """
    if sharding is None:
        # leave device-resident arrays (e.g. DeviceCacheLoader gathers)
        # alone: re-putting a committed array is NOT free on every
        # platform (on axon it round-trips through the host)
        return tuple(a if isinstance(a, jax.Array) else jax.device_put(a)
                     for a in batch)
    if hasattr(sharding, "shard_batch"):  # GridBatchSharding (data x spatial)
        if jax.process_count() > 1:
            # multi-host spatial: per-process batch slices lift into
            # ("data","x") global arrays (parallel.multihost)
            from nps_tpu.parallel.multihost import assemble_global_grid_batch

            return assemble_global_grid_batch(batch, sharding)
        return sharding.shard_batch(batch)
    if jax.process_count() > 1:
        # multi-host: each process holds only its slice of the global
        # batch; lift to global jax.Arrays (parallel.multihost)
        from nps_tpu.parallel.multihost import assemble_global_batch

        return assemble_global_batch(batch, sharding)
    # divisibility only matters along the batch-sharded axis (a dp x tp
    # mesh shards batches over "data" alone, not over all devices)
    n_shards = dict(sharding.mesh.shape).get(
        "data", len(sharding.mesh.devices.flat))
    out = []
    for a in batch:
        if isinstance(a, jax.Array) and a.sharding == sharding:
            out.append(a)
        elif a.ndim == 0:
            # scalars replicate on the mesh: a single-device scalar next
            # to mesh-placed params breaks AOT lowering (compile-ahead)
            from jax.sharding import NamedSharding, PartitionSpec as P

            out.append(jax.device_put(a, NamedSharding(sharding.mesh, P())))
        elif a.shape[0] % n_shards != 0:
            # remainder batches (batch % n_devices != 0) stay unsharded —
            # one extra jit specialization, correct metrics weighting
            out.append(jax.device_put(a))
        else:
            # includes zero-size arrays with a divisible leading dim
            # (empty t_cond/u_base): sharding zero bytes is free and keeps
            # EVERY steady-state batch leaf on the same device set, which
            # AOT lowering (compile-ahead) requires
            out.append(jax.device_put(a, sharding))
    return tuple(out)


def prefetch_to_device(iterator, sharding=None, size=2):
    """Background-thread prefetch: overlaps host batch assembly + H2D copies
    with device compute. Yields device-resident batches.

    The consumer may stop early (``max_train_batches``, an exception in the
    step) — the generator's ``finally`` sets a stop event and drains the
    queue so the worker exits instead of blocking forever on a full queue
    (which would leak one thread + prefetched HBM buffers per epoch)."""
    q = queue.Queue(maxsize=size)
    _END = object()
    err = []
    stop = threading.Event()

    def worker():
        try:
            for batch in iterator:
                item = device_put_batch(batch, sharding)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            while not stop.is_set():  # consumer gone -> stop covers shutdown
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        while True:  # release a worker blocked on a full queue
            try:
                q.get_nowait()
            except queue.Empty:
                break


class DeviceCacheLoader:
    """Device-resident dataset cache: batches come from HBM gathers.

    For fixed-shape datasets that fit device memory (the twophase train
    split is ~GBs vs 16 GB HBM/chip), the whole split is staged onto the
    device ONCE at construction; each epoch then shuffles indices on the
    host and yields batches gathered on-device (``jnp.take`` per role) —
    no per-batch host collate and no host->device trajectory copy. This is
    a TPU-native layer the torch reference cannot express (its DataLoader
    re-stages every batch, ``src/trainers/base.py:157-217``); it
    eliminates the input-pipeline tax entirely on platforms where H2D
    is expensive (e.g. tunneled devices).

    Yields the same 6-tuple layout as :class:`HostDataLoader` + collate,
    so trainers consume it unchanged (``device_put`` on an already
    device-committed array is a no-op).
    """

    device_resident = True  # trainers skip the host-prefetch wrapper

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=False, sharding=None, cache_dtype=None):
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        n = len(dataset)
        host = collate([dataset[i] for i in range(n)])
        if cache_dtype is not None:
            # cast float roles on the HOST before staging: halves both the
            # one-time H2D fill and the cache's HBM residency (e.g. the
            # 512^2 ns512 train split: 5.5 GB f32 -> 2.75 GB bf16). The
            # jitted train step casts to compute_dtype anyway, so a bf16
            # cache feeds the same program inputs at bf16 label rounding;
            # keep eval splits uncached (or f32-cached) for f32-exact
            # metrics.
            cache_dtype = jnp.dtype(cache_dtype)
            host = tuple(a.astype(cache_dtype)
                         if np.issubdtype(a.dtype, np.floating) else a
                         for a in host)

        def put(a):
            # shard the cache's element axis when the DP sharding divides
            # it; otherwise stage unsharded (GridBatchSharding and ragged
            # counts fall back — the jitted step reshards its inputs)
            if (sharding is not None and hasattr(sharding, "mesh")
                    and a.ndim > 0 and a.shape[0] > 0
                    and a.shape[0] % len(sharding.mesh.devices.flat) == 0):
                return jax.device_put(a, sharding)
            return jax.device_put(a)

        self._cache = tuple(put(a) for a in host)
        self._n = n
        self._gather = jax.jit(
            lambda cache, idx: tuple(
                a if a.shape[1:] == (0,) else jnp.take(a, idx, axis=0)
                for a in cache))

    def __len__(self):
        if self.drop_last:
            return self._n // self.batch_size
        return (self._n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        order = np.arange(self._n)
        if self.shuffle:
            self._rng.shuffle(order)
        for start in range(0, self._n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            batch = self._gather(self._cache, jnp.asarray(idx))
            # empty roles keep their [b, 0] host shape contract
            yield tuple(
                np.zeros((len(idx), 0), np.float32)
                if b.shape[1:] == (0,) else b
                for b in batch)


class VariableTimeLoader:
    """Loader for D.sim1d_var_t: a batch sampler picks element groups; the
    collate crops every element to the batch minimum (train, random window)
    or pads to the maximum (eval), both rounded to time_window multiples,
    and returns the lengths (parity: ``trainers/base.py:180-216`` +
    ``utils/collate_batch_helpers.py``).

    Multi-process: like :class:`HostDataLoader`, every process runs the
    identical seeded batch sampler (same global batches, same per-batch
    unroll depths), computes the crop/pad extent and crop starts over the
    GLOBAL batch from length metadata, then materialises only its
    contiguous slice; ``device_put_batch`` assembles the slices into
    global ``jax.Array``s. Evaluation lengths are per-slice and assemble
    into a batch-sharded global vector (the mask is built on-device from
    it — ``pushforward.test_step``)."""

    def __init__(self, dataset, batch_sampler, mode="min", time_window=25,
                 seed=0, process_index=None, process_count=None,
                 global_multiple=None):
        from nps_tpu.utils.collate import collate_batch_sim

        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.mode = mode
        self.tw = time_window
        self._collate_u = collate_batch_sim(t_dim=1, mode=mode,
                                            tw=time_window)
        # crop-window RNG owned by the loader (not the global np.random
        # stream): in a multi-process fleet every process must draw the
        # SAME starts for the same global batch, which only holds if the
        # stream cannot be perturbed by unrelated process-local code
        self._rng = np.random.default_rng(seed)
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        self.global_multiple = (self.process_count if global_multiple is None
                                else global_multiple)
        assert self.global_multiple % self.process_count == 0, \
            "global_multiple must be a multiple of the process count"
        # per-element time lengths as metadata (no element IO): sampler
        # already computed them; fall back to a local scan for custom
        # samplers without the attribute
        lengths = getattr(batch_sampler, "lengths", None)
        if lengths is None:
            lengths = np.array([dataset[i][1].shape[1]
                                for i in range(len(dataset))])
        self._lengths = np.asarray(lengths)
        # surviving-batch accounting under global trimming: a ragged
        # final batch shrinks to a multiple of global_multiple and is
        # dropped fleet-wide when it trims to zero — __len__ must count
        # only yielded batches (it is the trainer's loss denominator)
        self._n_batches = len(batch_sampler)
        if self.process_count > 1:
            bs = getattr(batch_sampler, "batch_size", None)
            wr = getattr(batch_sampler, "with_replacement", None)
            if bs is not None and wr is not None:
                n = len(dataset)
                sizes = ([bs] * len(batch_sampler) if wr else
                         [min(bs, n - s) for s in range(0, n, bs)])
                gm = self.global_multiple
                self._n_batches = sum(1 for s in sizes if s - s % gm > 0)
            if self._n_batches == 0:
                raise ValueError(
                    f"every batch of this split trims to zero under "
                    f"global_multiple={self.global_multiple} "
                    f"(split has {len(dataset)} elements, batch_size="
                    f"{bs}): a multi-process run needs every split to "
                    f"hold at least global_multiple elements")

    def __len__(self):
        return self._n_batches

    def __iter__(self):
        from nps_tpu.parallel.multihost import process_slice
        from nps_tpu.utils.collate import min_crop_starts

        pc, pi, gm = self.process_count, self.process_index, \
            self.global_multiple
        for idxs in self.batch_sampler:
            idxs = [int(i) for i in idxs]
            if pc > 1:
                # trim ragged tails so the global batch shards evenly
                # (only a sampler's final batch can be short, so yielded
                # batch indices stay aligned with sampler batch indices)
                idxs = idxs[:len(idxs) - len(idxs) % gm]
                if not idxs:
                    continue
            # crop/pad extent + crop starts over the GLOBAL batch: drawn
            # identically (lockstep RNG) on every process, then sliced
            lengths_g = self._lengths[idxs]
            if self.mode == "min":
                shape_t = int(lengths_g.min())
                shape_t -= shape_t % self.tw
                starts_g = min_crop_starts(lengths_g, self.tw,
                                           rng=self._rng)
            else:
                shape_t = int(lengths_g.max())
                if shape_t % self.tw:
                    shape_t += self.tw - shape_t % self.tw
                starts_g = None
            if pc > 1:
                lo, hi = process_slice(len(idxs), pi, pc)
                idxs = idxs[lo:hi]
                starts_g = starts_g[lo:hi] if starts_g is not None else None
            els = [self.dataset[int(i)] for i in idxs]
            u_base = [e[0] for e in els]
            u = [e[1] for e in els]
            xs = np.stack([e[2] for e in els]).astype(np.float32)
            cond = [e[3] for e in els]
            t_cond = [e[4] for e in els]
            sc = [e[5] for e in els]

            lengths = np.array([el.shape[1] for el in u], np.int32)
            # one start per element, shared by every role: the state
            # window, base solution, and BC drive stay time-aligned
            # (utils.collate.min_crop_starts; drawn above over the GLOBAL
            # batch so every process crops the same windows)
            starts = starts_g
            u = self._collate_u(u, starts=starts,
                                shape_t=shape_t).astype(np.float32)
            u_base = (self._collate_u(u_base, starts=starts, shape_t=shape_t)
                      .astype(np.float32)
                      if sum(e.size for e in u_base) else
                      np.zeros((len(els), 0), np.float32))
            t_cond = (self._collate_u(t_cond, starts=starts, shape_t=shape_t)
                      .astype(np.float32)
                      if sum(e.size for e in t_cond) else
                      np.zeros((len(els), 0), np.float32))
            cond = (np.stack(cond).astype(np.float32)
                    if sum(e.size for e in cond) else
                    np.zeros((len(els), 0), np.float32))
            sc = (np.stack(sc).astype(np.float32)
                  if sum(e.size for e in sc) else
                  np.zeros((len(els), 0), np.float32))
            yield u_base, u, xs, cond, t_cond, sc, lengths
