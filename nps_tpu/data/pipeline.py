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
    """Shuffled epoch iterator over an index-able dataset of 6-tuples."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0,
                 drop_last=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        for start in range(0, n, self.batch_size):
            idx = order[start:start + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                return
            yield collate([self.dataset[int(i)] for i in idx])


def device_put_batch(batch, sharding=None):
    """Stage a tuple of host arrays onto device(s).

    With a NamedSharding over the 'data' axis, each array is split on its
    leading (batch) dim across the mesh — the DP layer the reference lacks.
    """
    if sharding is None:
        return jax.device_put(batch)
    if hasattr(sharding, "shard_batch"):  # GridBatchSharding (data x spatial)
        return sharding.shard_batch(batch)
    n_shards = len(sharding.mesh.devices.flat)
    out = []
    for a in batch:
        if (a.ndim == 0 or a.shape[0] == 0 or a.size == 0
                or a.shape[0] % n_shards != 0):
            # remainder batches (batch % n_devices != 0) stay unsharded —
            # one extra jit specialization, correct metrics weighting
            out.append(jax.device_put(a))
        else:
            out.append(jax.device_put(a, sharding))
    return tuple(out)


def prefetch_to_device(iterator, sharding=None, size=2):
    """Background-thread prefetch: overlaps host batch assembly + H2D copies
    with device compute. Yields device-resident batches."""
    q = queue.Queue(maxsize=size)
    _END = object()
    err = []

    def worker():
        try:
            for batch in iterator:
                q.put(device_put_batch(batch, sharding))
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item


class VariableTimeLoader:
    """Loader for D.sim1d_var_t: a batch sampler picks element groups; the
    collate crops every element to the batch minimum (train, random window)
    or pads to the maximum (eval), both rounded to time_window multiples,
    and returns the lengths (parity: ``trainers/base.py:180-216`` +
    ``utils/collate_batch_helpers.py``)."""

    def __init__(self, dataset, batch_sampler, mode="min", time_window=25):
        from nps_tpu.utils.collate import collate_batch_sim

        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.mode = mode
        self.tw = time_window
        self._collate_u = collate_batch_sim(t_dim=1, mode=mode,
                                            tw=time_window)

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        for idxs in self.batch_sampler:
            els = [self.dataset[int(i)] for i in idxs]
            u_base = [e[0] for e in els]
            u = [e[1] for e in els]
            xs = np.stack([e[2] for e in els]).astype(np.float32)
            cond = [e[3] for e in els]
            t_cond = [e[4] for e in els]
            sc = [e[5] for e in els]

            lengths = np.array([el.shape[1] for el in u], np.int32)
            u = self._collate_u(u).astype(np.float32)
            u_base = (self._collate_u(u_base).astype(np.float32)
                      if sum(e.size for e in u_base) else
                      np.zeros((len(els), 0), np.float32))
            t_cond = (self._collate_u(t_cond).astype(np.float32)
                      if sum(e.size for e in t_cond) else
                      np.zeros((len(els), 0), np.float32))
            cond = (np.stack(cond).astype(np.float32)
                    if sum(e.size for e in cond) else
                    np.zeros((len(els), 0), np.float32))
            sc = (np.stack(sc).astype(np.float32)
                  if sum(e.size for e in sc) else
                  np.zeros((len(els), 0), np.float32))
            yield u_base, u, xs, cond, t_cond, sc, lengths
