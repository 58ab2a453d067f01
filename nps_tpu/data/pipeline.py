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
