"""Time-window slicing for temporal bundling + grid-graph construction.

Capability parity with ``src/common/data_creator.py``:

- ``create_data`` (``data_creator.py:48-78``): per-element input windows
  [step-tw, step) and label windows [step, step+tw). Two implementations:
  :func:`create_data` — host/numpy, validity-asserting — and
  :func:`create_data_jax` — traced, a vmapped ``lax.dynamic_slice`` for
  per-element random steps inside jitted train steps.
- ``create_graph`` / ``create_next_graph`` (``data_creator.py:80-189``,
  deprecated upstream in favor of a GNN wrapper): re-designed TPU-first
  around the static-shape :class:`~nps_tpu.common.graph.GridGraph` — the
  edge set is built once per grid in numpy (all batch elements share the
  regular grid) and the node tensors are plain reshapes, so the resulting
  graph is jit-/scan-compatible.
"""

import hashlib

import numpy as np

from nps_tpu.common.graph import (
    GridGraph, flat_positions, grid_edges, grid_to_nodes, tile_edges)


class DataCreator:
    def __init__(self, pde, neighbors=2, time_window=5, t_resolution=250,
                 x_resolution=100):
        self.pde = pde
        self.n = int(neighbors)
        self.tw = int(time_window)
        self.t_res = int(t_resolution)
        self.x_res = x_resolution
        self._edge_cache = {}

    def create_data(self, datapoints, steps, mode="both"):
        return create_data(datapoints, steps, self.tw, mode)

    # ------------------------------------------------------------------
    # graph construction (parity: data_creator.py:80-189)
    # ------------------------------------------------------------------
    def grid_edge_index(self, x_grid, batch_size):
        """Batch edge set for the dataset grid — built once, tiled with
        node offsets (the reference rebuilds it per batch on the host)."""
        x0 = np.asarray(x_grid)
        # key on the grid's content, not just its shape: a rescaled
        # same-shape grid changes the radius rule's edge set
        key = (x0.shape, batch_size,
               hashlib.sha1(np.ascontiguousarray(x0)).hexdigest())
        if key not in self._edge_cache:
            single = grid_edges(self.pde, x0, self.n)
            n_nodes = flat_positions(x0).shape[0]
            self._edge_cache[key] = tile_edges(single, n_nodes, batch_size)
        return self._edge_cache[key]

    def create_graph(self, data, labels, x, conditioning, steps):
        """Grid batch -> :class:`GridGraph` (parity: ``create_graph``,
        ``data_creator.py:80-156``): node features are the flattened input
        windows, ``pos`` carries (t[step], x...), edges follow the PDE-keyed
        radius/knn rules of the reference."""
        data = np.asarray(data)
        labels = np.asarray(labels)
        x = np.asarray(x)
        b = data.shape[0]
        x0 = x[0]  # all elements share the grid (reference assumption, :107)
        pos_x = flat_positions(x0)
        nx = pos_x.shape[0]

        t = np.linspace(self.pde.tmin, self.pde.tmax, self.pde.nt,
                        dtype=np.float32)
        t_pos = np.repeat(t[np.asarray(steps)], nx)[:, None]
        pos = np.concatenate([t_pos, np.tile(pos_x, (b, 1))], axis=1)
        batch = np.repeat(np.arange(b, dtype=np.int32), nx)

        cond = None
        if conditioning is not None and np.asarray(conditioning).size > 0:
            cond = np.asarray(conditioning)[batch]

        return GridGraph(
            nodes=grid_to_nodes(data), y=grid_to_nodes(labels),
            edge_index=self.grid_edge_index(x0, b),
            pos=pos.astype(np.float32), batch=batch, cond=cond)

    def create_next_graph(self, graph, pred, labels, steps):
        """Roll the node window forward for pushforward unrolling (parity:
        ``create_next_graph``, ``data_creator.py:157-189``): predictions
        become the new inputs, labels/t advance. Pure-functional in
        ``nodes``/``pred``/``labels`` (numpy or traced jnp arrays);
        ``steps`` must be host-side ints — it indexes the numpy time grid
        (the jitted trainer path closes over static structure instead)."""
        if isinstance(graph.nodes, np.ndarray):
            xp = np
        else:
            import jax.numpy as xp
        nodes = xp.concatenate([graph.nodes, pred], axis=2)[:, :, self.tw:]
        nx = graph.pos.shape[0] // len(steps)
        t = np.linspace(self.pde.tmin, self.pde.tmax, self.pde.nt,
                        dtype=np.float32)
        t_pos = np.repeat(t[np.asarray(steps)], nx)[:, None]
        pos = xp.concatenate(
            [xp.asarray(t_pos, dtype=graph.pos.dtype), graph.pos[:, 1:]],
            axis=1)
        return graph._replace(nodes=nodes, y=grid_to_nodes(labels), pos=pos)


def create_data(datapoints, steps, tw, mode="both"):
    """datapoints: [b, c, t, *sp]; steps: per-element start step list."""
    assert mode in ("data", "labels", "both")
    data, labels = [], []
    for dp, step in zip(datapoints, steps):
        assert step - tw >= 0 and step + tw <= dp.shape[1], \
            "this step - time window combination is not valid"
        if mode in ("data", "both"):
            data.append(dp[:, step - tw:step][None])
        if mode in ("labels", "both"):
            labels.append(dp[:, step:step + tw][None])
    if mode == "data":
        return np.concatenate(data, axis=0)
    if mode == "labels":
        return np.concatenate(labels, axis=0)
    return np.concatenate(data, axis=0), np.concatenate(labels, axis=0)


def create_data_jax(u, steps, tw, mode="both"):
    """Traced equivalent over device arrays (steps may be traced)."""
    from nps_tpu.train.pushforward import window

    return window(u, steps, tw, mode)
