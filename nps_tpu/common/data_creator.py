"""Time-window slicing for temporal bundling.

Capability parity with ``src/common/data_creator.py``'s ``create_data``
(``data_creator.py:48-78``): per-element input windows [step-tw, step) and
label windows [step, step+tw). Two implementations:

- :func:`create_data` — host/numpy, validity-asserting (the trainer's
  eval paths use static steps, so this is plain slicing);
- :func:`create_data_jax` — traced, a vmapped ``lax.dynamic_slice`` for
  per-element random steps inside jitted train steps.

The graph-construction path (``create_graph`` / ``create_next_graph``) is
deprecated in the reference itself (``enc_proc_dec.py:140``) and out of
scope (see SURVEY.md §7 non-goals).
"""

import numpy as np


class DataCreator:
    def __init__(self, pde, neighbors=2, time_window=5, t_resolution=250,
                 x_resolution=100):
        self.pde = pde
        self.n = int(neighbors)
        self.tw = int(time_window)
        self.t_res = int(t_resolution)
        self.x_res = x_resolution

    def create_data(self, datapoints, steps, mode="both"):
        return create_data(datapoints, steps, self.tw, mode)


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
