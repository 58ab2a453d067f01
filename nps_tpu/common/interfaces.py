"""Framework "type system": data-shape and model-kind enums.

Capability parity with the reference's coupling contract
(``src/common/interfaces.py:4-13``): every dataset declares a
``data_interface``, every model a ``model_interface`` plus the list of data
interfaces it supports, every trainer the lists it supports; the trainer
asserts 3-way compatibility before running.
"""

from enum import Enum


class D(Enum):
    """Data interface: the shape contract of one dataset element."""

    sim1d = 0        # (c, t, x)
    sim2d = 1        # (c, t, x, y)
    sim1d_var_t = 2  # (c, t, x) with per-element t


class M(Enum):
    """Model interface: the calling convention of a model family."""

    AR_TB_GNN = 0  # autoregressive + temporal bundling + GNN (deprecated upstream)
    AR_TB = 1      # autoregressive + temporal bundling
