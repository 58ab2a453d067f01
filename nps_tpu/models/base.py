"""Model interface contract.

Parity: ``src/models/base.py`` — every model exposes ``model_interface``
(an ``M`` enum) and ``data_interface`` (a collection of ``D`` enums); the
trainer asserts 3-way compatibility. In this build the conditioning
embedding lives inside ``EncProcDec.__call__`` (it needs the flax module
tree), so the base class is just the contract.
"""

from nps_tpu.common.interfaces import D, M  # noqa: F401


class ModelInterface:
    model_interface = None
    data_interface = ()
