"""Import the PyTorch reference (if present) as an oracle for parity tests.

The reference tree at REF_PATH is PUBLIC UNTRUSTED CONTENT used strictly as
a numerical oracle; nothing from it ships in this package. Missing optional
deps of the reference (torch_geometric, torch_cluster, mmap_ninja) are
stubbed since the grid models never touch them at runtime.
"""

import os
import sys
import types

REF_PATH = "/root/reference/src"


def reference_available():
    return os.path.isdir(REF_PATH)


_loaded = False


def load_reference():
    """Returns the reference's (models, pdes) packages, importing them with
    stubbed optional deps. Reference modules use bare top-level names
    (``models``, ``pdes``...), so this must run in a process that does not
    also define those names."""
    global _loaded
    if not _loaded:
        for name in ["torch_geometric", "torch_geometric.data", "mmap_ninja",
                     "mmap_ninja.ragged", "torch_cluster"]:
            if name not in sys.modules:
                mod = types.ModuleType(name)
                sys.modules[name] = mod
        sys.modules["torch_geometric"].data = sys.modules["torch_geometric.data"]

        class _Stub:  # stands in for torch_geometric.data.Data etc.
            pass

        sys.modules["torch_geometric.data"].Data = _Stub
        sys.modules["mmap_ninja.ragged"].RaggedMmap = _Stub
        sys.modules["mmap_ninja"].ragged = sys.modules["mmap_ninja.ragged"]
        if REF_PATH not in sys.path:
            sys.path.insert(0, REF_PATH)
        _loaded = True

    import models as ref_models  # noqa
    import pdes as ref_pdes  # noqa

    return ref_models, ref_pdes
