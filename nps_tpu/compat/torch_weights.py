"""Load PyTorch reference checkpoints into nps_tpu parameter trees.

Users of yoeripoels/neural-pde-surrogates save ``model.state_dict()`` files
(``src/trainers/base.py:349-355``). This module converts such a state dict
into the flax parameter pytree of the equivalent nps_tpu model, performing
the layout transforms between torch and TPU-native conventions:

- Conv weight          [O, I, *k]  -> [*k, I, O]
- ConvTranspose weight [I, O, *k]  -> [*k, I, O]
- Linear weight        [O, I]      -> [I, O]
- GroupNorm weight/bias            -> scale/bias
- complex spectral weights [i,o,*m] -> split real/imag [2, i, o, *m]

It is also the engine of the golden parity tests
(tests/test_parity_reference.py), which transplant reference weights and
require forward outputs to match within tolerance.
"""

import re

import numpy as np


# (torch key regex -> flax path template) applied in order; the first match
# group-substitutes into a '/'-separated flax path. Unmatched segments pass
# through unchanged.
_SEGMENT_RULES = [
    # container/list indices
    (re.compile(r"^processor\.(\d+)\."), r"processor_\1/"),
    (re.compile(r"\bfno_layers\.(\d+)\."), r"fno_layers_\1/"),
    (re.compile(r"\bunet_layers\.(\d+)\."), r"unet_layers_\1/"),
    (re.compile(r"\bdown\.(\d+)\."), r"down_\1/"),
    (re.compile(r"\bup\.(\d+)\."), r"up_\1/"),
    # DRN: processor.{b}.layers.{2l}. -> block_{b}/conv_{l}/
    (re.compile(r"\bprocessor\.(\d+)\.layers\.(\d+)\."),
     lambda m: f"block_{m.group(1)}/conv_{int(m.group(2)) // 2}/"),
    # sequential encoders/decoders: .0 / .2 conv slots
    (re.compile(r"\bencoder\.encoder\.(\d+)\."), r"encoder/encoder_\1/"),
    (re.compile(r"\bdecoder\.decoder\.(\d+)\."), r"decoder/decoder_\1/"),
    # BCEncoder sequential: 0 -> conv_in, 2k -> conv_h{k-1}, last -> out
    # handled separately in _translate (needs layer count)
]

_DOT_FINAL = re.compile(r"\.(weight|bias|weights\d+)$")


def _translate_key(key):
    """Translate a torch state_dict key to a flax '/'-separated path."""
    # leaf name
    m = _DOT_FINAL.search(key)
    if not m:
        raise ValueError(f"Unrecognized torch parameter key '{key}'")
    leaf = m.group(1)
    body = key[: m.start()]

    path = body + "."
    for pat, repl in _SEGMENT_RULES:
        path = pat.sub(repl, path)

    # BCEncoder sequential indices: bc_encoder.bc_encoder.N
    def bc_repl(mo):
        idx = int(mo.group(1))
        if idx == 0:
            return "bc_encoder/conv_in/"
        return f"bc_encoder/conv_h{idx // 2 - 1}/"

    path = re.sub(r"bc_encoder\.bc_encoder\.(\d+)\.", bc_repl, path)

    # remaining dots become slashes
    path = path.replace(".", "/").strip("/")

    if leaf == "weight":
        leaf = "kernel"  # renamed again to scale for norms during transform
    return path, leaf


def _is_transpose_conv(path):
    """Only UNet Upsample convs are transposed (``proc_unet_modern.py:425``)."""
    return re.search(r"up_\d+/conv$", path) is not None


def _is_norm(path):
    return re.search(r"(^|/)(norm\d?|norm)$", path) is not None


def convert_state_dict(state_dict, bc_encoder_linear_index=None):
    """Convert a torch state dict (tensor or ndarray values) into a nested
    flax params dict ({'params': {...}})."""
    out = {}
    # detect the BCEncoder trailing Linear (highest sequential index)
    bc_idxs = [int(m.group(1)) for k in state_dict
               for m in [re.match(r"bc_encoder\.bc_encoder\.(\d+)\.weight", k)]
               if m]
    bc_linear_idx = max(bc_idxs) if bc_idxs else None

    for key, val in state_dict.items():
        arr = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach")
                         else val)
        # BCEncoder final linear special-case before generic translation
        m = re.match(r"(.*?)bc_encoder\.bc_encoder\.(\d+)\.(weight|bias)$", key)
        if m and int(m.group(2)) == bc_linear_idx:
            path = (m.group(1).replace(".", "/") + "bc_encoder/out").strip("/")
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            arr = arr.T if leaf == "kernel" else arr
            _set(out, path.split("/") + [leaf], arr.astype(np.float32))
            continue

        path, leaf = _translate_key(key)

        if leaf.startswith("weights") and np.iscomplexobj(arr):
            arr = np.stack([arr.real, arr.imag]).astype(np.float32)
        elif leaf == "kernel":
            if _is_norm(path):
                leaf = "scale"  # GroupNorm weight
            elif arr.ndim == 2:
                arr = arr.T  # Linear
            elif arr.ndim >= 3:
                nd = arr.ndim - 2
                if _is_transpose_conv(path):
                    # [I, O, *k] -> [*k, I, O]
                    arr = np.transpose(arr, tuple(range(2, 2 + nd)) + (0, 1))
                else:
                    # [O, I, *k] -> [*k, I, O]
                    arr = np.transpose(arr, tuple(range(2, 2 + nd)) + (1, 0))
        _set(out, path.split("/") + [leaf], arr.astype(np.float32))

    return {"params": out}


def _set(tree, path, val):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = val


def load_torch_checkpoint(path, wrap_inner=True):
    """Load a reference ``*.pt`` state-dict file into a flax params tree.

    wrap_inner: nest under 'inner' (the ActivationWrapper child name) —
    reference checkpoints from wrapped models have no prefix, but nps_tpu
    wrapped models nest the EncProcDec under 'inner'.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    params = convert_state_dict(sd)
    if wrap_inner:
        params = {"params": {"inner": params["params"]}}
    return params


def assert_params_match_structure(converted, target):
    """Check the converted tree covers exactly the target tree's leaves."""
    import jax

    c_paths = {"/".join(str(k.key) for k in p)
               for p, _ in jax.tree_util.tree_flatten_with_path(converted)[0]}
    t_paths = {"/".join(str(k.key) for k in p)
               for p, _ in jax.tree_util.tree_flatten_with_path(target)[0]}
    missing = t_paths - c_paths
    extra = c_paths - t_paths
    if missing or extra:
        raise ValueError(
            f"param structure mismatch:\n missing ({len(missing)}): "
            f"{sorted(missing)[:8]}\n extra ({len(extra)}): {sorted(extra)[:8]}")
