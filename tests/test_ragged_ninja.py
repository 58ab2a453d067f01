"""mmap_ninja interop: reference-produced RaggedMmap directories load
unchanged (VERDICT r3 missing #5).

mmap_ninja is not installed here (and there is no egress), so the fixture
writes directories in the library's on-disk convention — the flat ravelled
buffer as ``data.ninja`` + ``dtype/shape/order.ninja`` sidecars, ragged
metadata (start offsets, flattened shapes) as nested one-array
subdirectories in the same convention — and the tests pin that
``RaggedMemmap.from_mmap_ninja`` / ``open_ragged`` reconstruct the original
element list across the naming/layout variants the reader supports, and
REFUSE (loudly) stores whose metadata doesn't validate structurally.
"""

import os

import numpy as np
import pytest

from nps_tpu.data.ragged import (MmapNinjaReader, RaggedMemmap, open_ragged)


def _write_ninja_array(dirname, arr, order="C", shape_as_text=True):
    os.makedirs(dirname, exist_ok=True)
    arr = np.asarray(arr)
    with open(os.path.join(dirname, "data.ninja"), "wb") as f:
        f.write(arr.tobytes(order))
    with open(os.path.join(dirname, "dtype.ninja"), "w") as f:
        f.write(arr.dtype.name)
    if shape_as_text:
        with open(os.path.join(dirname, "shape.ninja"), "w") as f:
            f.write("(" + ", ".join(str(s) for s in arr.shape) + ")")
    else:
        with open(os.path.join(dirname, "shape.ninja"), "wb") as f:
            f.write(np.asarray(arr.shape, np.int64).tobytes())
    with open(os.path.join(dirname, "order.ninja"), "w") as f:
        f.write(order)


def _elements(seed=0, n=6, ndim=2):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        shape = tuple(int(rng.integers(2, 7)) for _ in range(ndim))
        out.append(rng.random(shape).astype(np.float32))
    return out


def _write_ninja_ragged(dirname, elements, starts_name="starts",
                        shapes_name="flattened_shapes", with_ends=False,
                        starts_np1=False, shapes_2d=False,
                        shape_as_text=True):
    """A RaggedMmap-convention directory with selectable metadata naming."""
    flat = np.concatenate([e.ravel() for e in elements])
    _write_ninja_array(dirname, flat, shape_as_text=shape_as_text)
    sizes = [e.size for e in elements]
    offsets = np.zeros(len(elements) + 1, np.int64)
    np.cumsum(sizes, out=offsets[1:])
    starts = offsets if starts_np1 else offsets[:-1]
    _write_ninja_array(os.path.join(dirname, starts_name), starts,
                       shape_as_text=shape_as_text)
    if with_ends:
        _write_ninja_array(os.path.join(dirname, "ends"), offsets[1:],
                           shape_as_text=shape_as_text)
    shapes = np.array([e.shape for e in elements], np.int64)
    if not shapes_2d:
        shapes = shapes.ravel()
    _write_ninja_array(os.path.join(dirname, shapes_name), shapes,
                       shape_as_text=shape_as_text)


def _assert_roundtrip(reader, elements):
    assert len(reader) == len(elements)
    for i, e in enumerate(elements):
        np.testing.assert_array_equal(np.asarray(reader[i]), e)


@pytest.mark.parametrize("variant", [
    dict(),                                             # starts + flat shapes
    dict(with_ends=True),                               # starts + ends
    dict(starts_np1=True),                              # [n+1] offsets
    dict(shapes_2d=True),                               # [n, ndim] shapes
    dict(starts_name="offsets", shapes_name="shapes"),  # alt naming
    dict(shape_as_text=False),                          # binary shape files
])
def test_from_mmap_ninja_roundtrip(tmp_path, variant):
    elements = _elements()
    d = str(tmp_path / "rag")
    _write_ninja_ragged(d, elements, **variant)
    _assert_roundtrip(RaggedMemmap.from_mmap_ninja(d), elements)


def test_open_ragged_autodetects_both_layouts(tmp_path):
    elements = _elements(seed=3)
    d_ninja = str(tmp_path / "ninja")
    _write_ninja_ragged(d_ninja, elements)
    assert isinstance(open_ragged(d_ninja), MmapNinjaReader)
    _assert_roundtrip(open_ragged(d_ninja), elements)

    d_native = str(tmp_path / "native")
    RaggedMemmap.save(d_native, elements)
    assert isinstance(open_ragged(d_native), RaggedMemmap)
    _assert_roundtrip(open_ragged(d_native), elements)


def test_mixed_ndim_via_shapes_offsets(tmp_path):
    rng = np.random.default_rng(1)
    elements = [rng.random((4,)).astype(np.float32),
                rng.random((2, 3)).astype(np.float32),
                rng.random((2, 2, 2)).astype(np.float32)]
    d = str(tmp_path / "mix")
    flat = np.concatenate([e.ravel() for e in elements])
    _write_ninja_array(d, flat)
    offsets = np.array([0, 4, 10, 18], np.int64)
    _write_ninja_array(os.path.join(d, "starts"), offsets)
    flat_shapes = np.array([4, 2, 3, 2, 2, 2], np.int64)
    _write_ninja_array(os.path.join(d, "flattened_shapes"), flat_shapes)
    _write_ninja_array(os.path.join(d, "shapes_offsets"),
                       np.array([0, 1, 3, 6], np.int64))
    _assert_roundtrip(RaggedMemmap.from_mmap_ninja(d), elements)


def test_refuses_inconsistent_metadata(tmp_path):
    elements = _elements(seed=2)
    d = str(tmp_path / "bad")
    _write_ninja_ragged(d, elements)
    # corrupt the shapes array: extents no longer match
    bad = np.array([e.shape for e in elements], np.int64).ravel() + 1
    _write_ninja_array(os.path.join(d, "flattened_shapes"), bad)
    with pytest.raises(ValueError, match="extent|metadata"):
        RaggedMemmap.from_mmap_ninja(d)


def test_converter_streams_to_native_layout(tmp_path):
    from tools.convert_ragged import convert

    elements = _elements(seed=4)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _write_ninja_ragged(src, elements)
    n = convert(src, dst)
    assert n == len(elements)
    _assert_roundtrip(RaggedMemmap(dst), elements)


def test_var_t_dataset_loads_ninja_store(tmp_path):
    """End-to-end: a var-t dataset whose snapshots/conditioning stores are
    mmap_ninja directories loads through the shipped dataset class."""
    from nps_tpu.data.pde1d_var_t import PDE1DVarTDataset
    from nps_tpu.utils.io import save_yaml

    rng = np.random.default_rng(7)
    nx = 16
    sims, conds = [], []
    for t_i in (30, 41, 35, 52, 38, 44, 33, 47):
        sims.append(rng.random((1, t_i, nx)).astype(np.float32))
        conds.append(rng.random((2,)).astype(np.float32))
    d = tmp_path / "exp"
    os.makedirs(d, exist_ok=True)
    _write_ninja_ragged(str(d / "snapshots"), sims)
    _write_ninja_ragged(str(d / "conditioning"), conds)
    save_yaml(str(d / "snapshots.yaml"), dict(
        x=[float(v) for v in np.linspace(0, 1, nx)], tmin=0.0, tmax=10.0,
        dt=10.0 / 51))
    save_yaml(str(d / "split.yaml"), dict(train=[0, 1, 2, 3, 4, 5],
                                          valid=[6], test=[7]))
    ds = PDE1DVarTDataset(
        base_path=str(tmp_path), experiment="exp", data_file="snapshots",
        conditioning="conditioning", split_file="split", name="var1d")
    el = ds.train[0]
    u = np.asarray(el[1])
    assert u.shape[0] == 1 and u.shape[2] == nx
    np.testing.assert_array_equal(u, sims[0])
