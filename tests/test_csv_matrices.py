"""The reference's CSV parameter matrices, replayed through our engines.

c-blosc registers one CTest case per CSV row (tests/CMakeLists.txt:66-104;
test_compress_roundtrip.csv 267 rows, test_getitem.csv 399 rows,
test_shuffle_roundtrip_*.csv 930 rows). The CSVs are pure test DATA —
(typesize, nelems, alignment, clevel, shuffle, nthreads) tuples — reused
here as pytest parametrizations per SURVEY.md section 4. Alignment
columns are skipped: Python buffers abstract allocation alignment.

Skipped when the reference tree is absent.
"""

import csv
import os

import numpy as np
import pytest

import cblosc_tpu as b
from cblosc_tpu.native import binding
from cblosc_tpu.ops import filters_np
from tests.conftest import REFERENCE, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference CSVs not mounted"
)


def _rows(name):
    path = os.path.join(REFERENCE, "tests", name)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        reader = csv.reader(f)
        next(reader)
        return [tuple(int(x) for x in row) for row in reader if row]


def _buf(typesize, nelems, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, typesize * nelems, dtype=np.uint8).tobytes()


@pytest.mark.parametrize(
    "typesize,nelems,align,clevel,shuffle,nthreads",
    _rows("test_compress_roundtrip.csv"),
)
def test_compress_roundtrip_matrix(typesize, nelems, align, clevel,
                                   shuffle, nthreads):
    data = _buf(typesize, nelems, seed=typesize * 1000003 + nelems)
    chunk = b.compress_ctx(clevel, shuffle, typesize, data,
                           numinternalthreads=nthreads)
    if nelems == 0:
        assert b.decompress_ctx(chunk) == b""
        return
    assert chunk
    assert b.decompress_ctx(chunk, numinternalthreads=nthreads) == data


@pytest.mark.parametrize(
    "typesize,nelems,align,clevel,shuffle,nthreads",
    _rows("test_getitem.csv"),
)
def test_getitem_matrix(typesize, nelems, align, clevel, shuffle, nthreads):
    data = _buf(typesize, nelems, seed=typesize * 7 + nelems)
    chunk = b.compress_ctx(clevel, shuffle, typesize, data,
                           numinternalthreads=nthreads)
    assert chunk
    # whole-buffer getitem, as the reference test does (test_getitem.c:15-47)
    assert b.getitem(chunk, 0, nelems) == data
    # plus deterministic partial ranges (block-interior, block-straddling,
    # single item, tail) — reference behavior blosc.c:1655-1698
    rng = np.random.default_rng(nelems * 31 + typesize)
    ranges = {(0, min(1, nelems)), (max(0, nelems - 3), min(3, nelems))}
    for _ in range(3):
        if nelems > 1:
            start = int(rng.integers(0, nelems - 1))
            nitems = int(rng.integers(1, nelems - start))
            ranges.add((start, nitems))
    for start, nitems in sorted(ranges):
        got = b.getitem(chunk, start, nitems)
        want = data[start * typesize:(start + nitems) * typesize]
        assert got == want, (start, nitems)


@pytest.mark.parametrize(
    "typesize,nelems,align", _rows("test_shuffle_roundtrip_generic.csv")
)
def test_shuffle_roundtrip_matrix(typesize, nelems, align):
    """Cross-validate numpy oracle against the native SIMD-style kernels,
    the reference's generic<->accelerated strategy
    (test_shuffle_roundtrip_sse2.c:44-66)."""
    data = _buf(typesize, nelems, seed=nelems)
    a = filters_np.shuffle(typesize, data)
    back = filters_np.unshuffle(typesize, a)
    assert back.tobytes() == data
    if binding.available():
        na = binding.shuffle(typesize, data)
        assert np.array_equal(na, a)
        assert binding.unshuffle(typesize, na).tobytes() == data
        bb = binding.bitshuffle(typesize, data)
        assert np.array_equal(bb, filters_np.bitshuffle(typesize, data))
        assert binding.bitunshuffle(typesize, bb).tobytes() == (
            filters_np.bitunshuffle(typesize, bb).tobytes())
