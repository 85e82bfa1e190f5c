"""Native C++ engine cross-validation against the numpy oracle.

Reference analog: the generic-vs-SSE2/AVX2 equivalence tests
(test_shuffle_roundtrip_{generic,sse2,avx2}.c): every native kernel must
agree bit-for-bit with the oracle implementation.
"""

import glob
import os

import numpy as np
import pytest

import cblosc_tpu as b
from cblosc_tpu.native import binding as nb
from cblosc_tpu.ops import filters_np as F
from cblosc_tpu.ops.codecs import blosclz as pz
from cblosc_tpu.ops.codecs import lz4 as pl
from tests.conftest import REFERENCE, make_buffer, reference_available

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native engine unavailable (no toolchain)"
)


@pytest.mark.parametrize("typesize", [1, 2, 3, 4, 5, 8, 16, 23, 32, 255])
@pytest.mark.parametrize("nbytes", [0, 16, 100, 4096, 30000])
def test_filters_match_oracle(rng, typesize, nbytes):
    data = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    assert np.array_equal(nb.shuffle(typesize, data), F.shuffle(typesize, data))
    assert np.array_equal(nb.unshuffle(typesize, data), F.unshuffle(typesize, data))
    assert np.array_equal(nb.bitshuffle(typesize, data), F.bitshuffle(typesize, data))
    assert np.array_equal(
        nb.bitunshuffle(typesize, data), F.bitunshuffle(typesize, data)
    )


@pytest.mark.parametrize("clevel", [1, 3, 5, 9])
@pytest.mark.parametrize("kind", ["ramp", "lowentropy", "zeros", "random"])
def test_blosclz_bit_exact(rng, clevel, kind):
    data = make_buffer(rng, 30000, 4, kind)
    maxout = 2 * len(data) + 66
    a = pz.compress(clevel, data, maxout, True)
    c = nb.blosclz_compress(clevel, data, maxout, True)
    assert a == c
    if a:
        assert nb.blosclz_decompress(a, len(data)) == data


@pytest.mark.parametrize("accel", [1, 5, 9])
def test_lz4_bit_exact(rng, accel):
    for kind in ("ramp", "lowentropy", "zeros"):
        data = make_buffer(rng, 30000, 4, kind)
        maxout = 2 * len(data) + 64
        a = pl.compress(data, maxout, accel)
        c = nb.lz4_compress(data, maxout, accel)
        assert a == c
        if a:
            assert nb.lz4_decompress(a, len(data)) == data


def test_lz4hc_bit_exact(rng):
    data = make_buffer(rng, 30000, 4, "lowentropy")
    maxout = 2 * len(data) + 64
    assert pl.compress_hc(data, maxout, 9) == nb.lz4hc_compress(data, maxout, 9)


@pytest.mark.parametrize("cname", ["blosclz", "lz4", "lz4hc"])
@pytest.mark.parametrize("shuffle", [0, 1, 2])
def test_chunk_native_equals_numpy(rng, cname, shuffle):
    data = make_buffer(rng, 400_000, 4, "ramp")
    cn = b.compress_ctx(5, shuffle, 4, data, compressor=cname, backend="native")
    cp = b.compress_ctx(5, shuffle, 4, data, compressor=cname, backend="numpy")
    assert cn == cp
    assert b.decompress_ctx(cn, backend="native") == data
    assert b.decompress_ctx(cn, backend="numpy") == data


@pytest.mark.parametrize("nthreads", [1, 2, 4])
def test_native_threaded_deterministic(rng, nthreads):
    data = make_buffer(rng, 2_000_000, 8, "ramp")
    chunks = {
        b.compress_ctx(5, 1, 8, data, compressor="blosclz",
                       numinternalthreads=nthreads, backend="native")
        for _ in range(3)
    }
    assert len(chunks) == 1  # deterministic layout regardless of scheduling
    assert b.decompress_ctx(next(iter(chunks)), numinternalthreads=nthreads,
                            backend="native") == data


def test_native_incompressible_contract(rng):
    data = make_buffer(rng, 100_000, 1, "random")
    out = b.compress_ctx(5, 0, 1, data, destsize=len(data) + 15,
                         backend="native")
    assert out == b""
    out = b.compress_ctx(5, 0, 1, data, destsize=len(data) + 16,
                         backend="native")
    assert len(out) == len(data) + 16


def test_native_rejects_corrupt_chunk(rng):
    chunk = bytearray(b.compress_ctx(5, 1, 4, make_buffer(rng, 65536, 4, "ramp"),
                                     backend="native"))
    chunk[20] ^= 0xFF  # clobber a bstart
    with pytest.raises(b.FormatError):
        b.decompress_ctx(bytes(chunk), backend="native")


@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_native_decodes_golden_files():
    expected = np.arange(1000 * 1000, dtype=np.int32).tobytes()
    paths = sorted(
        glob.glob(os.path.join(REFERENCE, "compat", "*blosclz*.cdata"))
        + glob.glob(os.path.join(REFERENCE, "compat", "*lz4*.cdata"))
    )
    assert paths
    for path in paths:
        chunk = open(path, "rb").read()
        assert b.decompress_ctx(chunk, backend="native") == expected, path


def test_native_getitem_cross_validated(rng):
    """cbt_getitem (blosc_getitem semantics, blosc.c:1574-1703) must
    agree with the oracle for every codec across block-interior,
    block-straddling, tail, empty, and whole-buffer ranges."""
    if not nb.available():
        pytest.skip("native engine unavailable")
    from cblosc_tpu.core import engine
    from tests.conftest import make_buffer

    for codec in ["blosclz", "lz4", "snappy", "zlib", "zstd"]:
        data = make_buffer(rng, 300_000 + 36, 4, "lowentropy")
        chunk = b.compress_ctx(6, 1, 4, data, compressor=codec,
                               backend="numpy")
        n = len(data) // 4
        for s, k in [(0, n), (0, 1), (n - 3, 3), (n // 3, n // 2), (5, 0)]:
            want = data[s * 4:(s + k) * 4]
            got = nb.getitem(chunk, s, k)
            assert got == want, (codec, s, k)
            assert bytes(engine.getitem(
                np.frombuffer(chunk, np.uint8), s, k)) == want
    # memcpyed chunks slice straight from the source (blosc.c:1678-1683)
    d = make_buffer(rng, 50_000, 1, "random")
    ch = b.compress_ctx(0, 0, 1, d)
    assert nb.getitem(ch, 100, 400) == d[100:500]
