"""Chunk-level roundtrip matrix.

Reference analog: tests/test_compress_roundtrip.c driven by its 267-row CSV
(typesize x nelems x clevel x shuffle x nthreads). The matrix here is
generated rather than copied, with the same coverage dimensions.
"""

import numpy as np
import pytest

import cblosc_tpu as b
from cblosc_tpu.format import constants as C
from tests.conftest import make_buffer

CODECS = ["blosclz", "lz4", "lz4hc", "snappy", "zlib", "zstd"]


def available(name):
    return name in b.list_compressors()


@pytest.mark.parametrize("cname", CODECS)
@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 16])
@pytest.mark.parametrize("nbytes", [7, 127, 128, 1000, 4096, 65537])
@pytest.mark.parametrize("shuffle", [C.NOSHUFFLE, C.SHUFFLE, C.BITSHUFFLE])
def test_roundtrip_matrix(rng, cname, typesize, nbytes, shuffle):
    if not available(cname):
        pytest.skip(f"{cname} unavailable")
    data = make_buffer(rng, nbytes, typesize, "lowentropy")
    chunk = b.compress_ctx(5, shuffle, typesize, data, compressor=cname)
    assert chunk, "compressible data must produce a chunk"
    assert b.decompress_ctx(chunk) == data


@pytest.mark.parametrize("clevel", list(range(10)))
@pytest.mark.parametrize("kind", ["ramp", "random", "zeros"])
def test_roundtrip_clevels(rng, clevel, kind):
    data = make_buffer(rng, 40000, 4, kind)
    chunk = b.compress_ctx(clevel, C.SHUFFLE, 4, data)
    assert chunk
    assert b.decompress_ctx(chunk) == data


@pytest.mark.parametrize("nthreads", [1, 2, 4])
def test_roundtrip_threads(rng, nthreads):
    data = make_buffer(rng, 300_000, 8, "ramp")
    chunk = b.compress_ctx(
        5, C.SHUFFLE, 8, data, compressor="lz4", numinternalthreads=nthreads
    )
    assert b.decompress_ctx(chunk, numinternalthreads=nthreads) == data


@pytest.mark.parametrize("splitmode", [C.ALWAYS_SPLIT, C.NEVER_SPLIT,
                                       C.AUTO_SPLIT, C.FORWARD_COMPAT_SPLIT])
def test_roundtrip_splitmodes(rng, splitmode):
    data = make_buffer(rng, 100_000, 4, "lowentropy")
    chunk = b.compress_ctx(6, C.SHUFFLE, 4, data, splitmode=splitmode)
    assert b.decompress_ctx(chunk) == data


def test_empty_buffer():
    chunk = b.compress_ctx(5, C.SHUFFLE, 4, b"")
    assert len(chunk) == 16
    assert b.decompress_ctx(chunk) == b""


def test_small_buffer_memcpyed(rng):
    # buffers under MIN_BUFFERSIZE are stored verbatim
    data = bytes(range(64))
    chunk = b.compress_ctx(9, C.SHUFFLE, 4, data)
    assert len(chunk) == 64 + 16
    nbytes, cbytes, _ = b.cbuffer_sizes(chunk)
    assert (nbytes, cbytes) == (64, 80)
    assert b.decompress_ctx(chunk) == data


def test_clevel0_is_memcpy(rng):
    data = make_buffer(rng, 10_000, 4, "ramp")
    chunk = b.compress_ctx(0, C.SHUFFLE, 4, data)
    assert len(chunk) == len(data) + 16
    assert b.decompress_ctx(chunk) == data


def test_incompressible_returns_empty(rng):
    data = make_buffer(rng, 100_000, 1, "random")
    # destsize budget below nbytes+16: nothing fits
    out = b.compress_ctx(5, C.NOSHUFFLE, 1, data, destsize=len(data) - 100)
    assert out == b""


def test_incompressible_fits_as_memcpy(rng):
    data = make_buffer(rng, 100_000, 1, "random")
    out = b.compress_ctx(5, C.NOSHUFFLE, 1, data, destsize=len(data) + 16)
    assert len(out) == len(data) + 16
    assert b.decompress_ctx(out) == data


def test_maxout_boundaries(rng):
    """destsize semantics at the nbytes+16 boundary (test_maxout.c)."""
    data = make_buffer(rng, 1000, 1, "random")
    with pytest.raises(ValueError):
        b.compress_ctx(1, 0, 1, data, destsize=15)  # < BLOSC_MAX_OVERHEAD
    assert b.compress_ctx(1, 0, 1, data, destsize=len(data) + 15) == b""
    out = b.compress_ctx(1, 0, 1, data, destsize=len(data) + 16)
    assert len(out) == len(data) + 16


def test_forced_blocksize(rng):
    data = make_buffer(rng, 500_000, 4, "ramp")
    # NEVER_SPLIT avoids the split enlargement (blosc.c:1031-1047), so the
    # forced blocksize is used verbatim.
    chunk = b.compress_ctx(5, C.SHUFFLE, 4, data, blocksize=65536,
                           splitmode=C.NEVER_SPLIT)
    _, _, blocksize = b.cbuffer_sizes(chunk)
    assert blocksize == 65536
    assert b.decompress_ctx(chunk) == data


def test_typesize_larger_than_max(rng):
    # typesize > 255 degrades to a byte stream
    data = make_buffer(rng, 10_000, 1, "lowentropy")
    chunk = b.compress_ctx(5, C.SHUFFLE, 300, data)
    typesize, _ = b.cbuffer_metainfo(chunk)
    assert typesize == 1
    assert b.decompress_ctx(chunk) == data


def test_bitshuffle_leftovers(rng):
    """Sizes not a multiple of 8 elements (test_bitshuffle_leftovers.c)."""
    for nbytes in [7, 27, 12345, 65537]:
        data = make_buffer(rng, nbytes, 4, "lowentropy")
        chunk = b.compress_ctx(5, C.BITSHUFFLE, 4, data)
        assert b.decompress_ctx(chunk) == data


def test_cross_backend_decode(rng):
    """Chunks from the numpy engine decode identically regardless of the
    engine that decodes them (the scalar/SIMD equivalence oracle)."""
    data = make_buffer(rng, 200_000, 4, "ramp")
    for cname in ("blosclz", "lz4"):
        chunk = b.compress_ctx(5, C.SHUFFLE, 4, data, compressor=cname,
                               backend="numpy")
        assert b.decompress_ctx(chunk, backend="numpy") == data
