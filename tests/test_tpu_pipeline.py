"""End-to-end chunks through the TPU backend.

The device pipeline must emit byte-conforming chunks (decodable by every
other engine) and decode chunks from every other engine, including the
reference golden files.
"""

import os

import numpy as np
import pytest

import cblosc_tpu as b
from cblosc_tpu.format import constants as C
from tests.conftest import REFERENCE, make_buffer, reference_available


@pytest.mark.parametrize("doshuffle", [0, 1, 2])
@pytest.mark.parametrize("typesize", [1, 4, 8, 16])
@pytest.mark.parametrize("kind", ["ramp", "lowentropy", "random", "zeros"])
def test_tpu_chunk_roundtrip(rng, doshuffle, typesize, kind):
    data = make_buffer(rng, 256 * 1024 + 52, typesize, kind)
    chunk = b.compress_ctx(5, doshuffle, typesize, data, backend="tpu")
    assert chunk
    # every engine decodes the TPU-produced chunk
    assert b.decompress_ctx(chunk, backend="tpu") == data
    assert b.decompress_ctx(chunk, backend="numpy") == data
    assert b.decompress_ctx(chunk, backend="native") == data


@pytest.mark.parametrize("nbytes", [4096, 65536, 1 << 20])
def test_tpu_decodes_host_chunks(rng, nbytes):
    data = make_buffer(rng, nbytes, 8, "lowentropy")
    for backend in ["numpy", "native"]:
        chunk = b.compress_ctx(7, 1, 8, data, backend=backend)
        assert chunk
        assert b.decompress_ctx(chunk, backend="tpu") == data


def test_tpu_getitem_equivalence(rng):
    data = make_buffer(rng, 200_000, 4, "ramp")
    chunk = b.compress_ctx(5, 1, 4, data, backend="tpu")
    got = b.getitem(chunk, 1000, 500)
    assert got == data[4000:4000 + 2000]


def test_tpu_device_getitem(rng):
    """Device block-sparse getitem must agree with the host engine across
    block boundaries, leftover tails, and zero-length reads."""
    data = make_buffer(rng, 300_000 + 1234, 4, "lowentropy")
    n = len(data) // 4
    for backend_src in ["numpy", "tpu"]:
        chunk = b.compress_ctx(5, 1, 4, data, backend=backend_src)
        for start, nitems in [(0, 100), (n // 2 - 50, 100), (n - 10, 10),
                              (0, n), (123, 0)]:
            host = b.getitem(chunk, start, nitems)
            dev = b.getitem(chunk, start, nitems, backend="tpu")
            assert dev == host == data[start * 4:(start + nitems) * 4]


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_tpu_decodes_reference_golden():
    path = os.path.join(REFERENCE, "compat", "blosc-1.18.0-blosclz.cdata")
    chunk = open(path, "rb").read()
    out = b.decompress_ctx(chunk, backend="tpu")
    assert out == np.arange(1000 * 1000, dtype=np.int32).tobytes()


def test_tpu_incompressible_contract(rng):
    data = make_buffer(rng, 100_000, 8, "random")
    # tight destsize: incompressible data must yield b"" (blosc.h:167-169)
    out = b.compress_ctx(5, 1, 8, data, destsize=1000, backend="tpu")
    assert out == b""
    # roomy destsize: memcpy fallback kicks in
    out = b.compress_ctx(5, 1, 8, data, backend="tpu")
    assert out
    assert b.decompress_ctx(out) == data


def test_tpu_ratio_close_to_host(rng):
    data = make_buffer(rng, 1 << 20, 8, "ramp")
    tpu = b.compress_ctx(5, 1, 8, data, backend="tpu")
    host = b.compress_ctx(5, 1, 8, data, backend="numpy")
    assert tpu and host
    # the mined adaptive distance (codec._mine_distance) reaches the
    # large byte-plane periods a hash table finds (far-distance tokens
    # included), the clevel>=5 device geometry matches the host's
    # 128 KB splits, and a maximal run is one unbounded-length token —
    # so the device encoder now BEATS the host hash-table encoder on
    # this workload: 6804 B device vs 7372 B host (0.92x)
    assert len(tpu) <= len(host)


@pytest.mark.parametrize("codec_name", ["lz4", "lz4hc"])
def test_tpu_lz4_chunk_roundtrip(rng, codec_name):
    """Device LZ4 encode/decode through the byte API; every engine must
    read the device-written chunks and vice versa."""
    for kind in ["ramp", "lowentropy", "zeros"]:
        data = make_buffer(rng, 200_000 + 36, 4, kind)
        chunk = b.compress_ctx(5, 1, 4, data, compressor=codec_name,
                               backend="tpu")
        assert chunk
        assert b.decompress_ctx(chunk, backend="tpu") == data
        assert b.decompress_ctx(chunk, backend="numpy") == data
        assert b.decompress_ctx(chunk, backend="native") == data
        # host-written chunks decode through the tpu entry point (device
        # handles uniform-distance streams, host fallback otherwise)
        host_chunk = b.compress_ctx(5, 1, 4, data, compressor=codec_name,
                                    backend="native")
        assert b.decompress_ctx(host_chunk, backend="tpu") == data


def test_tpu_never_split_roundtrip(rng):
    """NEVER_SPLIT leaves typesize-strided structure in one stream per
    block — exercising the typesize-multiple distance candidates."""
    data = make_buffer(rng, 256 * 1024, 4, "ramp")
    chunk = b.compress_ctx(5, 1, 4, data, splitmode=C.NEVER_SPLIT,
                           backend="tpu")
    assert chunk
    assert b.decompress_ctx(chunk, backend="tpu") == data
    assert b.decompress_ctx(chunk, backend="native") == data


def test_tpu_forced_blocksize(rng):
    """A forced blocksize must survive the device-geometry retune and be
    transformed exactly like the reference transforms it (the split
    enlargement applies to forced sizes too, blosc.c:1031-1047)."""
    from cblosc_tpu.core import policy
    from cblosc_tpu.format.header import ChunkHeader

    data = make_buffer(rng, 300_000, 4, "lowentropy")
    expected = policy.compute_blocksize(5, 4, len(data), 65536)
    chunk = b.compress_ctx(5, 1, 4, data, blocksize=65536, backend="tpu")
    assert chunk
    assert ChunkHeader.decode(chunk).blocksize == expected
    assert b.decompress_ctx(chunk) == data


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
@pytest.mark.parametrize("name", [
    "blosc-1.18.0-lz4.cdata",
    "blosc-1.18.0-lz4hc.cdata",
    "blosc-1.14.0-snappy.cdata",
    "blosc-1.3.0-blosclz.cdata",
])
def test_tpu_decodes_golden_all_device_codecs(name):
    """Golden chunks for every compcode with a device decoder, through
    the device path directly: on TPU the expand kernel must handle them
    (no host fallback); the CPU leg may fall back (None) but must never
    return wrong bytes."""
    import jax

    from cblosc_tpu.tpu import host_api

    chunk = open(os.path.join(REFERENCE, "compat", name), "rb").read()
    want = np.arange(1000 * 1000, dtype=np.int32).tobytes()
    got = host_api.decompress_chunk(chunk)
    if jax.default_backend() != "cpu":
        assert got is not None, "device path fell back on TPU"
    if got is not None:
        assert got == want
    # and the routed byte API always lands on the right bytes
    assert b.decompress_ctx(chunk, backend="tpu") == want


@pytest.mark.parametrize("nblocks", [256, 640])
def test_tpu_grouped_pipeline_matches_single_batch(rng, nblocks,
                                                   monkeypatch):
    """Sub-batched (grouped) pipeline paths produce the same bytes as
    the single-batch program: nblocks=256 at a 1 MB group budget takes
    the unrolled branch (g=4), 640 the lax.map branch (g=10). The
    default 64 MB budget means CPU-leg tests never hit these branches
    without forcing the knob."""
    import jax.numpy as jnp

    from cblosc_tpu.tpu import pipeline

    blocksize, typesize, nsplits = 16384, 4, 4
    neblock = blocksize // nsplits
    data = make_buffer(rng, nblocks * blocksize, typesize, "ramp")
    blocks = jnp.asarray(
        np.frombuffer(data, np.uint8).reshape(nblocks, blocksize))

    def run():
        slots, csizes = pipeline.compress_blocks(
            blocks, 1, typesize, nsplits, 48, C.BLOSCLZ, 0, False)
        masked = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
        out, err = pipeline.decompress_blocks(
            masked, csizes, neblock, 1, typesize, nsplits, C.BLOSCLZ)
        return (np.asarray(slots), np.asarray(csizes), np.asarray(out),
                np.asarray(err))

    monkeypatch.setenv("CBLOSC_TPU_ENCODE_GROUP", str(1 << 20))
    # distinct geometry per branch also keeps the jit cache from
    # handing back a trace captured under the other env setting
    g_slots, g_csizes, g_out, g_err = run()
    assert not g_err.any()
    assert g_out.tobytes() == data
    monkeypatch.delenv("CBLOSC_TPU_ENCODE_GROUP")
    if nblocks == 256:   # single-batch reference at this geometry
        # the env knob is read at trace time: drop the traces captured
        # under the 1 MB budget or the jit cache would replay them
        pipeline.compress_blocks.clear_cache()
        pipeline.decompress_blocks.clear_cache()
        s_slots, s_csizes, s_out, s_err = run()
        np.testing.assert_array_equal(g_csizes, s_csizes)
        np.testing.assert_array_equal(g_slots, s_slots)
        np.testing.assert_array_equal(g_out, s_out)
