"""Property-based fuzzing of both public entry points.

The reference runs libFuzzer harnesses under OSS-Fuzz
(tests/fuzz/fuzz_compress.c:10-60, fuzz_decompress.c:10-38). The same two
contracts, via hypothesis:

  * fuzz_compress: arbitrary data + arbitrary knobs -> compress ->
    introspect -> decompress must roundtrip exactly;
  * fuzz_decompress: arbitrary bytes -> either a clean FormatError/
    ValueError or a successful parse; never a crash, never silent
    garbage beyond the declared sizes. cbuffer_validate gates corpus
    admission exactly like the reference fuzzer.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

import cblosc_tpu as b
from cblosc_tpu.format import constants as C
from cblosc_tpu.format.header import FormatError

import os

# CBLOSC_TPU_FUZZ_EXAMPLES raises the example budget for soak runs
_EXAMPLES = int(os.environ.get("CBLOSC_TPU_FUZZ_EXAMPLES", "120"))
FUZZ = settings(
    max_examples=_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@FUZZ
@given(
    data=st.binary(min_size=0, max_size=4096),
    clevel=st.integers(0, 9),
    shuffle=st.sampled_from([0, 1, 2]),
    typesize=st.integers(1, 36),
    codec=st.sampled_from(["blosclz", "lz4", "lz4hc", "zlib", "zstd",
                           "snappy"]),
    splitmode=st.sampled_from(
        [C.ALWAYS_SPLIT, C.NEVER_SPLIT, C.AUTO_SPLIT, C.FORWARD_COMPAT_SPLIT]
    ),
)
def test_fuzz_compress(data, clevel, shuffle, typesize, codec, splitmode):
    if codec not in b.list_compressors():
        return
    chunk = b.compress_ctx(clevel, shuffle, typesize, data,
                           compressor=codec, splitmode=splitmode)
    if not data:
        assert b.decompress_ctx(chunk) == b""
        return
    assert chunk
    nbytes, cbytes, blocksize = b.cbuffer_sizes(chunk)
    assert nbytes == len(data)
    assert cbytes == len(chunk)
    assert b.cbuffer_validate(chunk)
    assert b.decompress_ctx(chunk) == data


@FUZZ
@given(blob=st.binary(min_size=0, max_size=2048))
def test_fuzz_decompress(blob):
    try:
        out = b.decompress_ctx(blob, destsize=1 << 16)
    except (FormatError, ValueError, IndexError):
        return
    assert len(out) <= 1 << 16


@FUZZ
@given(blob=st.binary(min_size=16, max_size=2048),
       start=st.integers(0, 4096), nitems=st.integers(0, 4096))
def test_fuzz_getitem(blob, start, nitems):
    try:
        out = b.getitem(blob, start, nitems)
    except (FormatError, ValueError, IndexError):
        return
    hdr_typesize = blob[3]
    assert len(out) <= nitems * max(hdr_typesize, 1)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    blob=st.binary(min_size=1, max_size=512),
    flips=st.lists(st.tuples(st.integers(0, 511), st.integers(0, 7)),
                   min_size=1, max_size=4),
)
def test_fuzz_corrupted_chunks(blob, flips):
    """Bit-flip a valid chunk: decompression either raises cleanly or
    returns exactly nbytes bytes (a flipped payload byte can decode to
    different-but-well-formed data; sizes must still hold)."""
    chunk = bytearray(b.compress_ctx(5, 1, 4, blob.ljust(4, b"\0")))
    for pos, bit in flips:
        if pos < len(chunk):
            chunk[pos] ^= 1 << bit
    try:
        out = b.decompress_ctx(bytes(chunk))
    except (FormatError, ValueError, IndexError):
        return
    hdr_nbytes = int.from_bytes(chunk[4:8], "little", signed=True)
    assert len(out) == hdr_nbytes


def test_fuzz_device_decoder_random_streams(rng):
    """Random bytes into the device decoder: rows either error or stay in
    bounds — and the loop terminates (every iteration consumes input or
    output budget)."""
    import jax.numpy as jnp

    from cblosc_tpu.tpu import codec

    blobs = rng.integers(0, 256, (32, 512), dtype=np.uint8)
    csizes = rng.integers(0, 512, 32, dtype=np.int32)
    rows = np.where(np.arange(512)[None, :] < csizes[:, None], blobs, 0)
    out, produced, err = codec.decode(
        jnp.asarray(rows.astype(np.uint8)), jnp.asarray(csizes), 1024
    )
    produced = np.asarray(produced)
    assert ((produced >= 0) & (produced <= 1024)).all()


def test_fuzz_device_pipeline_roundtrip(rng):
    """Random content through the device pipeline at a fixed geometry
    (fixed shapes keep this to one compile): every batch must roundtrip
    or be stored raw — never corrupt."""
    import jax.numpy as jnp

    from cblosc_tpu.tpu import pipeline

    from tests.conftest import make_buffer

    for trial in range(8):
        kind = ["zeros", "lowentropy", "random", "ramp"][trial % 4]
        raw = np.frombuffer(
            make_buffer(rng, 8 * 8192, 4, kind), np.uint8
        ).reshape(8, 8192)
        x = jnp.asarray(raw)
        slots, csizes = pipeline.compress_blocks(x, 1, 4, 4)
        rows = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
        out, err = pipeline.decompress_blocks(rows, csizes, 2048, 1, 4, 4)
        assert not np.asarray(err).any(), (trial, kind)
        assert np.array_equal(np.asarray(out), raw), (trial, kind)
