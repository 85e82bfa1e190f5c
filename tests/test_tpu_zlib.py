"""Device zlib (DEFLATE) decoder (tpu/codec_zlib.py).

The batched Huffman FSM must parse any zlib stream the reference's
wrapper produces (one-shot compress2, blosc/blosc.c:469-496) into a
literal tape + match records that replay to the original bytes;
placement reuses the shared machines (sort machine for uniform-distance
rows, expand kernel — interpret mode on the CPU leg — for mixed). Rows
the device cannot place report err and the byte API falls back to the
host engines (never silent corruption).
"""

import os
import zlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cblosc_tpu as b
from cblosc_tpu.tpu import codec_zlib, structured
from tests.conftest import REFERENCE, make_buffer, reference_available


def _pack(encs):
    W = max(len(e) for e in encs) + 8
    buf = np.zeros((len(encs), W), np.uint8)
    cs = np.zeros(len(encs), np.int32)
    for i, e in enumerate(encs):
        buf[i, : len(e)] = np.frombuffer(e, np.uint8)
        cs[i] = len(e)
    return jnp.asarray(buf), jnp.asarray(cs)


def _replay(tape, recs, out_len):
    out = np.zeros(out_len, np.uint8)
    for k, a, d, ln in recs:
        if k < 0:
            continue
        if k == 0:
            out[d:d + ln] = tape[a:a + ln]
        else:
            for j in range(ln):
                out[d + j] = out[d + j - a]
    return out


@pytest.mark.parametrize("lvl", [1, 6, 9])
def test_zlib_fsm_records_replay(rng, lvl):
    """Tape + records must replay byte-exactly for every stream shape:
    dynamic AND fixed Huffman blocks, multi-block streams, every
    match-distance pattern."""
    n = 4096
    rows = [
        np.zeros(n, np.uint8),                                 # RLE d=1
        (np.arange(n) // 64 % 256).astype(np.uint8),           # stairs
        np.tile(np.arange(16, dtype=np.uint8), n // 16),       # period 16
        np.tile(rng.integers(0, 256, 333, np.uint8),
                n // 333 + 1)[:n],                             # d=333
        rng.integers(0, 4, n).astype(np.uint8),                # dense
        np.frombuffer(make_buffer(rng, n, 4, "ramp"), np.uint8),
    ]
    encs = [zlib.compress(r.tobytes(), lvl) for r in rows]
    sl, cs = _pack(encs)
    tape, tlen, recs, dist, uni, ok = codec_zlib._fsm_walk(
        jnp.pad(sl, ((0, 0), (0, 16))), cs, n,
        codec_zlib.high_events(n))
    ok_np = np.asarray(ok)
    assert ok_np.all(), "FSM must parse every conforming stream"
    recs3 = np.asarray(structured.stack_records(recs))
    for i, r in enumerate(rows):
        got = _replay(np.asarray(tape)[i], recs3[i], n)
        assert np.array_equal(got, r), i


def test_zlib_decode_uniform_rows(rng):
    """Uniform-distance rows (every constant/periodic byte-plane) decode
    through the sort machine on any backend — no kernel required."""
    n = 4096
    rows = [
        np.zeros(n, np.uint8),
        (np.arange(n) // 64 % 256).astype(np.uint8),
        np.tile(np.arange(16, dtype=np.uint8), n // 16),
        np.full(n, 0xAB, np.uint8),
    ]
    encs = [zlib.compress(r.tobytes(), 6) for r in rows]
    sl, cs = _pack(encs)
    out, produced, err = codec_zlib.decode(sl, cs, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    for i, r in enumerate(rows):
        assert np.array_equal(np.asarray(out)[i], r), i


def test_zlib_decode_mixed_distances_kernel(rng):
    """Mixed-distance rows need the expand kernel; interpret mode covers
    the CPU leg. Small geometry keeps interpret-mode runtime sane."""
    n = 1024
    rows = [
        np.tile(rng.integers(0, 256, 100, np.uint8), 11)[:n],  # d=100
        np.repeat(rng.integers(0, 9, 64).astype(np.uint8), 16),  # runs
    ]
    encs = [zlib.compress(r.tobytes(), 6) for r in rows]
    sl, cs = _pack(encs)
    os.environ["CBLOSC_TPU_PLACE"] = "pallas"
    try:
        out, produced, err = codec_zlib.decode(
            sl, cs, n, codec_zlib.high_events(n))
    finally:
        del os.environ["CBLOSC_TPU_PLACE"]
    assert not np.asarray(err).any()
    for i, r in enumerate(rows):
        assert np.array_equal(np.asarray(out)[i], r), i


def test_zlib_fallback_is_loud_not_wrong(rng):
    """A row the device cannot place (literal-dense beyond the default
    event budget, or mixed distances without a kernel) must report err —
    never wrong bytes. Stored-block streams too (zlib level 0)."""
    n = 4096
    dense = rng.integers(0, 256, n, dtype=np.uint8)       # incompressible
    stored = zlib.compress(dense.tobytes(), 0)             # BTYPE=0 blocks
    encs = [zlib.compress(dense.tobytes(), 6), stored]
    sl, cs = _pack(encs)
    out, produced, err = codec_zlib.decode(sl, cs, n)
    e = np.asarray(err)
    for i in range(len(encs)):
        if not e[i]:
            assert np.array_equal(np.asarray(out)[i],
                                  np.frombuffer(dense.tobytes(), np.uint8))
    assert e[1], "stored blocks are a declared host-fallback case"


def test_zlib_byte_api_cross_engine(rng):
    """Host-written zlib chunks decode through the tpu entry point (the
    device handles the uniform-plane rows; anything else falls back to
    the host engines inside the router — output must be exact either
    way), and getitem agrees."""
    for kind in ["ramp", "zeros", "lowentropy"]:
        # small buffer: one FSM jit geometry, bounded CI time
        data = make_buffer(rng, 64 * 1024 + 28, 4, kind)
        for backend in ["numpy", "native"]:
            chunk = b.compress_ctx(5, 1, 4, data, compressor="zlib",
                                   backend=backend)
            assert chunk
            assert b.decompress_ctx(chunk, backend="tpu") == data
        got = b.getitem(chunk, 100, 500, backend="tpu")
        assert got == data[400:400 + 2000]


@pytest.mark.skipif(not reference_available(), reason="no reference tree")
def test_zlib_golden_rows_on_device():
    """Golden zlib chunks from old c-blosc: every split row the device
    reports handled must be bit-exact vs the host decode, and on the
    bench data's shape most rows must actually take the device path
    (the mixed-distance remainder falls back only on kernel-less legs)."""
    path = os.path.join(REFERENCE, "compat", "blosc-1.14.0-zlib.cdata")
    if not os.path.exists(path):
        pytest.skip("golden zlib file absent")
    chunk = open(path, "rb").read()
    want = np.frombuffer(b.decompress_ctx(chunk, backend="numpy"), np.uint8)
    got = b.decompress_ctx(chunk, backend="tpu")
    assert got == want.tobytes()

    # device-level: decode the first full block's splits directly
    from cblosc_tpu.format.header import ChunkHeader, read_bstarts
    from cblosc_tpu.core import policy
    from cblosc_tpu.tpu import host_api, pipeline

    hdr = ChunkHeader.decode(chunk)
    nsplits = policy.nsplits_decode(hdr.dont_split, hdr.typesize,
                                    hdr.blocksize, False)
    neblock = hdr.blocksize // nsplits
    arr = np.frombuffer(chunk, np.uint8)
    bstarts = read_bstarts(chunk, hdr.nblocks)
    offs, csizes = host_api._split_table(arr, bstarts[:1], nsplits)
    rows = pipeline.gather_slots(
        jnp.asarray(arr), jnp.asarray(offs),
        pipeline.decode_slot_width(neblock, hdr.compcode))
    rows = pipeline.mask_past_csize(rows, jnp.asarray(csizes),
                                    rows.shape[1])
    out, produced, err = codec_zlib.decode(
        rows, jnp.asarray(csizes), neblock,
        codec_zlib.high_events(neblock))
    handled = ~np.asarray(err)
    assert handled.any(), "some golden splits must decode on device"
    ref_block = want[: hdr.blocksize]
    # split s holds byte-plane s of the SHUFFLED block: the strided
    # view of the unshuffled bytes, NOT a contiguous quarter (verified
    # against python-zlib decode of the raw split streams; the round-4
    # axon-leg run caught the old contiguous-reshape expectation)
    planes = ref_block.reshape(neblock, nsplits).T
    for s in range(nsplits):
        if handled[s]:
            assert np.array_equal(np.asarray(out)[s], planes[s]), s
