"""Device zstd decoder (tpu/codec_zstd.py).

The batched frame FSM must parse any frame the reference's wrapper
produces (one-shot ZSTD_compress, blosc/blosc.c:498-522) into a Huffman
literal tape + records that replay to the original bytes; placement
runs the expand kernel (interpret mode on CPU legs, hence the small
geometries here — big blocks on CPU legs fall back to the host engines
by design, codec_zstd.decode's cpu cap). Rows outside the FSM's scope
report err and the byte API falls back — never silent corruption.
"""

import ctypes
import os

import numpy as np
import pytest

import jax.numpy as jnp

import cblosc_tpu as b
from cblosc_tpu.ops.codecs import zstd_ as zw
from cblosc_tpu.ops.codecs import zstd_ref
from cblosc_tpu.tpu import codec_zstd

pytestmark = pytest.mark.skipif(not zw.AVAILABLE, reason="libzstd absent")


def _frame(data: bytes, level: int) -> bytes:
    buf = ctypes.create_string_buffer(len(data) * 2 + 512)
    code = zw._lib.ZSTD_compress(
        buf, ctypes.c_size_t(len(buf)), data, ctypes.c_size_t(len(data)),
        ctypes.c_int(level))
    assert not zw._lib.ZSTD_isError(ctypes.c_size_t(code))
    return buf.raw[:code]


def _pack(encs, pad=8):
    W = max(len(e) for e in encs) + pad
    buf = np.zeros((len(encs), W), np.uint8)
    cs = np.zeros(len(encs), np.int32)
    for i, e in enumerate(encs):
        buf[i, : len(e)] = np.frombuffer(e, np.uint8)
        cs[i] = len(e)
    return jnp.asarray(buf), jnp.asarray(cs)


def _rows(rng, n):
    """Shapes exercising every frame feature: RLE blocks, raw blocks,
    raw/RLE/Huffman literals (1- and 4-stream, FSE weights), sequences
    with predefined and FSE tables, repeat offsets."""
    return [
        np.zeros(n, np.uint8),                                # RLE block
        rng.integers(0, 256, n, dtype=np.uint8),              # raw block
        np.tile(rng.integers(0, 256, 64, np.uint8), n // 64),  # raw lits
        (rng.integers(0, 6, n, np.uint8) * 16),               # huffman
        np.repeat(rng.integers(0, 9, n // 16).astype(np.uint8), 16),
        (np.arange(n) % 251).astype(np.uint8),                # ramp
    ]


@pytest.mark.parametrize("lvl", [1, 3, 9, 19])
def test_decode_matches_oracle(rng, lvl):
    n = 2048
    rows = _rows(rng, n)
    encs = [_frame(r.tobytes(), lvl) for r in rows]
    for r, e in zip(rows, encs):                 # oracle sanity
        assert zstd_ref.decompress(e, n) == r.tobytes()
    sl, cs = _pack(encs)
    out, produced, err = codec_zstd.decode(
        sl, cs, n, codec_zstd.high_events(n))
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    for i, r in enumerate(rows):
        assert np.array_equal(np.asarray(out)[i], r), (lvl, i)


def test_default_budget_covers_match_heavy(rng):
    """Shuffled-typed-data shapes must decode within the DEFAULT budget
    (the retry exists for literal-dense frames only)."""
    n = 4096
    rows = [np.zeros(n, np.uint8),
            np.tile(rng.integers(0, 256, 32, np.uint8), n // 32),
            np.repeat(rng.integers(0, 5, n // 64).astype(np.uint8), 64)]
    encs = [_frame(r.tobytes(), 3) for r in rows]
    sl, cs = _pack(encs)
    out, produced, err = codec_zstd.decode(sl, cs, n)
    assert not np.asarray(err).any()
    for i, r in enumerate(rows):
        assert np.array_equal(np.asarray(out)[i], r), i


def test_dictionary_frames_err_not_corrupt():
    """Frames this decoder does not handle must report err."""
    n = 256
    f = bytearray(_frame(bytes(n), 1))
    f[4] |= 1                  # dictionary-ID flag: out of scope
    sl, cs = _pack([bytes(f)])
    out, produced, err = codec_zstd.decode(sl, cs, n,
                                           codec_zstd.high_events(n))
    assert np.asarray(err).all()


def test_corrupt_frames_err(rng):
    n = 1024
    data = (rng.integers(0, 6, n, np.uint8) * 16).tobytes()
    good = _frame(data, 3)
    cases = []
    f = bytearray(good); f[0] ^= 0xFF; cases.append(bytes(f))  # magic
    f = bytearray(good); f[-2] ^= 0xFF; cases.append(bytes(f))
    f = bytearray(good); f[10] ^= 0x55; cases.append(bytes(f))
    sl, cs = _pack(cases)
    out, produced, err = codec_zstd.decode(sl, cs, n,
                                           codec_zstd.high_events(n))
    e = np.asarray(err)
    for i, fr in enumerate(cases):
        if not e[i]:
            # a corruption that still parses must decode to whatever the
            # oracle says (bit flips in literal bytes are legal streams)
            try:
                want = zstd_ref.decompress(fr, n)
            except ValueError:
                raise AssertionError(f"row {i}: device ok, oracle rejects")
            assert bytes(np.asarray(out)[i]) == want


def test_byte_api_cross_engine(rng):
    """Host-written zstd chunks decode through the tpu entry point on
    small geometries (CPU legs run the kernel in interpret mode; big
    blocks fall back to host engines inside the router)."""
    for kind in ["ramp", "zeros", "lowentropy"]:
        data = bytes(np.frombuffer(
            np.random.default_rng(4).integers(0, 5, 4096, np.int64)
            .astype(np.int32).tobytes(), np.uint8)) if kind == "ramp" \
            else (bytes(4096) if kind == "zeros" else
                  (rng.integers(0, 8, 4096, np.uint8) * 16).tobytes())
        chunk = b.compress_ctx(5, 1, 4, data, compressor="zstd",
                               backend="numpy")
        assert chunk
        assert b.decompress_ctx(chunk, backend="tpu") == data


def test_fallback_budget_retry_hint(rng):
    """Literal-dense frames overflow the default budget (err), and the
    escalated budget decodes them — the byte API's retry path."""
    n = 2048
    data = (rng.integers(0, 6, n, np.uint8) * 16).tobytes()
    f = _frame(data, 1)
    sl, cs = _pack([f])
    out1, _, err1 = codec_zstd.decode(sl, cs, n)
    out2, _, err2 = codec_zstd.decode(sl, cs, n,
                                      codec_zstd.high_events(n))
    assert not np.asarray(err2).any()
    assert bytes(np.asarray(out2)[0]) == data
    if np.asarray(err1).any():
        pass                     # default budget may legitimately refuse
    else:
        assert bytes(np.asarray(out1)[0]) == data
