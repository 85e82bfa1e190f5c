"""Per-codec stream-level tests (below the chunk layer)."""

import numpy as np
import pytest

from cblosc_tpu.ops.codecs import blosclz, lz4, snappy, zlib_, zstd_


def bufs(rng):
    return {
        "runs": bytes([7] * 5000),
        "ramp": np.arange(2000, dtype=np.int32).tobytes(),
        "text": (b"the quick brown fox jumps over the lazy dog. " * 200),
        "rand": rng.integers(0, 256, 8192, dtype=np.uint8).tobytes(),
        "periodic": bytes(range(256)) * 32,
    }


@pytest.mark.parametrize("clevel", [1, 5, 9])
def test_blosclz_roundtrip(rng, clevel):
    for name, data in bufs(rng).items():
        c = blosclz.compress(clevel, data, 2 * len(data) + 66, True)
        if not c:
            continue  # incompressible / probe bail-out: engine stores raw
        out = blosclz.decompress(c, len(data))
        assert out == data, name


def test_blosclz_incompressible_returns_empty(rng):
    data = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    assert blosclz.compress(5, data, len(data), True) == b""


def test_blosclz_tiny_input():
    assert blosclz.compress(5, b"abc", 100, True) == b""  # < 16 bytes


def test_blosclz_far_matches():
    # matches at distance > 8191 (far window); the trailing zeros keep the
    # entropy probe (which samples the last quarter) happy
    block = bytes(np.random.default_rng(1).integers(0, 256, 9000, dtype=np.uint8))
    data = block + block + bytes(6000)
    c = blosclz.compress(9, data, 2 * len(data) + 66, True)
    assert c and blosclz.decompress(c, len(data)) == data
    assert len(c) < 12000  # the second copy of `block` must be far-matched


def test_blosclz_probe_bails_on_random_tail():
    # the entropy probe samples the last quarter; random tail => bail-out
    block = bytes(np.random.default_rng(2).integers(0, 256, 5000, dtype=np.uint8))
    data = block + bytes(7000) + block
    assert blosclz.compress(9, data, 2 * len(data) + 66, True) == b""


def test_blosclz_long_run_length_chain():
    # run length > 7+255: exercises the 255-chained length encoding
    data = b"x" + bytes([5] * 4000) + b"tailtail"
    c = blosclz.compress(5, data, 2 * len(data) + 66, True)
    assert c and blosclz.decompress(c, len(data)) == data


def test_blosclz_rejects_match_at_stream_start():
    # match token as the first token must fail (no prior output)
    bad = bytes([32 + 1, 0, 0, 0])
    with pytest.raises(ValueError):
        blosclz.decompress(bad, 100)


@pytest.mark.parametrize("accel", [1, 5, 9])
def test_lz4_roundtrip(rng, accel):
    for name, data in bufs(rng).items():
        c = lz4.compress(data, 2 * len(data) + 64, accel)
        if not c:
            continue
        assert lz4.decompress(c, len(data)) == data, name


def test_lz4hc_roundtrip(rng):
    for name, data in bufs(rng).items():
        c = lz4.compress_hc(data, 2 * len(data) + 64, 9)
        if not c:
            continue
        assert lz4.decompress(c, len(data)) == data, name


def test_lz4hc_not_worse_than_lz4(rng):
    data = bufs(rng)["text"]
    fast = lz4.compress(data, 2 * len(data), 1)
    hc = lz4.compress_hc(data, 2 * len(data), 9)
    assert len(hc) <= len(fast)


def test_lz4_malformed_offset_rejected():
    with pytest.raises(ValueError):
        lz4.decompress(bytes([0x10, 65, 9, 0]), 100)  # offset 9 > output pos


def test_snappy_roundtrip(rng):
    for name, data in bufs(rng).items():
        c = snappy.compress(data, 2 * len(data) + 64)
        if not c:
            continue
        assert snappy.decompress(c, len(data)) == data, name


def test_snappy_long_literals(rng):
    data = rng.integers(0, 256, 70000, dtype=np.uint8).tobytes()
    c = snappy.compress(data, 2 * len(data) + 64)
    assert snappy.decompress(c, len(data)) == data


def test_zlib_roundtrip(rng):
    for data in bufs(rng).values():
        c = zlib_.compress(data, 2 * len(data) + 64, 6)
        if not c:
            continue
        assert zlib_.decompress(c, len(data)) == data


@pytest.mark.skipif(not zstd_.AVAILABLE, reason="zstandard not installed")
def test_zstd_roundtrip(rng):
    for data in bufs(rng).values():
        c = zstd_.compress(data, 2 * len(data) + 64, 5)
        if not c:
            continue
        assert zstd_.decompress(c, len(data)) == data
