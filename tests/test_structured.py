"""Structured device decoder vs the generic loop decoder and the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.ops.codecs import blosclz as lzhost
from cblosc_tpu.tpu import codec, structured


def _encode_batch(S):
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    return slots, csizes


def _streams(rng, n):
    runs = np.repeat(
        rng.integers(0, 5, 40).astype(np.uint8), rng.integers(1, n // 4, 40)
    )[:n]
    return np.stack([
        np.pad(runs, (0, n - len(runs))),
        np.zeros(n, np.uint8),
        (np.arange(n) // 256).astype(np.uint8),
        np.tile(np.arange(128, dtype=np.uint8), n // 128),   # d=128 ramp
        np.tile(np.array([7, 9], np.uint8), n // 2),          # d=2
        rng.integers(0, 2, n, dtype=np.uint8) * 255,          # coin runs
    ]), n


@pytest.mark.parametrize("n", [1024, 4096, 16384])
def test_structured_matches_loop_on_our_streams(rng, n):
    S, n = _streams(rng, n)
    slots, csizes = _encode_batch(S)
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    assert np.array_equal(np.asarray(out), S)


def test_structured_falls_back_on_host_streams(rng):
    """Host-encoder streams use hash-table matches with mixed distances;
    the structured walk must flag them and the loop decoder must still
    produce exact output."""
    n = 4096
    S, _ = _streams(rng, n)
    rows = []
    for i in range(S.shape[0]):
        enc = lzhost.compress(9, S[i], n, True)
        if not enc:
            enc = b""
        rows.append(np.frombuffer(enc, np.uint8))
    W = max(len(r) for r in rows) + 300
    buf = np.zeros((len(rows), W), np.uint8)
    cs = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        buf[i, : len(r)] = r
        cs[i] = len(r)
    out, produced, err = structured.decode(
        jnp.asarray(buf), jnp.asarray(cs), n
    )
    out = np.asarray(out)
    for i, r in enumerate(rows):
        if len(r) == 0:
            continue
        assert not np.asarray(err)[i]
        assert np.array_equal(out[i], S[i]), f"row {i}"


def test_structured_bad_stream_errors():
    bad = np.zeros((1, 400), np.uint8)
    bad[0, 0] = 32 | 0
    bad[0, 1] = 7
    bad[0, 2] = (5 << 5) | 31     # absurd distance
    bad[0, 3] = 200
    out, produced, err = structured.decode(
        jnp.asarray(bad), jnp.asarray([4]), 64
    )
    assert bool(np.asarray(err)[0])


def test_structured_large_blocks_fall_back(rng):
    n = 32768   # beyond MAX_OUT: must route everything through the loop
    S = np.zeros((2, n), np.uint8)
    slots, csizes = _encode_batch(S)
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), S)
