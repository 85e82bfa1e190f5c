"""Device blosclz codec: wire-format conformance and cross-decoding.

The three-way oracle: (a) device encoder streams decode identically on
the device decoder, the numpy oracle decoder and the native C++ decoder;
(b) the device decoder accepts generic streams from the host encoders —
the same cross-implementation strategy the reference applies to its
scalar/SIMD kernels (tests/test_shuffle_roundtrip_sse2.c:44-66).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.native import binding
from cblosc_tpu.ops.codecs import blosclz as lzhost
from cblosc_tpu.tpu import codec


def _streams(rng):
    n = 4096
    runs = np.repeat(
        rng.integers(0, 5, 40).astype(np.uint8), rng.integers(1, 900, 40)
    )[:n]
    cases = [
        np.pad(runs, (0, n - len(runs))),
        rng.integers(0, 256, n, dtype=np.uint8),        # incompressible
        np.zeros(n, np.uint8),                           # one giant run
        (np.arange(n) // 256).astype(np.uint8),          # plane of a ramp
        np.tile(np.array([1, 2], np.uint8), n // 2),     # no runs at all
        np.repeat(rng.integers(0, 256, n).astype(np.uint8), 3)[:n],
        # long far copies (dist 1500 > the decoder's 256-byte window):
        # regression for the period-promotion bug on non-periodic copies
        np.tile(rng.integers(0, 256, 1500, dtype=np.uint8), n // 1500 + 1)[:n],
    ]
    return np.stack(cases), n


def test_device_roundtrip(rng):
    S, n = _streams(rng)
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    out, produced, err = codec.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    assert np.array_equal(np.asarray(out), S)


def test_host_oracle_decodes_device_streams(rng):
    S, n = _streams(rng)
    slots, csizes, _ = map(np.asarray, codec.encode(jnp.asarray(S)))
    for i in range(S.shape[0]):
        stream = slots[i, : csizes[i]].tobytes()
        assert lzhost.decompress(stream, n) == S[i].tobytes()
        if binding.available():
            got = binding.blosclz_decompress(
                np.frombuffer(stream, np.uint8), n
            )
            assert got == S[i].tobytes()


def test_device_decodes_host_streams(rng):
    S, n = _streams(rng)
    for i in range(S.shape[0]):
        enc = lzhost.compress(9, S[i], n, True)
        if not enc:
            continue  # host encoder judged it incompressible
        W = len(enc) + 96
        buf = np.zeros((1, W), np.uint8)
        buf[0, : len(enc)] = np.frombuffer(enc, np.uint8)
        out, produced, err = codec.decode(
            jnp.asarray(buf), jnp.asarray([len(enc)]), n
        )
        assert not bool(np.asarray(err)[0])
        assert int(np.asarray(produced)[0]) == n
        assert np.array_equal(np.asarray(out)[0], S[i])


def test_corrupt_stream_reports_error():
    # match referencing before the start of output
    bad = np.zeros((1, 96), np.uint8)
    bad[0, 0] = 32 | 0      # ctrl: 1 literal
    bad[0, 1] = 7
    bad[0, 2] = (5 << 5) | 31  # match with absurd distance
    bad[0, 3] = 200
    out, produced, err = codec.decode(jnp.asarray(bad), jnp.asarray([4]), 64)
    assert bool(np.asarray(err)[0])


def test_compression_ratio_on_runs(rng):
    # a stream that is one run must compress ~n/263 tokens
    S = np.zeros((1, 8192), np.uint8)
    _, csizes, _ = codec.encode(jnp.asarray(S))
    assert int(np.asarray(csizes)[0]) < 8192 * 0.02
