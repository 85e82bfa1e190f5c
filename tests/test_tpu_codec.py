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


def test_pure_closed_form_matches_sort_path(rng):
    """_emit_pure must be byte-identical to the scan+sort emission on
    pure rows, for every candidate distance and geometry corner."""
    from cblosc_tpu.tpu.codec import (_emit_full, _emit_pure, _eq_for,
                                      _score, slot_width)

    for n in (256, 1024, 2048, 4096, 16384):
        rows, want_d = [], []
        for d in codec.DISTANCES:
            if d >= n - 4 or d > 256:
                continue
            pat = rng.integers(0, 256, d, dtype=np.uint8)
            # ensure the PERIODIC structure doesn't accidentally prefer a
            # smaller candidate distance: skip rows whose chosen d differs
            row = np.tile(pat, n // d + 1)[:n]
            rows.append(row)
            want_d.append(d)
        S = jnp.asarray(np.stack(rows))
        d_row, pure, cov, total = _score(S, codec.DISTANCES)
        full = _emit_full(S, _eq_for(S, d_row, codec.DISTANCES), d_row)
        W = slot_width(n)
        pw = _emit_pure(S, d_row, W)
        pure_np = np.asarray(pure)
        for i in range(len(rows)):
            if not pure_np[i]:
                continue
            assert np.array_equal(np.asarray(pw[0][i]), np.asarray(full[0][i])), \
                (n, want_d[i])
            assert int(pw[1][i]) == int(full[1][i])
            assert int(pw[2][i]) == int(full[2][i])
        assert pure_np.sum() >= len(rows) - 2


def test_encode_grouped_pure_matches_ungrouped(rng):
    """encode() with purity grouping returns the same results as the
    plain full path for a mixed batch."""
    from cblosc_tpu.tpu.codec import _emit_full, _eq_for, _score

    n = 2048
    rows = []
    for i in range(24):
        kind = i % 4
        if kind == 0:
            rows.append(np.zeros(n, np.uint8))
        elif kind == 1:
            rows.append(np.tile(np.arange(16, dtype=np.uint8), n // 16))
        elif kind == 2:
            rows.append(rng.integers(0, 6, n).astype(np.uint8))
        else:
            rows.append(rng.integers(0, 256, n, dtype=np.uint8))
    S = jnp.asarray(np.stack(rows))
    slots, csize, est = codec.encode(S)
    d_row, pure, cov, total = _score(S, codec.DISTANCES)
    slots2, csize2, est2 = _emit_full(S, _eq_for(S, d_row, codec.DISTANCES),
                                      d_row)
    assert np.array_equal(np.asarray(csize), np.asarray(csize2))
    assert np.array_equal(np.asarray(est), np.asarray(est2))
    assert np.array_equal(np.asarray(slots), np.asarray(slots2))


def test_entropy_abort_stores_marginal_rows_raw(rng):
    """The device encoder mirrors blosclz's entropy probe
    (blosclz.c:425-435): below the clevel's estimated-ratio threshold a
    row reports csize >= n without paying for emission; clevel 9 keeps
    near-maximum-ratio behavior."""
    n = 2048
    # ~12% d=1 coverage: compresses a whisker, ratio ~1.05
    marginal = rng.integers(0, 8, (16, n)).astype(np.uint8)
    zeros = np.zeros((16, n), np.uint8)
    S = jnp.asarray(np.concatenate([marginal, zeros]))
    _, cs_off, _ = codec.encode(S, codec.DISTANCES, 0)
    _, cs_cl1, _ = codec.encode(S, codec.DISTANCES, 200)   # clevel-1 bar
    m_off = np.asarray(cs_off[:16])
    m_cl1 = np.asarray(cs_cl1[:16])
    assert (np.asarray(cs_cl1[16:]) < 64).all()      # pure rows untouched
    assert (m_cl1 >= n).all()                        # aborted
    # threshold 100 (clevel 9) keeps whatever compresses at all
    _, cs_cl9, _ = codec.encode(S, codec.DISTANCES, 100)
    assert np.array_equal(np.asarray(cs_cl9[:16]) >= n, m_off >= n)


def test_mined_distance_finds_large_periods(rng):
    """_mine_distance recovers periods the static candidate set cannot
    reach — the batched analog of the reference hash table
    (blosclz.c:459-461) — including far-form (> 8191) distances."""
    n = 65536
    rows = [
        (np.arange(n) // 128 % 256).astype(np.uint8),  # staircase, 32768
        (np.arange(n) % 251).astype(np.uint8),         # prime period
        rng.integers(0, 256, n, dtype=np.uint8),       # no structure
        np.zeros(n, np.uint8),                         # runs only
    ]
    dm = np.asarray(codec._mine_distance(jnp.asarray(np.stack(rows)))[0])
    assert dm[0] == 32768
    assert dm[1] == 251
    assert dm[2] == 0


def test_far_distance_streams_cross_decode(rng):
    """Mined far-distance (> 8191) emission: device streams must decode
    bit-exactly on the device decoders, the numpy oracle, and the native
    C++ engine (wire grammar blosclz.c:690-744)."""
    n = 65536
    rows = [
        (np.arange(n) // 128 % 256).astype(np.uint8),    # one far run
        (np.arange(n) // 64 % 256).astype(np.uint8),     # period 16384
        np.tile(rng.integers(0, 256, 9000, np.uint8), 8)[:n],  # 9000 far
    ]
    S = np.stack(rows)
    slots, csizes, _ = codec.encode(jnp.asarray(S), codec.DISTANCES, 0, True)
    slots_np, cs_np = np.asarray(slots), np.asarray(csizes)
    assert (cs_np < n).all(), "far matches must compress these rows"
    # static-only encoding cannot reach these periods
    _, cs_static, _ = codec.encode(jnp.asarray(S), codec.DISTANCES, 0, False)
    assert (cs_np < np.asarray(cs_static) * 0.75).all()
    from cblosc_tpu.tpu import structured

    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), S)
    for i in range(S.shape[0]):
        stream = slots_np[i, : cs_np[i]].tobytes()
        assert lzhost.decompress(stream, n) == S[i].tobytes()
        if binding.available():
            got = binding.blosclz_decompress(
                np.frombuffer(stream, np.uint8), n)
            assert got == S[i].tobytes()


def test_score32_matches_byte_scoring(rng, monkeypatch):
    """The u32-lane scorer must agree with byte scoring on the calls
    that matter: identical purity flags (exactness — _emit_pure trusts
    them) and identical distance choice on periodic rows. _score is not
    jitted at module level, so the knob applies per call."""
    from cblosc_tpu.tpu.codec import _score

    for n in (256, 2048, 4096):
        rows = []
        for d in codec.DISTANCES:
            if d >= n - 4:
                continue
            pat = rng.integers(0, 256, d, dtype=np.uint8)
            rows.append(np.tile(pat, n // d + 1)[:n])
        # corners: random, constant, periodic-with-one-miss, short tail
        rows.append(rng.integers(0, 256, n, dtype=np.uint8))
        rows.append(np.zeros(n, np.uint8))
        broken = np.tile(rows[2][:4], n // 4)[:n].copy()
        broken[n // 2] ^= 0xFF
        rows.append(broken)
        S = jnp.asarray(np.stack(rows))

        monkeypatch.setenv("CBLOSC_TPU_SCORE32", "0")
        d_b, pure_b, cov_b, tot_b = (np.asarray(v) for v in
                                     _score(S, codec.DISTANCES))
        monkeypatch.setenv("CBLOSC_TPU_SCORE32", "1")
        d_u, pure_u, cov_u, tot_u = (np.asarray(v) for v in
                                     _score(S, codec.DISTANCES))
        np.testing.assert_array_equal(pure_b, pure_u, err_msg=str(n))
        assert pure_b[:len(rows) - 3].sum() >= len(rows) - 5
        # pure rows: identical distance and exact coverage both paths
        np.testing.assert_array_equal(d_b[pure_b], d_u[pure_b])
        np.testing.assert_array_equal(tot_b[pure_b], tot_u[pure_b])
