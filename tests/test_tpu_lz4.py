"""Device LZ4 codec: wire-format conformance and cross-decoding."""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.native import binding
from cblosc_tpu.ops.codecs import lz4 as lz4host
from cblosc_tpu.tpu import codec_lz4


def _streams(rng, n=4096):
    cases = [
        np.zeros(n, np.uint8),
        (np.arange(n) // 256).astype(np.uint8),
        np.tile(np.arange(128, dtype=np.uint8), n // 128),
        np.tile(np.array([7, 9], np.uint8), n // 2),
        rng.integers(0, 256, n, dtype=np.uint8),
        np.repeat(rng.integers(0, 5, 40).astype(np.uint8),
                  rng.integers(1, 900, 40))[:n].copy(),
        np.pad(rng.integers(0, 256, 100, dtype=np.uint8), (0, n - 100)),
    ]
    return np.stack(cases), n


def test_device_lz4_roundtrip(rng):
    S, n = _streams(rng)
    slots, csizes, _ = codec_lz4.encode(jnp.asarray(S))
    out, produced, err = codec_lz4.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    assert np.array_equal(np.asarray(out), S)


def test_host_decoders_read_device_lz4(rng):
    S, n = _streams(rng)
    slots, csizes, _ = map(np.asarray, codec_lz4.encode(jnp.asarray(S)))
    for i in range(S.shape[0]):
        stream = slots[i, : csizes[i]].tobytes()
        assert lz4host.decompress(stream, n) == S[i].tobytes()
        if binding.available():
            got = binding.lz4_decompress(np.frombuffer(stream, np.uint8), n)
            assert got == S[i].tobytes()


def test_device_reads_native_lz4_uniform(rng):
    """Native-encoder streams with a single match distance decode on
    device; mixed-distance streams must flag err (host fallback)."""
    S, n = _streams(rng)
    if not binding.available():
        pytest.skip("native engine unavailable")
    for i in (0, 2, 3):
        enc = binding.lz4_compress(S[i], n + 64, accel=1)
        buf = np.zeros((1, len(enc) + 64), np.uint8)
        buf[0, : len(enc)] = np.frombuffer(enc, np.uint8)
        out, produced, err = codec_lz4.decode(
            jnp.asarray(buf), jnp.asarray([len(enc)]), n
        )
        assert not bool(np.asarray(err)[0])
        assert np.array_equal(np.asarray(out)[0], S[i])


def test_device_lz4_flags_unparseable(rng):
    bad = rng.integers(0, 256, (2, 128), dtype=np.uint8)
    out, produced, err = codec_lz4.decode(
        jnp.asarray(bad), jnp.asarray([128, 128]), 4096
    )
    # random bytes either parse to an error or fail the op==out_len check
    assert np.asarray(err).all()


def test_lz4_format_rules(rng):
    """MFLIMIT / lastLiterals: the final 5+ bytes of every stream decode
    as literals and no match extends into them."""
    S = np.zeros((1, 4096), np.uint8)
    slots, csizes, _ = map(np.asarray, codec_lz4.encode(jnp.asarray(S)))
    stream = slots[0, : csizes[0]].tobytes()
    # last sequence: token with zero match nibble consumed at stream end
    assert lz4host.decompress(stream, 4096) == S[0].tobytes()


def test_lz4_mined_distance_streams_cross_decode(rng):
    """Mined adaptive distances in the LZ4 encoder (16-bit offsets, no
    far escape needed): streams must stay valid LZ4 blocks — including
    the two-class adjacency case where a mined run abuts a static run
    and the first sub-match must carry its own zero-literal token."""
    import numpy as np
    import jax.numpy as jnp
    from cblosc_tpu.tpu import codec, codec_lz4
    from cblosc_tpu.ops.codecs import lz4 as lz4host

    n = 65536
    rows = [
        (np.arange(n) // 128 % 256).astype(np.uint8),   # staircase 32768
        (np.arange(n) % 251).astype(np.uint8),          # prime period
        np.tile(rng.integers(0, 256, 9000, np.uint8), 8)[:n],
    ]
    S = np.stack(rows)
    sl, cs, _ = codec_lz4.encode(jnp.asarray(S), codec.DISTANCES, 0, True)
    _, cs0, _ = codec_lz4.encode(jnp.asarray(S), codec.DISTANCES, 0, False)
    cs, cs0 = np.asarray(cs), np.asarray(cs0)
    assert (cs < n).all()
    assert (cs < cs0 * 0.75).all()
    for i in range(S.shape[0]):
        stream = np.asarray(sl[i, :cs[i]]).tobytes()
        assert lz4host.decompress(stream, n) == S[i].tobytes(), i


def _textlike(rng, n):
    """Match-rich data: random short words from a tiny dictionary, the
    shape that makes hash-table encoders emit a token every few bytes."""
    words = [rng.integers(97, 123, int(k), dtype=np.uint8)
             for k in rng.integers(3, 8, 24)]
    out = np.concatenate(
        [words[i] for i in rng.integers(0, len(words), n // 3)])
    return out[:n].copy()


def test_lz4_token_dense_budget_escalation(rng):
    """Foreign token-dense LZ4 streams overflow the default record
    budget; the escalated budget (structured.high_records) must walk
    them fully, and the expand kernel must place them bit-exactly
    (host_api retries with this budget before any host fallback)."""
    import jax

    from cblosc_tpu.tpu import expand, structured

    n = 8192
    a = _textlike(rng, n)
    enc = lz4host.compress(a.tobytes(), 2 * n + 64, acceleration=1)
    assert enc
    W = max(-(-(len(enc) + structured._MARGIN) // 128) * 128,
            structured._WINW)
    buf = np.zeros((1, W), np.uint8)
    buf[0, : len(enc)] = np.frombuffer(enc, np.uint8)
    cs = np.array([len(enc)], np.int32)

    walk = jax.jit(codec_lz4._walk_batch, static_argnums=(2, 3))
    _, _, _, ok_lo = walk(jnp.asarray(buf), jnp.asarray(cs), n,
                          codec_lz4.max_records(n))
    assert not np.asarray(ok_lo).any()       # default budget overflows

    hi = structured.high_records(n)
    recs, dist, uni, ok_hi = walk(jnp.asarray(buf), jnp.asarray(cs), n, hi)
    assert np.asarray(ok_hi).all()
    out = np.asarray(expand.expand(
        jnp.asarray(buf), expand.compact_records(recs), n, interpret=True))
    assert np.array_equal(out[0], a)

    # the decode() entry honors the hint end-to-end
    out2, produced, err = codec_lz4.decode(
        jnp.asarray(buf), jnp.asarray(cs), n, hi)
    if not np.asarray(err)[0]:               # kernel path (TPU leg)
        assert np.array_equal(np.asarray(out2)[0], a)
