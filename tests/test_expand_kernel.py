"""Pallas expand kernel vs the oracle (interpret mode on the CPU leg).

The real-chip validation runs in the TPU suite (the kernel is the
default placement there); these tests pin the kernel's semantics on
small cases where interpret mode is affordable.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.ops.codecs import blosclz as lzhost
from cblosc_tpu.tpu import codec, expand, structured


def _kernel_decode(rows, n):
    """walk -> compact -> expand for a list of stream byte strings."""
    W = max(len(r) for r in rows) + 80
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    buf = np.zeros((len(rows), Wpad), np.uint8)
    cs = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        buf[i, :len(r)] = np.frombuffer(r, np.uint8)
        cs[i] = len(r)
    recs, dist, uni, ok = structured._walk_batch(
        jnp.asarray(buf), jnp.asarray(cs), n, structured.max_records(n))
    out = expand.expand(jnp.asarray(buf), expand.compact_records(recs), n,
                        interpret=True)
    return np.asarray(out), np.asarray(ok), np.asarray(uni)


def test_expand_matches_oracle_on_our_streams(rng):
    n = 2048
    S = np.stack([
        np.zeros(n, np.uint8),
        np.tile(np.arange(128, dtype=np.uint8), n // 128),
        np.repeat(rng.integers(0, 5, 32).astype(np.uint8), n // 32),
        rng.integers(0, 2, n, dtype=np.uint8) * 7,
    ])
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    keep = [i for i in range(S.shape[0]) if int(csizes[i]) < n]
    assert len(keep) >= 3
    rows = [np.asarray(slots[i, :int(csizes[i])]).tobytes() for i in keep]
    out, ok, uni = _kernel_decode(rows, n)
    # record-overflow rows report ok=False and fall back in decode();
    # every row the walk accepts must expand bit-exactly
    assert ok.sum() >= 3
    assert np.array_equal(out[ok], S[keep][ok])


def test_expand_handles_mixed_distances(rng):
    """Host-encoder streams carry hash-table matches with MIXED
    distances; the per-record kernel decodes them on-device (the
    sort-based placement could not)."""
    n = 2048
    base = np.tile(rng.integers(0, 40, 97).astype(np.uint8), n // 97 + 1)[:n]
    pat = rng.integers(0, 9, 23).astype(np.uint8)
    weird = np.concatenate([pat, base[:n - 46], pat])[:n]
    rows, want = [], []
    for s in (base, weird):
        enc = lzhost.compress(9, s, n, True)
        assert enc
        rows.append(enc)
        want.append(s)
    out, ok, uni = _kernel_decode(rows, n)
    assert ok.all()
    assert not uni.all()          # at least one stream is mixed-distance
    assert np.array_equal(out, np.stack(want))


def test_expand_insert_records():
    """kind 2 immediate-byte records (the encoder's token emission)."""
    n = 1024
    recs = np.full((1, 8, 4), -1, np.int32)
    recs[0, 0] = (1, 0, 0, 0)      # no-op fill (L=0)
    recs[0, 0] = ((5 << 4) | 2, 0x04030201, 7, 0x00000605)
    recs[0, 1] = ((8 << 4) | 2, 0x11223344, 1000, 0x55667788)
    slots = np.zeros((1, 64), np.uint8)
    out = np.asarray(expand.expand(
        jnp.asarray(slots), jnp.asarray(recs), n, interpret=True))
    want = np.zeros(n, np.uint8)
    want[7:12] = [1, 2, 3, 4, 5]
    want[1000:1008] = [0x44, 0x33, 0x22, 0x11, 0x88, 0x77, 0x66, 0x55]
    assert np.array_equal(out[0], want)


def test_expand_clamps_adversarial_records():
    """Out-of-range records must not crash or write out of bounds."""
    n = 1024
    recs = np.full((1, 4, 4), -1, np.int32)
    recs[0, 0] = (0, 10_000, 900, 5_000)    # src+len far out of range
    recs[0, 1] = (1, 0, -50, 100)           # dist 0, negative dst
    slots = np.arange(64, dtype=np.uint8)[None, :].copy()
    out = np.asarray(expand.expand(
        jnp.asarray(slots), jnp.asarray(recs), n, interpret=True))
    assert out.shape == (1, n)


def test_expand_merged_virtual_rows(rng):
    """merge_rows fuses m small rows into one kernel program; the output
    must be bit-identical to per-row expansion, with not-ok rows'
    records invalidated (their subranges are don't-care)."""
    import jax.numpy as jnp
    import numpy as np

    n = 2048
    S = np.stack([
        np.zeros(n, np.uint8),
        np.tile(np.arange(64, dtype=np.uint8), n // 64),
        np.repeat(rng.integers(0, 5, n // 32).astype(np.uint8), 32),
        np.tile(np.array([3, 1, 4], np.uint8), n // 3 + 1)[:n],
    ] * 2)                                  # 8 rows
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    W = int(slots.shape[1])
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    sl = jnp.pad(slots, ((0, 0), (0, Wpad - W)))
    recs, dist, uni, ok = structured._walk_batch(
        sl, csizes, n, structured.max_records(n))
    ok_np = np.asarray(ok)
    assert ok_np.all()

    per_row = np.asarray(expand.expand(
        sl[:, :W], expand.compact_records(recs), n, interpret=True))
    m = structured.merge_factor(8, n)
    assert m > 1
    slm, rcm = structured.merge_rows(sl, recs, ok, n, m)
    merged = np.asarray(expand.expand(
        slm, expand.compact_records(rcm), m * n,
        interpret=True)).reshape(8, n)
    assert np.array_equal(merged[ok_np], per_row[ok_np])
    assert np.array_equal(merged, S)

    # a not-ok row must not clobber its neighbors' subranges
    ok_bad = ok & (jnp.arange(8) != 2)
    slm, rcm = structured.merge_rows(sl, recs, ok_bad, n, m)
    merged2 = np.asarray(expand.expand(
        slm, expand.compact_records(rcm), m * n,
        interpret=True)).reshape(8, n)
    keep = np.asarray(ok_bad)
    assert np.array_equal(merged2[keep], S[keep])
