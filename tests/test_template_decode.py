"""Template fast-path decoder (structured._template_match).

The device decoder recognizes our encoder's PURE emissions closed-form
(codec._emit_pure's layout is a static function of (d, out_len) — see
structured._template_table) and tiles them without entering the walk.
These tests pin:

  * the matcher accepts exactly the encoder's pure emissions for every
    pow2 distance and reconstructs the bytes bit-exactly;
  * literal bytes are free (any pattern content matches);
  * near-misses (wrong csize, corrupted structural byte) do NOT match
    and fall back to the walk / loop decoder with correct semantics;
  * a corrupted stream that no longer parses to out_len reports err.

Reference wire grammar: blosc/blosclz.c:679-789.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cblosc_tpu.tpu import codec, structured


def _pure_rows(rng, out_len, ds):
    """Pure periodic rows + their _emit_pure streams for distances ds."""
    rows = []
    for d in ds:
        pat = rng.integers(0, 256, d, dtype=np.uint8)
        row = np.tile(pat, out_len // d + 1)[:out_len]
        row[-1] ^= 1  # tail literal differs from the pattern
        rows.append(row)
    s = jnp.asarray(np.stack(rows))
    d_vec = jnp.asarray(np.array(ds, np.int32)[:, None])
    W = codec.slot_width(out_len)
    slots, csize, _ = codec._emit_pure(s, d_vec, W)
    return np.stack(rows), np.asarray(slots).copy(), np.asarray(csize).copy()


POW2 = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@pytest.mark.parametrize("out_len", [256, 2048])
def test_matcher_accepts_every_pow2_distance(rng, out_len):
    ds = [d for d in POW2 if out_len - 1 - d >= 3]
    raw, slots, csize = _pure_rows(rng, out_len, ds)
    tm = structured._template_match(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert tm is not None
    match, dsel, pat, tail = tm
    assert np.asarray(match).all()
    assert list(np.asarray(dsel)) == ds
    # reconstruct: tile the pattern, patch the tail
    out = np.asarray(structured._tile_from_pattern(
        pat, dsel, tail, out_len))
    assert (out == raw).all()


def test_matcher_rejects_wrong_csize(rng):
    out_len = 2048
    ds = [1, 8, 256]
    _, slots, csize = _pure_rows(rng, out_len, ds)
    tm = structured._template_match(
        jnp.asarray(slots), jnp.asarray(csize + 1), out_len)
    match = np.asarray(tm[0])
    assert not match.any()


def test_matcher_rejects_corrupt_structural_byte(rng):
    out_len = 2048
    ds = [4, 32, 256]
    _, slots, csize = _pure_rows(rng, out_len, ds)
    # flip the match token (position d + ceil(d/32)) in every row
    for i, d in enumerate(ds):
        slots[i, d + -(-d // 32)] ^= 0x10
    tm = structured._template_match(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert not np.asarray(tm[0]).any()


def test_decode_roundtrips_templates_bit_exact(rng):
    out_len = 2048
    ds = [d for d in POW2 if out_len - 1 - d >= 3]
    raw, slots, csize = _pure_rows(rng, out_len, ds)
    out, produced, err = structured.decode(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == out_len).all()
    assert (np.asarray(out) == raw).all()


def test_corrupt_template_stream_reports_err(rng):
    out_len = 2048
    raw, slots, csize = _pure_rows(rng, out_len, [16])
    # shrink the final extension byte: the match no longer reaches
    # out_len-1, so the stream parses but produces too few bytes
    tmpl = {d: (cs, pos, val)
            for d, cs, pos, val in structured._template_table(out_len)}
    cs16, pos16, _ = tmpl[16]
    ext_last = pos16[-3]            # last ext byte (before dlo, E2)
    assert slots[0, ext_last] > 0
    slots[0, ext_last] -= 1
    tm = structured._template_match(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert not np.asarray(tm[0]).any()
    out, produced, err = structured.decode(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert np.asarray(err).all() or (np.asarray(produced) != out_len).all()


def test_literal_corruption_still_matches_and_decodes(rng):
    # literal bytes are unconstrained: flipping one changes the output,
    # not the template match
    out_len = 2048
    raw, slots, csize = _pure_rows(rng, out_len, [64])
    slots[0, 5] ^= 0xFF             # a pattern byte inside chunk 0
    raw2 = raw.copy()
    pat = raw2[0, :64].copy()
    pat[4] ^= 0xFF                  # stream pos 5 = pattern index 4
    raw2[0] = np.tile(pat, out_len // 64)
    raw2[0, -1] = raw[0, -1]
    out, produced, err = structured.decode(
        jnp.asarray(slots), jnp.asarray(csize), out_len)
    assert not np.asarray(err).any()
    assert (np.asarray(out) == raw2).all()


def test_mixed_batch_template_and_walk_rows(rng):
    # template rows mixed with a non-template (host-shaped) stream and a
    # stored-raw row: every row must still decode via its own path
    out_len = 2048
    raw, slots, csize = _pure_rows(rng, out_len, [1, 32])
    from cblosc_tpu.ops.codecs import blosclz as lzh

    msg = rng.integers(0, 4, out_len, dtype=np.uint8) * 3
    host = lzh.compress(9, msg.tobytes(), out_len + 64, True)
    W = slots.shape[1]
    assert host is not None and len(host) <= W
    hrow = np.zeros((W,), np.uint8)
    hrow[: len(host)] = np.frombuffer(host, np.uint8)
    slots2 = np.concatenate([slots, hrow[None, :]], axis=0)
    cs2 = np.concatenate([csize, [len(host)]]).astype(np.int32)
    out, produced, err = structured.decode(
        jnp.asarray(slots2), jnp.asarray(cs2), out_len)
    assert not np.asarray(err).any()
    assert (np.asarray(out[:2]) == raw).all()
    assert bytes(np.asarray(out[2])) == msg.tobytes()
