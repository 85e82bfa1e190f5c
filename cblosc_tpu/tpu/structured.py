"""Structured device decoder: sort+scan placement instead of byte loops.

The generic decoder (codec._decode_one) moves every output byte through a
dynamic-offset window write, which costs ~14 ns/element on TPU — a hard
~0.07 GB/s ceiling. This module decodes the streams that dominate real
workloads (every stream our encoder emits, and any conforming blosclz
stream whose matches share one distance) with TPU-fast primitives only:

  1. WALK — a parse-only while loop: one iteration per token, no byte
     copies (~20x cheaper per iteration than decoding), producing
     fixed-shape token records (kind, src, dst, len) plus per-row
     uniform-distance and ok flags;
  2. PLACE — literal bytes land via ONE ascending key sort per row:
     compressed positions inside literal runs get key (dst<<8|byte)
     (dst comes from a region fill: sparse scatter of record deltas +
     cummax), match positions get synthesized (x<<8|0) entries, so the
     sort emits the output skeleton directly;
  3. FILL — for each candidate distance d, reshape the skeleton to
     (n/d, d) residue columns and forward-fill match positions with a
     keyed cummax: out[x] = out[x-d] applied transitively is exactly
     "nearest non-match value above in the same residue column".

Rows the machine cannot handle (mixed distances, foreign geometry,
record overflow, parse errors) fall back to the generic loop decoder;
the two batches merge with a select. Everything stays on device and
under one jit.

Packing constraints: region-fill keys carry (position, flags, delta)
in uint32 — one fill up to 16 KB splits, two parallel fills up to the
32 KB splits the device blocksize policy tops out at; larger foreign
splits use the fallback decoder.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import codec

I32 = jnp.int32
U8 = jnp.uint8

MAX_OUT = 32768                 # key-packing limit (see module docstring)

# distances the FILL stage compiles residue-column scans for; rows whose
# uniform distance is not in this set fall back to the loop decoder
FILL_DISTANCES = codec.DISTANCES


def max_records(out_len: int) -> int:
    """Worst case: one record per 32-byte literal chunk plus slack."""
    return out_len // 32 + 24


# ---------------------------------------------------------------------------
# WALK: parse-only token scan
# ---------------------------------------------------------------------------

_KCHUNK = 16                    # walk iterations per scan chunk


def _walk_one(src: jax.Array, csize: jax.Array, out_len: int, maxrec: int):
    """Parse one stream into records. Returns (recs (slots, 4) i32 as
    [kind, src_off, dst_off, len] with kind == -1 marking empty slots,
    dist, ok).

    Record kinds: 0 = literal chunk (contiguous data), 1 = match,
    2 = literal TRAIN (8 full 32-byte cells with interleaved control
    bytes; the place stage strips the controls elementwise).

    One iteration consumes a literal (chunk or train) AND a following
    match token — under vmap every branch executes anyway, so fusing the
    phases halves the iteration count of interleaved streams for free.
    The loop is a while over lax.scan chunks of _KCHUNK iterations:
    records land in the scan's stacked outputs (static positions), so an
    iteration costs exactly ONE dynamic op (the source window read) —
    the chunk write amortizes to 1/_KCHUNK ops.
    """
    W = src.shape[0]
    srci = src.astype(I32)
    span = codec._FASTLIT * 33
    nchunks = -(-maxrec // (2 * _KCHUNK))
    recs0 = jnp.full((nchunks * 2 * _KCHUNK, 4), -1, I32)
    invalid = jnp.full((4,), -1, I32)

    WINW = span + 16            # one window covers ctrls AND token parse
    wwi = jnp.arange(WINW, dtype=I32)

    def inner(carry, _):
        ip, op, token, extacc, dist, err, fin = carry
        active = ~(err | fin)

        # ONE dynamic read per iteration: dynamic ops cost ~2us per row
        # per CALL on TPU, so op count — not element count — is the
        # currency here. The window starts at ip; everything this
        # iteration needs lies within ip + span + 16.
        winc = jnp.minimum(ip, jnp.maximum(W - WINW, 0))
        win = jax.lax.dynamic_slice(srci, (winc,), (WINW,))
        win = jnp.where(wwi + winc < csize, win, 0)   # zeros past stream
        sh = ip - winc                                # 0 except near W end

        def _sel(off):
            """win[off] via masked sum — no gather op."""
            return jnp.sum(jnp.where(wwi == off, win, 0))

        # ---- phase A: literal chunk or 8-cell train -----------------------
        is_lit = token < 32
        llen = token + 1
        ls_ip2 = ip + llen
        fb = codec._FASTB
        ctrls_ok = jnp.sum(jnp.where(
            (wwi >= sh + 32) & (wwi < sh + 32 + (codec._FASTLIT - 1) * 33)
            & ((wwi - sh - 32) % 33 == 0) & (win != 31), 1, 0)) == 0
        fast = (is_lit & (token == 31) & (ip + span < csize)
                & (op + fb <= out_len) & (sh == 0) & ctrls_ok)
        slow = is_lit & ~fast
        ip1 = jnp.where(fast, ip + span, jnp.where(slow, ls_ip2, ip))
        op1 = jnp.where(fast, op + fb, jnp.where(slow, op + llen, op))
        err1 = err | (slow & ((op + llen > out_len) | (ls_ip2 > csize)))
        lit_fin = is_lit & (ip1 >= csize)
        rec_lit = jnp.stack([
            jnp.where(fast, 2, 0), ip,
            op, jnp.where(fast, jnp.int32(span - 1), llen)])

        # ---- phase B: match token parse ------------------------------------
        tok1 = jnp.where(
            fast, _sel(sh + span - 1),
            jnp.where(slow & ~lit_fin, _sel(sh + llen), token))
        ip1 = jnp.where(slow & ~lit_fin, ls_ip2 + 1, ip1)
        base = ip1 - winc                             # parse offset in win

        can_m = ~lit_fin & ~err1 & ~fin & (tok1 >= 32)
        mbase = (tok1 >> 5) - 1
        inw8 = (wwi >= base) & (wwi < base + 8)
        lead = jnp.cumprod(
            jnp.where(wwi < base, 1,
                      (jnp.where(inw8, win, -1) == 255).astype(I32)))
        kk = jnp.sum(jnp.where(wwi >= base, lead, 0))
        has_ext = mbase == 6
        ext_more = can_m & has_ext & (kk >= 8)
        m_ok = can_m & ~ext_more

        lastb = _sel(base + jnp.minimum(kk, 7))
        mlen = jnp.where(has_ext, 6 + extacc + 255 * kk + lastb, mbase) + 3
        eoff = jnp.where(has_ext, kk + 1, 0)          # bytes of ext consumed
        dhi = tok1 & 31
        dlo = _sel(base + eoff)
        far = (dlo == 255) & (dhi == 31)
        b1 = _sel(base + eoff + 1)
        b2 = _sel(base + eoff + 2)
        bk = jnp.where(far, (b1 << 8) + b2 + 8192, (dhi << 8) + dlo + 1)
        nexto = base + eoff + 1 + jnp.where(far, 2, 0)
        ip4 = ip1 + eoff + 1 + jnp.where(far, 2, 0)   # next-token position
        d2 = jnp.where(dist == 0, bk, dist)
        err2 = err1 | (m_ok & (
            (bk > op1) | (op1 + mlen > out_len) | (ip4 >= csize)
            | (bk != d2)                      # mixed distances: bail out
            | (nexto >= WINW)                 # parse ran past the window
        )) | (ext_more & (ip1 + 8 >= csize))
        rec_m = jnp.stack([jnp.int32(1), bk, op1, mlen])

        op2 = jnp.where(m_ok, op1 + mlen, op1)
        ip5 = jnp.where(ext_more, ip1 + 8,
                        jnp.where(m_ok, ip4 + 1, ip1))
        tok2 = jnp.where(m_ok, _sel(nexto), tok1)
        extacc2 = jnp.where(ext_more, extacc + 8 * 255,
                            jnp.where(m_ok, 0, extacc))
        dist2 = jnp.where(m_ok, d2, dist)

        # ---- emit 0-2 records into this iteration's static slots -----------
        valid0 = active & (is_lit | m_ok)
        valid1 = active & is_lit & m_ok
        row0 = jnp.where(is_lit, rec_lit, rec_m)
        rows = jnp.stack([jnp.where(valid0, row0, invalid),
                          jnp.where(valid1, rec_m, invalid)])
        # freeze finished/erred rows (scan runs all _KCHUNK steps)
        new = (ip5, op2, tok2, extacc2, dist2, err2, fin | lit_fin)
        old = (ip, op, token, extacc, dist, err, fin)
        carry = tuple(jnp.where(active, n, o) for n, o in zip(new, old))
        return carry, rows

    def cond(st):
        recs, kslot, carry = st[0], st[1], st[2:]
        return ~(carry[5] | carry[6]) & (kslot < nchunks)

    def body(st):
        recs, kslot = st[0], st[1]
        carry, rows = jax.lax.scan(inner, st[2:], None, length=_KCHUNK)
        recs = jax.lax.dynamic_update_slice(
            recs, rows.reshape(2 * _KCHUNK, 4), (kslot * 2 * _KCHUNK, 0))
        return (recs, kslot + 1) + carry

    st = jax.lax.while_loop(
        cond, body,
        (recs0, jnp.int32(0), jnp.int32(1), jnp.int32(0), srci[0] & 31,
         jnp.int32(0), jnp.int32(0), csize <= 0, csize <= 1),
    )
    recs, kslot = st[0], st[1]
    ip, op, token, extacc, dist, err, fin = st[2:]
    err = err | ~(err | fin)            # ran out of chunks: unhandled
    ok = ~err & (op == out_len)
    return recs, dist, ok


def grouped_walk(walk, slots, csizes, out_len: int, maxrec: int,
                 group: int = 1024):
    """vmap `walk` over rows SORTED BY CSIZE in lax.map groups.

    A vmapped while_loop runs every row for the batch maximum iteration
    count — idle rows still pay the per-iteration dynamic-op cost. Sorting
    rows by csize (a proxy for token count; row permutation is a cheap
    row-granular gather, ~100 GB/s) clusters similar rows so each group's
    loop exits at its own pace; stored-raw rows (csize 0) cost nothing.
    """
    N = slots.shape[0]

    def vwalk(sl, cs):
        return jax.vmap(walk, in_axes=(0, 0, None, None))(
            sl, cs, out_len, maxrec)

    if N <= group:
        return vwalk(slots, csizes)
    order = jnp.argsort(csizes)
    inv = jnp.argsort(order)
    sl = jnp.take(slots, order, axis=0)
    cs = jnp.take(csizes, order)
    pad = (-N) % group
    if pad:
        sl = jnp.pad(sl, ((0, pad), (0, 0)))
        cs = jnp.pad(cs, (0, pad))
    g = sl.shape[0] // group
    outs = jax.lax.map(
        lambda t: vwalk(t[0], t[1]),
        (sl.reshape(g, group, sl.shape[1]), cs.reshape(g, group)),
    )
    return jax.tree.map(
        lambda a: jnp.take(a.reshape(g * group, *a.shape[2:])[:N], inv,
                           axis=0),
        outs,
    )


# ---------------------------------------------------------------------------
# PLACE + FILL
# ---------------------------------------------------------------------------

def _segment_fill(n_cols: int, starts, keys, N: int):
    """Sparse scatter of `keys` at `starts` (both (N, R), invalid entries
    must carry start == n_cols) into (N, n_cols), then a cummax forward
    fill. Keys must embed the position in their high bits so cummax
    holds the latest marker. Keys are uint32 (the 15-bit position +
    flag + 16-bit payload layout uses the sign bit)."""
    base = (jnp.arange(N, dtype=I32) * n_cols)[:, None]
    gi = jnp.where(starts < n_cols, base + starts, N * n_cols).reshape(-1)
    flat = jnp.zeros((N * n_cols,), jnp.uint32).at[gi].set(
        keys.reshape(-1).astype(jnp.uint32), mode="drop")
    return jax.lax.cummax(flat.reshape(N, n_cols), axis=1)


def _place_and_fill(slots, csizes, recs, rec_valid, dist, ok, out_len: int):
    """Batched skeleton construction + per-distance forward fills.
    rec_valid: (N, R) bool mask of live record slots."""
    N, Wc = slots.shape
    kind = recs[..., 0]
    srco = recs[..., 1]
    dsto = recs[..., 2]
    ln = recs[..., 3]
    valid = rec_valid & ok[:, None]

    # --- compressed-space fill: dst delta for literal-run bytes -----------
    lit = valid & (kind != 1)
    train = (kind == 2).astype(jnp.uint32)
    rdelta = (dsto - srco + out_len).astype(jnp.uint32)  # in [1, 2*out_len)
    u_src = srco.astype(jnp.uint32)
    u_end = (srco + ln).astype(jnp.uint32)
    starts = jnp.concatenate(
        [jnp.where(lit, srco, Wc), jnp.where(lit, srco + ln, Wc)], axis=1)
    p = jnp.arange(Wc, dtype=I32)[None, :]
    if out_len <= 16384:
        # one fill: pos(15) << 17 | lit(1) << 16 | train(1) << 15 | delta(15)
        k_start = (u_src << 17) | jnp.uint32(1 << 16) | (train << 15) | rdelta
        k_end = u_end << 17                              # gap marker
        keys = jnp.concatenate([jnp.where(lit, k_start, 0),
                                jnp.where(lit, k_end, 0)], axis=1)
        cfill = _segment_fill(Wc, starts, keys, N)
        in_lit = ((cfill >> 16) & 1) == 1
        is_train = ((cfill >> 15) & 1) == 1
        src0 = (cfill >> 17).astype(I32)
        delta = (cfill & 0x7FFF).astype(I32)
    else:
        # two fills: A = pos(16) << 16 | delta(16);
        #            B = pos(16) << 16 | lit(1) << 1 | train(1)
        ka = (u_src << 16) | rdelta
        kb = (u_src << 16) | jnp.uint32(2) | train
        ka_end = u_end << 16
        keys_a = jnp.concatenate([jnp.where(lit, ka, 0),
                                  jnp.where(lit, ka_end, 0)], axis=1)
        keys_b = jnp.concatenate([jnp.where(lit, kb, 0),
                                  jnp.where(lit, u_end << 16, 0)], axis=1)
        fa = _segment_fill(Wc, starts, keys_a, N)
        fb = _segment_fill(Wc, starts, keys_b, N)
        in_lit = ((fb >> 1) & 1) == 1
        is_train = (fb & 1) == 1
        src0 = (fb >> 16).astype(I32)
        delta = (fa & 0xFFFF).astype(I32)
    toff = p - src0                                      # offset in train
    # trains interleave a control byte after every 32 data bytes
    in_lit &= ~(is_train & (toff % 33 == 32))
    dst_p = (p + delta - out_len
             - jnp.where(is_train, toff // 33, 0))
    e1 = jnp.where(in_lit & (p < csizes[:, None]),
                   (dst_p << 8) | slots.astype(I32), codec._BIG)

    # --- output-space fill: match mask ------------------------------------
    mstarts = jnp.where(valid, dsto, out_len)
    mkeys = jnp.where(valid, (dsto << 1) | (kind == 1), 0)
    ofill = _segment_fill(out_len, mstarts, mkeys, N)
    is_match = (ofill & 1) == 1
    x = jnp.arange(out_len, dtype=I32)[None, :]
    e2 = jnp.where(is_match, x << 8, codec._BIG)

    # --- skeleton via one ascending sort ----------------------------------
    skel = jax.lax.sort(jnp.concatenate([e1, e2], axis=1), dimension=1)
    skel = (skel[:, :out_len] & 0xFF).astype(U8)

    # --- residue-column forward fills, one per candidate distance ---------
    # NOTE: the optimization_barrier below is load-bearing. XLA TPU
    # miscompiles the fused place->fill program (a dd-fill silently
    # yields zeros for rows of that distance; v5e, jax 0.9 / libtpu
    # 2026-08; correct on CPU, correct when stages compile separately,
    # and Heisenbergs away when intermediates become outputs). The
    # barrier before each cummax pins the fill's input and dodges the
    # bad fusion. For the same reason the fills are NOT gated behind
    # lax.cond (conditionals showed the same corruption).
    out = skel
    for dd in FILL_DISTANCES:
        if dd >= out_len:
            continue
        m = -(-out_len // dd) * dd
        pad = m - out_len
        sk = jnp.pad(skel, ((0, 0), (0, pad))).reshape(N, m // dd, dd)
        im = jnp.pad(is_match, ((0, 0), (0, pad))).reshape(N, m // dd, dd)
        rows1 = jnp.arange(m // dd, dtype=I32)[None, :, None]
        key = jnp.where(~im, ((rows1 + 1) << 8) | sk.astype(I32), 0)
        key = jax.lax.optimization_barrier(key)   # load-bearing, see above
        filled = (jax.lax.cummax(key, axis=1) & 0xFF).astype(U8)
        cand = jnp.where(im, filled, sk).reshape(N, m)[:, :out_len]
        out = jnp.where((dist == dd)[:, None], cand, out)

    handled = ok & (
        (dist == 0) | jnp.isin(dist, jnp.asarray(FILL_DISTANCES, I32))
    )
    return out, handled


@partial(jax.jit, static_argnums=2)
def decode(slots: jax.Array, csizes: jax.Array, out_len: int):
    """Drop-in for codec.decode with the structured fast path.

    Rows the structured machine cannot handle decode through the generic
    loop; outputs merge with a select. Returns (out, produced, err) with
    the same semantics as codec.decode.
    """
    if out_len > MAX_OUT or out_len < 8:
        return codec.decode(slots, csizes, out_len)
    N = slots.shape[0]
    minw = codec._FASTLIT * 33 + 24          # the walk's window width
    if slots.shape[1] < minw:
        slots = jnp.pad(slots, ((0, 0), (0, minw - slots.shape[1])))
    maxrec = max_records(out_len)
    recs, dist, ok = grouped_walk(_walk_one, slots, csizes, out_len, maxrec)
    sk, handled = _place_and_fill(
        slots, csizes, recs, recs[..., 0] >= 0, dist, ok, out_len)
    # fallback rows (csize of handled rows masked to 0 => loop skips them)
    fb_cs = jnp.where(handled, 0, csizes)
    fb_out, fb_prod, fb_err = codec.decode(slots, fb_cs, out_len)
    out = jnp.where(handled[:, None], sk, fb_out)
    produced = jnp.where(handled, out_len, fb_prod)
    err = jnp.where(handled, False, fb_err)
    return out, produced, err
