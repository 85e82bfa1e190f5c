"""Structured device decoder: sort+scan placement instead of byte loops.

The generic decoder (codec._decode_one) moves every output byte through a
dynamic-offset window write, which costs ~14 ns/element on TPU — a hard
~0.07 GB/s ceiling. This module decodes the streams that dominate real
workloads (every stream our encoder emits, and any conforming blosclz
stream whose matches share one distance) with TPU-fast primitives only:

  1. WALK — a parse-only loop over the batch: each iteration reads one
     aligned window per row GATHER-FREE (masked full-array reductions —
     XLA's vmapped dynamic-slice costs ~1-2 us per row per call, the
     fused masked sums cost ~16-60 ns per row, see _select_rows) and
     parses up to _T tokens from it with VPU lane arithmetic, producing
     fixed-shape token records (kind, src, dst, len) plus per-row
     uniform-distance and ok flags;
  2. PLACE — one two-operand key sort per row over (residue(dst) << S |
     dst): literal bytes from the compressed stream and synthesized
     match-position entries land grouped by residue class mod the row's
     match distance d, ordered by position within each class;
  3. FILL — in residue-major order, out[x] = out[x-d] applied
     transitively is exactly "the latest literal above in x's residue
     column", which ONE keyed cummax resolves (the running maximum of
     (sorted_index << 8 | byte) over literal entries — sorted_index is
     globally monotone, and every column starts with a literal since a
     match at x implies d <= x); a final single-operand sort by dst
     restores output order.

Unlike the round-1 per-candidate-distance residue fills, this machine
handles ANY uniform distance < 8192 (not just the encoder's candidate
set) and outputs up to 256 KB per split (reference-geometry blocksize
table, blosc.c:996-1047), in O(sort) passes independent of the distance
count. Rows it cannot handle (mixed distances, d >= 8192, record
overflow, parse errors) fall back to the generic loop decoder; the two
batches merge with a select. Everything stays on device under one jit.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import codec

I32 = jnp.int32
U8 = jnp.uint8
BF16 = jnp.bfloat16

MAX_OUT = 1 << 18               # residue-sort key budget (see _place_keys)
MAX_DIST = 8192                 # residue bits in the sort key

_T = 8                          # tokens parsed per window read
_WINW = 512                     # window bytes (4 aligned 128-lane blocks)
_WB = _WINW // 128
_SUBW = 64                      # per-step parse subwindow (2 x 32 lanes)
_MARGIN = 50                    # stop parsing a window this close to its end
_KCH = 4                        # walk iterations per scan chunk

_BIGU = jnp.uint32(0xFFFFFFFF)
_BIGI = jnp.int32(0x7FFFFFFF)


def max_records(out_len: int) -> int:
    """Default walk budget in record SLOTS. A slot is consumed per parse
    STEP, valid record or not — stalled steps at window edges (up to
    _T-1 per 462-byte window advance) burn slots too — so the budget is
    one slot per 32-byte literal chunk plus the stall margin. Covers
    every stream our encoder emits (near-raw streams are stored raw by
    the csize/est-iters policies) and typical reference streams;
    token-dense foreign chunks overflow and the byte API retries once
    with high_records."""
    return out_len // 32 + out_len // 64 + 24


def high_records(out_len: int) -> int:
    """Escalated budget for token-dense streams. Worst conforming case:
    every parse step consumes >= 2 compressed bytes in all three
    grammars (blosclz literal chunk = ctrl + data, match token >= 2 B;
    LZ4 token and offset phases >= 2 B each; snappy tags >= 2 B) and a
    split's stream is < out_len (stored raw otherwise), so steps <=
    out_len/2 plus the window-stall margin (~out_len/66). Sufficient for
    ANY conforming stream — after this budget, err means corrupt or
    unplaceable, not under-budgeted."""
    return (out_len * 9) // 16 + 64


# ---------------------------------------------------------------------------
# WALK v2: batched multi-token parse with matmul window reads
# ---------------------------------------------------------------------------

def _select_rows(x3: jax.Array, idx: jax.Array, k: int) -> jax.Array:
    """Rows idx..idx+k-1 of x3 (R, B, L) int32, per-row dynamic idx,
    GATHER-FREE: one masked full-array reduction per selected row. XLA
    fuses the k reductions into streaming passes (~16-60 ns/row measured
    on v5e) — 20-50x cheaper than a vmapped dynamic_slice and ~15x
    cheaper than the same contraction phrased as a batched one-hot
    matmul, which XLA lowers to per-row kernels."""
    b = jnp.arange(x3.shape[1], dtype=I32)[None, :, None]
    i3 = idx[:, None, None]
    return jnp.concatenate(
        [jnp.sum(jnp.where(b == i3 + w, x3, 0), axis=1) for w in range(k)],
        axis=1)


def _walk_batch(slots: jax.Array, csizes: jax.Array, out_len: int,
                maxrec: int):
    """Parse a batch of blosclz streams into records.

    Tiered dispatch wrapper around _walk_impl: the walk's window fetch
    is a masked reduction over the row's 128-lane blocks, so its cost
    scales with the FULL row width — yet live rows on shuffled typed
    data carry tiny streams (bench workload: median csize 14 B at the
    2 KB clevel-1 geometry, ~520 B at the 128 KB clevel-5 geometry;
    raw rows are masked to csize 0 before this call). Rows arrive
    csize-sorted in bounded groups, so a group-level scalar lax.cond
    picks the narrowest static prefix of the row that covers the
    group's largest stream:

      tier 0  csize <= _WINW - _MARGIN: the first window IS the whole
              stream — no per-iteration window fetch at all
      tier 1  csize <= _TIER1 - _MARGIN: fetch windows from a _TIER1-
              byte static prefix (16 blocks, not W/128)
      tier 2  anything else: full-width fetch

    Outputs are bit-identical across tiers (the parse never reads past
    csize + _MARGIN, and slots are zero past csize)."""
    W = slots.shape[1]
    tiers = [t for t in (_WINW, _TIER1) if t < W]
    if not tiers:
        return _walk_impl(slots, csizes, out_len, maxrec)
    maxcs = jnp.max(csizes)

    def run(P):
        return lambda: _walk_impl(slots[:, :P] if P else slots,
                                  csizes, out_len, maxrec)

    branches = [run(t) for t in tiers] + [run(0)]
    sel = jnp.searchsorted(
        jnp.asarray([t - _MARGIN for t in tiers], I32), maxcs, side="left",
        method="compare_all")
    return jax.lax.switch(sel, branches)


_TIER1 = 2048       # tier-1 walk prefix bytes (see _walk_batch)


def _walk_impl(slots: jax.Array, csizes: jax.Array, out_len: int,
               maxrec: int):
    """Parse a batch of blosclz streams into records.

    slots: uint8 (R, W) with W % 128 == 0 and W >= csize + _MARGIN,
    rows zero past csize. Returns (rf, dist, uni, ok) where rf is the
    FIELD-TUPLE record form: four i32 (R, slots) arrays (kind, arg,
    dst_off, len) with kind == -1 marking empty slots. Record kinds:
    0 = literal chunk (arg = src_off), 1 = match (arg = distance).
    Fields travel as separate 2D arrays because any materialized
    (R, slots, 4) array is lane-padded 4->128 by the TPU HBM layout —
    a 32x traffic blowup the round-3 profiling measured as ~100 ms per
    64 MB on the whole-batch placement path (and the walk's own
    while-loop carry).

    Each iteration reads ONE aligned 512-byte window per row via masked
    reductions over the row's 128-lane blocks (gather-free; skipped
    entirely when the row IS one window) and parses
    up to _T tokens from it; per-token byte extraction runs on a 64-lane
    subwindow selected the same way. Wire grammar per
    blosc/blosclz.c:679-789: first token is a literal copy; literal
    token t < 32 copies t+1 bytes; match token encodes (len, dist) with
    255-extension bytes and a far-distance escape.
    """
    R, W = slots.shape
    B = W // 128
    src3 = slots.reshape(R, B, 128).astype(I32)
    srci = slots.astype(I32)
    nchunks = -(-maxrec // (_T * _KCH))
    E = nchunks * _T * _KCH
    rk0 = jnp.full((R, E), -1, I32)
    ra0 = jnp.zeros((R, E), I32)
    rd0 = jnp.zeros((R, E), I32)
    rl0 = jnp.zeros((R, E), I32)

    wwi = jnp.arange(_WINW, dtype=I32)[None, :]
    swi = jnp.arange(_SUBW, dtype=I32)[None, :]

    def inner(carry, _):
        ip, op, token, extacc, dist, uni, err, fin = carry

        # one aligned window per row, via masked full-array reductions
        ipblk = jnp.clip(ip // 128, 0, B - _WB)
        winc = ipblk * 128
        win = _select_rows(src3, ipblk, _WB)
        win = jnp.where(winc[:, None] + wwi < csizes[:, None], win, 0)
        win16 = win.reshape(R, _WINW // 32, 32)

        sk_l, sa_l, sd_l, sl_l = [], [], [], []
        for _t in range(_T):
            q = ip - winc
            act = ~(err | fin) & (q <= _WINW - _MARGIN)

            # 64-byte subwindow holding everything one token can touch
            qrow = q >> 5
            sub = _select_rows(win16, qrow, 2)
            sq = q - (qrow << 5)

            def sel(off):
                """sub[row, off[row]] via masked sum — no gather op."""
                return jnp.sum(jnp.where(swi == off[:, None], sub, 0),
                               axis=1)

            # ---- literal branch: token < 32 copies token+1 bytes ------
            is_lit = token < 32
            llen = token + 1
            ip2 = ip + llen
            op2 = op + llen
            lit_err = (op2 > out_len) | (ip2 > csizes)
            lit_fin = (ip2 >= csizes) & ~lit_err
            tok_lit = sel(sq + llen)           # token after the literals

            # ---- match branch: token >= 32 --------------------------------
            mbase = (token >> 5) - 1
            has_ext = (token >> 5) == 7
            inm = (swi >= sq[:, None]) & (swi < sq[:, None] + 8)
            lead = jnp.cumprod(
                jnp.where(swi < sq[:, None], 1,
                          (jnp.where(inm, sub, -1) == 255).astype(I32)),
                axis=1)
            kk = jnp.sum(jnp.where(swi >= sq[:, None], lead, 0), axis=1)
            ext_more = has_ext & (kk >= 8)
            lastb = sel(sq + jnp.minimum(kk, 7))
            mlen = jnp.where(has_ext, 6 + extacc + 255 * kk + lastb,
                             mbase) + 3
            eoff = jnp.where(has_ext, kk + 1, 0)
            dhi = token & 31
            dlo = sel(sq + eoff)
            far = (dlo == 255) & (dhi == 31)
            b1 = sel(sq + eoff + 1)
            b2 = sel(sq + eoff + 2)
            bk = jnp.where(far, (b1 << 8) + b2 + 8192, (dhi << 8) + dlo + 1)
            ip4 = ip + eoff + 1 + jnp.where(far, 2, 0)  # next-token pos
            d2 = jnp.where(dist == 0, bk, dist)
            m_ok = ~is_lit & ~ext_more
            m_err = m_ok & (
                (bk > op) | (op + mlen > out_len) | (ip4 >= csizes)
            )
            ext_err = ext_more & (ip + 8 >= csizes)
            tok_m = sel(sq + eoff + 1 + jnp.where(far, 2, 0))

            # ---- merge + state advance ------------------------------------
            err_t = jnp.where(is_lit, lit_err, m_err | ext_err)
            good = act & ~err_t
            valid = good & (is_lit | m_ok)
            # invalid slots carry zeros (not stale garbage): grouped and
            # whole-batch walks then agree bit-for-bit even though groups
            # stop at their own chunk counts (test_grouped_walk_matches_
            # plain_vmap) and downstream masks never see nondeterminism
            sk_l.append(jnp.where(valid, jnp.where(is_lit, 0, 1), -1))
            sa_l.append(jnp.where(valid, jnp.where(is_lit, ip, bk), 0))
            sd_l.append(jnp.where(valid, op, 0))
            sl_l.append(jnp.where(valid, jnp.where(is_lit, llen, mlen), 0))

            ip_n = jnp.where(
                is_lit,
                jnp.where(lit_fin, ip2, ip2 + 1),
                jnp.where(ext_more, ip + 8, ip4 + 1))
            op_n = jnp.where(is_lit, op2, jnp.where(m_ok, op + mlen, op))
            tok_n = jnp.where(is_lit, tok_lit,
                              jnp.where(ext_more, token, tok_m))
            ext_n = jnp.where(
                is_lit, extacc,
                jnp.where(ext_more, extacc + 8 * 255, 0))
            dist_n = jnp.where(m_ok & ~err_t, d2, dist)
            uni_n = uni & ~(m_ok & ~err_t & (bk != d2))
            fin_t = is_lit & lit_fin

            upd = (ip_n, op_n, tok_n, ext_n, dist_n, uni_n)
            old = (ip, op, token, extacc, dist, uni)
            ip, op, token, extacc, dist, uni = (
                jnp.where(good, n, o) for n, o in zip(upd, old))
            err = err | (act & err_t)
            fin = fin | (good & fin_t)

        rows = tuple(jnp.stack(ls, axis=1)       # 4 x (R, _T)
                     for ls in (sk_l, sa_l, sd_l, sl_l))
        return (ip, op, token, extacc, dist, uni, err, fin), rows

    def cond(st):
        kslot, carry = st[4], st[5:]
        return jnp.any(~(carry[6] | carry[7])) & (kslot < nchunks)

    def body(st):
        rf, kslot = st[:4], st[4]
        carry, rows = jax.lax.scan(inner, st[5:], None, length=_KCH)
        rf = tuple(
            jax.lax.dynamic_update_slice(
                f, jnp.moveaxis(r, 0, 1).reshape(R, _KCH * _T),
                (0, kslot * _KCH * _T))
            for f, r in zip(rf, rows))
        return rf + (kslot + 1,) + carry

    zero = jnp.zeros((R,), I32)
    st = jax.lax.while_loop(
        cond, body,
        (rk0, ra0, rd0, rl0, jnp.int32(0),
         zero + 1, zero, srci[:, 0] & 31, zero, zero, zero == 0,
         csizes <= 0, csizes <= 1),
    )
    rf = st[:4]
    ip, op, token, extacc, dist, uni, err, fin = st[5:]
    err = err | ~(err | fin)            # ran out of chunks: unhandled
    ok = ~err & (op == out_len)
    return rf, dist, uni, ok


# ---------------------------------------------------------------------------
# PLACE + FILL v2: residue-keyed sorts
# ---------------------------------------------------------------------------

def _segment_fill(n_cols: int, starts, keys, N: int):
    """Sparse scatter of `keys` at `starts` (both (N, R), invalid entries
    must carry start == n_cols) into (N, n_cols), then a cummax forward
    fill. Keys must embed the position in their high bits so cummax
    holds the latest marker. Colliding starts resolve to the LARGER key
    (scatter-max): a segment's end marker may land on the next segment's
    start when segments are contiguous (tape-sourced zlib records), and
    start keys are constructed >= end markers at the same position."""
    base = (jnp.arange(N, dtype=I32) * n_cols)[:, None]
    gi = jnp.where(starts < n_cols, base + starts, N * n_cols).reshape(-1)
    flat = jnp.zeros((N * n_cols,), jnp.uint32).at[gi].max(
        keys.reshape(-1).astype(jnp.uint32), mode="drop")
    return jax.lax.cummax(flat.reshape(N, n_cols), axis=1)


def _lit_geometry(slots, csizes, rf, valid, out_len: int):
    """Per compressed position p: (in_lit, dst_p) — is p a literal byte,
    and which output position does it land at. One or two segment fills
    depending on the position/delta bit budget."""
    N, Wc = slots.shape
    kind, srco, dsto, ln = rf
    lit = valid & (kind == 0)
    rdelta = (dsto - srco + out_len).astype(jnp.uint32)  # in [1, 2*out_len)
    u_src = srco.astype(jnp.uint32)
    u_end = (srco + ln).astype(jnp.uint32)
    starts = jnp.concatenate(
        [jnp.where(lit, srco, Wc), jnp.where(lit, srco + ln, Wc)], axis=1)
    p = jnp.arange(Wc, dtype=I32)[None, :]
    if out_len <= 16384 and Wc < (1 << 15):
        # one fill: pos(15) << 17 | lit(1) << 16 | delta(16)
        k_start = (u_src << 17) | jnp.uint32(1 << 16) | rdelta
        k_end = u_end << 17                              # gap marker
        keys = jnp.concatenate([jnp.where(lit, k_start, 0),
                                jnp.where(lit, k_end, 0)], axis=1)
        cfill = _segment_fill(Wc, starts, keys, N)
        in_lit = ((cfill >> 16) & 1) == 1
        delta = (cfill & 0xFFFF).astype(I32)
    else:
        # two fills: A = pos(19) << 13 | delta_lo(13);
        #            B = pos(19) << 13 | delta_hi(6) << 1 | lit(1)
        # (every caller's slot width stays < 2^19 for out_len <= 2^18)
        ka = (u_src << 13) | (rdelta & 0x1FFF)
        kb = (u_src << 13) | (((rdelta >> 13) & 0x3F) << 1) | jnp.uint32(1)
        keys_a = jnp.concatenate([jnp.where(lit, ka, 0),
                                  jnp.where(lit, u_end << 13, 0)], axis=1)
        keys_b = jnp.concatenate([jnp.where(lit, kb, 0),
                                  jnp.where(lit, u_end << 13, 0)], axis=1)
        fa = _segment_fill(Wc, starts, keys_a, N)
        fb = _segment_fill(Wc, starts, keys_b, N)
        in_lit = (fb & 1) == 1
        delta = ((fa & 0x1FFF) | (((fb >> 1) & 0x3F) << 13)).astype(I32)
    dst_p = p + delta - out_len
    return in_lit, dst_p


def _place_and_fill(slots, csizes, rf, rec_valid, dist, uni, ok,
                    out_len: int):
    """Batched skeleton construction + residue-column forward fill.
    rec_valid: (N, R) bool mask of live record slots. Requires one
    uniform distance per row (`uni`). Returns (out, handled)."""
    N, Wc = slots.shape
    valid = rec_valid & ok[:, None]
    kind, _, dsto, _ = rf

    in_lit, dst_p = _lit_geometry(slots, csizes, rf, valid, out_len)

    # --- output-space fill: match mask ------------------------------------
    mstarts = jnp.where(valid, dsto, out_len)
    mkeys = jnp.where(valid, (dsto << 1) | (kind == 1), 0)
    ofill = _segment_fill(out_len, mstarts, mkeys, N)
    is_match = (ofill & 1) == 1

    # --- residue-keyed sort ------------------------------------------------
    # key = residue(dst) << S | dst with S = ceil(log2(out_len)); residue
    # < min(d, MAX_DIST) and dst < out_len <= 2^18 keep it inside int32.
    S = max((out_len - 1).bit_length(), 1)
    d = jnp.maximum(dist, 1)[:, None]
    e1_dst = dst_p
    e1_ok = in_lit & (jnp.arange(Wc, dtype=I32)[None, :] < csizes[:, None])
    x = jnp.arange(out_len, dtype=I32)[None, :]
    if 2 * S + 9 <= 31:
        # narrow splits: lit flag + byte ride inside ONE sort operand
        # (res << S+9 | dst << 9 | lit << 8 | byte)
        e1_key = jnp.where(
            e1_ok,
            ((e1_dst % d) << (S + 9)) | (e1_dst << 9) | 256
            | slots.astype(I32), _BIGI)
        e2_key = jnp.where(is_match, ((x % d) << (S + 9)) | (x << 9), _BIGI)
        skeys = jax.lax.sort(jnp.concatenate([e1_key, e2_key], axis=1),
                             dimension=1)[:, :out_len]
        svals = skeys & 0x1FF
        skeys = (skeys >> 9) & ((1 << S) - 1)
    else:
        e1_key = jnp.where(e1_ok, ((e1_dst % d) << S) | e1_dst, _BIGI)
        e1_val = jnp.where(e1_ok, 256 | slots.astype(I32), 0)
        e2_key = jnp.where(is_match, ((x % d) << S) | x, _BIGI)
        e2_val = jnp.zeros_like(e2_key)
        keys = jnp.concatenate([e1_key, e2_key], axis=1)
        vals = jnp.concatenate([e1_val, e2_val], axis=1)
        skeys, svals = jax.lax.sort((keys, vals), dimension=1, num_keys=1)
        skeys = skeys[:, :out_len] & ((1 << S) - 1)
        svals = svals[:, :out_len]

    # --- fill: latest-literal-above within the residue column -------------
    # sorted index is globally monotone, so the running max of
    # (idx << 8 | byte) over literal entries is always this column's
    # nearest literal (every column leads with one: a match at x needs
    # d <= x, so x == residue is never a match position).
    sidx = jnp.arange(skeys.shape[1], dtype=I32)[None, :]
    is_lit_s = (svals & 256) != 0
    f = jax.lax.cummax(jnp.where(is_lit_s, (sidx << 8) | (svals & 0xFF), 0),
                       axis=1)
    byte_s = jnp.where(is_lit_s, svals & 0xFF, f & 0xFF)

    # --- restore output order: one single-operand sort --------------------
    okey = (skeys << 8) | byte_s
    out = (jax.lax.sort(okey, dimension=1) & 0xFF).astype(U8)

    handled = ok & uni & (dist < MAX_DIST)
    return out, handled


# ---------------------------------------------------------------------------
# Splat fast path: closed-form construction for distance<=1 rows
# ---------------------------------------------------------------------------

_PREFIX = 1024      # splat rows carry their whole stream in this prefix
                    # (a pure d=1 row at the 128 KB clevel>=5 neblock
                    # emits ~780 B: 255-extension bytes alone are n/255)


def _splat_place(slots, csizes, rf, rec_valid, handled, out_len: int):
    """Closed-form output for rows whose stream fits in _PREFIX bytes and
    whose matches are all distance 1 (or absent): out[x] = the latest
    literal byte at or above x, i.e. one sparse scatter of the <= 64
    literal bytes keyed (dst << 8 | byte) plus one cummax — no sorts.
    This is the dominant shape for shuffled typed data (constant and
    low-entropy byte planes collapse to one literal + one d=1 run)."""
    N = slots.shape[0]
    prefix = min(_PREFIX, slots.shape[1])    # qualifying csizes <= prefix
    pre = slots[:, :prefix]
    # a row with csize <= prefix consumes <= prefix//2 record slots:
    # every parse step eats >= 2 compressed bytes, and window-edge
    # stalls (which would shift slots past the record count) require a
    # single >= 335-byte step — impossible together with max token
    # density. The +32 is belt-and-braces for the boundary case
    # (test_splat_slot_margin_max_density pins a 510-record stream).
    nslot = min(prefix // 2 + 32, rf[0].shape[1])
    r4 = tuple(f[:, :nslot] for f in rf)
    rv = rec_valid[:, :nslot] & handled[:, None]
    in_lit, dst_p = _lit_geometry(pre, csizes, r4, rv, out_len)
    p = jnp.arange(prefix, dtype=I32)[None, :]
    live = in_lit & (p < csizes[:, None])
    key = jnp.where(live, (dst_p << 8) | pre.astype(I32), 0)
    base = (jnp.arange(N, dtype=I32) * out_len)[:, None]
    gi = jnp.where(live, base + dst_p, N * out_len).reshape(-1)
    flat = jnp.zeros((N * out_len,), I32).at[gi].set(
        key.reshape(-1), mode="drop")
    f = jax.lax.cummax(flat.reshape(N, out_len), axis=1)
    return (f & 0xFF).astype(U8), handled


# ---------------------------------------------------------------------------
# Pure-tile fast path: periodic rows at any power-of-two distance <= 256
# ---------------------------------------------------------------------------

_PUREW = 384    # stream-prefix window holding a <=256-byte literal prefix
                # plus its control bytes and the match token
_TILE_K = 8     # record slots the tile geometry scans (see
                # pure_tile_eligible's `lead` condition)


def pure_tile_eligible(rf, valid, dist, uni, ok, csizes, out_len: int):
    """Rows of the shape [literal prefix of d bytes][ONE match at
    distance d covering [d, out_len-1)][1-byte literal tail] with d a
    power of two <= 256: then out[x] = prefix[x mod d] for x < out_len-1
    — a broadcast tile, no per-row dynamic ops. This is the dominant
    shape for shuffled typed data (every byte-plane of a typed ramp or
    counter collapses to it; our encoder's PURE class emits exactly
    this, and host/reference encoders emit the same shape for periodic
    planes). d=1 covers the constant planes the splat path served."""
    if out_len < 256 or out_len % 256:
        return jnp.zeros(valid.shape[:1], bool)
    kind, srco, dsto, ln = rf
    d = dist[:, None]
    m = valid & (kind == 1)
    lit = valid & (kind == 0)
    lit_pre = lit & (dsto < d)
    lit_tail = lit & (dsto == out_len - 1)
    nmatch = jnp.sum(m.astype(I32), axis=1)
    mlen = jnp.sum(jnp.where(m, ln, 0), axis=1)
    mdst_ok = jnp.all(~m | (dsto == d), axis=1)
    mdist_ok = jnp.all(~m | (srco == d), axis=1)
    cover = jnp.sum(jnp.where(lit_pre, ln, 0), axis=1) == dist
    inb = jnp.all(~lit_pre | (dsto + ln <= d), axis=1)
    tail1 = jnp.sum(jnp.where(lit_tail, ln, 0), axis=1) == 1
    no_other = jnp.all(~lit | lit_pre | lit_tail, axis=1)
    pow2 = (dist & (dist - 1)) == 0
    # prefix literals must sit in the first _TILE_K record slots so the
    # placement can compute their geometry with K direct compares
    # instead of the scatter-based segment fill (TPU scatters measured
    # 98.8 ms per 64 MB batch vs ~1 ms for the compares; records are in
    # output order, so prefix literals lead — K=8 covers every stream
    # our encoders or the reference emit for a <=256 B prefix)
    slot = jnp.arange(kind.shape[1], dtype=I32)[None, :]
    lead = jnp.all(~lit_pre | (slot < _TILE_K), axis=1)
    return (ok & uni & (dist >= 1) & (dist <= 256) & pow2
            & (nmatch == 1) & (mlen == out_len - 1 - dist)
            & mdst_ok & mdist_ok & cover & inb & tail1 & no_other & lead)


def _pure_tile_place(slots, csizes, rf, rec_valid, dist, elig,
                     out_len: int):
    """Closed-form output for pure_tile_eligible rows.

    Builds the d-byte pattern with ONE tiny sort over a _PUREW-lane
    stream prefix (keys (dst << 8 | byte) put prefix literals in output
    order), expands it to 256 lanes with 8 static bit-clearing passes
    (pat[j] := pat[j & ~w] wherever d <= w — j mod d for pow2 d without
    any gather), broadcast-tiles to out_len, and patches the tail byte.
    ~0.3 ns/B with no per-row dynamic-shape ops — replaces the expand
    kernel's per-record walks (~500 ns per record) on the rows that
    dominate shuffled workloads."""
    N = slots.shape[0]
    Pw = min(_PUREW, slots.shape[1])
    pre = slots[:, :Pw]
    kind, srco_f, dsto, ln_f = rf
    d = jnp.maximum(dist, 1)[:, None]
    lit_pre = rec_valid & elig[:, None] & (kind == 0) & (dsto < d)
    # prefix-literal geometry by direct compare over the first _TILE_K
    # record slots (eligibility guarantees they hold every prefix
    # literal) — replaces the scatter-based _lit_geometry, whose
    # segment-fill scatter measured 98.8 ms per 64 MB whole-batch call
    p = jnp.arange(Pw, dtype=I32)[None, :]
    in_lit = jnp.zeros((N, Pw), bool)
    dst_p = jnp.full((N, Pw), -1, I32)
    for r in range(min(_TILE_K, kind.shape[1])):
        s = srco_f[:, r:r + 1]
        e = s + ln_f[:, r:r + 1]
        off = dsto[:, r:r + 1] - s
        m = lit_pre[:, r:r + 1] & (s <= p) & (p < e)
        in_lit |= m
        dst_p = jnp.where(m, p + off, dst_p)
    live = in_lit & (p < csizes[:, None]) & (dst_p >= 0) & (dst_p < d)
    key = jnp.where(live, (dst_p << 8) | pre.astype(I32), _BIGI)
    pat = jax.lax.sort(key, dimension=1)[:, :256] & 0xFF
    # tail byte: the single literal with dst == out_len-1 (its source is
    # the stream byte at that record's src offset)
    lit_tail = (rec_valid & (kind == 0)
                & (dsto == out_len - 1))
    tsrc = jnp.max(jnp.where(lit_tail, srco_f, -1), axis=1)
    tbyte = jnp.take_along_axis(
        slots, jnp.clip(tsrc, 0, slots.shape[1] - 1)[:, None], axis=1)[:, 0]
    return _tile_from_pattern(pat, dist, tbyte, out_len), elig


def _tile_from_pattern(pat: jax.Array, dist: jax.Array, tbyte: jax.Array,
                       out_len: int) -> jax.Array:
    """Tile per-row patterns to out_len and patch the tail byte.

    pat: (N, 256) integer pattern prefix, any int dtype (garbage past
    the row's distance is fine — the doubling passes overwrite lanes
    >= d); dist: (N,) i32
    power-of-two distances <= 256; tbyte: (N,) i32 final output byte.
    The doubling expands a d-periodic prefix to all 256 lanes with 8
    static bit-clearing passes (pat[j] := pat[j & ~w] wherever d <= w —
    j mod d for pow2 d without any gather), then ONE byte-wide
    broadcast materializes the output. ~0.3 ns/B with no per-row
    dynamic-shape ops (an int32 broadcast + scatter measured 2x slower
    than the whole expand-kernel path this replaces)."""
    N = pat.shape[0]
    # byte-wide doubling: the passes only move bytes, so running them in
    # u8 quarters the HBM traffic vs i32 (8 passes over (N, 256) are
    # ~40% of the whole template decode at 64 MB groups)
    pat = pat.astype(U8)
    d = jnp.maximum(dist, 1)[:, None]
    col = jnp.arange(256, dtype=I32)[None, :]
    for k in range(8):
        w = 1 << k
        shifted = pat[:, (np.arange(256) & ~w)]
        pat = jnp.where((d <= w) & ((col & w) != 0), shifted, pat)
    pat8 = pat
    tiles = out_len // 256
    out = jnp.broadcast_to(pat8[:, None, :], (N, tiles, 256))
    tile_i = jnp.arange(tiles, dtype=I32)[None, :, None]
    is_tail = (tile_i == tiles - 1) & (col[:, None, :] == 255)
    out = jnp.where(is_tail, tbyte.astype(U8)[:, None, None], out)
    return out.reshape(N, out_len)


# ---------------------------------------------------------------------------
# Template fast path: closed-form parse of our encoder's PURE streams
# ---------------------------------------------------------------------------

_TEMPLATE_DS = (1, 2, 4, 8, 16, 32, 64, 128, 256)


@lru_cache(maxsize=None)
def _template_table(out_len: int):
    """Static stream templates for codec._emit_pure emissions.

    A PURE stream's layout is a closed-form function of (d, out_len)
    (codec.py:_emit_pure): literal chunks with a control byte every 33
    emitted bytes, ONE match token at E1 = d + ceil(d/32) whose length
    field and 255-extension bytes are pinned by vp = out_len - 4 - d,
    the low distance byte, a zero control byte at E2 and the 1-byte
    literal tail. Every control/token byte therefore sits at a STATIC
    position with a STATIC value — so recognizing a PURE stream needs
    only elementwise compares, no parse loop. Validation is exact:
    a stream satisfying a template's constraints (plus csize equality)
    parses to exactly the pure form under the wire grammar
    (blosc/blosclz.c:679-789) — byte 0 pins the first literal length,
    each control position pins the next, the pinned non-255 final
    extension byte stops length parsing, and d <= 256 can never hit the
    far-distance escape.

    Returns [(d, csize, positions, values)] for pow2 d <= 256."""
    tmpl = []
    for d in _TEMPLATE_DS:
        if out_len - 1 - d < 3:
            continue
        nc1 = -(-d // 32)
        E1 = d + nc1
        vp = out_len - 4 - d
        kp = (vp - 6) // 255 + 1 if vp >= 6 else 0
        E2 = E1 + 2 + kp
        csize = E2 + 2
        pos, val = [], []
        for k in range(nc1):
            v = min(32, d - 32 * k) - 1
            if k == 0:
                v |= 32                      # format marker bit
            pos.append(33 * k)
            val.append(v)
        dm1 = d - 1
        tok0 = (((vp + 1) << 5) if vp < 6 else (7 << 5)) | (dm1 >> 8)
        pos.append(E1)
        val.append(tok0)
        for q in range(1, kp + 1):
            pos.append(E1 + q)
            val.append(max(0, min(vp - 6 - 255 * (q - 1), 255)))
        pos.append(E1 + kp + 1)
        val.append(dm1 & 255)
        pos.append(E2)
        val.append(0)
        tmpl.append((d, csize, np.asarray(pos, np.int64),
                     np.asarray(val, np.int32)))
    return tmpl


def _template_match(slots: jax.Array, csizes: jax.Array, out_len: int):
    """Recognize PURE-template rows with elementwise ops only.

    Returns (match (N,) bool, d (N,) i32, pat (N, 256) u8 pattern
    prefix, tail (N,) i32 last output byte), or None when no template
    applies at this geometry. At most one template validates any
    conforming stream (csize pins kp and the structural compares pin
    the rest); a row matching NO template simply takes the walk path."""
    import os

    if out_len < 256 or out_len % 256:
        return None
    if os.environ.get("CBLOSC_TPU_TEMPLATE") == "0":   # A/B knob
        return None
    tmpl = _template_table(out_len)
    if not tmpl:
        return None
    N, W = slots.shape
    PT = max(264, max(cs for _, cs, _, _ in tmpl))
    PT = -(-PT // 128) * 128
    pre = (slots[:, :PT] if W >= PT
           else jnp.pad(slots, ((0, 0), (0, PT - W))))
    # ONE static-index gather pulls every position any template pins
    # (~130 columns) plus each template's tail column; the per-template
    # checks then compare ~14 u8 columns instead of a masked full-width
    # i32 compare (9 x (N, 384) i32 reads measured as the dominant cost
    # of the whole template decode at 64 MB groups)
    allpos = np.concatenate(
        [np.concatenate([pos, [csz - 1]]) for _, csz, pos, _ in tmpl])
    sel = pre[:, allpos].astype(I32)
    match = jnp.zeros((N,), bool)
    dsel = jnp.zeros((N,), I32)
    tail = jnp.zeros((N,), I32)
    off = 0
    for d, csz, pos, val in tmpl:
        k = len(pos)
        okr = (csizes == csz) & jnp.all(
            sel[:, off:off + k] == jnp.asarray(val)[None, :], axis=1)
        new = okr & ~match
        dsel = jnp.where(new, d, dsel)
        tail = jnp.where(new, sel[:, off + k], tail)
        match = match | okr
        off += k + 1
    # pattern byte j sits at stream position j + 1 + j//32 (one control
    # byte per 33 emitted bytes) — a STATIC index map, so extraction is
    # one constant-index reshuffle, not a gather
    jmap = np.minimum(np.arange(256) + 1 + np.arange(256) // 32, PT - 1)
    pat = pre[:, jmap]
    return match, dsel, pat, tail


# ---------------------------------------------------------------------------
# Grouped driver
# ---------------------------------------------------------------------------

_GROUP_BYTES = 24 << 20     # sort workspace budget per row group


_MERGE_TARGET = 32768   # virtual-row size the merge aims for


def merge_factor(R: int, out_len: int) -> int:
    """How many small rows to fuse into one expand-kernel program.

    The kernel pays per-program and per-record costs; at small out_len
    (the clevel<=4 split geometry) per-program overhead dominates, so m
    rows are fused into one virtual row of m*out_len bytes: record dst
    offsets shift by k*out_len, literal src offsets by k*W — all static
    arithmetic, no data movement. CBLOSC_TPU_MERGE=0 disables; =N caps."""
    import os

    v = os.environ.get("CBLOSC_TPU_MERGE")
    cap = 1 << 30
    if v is not None:
        try:
            cap = int(v)
        except ValueError:
            cap = 1 << 30
        if cap <= 1:
            return 1
    m = 1
    while (m * 2 * out_len <= _MERGE_TARGET and m * 2 <= R
           and R % (m * 2) == 0 and m * 2 <= cap):
        m *= 2
    return m


def stack_records(rf) -> jax.Array:
    """(kind, arg, dst, len) field tuple -> (N, R, 4) array. Test/debug
    helper ONLY: the stacked form lane-pads 4->128 in TPU HBM layouts."""
    return jnp.stack(tuple(rf), axis=-1)


def merge_rows(sl: jax.Array, rf, ok: jax.Array, out_len: int, m: int):
    """Fuse m consecutive rows into one virtual row for the expand
    kernel. Records of not-ok rows are invalidated (their subranges
    hold garbage; the caller's handled mask falls those rows back)."""
    if not isinstance(rf, (tuple, list)):
        rf = tuple(rf[..., i] for i in range(4))
    R, Wp = sl.shape
    E = rf[0].shape[1]
    k = jnp.arange(R, dtype=I32) % m
    kind = jnp.where(ok[:, None], rf[0], -1)
    src = rf[1] + jnp.where(kind == 0, (k * Wp)[:, None], 0)
    dst = rf[2] + (k * out_len)[:, None]
    rfm = tuple(a.reshape(R // m, m * E) for a in (kind, src, dst, rf[3]))
    return sl.reshape(R // m, m * Wp), rfm


def kernel_place_rows(sl: jax.Array, rf, ok: jax.Array,
                      out_len: int, W: int):
    """Shared expand-kernel placement: merge small rows, expand, split."""
    from . import expand as expand_mod

    interp = jax.default_backend() == "cpu"
    R = sl.shape[0]
    m = merge_factor(R, out_len)
    if m <= 1:
        return expand_mod.expand(
            sl[:, :W], expand_mod.compact_records(rf), out_len,
            interpret=interp)
    slm, rfm = merge_rows(sl, rf, ok, out_len, m)
    out = expand_mod.expand(slm, expand_mod.compact_records(rfm),
                            m * out_len, interpret=interp)
    return out.reshape(R, out_len)


def decode_cap() -> int:
    """Largest out_len the structured device decode handles. The XLA
    sort/splat machines cap at MAX_OUT (2^18, key packing); the Pallas
    expand kernel extends to expand.MAX_OUT (2^19, VMEM-probed), so
    dont_split reference geometries with 512 KB splits stay on device
    instead of falling to the generic loop decoder."""
    from . import expand as expand_mod

    return expand_mod.MAX_OUT if use_expand_kernel() else MAX_OUT


def use_expand_kernel() -> bool:
    """Whether placement runs the Pallas expand kernel (TPU default) or
    the XLA sort machine (CPU test legs; CBLOSC_TPU_PLACE overrides)."""
    import os

    v = os.environ.get("CBLOSC_TPU_PLACE")
    if v == "pallas":
        return True
    if v == "xla":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def _group_rows(out_len: int, maxrec: int = 0) -> int:
    # per-row workspace: sort/fill operands (~9 B/output byte) plus the
    # record array and its compaction copy (16 B per record each).
    # The cap bounds SEQUENTIAL lax.map depth: at the clevel-1 bench
    # geometry (2 KB rows) a 1024 cap means 32 sequential groups per
    # 64 MB — the measured decode bottleneck. CBLOSC_TPU_GROUP_CAP
    # overrides for kernel-placement paths whose workspace is tiny.
    import os

    v = os.environ.get("CBLOSC_TPU_GROUP_CAP")
    if v:
        try:
            return max(8, min(int(v), 1 << 20))
        except ValueError:
            pass
    g = max(_GROUP_BYTES // (out_len * 9 + maxrec * 32), 8)
    g = 1 << (g.bit_length() - 1)       # floor to a power of two
    return max(8, min(g, 1024))


def grouped_walk(walk, slots, csizes, out_len: int, maxrec: int,
                 group: int = 1024):
    """vmap a per-row `walk` over rows SORTED BY CSIZE in lax.map groups.

    (Used by the LZ4 walk; the blosclz walk is natively batched.) Sorting
    rows by csize clusters similar rows so each group's loop exits at its
    own pace; stored-raw rows (csize 0) cost nothing.
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


def _decode_core_kernel(walk, slots_w, csizes, out_len: int, maxrec: int,
                        W: int, group: int):
    """Kernel-leg decode: grouped walk, then WHOLE-BATCH placement.

    Round-3 on-chip profiling: per-group placement dominated decode
    (expand kernel 0.625 ms per 1024x2048 group = 20 of 32 ms at the
    clevel-1 bench geometry), while one batched doubling-tile pass over
    the full 64 MB measured 0.93 ms (72 GB/s, scratch/r3_gather_probe).
    So placement is hoisted out of the group loop: tile-eligible rows
    (literal prefix + uniform pow2-distance fills — the dominant shape
    for shuffled typed data) take one vectorized tile pass; the rest
    take ONE whole-batch expand-kernel call (merged virtual rows), with
    tile rows' records invalidated so their programs stop immediately.

    Everything runs in CSIZE-SORTED row order; only the final bytes and
    the handled mask are un-sorted. Un-sorting the walk's record arrays
    instead measured 100+ ms — axis-0 gathers of 384-byte rows are
    pathologically slow on v5e, while the 2 KB-row output gather is not.
    """
    import os

    N = slots_w.shape[0]
    no_tile = (os.environ.get("CBLOSC_TPU_PURETILE") == "0"
               or out_len < 256 or out_len % 256)

    def place_all(sl, cs, rf, dist, uni, okf):
        valid = rf[0] >= 0
        live = okf & (cs > 0)
        if no_tile:
            return kernel_place_rows(sl, rf, okf, out_len, W), live
        elig = pure_tile_eligible(rf, valid, dist, uni, okf, cs,
                                  out_len) & live
        krf = (jnp.where(elig[:, None], -1, rf[0]),) + tuple(rf[1:])

        def kern(_):
            return kernel_place_rows(sl, krf, okf & ~elig, out_len, W)

        # when every live row tiles (typed-ramp workloads), skip the
        # kernel dispatch — even stopped programs pay scratch init + DMA
        kern_out = jax.lax.cond(
            jnp.all(elig | ~live),
            lambda _: jnp.zeros((sl.shape[0], out_len), U8), kern, None)
        tile, _ = _pure_tile_place(sl, cs, rf, valid, dist, elig,
                                   out_len)
        return jnp.where(elig[:, None], tile, kern_out), live

    if N <= group:
        rf, dist, uni, okf = walk(slots_w, csizes, out_len, maxrec)
        return place_all(slots_w, csizes, rf, dist, uni, okf)

    order = jnp.argsort(csizes)
    inv = jnp.argsort(order)
    sl = jnp.take(slots_w, order, axis=0)
    cs = jnp.take(csizes, order)
    pad = (-N) % group
    if pad:
        sl = jnp.pad(sl, ((0, pad), (0, 0)))
        cs = jnp.pad(cs, (0, pad))
    g = sl.shape[0] // group
    rf, dist, uni, okf = jax.lax.map(
        lambda t: walk(t[0], t[1], out_len, maxrec),
        (sl.reshape(g, group, sl.shape[1]), cs.reshape(g, group)),
    )
    rf = tuple(f.reshape(g * group, -1) for f in rf)
    out, live = place_all(
        sl, cs, rf, dist.reshape(-1), uni.reshape(-1), okf.reshape(-1))
    return (jnp.take(out[:N], inv, axis=0),
            jnp.take(live[:N], inv))


def decode_core(walk, slots: jax.Array, csizes: jax.Array, out_len: int,
                maxrec: int):
    """Shared decode driver for all three walk grammars (blosclz/LZ4/
    snappy): pad for the walk windows, csize-sort into bounded groups,
    walk, place. Kernel legs (TPU) place the whole batch at once
    (_decode_core_kernel); sort-machine legs keep per-group placement
    (the sort workspace is ~9 B per output byte and must stay bounded).
    Returns (sk uint8 (N, out_len), handled bool (N,))."""
    import os

    N, W = slots.shape
    # walk windows need aligned blocks and parse margin past the stream
    Wpad = max(-(-(W + _MARGIN) // 128) * 128, _WINW)
    slots_w = jnp.pad(slots, ((0, 0), (0, Wpad - W)))
    group = _group_rows(out_len, maxrec)
    if use_expand_kernel():
        return _decode_core_kernel(walk, slots_w, csizes, out_len, maxrec,
                                   W, group)
    no_splat = (os.environ.get("CBLOSC_TPU_SPLAT") == "0"
                or out_len > MAX_OUT)

    def run(sl, cs):
        rf, dist, uni, okf = walk(sl, cs, out_len, maxrec)
        valid = rf[0] >= 0
        splat = okf & uni & (dist <= 1) & (cs <= _PREFIX)

        def slow(_):
            return _place_and_fill(
                sl[:, :W], cs, rf, valid, dist, uni, okf, out_len)

        def dispatch(_):
            if no_splat:
                return slow(None)
            # group-level scalar predicate: rows arrive csize-sorted, so
            # whole groups of trivial rows take the sort-free branch (a
            # scalar lax.cond compiles to a real one-sided conditional)
            fast = jnp.all(splat | (cs <= 0))
            return jax.lax.cond(
                fast,
                lambda _: _splat_place(sl, cs, rf, valid, splat, out_len),
                slow,
                None)

        # stored-raw / masked groups (csize 0 everywhere) produce
        # nothing: skip placement entirely (they cluster under the
        # csize sort — 3/8 of rows on the bench workload)
        return jax.lax.cond(
            jnp.all(cs <= 0),
            lambda _: (jnp.zeros((sl.shape[0], out_len), U8),
                       jnp.zeros((sl.shape[0],), dtype=bool)),
            dispatch,
            None)

    if N <= group:
        return run(slots_w, csizes)
    order = jnp.argsort(csizes)
    inv = jnp.argsort(order)
    sl = jnp.take(slots_w, order, axis=0)
    cs = jnp.take(csizes, order)
    pad = (-N) % group
    if pad:
        sl = jnp.pad(sl, ((0, pad), (0, 0)))
        cs = jnp.pad(cs, (0, pad))
    g = sl.shape[0] // group
    sk, handled = jax.lax.map(
        lambda t: run(t[0], t[1]),
        (sl.reshape(g, group, sl.shape[1]), cs.reshape(g, group)),
    )
    sk = jnp.take(sk.reshape(g * group, out_len)[:N], inv, axis=0)
    handled = jnp.take(handled.reshape(-1)[:N], inv)
    return sk, handled


@partial(jax.jit, static_argnums=(2, 3))
def decode(slots: jax.Array, csizes: jax.Array, out_len: int,
           maxrec_hint: int = 0):
    """Drop-in for codec.decode with the structured fast path.

    Rows the structured machine cannot handle decode through the generic
    loop; outputs merge with a select. Returns (out, produced, err) with
    the same semantics as codec.decode. maxrec_hint overrides the record
    budget (host_api passes high_records for token-dense chunks).
    """
    if out_len > decode_cap() or out_len < 8:
        return codec.decode(slots, csizes, out_len)
    maxrec = maxrec_hint or max_records(out_len)
    N = slots.shape[0]

    # template fast path: PURE-emitted rows (the dominant shape for
    # shuffled typed data) are recognized closed-form and tiled without
    # ever entering the walk; group-level lax.conds skip the walk and
    # the loop decoder entirely when nothing is left for them
    tm = _template_match(slots, csizes, out_len)
    if tm is None:
        sk, handled = decode_core(_walk_batch, slots, csizes, out_len,
                                  maxrec)
    else:
        tmatch, d_t, pat, tail = tm
        cs_rest = jnp.where(tmatch, 0, csizes)

        # the walk machinery AND its merge live inside one cond: when
        # templates cover every live row (the dominant case), the whole
        # batch is ONE fused tile+select pass — no zero buffers, no
        # second merge
        def with_walk(_):
            sk_w, handled_w = decode_core(_walk_batch, slots, cs_rest,
                                          out_len, maxrec)
            tile = _tile_from_pattern(pat, d_t, tail, out_len)
            return (jnp.where(tmatch[:, None], tile, sk_w),
                    handled_w | tmatch)

        def tile_only(_):
            tile = _tile_from_pattern(pat, d_t, tail, out_len)
            return jnp.where(tmatch[:, None], tile, 0), tmatch

        sk, handled = jax.lax.cond(
            jnp.any(cs_rest > 0), with_walk, tile_only, None)

    # fallback rows (csize of handled rows masked to 0 => loop skips
    # them); when every live row was handled the merge is skipped too —
    # unhandled rows are then exactly the csize-0 rows, whose sk bytes
    # are already zero
    def with_fb(_):
        fb_out, fb_prod, fb_err = codec.decode(
            slots, jnp.where(handled, 0, csizes), out_len)
        return (jnp.where(handled[:, None], sk, fb_out),
                jnp.where(handled, out_len, fb_prod),
                jnp.where(handled, False, fb_err))

    def no_fb(_):
        return (sk, jnp.where(handled, out_len, 0), ~handled)

    return jax.lax.cond(
        jnp.any(~handled & (csizes > 0)), with_fb, no_fb, None)
