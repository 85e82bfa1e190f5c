"""Device LZ4 block-format codec: vectorized encoder + structured decoder.

Same architecture as the device BloscLZ codec (tpu/codec.py) retargeted
at the LZ4 block format (reference wrappers blosc/blosc.c:412-440; wire
grammar per sequence: token = litlen<<4 | matchlen-4, 255-extension
bytes, literals, 2-byte LE offset):

  * the encoder reuses the periodic-match strategy — per-stream distance
    selection over static shifts, cummax/cummin segmentation, prefix-sum
    layout, ONE key sort for emission. LZ4 couples a literal run and a
    match into one sequence, so the token lands at the literal-stretch
    start (carrying the FOLLOWING match's length nibble, obtained with a
    reverse fill) and long matches continue as zero-literal sequences;
  * format guard rails: matches are >= 4 bytes, never start in the last
    12 bytes, never extend into the last 5 (the reference encoder's
    MFLIMIT/lastLiterals rules), and sub-matches cap at SUBL so a
    sequence needs at most 4 length-extension bytes;
  * decoding walks sequences into records (parse-only loop, one window
    read + one record write per iteration) and reuses the structured
    placement machine (sort + residue fills). Streams the walk cannot
    handle (mixed distances, foreign geometry) report err — the host
    engines decode those chunks instead.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import codec, structured

I32 = jnp.int32
U8 = jnp.uint8

SUBL = 1024                    # max match bytes per emitted sequence
MAX_OUT = structured.MAX_OUT


def slot_width(n: int) -> int:
    """Worst case: token + litlen ext + all-literal payload + slack."""
    return n + n // 255 + 16


@partial(jax.jit, static_argnums=1)
def encode(
    s: jax.Array, dists: tuple = codec.DISTANCES
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode batched streams into LZ4 block format.

    s: uint8 (N, n). Returns (slots, csizes, est_iters) like
    codec.encode. Every row is a conforming LZ4 block.
    """
    N, n = s.shape
    W = slot_width(n)
    idx = jnp.arange(n, dtype=I32)

    # -- distance selection (shared proxy with the blosclz encoder) --------
    eqs, covs = [], []
    for d in dists:
        if d < n:
            prev = jnp.concatenate([s[:, :d], s[:, :-d]], axis=1)
            e = (s == prev) & (idx >= d)
        else:
            e = jnp.zeros_like(s, dtype=bool)
        eqs.append(e)
        covs.append(jnp.sum((e[:, 2:] & e[:, 1:-1] & e[:, :-2]).astype(I32),
                            axis=1))
    best = jnp.argmin(-jnp.stack(covs, 0), axis=0)
    eq = eqs[0]
    for k in range(1, len(dists)):
        eq = jnp.where((best == k)[:, None], eqs[k], eq)
    d_row = jnp.asarray(dists, I32)[best][:, None]

    # -- match segmentation (LZ4 rules) -------------------------------------
    eq &= idx < n - 5                      # last 5 bytes stay literal
    noneq = jnp.where(eq, -1, idx)
    run_start = jax.lax.cummax(noneq, axis=1) + 1
    nxt = jnp.where(eq, n, idx)
    next_noneq = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
    runlen = next_noneq - run_start

    is_match = eq & (runlen >= 4)
    roff = idx - run_start
    tail_rem = runlen % SUBL
    short_tail = (tail_rem > 0) & (tail_rem < 4)
    eff_len = jnp.where(short_tail, runlen - tail_rem, runlen)
    is_match &= roff < eff_len
    # no sub-match may START in the last 12 bytes (MFLIMIT)
    is_match &= (idx - (roff % SUBL)) < n - 12

    suboff = roff % SUBL
    sub_start = is_match & (suboff == 0)
    sub_len = jnp.minimum(SUBL, eff_len - (roff - suboff))
    ml = sub_len - 4                       # token match nibble basis
    km = jnp.where(ml >= 15, (ml - 15) // 255 + 1, 0)
    later = is_match & (roff - suboff > 0)  # sub-match with its own token

    # -- literal stretches ---------------------------------------------------
    lit = ~is_match
    nonlit = jnp.where(lit, -1, idx)
    lit_start = jax.lax.cummax(nonlit, axis=1) + 1
    lit_off = idx - lit_start
    nxtl = jnp.where(lit, n, idx)
    next_nonlit = jnp.flip(jax.lax.cummin(jnp.flip(nxtl, 1), axis=1), 1)
    L = next_nonlit - lit_start            # stretch length, at lit positions
    kl = jnp.where(L >= 15, (L - 15) // 255 + 1, 0)
    is_start = lit & (lit_off == 0)

    # the stretch's token needs the FOLLOWING first sub-match's ml nibble:
    # reverse-fill first-sub ml from run starts back to literal positions
    firstml = jnp.minimum(SUBL, eff_len) - 4
    seed = jnp.where(is_match & (roff == 0),
                     ((n - idx) << 11) | (firstml + 1), 0)
    rfill = jnp.flip(jax.lax.cummax(jnp.flip(seed, 1), axis=1), 1)
    next_ml = (rfill & 0x7FF) - 1          # -1: no following match
    has_follow = next_ml >= 0

    # -- per-position output contributions ----------------------------------
    # literal position q of a stretch: data byte + (token at q==0) +
    # (one lit-ext byte each at q in [1, kl]); a sub-match's whole byte
    # train ([token] off_lo off_hi ext...) is paid at its start
    in_lext = lit & (lit_off >= 1) & (lit_off <= kl)
    train_len = jnp.where(later, 3, 2) + km
    c = (jnp.where(lit, 1 + is_start.astype(I32) + in_lext.astype(I32), 0)
         + jnp.where(sub_start, train_len, 0))
    off = jnp.cumsum(c, axis=1) - c
    csize = off[:, -1] + c[:, -1]

    nseq = jnp.sum(sub_start.astype(I32) + is_start.astype(I32), axis=1)
    est_iters = nseq + 8

    # -- emission: one full lane + a 4:1-compacted side lane ------------------
    # Match-train bytes ride lane 0 of consecutive match positions (a
    # train longer than t bytes implies the sub-match is long enough:
    # 3 bytes always fit in the >=4 positions, km >= 1 means sub_len >=
    # 19, km >= 2 means >= 274). Lane 1 carries only the stretch token
    # and the literal-length extension bytes RE-SPREAD AT STRIDE 4
    # (u-th ext byte from position 4u; kl <= L/4 since L >= 15), so
    # lane-1 positions are >= 4 apart and compact 4:1 collision-free.
    # stretch-start output offset, recovered from any position's own off:
    # off[p] = off_s + q + [q>=1] + clamp(q-1, 0, kl)   (q = lit_off)
    off_s = jnp.where(
        is_start, off,
        off - (lit_off + 1 + jnp.clip(lit_off - 1, 0, kl)))
    tok_lit = (jnp.minimum(L, 15) << 4) | jnp.where(
        has_follow, jnp.minimum(jnp.maximum(next_ml, 0), 15), 0)
    data_dst = off_s + 1 + kl + lit_off

    dlo = d_row & 255
    dhi = d_row >> 8
    tok_m = jnp.minimum(ml, 15)            # zero-literal sequence token

    # byte j of a sub-match train; layout [token?][off_lo][off_hi][ext...]
    def seq_byte(j):
        jj = j - jnp.where(later, 1, 0)
        ext = jnp.clip(ml - 15 - 255 * (jj - 2), 0, 255)
        return jnp.where(
            later & (j == 0), tok_m,
            jnp.where(jj == 0, dlo, jnp.where(jj == 1, dhi, ext)))

    # train base offset at every match position (off is constant past the
    # sub start, equal to base + train_len)
    tbase = jnp.where(sub_start, off, off - train_len)

    # lane 0: literal data | train byte `suboff`
    val0 = jnp.where(lit, s.astype(I32), seq_byte(suboff))
    pos0 = jnp.where(lit, data_dst, tbase + suboff)
    valid0 = lit | (is_match & (suboff < train_len))
    key0 = jnp.where(valid0, (pos0 << 8) | (val0 & 0xFF), codec._BIG)

    # lane 1: stretch token at q==0; u-th lit-ext byte from q == 4u
    u = lit_off >> 2
    in_lext4 = lit & (lit_off % 4 == 0) & (u >= 1) & (u <= kl)
    lext_val = jnp.clip(L - 15 - 255 * (u - 1), 0, 255)
    val1 = jnp.where(is_start, tok_lit, lext_val)
    pos1 = jnp.where(is_start, off_s, off_s + u)
    valid1 = is_start | in_lext4
    key1 = jnp.where(valid1, (pos1 << 8) | (val1 & 0xFF), codec._BIG)
    if n % 4 == 0:
        side = jnp.min(key1.reshape(N, n // 4, 4), axis=2)
    else:
        side = key1

    keys = jax.lax.sort(jnp.concatenate([key0, side], axis=1), dimension=1)
    slots = (keys[:, :W] & 0xFF).astype(U8)
    slots = jnp.where(jnp.arange(W, dtype=I32)[None, :] < csize[:, None],
                      slots, 0)
    return slots, csize, est_iters


# ---------------------------------------------------------------------------
# Structured decode: LZ4 sequence walk + the shared placement machine
# ---------------------------------------------------------------------------

def max_records(out_len: int) -> int:
    """Our streams carry ~one sequence per SUBL match or per literal
    stretch; foreign token-dense streams overflow and fall back."""
    return out_len // 16 + 32


def _walk_one(src: jax.Array, csize: jax.Array, out_len: int, maxrec: int):
    """Parse one LZ4 block into records (kind 0 literals / 1 match).

    Phases: 0 = parse a full sequence (token + lit-ext in window 1,
    offset + match-ext in window 2); 1 = continue a long literal-length
    extension; 2 = continue a long match-length extension. Common
    streams stay in phase 0 — one sequence (two records) per iteration.
    """
    W = src.shape[0]
    srci = src.astype(I32)
    WINW = 16
    wwi = jnp.arange(WINW, dtype=I32)
    recs0 = jnp.zeros((maxrec, 4), I32)

    # state: (recs, k, ip, op, phase, mlsave, offsave, extacc, dist, err, fin)
    def cond(st):
        return ~(st[9] | st[10])

    def body(st):
        recs, k, ip, op, phase, mlsave, offsave, extacc, dist, err, fin = st
        is0 = phase == 0
        is1 = phase == 1
        is2 = phase == 2

        winc = jnp.minimum(ip, jnp.maximum(W - WINW, 0))
        win = jax.lax.dynamic_slice(srci, (winc,), (WINW,))
        win = jnp.where(wwi + winc < csize, win, 0)
        sh = ip - winc

        def sel(w, off):
            return jnp.sum(jnp.where(wwi == off, w, 0))

        tok = sel(win, sh)
        ll_nib = tok >> 4
        ml_nib0 = tok & 15

        # --- literal length (phase 0 inline ext, phase 1 continuation) ----
        lbase = jnp.where(is0, sh + 1, sh)
        inw = (wwi >= lbase) & (wwi < lbase + 8)
        lead = jnp.cumprod(jnp.where(
            wwi < lbase, 1, (jnp.where(inw, win, -1) == 255).astype(I32)))
        k255 = jnp.sum(jnp.where(wwi >= lbase, lead, 0))
        need_lext = (is0 & (ll_nib == 15)) | is1
        lext_more = need_lext & (k255 >= 8)
        lastb = sel(win, lbase + jnp.minimum(k255, 7))
        litlen = jnp.where(
            need_lext,
            jnp.where(is0, 15, extacc) + 255 * k255 + lastb,
            ll_nib)
        ipl = jnp.where(
            need_lext & ~lext_more, ip + (lbase - sh) + k255 + 1,
            jnp.where(is0, ip + 1, ip))
        # phase 2 never runs the literal step
        do_lit = (is0 | is1) & ~lext_more
        ip2 = ipl + jnp.where(do_lit, litlen, 0)
        op2 = op + jnp.where(do_lit, litlen, 0)
        err_a = (do_lit & ((ip2 > csize) | (op2 > out_len))) \
            | (lext_more & (ip + (lbase - sh) + 8 >= csize))
        fin_a = do_lit & (ip2 >= csize) & ~err_a       # final literals
        rec_lit = jnp.stack([jnp.int32(0), ipl, op, litlen])
        has_lit = do_lit & (litlen > 0) & ~err_a

        # --- offset + match length ------------------------------------------
        # phase 0/1 finish: parse at ip2 (second window); phase 2: parse
        # the pending match-length extension at ip (first window)
        m_seq = do_lit & ~fin_a & ~err_a
        winc2 = jnp.minimum(ip2, jnp.maximum(W - WINW, 0))
        win2 = jax.lax.dynamic_slice(srci, (winc2,), (WINW,))
        win2 = jnp.where(wwi + winc2 < csize, win2, 0)
        sh2 = ip2 - winc2
        offv = jnp.where(
            m_seq, sel(win2, sh2) | (sel(win2, sh2 + 1) << 8), offsave)
        nib = jnp.where(is0, ml_nib0, mlsave)
        need_mext = (m_seq & (nib == 15)) | is2
        mbase = jnp.where(is2, sh, sh2 + 2)
        mw = jnp.where(is2, win, win2)
        inm = (wwi >= mbase) & (wwi < mbase + 8)
        mlead = jnp.cumprod(jnp.where(
            wwi < mbase, 1, (jnp.where(inm, mw, -1) == 255).astype(I32)))
        km = jnp.sum(jnp.where(wwi >= mbase, mlead, 0))
        mext_more = need_mext & (km >= 8)
        mlastb = sel(mw, mbase + jnp.minimum(km, 7))
        mext_base = jnp.where(is2, extacc, 15)
        mlen = 4 + jnp.where(need_mext, mext_base + 255 * km + mlastb, nib)
        m_done = (m_seq | is2) & ~mext_more
        ip3 = jnp.where(
            is2, ip + km + 1,
            ip2 + 2 + jnp.where(need_mext, km + 1, 0))
        err_b = err_a | (m_done & (
            (offv == 0) | (offv > op2) | (op2 + mlen > out_len)
            | (ip3 > csize)))
        d2 = jnp.where(dist == 0, offv, dist)
        err_b = err_b | (m_done & (offv != d2))
        rec_m = jnp.stack([jnp.int32(1), offv, op2, mlen])

        # --- state advance ----------------------------------------------------
        phase2 = jnp.where(
            lext_more, 1,
            jnp.where(mext_more, 2, 0)).astype(I32)
        ip_n = jnp.where(
            lext_more, ip + (lbase - sh) + 8,
            jnp.where(mext_more,
                      jnp.where(is2, ip + 8, ip2 + 2 + 8),
                      jnp.where(m_done, ip3, ip2)))
        op_n = jnp.where(m_done, op2 + mlen, op2)
        mlsave_n = jnp.where(lext_more & is0, ml_nib0, mlsave)
        offsave_n = jnp.where(mext_more & ~is2, offv, offsave)
        extacc_n = jnp.where(
            lext_more, jnp.where(is0, 15, extacc) + 255 * 8,
            jnp.where(mext_more, mext_base + 255 * 8, 0)).astype(I32)
        dist_n = jnp.where(m_done, d2, dist)

        valid0 = has_lit
        valid1 = m_done
        # write lit rec then match rec (match slides into slot 0 when no
        # literal record was produced)
        row0 = jnp.where(has_lit, rec_lit, rec_m)
        row1 = rec_m
        nadd = valid0.astype(I32) + valid1.astype(I32)
        nadd = jnp.where(has_lit & m_done, 2, jnp.minimum(nadd, 1))
        err_c = err_b | (k + nadd > maxrec)
        kc = jnp.minimum(k, maxrec - 2)
        recs = jax.lax.dynamic_update_slice(
            recs, jnp.stack([row0, row1]), (kc, 0))
        return (recs, k + nadd, ip_n, op_n, phase2, mlsave_n, offsave_n,
                extacc_n, dist_n, err_c, fin | fin_a)

    recs, k, ip, op, phase, mlsave, offsave, extacc, dist, err, fin = \
        jax.lax.while_loop(
            cond, body,
            (recs0, jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
             csize <= 0, csize <= 0),
        )
    ok = ~err & (op == out_len)
    return recs, k, dist, ok


@partial(jax.jit, static_argnums=2)
def decode(slots: jax.Array, csizes: jax.Array, out_len: int):
    """Decode batched LZ4 blocks via the structured machine.

    Rows the walk cannot handle report err=True (the caller falls back
    to a host engine for the whole chunk). Returns (out, produced, err).
    """
    N = slots.shape[0]
    if out_len > MAX_OUT or out_len < 8:
        return (jnp.zeros((N, out_len), U8),
                jnp.zeros((N,), I32),
                csizes > 0)
    maxrec = max_records(out_len)
    minw = 32
    if slots.shape[1] < minw:
        slots = jnp.pad(slots, ((0, 0), (0, minw - slots.shape[1])))
    recs, nrec, dist, ok = structured.grouped_walk(
        _walk_one, slots, csizes, out_len, maxrec)
    rec_valid = jnp.arange(recs.shape[1], dtype=I32)[None, :] < nrec[:, None]
    sk, handled = structured._place_and_fill(
        slots, csizes, recs, rec_valid, dist, ok, out_len)
    produced = jnp.where(handled, out_len, 0)
    return sk, produced, ~handled & (csizes > 0)
