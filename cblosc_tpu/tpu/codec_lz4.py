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
    MFLIMIT/lastLiterals rules), and a maximal run is ONE sequence —
    255-extension bytes make the match length unbounded;
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

MAX_OUT = structured.MAX_OUT


def slot_width(n: int) -> int:
    """Worst case: token + litlen ext + all-literal payload + slack."""
    return n + n // 255 + 16


@partial(jax.jit, static_argnums=(1, 2, 3))
def encode(
    s: jax.Array, dists: tuple = codec.DISTANCES, min_cratio_x100: int = 0,
    mine: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode batched streams into LZ4 block format.

    s: uint8 (N, n). Returns (slots, csizes, est_iters) like
    codec.encode. Every row is a conforming LZ4 block. Rows whose
    estimated ratio falls below min_cratio_x100/100 (the blosclz
    entropy-probe analog, blosclz.c:425-435) report csize = n without
    paying for segmentation and the emission sort.
    """
    N, n = s.shape
    W = slot_width(n)
    idx = jnp.arange(n, dtype=I32)

    # -- distance selection (shared proxy with the blosclz encoder; the
    #    eq mask is recomputed per group from d_row, see codec._eq_for;
    #    static slices instead of concatenate — no shifted copies) -----
    covs = []
    for d in dists:
        if d < n - 2:
            e = s[:, d:] == s[:, :n - d]
            h3 = e[:, 2:] & e[:, 1:-1] & e[:, :-2]
            covs.append(jnp.sum(h3.astype(I32), axis=1))
        else:
            covs.append(jnp.zeros((N,), I32))
    stack = jnp.stack(covs, 0)
    best = jnp.argmin(-stack, axis=0)
    d_row0 = jnp.asarray(dists, I32)[best][:, None]

    def mine_g(sg, dg):
        # LZ4 offsets are 16-bit: cap the miners' reach accordingly
        return codec.mine_group(sg, dg, max_d=0xFFFF)

    if min_cratio_x100 and N > 8 and n >= 8:
        cov = jnp.max(stack, axis=0)
        est_csize = n - cov + cov // 170 + n // 33 + 16
        hopeless = 100 * n < min_cratio_x100 * est_csize
        cls = hopeless.astype(I32)

        gcap = max(8, (4 << 20) // max(n, 1))   # see codec.encode
        gcap = 1 << (gcap.bit_length() - 1)
        G = min(512, gcap, 1 << (N.bit_length() - 1))

        # class-aligned layout (see codec.encode): normal segment then
        # hopeless segment, both padded to G, so groups never mix
        order = jnp.argsort(cls, stable=True)
        inv_order = jnp.argsort(order)
        counts = jnp.stack(
            [jnp.sum((cls == c).astype(I32)) for c in range(2)])
        padded = -(-counts // G) * G
        base = jnp.concatenate([jnp.zeros((1,), I32),
                                padded[:1].astype(I32)])
        cum = jnp.concatenate([jnp.zeros((1,), I32),
                               counts[:1].astype(I32)])
        M = (-(-N // G) + 2) * G
        j = jnp.arange(M, dtype=I32)
        c_j = (j >= base[1]).astype(I32)
        rank = j - base[c_j]
        real = rank < counts[c_j]
        srcslot = jnp.where(real, cum[c_j] + rank, N)
        srcrow = jnp.take(jnp.concatenate([order, jnp.zeros((1,), I32)]),
                          jnp.minimum(srcslot, N))

        def pad_rows(a):
            return jnp.take(a, srcrow, axis=0)

        so = jnp.where(real[:, None], pad_rows(s), 0)
        do = jnp.where(real[:, None], pad_rows(d_row0), 1)
        g = M // G
        cgrp = c_j.reshape(g, G)[:, 0]
        zero_dm = jnp.zeros((G,), I32)

        def emit_group(t):
            sg, dg, c0 = t

            def do_normal(_):
                mined = mine_g(sg, dg) if mine else None
                sl, cs, es = _emit(
                    sg, codec._eq_for(sg, dg, dists, last_lit=False),
                    dg, mined)
                return sl, cs, es, (mined[0] if mined else zero_dm)

            def do_hopeless(_):
                raw = (jnp.zeros((G, W), U8), jnp.full((G,), n, I32),
                       jnp.zeros((G,), I32), zero_dm)
                if not mine:
                    return raw
                mined = mine_g(sg, dg)

                def emit_mined(_):
                    sl, cs, es = _emit(
                        sg, codec._eq_for(sg, dg, dists, last_lit=False),
                        dg, mined)
                    return sl, cs, es, mined[0]

                return jax.lax.cond(jnp.any(mined[0] > 0), emit_mined,
                                    lambda _: raw, None)

            return jax.lax.cond(c0 == 0, do_normal, do_hopeless, None)

        slots, csize, est, dm = jax.lax.map(
            emit_group,
            (so.reshape(g, G, n), do.reshape(g, G, 1), cgrp))
        dest = base[cls] + inv_order - cum[cls]
        slots = jnp.take(slots.reshape(-1, W), dest, axis=0)
        csize = jnp.take(csize.reshape(-1), dest)
        est = jnp.take(est.reshape(-1), dest)
        dm = jnp.take(dm.reshape(-1), dest)
        csize = jnp.where(hopeless & (dm == 0), n, csize)
        return slots, csize, est
    mined = mine_g(s, d_row0) if (mine and n >= 1024) else None
    return _emit(s, codec._eq_for(s, d_row0, dists, last_lit=False),
                 d_row0, mined)


def _segment(eq: jax.Array, min_len, idx: jax.Array, n: int):
    """LZ4-rule run segmentation: one sequence per maximal run.

    Returns per-position (is_match, suboff, sub_len, roff, eff_len).
    The 255-extension match-length encoding is unbounded, so a run of
    any length is ONE sequence (the reference encoder's granularity).
    Runs shorter than min_len demote to literals; no match may START in
    the last 12 bytes (the MFLIMIT rule)."""
    noneq = jnp.where(eq, -1, idx)
    run_start = jax.lax.cummax(noneq, axis=1) + 1
    nxt = jnp.where(eq, n, idx)
    next_noneq = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
    runlen = next_noneq - run_start

    is_match = eq & (runlen >= min_len)
    is_match &= run_start < n - 12         # MFLIMIT
    roff = idx - run_start
    return is_match, roff, runlen, roff, runlen


def _emit(s: jax.Array, eq: jax.Array, d_row: jax.Array,
          mined=None):
    """LZ4 scan + sort emission.

    With mined = (d_m, eq_m) from codec.mine_group (capped to the
    16-bit offset), runs at the row's mined adaptive distance claim
    their positions first and the static class fills the rest — same
    two-class layering as the blosclz encoder."""
    N, n = s.shape
    W = slot_width(n)
    idx = jnp.arange(n, dtype=I32)

    # -- match segmentation (LZ4 rules) -------------------------------------
    eq &= idx < n - 5                      # last 5 bytes stay literal
    if mined is not None:
        d_m, eq_m = mined
        eq_m = eq_m & (idx < n - 5)
        m2, so2, sl2, ro2, el2 = _segment(
            eq_m, jnp.int32(codec._MINRUN_MINED)[None, None], idx, n)
        m1, so1, sl1, ro1, el1 = _segment(eq & ~m2, 4, idx, n)
        is_match = m1 | m2
        suboff = jnp.where(m2, so2, so1)
        sub_len = jnp.where(m2, sl2, sl1)
        roff = jnp.where(m2, ro2, ro1)
        eff_len = jnp.where(m2, el2, el1)
        d_pos = jnp.where(m2, d_m[:, None], d_row)
    else:
        is_match, suboff, sub_len, roff, eff_len = _segment(eq, 4, idx, n)
        d_pos = jnp.broadcast_to(d_row, (N, n))

    sub_start = is_match & (suboff == 0)
    ml = sub_len - 4                       # token match nibble basis
    km = jnp.where(ml >= 15, (ml - 15) // 255 + 1, 0)
    # a sub-match carries its own zero-literal token when it is not the
    # first sub of its run OR when its run starts directly after another
    # match run (possible only with two classes: a mined run can abut a
    # static run with no literal between — the preceding stretch's token
    # then belongs to the earlier run)
    prev_m = jnp.concatenate(
        [jnp.zeros((N, 1), bool), is_match[:, :-1]], axis=1)
    seedv = jnp.where((roff == 0) & is_match,
                      (idx << 1) | prev_m.astype(I32), -1)
    run_adj = is_match & ((jax.lax.cummax(seedv, axis=1) & 1) == 1)
    later = is_match & ((roff - suboff > 0) | run_adj)

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

    # the stretch's token needs the FOLLOWING match's ml nibble: reverse-
    # fill min(ml, 15) from run starts back to literal positions (only
    # the 4-bit nibble travels — the extension bytes ride the train)
    firstml = jnp.minimum(eff_len - 4, 15)
    seed = jnp.where(is_match & (roff == 0),
                     ((n - idx) << 5) | (firstml + 1), 0)
    rfill = jnp.flip(jax.lax.cummax(jnp.flip(seed, 1), axis=1), 1)
    next_ml = (rfill & 0x1F) - 1           # -1: no following match
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
    # long sequences pay extra walk steps: one per 8 extension bytes
    ext_steps = jnp.sum(jnp.where(sub_start, km // 8, 0)
                        + jnp.where(is_start, kl // 8, 0), axis=1)
    est_iters = nseq + ext_steps + 8

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

    dlo = d_pos & 255
    dhi = d_pos >> 8
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
    """Default walk budget in record slots (one consumed per parse step,
    incl. window-edge stalls — see structured.max_records). Our streams
    carry ~one sequence per match run or literal stretch; foreign
    token-dense streams overflow, and the byte API retries with
    structured.high_records before any host fallback."""
    return out_len // 16 + out_len // 64 + 32


def _walk_batch(slots: jax.Array, csizes: jax.Array, out_len: int,
                maxrec: int):
    """Parse a batch of LZ4 blocks into records (kind 0 literals /
    1 match), batched like structured._walk_batch: each iteration reads
    one aligned 512-byte window per row via masked reductions and runs
    up to _T parse steps on it.

    Per-row FSM phases: 0 = at a sequence token (parse token +
    literal-length ext), 1 = literal-length ext continuation, 2 = at the
    2-byte offset (parse offset + match-length ext), 3 = match-length
    ext continuation. A short sequence costs two steps (token phase,
    offset phase); literal bytes are skipped, not read, so arbitrarily
    long literal runs cost one step plus a window re-read.
    """
    st = structured
    R, W = slots.shape
    B = W // 128
    src3 = slots.reshape(R, B, 128).astype(I32)
    T, KCH, WINW, WB = st._T, st._KCH, st._WINW, st._WB
    nchunks = -(-maxrec // (T * KCH))
    E = nchunks * T * KCH
    rk0 = jnp.full((R, E), -1, I32)
    ra0 = jnp.zeros((R, E), I32)
    rd0 = jnp.zeros((R, E), I32)
    rl0 = jnp.zeros((R, E), I32)
    wwi = jnp.arange(WINW, dtype=I32)[None, :]
    swi = jnp.arange(st._SUBW, dtype=I32)[None, :]

    def inner(carry, _):
        ip, op, phase, mlsave, offsave, extacc, dist, uni, err, fin = carry
        ipblk = jnp.clip(ip // 128, 0, B - WB)
        winc = ipblk * 128
        win = st._select_rows(src3, ipblk, WB)
        win = jnp.where(winc[:, None] + wwi < csizes[:, None], win, 0)
        win16 = win.reshape(R, WINW // 32, 32)

        sk_l, sa_l, sd_l, sl_l = [], [], [], []
        for _t in range(T):
            q = ip - winc
            act = ~(err | fin) & (q <= WINW - st._MARGIN)
            qrow = q >> 5
            sub = st._select_rows(win16, qrow, 2)
            sq = q - (qrow << 5)

            def sel(off):
                return jnp.sum(jnp.where(swi == off[:, None], sub, 0),
                               axis=1)

            is0 = phase == 0
            is1 = phase == 1
            is2 = phase == 2
            is3 = phase == 3

            tok = sel(sq)
            ll_nib = tok >> 4
            ml_nib = tok & 15

            # one 255-run count per step, at the phase's ext position
            ebase = sq + jnp.where(is0, 1, jnp.where(is2, 2, 0))
            inm = (swi >= ebase[:, None]) & (swi < ebase[:, None] + 8)
            lead = jnp.cumprod(
                jnp.where(swi < ebase[:, None], 1,
                          (jnp.where(inm, sub, -1) == 255).astype(I32)),
                axis=1)
            k255 = jnp.sum(jnp.where(swi >= ebase[:, None], lead, 0), axis=1)
            lastb = sel(ebase + jnp.minimum(k255, 7))

            # ---- literal side (phases 0/1) --------------------------------
            need_lext = (is0 & (ll_nib == 15)) | is1
            lext_more = need_lext & (k255 >= 8)
            litlen = jnp.where(
                need_lext, jnp.where(is0, 15, extacc) + 255 * k255 + lastb,
                ll_nib)
            hdr = (jnp.where(is0, 1, 0)
                   + jnp.where(need_lext & ~lext_more, k255 + 1, 0))
            do_lit = (is0 | is1) & ~lext_more
            ipl = ip + hdr
            ip2 = ipl + litlen
            op2 = op + jnp.where(do_lit, litlen, 0)
            lit_err = do_lit & ((ip2 > csizes) | (op2 > out_len))
            lit_fin = do_lit & ~lit_err & (ip2 >= csizes)   # final literals
            has_lit = do_lit & ~lit_err & (litlen > 0)

            # ---- match side (phases 2/3) ----------------------------------
            offv = jnp.where(is2, sel(sq) | (sel(sq + 1) << 8), offsave)
            need_mext = (is2 & (mlsave == 15)) | is3
            mext_more = need_mext & (k255 >= 8)
            mlen = 4 + jnp.where(
                need_mext, jnp.where(is2, 15, extacc) + 255 * k255 + lastb,
                mlsave)
            m_done = (is2 | is3) & ~mext_more
            ip3 = ip + jnp.where(is2, 2, 0) \
                + jnp.where(need_mext & ~mext_more, k255 + 1, 0)
            d2 = jnp.where(dist == 0, offv, dist)
            m_err = m_done & (
                (offv == 0) | (offv > op) | (op + mlen > out_len)
                | (ip3 > csizes))

            # ---- merge + state advance ------------------------------------
            ext_err = (lext_more | mext_more) & (ip + 8 >= csizes)
            err_t = jnp.where(is0 | is1, lit_err, m_err) | ext_err
            good = act & ~err_t
            valid = good & (has_lit | m_done)
            is_l = is0 | is1
            sk_l.append(jnp.where(valid, jnp.where(is_l, 0, 1), -1))
            sa_l.append(jnp.where(is_l, ipl, offv))
            sd_l.append(op)
            sl_l.append(jnp.where(is_l, litlen, mlen))

            phase_n = jnp.where(
                lext_more, 1,
                jnp.where(mext_more, 3,
                          jnp.where(do_lit & ~lit_fin, 2, 0)))
            ip_n = jnp.where(
                lext_more, ip + jnp.where(is0, 9, 8),
                jnp.where(mext_more, ip + jnp.where(is2, 10, 8),
                          jnp.where(do_lit, ip2, ip3)))
            op_n = jnp.where(do_lit, op2,
                             jnp.where(m_done, op + mlen, op))
            mlsave_n = jnp.where(is0, ml_nib, mlsave)
            offsave_n = jnp.where(is2, offv, offsave)
            extacc_n = jnp.where(
                lext_more, jnp.where(is0, 15, extacc) + 255 * 8,
                jnp.where(mext_more, jnp.where(is2, 15, extacc) + 255 * 8,
                          0))
            dist_n = jnp.where(m_done & ~err_t, d2, dist)
            uni_n = uni & ~(m_done & ~err_t & (offv != d2))

            upd = (ip_n, op_n, phase_n, mlsave_n, offsave_n, extacc_n,
                   dist_n, uni_n)
            old = (ip, op, phase, mlsave, offsave, extacc, dist, uni)
            ip, op, phase, mlsave, offsave, extacc, dist, uni = (
                jnp.where(good, n, o) for n, o in zip(upd, old))
            err = err | (act & err_t)
            fin = fin | (good & lit_fin)

        rows = tuple(jnp.stack(ls, axis=1)
                     for ls in (sk_l, sa_l, sd_l, sl_l))
        return (ip, op, phase, mlsave, offsave, extacc, dist, uni, err,
                fin), rows

    def cond(stt):
        kslot, carry = stt[4], stt[5:]
        return jnp.any(~(carry[8] | carry[9])) & (kslot < nchunks)

    def body(stt):
        rf, kslot = stt[:4], stt[4]
        carry, rows = jax.lax.scan(inner, stt[5:], None, length=KCH)
        rf = tuple(
            jax.lax.dynamic_update_slice(
                f, jnp.moveaxis(r, 0, 1).reshape(R, KCH * T),
                (0, kslot * KCH * T))
            for f, r in zip(rf, rows))
        return rf + (kslot + 1,) + carry

    zero = jnp.zeros((R,), I32)
    stt = jax.lax.while_loop(
        cond, body,
        (rk0, ra0, rd0, rl0, jnp.int32(0),
         zero, zero, zero, zero, zero, zero, zero, zero == 0,
         csizes <= 0, csizes <= 0),
    )
    rf = stt[:4]
    ip, op, phase, mlsave, offsave, extacc, dist, uni, err, fin = stt[5:]
    err = err | ~(err | fin)
    ok = ~err & (op == out_len)
    return rf, dist, uni, ok


@partial(jax.jit, static_argnums=(2, 3))
def decode(slots: jax.Array, csizes: jax.Array, out_len: int,
           maxrec_hint: int = 0):
    """Decode batched LZ4 blocks via the structured machine.

    Rows the walk cannot handle report err=True (the caller falls back
    to a host engine for the whole chunk). Returns (out, produced, err).
    maxrec_hint overrides the record budget (see structured.decode).
    """
    N, W = slots.shape
    if out_len > structured.decode_cap() or out_len < 8:
        return (jnp.zeros((N, out_len), U8),
                jnp.zeros((N,), I32),
                csizes > 0)
    maxrec = maxrec_hint or max_records(out_len)
    sk, handled = structured.decode_core(
        _walk_batch, slots, csizes, out_len, maxrec)
    produced = jnp.where(handled, out_len, 0)
    return sk, produced, ~handled & (csizes > 0)
