"""Device zlib (DEFLATE) decoder: batched Huffman FSM + record placement.

The reference wraps zlib with one-shot compress2/uncompress calls
(blosc/blosc.c:469-496); each split stream is a complete zlib stream
(2-byte header, DEFLATE blocks per RFC 1951, adler32). Until this module
every zlib chunk forced a host round-trip; now the decode half runs on
device (SURVEY.md stage 6), keeping HBM-resident chunks on-chip.

Architecture (mirrors the blosclz walk/place split in tpu/structured.py,
adapted to a bit-granular grammar):

  1. FSM WALK — a batched ``lax.while_loop`` over rows. Each iteration
     fetches one 16-byte window per row (a (rows, 16) gather — bit-serial
     Huffman decode cannot use the walk's full-array masked reductions,
     whose cost scales with the whole stream per call) and decodes up to
     _T symbols from it: canonical Huffman decode is a 15-step unrolled
     compare against per-row (first, count, offset) tables plus ONE
     symtable gather; extra bits are direct reads. Dynamic-block table
     construction runs in dedicated FSM modes (code-length alphabet
     decode with repeat codes, then a vectorized canonical build behind a
     group-level cond). Literal symbols append byte EVENTS, length/dist
     symbols append match events.
  2. TAPE + RECORDS — literal events compact (one sort) into a per-row
     byte tape in output order; runs of consecutive literals collapse to
     one record pointing into the tape; match events become match
     records. The record stream then drives the EXISTING placement
     machines with the tape as the byte source: the residue-keyed sort
     machine for uniform-distance rows (every constant/periodic
     byte-plane deflates to distance-1/d matches) and the Pallas expand
     kernel for mixed distances.

Scope: stored (BTYPE=0) blocks and preset dictionaries report err and
fall back to the host engines (blosc only produces them for data it
would store raw anyway); adler32 is not re-verified on device (format
validation lives in the chunk layer; corrupt streams surface as err).

Cost model honesty: DEFLATE is bit-serial per stream — each batched
iteration costs ~200 ns/row (the window gather), so throughput scales
with output bytes PER SYMBOL, not bytes per row: long-match streams
(shuffled typed data, ~258 B/symbol) decode at ~1 GB/s-class rates;
literal-dense streams crawl and exist for completeness. That is the
honest TPU shape of this codec; zstd's FSE decode shares it (see
docs/COMPLETENESS.md for the round-4 scoping note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import structured

I32 = jnp.int32
U8 = jnp.uint8

_T = 4              # symbols decoded per 16-byte window fetch
_KCH = 4            # FSM iterations per event-buffer flush
_WIN = 16           # window bytes per fetch (128 bits)
_NEED = 48          # worst-case bits one symbol consumes (15+5+15+13)

# RFC 1951 static tables (spec constants, 3.2.5/3.2.7)
_LBASE = np.array([3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31,
                   35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258],
                  np.int32)
_LEXTRA = np.array([0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2,
                    3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5, 0], np.int32)
_DBASE = np.array([1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129,
                   193, 257, 385, 513, 769, 1025, 1537, 2049, 3073, 4097,
                   6145, 8193, 12289, 16385, 24577], np.int32)
_DEXTRA = np.array([0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7,
                    8, 8, 9, 9, 10, 10, 11, 11, 12, 12, 13, 13], np.int32)
_CLORDER = np.array([16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2,
                     14, 1, 15], np.int32)
# fixed-Huffman code lengths (3.2.6)
_FIXED_LL = np.concatenate([np.full(144, 8), np.full(112, 9),
                            np.full(24, 7), np.full(8, 8)]).astype(np.int32)
_FIXED_D = np.full(30, 5, np.int32)

# FSM modes
_M_BLK, _M_CLLEN, _M_LENS, _M_BUILD, _M_SYM = 0, 1, 2, 3, 4

_LMAX = 288 + 32        # code-length scratch (hlit + hdist max)


def _bitrev(v, nbits: int):
    """Reverse the low `nbits` bits of v (Huffman codes arrive MSB-first
    while bytes fill LSB-first, RFC 1951 3.1.1)."""
    r = jnp.zeros_like(v)
    for i in range(nbits):
        r = r | (((v >> i) & 1) << (nbits - 1 - i))
    return r


def _build_table(L, maxbits: int, S: int):
    """Canonical Huffman decode tables from per-row code lengths.

    L: (R, S) int32 lengths (0 = unused symbol). Returns
    (first (R, maxbits+1), cnt (R, maxbits+1), offs (R, maxbits+1),
    symtab (R, S)) where symtab lists symbols sorted by (length, symbol)
    — the canonical order (RFC 1951 3.2.2)."""
    R = L.shape[0]
    counts = [jnp.zeros((R,), I32)]
    for b in range(1, maxbits + 1):
        counts.append(jnp.sum((L == b).astype(I32), axis=1))
    first, offs = [jnp.zeros((R,), I32)], [jnp.zeros((R,), I32)]
    code = jnp.zeros((R,), I32)
    off = jnp.zeros((R,), I32)
    for b in range(1, maxbits + 1):
        first.append(code)
        offs.append(off)
        code = (code + counts[b]) << 1
        off = off + counts[b]
    sym = jnp.arange(S, dtype=I32)[None, :]
    key = jnp.where(L > 0, L * 512 + sym, jnp.int32(1 << 24) + sym)
    _, symtab = jax.lax.sort((key, jnp.broadcast_to(sym, (R, S))),
                             dimension=1, num_keys=1)
    return (jnp.stack(first, 1), jnp.stack(counts, 1),
            jnp.stack(offs, 1), symtab)


def _decode_sym(peek, first, cnt, offs, symtab, maxbits: int):
    """One canonical symbol from `peek` ((R,) holding >= maxbits LSB-first
    bits). Returns (sym, codelen) with codelen 0 on invalid codes."""
    rev = _bitrev(peek & ((1 << maxbits) - 1), maxbits)
    idx = jnp.zeros(peek.shape, I32)
    ln = jnp.zeros(peek.shape, I32)
    found = jnp.zeros(peek.shape, bool)
    for b in range(1, maxbits + 1):
        c = rev >> (maxbits - b)
        hit = (~found & (cnt[:, b] > 0) & (c >= first[:, b])
               & (c < first[:, b] + cnt[:, b]))
        idx = jnp.where(hit, offs[:, b] + c - first[:, b], idx)
        ln = jnp.where(hit, b, ln)
        found |= hit
    idx = jnp.clip(idx, 0, symtab.shape[1] - 1)
    sym = jnp.take_along_axis(symtab, idx[:, None], axis=1)[:, 0]
    return jnp.where(found, sym, 0), ln


def _fsm_walk(slots, csizes, out_len: int, maxev: int):
    """Parse zlib streams into (tape, records).

    slots: uint8 (R, W) rows zero past csize. Returns (tape (R, E) u8,
    tlen (R,), rf, dist (R,), uni (R,), ok (R,)) with rf the field-tuple
    record form (kind, arg, dst, len), each (R, E) i32: kind 0 = literal
    run (arg = tape offset), 1 = match (arg = distance).
    """
    R, W = slots.shape
    srci = slots.astype(I32)
    nchunks = -(-maxev // (_T * _KCH))
    E = nchunks * _T * _KCH
    ek0 = jnp.full((R, E), -1, I32)
    ea0 = jnp.zeros((R, E), I32)
    ed0 = jnp.zeros((R, E), I32)
    el0 = jnp.zeros((R, E), I32)

    lane16 = jnp.arange(_WIN, dtype=I32)[None, :]

    lbase = jnp.asarray(_LBASE)
    lextra = jnp.asarray(_LEXTRA)
    dbase = jnp.asarray(_DBASE)
    dextra = jnp.asarray(_DEXTRA)
    clorder = jnp.asarray(_CLORDER)
    liot = jnp.arange(_LMAX, dtype=I32)[None, :]

    # maxbits 15 so the fixed tables share the carried table shapes
    fx_ll = _build_table(jnp.broadcast_to(jnp.asarray(_FIXED_LL), (R, 288)),
                         15, 288)
    fx_d = _build_table(jnp.broadcast_to(jnp.asarray(_FIXED_D), (R, 30)),
                        15, 30)

    def win_at(bitpos):
        """(R, _WIN) window bytes at bitpos//8 (clamped)."""
        b0 = jnp.clip(bitpos >> 3, 0, max(W - _WIN, 0))
        return jnp.take_along_axis(
            srci, b0[:, None] + lane16, axis=1), b0 << 3

    def rd(win, lb, n: int):
        """n (<= 17) bits at window-local bit offset lb (LSB-first)."""
        lbyte = lb >> 3
        sel = (lane16 >= lbyte[:, None]) & (lane16 < lbyte[:, None] + 3)
        sh = (lane16 - lbyte[:, None]) * 8
        v = jnp.sum(jnp.where(sel, win << jnp.clip(sh, 0, 16), 0), axis=1)
        return (v >> (lb & 7)) & ((1 << n) - 1)

    # state tuple indices (kept flat for while_loop):
    # 0 bitpos 1 mode 2 final 3 hlit 4 hdist 5 hclen 6 clidx 7 pos
    # 8 prevlen 9 op 10 err 11 fin 12 Larr(R,_LMAX)
    # 13..16 cl tables  17..20 lit tables  21..24 dist tables

    def inner(carry, _):
        (bitpos, mode, final, hlit, hdist, hclen, clidx, pos, prevlen,
         op, err, fin, Larr, clt, litt, dstt) = carry

        active = ~(err | fin)
        win, winb = win_at(bitpos)
        lb = bitpos - winb

        ek_l, ea_l, ed_l, el_l = [], [], [], []

        # ---- M_BLK: 3-bit block header --------------------------------
        is_blk = active & (mode == _M_BLK)
        hdrbits = rd(win, lb, 3)
        bfinal = hdrbits & 1
        btype = (hdrbits >> 1) & 3
        # BTYPE 0 (stored) and 3 are not handled on device: err routes
        # the row to the host engines (see module docstring)
        blk_err = is_blk & ((btype == 0) | (btype == 3))
        to_dyn = is_blk & (btype == 2)
        to_fix = is_blk & (btype == 1)
        bitpos = jnp.where(is_blk & ~blk_err, bitpos + 3, bitpos)
        final = jnp.where(is_blk, bfinal, final)

        # dynamic header: HLIT HDIST HCLEN (5+5+4 bits)
        dwin, dwinb = win, winb      # still within the 128-bit window
        dlb = bitpos - dwinb
        hl = rd(dwin, dlb, 5) + 257
        hd = rd(dwin, jnp.minimum(dlb + 5, 127), 5) + 1
        hc = rd(dwin, jnp.minimum(dlb + 10, 127), 4) + 4
        hlit = jnp.where(to_dyn, hl, hlit)
        hdist = jnp.where(to_dyn, hd, hdist)
        hclen = jnp.where(to_dyn, hc, hclen)
        bitpos = jnp.where(to_dyn, bitpos + 14, bitpos)
        clidx = jnp.where(to_dyn, 0, clidx)
        pos = jnp.where(to_dyn, 0, pos)
        Larr = jnp.where(to_dyn[:, None], 0, Larr)
        litt = tuple(jnp.where(_bdim(to_fix, a), b, a)
                     for a, b in zip(litt, fx_ll))
        dstt = tuple(jnp.where(_bdim(to_fix, a), b, a)
                     for a, b in zip(dstt, fx_d))
        mode = jnp.where(to_dyn, _M_CLLEN,
                         jnp.where(to_fix, _M_SYM, mode))

        # ---- M_CLLEN: one 3-bit code-length-code length ----------------
        is_cl = active & (mode == _M_CLLEN)
        win2, winb2 = win_at(bitpos)
        lb2 = bitpos - winb2
        clv = rd(win2, lb2, 3)
        tgt = jnp.take(clorder, jnp.clip(clidx, 0, 18))
        # CL lengths live in Larr[288+..] region? no — separate 19-wide
        # region at the tail of Larr is too small; reuse top of Larr
        # scratch: positions _LMAX-19.._LMAX-1 hold the CL lengths.
        upd_cl = is_cl & (clidx < hclen)
        Larr = jnp.where(
            (liot == (_LMAX - 19) + tgt[:, None]) & upd_cl[:, None],
            clv[:, None], Larr)
        bitpos = jnp.where(upd_cl, bitpos + 3, bitpos)
        clidx = jnp.where(upd_cl, clidx + 1, clidx)
        cl_done = is_cl & (clidx >= hclen)
        mode = jnp.where(cl_done, _M_BUILD, mode)
        # mark build kind: pos == -1 flags "build CL table"
        pos = jnp.where(cl_done, -1, pos)

        # ---- M_BUILD: vectorized table construction -------------------
        is_bld = active & (mode == _M_BUILD)

        def do_builds(t):
            Larr, clt, litt, dstt = t
            cl_lens = jax.lax.dynamic_slice_in_dim(Larr, _LMAX - 19, 19, 1)
            clt2 = _build_table(cl_lens, 7, 19)
            ll_lens = jnp.where(liot[:, :288] < hlit[:, None],
                                Larr[:, :288], 0)
            litt2 = _build_table(ll_lens, 15, 288)
            didx = jnp.clip(hlit[:, None] + jnp.arange(32, dtype=I32)[None, :],
                            0, _LMAX - 1)
            d_lens = jnp.take_along_axis(Larr, didx, axis=1)[:, :30]
            d_lens = jnp.where(jnp.arange(30)[None, :] < hdist[:, None],
                               d_lens, 0)
            dstt2 = _build_table(d_lens, 15, 30)
            build_cl = pos < 0
            clt = tuple(jnp.where(_bdim(is_bld & build_cl, a), b, a)
                        for a, b in zip(clt, clt2))
            litt = tuple(jnp.where(_bdim(is_bld & ~build_cl, a), b, a)
                         for a, b in zip(litt, litt2))
            dstt = tuple(jnp.where(_bdim(is_bld & ~build_cl, a), b, a)
                         for a, b in zip(dstt, dstt2))
            return clt, litt, dstt

        clt, litt, dstt = jax.lax.cond(
            jnp.any(is_bld), do_builds,
            lambda t: (t[1], t[2], t[3]), (Larr, clt, litt, dstt))
        went_cl = is_bld & (pos < 0)
        pos = jnp.where(went_cl, 0, pos)
        mode = jnp.where(went_cl, _M_LENS,
                         jnp.where(is_bld, _M_SYM, mode))

        # ---- M_LENS: one code-length symbol (+ repeats) ---------------
        is_ln = active & (mode == _M_LENS)
        win3, winb3 = win_at(bitpos)
        lb3 = bitpos - winb3
        peek7 = rd(win3, lb3, 7)
        csym, clen = _decode_sym(peek7, *clt, 7)
        ln_err = is_ln & (clen == 0)
        rep_bits = jnp.where(csym == 16, 2,
                             jnp.where(csym == 17, 3,
                                       jnp.where(csym == 18, 7, 0)))
        ext = rd(win3, lb3 + clen, 7)
        extv = ext & ((1 << jnp.clip(rep_bits, 0, 7)) - 1)
        rep = jnp.where(csym == 16, 3 + extv,
                        jnp.where(csym == 17, 3 + extv,
                                  jnp.where(csym == 18, 11 + extv, 1)))
        val = jnp.where(csym < 16, csym,
                        jnp.where(csym == 16, prevlen, 0))
        total = hlit + hdist
        ln_err |= is_ln & ((pos + rep > total) | ((csym == 16) & (pos == 0)))
        do_ln = is_ln & ~ln_err
        Larr = jnp.where(
            do_ln[:, None] & (liot >= pos[:, None])
            & (liot < (pos + rep)[:, None]),
            val[:, None], Larr)
        prevlen = jnp.where(do_ln & (csym < 16), csym,
                            jnp.where(do_ln & (csym == 16), prevlen,
                                      jnp.where(do_ln, 0, prevlen)))
        bitpos = jnp.where(do_ln, bitpos + clen + rep_bits, bitpos)
        pos = jnp.where(do_ln, pos + rep, pos)
        lens_done = do_ln & (pos >= total)
        mode = jnp.where(lens_done, _M_BUILD, mode)
        pos = jnp.where(lens_done, 1, pos)      # build kind: lit/dist
        err = err | blk_err | ln_err

        # ---- M_SYM: up to _T symbols from one window ------------------
        win4, winb4 = win_at(bitpos)
        for _t in range(_T):
            lb4 = bitpos - winb4
            can = active & (mode == _M_SYM) & (lb4 + _NEED <= _WIN * 8)
            peek15 = rd(win4, jnp.clip(lb4, 0, _WIN * 8 - 17), 15)
            lsym, llen = _decode_sym(peek15, *litt, 15)
            s_err = can & (llen == 0)
            bits1 = lb4 + llen

            is_lit = lsym < 256
            is_eob = lsym == 256
            is_len = lsym > 256
            s_err |= can & is_len & (lsym > 285)
            li = jnp.clip(lsym - 257, 0, 28)
            lext = jnp.take(lextra, li)
            lval = jnp.take(lbase, li) + (
                rd(win4, jnp.clip(bits1, 0, _WIN * 8 - 17), 5)
                & ((1 << jnp.clip(lext, 0, 5)) - 1))
            bits2 = bits1 + lext
            dpeek = rd(win4, jnp.clip(bits2, 0, _WIN * 8 - 17), 15)
            dsym, dlen = _decode_sym(dpeek, *dstt, 15)
            s_err |= can & is_len & ((dlen == 0) | (dsym > 29))
            di = jnp.clip(dsym, 0, 29)
            dext = jnp.take(dextra, di)
            bits3 = bits2 + dlen
            dloraw = rd(win4, jnp.clip(bits3, 0, _WIN * 8 - 17), 13)
            dval = jnp.take(dbase, di) + (
                dloraw & ((1 << jnp.clip(dext, 0, 13)) - 1))
            bits4 = bits3 + dext

            adv = jnp.where(is_lit | is_eob, llen,
                            bits4 - lb4)
            nbp = bitpos + adv
            s_err |= can & (nbp > csizes * 8)
            mlen = jnp.where(is_len, lval, 1)
            s_err |= can & is_len & ((dval > op) | (op + mlen > out_len))
            s_err |= can & is_lit & (op >= out_len)

            good = can & ~s_err
            evk = jnp.where(is_lit, 1, jnp.where(is_len, 2, 0))
            ek_l.append(jnp.where(good & (evk > 0), evk, -1))
            ea_l.append(jnp.where(is_lit, lsym, dval))
            ed_l.append(op)
            el_l.append(mlen)

            op = jnp.where(good, op + jnp.where(is_eob, 0, mlen), op)
            bitpos = jnp.where(good, nbp, bitpos)
            mode = jnp.where(good & is_eob, _M_BLK, mode)
            fin = fin | (good & is_eob & (final == 1))
            err = err | s_err

        rows = tuple(jnp.stack(ls, axis=1)
                     for ls in (ek_l, ea_l, ed_l, el_l))
        carry = (bitpos, mode, final, hlit, hdist, hclen, clidx, pos,
                 prevlen, op, err, fin, Larr, clt, litt, dstt)
        return carry, rows

    def cond(st):
        kslot, carry = st[4], st[5:]
        return jnp.any(~(carry[10] | carry[11])) & (kslot < nchunks)

    def body(st):
        ef, kslot = st[:4], st[4]
        carry, rows = jax.lax.scan(inner, st[5:], None, length=_KCH)
        ef = tuple(
            jax.lax.dynamic_update_slice(
                f, jnp.moveaxis(r, 0, 1).reshape(R, _KCH * _T),
                (0, kslot * _KCH * _T))
            for f, r in zip(ef, rows))
        return ef + (kslot + 1,) + carry

    z = jnp.zeros((R,), I32)
    ztab = (jnp.zeros((R, 8), I32), jnp.zeros((R, 8), I32),
            jnp.zeros((R, 8), I32), jnp.zeros((R, 19), I32))
    ztab15 = (jnp.zeros((R, 16), I32), jnp.zeros((R, 16), I32),
              jnp.zeros((R, 16), I32), jnp.zeros((R, 288), I32))
    ztab15d = (jnp.zeros((R, 16), I32), jnp.zeros((R, 16), I32),
               jnp.zeros((R, 16), I32), jnp.zeros((R, 30), I32))

    # zlib container header (RFC 1950): CM must be 8, FDICT unsupported
    cmf = srci[:, 0]
    flg = srci[:, 1]
    hdr_err = ((cmf & 0xF) != 8) | ((flg & 0x20) != 0) | (csizes < 8)

    st = jax.lax.while_loop(
        cond, body,
        (ek0, ea0, ed0, el0, jnp.int32(0),
         # bitpos mode final hlit hdist hclen clidx pos prevlen op
         z + 16, z + _M_BLK, z, z, z, z, z, z, z, z,
         hdr_err | (csizes <= 0), csizes <= 0,
         jnp.zeros((R, _LMAX), I32), ztab, ztab15, ztab15d))
    ef = st[:4]
    op, err, fin = st[14], st[15], st[16]
    err = err | ~(err | fin)
    ok = ~err & (op == out_len)
    return _events_to_records(slots, ef, ok, out_len)


def _bdim(flag, a):
    """Broadcast a (R,) flag against a's trailing dims."""
    return flag.reshape(flag.shape + (1,) * (a.ndim - 1))


def _events_to_records(slots, ef, ok, out_len: int):
    """Compact literal events into the tape; build placement records
    (field-tuple form — see structured._walk_batch on why records never
    materialize as (R, E, 4) arrays)."""
    kind, val, dst, ln = ef
    R, E = kind.shape
    seq = jnp.arange(E, dtype=I32)[None, :]
    is_lit = kind == 1
    is_mat = kind == 2

    # tape: literal bytes in event order (events are emitted in output
    # order, so this IS output order)
    tkey = jnp.where(is_lit, (seq << 9) | val, jnp.int32(1 << 28))
    tsort = jax.lax.sort(tkey, dimension=1)
    tape = (tsort & 0xFF).astype(U8)
    tlen = jnp.sum(is_lit.astype(I32), axis=1)
    tpos = jnp.cumsum(is_lit.astype(I32), axis=1) - 1   # tape idx per lit

    # literal runs: consecutive lit events with contiguous dst
    prev_lit = jnp.concatenate([jnp.zeros((R, 1), bool), is_lit[:, :-1]],
                               axis=1)
    prev_dst = jnp.concatenate([jnp.full((R, 1), -9, I32), dst[:, :-1]],
                               axis=1)
    run_start = is_lit & ~(prev_lit & (prev_dst + 1 == dst))
    # run length: distance to the next run boundary among literal events
    # = (next start's tape pos) - (this start's tape pos)
    nxt = jnp.where(run_start, tpos, jnp.int32(1 << 28))
    nxt_start_t = jnp.flip(jax.lax.cummin(jnp.flip(
        jnp.concatenate([nxt[:, 1:], jnp.full((R, 1), 1 << 28, I32)],
                        axis=1), 1), axis=1), 1)
    runlen = jnp.where(run_start,
                       jnp.minimum(nxt_start_t, tlen[:, None]) - tpos, 0)

    rk = jnp.where(run_start, 0, jnp.where(is_mat, 1, -1))
    ra = jnp.where(run_start, tpos, val)
    rl = jnp.where(run_start, runlen, ln)
    rf = (rk, ra, dst, rl)

    # uniform-distance summary for the sort-machine path
    d0 = jnp.max(jnp.where(is_mat, val, 0), axis=1)
    uni = jnp.all(~is_mat | (val == d0[:, None]), axis=1)
    return tape, tlen, rf, d0, uni, ok


def _place(tape, tlen, rf, dist, uni, ok, out_len: int):
    """Placement over the tape: sort machine for uniform-distance rows,
    expand kernel (TPU / interpret) otherwise."""
    valid = rf[0] >= 0
    use_kernel = structured.use_expand_kernel()
    sort_ok = (out_len <= structured.MAX_OUT)

    def sort_place(_):
        return structured._place_and_fill(
            tape, tlen, rf, valid, dist, uni, ok, out_len)

    def kern_place(_):
        out = structured.kernel_place_rows(
            tape, rf, ok, out_len, tape.shape[1])
        return out, ok

    if use_kernel and not sort_ok:
        return kern_place(None)
    if not use_kernel:
        if not sort_ok:
            return (jnp.zeros((tape.shape[0], out_len), U8),
                    jnp.zeros((tape.shape[0],), bool))
        out, handled = sort_place(None)
        return out, handled
    # kernel available AND sort machine applicable: uniform rows take
    # the cheaper sort machine as a group, mixed rows the kernel
    return jax.lax.cond(
        jnp.all(~ok | (uni & (dist < structured.MAX_DIST))),
        sort_place, kern_place, None)


def default_events(out_len: int) -> int:
    """Default event budget: shuffled typed data deflates to long
    matches (~258 B/symbol) plus modest literal stretches; foreign
    literal-dense streams overflow and retry via high_events."""
    return out_len // 16 + 512


def high_events(out_len: int) -> int:
    """Escalated budget: a conforming stream emits at most one event per
    output byte (every literal is one byte, every match >= 3)."""
    return out_len + out_len // 16 + 512


@partial(jax.jit, static_argnums=(2, 3))
def decode(slots: jax.Array, csizes: jax.Array, out_len: int,
           maxev_hint: int = 0):
    """Decode batched zlib streams on device.

    Same contract as codec.decode: (out (N, out_len) u8, produced, err).
    Rows the FSM cannot handle (stored blocks, dictionaries, event
    overflow, unplaceable geometries) report err — the byte API retries
    once with high_events and then falls back to the host engines.
    """
    N, W = slots.shape
    if out_len > structured.decode_cap() or out_len < 8:
        return (jnp.zeros((N, out_len), U8), jnp.zeros((N,), I32),
                csizes > 0)
    # window reads need headroom past the stream end
    slots = jnp.pad(slots, ((0, 0), (0, _WIN)))
    maxev = maxev_hint or default_events(out_len)
    group = structured._group_rows(out_len, maxev)

    def run(sl, cs):
        tape, tlen, rf, dist, uni, ok = _fsm_walk(sl, cs, out_len, maxev)
        out, handled = _place(tape, tlen, rf, dist, uni, ok, out_len)
        return out, handled

    if N <= group:
        out, handled = run(slots, csizes)
    else:
        order = jnp.argsort(csizes)
        inv = jnp.argsort(order)
        sl = jnp.take(slots, order, axis=0)
        cs = jnp.take(csizes, order)
        pad = (-N) % group
        if pad:
            sl = jnp.pad(sl, ((0, pad), (0, 0)))
            cs = jnp.pad(cs, (0, pad))
        g = sl.shape[0] // group
        out, handled = jax.lax.map(
            lambda t: run(t[0], t[1]),
            (sl.reshape(g, group, sl.shape[1]), cs.reshape(g, group)))
        out = jnp.take(out.reshape(-1, out_len)[:N], inv, axis=0)
        handled = jnp.take(handled.reshape(-1)[:N], inv)
    produced = jnp.where(handled, out_len, 0)
    return out, produced, ~handled
