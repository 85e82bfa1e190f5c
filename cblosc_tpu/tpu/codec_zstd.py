"""Device zstd decoder: batched frame FSM + record placement.

The reference wraps zstd with one-shot ZSTD_compress/ZSTD_decompress
(blosc/blosc.c:498-522); each split stream is a complete zstd frame
(RFC 8878). This module decodes those frames on device, completing the
stage-6 decode-side coverage (blosclz/LZ4/snappy/zlib/zstd); encoding
stays host-side exactly as the reference's external-library wrapper.

Architecture (the zlib decoder's walk/tape/place split, tpu/codec_zlib.py,
adapted to zstd's three-stream layout):

  1. FSM WALK — a batched ``lax.while_loop``; modes cover the frame
     header, block headers, literals headers, Huffman tree descriptions
     (direct 4-bit weights AND FSE-compressed weights), FSE table
     descriptions (one normalized count per iteration), vectorized
     table builds behind group-level conds, 4-stream backward Huffman
     literal decode (8 symbols per iteration), and backward interleaved
     FSE sequence decode (one sequence per iteration, full repeat-offset
     semantics). Forward and backward bitstreams share one window-gather
     bit reader: zstd writes values LSB-first at increasing bit
     positions, so a backward read of n bits below the cursor returns
     values exactly as written (RFC 8878 3.1.1.2).
  2. TAPE + RECORDS — Huffman-decoded literals become per-byte tape
     events compacted by ONE sort (they are the only literals that exist
     nowhere in the stream); RAW literal runs and RAW blocks reference
     the original stream bytes directly; RLE literals/blocks become a
     1-byte literal plus a distance-1 match. Sequences then emit
     ordinary placement records against the concatenated [tape | stream]
     byte source, which the Pallas expand kernel materializes
     (interpret mode on CPU legs).

Scope: dictionaries are rejected with err (blosc never produces them);
content checksums are skipped, not verified (format validation lives in
the chunk layer). Cost-model honesty: like DEFLATE, zstd decode is
bit-serial per stream — one sequence or 8 Huffman literal bytes per
batched iteration — so shuffled typed data (long matches) decodes at
GB/s-class rates while literal-dense streams exist for completeness and
fall back by event budget (see codec_zlib.py's identical note).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import structured
from ..ops.codecs import zstd_ref

I32 = jnp.int32
U8 = jnp.uint8

_KCH = 4            # FSM iterations per scan chunk
_WIN = 16           # bit-reader window bytes (128 bits)
_FWD = 24           # forward header window bytes
_NLANES = 18        # event lanes per iteration (sum of all modes' emits)

# FSM modes
(_M_FRAME, _M_BLK, _M_LITHDR, _M_HUFHDR, _M_HUFW_DIR, _M_NCOUNT,
 _M_FSEBUILD, _M_HUFW_FSE, _M_HUFBUILD, _M_LITSETUP, _M_LITDEC,
 _M_SEQHDR, _M_SEQTABS, _M_SEQINIT, _M_SEQDEC, _M_BLKEND,
 _M_DONE) = range(17)

# sequence-code value tables (RFC 8878 3.1.1.3.2.1), shared with the
# oracle decoder so both stay pinned to one constant set
_LL_BITS = np.asarray(zstd_ref.LL_BITS, np.int32)
_LL_BASE = np.asarray(zstd_ref.LL_BASE, np.int32)
_ML_BITS = np.asarray(zstd_ref.ML_BITS, np.int32)
_ML_BASE = np.asarray(zstd_ref.ML_BASE, np.int32)

_FSE_PAD = 512          # LL/ML: 2^9 max; OF 2^8; weights 2^6
_NC_CAP = 64            # normalized-count scratch symbols (ML needs 53)

_MAXSYM = (255, 35, 31, 52)        # per tid: hufw, LL, OF, ML
_MAXLOG = (6, 9, 8, 9)


def _predef_np(which: str):
    """Predefined FSE decode tables as numpy constants (3.1.1.3.2.2),
    built by the same oracle code the tests validate."""
    dist, log = {"ll": (zstd_ref._LL_DEFAULT, 6),
                 "ml": (zstd_ref._ML_DEFAULT, 6),
                 "of": (zstd_ref._OF_DEFAULT, 5)}[which]
    sym, nb, base = zstd_ref.build_fse_table(dist, log)
    size = 1 << log
    pad = _FSE_PAD - size
    return (np.pad(np.asarray(sym, np.int32), (0, pad)),
            np.pad(np.asarray(nb, np.int32), (0, pad)),
            np.pad(np.asarray(base, np.int32), (0, pad)),
            log)


_PRE = {"ll": _predef_np("ll"), "of": _predef_np("of"),
        "ml": _predef_np("ml")}


def _hb(x):
    """floor(log2(max(x, 1))) without float roundtrips."""
    r = jnp.zeros_like(x)
    for k in range(1, 21):
        r = r + (x >= (1 << k)).astype(x.dtype)
    return r


# ---------------------------------------------------------------------------
# vectorized table builds (behind group-level conds in the FSM)
# ---------------------------------------------------------------------------


def _fse_build(counts, acclog):
    """Vectorized FSE decode-table build (4.1.1). counts (R, _NC_CAP)
    i32 with -1 lowprob; acclog (R,). Returns (sym, nb, base) each
    (R, _FSE_PAD) i32 plus err (R,).

    The reference algorithm's skip-walk spread vectorizes exactly: the
    visit sequence p_k = k*step mod size covers every cell once (step is
    odd), lowprob symbols pre-occupy the top cells, and the k-th visit
    that lands at or below highThreshold receives the k-th symbol
    occurrence — so rank/searchsorted arithmetic plus one position sort
    reproduces the sequential fill."""
    R = counts.shape[0]
    size = (1 << acclog)[:, None]
    cell = jnp.arange(_FSE_PAD, dtype=I32)[None, :]
    scount = jnp.arange(_NC_CAP, dtype=I32)[None, :]
    nlow = jnp.sum((counts == -1).astype(I32), axis=1)
    high = size - 1 - nlow[:, None]

    # lowprob cells: i-th lowprob symbol sits at cell size-1-i
    lowrank = jnp.cumsum((counts == -1).astype(I32), axis=1) - 1
    lkey = jnp.where(counts == -1, lowrank * 256 + scount, 1 << 24)
    lsym = jax.lax.sort(lkey, dimension=1) % 256
    lsym_p = jnp.pad(lsym, ((0, 0), (0, _FSE_PAD - _NC_CAP)))
    low_at_cell = jnp.take_along_axis(
        lsym_p, jnp.clip(size - 1 - cell, 0, _FSE_PAD - 1), axis=1)

    # spread
    step = (size >> 1) + (size >> 3) + 3
    pk = (cell * step) & (size - 1)
    live = (cell < size) & (pk <= high)
    rank = jnp.cumsum(live.astype(I32), axis=1) - 1
    cpos = jnp.cumsum(jnp.maximum(counts, 0), axis=1)
    sym_of = jnp.zeros((R, _FSE_PAD), I32)
    for s in range(_NC_CAP):
        sym_of = sym_of + (rank >= cpos[:, s:s + 1]).astype(I32)
    skey = jnp.where(live, pk * 256 + jnp.clip(sym_of, 0, 255), 1 << 24)
    ssorted = jax.lax.sort(skey, dimension=1)
    filled = ssorted < (1 << 24)
    sym = jnp.where(cell > high, low_at_cell,
                    jnp.where(filled, ssorted % 256, 0))
    err = jnp.sum(live.astype(I32), axis=1) != jnp.sum(
        jnp.maximum(counts, 0), axis=1)

    # per-cell nextState: occurrence index within the symbol in TABLE
    # order (sort cells by (sym, cell))
    okey = jnp.where(cell < size, sym * 4096 + cell, 1 << 24)
    osort, ocell = jax.lax.sort(
        (okey, jnp.broadcast_to(cell, (R, _FSE_PAD))), dimension=1,
        num_keys=1)
    osym = jnp.clip(osort // 4096, 0, _FSE_PAD - 1)
    newsym = jnp.concatenate(
        [jnp.ones((R, 1), bool), osym[:, 1:] != osym[:, :-1]], axis=1)
    grpstart = jax.lax.cummax(jnp.where(newsym, cell, 0), axis=1)
    occ = cell - grpstart
    ncount = jnp.where(counts == -1, 1, jnp.maximum(counts, 0))
    ncount_p = jnp.pad(ncount, ((0, 0), (0, _FSE_PAD - _NC_CAP)))
    base_cnt = jnp.take_along_axis(ncount_p, osym, axis=1)
    nstate = jnp.maximum(base_cnt + occ, 1)
    nb_s = jnp.clip(acclog[:, None] - _hb(nstate), 0, 16)
    base_s = (nstate << nb_s) - size
    invalid = osort >= (1 << 24)
    inv = jnp.argsort(ocell, axis=1)
    nb = jnp.take_along_axis(jnp.where(invalid, 0, nb_s), inv, axis=1)
    base = jnp.take_along_axis(jnp.where(invalid, 0, base_s), inv,
                               axis=1)
    return sym, nb, base, err


def _huf_build(warr, nw):
    """Vectorized Huffman decode-table build (4.2.1). warr (R, 256)
    holds weights for symbols 0..nw-1; the last symbol's weight is
    implied by the power-of-2 completion. Decode peeks K bits v: the
    weight-w region covers [hbase_w, hbase_w + cnt_w << (w-1)) in
    table space with code length K+1-w; symtab is ordered by
    (weight, symbol) ascending — the reference fill order
    (zstd_ref.build_huffman_table)."""
    R = warr.shape[0]
    sidx = jnp.arange(256, dtype=I32)[None, :]
    w_known = jnp.where(sidx < nw[:, None], warr, 0)
    total0 = jnp.sum(
        jnp.where(w_known > 0, 1 << jnp.clip(w_known - 1, 0, 11), 0),
        axis=1)
    K = _hb(jnp.maximum(total0, 1)) + 1
    rest = (1 << K) - total0
    wlast = _hb(jnp.maximum(rest, 1)) + 1
    err = (total0 < 1) | (rest < 1) | ((rest & (rest - 1)) != 0) | (
        K > 11) | (nw > 255) | jnp.any(w_known > 11, axis=1)
    weights = jnp.where(sidx == nw[:, None], wlast[:, None], w_known)
    weights = jnp.where(sidx <= nw[:, None], weights, 0)

    cnt = jnp.stack(
        [jnp.sum((weights == w).astype(I32), axis=1) for w in range(12)],
        axis=1)
    spans = cnt * (1 << jnp.maximum(
        jnp.arange(12, dtype=I32)[None, :] - 1, 0))
    spans = spans.at[:, 0].set(0)
    hbase = jnp.cumsum(spans, axis=1) - spans
    hoffs = jnp.concatenate(
        [jnp.zeros((R, 1), I32),
         jnp.cumsum(cnt[:, 1:], axis=1) - cnt[:, 1:]], axis=1)
    key = jnp.where(weights > 0, weights * 256 + sidx, (1 << 24) + sidx)
    hsymtab = jax.lax.sort(key, dimension=1) % 256
    return K, hbase, cnt, hoffs, hsymtab, err


def _huf_decode(peek11, K, hbase, hcnt, hoffs, hsymtab):
    """One Huffman symbol from an 11-bit peek ending at the cursor
    (value = bits [p-11, p) LSB-first, zeros below the stream start).
    Returns (sym, nbits); nbits 0 marks invalid codes."""
    v = peek11 >> jnp.clip(11 - K, 0, 11)
    sym = jnp.zeros_like(peek11)
    nb = jnp.zeros_like(peek11)
    found = jnp.zeros(peek11.shape, bool)
    for w in range(1, 12):
        span = hcnt[:, w] << (w - 1)
        inr = (~found & (hcnt[:, w] > 0) & (v >= hbase[:, w])
               & (v < hbase[:, w] + span) & (w <= K))
        idx = hoffs[:, w] + ((v - hbase[:, w]) >> (w - 1))
        sym = jnp.where(inr, jnp.take_along_axis(
            hsymtab, jnp.clip(idx, 0, 255)[:, None], axis=1)[:, 0], sym)
        nb = jnp.where(inr, K + 1 - w, nb)
        found |= inr
    return sym, nb


# ---------------------------------------------------------------------------
# the FSM walk
# ---------------------------------------------------------------------------


def _fsm_walk(slots, csizes, out_len: int, maxev: int):
    """Parse a batch of zstd frames into (event fields, ok)."""
    R, W = slots.shape
    srci = slots.astype(I32)
    nchunks = -(-maxev // (_NLANES * _KCH))
    E = nchunks * _NLANES * _KCH

    lanef = jnp.arange(_FWD, dtype=I32)[None, :]
    lanew = jnp.arange(_WIN, dtype=I32)[None, :]
    TW = out_len

    llb = jnp.asarray(_LL_BITS)
    lla = jnp.asarray(_LL_BASE)
    mlb = jnp.asarray(_ML_BITS)
    mla = jnp.asarray(_ML_BASE)

    def fwin(bytepos):
        """(R, _FWD) forward window starting at bytepos (clamped)."""
        b0 = jnp.clip(bytepos, 0, max(W - _FWD, 0))
        return jnp.take_along_axis(srci, b0[:, None] + lanef, axis=1), b0

    def fbyte_w(win, b0, p):
        """byte at absolute position p from window (win, b0)."""
        lanes = jnp.arange(win.shape[1], dtype=I32)[None, :]
        return jnp.sum(
            jnp.where(
                lanes == jnp.clip(p - b0, 0, win.shape[1] - 1)[:, None],
                win, 0), axis=1)

    def bwin(bitpos):
        """(R, _WIN) window ENDING at byte ceil(bitpos/8) (clamped),
        for backward reads at bit cursor bitpos."""
        b1 = jnp.clip((bitpos + 7) >> 3, _WIN, W)
        b0 = b1 - _WIN
        return (jnp.take_along_axis(srci, b0[:, None] + lanew, axis=1),
                b0 << 3)

    def rdbits(win, lb, n: int):
        """n (static, <= 25) LSB-first bits at window-local bit offset
        lb (traced, must be >= 0)."""
        lbc = jnp.clip(lb, 0, win.shape[1] * 8 - 1)
        lbyte = lbc >> 3
        L = win.shape[1]
        lanes = jnp.arange(L, dtype=I32)[None, :]
        sel = (lanes >= lbyte[:, None]) & (lanes < lbyte[:, None] + 4)
        sh = jnp.clip((lanes - lbyte[:, None]) * 8, 0, 24)
        v = jnp.sum(jnp.where(sel, win << sh, 0), axis=1)
        return (v >> (lbc & 7)) & ((1 << n) - 1)

    def rback(bitpos, n):
        """bits [bitpos-n, bitpos) with n traced <= 25; bits below the
        stream start read as zero (zstd's register-refill margin)."""
        w, wbits = bwin(bitpos)
        lb = bitpos - n - wbits
        neg = jnp.clip(-lb, 0, 25)
        v = rdbits(w, jnp.maximum(lb, 0), 25)
        v = jnp.where(lb < 0, (v << neg) & 0x1FFFFFF, v)
        return v & ((1 << jnp.clip(n, 0, 25)) - 1)

    def peek_back(bitpos, k: int):
        """bits [bitpos-k, bitpos) for a static k (Huffman peek)."""
        w, wbits = bwin(bitpos)
        lb = bitpos - k - wbits
        neg = jnp.clip(-lb, 0, k)
        v = rdbits(w, jnp.maximum(lb, 0), k)
        return jnp.where(lb < 0, (v << neg) & ((1 << k) - 1), v)

    def inner(carry, _):
        c = dict(carry)
        ev_k, ev_a, ev_d, ev_l = [], [], [], []
        z = jnp.zeros((R,), I32)
        zb = jnp.zeros((R,), bool)

        def emit(k, a, d, ln):
            ev_k.append(k)
            ev_a.append(a * jnp.ones((R,), I32))
            ev_d.append(d * jnp.ones((R,), I32))
            ev_l.append(ln * jnp.ones((R,), I32))

        active = ~(c["err"] | c["fin"])
        pos = c["pos"]
        mode = c["mode"]
        mode0 = mode        # blocks gate on the ITERATION-START mode:
        # a transition must not chain into a later block in the same
        # iteration, whose forward window is anchored at the old pos
        err = c["err"]
        fw, fb = fwin(pos)

        def fbyte(off):
            return fbyte_w(fw, fb, pos + off)

        # =============== M_FRAME ======================================
        is_fr = active & (mode0 == _M_FRAME)
        magic = (fbyte(0) | (fbyte(1) << 8) | (fbyte(2) << 16)
                 | (fbyte(3) << 24))
        fhd = fbyte(4)
        single = (fhd >> 5) & 1
        fr_err = is_fr & (
            (magic != jnp.int32(0xFD2FB528 - (1 << 32)))
            | ((fhd & 8) != 0) | ((fhd & 3) != 0))      # dict unsupported
        fcs_flag = (fhd >> 6) & 3
        fcs_len = jnp.where(fcs_flag == 0, single,
                            jnp.where(fcs_flag == 1, 2,
                                      jnp.where(fcs_flag == 2, 4, 8)))
        pos = jnp.where(is_fr & ~fr_err, 5 + (1 - single) + fcs_len, pos)
        mode = jnp.where(is_fr & ~fr_err, _M_BLK, mode)
        err = err | fr_err

        # =============== M_BLK ======================================== 3 lanes
        is_blk = active & (mode0 == _M_BLK)
        bh = fbyte(0) | (fbyte(1) << 8) | (fbyte(2) << 16)
        blast = bh & 1
        btype = (bh >> 1) & 3
        bsize = bh >> 3
        blk_err = is_blk & ((btype == 3) | (pos + 3 > c["cs"]))
        c["last"] = jnp.where(is_blk, blast, c["last"])
        op = c["op"]

        is_raw = is_blk & ~blk_err & (btype == 0)
        blk_err |= is_raw & ((op + bsize > out_len)
                             | (pos + 3 + bsize > c["cs"]))
        emit(jnp.where(is_raw & ~blk_err & (bsize > 0), 3, -1),
             TW + pos + 3, op, bsize)
        is_rle = is_blk & ~blk_err & (btype == 1)
        blk_err |= is_rle & ((op + bsize > out_len)
                             | (pos + 4 > c["cs"]) | (bsize < 1))
        emit(jnp.where(is_rle & ~blk_err, 3, -1), TW + pos + 3, op, 1)
        emit(jnp.where(is_rle & ~blk_err & (bsize > 1), 2, -1), 1,
             op + 1, bsize - 1)
        is_cmp = is_blk & ~blk_err & (btype == 2)
        blk_err |= is_cmp & ((pos + 3 + bsize > c["cs"]) | (bsize < 2))

        c["op"] = jnp.where((is_raw | is_rle) & ~blk_err, op + bsize, op)
        c["bend"] = jnp.where(is_cmp & ~blk_err, pos + 3 + bsize,
                              c["bend"])
        pos = jnp.where(is_raw & ~blk_err, pos + 3 + bsize,
                        jnp.where(is_rle & ~blk_err, pos + 4,
                                  jnp.where(is_cmp & ~blk_err, pos + 3,
                                            pos)))
        done_blk = (is_raw | is_rle) & ~blk_err & (c["last"] == 1)
        mode = jnp.where(
            is_blk & ~blk_err,
            jnp.where(is_cmp, _M_LITHDR,
                      jnp.where(c["last"] == 1, _M_DONE, _M_BLK)), mode)
        c["fin"] = c["fin"] | done_blk
        err = err | blk_err

        # =============== M_LITHDR =====================================
        is_lh = active & (mode0 == _M_LITHDR)
        b0 = fbyte(0)
        lt = b0 & 3
        sf = (b0 >> 2) & 3
        rawrle = lt <= 1
        rs_rr = jnp.where((sf & 1) == 0, b0 >> 3,
                          jnp.where(sf == 1,
                                    (b0 >> 4) | (fbyte(1) << 4),
                                    (b0 >> 4) | (fbyte(1) << 4)
                                    | (fbyte(2) << 12)))
        h_rr = jnp.where((sf & 1) == 0, 1, jnp.where(sf == 1, 2, 3))
        rs_c = jnp.where(sf <= 1, (b0 >> 4) | ((fbyte(1) & 0x3F) << 4),
                         jnp.where(sf == 2,
                                   (b0 >> 4) | (fbyte(1) << 4)
                                   | ((fbyte(2) & 3) << 12),
                                   (b0 >> 4) | (fbyte(1) << 4)
                                   | ((fbyte(2) & 0x3F) << 12)))
        cs_c = jnp.where(sf <= 1, (fbyte(1) >> 6) | (fbyte(2) << 2),
                         jnp.where(sf == 2,
                                   (fbyte(2) >> 2) | (fbyte(3) << 6),
                                   (fbyte(2) >> 6) | (fbyte(3) << 2)
                                   | (fbyte(4) << 10)))
        h_c = jnp.where(sf <= 1, 3, jnp.where(sf == 2, 4, 5))
        nstreams = jnp.where(sf == 0, 1, 4)

        c["ltype"] = jnp.where(is_lh, lt, c["ltype"])
        rsz = jnp.where(rawrle, rs_rr, rs_c)
        c["lrsz"] = jnp.where(is_lh, rsz, c["lrsz"])
        c["lpos"] = jnp.where(is_lh, 0, c["lpos"])
        lh_err = is_lh & (rsz > out_len)
        c["lsrc"] = jnp.where(is_lh & rawrle, pos + h_rr, c["lsrc"])
        adv_rr = jnp.where(lt == 0, h_rr + rs_rr, h_rr + 1)
        lcend = pos + h_c + cs_c
        c["lcend"] = jnp.where(is_lh & ~rawrle, lcend, c["lcend"])
        lh_err |= is_lh & ~rawrle & ((lcend > c["bend"]) | (cs_c < 1))
        lh_err |= is_lh & rawrle & (pos + adv_rr > c["bend"])
        lh_err |= is_lh & (lt == 3) & (c["hK"] == 0)
        pos = jnp.where(is_lh & ~lh_err,
                        jnp.where(rawrle, pos + adv_rr, pos + h_c), pos)
        mode = jnp.where(
            is_lh & ~lh_err,
            jnp.where(rawrle, _M_SEQHDR,
                      jnp.where(lt == 2, _M_HUFHDR, _M_LITSETUP)), mode)
        c["nstr"] = jnp.where(is_lh, nstreams, c["nstr"])
        err = err | lh_err

        # =============== M_HUFHDR =====================================
        is_hh = active & (mode0 == _M_HUFHDR)
        hby = fbyte(0)
        direct = hby >= 128
        c["nw"] = jnp.where(is_hh & direct, hby - 127, c["nw"])
        c["widx"] = jnp.where(is_hh, 0, c["widx"])
        c["warr"] = jnp.where(is_hh[:, None], 0, c["warr"])
        hh_err = is_hh & ~direct & (
            (pos + 1 + hby > c["lcend"]) | (hby < 1))
        c["hwend"] = jnp.where(is_hh & ~direct, pos + 1 + hby,
                               c["hwend"])
        c["ncbp"] = jnp.where(is_hh & ~direct, (pos + 1) * 8, c["ncbp"])
        c["tid"] = jnp.where(is_hh & ~direct, 0, c["tid"])
        c["ncnum"] = jnp.where(is_hh & ~direct, -1, c["ncnum"])
        pos = jnp.where(is_hh & ~hh_err, pos + 1, pos)
        mode = jnp.where(
            is_hh & ~hh_err,
            jnp.where(direct, _M_HUFW_DIR, _M_NCOUNT), mode)
        err = err | hh_err

        # =============== M_HUFW_DIR ===================================
        is_hd = active & (mode0 == _M_HUFW_DIR)
        sidx = jnp.arange(256, dtype=I32)[None, :]
        # window anchored at the current nibble pair (weights may span
        # up to 128 bytes — beyond the header window)
        dwin, dwb = fwin(pos + (c["widx"] >> 1))
        for i in range(8):
            wb_ = fbyte_w(dwin, dwb, pos + ((c["widx"] + i) >> 1))
            nib = jnp.where(((c["widx"] + i) & 1) == 0, wb_ >> 4,
                            wb_ & 0xF)
            put = is_hd & (c["widx"] + i < c["nw"])
            c["warr"] = jnp.where(
                put[:, None] & (sidx == (c["widx"] + i)[:, None]),
                nib[:, None], c["warr"])
        done_hd = is_hd & (c["widx"] + 8 >= c["nw"])
        c["widx"] = jnp.where(is_hd, c["widx"] + 8, c["widx"])
        pos = jnp.where(done_hd, pos + ((c["nw"] + 1) >> 1), pos)
        mode = jnp.where(done_hd, _M_HUFBUILD, mode)

        # =============== M_NCOUNT =====================================
        is_nc = active & (mode0 == _M_NCOUNT)
        maxsym = jnp.take(jnp.asarray(_MAXSYM, I32),
                          jnp.clip(c["tid"], 0, 3))
        maxlog = jnp.take(jnp.asarray(_MAXLOG, I32),
                          jnp.clip(c["tid"], 0, 3))
        ncw, ncwb = fwin(c["ncbp"] >> 3)
        nclb = c["ncbp"] - (ncwb << 3)
        # entry: read the accuracy log
        nc_in = is_nc & (c["ncnum"] == -1)
        acc = rdbits(ncw, nclb, 4) + 5
        nc_err = nc_in & (acc > maxlog)
        c["nclog"] = jnp.where(nc_in, acc, c["nclog"])
        c["ncrem"] = jnp.where(nc_in, (1 << acc) + 1, c["ncrem"])
        c["ncthr"] = jnp.where(nc_in, 1 << acc, c["ncthr"])
        c["ncbits"] = jnp.where(nc_in, acc + 1, c["ncbits"])
        c["ncp0"] = jnp.where(nc_in, 0, c["ncp0"])
        c["ncounts"] = jnp.where(nc_in[:, None], 0, c["ncounts"])
        c["ncbp"] = jnp.where(nc_in & ~nc_err, c["ncbp"] + 4, c["ncbp"])
        c["ncnum"] = jnp.where(nc_in & ~nc_err, 0, c["ncnum"])

        nc_go = is_nc & ~nc_in & (c["ncrem"] > 1) & (
            c["ncnum"] <= maxsym)
        ncw2, ncwb2 = fwin(c["ncbp"] >> 3)
        nclb2 = c["ncbp"] - (ncwb2 << 3)
        cidx = jnp.arange(_NC_CAP, dtype=I32)[None, :]
        # zero-run repeat flags (2 bits each, up to 8 groups/iteration)
        is_rep = nc_go & (c["ncp0"] == 1)
        reps = z
        rbits = z
        stop_rep = zb
        for i in range(8):
            fl = rdbits(ncw2, nclb2 + rbits, 2)
            takei = is_rep & ~stop_rep
            reps = jnp.where(takei, reps + fl, reps)
            rbits = jnp.where(takei, rbits + 2, rbits)
            stop_rep = stop_rep | (fl < 3)
        nc_err |= is_rep & ~stop_rep
        c["ncnum"] = jnp.where(is_rep, c["ncnum"] + reps, c["ncnum"])
        c["ncbp"] = jnp.where(is_rep, c["ncbp"] + rbits, c["ncbp"])
        c["ncp0"] = jnp.where(is_rep & stop_rep, 0, c["ncp0"])
        nc_err |= is_rep & (c["ncnum"] > maxsym + 1)

        # one normalized count
        is_val = nc_go & ~is_rep
        maxv = 2 * c["ncthr"] - 1 - c["ncrem"]
        vsm = rdbits(ncw2, nclb2, 10) & (
            (1 << jnp.clip(c["ncbits"] - 1, 0, 10)) - 1)
        small = vsm < maxv
        vbig = rdbits(ncw2, nclb2, 11) & (
            (1 << jnp.clip(c["ncbits"], 0, 11)) - 1)
        vv = jnp.where(small, vsm,
                       jnp.where(vbig < c["ncthr"], vbig, vbig - maxv))
        used = jnp.where(small, c["ncbits"] - 1, c["ncbits"])
        cval = vv - 1
        c["ncbp"] = jnp.where(is_val, c["ncbp"] + used, c["ncbp"])
        c["ncrem"] = jnp.where(is_val, c["ncrem"] - jnp.abs(cval),
                               c["ncrem"])
        nc_err |= is_val & (c["ncnum"] >= _NC_CAP)
        c["ncounts"] = jnp.where(
            is_val[:, None]
            & (cidx == jnp.clip(c["ncnum"], 0, _NC_CAP - 1)[:, None]),
            cval[:, None], c["ncounts"])
        c["ncnum"] = jnp.where(is_val, c["ncnum"] + 1, c["ncnum"])
        c["ncp0"] = jnp.where(is_val, (cval == 0).astype(I32),
                              c["ncp0"])
        for _i in range(10):
            dec = is_nc & (c["ncrem"] < c["ncthr"]) & (c["ncthr"] > 1)
            c["ncbits"] = jnp.where(dec, c["ncbits"] - 1, c["ncbits"])
            c["ncthr"] = jnp.where(dec, c["ncthr"] >> 1, c["ncthr"])
        nc_done = is_nc & ~nc_in & (
            (c["ncrem"] <= 1) | (c["ncnum"] > maxsym))
        nc_err |= nc_done & (c["ncrem"] != 1)
        pos = jnp.where(nc_done & ~nc_err, (c["ncbp"] + 7) >> 3, pos)
        mode = jnp.where(nc_done & ~nc_err, _M_FSEBUILD, mode)
        err = err | nc_err

        # =============== M_FSEBUILD ===================================
        is_fb = active & (mode0 == _M_FSEBUILD)

        def do_fse(tabs):
            sym, nb, base, berr = _fse_build(c["ncounts"], c["nclog"])
            out = {}
            for tname, t_id in (("tw", 0), ("tll", 1), ("tof", 2),
                                ("tml", 3)):
                m = (is_fb & (c["tid"] == t_id))[:, None]
                for suf, new in (("s", sym), ("n", nb), ("b", base)):
                    k = tname + suf
                    L = tabs[k].shape[1]
                    out[k] = jnp.where(m, new[:, :L], tabs[k])
            return out, berr

        tabkeys = [t + s for t in ("tw", "tll", "tof", "tml")
                   for s in ("s", "n", "b")]
        tabs_in = {k: c[k] for k in tabkeys}
        tabs_out, fb_err = jax.lax.cond(
            jnp.any(is_fb), do_fse, lambda t: (t, zb), tabs_in)
        for k in tabkeys:
            c[k] = tabs_out[k]
        err = err | (is_fb & fb_err)
        # stash the acc log: smodes bits 8-11 LL, 12-15 OF, 16-19 ML,
        # 20-23 weights
        logsh = jnp.where(c["tid"] == 0, 20,
                          jnp.where(c["tid"] == 1, 8,
                                    jnp.where(c["tid"] == 2, 12, 16)))
        c["smodes"] = jnp.where(
            is_fb,
            (c["smodes"] & ~(15 << logsh)) | (c["nclog"] << logsh),
            c["smodes"])
        # weights table: initialize the backward weight stream
        go_w = is_fb & (c["tid"] == 0)
        wl_w, wl_b = fwin(c["hwend"] - _FWD)
        wlast_b = fbyte_w(wl_w, wl_b, c["hwend"] - 1)
        sent = _hb(jnp.maximum(wlast_b, 1))
        err = err | (go_w & ((wlast_b == 0) | (c["hwend"] <= pos)))
        hwp = (c["hwend"] - 1) * 8 + sent
        c["hwp0"] = jnp.where(go_w, pos * 8, c["hwp0"])
        wlog = c["nclog"]
        st0 = rback(jnp.where(go_w, hwp, 64), wlog)
        st1 = rback(jnp.where(go_w, hwp - wlog, 64), wlog)
        c["hws0"] = jnp.where(go_w, st0, c["hws0"])
        c["hws1"] = jnp.where(go_w, st1, c["hws1"])
        c["hwp"] = jnp.where(go_w, hwp - 2 * wlog, c["hwp"])
        c["widx"] = jnp.where(go_w, 0, c["widx"])
        c["warr"] = jnp.where(go_w[:, None], 0, c["warr"])
        mode = jnp.where(
            is_fb, jnp.where(c["tid"] == 0, _M_HUFW_FSE,
                             jnp.where(c["tid"] >= 3, _M_SEQINIT,
                                       _M_SEQTABS)), mode)
        c["tid"] = jnp.where(is_fb & (c["tid"] > 0), c["tid"] + 1,
                             c["tid"])

        # =============== M_HUFW_FSE ===================================
        # two weights per iteration (interleaved even/odd states)
        is_hw = active & (mode0 == _M_HUFW_FSE)
        for _half in range(2):
            even = (c["widx"] & 1) == 0
            stc = jnp.where(even, c["hws0"], c["hws1"])
            sti = jnp.clip(stc, 0, _FSE_PAD - 1)[:, None]
            wsym = jnp.take_along_axis(c["tws"], sti, axis=1)[:, 0]
            wnb = jnp.take_along_axis(c["twn"], sti, axis=1)[:, 0]
            wbase = jnp.take_along_axis(c["twb"], sti, axis=1)[:, 0]
            go = is_hw & (c["widx"] < 254)
            c["warr"] = jnp.where(
                go[:, None] & (sidx == c["widx"][:, None]),
                wsym[:, None], c["warr"])
            nst = wbase + rback(jnp.where(go, c["hwp"], 64), wnb)
            hwp_n = c["hwp"] - wnb
            over = go & (hwp_n < c["hwp0"])
            other = jnp.where(even, c["hws1"], c["hws0"])
            osym = jnp.take_along_axis(
                c["tws"], jnp.clip(other, 0, _FSE_PAD - 1)[:, None],
                axis=1)[:, 0]
            c["warr"] = jnp.where(
                over[:, None] & (sidx == (c["widx"] + 1)[:, None]),
                osym[:, None], c["warr"])
            c["hws0"] = jnp.where(go & ~over & even, nst, c["hws0"])
            c["hws1"] = jnp.where(go & ~over & ~even, nst, c["hws1"])
            c["hwp"] = jnp.where(go & ~over, hwp_n, c["hwp"])
            c["nw"] = jnp.where(over, c["widx"] + 2, c["nw"])
            c["widx"] = jnp.where(go, c["widx"] + 1, c["widx"])
            err = err | (is_hw & (c["widx"] >= 254) & ~over)
            pos = jnp.where(over, c["hwend"], pos)
            mode = jnp.where(over, _M_HUFBUILD, mode)
            is_hw = is_hw & ~over

        # =============== M_HUFBUILD ===================================
        is_hb2 = active & (mode0 == _M_HUFBUILD)

        def do_huf(t):
            K2, b2, c2, o2, s2, herr = _huf_build(c["warr"], c["nw"])
            m = is_hb2
            return ({"hK": jnp.where(m & ~herr, K2, t["hK"]),
                     "hbase": jnp.where(m[:, None], b2, t["hbase"]),
                     "hcnt": jnp.where(m[:, None], c2, t["hcnt"]),
                     "hoffs": jnp.where(m[:, None], o2, t["hoffs"]),
                     "hsym": jnp.where(m[:, None], s2, t["hsym"])},
                    is_hb2 & herr)

        hin = {k: c[k] for k in ("hK", "hbase", "hcnt", "hoffs",
                                 "hsym")}
        hout, hb_err = jax.lax.cond(
            jnp.any(is_hb2), do_huf, lambda t: (t, zb), hin)
        for k in hin:
            c[k] = hout[k]
        err = err | hb_err
        mode = jnp.where(is_hb2 & ~hb_err, _M_LITSETUP, mode)

        # =============== M_LITSETUP ===================================
        is_ls = active & (mode0 == _M_LITSETUP)
        four = c["nstr"] == 4
        j1 = fbyte(0) | (fbyte(1) << 8)
        j2 = fbyte(2) | (fbyte(3) << 8)
        j3 = fbyte(4) | (fbyte(5) << 8)
        sbase = jnp.where(four, pos + 6, pos)
        tot_c = c["lcend"] - sbase
        s4sz = tot_c - j1 - j2 - j3
        ls_err = is_ls & four & ((s4sz < 1) | (j1 < 1) | (j2 < 1)
                                 | (j3 < 1))
        r13 = (c["lrsz"] + 3) >> 2
        r4 = c["lrsz"] - 3 * r13
        ls_err |= is_ls & four & (r4 < 0)
        ls_err |= is_ls & (tot_c < 1)
        starts = [sbase, sbase + j1, sbase + j1 + j2,
                  sbase + j1 + j2 + j3]
        sizes = [jnp.where(four, j1, tot_c), j2, j3, s4sz]
        rems = [jnp.where(four, r13, c["lrsz"]),
                jnp.where(four, r13, 0), jnp.where(four, r13, 0),
                jnp.where(four, r4, 0)]
        for k in range(4):
            endk = starts[k] + sizes[k]
            le_w, le_b = fwin(endk - _FWD)
            lastb = fbyte_w(le_w, le_b, endk - 1)
            sen = _hb(jnp.maximum(lastb, 1))
            usek = rems[k] > 0
            ls_err |= is_ls & usek & ((lastb == 0) | (sizes[k] < 1))
            c[f"s{k}p"] = jnp.where(
                is_ls, jnp.where(usek, (endk - 1) * 8 + sen,
                                 starts[k] * 8), c[f"s{k}p"])
            c[f"s{k}b"] = jnp.where(is_ls, starts[k] * 8, c[f"s{k}b"])
            c[f"s{k}t"] = jnp.where(
                is_ls, c["tl"] + (k * r13 if k else 0) * four.astype(I32)
                if k else c["tl"], c[f"s{k}t"])
            c[f"s{k}r"] = jnp.where(is_ls, rems[k], c[f"s{k}r"])
        c["lbase"] = jnp.where(is_ls, c["tl"], c["lbase"])
        c["tl"] = jnp.where(is_ls & ~ls_err, c["tl"] + c["lrsz"],
                            c["tl"])
        pos = jnp.where(is_ls & ~ls_err, c["lcend"], pos)
        mode = jnp.where(is_ls & ~ls_err, _M_LITDEC, mode)
        err = err | ls_err

        # =============== M_LITDEC ===================================== 8 lanes
        is_ld = active & (mode0 == _M_LITDEC)
        ld_err = zb
        for k in range(4):
            for _rep in range(2):
                go = is_ld & (c[f"s{k}r"] > 0)
                peek = peek_back(c[f"s{k}p"], 11)
                hsymv, hnb = _huf_decode(peek, c["hK"], c["hbase"],
                                         c["hcnt"], c["hoffs"],
                                         c["hsym"])
                ld_err |= go & (hnb == 0)
                emit(jnp.where(go & (hnb > 0), 1, -1), hsymv,
                     c[f"s{k}t"], 1)
                c[f"s{k}p"] = jnp.where(go, c[f"s{k}p"] - hnb,
                                        c[f"s{k}p"])
                c[f"s{k}t"] = jnp.where(go, c[f"s{k}t"] + 1,
                                        c[f"s{k}t"])
                c[f"s{k}r"] = jnp.where(go, c[f"s{k}r"] - 1,
                                        c[f"s{k}r"])
            # a finished stream must land exactly on its first bit
            ld_err |= is_ld & (c[f"s{k}r"] == 0) & (
                c[f"s{k}p"] != c[f"s{k}b"])
        all_done = is_ld & ((c["s0r"] + c["s1r"] + c["s2r"]
                             + c["s3r"]) == 0)
        mode = jnp.where(all_done & ~ld_err, _M_SEQHDR, mode)
        err = err | (is_ld & ld_err)

        # =============== M_SEQHDR ===================================== 2 lanes
        is_sh = active & (mode0 == _M_SEQHDR)
        nb0 = fbyte(0)
        nbs = jnp.where(nb0 < 128, nb0,
                        jnp.where(nb0 < 255,
                                  ((nb0 - 128) << 8) + fbyte(1),
                                  fbyte(1) + (fbyte(2) << 8) + 0x7F00))
        nbadv = jnp.where(nb0 < 128, 1, jnp.where(nb0 < 255, 2, 3))
        c["nbseq"] = jnp.where(is_sh, nbs, c["nbseq"])
        flush0 = is_sh & (nbs == 0)
        lit_left = c["lrsz"] - c["lpos"]
        sh_err = flush0 & ((pos + nbadv != c["bend"])
                           | (c["op"] + lit_left > out_len))
        _emit_lits(emit, flush0 & ~sh_err, c, lit_left, TW)
        c["op"] = jnp.where(flush0 & ~sh_err, c["op"] + lit_left,
                            c["op"])
        smod = fbyte_w(fw, fb, pos + nbadv)
        sh_err |= is_sh & (nbs > 0) & ((smod & 3) != 0)
        c["smodes"] = jnp.where(is_sh & (nbs > 0),
                                (c["smodes"] & ~jnp.int32(0xFF)) | smod,
                                c["smodes"])
        pos = jnp.where(is_sh & ~sh_err,
                        pos + nbadv + (nbs > 0).astype(I32), pos)
        c["tid"] = jnp.where(is_sh & (nbs > 0), 1, c["tid"])
        mode = jnp.where(is_sh & ~sh_err,
                         jnp.where(nbs == 0, _M_BLKEND, _M_SEQTABS),
                         mode)
        err = err | sh_err

        # =============== M_SEQTABS ====================================
        is_st = active & (mode0 == _M_SEQTABS) & (c["tid"] >= 1) & (
            c["tid"] <= 3)
        mbits = c["smodes"] & 0xFF
        msel = jnp.where(c["tid"] == 1, (mbits >> 6) & 3,
                         jnp.where(c["tid"] == 2, (mbits >> 4) & 3,
                                   (mbits >> 2) & 3))
        st_err = zb
        rsym = fbyte(0)
        for t_id, tname, pre, mx in ((1, "tll", _PRE["ll"], 35),
                                     (2, "tof", _PRE["of"], 31),
                                     (3, "tml", _PRE["ml"], 52)):
            sh = (8, 12, 16)[t_id - 1]
            m_pre = is_st & (c["tid"] == t_id) & (msel == 0)
            L = c[tname + "s"].shape[1]
            for suf, arr in (("s", pre[0]), ("n", pre[1]),
                             ("b", pre[2])):
                c[tname + suf] = jnp.where(
                    m_pre[:, None], jnp.asarray(arr)[None, :L],
                    c[tname + suf])
            c["smodes"] = jnp.where(
                m_pre, (c["smodes"] & ~(15 << sh)) | (pre[3] << sh),
                c["smodes"])
            m_rle = is_st & (c["tid"] == t_id) & (msel == 1)
            st_err |= m_rle & (rsym > mx)
            c[tname + "s"] = jnp.where(m_rle[:, None], rsym[:, None],
                                       c[tname + "s"])
            c[tname + "n"] = jnp.where(m_rle[:, None], 0, c[tname + "n"])
            c[tname + "b"] = jnp.where(m_rle[:, None], 0, c[tname + "b"])
            c["smodes"] = jnp.where(m_rle, c["smodes"] & ~(15 << sh),
                                    c["smodes"])
            # repeat mode (msel 3): table + log stay carried; validity
            # is implied — an all-zero table decodes symbol 0 with 0
            # bits, which the sequence-consumption check then rejects
        m_rle_any = is_st & (msel == 1)
        pos = jnp.where(m_rle_any & ~st_err, pos + 1, pos)
        m_fse = is_st & (msel == 2)
        c["ncbp"] = jnp.where(m_fse, pos * 8, c["ncbp"])
        c["ncnum"] = jnp.where(m_fse, -1, c["ncnum"])
        adv = is_st & (msel != 2) & ~st_err
        nexttid = jnp.where(adv, c["tid"] + 1, c["tid"])
        mode = jnp.where(m_fse, _M_NCOUNT,
                         jnp.where(adv & (nexttid > 3), _M_SEQINIT,
                                   mode))
        c["tid"] = nexttid
        err = err | st_err

        # =============== M_SEQINIT ====================================
        is_si = active & (mode0 == _M_SEQINIT)
        be_w, be_b = fwin(c["bend"] - _FWD)
        lastb2 = fbyte_w(be_w, be_b, c["bend"] - 1)
        sen2 = _hb(jnp.maximum(lastb2, 1))
        si_err = is_si & ((lastb2 == 0) | (c["bend"] <= pos))
        sqp_v = (c["bend"] - 1) * 8 + sen2
        lllog = (c["smodes"] >> 8) & 15
        oflog = (c["smodes"] >> 12) & 15
        mllog = (c["smodes"] >> 16) & 15
        v0 = rback(jnp.where(is_si, sqp_v, 64), lllog)
        v1 = rback(jnp.where(is_si, sqp_v - lllog, 64), oflog)
        v2 = rback(jnp.where(is_si, sqp_v - lllog - oflog, 64), mllog)
        c["lls"] = jnp.where(is_si, v0, c["lls"])
        c["ofs"] = jnp.where(is_si, v1, c["ofs"])
        c["mls"] = jnp.where(is_si, v2, c["mls"])
        c["sqp"] = jnp.where(is_si, sqp_v - lllog - oflog - mllog,
                             c["sqp"])
        c["sqp0"] = jnp.where(is_si, pos * 8, c["sqp0"])
        si_err |= is_si & (c["sqp"] < c["sqp0"])
        mode = jnp.where(is_si & ~si_err, _M_SEQDEC, mode)
        err = err | si_err

        # =============== M_SEQDEC ===================================== 5 lanes
        is_sq = active & (mode0 == _M_SEQDEC) & (c["nbseq"] > 0)

        def tab3(tname, st):
            sti = jnp.clip(st, 0, c[tname + "s"].shape[1] - 1)[:, None]
            return (jnp.take_along_axis(c[tname + "s"], sti,
                                        axis=1)[:, 0],
                    jnp.take_along_axis(c[tname + "n"], sti,
                                        axis=1)[:, 0],
                    jnp.take_along_axis(c[tname + "b"], sti,
                                        axis=1)[:, 0])

        ofc, ofn, ofb_ = tab3("tof", c["ofs"])
        mlc, mln2, mlb2 = tab3("tml", c["mls"])
        llc, lln2, llb2 = tab3("tll", c["lls"])
        sq_err = is_sq & ((ofc > 25) | (mlc > 52) | (llc > 35))
        ofbits = jnp.clip(ofc, 0, 25)
        sqp = c["sqp"]
        ofv = (1 << ofbits) + rback(jnp.where(is_sq, sqp, 64), ofbits)
        p1 = sqp - ofbits
        mlx = jnp.take(mlb, jnp.clip(mlc, 0, 52))
        ml = jnp.take(mla, jnp.clip(mlc, 0, 52)) + rback(
            jnp.where(is_sq, p1, 64), mlx)
        p2 = p1 - mlx
        llx = jnp.take(llb, jnp.clip(llc, 0, 35))
        ll = jnp.take(lla, jnp.clip(llc, 0, 35)) + rback(
            jnp.where(is_sq, p2, 64), llx)
        p3 = p2 - llx

        # offset conversion + repeat history (3.1.1.4)
        big = ofv > 3
        ll0 = (ll == 0).astype(I32)
        idxr = jnp.where(big, -1, ofv - 1 + ll0)
        off = jnp.where(
            big, ofv - 3,
            jnp.where(idxr == 0, c["rep1"],
                      jnp.where(idxr == 1, c["rep2"],
                                jnp.where(idxr == 2, c["rep3"],
                                          c["rep1"] - 1))))
        sq_err |= is_sq & (off <= 0)
        shift2 = big | (idxr >= 2)
        shift1 = shift2 | (idxr == 1)
        nrep3 = jnp.where(shift2, c["rep2"], c["rep3"])
        nrep2 = jnp.where(shift1, c["rep1"], c["rep2"])
        nrep1 = jnp.where(big | (idxr > 0), off, c["rep1"])
        go_q0 = is_sq & ~sq_err
        c["rep1"] = jnp.where(go_q0, nrep1, c["rep1"])
        c["rep2"] = jnp.where(go_q0, nrep2, c["rep2"])
        c["rep3"] = jnp.where(go_q0, nrep3, c["rep3"])

        sq_err |= is_sq & ((c["lpos"] + ll > c["lrsz"])
                           | (c["op"] + ll + ml > out_len)
                           | (off > c["op"] + ll))
        go_q = is_sq & ~sq_err
        _emit_lits(emit, go_q, c, ll, TW)
        emit(jnp.where(go_q & (ml > 0), 2, -1), off, c["op"] + ll, ml)
        c["op"] = jnp.where(go_q, c["op"] + ll + ml, c["op"])
        c["lpos"] = jnp.where(go_q, c["lpos"] + ll, c["lpos"])
        c["nbseq"] = jnp.where(go_q, c["nbseq"] - 1, c["nbseq"])
        upd = go_q & (c["nbseq"] > 0)
        lls_n = llb2 + rback(jnp.where(upd, p3, 64), lln2)
        p4 = p3 - lln2
        mls_n = mlb2 + rback(jnp.where(upd, p4, 64), mln2)
        p5 = p4 - mln2
        ofs_n = ofb_ + rback(jnp.where(upd, p5, 64), ofn)
        p6 = p5 - ofn
        c["lls"] = jnp.where(upd, lls_n, c["lls"])
        c["mls"] = jnp.where(upd, mls_n, c["mls"])
        c["ofs"] = jnp.where(upd, ofs_n, c["ofs"])
        c["sqp"] = jnp.where(go_q, jnp.where(upd, p6, p3), c["sqp"])
        sq_err |= go_q & (c["sqp"] < c["sqp0"]) & (c["nbseq"] > 0)
        sq_done = go_q & (c["nbseq"] == 0)
        sq_err |= sq_done & (c["sqp"] != c["sqp0"])
        lit_left2 = c["lrsz"] - c["lpos"]
        sq_err |= sq_done & (c["op"] + lit_left2 > out_len)
        flushq = sq_done & ~sq_err
        _emit_lits(emit, flushq, c, lit_left2, TW)
        c["op"] = jnp.where(flushq, c["op"] + lit_left2, c["op"])
        mode = jnp.where(flushq, _M_BLKEND, mode)
        err = err | sq_err

        # =============== M_BLKEND =====================================
        is_be = active & (mode0 == _M_BLKEND)
        pos = jnp.where(is_be, c["bend"], pos)
        c["fin"] = c["fin"] | (is_be & (c["last"] == 1))
        mode = jnp.where(is_be,
                         jnp.where(c["last"] == 1, _M_DONE, _M_BLK),
                         mode)

        c["pos"] = pos
        c["mode"] = mode
        c["err"] = err

        assert len(ev_k) == _NLANES, len(ev_k)
        rows = tuple(jnp.stack(ls, axis=1)
                     for ls in (ev_k, ev_a, ev_d, ev_l))
        return c, rows

    def cond(st):
        ef, kslot, c = st
        return jnp.any(~(c["err"] | c["fin"])) & (kslot < nchunks)

    def body(st):
        ef, kslot, c = st
        c2, rows = jax.lax.scan(inner, c, None, length=_KCH)
        ef = tuple(
            jax.lax.dynamic_update_slice(
                f, jnp.moveaxis(r, 0, 1).reshape(R, _KCH * _NLANES),
                (0, kslot * _NLANES * _KCH))
            for f, r in zip(ef, rows))
        return ef, kslot + 1, c2

    z = jnp.zeros((R,), I32)
    zb = jnp.zeros((R,), bool)
    c0 = dict(
        pos=z, mode=z + _M_FRAME, err=csizes <= 0, fin=zb,
        last=z, bend=z, op=z, tl=z, cs=csizes,
        ltype=z, lrsz=z, lsrc=z, lbase=z, lpos=z, lcend=z,
        hK=z, nw=z, widx=z, hwp=z, hwp0=z, hws0=z, hws1=z, hwend=z,
        tid=z, smodes=z, ncbp=z, ncrem=z, ncthr=z, ncbits=z,
        ncnum=z, ncp0=z, nstr=z,
        s0p=z, s1p=z, s2p=z, s3p=z, s0t=z, s1t=z, s2t=z, s3t=z,
        s0r=z, s1r=z, s2r=z, s3r=z, s0b=z, s1b=z, s2b=z, s3b=z,
        nbseq=z, sqp=z, sqp0=z, lls=z, ofs=z, mls=z,
        rep1=z + 1, rep2=z + 4, rep3=z + 8,
        warr=jnp.zeros((R, 256), I32),
        ncounts=jnp.zeros((R, _NC_CAP), I32), nclog=z,
        tws=jnp.zeros((R, 64), I32), twn=jnp.zeros((R, 64), I32),
        twb=jnp.zeros((R, 64), I32),
        tlls=jnp.zeros((R, 512), I32), tlln=jnp.zeros((R, 512), I32),
        tllb=jnp.zeros((R, 512), I32),
        tofs=jnp.zeros((R, 256), I32), tofn=jnp.zeros((R, 256), I32),
        tofb=jnp.zeros((R, 256), I32),
        tmls=jnp.zeros((R, 512), I32), tmln=jnp.zeros((R, 512), I32),
        tmlb=jnp.zeros((R, 512), I32),
        hbase=jnp.zeros((R, 12), I32), hcnt=jnp.zeros((R, 12), I32),
        hoffs=jnp.zeros((R, 12), I32), hsym=jnp.zeros((R, 256), I32),
    )
    ef0 = (jnp.full((R, E), -1, I32), jnp.zeros((R, E), I32),
           jnp.zeros((R, E), I32), jnp.zeros((R, E), I32))
    ef, _, cf = jax.lax.while_loop(cond, body, (ef0, jnp.int32(0), c0))
    err = cf["err"] | ~(cf["err"] | cf["fin"])
    ok = ~err & (cf["op"] == out_len)
    import os

    if os.environ.get("CBLOSC_TPU_ZSTD_DEBUG"):   # test introspection
        return ef, ok, cf
    return ef, ok


def _emit_lits(emit, go, c, ll, TW):
    """Literal-run records for `ll` literal bytes at the current
    consumption point, per the block's literal type: Huffman -> tape
    offsets, raw -> stream offsets, RLE -> one byte + a distance-1
    fill. Does NOT advance lpos/op (the caller does)."""
    is_rle = c["ltype"] == 1
    is_huf = c["ltype"] >= 2
    arg = jnp.where(is_huf, c["lbase"] + c["lpos"],
                    TW + c["lsrc"] + c["lpos"])
    emit(jnp.where(go & (ll > 0), 3, -1),
         jnp.where(is_rle, TW + c["lsrc"], arg), c["op"],
         jnp.where(is_rle, 1, ll))
    emit(jnp.where(go & is_rle & (ll > 1), 2, -1), 1, c["op"] + 1,
         ll - 1)


# ---------------------------------------------------------------------------
# events -> tape + records -> placement
# ---------------------------------------------------------------------------


def _events_to_records(ef, ok, out_len: int):
    """Tape from per-byte events (ONE sort — every Huffman literal byte
    carries its tape position) and records from kinds 2/3 in emission
    order."""
    kind, val, dst, ln = ef
    R, E = kind.shape
    is_tape = kind == 1
    tkey = jnp.where(is_tape, (dst << 9) | (val & 0xFF),
                     jnp.int32(1 << 28))
    TW = out_len
    tsort = jax.lax.sort(tkey, dimension=1)
    if TW > E:
        tape = jnp.pad((tsort & 0xFF).astype(U8), ((0, 0), (0, TW - E)))
    else:
        tape = (tsort[:, :TW] & 0xFF).astype(U8)
    rk = jnp.where(kind == 3, 0, jnp.where(kind == 2, 1, -1))
    rf = (rk, val, dst, ln)
    ok = ok & (jnp.sum(is_tape.astype(I32), axis=1) <= TW)
    return tape, rf, ok


def default_events(out_len: int) -> int:
    """Budget in event SLOTS (_NLANES consumed per FSM iteration).
    Huffman literals decode 8 per iteration, i.e. 18/8 slots per
    literal byte; the default covers streams whose literal fraction is
    <= ~1/2 — beyond that the byte API retries with high_events."""
    return (out_len * 9) // 8 + 2048


def high_events(out_len: int) -> int:
    """Worst case: every output byte a Huffman literal (2.25 slots per
    byte) plus sequence records, table builds and header stalls."""
    return (out_len * 9) // 4 + 8192


@partial(jax.jit, static_argnums=(2, 3))
def decode(slots: jax.Array, csizes: jax.Array, out_len: int,
           maxev_hint: int = 0):
    """Decode batched zstd frames on device.

    Same contract as codec.decode: (out (N, out_len) u8, produced,
    err). Rows outside the FSM's scope (dictionaries, event overflow,
    malformed frames) report err; the byte API retries once with
    high_events and then falls back to the host engines."""
    import os

    N, W = slots.shape
    cpu_cap = int(os.environ.get("CBLOSC_TPU_ZSTD_CPU_CAP", 8192))
    small_enough = (jax.default_backend() != "cpu"
                    or out_len <= cpu_cap)
    if (out_len > structured.decode_cap() or out_len < 8
            or not small_enough):
        # big blocks on CPU legs would run the expand kernel in
        # interpret mode (minutes per block): report unhandled so the
        # byte API falls back to the host engines
        return (jnp.zeros((N, out_len), U8), jnp.zeros((N,), I32),
                csizes > 0)
    slots = jnp.pad(slots, ((0, 0), (0, _FWD + _WIN)))
    maxev = maxev_hint or default_events(out_len)
    group = min(structured._group_rows(out_len, maxev), 256)
    # worst conforming record density: 2 records per 4 output bytes
    # (ll=1/ml=3 sequences); the cap keeps the expand kernel's packed
    # record block inside scoped VMEM at the 256 KB geometry
    reccap = -(-(out_len // 2 + 1024) // 32) * 32

    def run(sl, cs):
        from . import expand as expand_mod

        ef, okf = _fsm_walk(sl, cs, out_len, maxev)
        tape, rf, okf = _events_to_records(ef, okf, out_len)
        nrec = jnp.sum((rf[0] >= 0).astype(I32), axis=1)
        okf = okf & (nrec <= reccap)
        rf_c = tuple(f[:, :reccap]
                     for f in expand_mod.compact_records(rf))
        src = jnp.concatenate([tape, sl], axis=1)
        out = structured.kernel_place_rows(src, rf_c, okf, out_len,
                                           src.shape[1])
        return out, okf

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
