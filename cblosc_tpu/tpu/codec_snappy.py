"""Device Snappy decoder: tag-stream walk + the shared placement machine.

The reference wraps external snappy as an optional codec
(blosc/blosc.c:443-467); our host engines implement the public raw
format natively (ops/codecs/snappy.py, native/src/codecs_ext.cc). This
module adds the TPU decode path so snappy chunks ride the same
structured machinery as blosclz and LZ4: a parse-only batched walk
turns the tag stream into (kind, src, dst, len) records, then the
Pallas expand kernel (per-record distances) or the XLA sort machine
places the bytes.

Snappy's grammar is simpler than both siblings — every token is
self-contained (tag byte plus at most four inline extra bytes), so the
walk is single-phase:

    uvarint uncompressed length                  (parsed outside the loop)
    tag & 3 == 0: literal, (tag>>2)+1 bytes; lengths > 60 spill into
                  1-4 little-endian extra bytes (value+1)
    tag & 3 == 1: copy, 3-bit length-4 (4..11), 11-bit offset
                  (tag bits 5-7 are offset bits 8-10; one extra byte)
    tag & 3 == 2: copy, 6-bit length-1, 2-byte LE offset
    tag & 3 == 3: copy, 6-bit length-1, 4-byte LE offset

Copies are capped at 64 bytes by the format, so long runs arrive as
trains of copy tokens (one record each) rather than one extended token;
the record budget and walk iteration count scale accordingly. Encoding
stays on the host engines (the reference never shipped a snappy encoder
either — it wrapped the external library).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import structured

I32 = jnp.int32
U8 = jnp.uint8

MAX_OUT = structured.MAX_OUT


def max_records(out_len: int) -> int:
    """Default walk budget in record slots (one consumed per parse step,
    incl. window-edge stalls — see structured.max_records). Copies carry
    <= 64 bytes each and hash-table snappy encoders emit matches as
    short as 4 bytes with literal fragments between (the oracle's own
    output on near-random data runs one record per ~4.5 output bytes),
    so the default is a quarter of the output size plus the stall
    margin. Denser streams overflow; the byte API retries with
    structured.high_records before any host fallback."""
    return out_len // 4 + out_len // 64 + 32


def _walk_batch(slots: jax.Array, csizes: jax.Array, out_len: int,
                maxrec: int):
    """Parse a batch of snappy streams into records (kind 0 literal /
    1 copy), batched like structured._walk_batch: each iteration reads
    one aligned 512-byte window per row via masked reductions and runs
    up to _T single-token parse steps on it. Literal payloads are
    skipped, not read, so long literal runs cost one step plus a window
    re-read."""
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

    # ---- uvarint preamble, outside the loop -------------------------------
    val = jnp.zeros((R,), I32)
    nv = jnp.zeros((R,), I32)
    cont = jnp.ones((R,), bool)
    overflow = jnp.zeros((R,), bool)
    for i in range(5):
        bi = slots[:, i].astype(I32) if i < W else jnp.zeros((R,), I32)
        take = cont & (i < csizes)
        # out_len <= 2^18: any set bit at or above bit 28 cannot match
        overflow |= take & (i == 4) & ((bi & 0x7F) > 0xF)
        val = jnp.where(take, val | ((bi & 0x7F) << (7 * i)), val)
        nv = jnp.where(take, i + 1, nv)
        cont = cont & take & ((bi & 0x80) != 0)
    pre_err = cont | overflow | (val != out_len) | (csizes <= nv)

    def inner(carry, _):
        ip, op, dist, uni, err, fin = carry
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

            tag = sel(sq)
            b1 = sel(sq + 1)
            b2 = sel(sq + 2)
            b3 = sel(sq + 3)
            b4 = sel(sq + 4)
            typ = tag & 3
            base = tag >> 2

            # ---- literal (typ 0) ------------------------------------------
            is_lit = typ == 0
            extra = jnp.clip(base - 59, 0, 4)
            ext_val = (b1 | jnp.where(extra >= 2, b2 << 8, 0)
                       | jnp.where(extra >= 3, b3 << 16, 0))
            lit_len = jnp.where(extra == 0, base + 1, ext_val + 1)
            # a 4-byte length with its top byte set exceeds any out_len
            lit_big = (extra == 4) & (b4 != 0)
            ipl = ip + 1 + extra
            ip2 = ipl + lit_len
            op2 = op + lit_len
            lit_err = lit_big | (ip2 > csizes) | (op2 > out_len)

            # ---- copy (typ 1/2/3) -----------------------------------------
            is_c1 = typ == 1
            is_c2 = typ == 2
            mlen = jnp.where(is_c1, (base & 7) + 4, base + 1)
            off = jnp.where(
                is_c1, ((base >> 3) << 8) | b1,
                b1 | (b2 << 8) | jnp.where(is_c2, 0, b3 << 16))
            off_big = (typ == 3) & (b4 != 0)
            ip3 = ip + jnp.where(is_c1, 2, jnp.where(is_c2, 3, 5))
            m_err = (off_big | (off == 0) | (off > op)
                     | (op + mlen > out_len) | (ip3 > csizes))

            # ---- merge + state advance ------------------------------------
            err_t = jnp.where(is_lit, lit_err, m_err)
            good = act & ~err_t
            sk_l.append(jnp.where(good, jnp.where(is_lit, 0, 1), -1))
            sa_l.append(jnp.where(is_lit, ipl, off))
            sd_l.append(op)
            sl_l.append(jnp.where(is_lit, lit_len, mlen))

            ip_n = jnp.where(is_lit, ip2, ip3)
            op_n = jnp.where(is_lit, op2, op + mlen)
            d2 = jnp.where(dist == 0, off, dist)
            dist_n = jnp.where(~is_lit, d2, dist)
            uni_n = uni & ~(~is_lit & (off != d2))
            fin_t = ip_n >= csizes        # no terminator: stream end is fin

            upd = (ip_n, op_n, dist_n, uni_n)
            old = (ip, op, dist, uni)
            ip, op, dist, uni = (
                jnp.where(good, n, o) for n, o in zip(upd, old))
            err = err | (act & err_t)
            fin = fin | (good & fin_t)

        rows = tuple(jnp.stack(ls, axis=1)
                     for ls in (sk_l, sa_l, sd_l, sl_l))
        return (ip, op, dist, uni, err, fin), rows

    def cond(stt):
        kslot, carry = stt[4], stt[5:]
        return jnp.any(~(carry[4] | carry[5])) & (kslot < nchunks)

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
    live = csizes > 0
    stt = jax.lax.while_loop(
        cond, body,
        (rk0, ra0, rd0, rl0, jnp.int32(0),
         nv, zero, zero, zero == 0,
         live & pre_err, ~live),
    )
    rf = stt[:4]
    ip, op, dist, uni, err, fin = stt[5:]
    err = err | ~(err | fin)
    ok = ~err & (op == out_len)
    return rf, dist, uni, ok


@partial(jax.jit, static_argnums=(2, 3))
def decode(slots: jax.Array, csizes: jax.Array, out_len: int,
           maxrec_hint: int = 0):
    """Decode batched snappy streams via the structured machine.

    Rows the walk cannot handle report err=True (the caller falls back
    to a host engine for the whole chunk). Returns (out, produced, err)
    with codec.decode semantics. maxrec_hint overrides the record budget
    (see structured.decode).
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
