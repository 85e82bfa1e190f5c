"""Pallas expand kernel: records -> output bytes, per row, on-core.

The XLA placement machine (structured._place_and_fill) moves every
output byte through sort keys — ~2-4 ns/B and the decode bottleneck once
the walk got cheap. This kernel replaces it with per-row record walks
that materialize output in VMEM in 4 KB chunks.

Measured v5e primitive costs (scratch/pallas_probe8/9.py) shape the
design: static (8,128) tile ops ~4 ns, predicated-off bodies ~10 ns,
dynamic-sublane loads ~145 ns, dynamic RMW stores ~210 ns, dynamic lane
rolls ~205 ns (pltpu.roll; a 7-stage butterfly costs 3x more, an MXU
permutation 25% more). Consequences: work in 4 KB chunks so each
dynamic op amortizes over 32 sublanes, special-case distance-1 fills
(one byte extract + broadcast stores, no loads/rolls), and take an
aligned fast path (no roll, no sublane shift) whenever source and
destination agree modulo 128 — which period promotion arranges for
small-distance fills by doubling the period to a multiple of 128.

Record kinds (records must be compacted valid-first; kind < 0 stops):
  [0, src, dst, len]              literal copy from the compressed row
  [1, dist, dst, len]             match fill, distance per record — so
                                  mixed-distance (host/reference/LZ4)
                                  streams decode on this path
  [(nb<<4)|2, b0-3, dst, b4-7]    nb <= 8 immediate bytes (encoder
                                  token emission)

All ref indices are clamped: adversarial records cannot read or write
out of bounds (the structural memory-safety rule every engine follows).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
U8 = jnp.uint8

_CH = 32           # chunk sublanes (4 KB)
_SPAD = _CH + 8    # scratch padding sublanes (window overread room)
# kernel VMEM cap: 512 KB rows measured OK on v5e (scratch/
# r2_probe_expand_512k.py: ~8 MB resident, 45.9 ms steady-state);
# the sort/splat machines keep their own 2^18 key-packing cap
# (structured.MAX_OUT)
MAX_OUT = 1 << 19


def _make_kernel(WB: int, OB: int, maxrec: int):
    out_bytes = OB * 128
    nchunks_out = OB // _CH

    def kernel(recs_ref, src_ref, out_ref, scratch_ref):
        scratch_ref[:, :] = jnp.zeros((OB + _SPAD, 128), I32)
        lane = jax.lax.broadcasted_iota(I32, (_CH, 128), 1)
        subl = jax.lax.broadcasted_iota(I32, (_CH, 128), 0)
        subl_w = jax.lax.broadcasted_iota(I32, (_CH + 8, 128), 0)

        def src_read(sb, span):
            """(span+8, 128) source window at sublane sb (clamped);
            8-sublane-aligned row counts keep tpu.dynamic_rotate legal."""
            return src_ref[0, pl.ds(jnp.clip(sb, 0, WB - span - 8),
                                    span + 8), :]

        def out_read(sb, span):
            return scratch_ref[pl.ds(
                jnp.clip(sb, 0, OB + _SPAD - span - 8), span + 8), :]

        def chunked(read_win, s0, d0, L, splat_byte=None):
            """Write [d0, d0+L) from source offset s0 (or, statically, a
            splat byte) in 4 KB chunks with masked RMW at the edges."""
            rot = (s0 - d0) % 128
            c0 = d0 // 4096
            c1 = (d0 + L - 1) // 4096

            def chunk_body(c, _):
                base = c * 4096
                pos = base + subl * 128 + lane
                mask = (pos >= d0) & (pos < d0 + L)
                full = (base >= d0) & (base + 4096 <= d0 + L)
                cb = jnp.minimum(c, nchunks_out - 1) * _CH

                if splat_byte is None:
                    src_byte0 = s0 + base - d0
                    sb = src_byte0 // 128
                    sbc = jnp.maximum(sb, 0)
                    w = read_win(sbc, _CH)
                    # edge chunks may need a window starting before the
                    # array: shift rows down, zeros on top
                    sh = sbc - sb
                    w = jnp.where(subl_w < sh, 0, pltpu.roll(w, sh, 0))
                    # lane phase: roll left by rot (rot 0 is a no-op)
                    w = pltpu.roll(w, (128 - rot) % 128, 1)
                    r = jnp.where(lane < 128 - rot,
                                  w[0:_CH], w[1:_CH + 1])
                else:
                    r = jnp.full((_CH, 128), 1, I32) * splat_byte

                @pl.when(full)
                def _():
                    scratch_ref[pl.ds(cb, _CH), :] = r

                @pl.when(~full)
                def _():
                    cur = scratch_ref[pl.ds(cb, _CH), :]
                    scratch_ref[pl.ds(cb, _CH), :] = jnp.where(mask, r, cur)
                return 0

            jax.lax.fori_loop(c0, c1 + 1, chunk_body, 0)

        def extract_byte(off):
            """scratch byte at offset off (clamped)."""
            offc = jnp.clip(off, 0, out_bytes - 1)
            w = scratch_ref[pl.ds(offc // 128, 1), :]
            return jnp.sum(jnp.where(
                jax.lax.broadcasted_iota(I32, (1, 128), 1) == offc % 128,
                w, 0))

        def rec_cond(state):
            k, stop = state
            return (k < maxrec) & ~stop

        def rec_body(state):
            k, _ = state
            # records are packed 32-per-sublane (lanes (k%32)*4..+3): ONE
            # dynamic-sublane load + four masked reductions replaces four
            # scalar loads AND keeps the VMEM block lane-dense — the naive
            # (maxrec, 4) block is lane-padded 4->128 by Mosaic, which blew
            # the 16 MB scoped-vmem limit at escalated record budgets
            # (measured: 2 * maxrec * 512 B scoped; 70144 recs -> 68.8 MB)
            row = recs_ref[0, pl.ds(k >> 5, 1), :]
            lane128 = jax.lax.broadcasted_iota(I32, (1, 128), 1)
            basel = (k & 31) * 4

            def fld(i):
                return jnp.sum(jnp.where(lane128 == basel + i, row, 0))

            kind = fld(0)
            a = fld(1)
            d0 = jnp.clip(fld(2), 0, out_bytes - 1)
            L = jnp.clip(fld(3), 0, out_bytes - d0)
            low = kind & 0xF

            @pl.when((low == 0) & (kind >= 0) & (L > 0))
            def _():
                chunked(src_read, a, d0, L)

            @pl.when((low == 1) & (L > 0))
            def _():
                d = jnp.clip(a, 1, out_bytes)

                @pl.when(d == 1)
                def _():
                    chunked(out_read, 0, d0, L,
                            splat_byte=extract_byte(d0 - 1))

                @pl.when(d != 1)
                def _():
                    # period promotion: double the period (alignment to
                    # 128 arrives by the 2^7 step and is preserved) so
                    # bulk sweeps run the aligned no-roll path
                    def prom(s):
                        done, p = s
                        n = jnp.minimum(p, L - done)
                        chunked(out_read, d0 + done - p, d0 + done, n)
                        return done + n, jnp.where(p >= 8192, p, p * 2)
                    jax.lax.while_loop(lambda s: s[0] < L, prom,
                                       (jnp.int32(0), d))

            @pl.when(low == 2)
            def _():
                nb = jnp.clip(kind >> 4, 0, 8)
                w1 = fld(3)

                def ins_chunk(c, _):
                    cb = jnp.minimum(c, nchunks_out - 1) * _CH
                    pos = c * 4096 + subl * 128 + lane
                    j = pos - d0
                    word = jnp.where(j < 4, a, w1)
                    byte = (word >> (8 * (j & 3))) & 0xFF
                    mask = (j >= 0) & (j < nb)
                    cur = scratch_ref[pl.ds(cb, _CH), :]
                    scratch_ref[pl.ds(cb, _CH), :] = jnp.where(
                        mask, byte, cur)
                    return 0

                jax.lax.fori_loop(d0 // 4096, (d0 + nb - 1) // 4096 + 1,
                                  ins_chunk, 0)

            return k + 1, kind < 0

        jax.lax.while_loop(rec_cond, rec_body, (jnp.int32(0), False))
        out_ref[0, :, :] = scratch_ref[:OB, :]

    return kernel


def _as_fields(recs):
    """Accept records as a field tuple (kind, arg, dst, len) of (N, R)
    arrays — the canonical form; (N, R, 4) arrays lane-pad 4->128 in the
    TPU HBM layout — or as a legacy (N, R, 4) array (tests, probes)."""
    if isinstance(recs, (tuple, list)):
        return tuple(recs)
    return tuple(recs[..., i] for i in range(4))


def compact_records(recs):
    """Move valid records (kind >= 0) to the front, preserving order.
    One small per-row multi-operand sort over the record slots."""
    rf = _as_fields(recs)
    N, R = rf[0].shape
    idx = jnp.arange(R, dtype=I32)[None, :]
    keys = jnp.where(rf[0] < 0, (1 << 24) | idx, idx)
    return jax.lax.sort((keys,) + rf, dimension=1, num_keys=1)[1:]


@partial(jax.jit, static_argnums=(2,), static_argnames=("interpret",))
def expand(slots: jax.Array, recs, out_len: int,
           interpret: bool = False) -> jax.Array:
    """Materialize rows from compacted records.

    slots: uint8 (N, W) compressed rows (any W); recs: COMPACTED records
    as a field tuple of int32 (N, maxrec) arrays (or a legacy
    (N, maxrec, 4) array). Returns uint8 (N, out_len).
    """
    rf = _as_fields(recs)
    N, W = slots.shape
    R = rf[0].shape[1]
    # pack 32 records per 128-lane sublane row (lane-dense; see rec_body):
    # record k's fields land at lanes (k%32)*4 .. +3 of sublane k//32.
    # Built from the field arrays with repeat+select — never materializing
    # an (N, R, 4) array, whose minor dim would lane-pad 4->128 (32x).
    # Padding records carry kind=-1, the stop marker, so a fully-populated
    # row set still terminates at the first pad slot.
    RP = -(-R // 32) * 32
    if RP != R:
        fills = (-1, 0, 0, 0)
        rf = tuple(
            jnp.pad(f, ((0, 0), (0, RP - R)), constant_values=v)
            for f, v in zip(rf, fills))
    lane4 = jnp.arange(128, dtype=I32)[None, None, :] & 3

    def spread(f):
        return jnp.repeat(f.reshape(N, RP // 32, 32), 4, axis=2)

    packed = jnp.where(
        lane4 == 0, spread(rf[0]),
        jnp.where(lane4 == 1, spread(rf[1]),
                  jnp.where(lane4 == 2, spread(rf[2]), spread(rf[3]))))
    OB = -(-out_len // 4096) * _CH             # output blocks, chunk-aligned
    WB = max(-(-W // 128) + _CH + 8, _CH + 8)  # window overread room
    src3 = jnp.pad(slots, ((0, 0), (0, WB * 128 - W))).reshape(
        N, WB, 128).astype(I32)

    out = pl.pallas_call(
        _make_kernel(WB, OB, RP),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, RP // 32, 128), lambda r: (r, 0, 0)),
                  pl.BlockSpec((1, WB, 128), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, OB, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, OB, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((OB + _SPAD, 128), jnp.int32)],
        interpret=interpret,
    )(packed, src3)
    return out.reshape(N, OB * 128)[:, :out_len].astype(U8)
