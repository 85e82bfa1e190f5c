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
MAX_OUT = 1 << 18  # VMEM budget cap (256 KB rows: ~2.2 MB resident)


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
            kind = recs_ref[0, k, 0]
            a = recs_ref[0, k, 1]
            d0 = jnp.clip(recs_ref[0, k, 2], 0, out_bytes - 1)
            L = jnp.clip(recs_ref[0, k, 3], 0, out_bytes - d0)
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
                w1 = recs_ref[0, k, 3]

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


def compact_records(recs: jax.Array) -> jax.Array:
    """Move valid records (kind >= 0) to the front, preserving order.
    One small per-row two-operand sort over the record slots."""
    N, R, _ = recs.shape
    idx = jnp.arange(R, dtype=I32)[None, :]
    invalid = recs[:, :, 0] < 0
    keys = jnp.where(invalid, (1 << 24) | idx, idx)
    packed = tuple(recs[..., i] for i in range(4))
    _, r0, r1, r2, r3 = jax.lax.sort(
        (keys,) + packed, dimension=1, num_keys=1)
    return jnp.stack([r0, r1, r2, r3], axis=-1)


@partial(jax.jit, static_argnums=(2,), static_argnames=("interpret",))
def expand(slots: jax.Array, recs: jax.Array, out_len: int,
           interpret: bool = False) -> jax.Array:
    """Materialize rows from compacted records.

    slots: uint8 (N, W) compressed rows (any W); recs: int32
    (N, maxrec, 4) COMPACTED records. Returns uint8 (N, out_len).
    """
    N, W = slots.shape
    maxrec = recs.shape[1]
    OB = -(-out_len // 4096) * _CH             # output blocks, chunk-aligned
    WB = max(-(-W // 128) + _CH + 8, _CH + 8)  # window overread room
    src3 = jnp.pad(slots, ((0, 0), (0, WB * 128 - W))).reshape(
        N, WB, 128).astype(I32)

    out = pl.pallas_call(
        _make_kernel(WB, OB, maxrec),
        grid=(N,),
        in_specs=[pl.BlockSpec((1, maxrec, 4), lambda r: (r, 0, 0)),
                  pl.BlockSpec((1, WB, 128), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, OB, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, OB, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((OB + _SPAD, 128), jnp.int32)],
        interpret=interpret,
    )(recs, src3)
    return out.reshape(N, OB * 128)[:, :out_len].astype(U8)
