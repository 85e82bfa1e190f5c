"""TPU device filters: byte-shuffle and bit-shuffle over batched blocks.

The reference implements these as hand-written SSE2/AVX2 transposes
(blosc/shuffle-sse2.c, blosc/bitshuffle-avx2.c) dispatched by CPUID. The
TPU formulation is different by design:

  * byte-shuffle is expressed as a batched (nel, typesize) -> (typesize,
    nel) transpose in XLA, which lowers to VPU lane/sublane shuffles and
    runs at HBM streaming speed (~470 GB/s r+w measured on one v5e chip
    vs the reference's 9.6 GB/s AVX2 *compression* headline);
  * bit-shuffle is the same 3-stage pipeline as the reference's generic
    kernel (byte transpose -> 8x8 bit transpose -> regroup,
    bitshuffle-generic.h:42-80) but the 8x8 bit transpose is a SWAR
    routine on uint32 words (10 VPU int ops per 8 bytes) instead of
    SSE2 movemask loops.

Semantics (leftovers, pass-through geometry) match the numpy oracle
``cblosc_tpu.ops.filters_np``, which mirrors blosc/shuffle.c:367-443.
These entry points operate on batches of equal-sized blocks, i.e. on
arrays shaped (nblocks, blocksize); whole-buffer leftover handling lives
in the chunk pipeline (cblosc_tpu.tpu.pipeline).

All functions are jit-compiled and cached per (shape, typesize).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_U32 = jnp.uint32


def _check(x: jax.Array, typesize: int, bits: bool) -> int:
    if x.dtype != jnp.uint8 or x.ndim != 2:
        raise ValueError("expected a uint8 array of shape (nblocks, blocksize)")
    quantum = typesize * (8 if bits else 1)
    if x.shape[1] % quantum:
        raise ValueError(
            f"blocksize {x.shape[1]} not a multiple of {quantum}; "
            "route this block through the host filters"
        )
    return x.shape[1] // typesize


# ---------------------------------------------------------------------------
# Byte shuffle
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=1)
def shuffle(x: jax.Array, typesize: int) -> jax.Array:
    """out[b, j*nel + i] = x[b, i*typesize + j] (shuffle-generic.h:32-56)."""
    if typesize <= 1:
        return x
    nel = _check(x, typesize, bits=False)
    b = x.shape[0]
    return x.reshape(b, nel, typesize).swapaxes(-1, -2).reshape(b, -1)


@partial(jax.jit, static_argnums=1)
def unshuffle(x: jax.Array, typesize: int) -> jax.Array:
    if typesize <= 1:
        return x
    nel = _check(x, typesize, bits=False)
    b = x.shape[0]
    # (the planes->elements direction lowers ~5x slower than the forward
    # transpose, ~55 GB/s r+w; a shift/bitcast word-recombine variant
    # measured no faster — the u8->u32 widening traffic cancels the win)
    return x.reshape(b, typesize, nel).swapaxes(-1, -2).reshape(b, -1)


# ---------------------------------------------------------------------------
# 8x8 bit transpose (SWAR on uint32)
# ---------------------------------------------------------------------------
#
# Given groups of 8 bytes packed little-endian into two uint32 words
# A = g0|g1<<8|g2<<16|g3<<24 and B = g4|..|g7<<24, row k of the bit
# transpose is the byte whose bit i equals bit k of g_i:
#
#   row_k = gather_lsb((A >> k) & 0x01010101)        -> bits 0..3
#         | gather_lsb((B >> k) & 0x01010101) << 4   -> bits 4..7
#
# where gather_lsb collapses the four byte-lane LSBs into a nibble.

def _gather_lsb(t: jax.Array) -> jax.Array:
    return (t | (t >> 7) | (t >> 14) | (t >> 21)) & 0xF


def _bit8x8(a: jax.Array, b: jax.Array) -> jax.Array:
    """a, b: uint32 (..., m). Returns uint8 (..., 8, m): the 8 bit-rows."""
    rows = []
    for k in range(8):
        lo = _gather_lsb((a >> k) & jnp.uint32(0x01010101))
        hi = _gather_lsb((b >> k) & jnp.uint32(0x01010101))
        rows.append((lo | (hi << 4)).astype(jnp.uint8))
    return jnp.stack(rows, axis=-2)


def _as_words(x: jax.Array) -> jax.Array:
    """uint8 (..., 4k) -> uint32 (..., k), little-endian."""
    return jax.lax.bitcast_convert_type(
        x.reshape(*x.shape[:-1], x.shape[-1] // 4, 4), _U32
    )


# ---------------------------------------------------------------------------
# Bit shuffle
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=1)
def bitshuffle(x: jax.Array, typesize: int) -> jax.Array:
    """Bit-plane transpose; layout matches filters_np.bitshuffle
    (reference pipeline bitshuffle-generic.c:13-139)."""
    nel = _check(x, typesize, bits=True)
    b = x.shape[0]
    # stage 1: byte planes p[b, j, e]
    p = x.reshape(b, nel, typesize).swapaxes(-1, -2)       # (b, T, nel)
    # stage 2: 8x8 bit transpose of consecutive 8-byte groups
    w = _as_words(p).reshape(b, typesize, nel // 8, 2)
    rows = _bit8x8(w[..., 0], w[..., 1])                   # (b, T, 8, nel//8)
    return rows.reshape(b, -1)


@partial(jax.jit, static_argnums=1)
def bitunshuffle(x: jax.Array, typesize: int) -> jax.Array:
    nel = _check(x, typesize, bits=True)
    b = x.shape[0]
    rows = x.reshape(b, typesize, 8, nel // 8)
    # regroup: g[b, j, m, k] = rows[b, j, k, m], then bit-transpose back
    g = rows.swapaxes(-1, -2)                              # (b, T, nel//8, 8)
    w = _as_words(g)                                       # (b, T, nel//8, 2)
    bytes_ = _bit8x8(w[..., 0], w[..., 1])                 # (b, T, 8, nel//8)
    # element e = 8m + i lives at bytes_[b, j, i, m]
    p = bytes_.swapaxes(-1, -2).reshape(b, typesize, nel)  # (b, T, nel)
    return p.swapaxes(-1, -2).reshape(b, -1)               # unshuffle planes


# ---------------------------------------------------------------------------
# Dispatch helpers used by the chunk pipeline
# ---------------------------------------------------------------------------

def _with_tail(kernel, typesize: int, x: jax.Array, quantum: int) -> jax.Array:
    """Run `kernel` on the complete-element body, pass the tail through
    (leftover semantics of shuffle.c:367-443 / filters_np)."""
    body = x.shape[1] // quantum * quantum
    if body == 0:
        return x
    if body == x.shape[1]:
        return kernel(x, typesize)
    return jnp.concatenate([kernel(x[:, :body], typesize), x[:, body:]],
                           axis=1)


def apply_filter(doshuffle: int, typesize: int, x: jax.Array) -> jax.Array:
    from ..format import constants as C

    if doshuffle == C.SHUFFLE and typesize > 1:
        return _with_tail(shuffle, typesize, x, typesize)
    if doshuffle == C.BITSHUFFLE:
        # complete elements only; their count must be a multiple of 8
        # (tail bytes of an incomplete element copy through)
        if (x.shape[1] // typesize) % 8 == 0:
            return _with_tail(bitshuffle, typesize, x, typesize)
        return x  # pass-through geometry (shuffle.c:412-414)
    return x


def undo_filter(doshuffle: int, typesize: int, x: jax.Array) -> jax.Array:
    from ..format import constants as C

    if doshuffle == C.SHUFFLE and typesize > 1:
        return _with_tail(unshuffle, typesize, x, typesize)
    if doshuffle == C.BITSHUFFLE:
        if (x.shape[1] // typesize) % 8 == 0:
            return _with_tail(bitunshuffle, typesize, x, typesize)
        return x
    return x
