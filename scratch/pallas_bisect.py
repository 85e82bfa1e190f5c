"""Bisect which Pallas constructs crash the real chip.

Usage: python pallas_bisect.py <stage> [--real]
Stages run interpret-mode by default; --real dispatches on the chip.
Run each --real stage in its OWN process (a crash wedges the queue).

Stages:
  s0  static elementwise kernel
  s1  fori_loop accumulation, static indexing
  s2  dynamic pl.ds on the SUBLANE (second-to-last) dim
  s3  dynamic pl.ds on the LANE (last) dim, 128-aligned via multiple_of
  s4  scalar SMEM reads driving dynamic sublane loads (walk-shaped)
  s5  round-1 probe kernel shape (lane-dim window + iota mask extract)
  s6  grid over rows + per-row fori walk with sublane-dim windows
"""
import sys
import functools
import numpy as np

REAL = "--real" in sys.argv
if not REAL:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

INTERP = not REAL


def run(stage):
    if stage == "s0":
        def kernel(x_ref, o_ref):
            o_ref[:, :] = x_ref[:, :] * 2 + 1

        x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert np.array_equal(np.asarray(y), np.asarray(x) * 2 + 1)
        return "s0 ok"

    if stage == "s1":
        def kernel(x_ref, o_ref):
            def body(i, acc):
                return acc + x_ref[i, :]
            acc = jax.lax.fori_loop(
                0, 8, body, jnp.zeros((256,), jnp.int32))
            o_ref[0, :] = acc

        x = jnp.arange(8 * 256, dtype=jnp.int32).reshape(8, 256)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 256), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert np.array_equal(np.asarray(y)[0], np.asarray(x).sum(0))
        return "s1 ok"

    if stage == "s2":
        # dynamic SUBLANE index from data (chained, can't hoist)
        def kernel(x_ref, o_ref):
            def body(i, carry):
                row, acc = carry
                v = x_ref[pl.ds(row, 1), :]
                s = jnp.sum(v)
                return ((row + s) % 64, acc + s)
            _, acc = jax.lax.fori_loop(0, 128, body, (0, jnp.int32(0)))
            o_ref[0, 0] = acc

        x = jnp.ones((64, 128), jnp.int32)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert int(np.asarray(y)[0, 0]) == 128 * 128
        return "s2 ok"

    if stage == "s3":
        # dynamic LANE offset, forced 128-aligned
        def kernel(x_ref, o_ref):
            def body(i, carry):
                off, acc = carry
                base = pl.multiple_of((off // 128) * 128, 128)
                w = x_ref[0, pl.ds(base, 128)]
                s = jnp.sum(w)
                return ((off + s) % 1024, acc + s)
            _, acc = jax.lax.fori_loop(0, 64, body, (0, jnp.int32(0)))
            o_ref[0, 0] = acc

        x = jnp.ones((1, 2048), jnp.int32)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert int(np.asarray(y)[0, 0]) == 64 * 128
        return "s3 ok"

    if stage == "s4":
        # walk-shaped: rows as (n/128, 128); per-iter dynamic sublane window
        def kernel(x_ref, o_ref):
            def body(i, carry):
                blk, acc = carry
                w = x_ref[pl.ds(blk, 2), :]          # (2, 128) window
                s = jnp.sum(w)
                return ((blk + (s & 3) + 1) % 15, acc + s)
            _, acc = jax.lax.fori_loop(0, 256, body, (0, jnp.int32(0)))
            o_ref[0, 0] = acc

        x = jnp.ones((16, 128), jnp.int32)
        f = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert int(np.asarray(y)[0, 0]) == 256 * 256
        return "s4 ok"

    if stage == "s5":
        # round-1 probe shape: 8-row tile, lane-dim 256-wide window + mask
        ROWS, N, WIN, ITERS = 64, 8192, 8, 128

        def kernel(x_ref, o_ref):
            accs = []
            for r in range(8):
                def body(i, carry):
                    off, acc = carry
                    base = pl.multiple_of((off // 128) * 128, 128)
                    w = x_ref[r, pl.ds(base, 256)]
                    sub = off - base
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (256, 1), 0).reshape(256)
                    s = jnp.sum(jnp.where(
                        (lane >= sub) & (lane < sub + WIN), w, 0))
                    off = (off + (s & 0x7) + 1) % (N - 256)
                    return off, acc + s
                _, acc = jax.lax.fori_loop(0, ITERS, body, (0, jnp.int32(0)))
                accs.append(acc)
            o_ref[:, :] = jnp.stack(accs).reshape(8, 1)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.integers(0, 7, (ROWS, N)).astype(np.int32))
        f = pl.pallas_call(
            kernel, grid=(ROWS // 8,),
            in_specs=[pl.BlockSpec((8, N), lambda r: (r, 0))],
            out_specs=pl.BlockSpec((8, 1), lambda r: (r, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, 1), jnp.int32),
            interpret=INTERP)
        y = f(x)
        return f"s5 ok sum0={int(np.asarray(y)[0, 0])}"

    if stage == "s6":
        # grid over row-groups; per-row serial walk via sublane windows
        ROWS, B = 32, 16   # rows of (B,128) blocks

        def kernel(x_ref, o_ref):
            # x_ref: (8, B, 128) one group of 8 rows
            accs = []
            for r in range(8):
                def body(i, carry):
                    blk, acc = carry
                    w = x_ref[r, pl.ds(blk, 2), :]
                    s = jnp.sum(w)
                    return ((blk + (s & 3) + 1) % (B - 2), acc + s)
                _, acc = jax.lax.fori_loop(0, 64, body, (0, jnp.int32(0)))
                accs.append(acc)
            o_ref[:, :] = jnp.stack(accs).reshape(8, 1)

        x = jnp.ones((ROWS, B, 128), jnp.int32)
        f = pl.pallas_call(
            kernel, grid=(ROWS // 8,),
            in_specs=[pl.BlockSpec((8, B, 128), lambda r: (r, 0, 0))],
            out_specs=pl.BlockSpec((8, 1), lambda r: (r, 0)),
            out_shape=jax.ShapeDtypeStruct((ROWS, 1), jnp.int32),
            interpret=INTERP)
        y = f(x)
        assert int(np.asarray(y)[0, 0]) == 64 * 256
        return "s6 ok"

    raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    stage = sys.argv[1]
    mode = "REAL" if REAL else "interpret"
    print(f"[{mode}] running {stage}...", flush=True)
    print(run(stage), flush=True)
