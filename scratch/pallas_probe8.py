"""Probe s8: cost of Pallas primitives on v5e — grid-step overhead,
static tile copies, dynamic sublane loads/stores, butterfly rolls.
Usage: python pallas_probe8.py --real (interpret mode is pointless here).
"""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32


def timeit(f, x, reps=30):
    y = f(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    return (time.perf_counter() - t0 - 0.035) / reps


N = 4096
x = jnp.asarray(np.random.default_rng(0).integers(
    0, 256, (N, 16, 128), np.int64).astype(np.int32))

# k1: per-grid-step overhead (trivial copy kernel, N steps)
def k1(x):
    def kern(x_ref, o_ref):
        o_ref[0] = x_ref[0]
    return pl.pallas_call(
        kern, grid=(N,),
        in_specs=[pl.BlockSpec((1, 16, 128), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, 16, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 16, 128), jnp.int32),
    )(x)

t = timeit(jax.jit(k1), x)
print(f"k1 per-step overhead : {t*1e3:8.2f} ms total, {t/N*1e9:8.1f} ns/step")

ITER = 16384

# k2: static tile ops in one step
def k2(x):
    def kern(x_ref, o_ref, sc):
        sc[:, :] = x_ref[0, 0]
        def body(i, acc):
            sc[8:16, :] = sc[0:8, :] * 1 + acc
            return acc + 1
        jax.lax.fori_loop(0, ITER, body, jnp.int32(0))
        o_ref[0, 0] = sc[:, :]
    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
    )(x[:1][:, None])

t = timeit(jax.jit(k2), x)
print(f"k2 static (8,128) RMW: {t*1e3:8.2f} ms total, {t/ITER*1e9:8.1f} ns/iter")

# k3: dynamic sublane loads in one step
def k3(x):
    def kern(x_ref, o_ref, sc):
        def body(i, carry):
            blk, acc = carry
            w = x_ref[0, pl.ds(blk, 2), :]
            s = jnp.sum(w)
            return ((blk + (s & 3) + 1) % 14, acc + s)
        _, acc = jax.lax.fori_loop(0, ITER, body, (0, jnp.int32(0)))
        o_ref[0, 0] = x_ref[0, 0] * 0 + acc
    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
    )(x[:1][:, None])

t = timeit(jax.jit(k3), x)
print(f"k3 dynamic subl load : {t*1e3:8.2f} ms total, {t/ITER*1e9:8.1f} ns/iter")

# k4: dynamic sublane RMW store in one step
def k4(x):
    def kern(x_ref, o_ref, sc):
        sc[:, :] = x_ref[0, 0]
        def body(i, carry):
            blk, acc = carry
            cur = sc[pl.ds(blk, 8), :]
            sc[pl.ds(blk, 8), :] = cur + 1
            s = jnp.sum(cur[0, :])
            return ((blk + (s & 3) + 1) % 8, acc + s)
        _, acc = jax.lax.fori_loop(0, ITER, body, (0, jnp.int32(0)))
        o_ref[0, 0] = sc[:, :] * 0 + acc
    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
    )(x[:1][:, None])

t = timeit(jax.jit(k4), x)
print(f"k4 dynamic subl RMW  : {t*1e3:8.2f} ms total, {t/ITER*1e9:8.1f} ns/iter")

# k5: butterfly roll of (9,128) in one step
def k5(x):
    def kern(x_ref, o_ref, sc):
        sc[:, :] = x_ref[0, 0]
        def body(i, carry):
            rot, acc = carry
            v = sc[0:9, :]
            for b in range(7):
                amt = 1 << b
                rolled = jnp.concatenate([v[:, amt:], v[:, :amt]], axis=1)
                v = jnp.where((rot >> b) & 1 == 1, rolled, v)
            s = jnp.sum(v[0])
            return ((rot + (s & 7) + 1) % 128, acc + s)
        _, acc = jax.lax.fori_loop(0, ITER, body, (0, jnp.int32(0)))
        o_ref[0, 0] = sc[:, :] * 0 + acc
    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 1, 16, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
    )(x[:1][:, None])

t = timeit(jax.jit(k5), x)
print(f"k5 butterfly roll 9x : {t*1e3:8.2f} ms total, {t/ITER*1e9:8.1f} ns/iter")
