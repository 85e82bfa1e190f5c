"""Probe s9: rotation alternatives + predication costs on v5e."""
import sys, time
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
ITER = 16384


def timeit(f, x, reps=30):
    y = f(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        y = f(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    return (time.perf_counter() - t0 - 0.035) / reps


x = jnp.asarray(np.random.default_rng(0).integers(
    0, 256, (1, 1, 16, 128), np.int64).astype(np.int32))


def one_step(body_factory, label, correct=None):
    def k(x):
        def kern(x_ref, o_ref, sc):
            sc[:, :] = x_ref[0, 0]
            body = body_factory(sc)
            _, acc = jax.lax.fori_loop(0, ITER, body, (0, jnp.int32(0)))
            o_ref[0, 0] = sc[:, :] * 0 + acc
        return pl.pallas_call(
            kern, grid=(1,),
            in_specs=[pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0))],
            out_specs=pl.BlockSpec((1, 1, 16, 128), lambda r: (r, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1, 16, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((16, 128), jnp.int32)],
        )(x)
    try:
        t = timeit(jax.jit(k), x)
        print(f"{label}: {t*1e3:8.2f} ms total, {t/ITER*1e9:8.1f} ns/iter",
              flush=True)
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


# k6: native dynamic roll on (9,128) lanes
def k6(sc):
    def body(i, carry):
        rot, acc = carry
        v = pltpu.roll(sc[0:9, :], rot, 1)
        s = jnp.sum(v[0])
        return ((rot + (s & 7) + 1) % 128, acc + s)
    return body
one_step(k6, "k6 pltpu.roll dyn lanes")

# k6b: native dynamic roll on sublanes of (16,128)
def k6b(sc):
    def body(i, carry):
        rot, acc = carry
        v = pltpu.roll(sc[:, :], rot, 0)
        s = jnp.sum(v[0])
        return ((rot + (s & 7) + 1) % 16, acc + s)
    return body
one_step(k6b, "k6b pltpu.roll dyn subl")

# k7: predicated-off tile body
def k7(sc):
    def body(i, carry):
        rot, acc = carry
        @pl.when(rot > 200)        # never true
        def _():
            sc[8:16, :] = sc[0:8, :] + 1
        return ((rot + 1) % 128, acc + 1)
    return body
one_step(k7, "k7 predicated-off tile ")

# k8: MXU permutation rotate (9,128)@(128,128)
def k8(sc):
    lane = jax.lax.broadcasted_iota(I32, (128, 128), 0)
    col = jax.lax.broadcasted_iota(I32, (128, 128), 1)
    def body(i, carry):
        rot, acc = carry
        perm = (col == (lane + rot) % 128).astype(jnp.float32)
        v = jax.lax.dot_general(
            sc[0:8, :].astype(jnp.float32), perm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(I32)
        s = jnp.sum(v[0])
        return ((rot + (s & 7) + 1) % 128, acc + s)
    return body
one_step(k8, "k8 MXU perm rotate     ")

# k9: dynamic-byte broadcast (splat source read)
def k9(sc):
    def body(i, carry):
        off, acc = carry
        sub = off // 128
        lane = off % 128
        w = sc[pl.ds(sub, 1), :]
        b = jnp.sum(jnp.where(
            jax.lax.broadcasted_iota(I32, (1, 128), 1) == lane, w, 0))
        return ((off + (b & 7) + 1) % 2048, acc + b)
    return body
one_step(k9, "k9 dyn byte extract    ")
