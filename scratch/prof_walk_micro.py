"""Micro-profile walk-v2 building blocks on the real chip."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32
BF16 = jnp.bfloat16
R, B, WB = 1024, 17, 4     # clevel-1 geometry: 2176-byte slots
WINW = WB * 128

rng = np.random.default_rng(0)
slots = jnp.asarray(rng.integers(0, 256, (R, B * 128), np.uint8))
src3 = slots.reshape(R, B, 128).astype(BF16)
csizes = jnp.asarray(np.full(R, 16, np.int32))


def timeit(fn, x, reps=20):
    @jax.jit
    def many(x):
        def body(i, x):
            return jnp.where(fn(x) % 2 == 0, x, x + 1)
        return jax.lax.fori_loop(0, reps, body, x)
    y = many(x); _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    return (time.perf_counter() - t0 - 0.035) / reps


wwi = jnp.arange(WINW, dtype=I32)[None, :]
swi = jnp.arange(64, dtype=I32)[None, :]


def onehot_rows(idx, k, n):
    b = jnp.arange(n, dtype=I32)[None, None, :]
    j = jnp.arange(k, dtype=I32)[None, :, None]
    return (b == idx[:, None, None] + j).astype(BF16)


# A: window einsum alone (chained)
def stepA(ip):
    ipblk = jnp.clip(ip // 128, 0, B - WB)
    oh = onehot_rows(ipblk, WB, B)
    win = jnp.einsum("rwb,rbl->rwl", oh, src3,
                     preferred_element_type=jnp.float32).reshape(R, WINW)
    return ip + (win[:, 0].astype(I32) % 3)

ip0 = jnp.zeros((R,), I32)
t = timeit(lambda ip: stepA(ip)[0].astype(I32), ip0)
print(f"A window einsum      : {t*1e6:9.1f} us/iter  ({t/R*1e9:6.1f} ns/row)")

# B: 8 subwindow einsums from one window
win16 = jnp.asarray(rng.integers(0, 255, (R, 16, 32), np.float32))
def stepB(q):
    acc = q * 0
    for t_ in range(8):
        qrow = (q + t_) % 14
        sub = jnp.einsum("rjb,rbl->rjl",
                         onehot_rows(qrow, 2, 16).astype(jnp.float32),
                         win16, preferred_element_type=jnp.float32,
                         ).reshape(R, 64).astype(I32)
        acc = acc + sub[:, 0]
    return acc
t = timeit(lambda q: stepB(q)[0], ip0)
print(f"B 8 subwin einsums   : {t*1e6:9.1f} us/iter  ({t/R*1e9:6.1f} ns/row)")

# C: 64 sels over a subwindow (approximating 8 steps x 8 sels)
sub0 = jnp.asarray(rng.integers(0, 255, (R, 64), np.int32))
def stepC(q):
    acc = q * 0
    for t_ in range(64):
        off = (q + t_) % 60
        acc = acc + jnp.sum(jnp.where(swi == off[:, None], sub0, 0), axis=1)
    return acc
t = timeit(lambda q: stepC(q)[0], ip0)
print(f"C 64 masked sels     : {t*1e6:9.1f} us/iter  ({t/R*1e9:6.1f} ns/row)")

# D: one cumprod-based ext count x8 (the heaviest per-step reduction)
def stepD(q):
    acc = q * 0
    for t_ in range(8):
        sq = (q + t_) % 30
        inm = (swi >= sq[:, None]) & (swi < sq[:, None] + 8)
        lead = jnp.cumprod(jnp.where(swi < sq[:, None], 1,
                           (jnp.where(inm, sub0, -1) == 255).astype(I32)),
                           axis=1)
        acc = acc + jnp.sum(jnp.where(swi >= sq[:, None], lead, 0), axis=1)
    return acc
t = timeit(lambda q: stepD(q)[0], ip0)
print(f"D 8 cumprod counts   : {t*1e6:9.1f} us/iter  ({t/R*1e9:6.1f} ns/row)")

# E: vmapped dynamic_slice baseline (the v1 cost model)
def stepE(ip):
    def one(s, i):
        return jax.lax.dynamic_slice(s, (jnp.clip(i, 0, B*128-16),), (16,))
    w = jax.vmap(one)(slots.astype(I32), ip)
    return ip + (w[:, 0] % 3)
t = timeit(lambda ip: stepE(ip)[0], ip0)
print(f"E vmapped dyn_slice  : {t*1e6:9.1f} us/iter  ({t/R*1e9:6.1f} ns/row)")
