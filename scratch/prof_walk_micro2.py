"""Micro-profile window-read alternatives on the real chip."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

I32 = jnp.int32

rng = np.random.default_rng(0)


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


def bench_geom(R, B, label):
    WB = 4
    slots = jnp.asarray(rng.integers(0, 256, (R, B * 128), np.uint8))
    src3i = slots.reshape(R, B, 128).astype(I32)
    src3f = slots.reshape(R, B, 128).astype(jnp.float32)
    ip0 = jnp.zeros((R,), I32)
    print(f"-- {label}: R={R} B={B}")

    # A2: mask-sum reduction, one block at a time
    def stepA2(ip):
        ipblk = jnp.clip(ip // 128, 0, B - WB)
        b = jnp.arange(B, dtype=I32)[None, :, None]
        win = []
        for w in range(WB):
            m = (b == (ipblk[:, None, None] + w))
            win.append(jnp.sum(jnp.where(m, src3i, 0), axis=1))
        win = jnp.concatenate(win, axis=1)
        return ip + (win[:, 0] % 3)
    t = timeit(lambda ip: stepA2(ip)[0], ip0)
    print(f"  A2 mask-sum i32      : {t*1e6:9.1f} us/iter ({t/R*1e9:7.1f} ns/row)")

    # A3: take_along_axis block gather
    def stepA3(ip):
        ipblk = jnp.clip(ip // 128, 0, B - WB)
        idx = ipblk[:, None] + jnp.arange(WB, dtype=I32)[None, :]
        win = jnp.take_along_axis(src3i, idx[:, :, None], axis=1)
        win = win.reshape(R, WB * 128)
        return ip + (win[:, 0] % 3)
    t = timeit(lambda ip: stepA3(ip)[0], ip0)
    print(f"  A3 take_along blocks : {t*1e6:9.1f} us/iter ({t/R*1e9:7.1f} ns/row)")

    # A4: one-hot mask-sum in f32 over (R, WB, B, 128) broadcast
    def stepA4(ip):
        ipblk = jnp.clip(ip // 128, 0, B - WB)
        b = jnp.arange(B, dtype=I32)[None, None, :]
        w = jnp.arange(WB, dtype=I32)[None, :, None]
        oh = (b == ipblk[:, None, None] + w).astype(jnp.float32)
        win = jnp.sum(oh[:, :, :, None] * src3f[:, None, :, :], axis=2)
        win = win.reshape(R, WB * 128)
        return ip + (win[:, 0].astype(I32) % 3)
    t = timeit(lambda ip: stepA4(ip)[0], ip0)
    print(f"  A4 bcast mul-sum f32 : {t*1e6:9.1f} us/iter ({t/R*1e9:7.1f} ns/row)")

    # A5: vmapped dynamic_slice on flat rows (v1 baseline)
    slotsi = slots.astype(I32)
    def stepA5(ip):
        def one(s, i):
            return jax.lax.dynamic_slice(
                s, (jnp.clip(i, 0, B * 128 - 512),), (512,))
        w = jax.vmap(one)(slotsi, ip)
        return ip + (w[:, 0] % 3)
    t = timeit(lambda ip: stepA5(ip)[0], ip0)
    print(f"  A5 vmap dyn_slice 512: {t*1e6:9.1f} us/iter ({t/R*1e9:7.1f} ns/row)")


bench_geom(1024, 17, "clevel1 geometry")
bench_geom(128, 133, "clevel5 geometry")
bench_geom(1024, 5, "narrow slots")
