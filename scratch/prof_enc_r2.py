"""Encoder phase profiling: where do the 1.4 ns/B go?"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp
from cblosc_tpu.tpu import codec

I32 = jnp.int32


def timeit(fn, x, reps=10):
    @jax.jit
    def many(x):
        def body(i, x):
            r = fn(x)
            return x.at[0, 0].set(x[0, 0] ^ (r % 2).astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x)
    y = many(x); _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    t0 = time.perf_counter()
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:4].astype(jnp.float32)))
    return (time.perf_counter() - t0 - 0.035) / reps


def profile(N, n, label):
    total = N * n
    rng = np.random.default_rng(0)
    parts = []
    for i in range(N):
        k = i % 4
        if k == 0:
            parts.append(np.zeros(n, np.uint8))
        elif k == 1:
            parts.append(np.tile(np.arange(128, dtype=np.uint8), n // 128))
        elif k == 2:
            parts.append(rng.integers(0, 8, n).astype(np.uint8) * 32)
        else:
            parts.append(rng.integers(0, 256, n, dtype=np.uint8))
    s_np = np.stack(parts)
    s = jnp.asarray(s_np)
    print(f"-- {label}: N={N} n={n} ({total>>20} MB)")

    dists = codec.DISTANCES
    idx = jnp.arange(n, dtype=I32)

    def ph1(s):
        eqs, covs = [], []
        for d in dists:
            prev = jnp.concatenate([s[:, :d], s[:, :-d]], axis=1)
            e = (s == prev) & (idx >= d) & (idx < n - 1)
            eqs.append(e)
            covs.append(jnp.sum((e[:, 2:] & e[:, 1:-1] & e[:, :-2]).astype(I32), axis=1))
        stack = jnp.stack(covs, 0)
        best = jnp.argmin(-stack, axis=0)
        eq = eqs[0]
        for k in range(1, len(dists)):
            eq = jnp.where((best == k)[:, None], eqs[k], eq)
        return eq, jnp.asarray(dists, I32)[best][:, None]

    t = timeit(lambda s: ph1(s)[0][:, 0].astype(I32).sum(), s)
    print(f"  ph1 distance select : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s")

    eq, d_row = jax.jit(ph1)(s)
    eq.block_until_ready()

    def ph2(s):
        noneq = jnp.where(eq, -1, idx)
        run_start = jax.lax.cummax(noneq, axis=1) + 1
        nxt = jnp.where(eq, n, idx)
        next_noneq = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
        runlen = next_noneq - run_start
        is_match = eq & (runlen >= 3)
        roff = idx - run_start
        tail_rem = runlen % 1024
        short_tail = (tail_rem > 0) & (tail_rem < 3)
        eff_len = jnp.where(short_tail, runlen - tail_rem, runlen)
        is_match &= roff < eff_len
        return is_match.astype(I32)[:, 0].sum() + runlen[:, -1].sum()
    t = timeit(ph2, s)
    print(f"  ph2 match segment   : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s")

    # layout cumsum alone
    def ph4(s):
        c = (s > 3).astype(I32)
        off = jnp.cumsum(c, axis=1) - c
        return off[:, -1].sum()
    t = timeit(ph4, s)
    print(f"  ph4 layout cumsum   : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s")

    # emission sort alone (1.25n i32 keys)
    keys = jnp.asarray(rng.integers(0, 1 << 28, (N, n + n // 4), np.int32))
    def ph5(k):
        return jax.lax.sort(k, dimension=1)[:, 0].sum()
    t = timeit(ph5, keys)
    print(f"  ph5 emission sort   : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s "
          f"({t/ (N*(n+n//4)) *1e9:.2f} ns/key)")

    # full encode
    def full(s):
        slots, cs, est = codec.encode(s)
        return cs.sum() + slots[0, 0].astype(I32)
    t = timeit(full, s)
    print(f"  full encode         : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s")


profile(8192, 2048, "clevel1 splits")
profile(1024, 16384, "clevel5 splits")
