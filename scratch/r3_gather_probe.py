"""Probe: per-row gather throughput at the decode placement shape.

If take_along_axis((rows, W) u8, (rows, out_len) idx) runs at tens of
GB/s, a one-gather tile decoder for prefix+periodic rows beats the
expand kernel by an order of magnitude at small out_len.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.utils.timing import readback_latency

I32 = jnp.int32
U8 = jnp.uint8

rows, W, out_len = 32768, 2112, 2048
reps = 16

rng = np.random.default_rng(0)
slots = jnp.asarray(rng.integers(0, 256, (rows, W), np.uint8))
p = jnp.asarray(rng.integers(8, 64, (rows, 1)).astype(np.int32))
d = jnp.asarray((2 ** rng.integers(0, 6, (rows, 1))).astype(np.int32))


def timeit(name, step, arr, nbytes, r=reps):
    last = arr.shape[1] - 1

    @jax.jit
    def many(a):
        def body(i, a):
            v = step(a)
            return a.at[0, last].set(a[0, last] ^ (v % 2).astype(a.dtype))
        return jax.lax.fori_loop(0, r, body, a)

    y = many(arr)
    flat = y.reshape(-1)
    _ = float(jnp.sum(flat[:8].astype(jnp.int32)))
    lat = readback_latency(jnp, flat)
    t0 = time.perf_counter()
    y = many(arr)
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    el = max(time.perf_counter() - t0 - lat, 1e-9) / r
    print(f"{name:46s} {el*1e3:9.3f} ms  {nbytes/el/1e9:8.2f} GB/s",
          flush=True)
    return el


nbytes = rows * out_len
j = jnp.arange(out_len, dtype=I32)[None, :]


def tile_gather(a):
    idx = jnp.where(j < p, j, p - d + (j - p) % d)
    out = jnp.take_along_axis(a, jnp.clip(idx, 0, W - 1), axis=1)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("tile gather (mod idx + take_along_axis)", tile_gather, slots,
       nbytes)


def plain_gather(a):
    idx = (j * 7 + 3) % W
    out = jnp.take_along_axis(a, jnp.broadcast_to(idx, (rows, out_len)),
                              axis=1)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("plain gather (shared idx)", plain_gather, slots, nbytes)


def small_window_gather(a):
    # indices bounded to the first 128 bytes per row: does locality help?
    idx = jnp.where(j < p, j, (j - p) % jnp.maximum(d, 1))
    out = jnp.take_along_axis(a, jnp.clip(idx, 0, 127), axis=1)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("small-window gather (idx < 128)", small_window_gather, slots,
       nbytes)


def i32_gather(a):
    # same gather in int32 lanes (4 bytes per element)
    a32 = jax.lax.bitcast_convert_type(
        a.reshape(rows, W // 4, 4), jnp.int32).reshape(rows, W // 4)
    idx = jnp.where(j[:, : out_len // 4] < p // 4, j[:, : out_len // 4],
                    (j[:, : out_len // 4] - p // 4) % jnp.maximum(d, 1))
    out = jnp.take_along_axis(a32, jnp.clip(idx, 0, W // 4 - 1), axis=1)
    return out[0, 0] + out[-1, -1]


timeit("int32-lane gather (d%4==0 case)", i32_gather, slots, nbytes)


# roll-based tiling: build (rows, 256) pattern by doubling, then ONE
# broadcast; no gather at all (alignment handled by masked doubling)
def doubling_tile(a):
    pat = a[:, :256].astype(I32)
    col = jnp.arange(256, dtype=I32)[None, :]
    for k in range(8):
        w = 1 << k
        shifted = pat[:, (np.arange(256) & ~w)]
        pat = jnp.where((d <= w) & ((col & w) != 0), shifted, pat)
    out = jnp.broadcast_to(pat.astype(U8)[:, None, :],
                           (rows, out_len // 256, 256)).reshape(
                               rows, out_len)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("doubling tile (pat + broadcast)", doubling_tile, slots, nbytes)

print("done", flush=True)
