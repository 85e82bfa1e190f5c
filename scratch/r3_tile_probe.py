"""Isolate the slow piece of the whole-batch tile placement (r3).

Runs each internal stage of _pure_tile_place / the new
_decode_core_kernel glue at full batch (32768 x 2048) with chained
timing. Also times decode with CBLOSC_TPU_PURETILE=0 for the
kernel-only whole-batch reference.
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, filters, pipeline, structured
from cblosc_tpu.utils.timing import readback_latency, synth

U8, I32 = jnp.uint8, jnp.int32
clevel = 1
reps = 8
ws = 64 << 20
typesize, sbits, doshuffle = 8, 19, 1
blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
nsplits = policy.nsplits_encode(
    not policy.split_block(C.BLOSCLZ, typesize, blocksize), typesize, False)
neblock = blocksize // nsplits
nblocks = ws // blocksize
total = nblocks * blocksize
data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
x = jax.device_put(jnp.asarray(data))
slots0, csizes0 = pipeline.compress_blocks(
    x, doshuffle, typesize, nsplits,
    policy.device_min_bytes_per_iter(clevel), C.BLOSCLZ,
    policy.device_min_cratio_x100(clevel), policy.device_mine(clevel))
slots0 = pipeline.mask_past_csize(slots0, csizes0, slots0.shape[1])
dec_cs = jnp.where(csizes0 >= neblock, 0, csizes0)
slots0.block_until_ready()
N, W = slots0.shape
out_len = neblock


def timeit(name, step, arr, nbytes=total, r=reps):
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


# whole-batch walk outputs (sorted order like _decode_core_kernel)
maxrec = structured.max_records(out_len)
Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
slw = jnp.pad(slots0, ((0, 0), (0, Wpad - W)))
order = jnp.argsort(dec_cs)
sl = jnp.take(slw, order, axis=0)
cs = jnp.take(dec_cs, order)
group = structured._group_rows(out_len, maxrec)
g = N // group
recs, dist, uni, okf = jax.lax.map(
    lambda t: structured._walk_batch(t[0], t[1], out_len, maxrec),
    (sl.reshape(g, group, sl.shape[1]), cs.reshape(g, group)))
recs = tuple(f.reshape(N, -1) for f in recs)
dist, uni, okf = dist.reshape(-1), uni.reshape(-1), okf.reshape(-1)
recs[0].block_until_ready()
valid = recs[0] >= 0
print(f"N {N} W {W} maxrec {maxrec} group {group}", flush=True)


def grouped_walk(a):
    r2, d2, u2, o2 = jax.lax.map(
        lambda t: structured._walk_batch(t[0], t[1], out_len, maxrec),
        (a.reshape(g, group, a.shape[1]), cs.reshape(g, group)))
    return r2[0][0, 0, 0] + d2.sum().astype(I32)


timeit("grouped walk (map, returns recs)", grouped_walk, sl)


def elig_f(a):
    e = structured.pure_tile_eligible(recs, valid, dist, uni, okf, cs,
                                      out_len)
    return e.sum().astype(I32) + a[0, 0].astype(I32)


timeit("pure_tile_eligible (batch)", elig_f, sl)

elig = structured.pure_tile_eligible(recs, valid, dist, uni, okf, cs,
                                     out_len) & okf & (cs > 0)
elig.block_until_ready()
print("elig rows:", int(elig.sum()), "/", N, flush=True)


def krecs_f(a):
    kr = jnp.where(elig[:, None], -1, recs[0])
    return kr[0, 0] + a[0, 0].astype(I32)


timeit("krecs invalidate (batch)", krecs_f, sl)


def tile_f(a):
    out, _ = structured._pure_tile_place(a, cs, recs, valid, dist, elig,
                                         out_len)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("_pure_tile_place (batch)", tile_f, sl)

# internals of _pure_tile_place
Pw = min(structured._PUREW, sl.shape[1])
pre = sl[:, :Pw]
kind = recs[0]
dsto = recs[2]
d2d = jnp.maximum(dist, 1)[:, None]
lit_pre = valid & elig[:, None] & (kind == 0) & (dsto < d2d)


def litgeo_f(a):
    in_lit, dst_p = structured._lit_geometry(
        a[:, :Pw], cs, recs, lit_pre, out_len)
    return dst_p[0, 0] + in_lit.sum().astype(I32)


timeit("  _lit_geometry", litgeo_f, sl)

in_lit0, dst_p0 = structured._lit_geometry(pre, cs, recs, lit_pre, out_len)
p_ar = jnp.arange(Pw, dtype=I32)[None, :]
live0 = in_lit0 & (p_ar < cs[:, None]) & (dst_p0 >= 0) & (dst_p0 < d2d)


def patsort_f(a):
    key = jnp.where(live0, (dst_p0 << 8) | a[:, :Pw].astype(I32),
                    structured._BIGI)
    pat = jax.lax.sort(key, dimension=1)[:, :256] & 0xFF
    return pat[0, 0] + pat[-1, -1]


timeit("  pattern sort", patsort_f, sl)

key0 = jnp.where(live0, (dst_p0 << 8) | pre.astype(I32), structured._BIGI)
pat0 = jax.lax.sort(key0, dimension=1)[:, :256] & 0xFF
col = jnp.arange(256, dtype=I32)[None, :]


def doubling_f(a):
    pat = pat0 + (a[0, 0].astype(I32) % 2)
    for k in range(8):
        w = 1 << k
        shifted = pat[:, (np.arange(256) & ~w)]
        pat = jnp.where((d2d <= w) & ((col & w) != 0), shifted, pat)
    return pat[0, 0] + pat[-1, -1]


timeit("  doubling (8 passes)", doubling_f, sl)


def bcast_f(a):
    pat8 = (pat0 + (a[0, 0].astype(I32) % 2)).astype(U8)
    tiles = out_len // 256
    out = jnp.broadcast_to(pat8[:, None, :], (N, tiles, 256))
    tile_i = jnp.arange(tiles, dtype=I32)[None, :, None]
    is_tail = (tile_i == tiles - 1) & (col[:, None, :] == 255)
    out = jnp.where(is_tail, jnp.uint8(7), out).reshape(N, out_len)
    return out[0, 0].astype(I32) + out[-1, -1].astype(I32)


timeit("  broadcast+tail+reshape", bcast_f, sl)

print("done", flush=True)
