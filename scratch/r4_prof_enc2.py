"""Round-4 encode micro-stages at clevel 1: where do the ~17 ms go?

Stages: _score (slice rewrite), whole-batch _emit_pure, the NORMAL-row
emission map, the class layout takes, and compress_blocks' stored-raw
postlude — plus the class census (how many rows take each path).

Usage: python scratch/r4_prof_enc2.py [reps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, filters, pipeline
from cblosc_tpu.utils.timing import carry_chained, readback_latency, synth

I32 = jnp.int32
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ws = int(sys.argv[2]) if len(sys.argv) > 2 else 64 << 20
typesize, sbits, doshuffle, clevel = 8, 19, 1, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
nsplits = policy.nsplits_encode(
    not policy.split_block(C.BLOSCLZ, typesize, blocksize), typesize, False)
neblock = blocksize // nsplits
nblocks = ws // blocksize
total = nblocks * blocksize
mincr = policy.device_min_cratio_x100(clevel)
mbpi = policy.device_min_bytes_per_iter(clevel)

data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
x = jax.device_put(jnp.asarray(data))
streams = filters.apply_filter(doshuffle, typesize, x).reshape(
    nblocks * nsplits, neblock)
streams.block_until_ready()
N, n = streams.shape
W = codec.slot_width(n)

# class census
d_row, pure, cov, tot = jax.jit(
    lambda a: codec._score(a, codec.DISTANCES))(streams)
est_csize = n - cov + cov // 170 + n // 33 + 16
hopeless = (~np.asarray(pure)) & (100 * n < mincr * np.asarray(est_csize))
print(f"rows {N} n {n}: pure {int(np.asarray(pure).sum())} hopeless "
      f"{int(hopeless.sum())} normal "
      f"{int((~np.asarray(pure) & ~hopeless).sum())}", flush=True)


def timeit(name, step, arr, nbytes=total, r=reps):
    import jax

    many = carry_chained(step, r, flip_pos=0)
    y = jax.tree_util.tree_leaves(many(arr))[0]
    flat = y.reshape(-1)
    _ = float(jnp.sum(flat[:8].astype(jnp.int32)))
    lat = readback_latency(jnp, flat)
    t0 = time.perf_counter()
    y = jax.tree_util.tree_leaves(many(arr))[0]
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    el = max(time.perf_counter() - t0 - lat, 1e-9) / r
    print(f"{name:46s} {el*1e3:9.3f} ms  {nbytes/el/1e9:8.2f} GB/s",
          flush=True)
    return el


def full(a):
    slots, csizes = pipeline.compress_blocks(
        a, doshuffle, typesize, nsplits, mbpi, C.BLOSCLZ, mincr, False)
    return (slots, csizes)


timeit("compress_blocks (full)", full, x)


def score_only(a):
    d_row2, pure2, cov2, tot2 = codec._score(a, codec.DISTANCES)
    return (d_row2, pure2, cov2, tot2)


timeit("_score (slices)", score_only, streams)


def pure_only(a):
    sl, cs, es = codec._emit_pure(a, d_row, W)
    return (sl, cs, es)


timeit("_emit_pure (whole batch)", pure_only, streams)


def encode_only(a):
    sl, cs, es = codec.encode(a, codec.DISTANCES, mincr, False)
    return (sl, cs, es)


timeit("encode (full)", encode_only, streams)

# stored-raw postlude alone: everything compress_blocks does after
# encode, with encode's outputs precomputed
slots0, csizes0, est0 = jax.jit(
    lambda a: codec.encode(a, codec.DISTANCES, mincr, False))(streams)
slots0.block_until_ready()


def postlude(a):
    raw = csizes0 >= n
    raw |= est0 > max(n // mbpi, 32)
    cs = jnp.where(raw, n, csizes0)
    padded = jnp.pad(a, ((0, 0), (0, W - n)))
    sl = jnp.where(raw[:, None], padded, slots0)
    return (sl, cs)


timeit("stored-raw postlude", postlude, streams)


def filt(a):
    out = filters.apply_filter(doshuffle, typesize, a)
    return (out,)


timeit("apply_filter only", filt, x)
print("done", flush=True)
