"""Chained stage profiler for the device ENCODE path (round 3).

Same methodology as r3_chain_prof.py (fori_loop chains; tunnel-safe).
Usage: python scratch/r3_chain_prof_enc.py [clevel] [reps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, filters, pipeline
from cblosc_tpu.utils.timing import readback_latency, synth

U8 = jnp.uint8
I32 = jnp.int32

clevel = int(sys.argv[1]) if len(sys.argv) > 1 else 5
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ws = 64 << 20
typesize, sbits, doshuffle = 8, 19, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
dont_split = not policy.split_block(C.BLOSCLZ, typesize, blocksize)
nsplits = policy.nsplits_encode(dont_split, typesize, False)
neblock = blocksize // nsplits
nblocks = ws // blocksize
total = nblocks * blocksize
mine = policy.device_mine(clevel)
mincr = policy.device_min_cratio_x100(clevel)
mbpi = policy.device_min_bytes_per_iter(clevel)

data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
x = jax.device_put(jnp.asarray(data))
print(f"clevel {clevel}: blocksize {blocksize} neblock {neblock} "
      f"rows {nblocks * nsplits} mine {mine}", flush=True)


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
    print(f"{name:44s} {el*1e3:9.3f} ms  {nbytes/el/1e9:8.2f} GB/s",
          flush=True)
    return el


# --- full compress (bench anchor) ------------------------------------------
def full(a):
    slots, csizes = pipeline.compress_blocks(
        a, doshuffle, typesize, nsplits, mbpi, C.BLOSCLZ, mincr, mine)
    return csizes.sum() + slots[0, 0].astype(I32)


timeit("compress_blocks (full)", full, x)


# --- filter only ------------------------------------------------------------
def filt(a):
    out = filters.apply_filter(doshuffle, typesize, a)
    return jnp.sum(out[:, :: max(blocksize // 8, 1)].astype(I32))


timeit("apply_filter only", filt, x)

# --- encode stages on the filtered streams ----------------------------------
streams = filters.apply_filter(doshuffle, typesize, x).reshape(
    nblocks * nsplits, neblock)
streams.block_until_ready()


def score(a):
    d_row, pure, cov, totalv = codec._score(a, codec.DISTANCES)
    return (d_row.sum() + cov.sum() + pure.sum().astype(I32)).astype(I32)


timeit("_score (all rows)", score, streams)


def enc_nomine(a):
    slots, csizes, est = pipeline._encode_grouped(a, C.BLOSCLZ, mincr, False)
    return csizes.sum() + slots[0, 0].astype(I32)


timeit("encode (grouped, NO mining)", enc_nomine, streams)

if mine:
    def enc_mine(a):
        slots, csizes, est = pipeline._encode_grouped(
            a, C.BLOSCLZ, mincr, True)
        return csizes.sum() + slots[0, 0].astype(I32)

    timeit("encode (grouped, mining)", enc_mine, streams)

    G = min(32, streams.shape[0])
    sg = streams[:G]

    def mine_only(a):
        d_row = jnp.ones((a.shape[0], 1), I32)
        mined = codec.mine_group(a, d_row)
        return mined[0].sum()

    timeit(f"mine_group only ({G} rows)", mine_only, sg,
           nbytes=G * neblock)

# --- emission only (one group) ----------------------------------------------
G = min(32, streams.shape[0])
sg = streams[:G]
d0, pure0, cov0, tot0 = jax.jit(
    lambda a: codec._score(a, codec.DISTANCES))(sg)
eq0 = jax.jit(
    lambda a: codec._eq_for(a, d0, codec.DISTANCES))(sg)


def emit_only(a):
    sl, cs, es = codec._emit_full(a, eq0, d0, None)
    return cs.sum() + sl[0, 0].astype(I32)


timeit(f"_emit_full only ({G} rows)", emit_only, sg, nbytes=G * neblock)


def emit_pure_only(a):
    sl, cs, es = codec._emit_pure(a, d0, codec.slot_width(neblock))
    return cs.sum() + sl[0, 0].astype(I32)


timeit(f"_emit_pure only ({G} rows)", emit_pure_only, sg,
       nbytes=G * neblock)

print("done", flush=True)
