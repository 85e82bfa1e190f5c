"""Round-5 clevel-1 compress A/B: u32-lane scoring on/off.

One process, one 64 MB batch; clears jit caches between env settings
(CBLOSC_TPU_SCORE32 is read at trace time).

Usage: python scratch/r5_ab_cl1.py [reps]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, pipeline
from cblosc_tpu.utils.timing import carry_chained, readback_latency, synth

reps = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ws = 64 << 20
typesize, sbits, doshuffle, clevel = 8, 19, 1, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
nsplits = policy.nsplits_encode(
    not policy.split_block(C.BLOSCLZ, typesize, blocksize), typesize, False)
neblock = blocksize // nsplits
nblocks = ws // blocksize
total = nblocks * blocksize
data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
x = jax.device_put(jnp.asarray(data))
print(f"blocksize {blocksize} neblock {neblock} rows {nblocks*nsplits}",
      flush=True)


def comp(a):
    return pipeline.compress_blocks(
        a, doshuffle, typesize, nsplits,
        policy.device_min_bytes_per_iter(clevel), C.BLOSCLZ,
        policy.device_min_cratio_x100(clevel), policy.device_mine(clevel))


def run(name):
    pipeline.compress_blocks.clear_cache()
    codec.encode.clear_cache()
    many = carry_chained(lambda a: comp(a), reps,
                         flip_pos=x.shape[1] - 1)
    y = jax.tree_util.tree_leaves(many(x))[0]
    flat = y.reshape(-1)
    _ = float(jnp.sum(flat[:8].astype(jnp.int32)))
    lat = readback_latency(jnp, flat)
    t0 = time.perf_counter()
    y = jax.tree_util.tree_leaves(many(x))[0]
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    el = max(time.perf_counter() - t0 - lat, 1e-9) / reps
    slots, csizes = jax.jit(comp)(x)
    cbytes = int(jnp.sum(jnp.minimum(csizes, neblock) + 4))
    print(f"{name:40s} {el*1e3:9.3f} ms  {total/el/1e9:7.2f} GB/s  "
          f"ratio {total/cbytes:6.3f}", flush=True)


run("u32 scoring (default)")
os.environ["CBLOSC_TPU_SCORE32"] = "0"
run("byte scoring (SCORE32=0)")
del os.environ["CBLOSC_TPU_SCORE32"]
print("done", flush=True)
