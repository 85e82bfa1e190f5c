"""Round-5 clevel-1 geometry A/B: neblock sweep, compress AND decompress.

With the template/pure fast paths dominant, the emission sort (which
motivated 2 KB splits) rarely runs on shuffled typed data; fewer, wider
rows may win on both sides. One process, 64 MB; CBLOSC_TPU_NEBLOCK is
read at trace time, caches cleared per setting.

Usage: python scratch/r5_ab_cl1_geom.py [reps] [neblocks...]
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
nebs = [int(v) for v in sys.argv[2:]] or [2048, 8192, 16384]
ws = 64 << 20
typesize, sbits, doshuffle, clevel = 8, 19, 1, 1
total = ws
data = synth(total, typesize, sbits)
xflat = jax.device_put(jnp.asarray(data))


def run(neb):
    os.environ["CBLOSC_TPU_NEBLOCK"] = str(neb)
    pipeline.compress_blocks.clear_cache()
    pipeline.decompress_blocks.clear_cache()
    codec.encode.clear_cache()
    blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
    nsplits = policy.nsplits_encode(
        not policy.split_block(C.BLOSCLZ, typesize, blocksize),
        typesize, False)
    neblock = blocksize // nsplits
    nblocks = ws // blocksize
    x = xflat[: nblocks * blocksize].reshape(nblocks, blocksize)

    def comp(a):
        return pipeline.compress_blocks(
            a, doshuffle, typesize, nsplits,
            policy.device_min_bytes_per_iter(clevel), C.BLOSCLZ,
            policy.device_min_cratio_x100(clevel),
            policy.device_mine(clevel))

    def decomp(s):
        return pipeline.decompress_blocks(
            s, csizes0, neblock, doshuffle, typesize, nsplits, C.BLOSCLZ)

    def tchain(step, xx, flip_last):
        many = carry_chained(step, reps,
                             flip_pos=xx.shape[1] - 1 if flip_last else 0)
        y = jax.tree_util.tree_leaves(many(xx))[0]
        flat = y.reshape(-1)
        _ = float(jnp.sum(flat[:8].astype(jnp.int32)))
        lat = readback_latency(jnp, flat)
        t0 = time.perf_counter()
        y = jax.tree_util.tree_leaves(many(xx))[0]
        _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
        return max(time.perf_counter() - t0 - lat, 1e-9) / reps

    slots0, csizes0 = jax.jit(comp)(x)
    slots0 = pipeline.mask_past_csize(slots0, csizes0, slots0.shape[1])
    cbytes = int(jnp.sum(jnp.minimum(csizes0, neblock) + 4))
    ct = tchain(comp, x, False)
    dt = tchain(decomp, slots0, True)
    print(f"neblock {neblock:6d} nsplits {nsplits}  "
          f"comp {ws/ct/1e9:7.2f} GB/s  decomp {ws/dt/1e9:7.2f} GB/s  "
          f"ratio {ws/cbytes:6.3f}", flush=True)


for neb in nebs:
    run(neb)
del os.environ["CBLOSC_TPU_NEBLOCK"]
print("done", flush=True)
