"""Round-5: is the >64 MB XLA cliff real for the DECODE path?

Times one_batch decode (structured.decode + unfilter, no grouping) on
64/128/256 MB, with stage splits, high rep counts (signal >> the ~35 ms
tunnel readback latency).

Usage: python scratch/r5_prof_dec_full.py [clevel] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import pipeline, filters, structured
from cblosc_tpu.utils.timing import carry_chained, readback_latency, synth

clevel = int(sys.argv[1]) if len(sys.argv) > 1 else 1
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 32
typesize, sbits, doshuffle = 8, 19, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, 128 << 20)
dont_split = not policy.split_block(C.BLOSCLZ, typesize, blocksize)
nsplits = policy.nsplits_encode(dont_split, typesize, False)
neblock = blocksize // nsplits
mbpi = policy.device_min_bytes_per_iter(clevel)
mcr = policy.device_min_cratio_x100(clevel)
mine = policy.device_mine(clevel)


def timeit(name, step, arr, nbytes, r):
    many = carry_chained(step, r, flip_pos=arr.shape[1] - 1)
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


for ws in (64 << 20, 128 << 20, 256 << 20):
    nblocks = ws // blocksize
    total = nblocks * blocksize
    data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
    x = jax.device_put(jnp.asarray(data))

    def comp(a):
        return pipeline.compress_blocks(
            a, doshuffle, typesize, nsplits, mbpi, C.BLOSCLZ, mcr, mine)

    slots0, csizes0 = jax.jit(comp)(x)
    slots0 = pipeline.mask_past_csize(slots0, csizes0, slots0.shape[1])
    slots0.block_until_ready()
    del x
    raw = csizes0 >= neblock
    dec_cs = jnp.where(raw, 0, csizes0)
    r = max(4, reps * (64 << 20) // ws)
    print(f"--- ws {ws>>20} MB rows {slots0.shape[0]} reps {r}",
          flush=True)

    def full_nogroup(s):
        decoded, produced, errg = structured.decode(s, dec_cs, neblock)
        streams = jnp.where(raw[:, None], s[:, :neblock], decoded)
        errg = jnp.where(raw, False, errg | (produced != neblock))
        blk = streams.reshape(s.shape[0] // nsplits, nsplits * neblock)
        return filters.undo_filter(doshuffle, typesize, blk), errg

    timeit("decode+unfilter one-batch (no grouping)", full_nogroup,
           slots0, total, r)

    def dec_only(s):
        decoded, produced, errg = structured.decode(s, dec_cs, neblock)
        return (decoded, produced, errg)

    timeit("structured.decode only", dec_only, slots0, total, r)

    def unf_only(s):
        blk = s[:, :neblock].reshape(s.shape[0] // nsplits,
                                     nsplits * neblock)
        return (filters.undo_filter(doshuffle, typesize, blk),)

    timeit("undo_filter only", unf_only, slots0, total, r)

    def shipped(s):
        out, err = pipeline.decompress_blocks(
            s, csizes0, neblock, doshuffle, typesize, nsplits, C.BLOSCLZ)
        return (out, err)

    timeit("decompress_blocks (shipped, grouped)", shipped, slots0,
           total, r)
    del slots0, csizes0, raw, dec_cs

print("done", flush=True)
