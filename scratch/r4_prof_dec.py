"""Chained stage profiler for the round-4 decode path (template fast
path). Same methodology as r3_chain_prof.py.

Usage: python scratch/r4_prof_dec.py [clevel] [reps]
A/B (separate processes):
  CBLOSC_TPU_TEMPLATE=0 python scratch/r4_prof_dec.py 1
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import pipeline, structured
from cblosc_tpu.utils.timing import carry_chained, readback_latency, synth

U8 = jnp.uint8
I32 = jnp.int32

clevel = int(sys.argv[1]) if len(sys.argv) > 1 else 1
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ws = 64 << 20
typesize, sbits, doshuffle = 8, 19, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
dont_split = not policy.split_block(C.BLOSCLZ, typesize, blocksize)
nsplits = policy.nsplits_encode(dont_split, typesize, False)
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
slots0.block_until_ready()
rows = slots0.shape[0]
dec_cs = jnp.where(csizes0 >= neblock, 0, csizes0)

# how many live rows does the template cover?
tm = structured._template_match(slots0, dec_cs, neblock)
ncover = int(tm[0].sum()) if tm is not None else -1
nlive = int((dec_cs > 0).sum())
print(f"clevel {clevel}: neblock {neblock} rows {rows} live {nlive} "
      f"template-covered {ncover}", flush=True)


def timeit(name, step, arr, nbytes=total, r=reps):
    """Output-carry chain (utils.timing.carry_chained): every output
    array is materialized each iteration — scalar-consuming chains let
    XLA slice codec byte-writes away (5x inflation measured)."""
    import jax

    many = carry_chained(step, r, flip_pos=arr.shape[1] - 1)
    y = jax.tree_util.tree_leaves(many(arr))[0]
    flat = y.reshape(-1)
    _ = float(jnp.sum(flat[:8].astype(jnp.int32)))
    lat = readback_latency(jnp, flat)
    t0 = time.perf_counter()
    y = jax.tree_util.tree_leaves(many(arr))[0]
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    el = max(time.perf_counter() - t0 - lat, 1e-9) / r
    print(f"{name:44s} {el*1e3:9.3f} ms  {nbytes/el/1e9:8.2f} GB/s",
          flush=True)
    return el


def full(a):
    out, err = pipeline.decompress_blocks(
        a, csizes0, neblock, doshuffle, typesize, nsplits, C.BLOSCLZ)
    return (out, err)


timeit("decompress_blocks (full)", full, slots0)


def sdec(a):
    out, produced, err = structured.decode(a, dec_cs, neblock)
    return (out, produced, err)


timeit("structured.decode (all rows)", sdec, slots0)


def tmatch_only(a):
    m, d, pat, tail = structured._template_match(a, dec_cs, neblock)
    return (m, d, pat, tail)


if tm is not None:
    timeit("_template_match only", tmatch_only, slots0)

    def tile_only(a):
        m, d, pat, tail = structured._template_match(a, dec_cs, neblock)
        out = structured._tile_from_pattern(pat, d, tail, neblock)
        return (out, m)

    timeit("match + tile_from_pattern", tile_only, slots0)

print("done", flush=True)
