"""Round-4 mining cost breakdown at the clevel-5 geometry.

Times the dual miner's components (prefix sort miner, fold16 miner,
exact verification) per emission group and as one whole-NORMAL-segment
batch, to decide whether mining should batch wider, subsample, or gate.

Usage: python scratch/r4_prof_mine.py [reps]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, filters
from cblosc_tpu.utils.timing import readback_latency, synth

I32 = jnp.int32
reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ws = 64 << 20
typesize, sbits, doshuffle, clevel = 8, 19, 1, 5

blocksize = policy.compute_blocksize_device(clevel, typesize, ws)
nsplits = policy.nsplits_encode(
    not policy.split_block(C.BLOSCLZ, typesize, blocksize), typesize, False)
neblock = blocksize // nsplits
nblocks = ws // blocksize
total = nblocks * blocksize
data = synth(total, typesize, sbits).reshape(nblocks, blocksize)
streams = filters.apply_filter(
    doshuffle, typesize, jax.device_put(jnp.asarray(data))
).reshape(nblocks * nsplits, neblock)
streams.block_until_ready()
print(f"neblock {neblock} rows {streams.shape[0]}", flush=True)


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


for G in (32, 128, 512):
    if G > streams.shape[0]:
        continue
    sg = streams[:G]
    nb = G * neblock
    d_row = jnp.ones((G, 1), I32)

    def whole(a):
        d, eq = codec.mine_group(a, d_row)
        return d.sum() + eq[0, 0].astype(I32)

    timeit(f"mine_group ({G} rows)", whole, sg, nb)

    def prefix_only(a):
        d, h = codec._mine_distance(a[:, :codec._MINE_PREFIX])
        return d.sum() + h.sum()

    timeit(f"  prefix miner ({G} rows)", prefix_only, sg, nb)

    def fold_only(a):
        d, h = codec._mine_distance(
            codec._fold16(a), 1, codec.MAX_FARDIST // codec._FOLD_G)
        return d.sum() + h.sum()

    timeit(f"  fold16 miner ({G} rows)", fold_only, sg, nb)

    def verify_only(a):
        eq = codec._eq_at(a, jnp.full((G,), 64000, I32))
        return eq.sum().astype(I32)

    timeit(f"  verify _eq_at ({G} rows)", verify_only, sg, nb)

print("done", flush=True)
