"""Round-5: where does the 128 MB grouped path lose vs 64 MB single?

Compares, at the driver geometry (clevel 1, ts 8, sbits 19, 4 MB chunks):
  - decompress_blocks on 64 MB (single batch, no grouping)
  - decompress_blocks on 128 MB (lax.map over 2 groups — the shipped path)
  - unrolled-in-jit variant (python loop over groups inside one jit)
  - compress side likewise

Usage: python scratch/r5_prof_group.py [clevel] [reps]
"""

import sys
import time

import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import pipeline, filters, structured
from cblosc_tpu.utils.timing import carry_chained, readback_latency, synth

U8 = jnp.uint8
I32 = jnp.int32

clevel = int(sys.argv[1]) if len(sys.argv) > 1 else 1
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
typesize, sbits, doshuffle = 8, 19, 1

blocksize = policy.compute_blocksize_device(clevel, typesize, 128 << 20)
dont_split = not policy.split_block(C.BLOSCLZ, typesize, blocksize)
nsplits = policy.nsplits_encode(dont_split, typesize, False)
neblock = blocksize // nsplits
mbpi = policy.device_min_bytes_per_iter(clevel)
mcr = policy.device_min_cratio_x100(clevel)
mine = policy.device_mine(clevel)


def timeit(name, step, arr, nbytes, r=reps):
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


for ws in (64 << 20, 128 << 20):
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

    def dec(s):
        out, err = pipeline.decompress_blocks(
            s, csizes0, neblock, doshuffle, typesize, nsplits, C.BLOSCLZ)
        return (out, err)

    print(f"--- ws {ws>>20} MB  nblocks {nblocks} rows {slots0.shape[0]}",
          flush=True)
    timeit("compress_blocks (shipped)", comp, x, total)
    timeit("decompress_blocks (shipped)", dec, slots0, total)

    if ws > (64 << 20):
        # unrolled-in-jit decode over groups
        bpg = max(pipeline._encode_group_bytes() // blocksize, 1)
        group = bpg * nsplits
        raw = csizes0 >= neblock

        from cblosc_tpu.tpu import structured as st

        def one_batch_dec(sl, cs, rawg):
            dec_cs = jnp.where(rawg, 0, cs)
            decoded, produced, errg = st.decode(sl, dec_cs, neblock)
            streams = jnp.where(rawg[:, None], sl[:, :neblock], decoded)
            errg = jnp.where(rawg, False, errg | (produced != neblock))
            blk = streams.reshape(sl.shape[0] // nsplits,
                                  nsplits * neblock)
            return filters.undo_filter(doshuffle, typesize, blk), errg

        def dec_unrolled(s):
            rows = s.shape[0]
            outs, errs = [], []
            for i in range(0, rows, group):
                o, e = one_batch_dec(s[i:i + group],
                                     csizes0[i:i + group],
                                     raw[i:i + group])
                outs.append(o)
                errs.append(e)
            return (jnp.concatenate(outs), jnp.concatenate(errs))

        timeit("decompress unrolled-in-jit", dec_unrolled, slots0, total)

        def one_batch_enc(blk):
            filtered = filters.apply_filter(doshuffle, typesize, blk)
            streams = filtered.reshape(blk.shape[0] * nsplits, neblock)
            slots, csizes, est_iters = pipeline._encode_grouped(
                streams, C.BLOSCLZ, mcr, mine)
            rawl = csizes >= neblock
            if mbpi:
                rawl |= est_iters > max(neblock // mbpi, 32)
            csz = jnp.where(rawl, neblock, csizes)
            padded = jnp.pad(streams,
                             ((0, 0), (0, slots.shape[1] - neblock)))
            slots = jnp.where(rawl[:, None], padded, slots)
            return slots, csz

        def comp_unrolled(a):
            nb = a.shape[0]
            ss, cc = [], []
            for i in range(0, nb, bpg):
                s, c = one_batch_enc(a[i:i + bpg])
                ss.append(s)
                cc.append(c)
            return (jnp.concatenate(ss), jnp.concatenate(cc))

        timeit("compress unrolled-in-jit", comp_unrolled, x, total)

print("done", flush=True)
