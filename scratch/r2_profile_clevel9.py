"""Profile the clevel-9 compress pipeline stage by stage on the real chip.

bench.py shows clevel 9 compressing at ~1.5 GB/s vs clevel 5's 9.2 on
the same workload; this isolates where the time goes: filter, score,
mining, emission (per class), stored-raw select. Run under nohup on the
real chip (CLAUDE.md: keep long device jobs out of round boundaries).

    nohup python scratch/r2_profile_clevel9.py > /tmp/prof_cl9.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.tpu import codec, filters, pipeline


def timeit(label, fn, *a, reps=3):
    fn(*a)                                   # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        # force a readback (block_until_ready unreliable through axon)
        leaf = jax.tree.leaves(out)[0]
        _ = float(leaf.astype(jnp.float32).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:40s} {best*1e3:9.2f} ms", flush=True)
    return out


def main():
    nbytes = 64 << 20
    typesize = 8
    rng = np.random.default_rng(0)
    ints = rng.integers(0, 1 << 19, nbytes // 8) << 13
    raw = ints.astype(np.int64).view(np.uint8)

    for clevel in (5, 9):
        bs = policy.compute_blocksize_device(clevel, typesize, nbytes, 0)
        nblocks = nbytes // bs
        nsplits = typesize
        neblock = bs // nsplits
        mine = policy.device_mine(clevel)
        mc = policy.device_min_cratio_x100(clevel)
        print(f"== clevel {clevel}: bs={bs} neblock={neblock} "
              f"rows={nblocks*nsplits} mine={mine} mincr={mc}", flush=True)
        x = jnp.asarray(raw[: nblocks * bs].reshape(nblocks, bs))

        filt = jax.jit(lambda b: filters.apply_filter(1, typesize, b))
        f = timeit("filter (shuffle)", filt, x)
        streams = f.reshape(nblocks * nsplits, neblock)

        score = jax.jit(lambda s: codec._score(s, codec.DISTANCES))
        timeit("score (+purity)", score, streams)

        if mine:
            mi = jax.jit(codec._mine_distance)
            # group like the encoder would
            g = streams[: max(8, (4 << 20) // neblock)]
            timeit(f"mine ({g.shape[0]} rows group)", mi, g)

        enc = jax.jit(lambda s: pipeline._encode_grouped(s, 0, mc, mine))
        timeit("encode_grouped (full)", enc, streams)

        full = jax.jit(lambda b: pipeline.compress_blocks(
            b, 1, typesize, nsplits,
            policy.device_min_bytes_per_iter(clevel), 0, mc, mine))
        timeit("compress_blocks (end to end)", full, x)

        gbps = nbytes / 1e9
        print(f"   ({gbps:.3f} GB working set)", flush=True)


if __name__ == "__main__":
    main()
