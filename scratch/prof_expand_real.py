"""Real-chip validation + timing of the Pallas expand decode path."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import pipeline, filters

WORKINGSET = 64 << 20
ITERS = 3


def synth(nbytes, sbits=19, seed=0):
    rng = np.random.default_rng(seed)
    n = nbytes // 8
    vals = rng.integers(0, 1 << min(sbits, 62), n, dtype=np.int64)
    vals <<= max(0, 32 - sbits)
    return vals.view(np.uint8)[:nbytes]


def timeit(fn, x, reps=ITERS):
    @jax.jit
    def many(x):
        def body(i, x):
            r = fn(x)
            return x.at[(0,) * x.ndim].set(
                x[(0,) * x.ndim] ^ (r % 2).astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x)
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    t0 = time.perf_counter()
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    return (time.perf_counter() - t0 - 0.035) / reps


def run_clevel(clevel):
    typesize, doshuffle = 8, 1
    nbytes = 4 << 20
    blocksize = policy.compute_blocksize_device(clevel, typesize, nbytes)
    nblocks = nbytes // blocksize
    nchunks = max(1, WORKINGSET // nbytes)
    dont_split = not policy.split_block(C.BLOSCLZ, typesize, blocksize)
    nsplits = policy.nsplits_encode(dont_split, typesize, False)
    neblock = blocksize // nsplits
    total = nchunks * nbytes
    data = synth(total).reshape(nchunks * nblocks, blocksize)
    x = jax.device_put(jnp.asarray(data))
    print(f"== clevel {clevel}: neblock {neblock} rows "
          f"{nchunks*nblocks*nsplits}", flush=True)

    slots, csizes = jax.jit(lambda x: pipeline.compress_blocks(
        x, doshuffle, typesize, nsplits,
        policy.device_min_bytes_per_iter(clevel)))(x)
    slots = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
    slots.block_until_ready()

    # correctness first
    out, err = jax.jit(lambda s: pipeline.decompress_blocks(
        s, csizes, neblock, doshuffle, typesize, nsplits))(slots)
    bad = int(jnp.sum(err.astype(jnp.int32)))
    mism = int(jnp.sum((out != x).astype(jnp.int32)))
    print(f"  roundtrip: err rows {bad}, byte mismatches {mism}", flush=True)
    if bad or mism:
        return False

    def dec(s):
        out, err = pipeline.decompress_blocks(
            s, csizes, neblock, doshuffle, typesize, nsplits)
        return out[0, 0].astype(jnp.int32) + err.sum().astype(jnp.int32)
    t = timeit(dec, slots)
    print(f"  decompress_blocks  : {t*1e3:8.2f} ms  {total/t/1e9:6.2f} GB/s",
          flush=True)
    return True


if __name__ == "__main__":
    import os
    print("CBLOSC_TPU_PLACE =", os.environ.get("CBLOSC_TPU_PLACE", "(auto)"),
          flush=True)
    for cl in (1, 5, 9):
        if not run_clevel(cl):
            sys.exit(1)
    print("ALL OK", flush=True)
