"""Where does the device encoder lose ratio vs the host on the ramp?

Breaks the 1 MB clevel-5 ramp workload (tests/test_tpu_pipeline.py
test_tpu_ratio_close_to_host) into per-split csizes for the host
(numpy oracle) and device encoders, under varying device blocksizes.

Run: JAX_PLATFORMS=cpu python scratch/ratio_gap.py
"""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

# the axon plugin wins platform selection over the env var alone
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import cblosc_tpu as b
from cblosc_tpu.core import engine, policy
from cblosc_tpu.format import constants as C


def host_breakdown(data, clevel=5, typesize=8):
    chunk = b.compress_ctx(clevel, 1, typesize, data, backend="numpy")
    from cblosc_tpu.format import header as H
    info = H.ChunkHeader.decode(chunk)
    print(f"host: nbytes={len(data)} csize={len(chunk)} "
          f"ratio={len(data)/len(chunk):.0f}x blocksize={info.blocksize}")
    return chunk


def device_breakdown(data, clevel=5, typesize=8, blocksize=0):
    import jax.numpy as jnp
    from cblosc_tpu.tpu import pipeline, filters

    nbytes = len(data)
    bs = blocksize or policy.compute_blocksize_device(clevel, typesize, nbytes)
    dont_split = not policy.split_block(C.BLOSCLZ, typesize, bs)
    nsplits = 1 if dont_split else typesize
    nblocks = nbytes // bs
    arr = jnp.asarray(np.frombuffer(data[:nblocks * bs], np.uint8)
                      .reshape(nblocks, bs))
    slots, csizes = pipeline.compress_blocks(
        arr, 1, typesize, nsplits,
        min_bytes_per_iter=policy.device_min_bytes_per_iter(clevel),
        min_cratio_x100=policy.device_min_cratio_x100(clevel),
        mine=policy.device_mine(clevel))
    cs = np.asarray(csizes).reshape(nblocks, nsplits)
    tot = int(cs.sum()) + 4 * cs.size + 16 + 4 * nblocks
    print(f"dev bs={bs>>10}K neblock={bs//nsplits>>10}K: csize={tot} "
          f"ratio={nbytes/tot:.0f}x")
    # per-plane csize for block 0
    print("   block0 per-split csizes:", cs[0].tolist())
    return cs


if __name__ == "__main__":
    n = 1 << 20
    a = (np.arange(n // 4, dtype=np.int64) & 0x7FFFFFFF).astype(np.int32)
    data = a.tobytes()
    host_breakdown(data)
    device_breakdown(data)                      # default policy
    for bs in (1 << 18, 1 << 19, 1 << 20):
        device_breakdown(data, blocksize=bs)
