"""TPU-native pipeline on device-resident data.

The byte API (examples/simple.py) round-trips through host memory. When
the data already lives in device HBM — activations, checkpoint shards,
KV caches — use the device pipeline directly: blocks are filtered and
encoded as one data-parallel program and the compressed representation
(worst-case slots + a csize vector) stays on device, ready for a DCN
transfer or a sharded collective. The serialized chunk bytes are only
materialized when persisting to host storage.
"""

import numpy as np

import jax
import jax.numpy as jnp

from cblosc_tpu.tpu import pipeline

NBLOCKS, BLOCKSIZE, TYPESIZE = 16, 256 * 1024, 4


def main() -> None:
    rng = np.random.default_rng(0)
    host = (rng.integers(0, 1 << 12, NBLOCKS * BLOCKSIZE // 4,
                         dtype=np.int32) * 8)
    x = jax.device_put(
        jnp.asarray(host.view(np.uint8).reshape(NBLOCKS, BLOCKSIZE))
    )
    print("device:", x.device)

    slots, csizes = pipeline.compress_blocks(
        x, doshuffle=1, typesize=TYPESIZE, nsplits=TYPESIZE
    )
    total = int(jnp.sum(csizes))
    print(f"compressed on device: {x.size} -> ~{total} payload bytes "
          f"({x.size / total:.1f}x)")

    rows = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
    blocks, err = pipeline.decompress_blocks(
        rows, csizes, BLOCKSIZE // TYPESIZE, 1, TYPESIZE, TYPESIZE
    )
    assert not bool(jnp.any(err))
    assert bool(jnp.all(blocks == x))
    print("device roundtrip OK")

    # deterministic serialized layout, computed on device
    bstarts, split_off, total = pipeline.layout_chunk(
        csizes, NBLOCKS, TYPESIZE
    )
    print(f"serialized chunk would be {int(total)} bytes "
          f"(header + bstarts + framed splits)")


if __name__ == "__main__":
    main()
