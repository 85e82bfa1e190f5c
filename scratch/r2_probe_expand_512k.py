"""Probe: does the expand kernel compile + run at out_len 2^19 (512 KB)
rows on the real chip (VMEM ~16 MB/core; estimated ~8 MB resident)?

If yes, decode() can route (2^18, 2^19] neblocks (dont_split reference
geometries) through the kernel instead of the ~0.07 GB/s generic loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.tpu import codec, expand, structured


def main():
    n = 1 << 19
    # one d=1 row: literal + long match records, hand-made
    recs = np.full((4, 64, 4), -1, np.int32)
    for r in range(4):
        recs[r, 0] = (0, 0, 0, 8)          # 8 literal bytes from slot 0
        recs[r, 1] = (1, 1, 8, n - 8)      # d=1 fill to the end
    slots = np.tile(np.arange(7, 7 + 64, dtype=np.uint8), (4, 2))[:, :128]
    slots = np.ascontiguousarray(slots)
    try:
        out = expand.expand(jnp.asarray(slots), jnp.asarray(recs), n)
        out = np.asarray(out)
        want = np.concatenate([slots[0, :8],
                               np.full(n - 8, slots[0, 7], np.uint8)])
        print("expand 512K:", "OK" if np.array_equal(out[0], want)
              else "WRONG BYTES", flush=True)
    except Exception as e:
        print("expand 512K REJECTED:", type(e).__name__, str(e)[:200],
              flush=True)

    import time
    for trial in range(2):
        t0 = time.perf_counter()
        out = expand.expand(jnp.asarray(slots), jnp.asarray(recs), n)
        _ = float(jnp.sum(out[:, ::4096].astype(jnp.float32)))
        print(f"  run {trial}: {(time.perf_counter()-t0)*1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
