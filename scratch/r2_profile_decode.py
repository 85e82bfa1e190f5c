"""Profile the decode pipeline stage by stage on the real chip.

Questions this answers (BENCH_r02 shows decompress 1.6 GB/s at clevel 1,
4.95 at clevel 5, 2.25 at clevel 9):

  1. Where does clevel-1 time go: walk, placement (expand kernel), or
     per-row/program overheads? (neblock 2048 -> 64K rows per 128 MB)
  2. Is the expand kernel's per-row cost dominated by grid/program
     overhead (fixable by merging small rows into virtual rows) or by
     per-record walk cost (not fixable that way)?
  3. clevel 9: how much of decode is the walk vs the raw-group select?

Run under nohup on the real chip:
    nohup python scratch/r2_profile_decode.py > /tmp/prof_dec.log 2>&1 &
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.tpu import codec, expand, pipeline, structured


def timeit(label, fn, *a, reps=3):
    out = fn(*a)                                  # compile
    leaf = jax.tree.leaves(out)[0]
    _ = float(leaf.astype(jnp.float32).ravel()[0])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*a)
        leaf = jax.tree.leaves(out)[0]
        _ = float(leaf.astype(jnp.float32).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label:46s} {best*1e3:9.2f} ms", flush=True)
    return out, best


def main():
    nbytes = 64 << 20
    typesize = 8
    rng = np.random.default_rng(0)
    ints = rng.integers(0, 1 << 19, nbytes // 8) << 13
    raw = ints.astype(np.int64).view(np.uint8)

    for clevel in (1, 5, 9):
        bs = policy.compute_blocksize_device(clevel, typesize, nbytes, 0)
        nblocks = nbytes // bs
        nsplits = typesize
        neblock = bs // nsplits
        print(f"== clevel {clevel}: neblock={neblock} "
              f"rows={nblocks*nsplits}", flush=True)
        x = jnp.asarray(raw[: nblocks * bs].reshape(nblocks, bs))
        slots, csizes = pipeline.compress_blocks(
            x, 1, typesize, nsplits,
            policy.device_min_bytes_per_iter(clevel), 0,
            policy.device_min_cratio_x100(clevel),
            policy.device_mine(clevel))
        slots = jax.block_until_ready(slots)
        cs_np = np.asarray(csizes)
        nraw = int((cs_np >= neblock).sum())
        print(f"   raw rows: {nraw}/{cs_np.size}, "
              f"mean csize (live): "
              f"{cs_np[cs_np < neblock].mean() if nraw < cs_np.size else 0:.0f}",
              flush=True)

        full = jax.jit(lambda s, c: pipeline.decompress_blocks(
            s, c, neblock, 1, typesize, nsplits, 0))
        _, t = timeit("decompress_blocks (end to end)", full, slots, csizes)
        print(f"   -> {nbytes/t/1e9:.2f} GB/s", flush=True)

        # stage: walk only, on one csize-sorted group
        group = structured._group_rows(neblock,
                                       structured.max_records(neblock))
        order = np.argsort(cs_np)
        live = order[cs_np[order] < neblock]
        gsl = jnp.asarray(np.asarray(slots)[live[:group]])
        gcs = jnp.asarray(cs_np[live[:group]])
        Wpad = max(-(-(gsl.shape[1] + structured._MARGIN) // 128) * 128,
                   structured._WINW)
        gslw = jnp.pad(gsl, ((0, 0), (0, Wpad - gsl.shape[1])))
        maxrec = structured.max_records(neblock)
        walk = jax.jit(structured._walk_batch, static_argnums=(2, 3))
        (recs, dist, uni, ok), tw = timeit(
            f"walk only ({gsl.shape[0]} live rows)", walk, gslw, gcs,
            neblock, maxrec)
        print(f"   walk ok: {int(np.asarray(ok).sum())}, "
              f"uni: {int(np.asarray(uni).sum())}", flush=True)

        # stage: expand kernel placement on the same group
        def place(sl, rc):
            return expand.expand(sl, expand.compact_records(rc), neblock)
        _, tp = timeit("expand kernel (same group)",
                       jax.jit(place), gslw[:, :gsl.shape[1]], recs)
        R = gsl.shape[0]
        print(f"   per-row: walk {tw/R*1e6:.2f} us, place {tp/R*1e6:.2f} us",
              flush=True)

        # experiment: merged virtual rows (m small rows -> one program)
        if neblock <= 16384:
            for m in (4, 16):
                R2 = (R // m) * m
                k = jnp.arange(R2, dtype=jnp.int32) % m
                rc = recs[:R2]
                okm = ok[:R2]
                kind = jnp.where(okm[:, None], rc[..., 0], -1)
                src = rc[..., 1] + jnp.where(kind == 0,
                                             (k * Wpad)[:, None], 0)
                dst = rc[..., 2] + (k * neblock)[:, None]
                rcm = jnp.stack([kind, src, dst, rc[..., 3]], axis=-1)
                rcm = rcm.reshape(R2 // m, m * rc.shape[1], 4)
                slm = gslw[:R2].reshape(R2 // m, m * Wpad)

                def placem(sl, rc):
                    return expand.expand(
                        sl, expand.compact_records(rc), m * neblock)
                _, tm = timeit(f"expand merged x{m}",
                               jax.jit(placem), slm, rcm)
                print(f"   merged per-orig-row: {tm/R2*1e6:.2f} us",
                      flush=True)


if __name__ == "__main__":
    main()
