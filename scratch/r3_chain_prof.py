"""Chained stage profiler for the device decode path (round 3).

Every timing runs as an on-device fori_loop chain whose body output
feeds the next input (the bench.py methodology) — the only way to get
sub-30ms resolution through the axon tunnel's dispatch latency.

Usage: python scratch/r3_chain_prof.py [clevel] [reps]
Env sweep (run as separate processes; jit caches are per-process):
  CBLOSC_TPU_GROUP_CAP=4096 python scratch/r3_chain_prof.py 1
  CBLOSC_TPU_MERGE=0 python scratch/r3_chain_prof.py 1
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import filters, pipeline, structured
from cblosc_tpu.utils.timing import readback_latency, synth

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
print(f"clevel {clevel}: blocksize {blocksize} neblock {neblock} "
      f"rows {rows} group {structured._group_rows(neblock, structured.max_records(neblock))}",
      flush=True)


def timeit(name, step, arr, nbytes=total, r=reps):
    """Chained timing: step(arr) -> int32 scalar; carry flips one byte."""
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
    print(f"{name:44s} {el*1e3:9.3f} ms  {nbytes/el/1e9:8.2f} GB/s",
          flush=True)
    return el


# --- full decompress (bench reference point) ------------------------------
def full(a):
    out, err = pipeline.decompress_blocks(
        a, csizes0, neblock, doshuffle, typesize, nsplits, C.BLOSCLZ)
    return out[0, 0].astype(I32) + err.sum().astype(I32)


timeit("decompress_blocks (full)", full, slots0)

# --- unfilter only ---------------------------------------------------------
blocks_shape = (rows // nsplits, nsplits * neblock)
blk = jnp.zeros(blocks_shape, U8)


def unf(a):
    out = filters.undo_filter(doshuffle, typesize, a)
    return jnp.sum(out[:, :: max(neblock // 8, 1)].astype(I32))


timeit("undo_filter only", unf, blk)

# raw rows never reach the decoder (decompress_blocks masks them)
dec_cs = jnp.where(csizes0 >= neblock, 0, csizes0)

# --- structured.decode only (no unfilter/reshape) --------------------------
def sdec(a):
    out, produced, err = structured.decode(
        a, dec_cs, neblock)
    return out[0, 0].astype(I32) + err.sum().astype(I32)


timeit("structured.decode (all rows)", sdec, slots0)

# --- walk only (placement stubbed) -----------------------------------------
_orig_kpr = structured.kernel_place_rows
_orig_pf = structured._place_and_fill


def _stub_kpr(sl, recs, ok, out_len, W):
    return jnp.zeros((sl.shape[0], out_len), U8) + (
        recs[0][0, 0] % 2).astype(U8)


def _stub_pf(slots, csizes, recs, rec_valid, dist, uni, ok, out_len):
    z = jnp.zeros((slots.shape[0], out_len), U8) + (
        recs[0][0, 0] % 2).astype(U8)
    return z, ok


structured.kernel_place_rows = _stub_kpr
structured._place_and_fill = _stub_pf
jax.clear_caches()


def walk_only(a):
    out, produced, err = structured.decode(a, dec_cs, neblock)
    return out[0, 0].astype(I32) + err.sum().astype(I32)


timeit("walk only (placement stubbed)", walk_only, slots0)
structured.kernel_place_rows = _orig_kpr
structured._place_and_fill = _orig_pf
jax.clear_caches()

# --- placement only (records precomputed for one group) --------------------
# take the first group of live rows and time kernel placement alone
grp = structured._group_rows(neblock, structured.max_records(neblock))
cs_np = np.asarray(dec_cs)
order = np.argsort(cs_np)
live = order[cs_np[order] > 0][:grp]
if live.size == grp:
    sl = jnp.asarray(np.asarray(slots0)[live])
    cs = jnp.asarray(cs_np[live])
    W = sl.shape[1]
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    slw = jnp.pad(sl, ((0, 0), (0, Wpad - W)))
    maxrec = structured.max_records(neblock)
    recs, dist, uni, okf = jax.jit(
        structured._walk_batch, static_argnums=(2, 3))(
            slw, cs, neblock, maxrec)
    recs[0].block_until_ready()

    def kern(a):
        out = structured.kernel_place_rows(a, recs, okf, neblock, W)
        return out[0, 0].astype(I32)

    timeit(f"kernel place only ({grp} rows)", kern, slw,
           nbytes=grp * neblock)

    def wlk(a):
        r2, d2, u2, o2 = structured._walk_batch(a, cs, neblock, maxrec)
        return r2[0][0, 0] + d2[0]

    timeit(f"walk only ({grp} rows, 1 group)", wlk, slw,
           nbytes=grp * neblock)

    # --- placement machine shoot-out on the same group ---------------
    valid = recs[0] >= 0

    def m_sort(a):
        out, handled = structured._place_and_fill(
            a[:, :W], cs, recs, valid, dist, uni, okf, neblock)
        return out[0, 0].astype(I32) + handled.sum().astype(I32)

    try:
        timeit(f"sort machine ({grp} rows)", m_sort, slw,
               nbytes=grp * neblock)
    except Exception as e:
        print("sort machine failed:", type(e).__name__, str(e)[:120],
              flush=True)

    def m_tile(a):
        elig = structured.pure_tile_eligible(
            recs, valid, dist, uni, okf, cs, neblock)
        out, handled = structured._pure_tile_place(
            a, cs, recs, valid, dist, elig, neblock)
        return out[0, 0].astype(I32) + handled.sum().astype(I32)

    if neblock >= 256 and neblock % 256 == 0:
        try:
            timeit(f"pure tile ({grp} rows, incl. elig)", m_tile, slw,
                   nbytes=grp * neblock)
        except Exception as e:
            print("pure tile failed:", type(e).__name__, str(e)[:120],
                  flush=True)

    def m_elig(a):
        elig = structured.pure_tile_eligible(
            recs, valid, dist, uni, okf, cs, neblock)
        return elig.sum().astype(I32) + a[0, 0].astype(I32)

    try:
        timeit(f"tile eligibility only ({grp} rows)", m_elig, slw,
               nbytes=grp * neblock)
    except Exception as e:
        print("elig failed:", type(e).__name__, str(e)[:120], flush=True)

print("done", flush=True)
