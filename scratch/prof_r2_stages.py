"""Round-2 stage profiling: where does decode/encode time go on the chip?

Times each stage of the device pipeline separately at bench geometry
(typesize 8, sbits 19, shuffle) for clevel 1 and 5. Uses the bench's
chained-fori timing so the axon tunnel's async readback can't skew it.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np
import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import pipeline, codec, structured, filters

WORKINGSET = 64 << 20
ITERS = 3


def synth(nbytes, sbits=19, seed=0):
    rng = np.random.default_rng(seed)
    n = nbytes // 8
    vals = rng.integers(0, 1 << min(sbits, 62), n, dtype=np.int64)
    vals <<= max(0, 32 - sbits)
    return vals.view(np.uint8)[:nbytes]


def readback_latency(y):
    t0 = time.perf_counter()
    for _ in range(6):
        _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    return (time.perf_counter() - t0) / 6


def timeit(fn, x, reps=ITERS):
    """fn: x(uint8 array) -> int32 scalar consuming all outputs."""
    @jax.jit
    def many(x):
        def body(i, x):
            r = fn(x)
            return x.at[(0,) * x.ndim].set(
                x[(0,) * x.ndim] ^ (r % 2).astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x)
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    lat = readback_latency(y)
    t0 = time.perf_counter()
    y = many(x)
    _ = float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))
    el = time.perf_counter() - t0
    return max(el - lat, el * 0.02) / reps


def profile_clevel(clevel):
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
    print(f"== clevel {clevel}: blocksize {blocksize} neblock {neblock} "
          f"nsplits {nsplits} rows {nchunks*nblocks*nsplits} total {total>>20} MB")

    # reference points
    t = timeit(lambda x: jnp.max(x).astype(jnp.int32) * 0, x, reps=ITERS * 20)
    print(f"  read pass           : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # full compress
    def comp(x):
        s, c = pipeline.compress_blocks(x, doshuffle, typesize, nsplits, 48)
        return c.sum() + s[0, 0].astype(jnp.int32)
    t = timeit(comp, x)
    print(f"  compress_blocks     : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # filter alone
    def filt(x):
        f = filters.apply_filter(doshuffle, typesize, x)
        return f[0, 0].astype(jnp.int32) + f[-1, -1].astype(jnp.int32)
    t = timeit(filt, x)
    print(f"  filter alone        : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # encode alone (pre-filtered streams)
    filtered = jax.jit(lambda x: filters.apply_filter(
        doshuffle, typesize, x).reshape(-1, neblock))(x)
    filtered.block_until_ready()

    def enc(s):
        sl, cs, est = pipeline._encode_grouped(s)
        return cs.sum() + sl[0, 0].astype(jnp.int32) + est.sum()
    t = timeit(enc, filtered)
    print(f"  encode alone        : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # prepare encoded slots for decode stages
    slots, csizes = jax.jit(lambda x: pipeline.compress_blocks(
        x, doshuffle, typesize, nsplits, 48))(x)
    slots = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
    slots.block_until_ready()
    raw = csizes >= neblock
    dec_cs = jnp.where(raw, 0, csizes)
    nraw = int(jnp.sum(raw.astype(jnp.int32)))
    rows = slots.shape[0]
    cs_np = np.asarray(csizes)
    print(f"  rows {rows}, stored-raw {nraw}, "
          f"csize hist: min {cs_np.min()}, med {int(np.median(cs_np))}, "
          f"max {cs_np.max()}")
    # distribution of non-raw csizes
    nr = cs_np[cs_np < neblock]
    if len(nr):
        print(f"  non-raw csizes: min {nr.min()} med {int(np.median(nr))} "
              f"p90 {int(np.percentile(nr, 90))} max {nr.max()} "
              f"count {len(nr)}")

    # full decompress
    def dec(s):
        out, err = pipeline.decompress_blocks(
            s, csizes, neblock, doshuffle, typesize, nsplits)
        return out[0, 0].astype(jnp.int32) + err.sum().astype(jnp.int32)
    t = timeit(dec, slots)
    print(f"  decompress_blocks   : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # walk alone (v2 batched, padded geometry as decode() builds it)
    maxrec = structured.max_records(neblock)
    W = slots.shape[1]
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    slots_w = jnp.pad(slots, ((0, 0), (0, Wpad - W)))
    slots_w.block_until_ready()
    group = structured._group_rows(neblock)
    print(f"  (walk group={group}, maxrec={maxrec}, Wpad={Wpad})")

    def grouped(fn, *extra):
        def run(s):
            g = s.shape[0] // group
            outs = jax.lax.map(
                lambda t: fn(*t),
                tuple(a.reshape(g, group, *a.shape[1:]) for a in (s, *extra)))
            return sum(jnp.sum(o).astype(jnp.int32) for o in
                       jax.tree.leaves(outs)) % 1000
        return run

    def walk1(s, cs):
        recs, dist, ok = structured._walk_batch(s, cs, neblock, maxrec)
        return recs[:, 0, 0], dist, ok
    t = timeit(grouped(walk1, dec_cs), slots_w)
    print(f"  walk alone          : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # place+fill alone (from precomputed records), grouped the same way
    g = slots_w.shape[0] // group
    recs, dist, ok = jax.jit(lambda s, c: jax.lax.map(
        lambda t: structured._walk_batch(t[0], t[1], neblock, maxrec),
        (s.reshape(g, group, -1), c.reshape(g, group))))(slots_w, dec_cs)
    recs = recs.reshape(-1, recs.shape[-2], 4)
    dist = dist.reshape(-1)
    ok = ok.reshape(-1)
    jax.block_until_ready((recs, dist, ok))

    def pf1(s, cs, rc, dd, okk):
        sk, handled = structured._place_and_fill(
            s[:, :W], cs, rc, rc[..., 0] >= 0, dd, okk, neblock)
        return sk[:, 0], handled
    t = timeit(grouped(pf1, dec_cs, recs, dist, ok), slots_w)
    print(f"  place+fill alone    : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # fallback codec.decode on all-masked csizes (the no-op leg decode pays)
    zero_cs = jnp.zeros_like(dec_cs)

    def fb(s):
        out, produced, err = codec.decode(s, zero_cs, neblock)
        return out[:, 0].astype(jnp.int32).sum() + produced.sum()
    t = timeit(fb, slots)
    print(f"  masked codec.decode : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")

    # unfilter alone
    def unf(s):
        blocks = filters.undo_filter(
            doshuffle, typesize, s[:, :neblock].reshape(-1, nsplits * neblock))
        return blocks[0, 0].astype(jnp.int32)
    t = timeit(unf, slots)
    print(f"  unfilter alone      : {t*1e3:8.2f} ms  {total/t/1e9:8.1f} GB/s")


if __name__ == "__main__":
    for cl in (1, 5):
        profile_clevel(cl)
