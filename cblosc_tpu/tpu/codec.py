"""Device BloscLZ codec: vectorized encoder + batched decoder.

The reference's blosclz (blosc/blosclz.c) is a pointer-chasing LZ77 with a
hash table — an inherently serial CPU idiom. The TPU encoder is a
different *strategy* over the same *wire format* (any conforming token
stream is a valid blosclz stream; the format is fixed by the decoder,
blosc/blosclz.c:679-789):

  * After the shuffle/bitshuffle filter, typed data is dominated by
    *periodic* structure inside each byte-plane: constant runs (period
    1) and arithmetic ramps (period 256/step), plus typesize-strided
    patterns in unsplit streams. The encoder scores a small static set
    of candidate distances per stream with a cheap coverage proxy
    (three consecutive s[i]==s[i-d] hits), picks the best distance per
    stream, and run-length-codes s[i]==s[i-d] stretches as distance-d
    matches. Detection, segmentation and layout are pure data-parallel
    primitives (static-shift compares, cummax/cummin, prefix sums).
  * Emission is ONE per-row key sort: every input position owns at most
    two output bytes (token bytes are spread over the first three
    positions of a match, which always exist since matches are >= 3
    long); keys pack (dest_offset << 8 | byte) so ascending sort yields
    the serialized stream directly. On TPU this is ~35x faster than
    scatter (XLA TPU scatter costs ~7ns per index element; a 64 MB
    row-sort costs ~112 ms).
  * A maximal run is ONE match token — 255-extension bytes make the
    length unbounded (blosclz.c:698-706), matching the reference
    encoder's token granularity. Static candidate distances are < 8192;
    mined adaptive distances above that emit the far-distance escape.

The decoder accepts ANY blosclz stream (reference-produced included). It
is a vmapped ``lax.while_loop`` state machine tuned so well-formed
streams need ~one iteration per token:

  * match copies fill up to _MATW bytes per iteration: distance-1 runs
    splat in one step; back >= chunk copies directly; small periods use
    two doubling steps and then PROMOTE the period (once 4*back bytes
    are written, 4*back is itself a valid distance), so even period-2
    matches finish in O(log mlen) iterations;
  * length-extension bytes are parsed 8 per iteration into an
    accumulator (bounded windows — no O(out_len) scans per token);
  * runs of 32-byte literal chunks (what our encoder emits inside long
    literal stretches) decode _FASTLIT cells per iteration.

Compressed outputs live in fixed worst-case slots plus a csize vector
(SURVEY.md hard part #2: variable-length output under XLA static
shapes); chunk assembly compacts the slots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

I32 = jnp.int32
U8 = jnp.uint8

_LITW = 32            # slow-path literal window (a literal chunk is <= 32 B)
_FASTLIT = 16         # literal cells decoded per fast-path iteration
_FASTB = _FASTLIT * 32
_MATW = 1024          # match copy window: vmapped dynamic ops cost ~2us
                      # per row per CALL (size-independent), so wide
                      # windows are free — one iteration per _MATW copied bytes

# Candidate match distances: 1 catches constant runs, powers of two catch
# arithmetic ramps (a step-s byte plane repeats with period 256/gcd(s,256))
# and strided layouts; 3 covers RGB-ish strides. A pattern with period p
# is also periodic at any multiple of p, so the set only needs one
# multiple per fundamental period worth catching (64 -> 128, 512/1024
# dropped as rare) — every distance costs the decoder a residue-fill
# pass. All < 8192 so the near-distance form always fits.
DISTANCES = (1, 2, 3, 4, 8, 16, 32, 128, 256)

# blosclz far-distance form: dist = (b1 << 8 | b2) + 8192 after the
# 31/255 escape (blosclz.c:733-744), so 8192 + 65535 is the format's
# reachable maximum (the reference's MAX_FARDISTANCE).
MAX_FARDIST = 8192 + 65535
_MINRUN_MINED = 16          # min run length worth a mined-distance claim

_BIG = jnp.int32(1 << 29)   # sort key for "no byte here"


def slot_width(n: int) -> int:
    """Worst-case encoded size of an n-byte stream (all literals)."""
    return n + (n + 31) // 32 + 8


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _score(s: jax.Array, dists: tuple):
    """Distance selection + purity detection.

    Returns (d_row (N,1) i32, pure (N,) bool, cov (N,), total (N,)) with
    cov == total == the adjacent-pair match count at the chosen distance
    (the coverage proxy feeding the entropy-probe estimate). A row is
    PURE when one run at the chosen distance covers everything matchable
    ([d, n-1)) — the dominant shape for shuffled typed data — and its
    whole emission is closed-form (_emit_pure), skipping segmentation
    scans and the emission sort.

    The per-row eq MASK is deliberately not returned: materializing every
    candidate's (N, n) mask and selecting one forced ~2x the streaming
    traffic (each mask fed both the coverage reduce and the select
    chain); only NORMAL emission groups need the mask, and they
    recompute it from d_row with _eq_for at a fraction of the cost.
    """
    import os

    N, n = s.shape
    # u32-lane scoring (OFF by default): candidates with d % 4 == 0
    # compare whole little-endian u32 lanes — 4x fewer lane-ops on
    # paper, but MEASURED 3.4x SLOWER end to end on v5e (22.0 vs
    # 6.5 ms per 64 MB at the clevel-1 geometry, scratch/r5_ab_cl1.py):
    # the u8->u32 bitcast materializes a relaid copy of the batch and
    # the mixed u8/u32 consumers split what was one fused streaming
    # compare pass. Kept behind CBLOSC_TPU_SCORE32=1 for future
    # geometry work; exactness holds on both paths (purity is exact
    # per candidate, selected at the best distance).
    u32ok = (os.environ.get("CBLOSC_TPU_SCORE32", "0") == "1"
             and n % 4 == 0 and n >= 64)
    s32 = (jax.lax.bitcast_convert_type(
        s.reshape(N, n // 4, 4), jnp.uint32) if u32ok else None)
    L = n // 4
    pairs = []
    pures = []
    for d in dists:
        if d >= n - 2:
            pairs.append(jnp.zeros((N,), I32))
            pures.append(jnp.zeros((N,), bool))
            continue
        if u32ok and d % 4 == 0 and d >= 4:
            D = d // 4
            # full-requirement lanes [D, L-1) cover bytes [d, n-4);
            # the tail compare covers n-4..n-2; byte n-1 is excluded
            # (trailing-literal rule) — together exactly [d, n-2]
            e = s32[:, D:L - 1] == s32[:, :L - 1 - D]
            p2 = e[:, 1:] & e[:, :-1]
            tail_eq = jnp.all(
                s[:, n - 4:n - 1] == s[:, n - 4 - d:n - 1 - d], axis=1)
            pairs.append(4 * jnp.sum(p2.astype(I32), axis=1))
            pures.append(jnp.all(e, axis=1) & tail_eq)
        else:
            # e[i] = s[i]==s[i-d] for i in [d, n-1): STATIC SLICES, not
            # a concatenate — the concat materialized a shifted copy of
            # the whole batch per candidate (9x64 MB of extra traffic).
            # ONE reduce per candidate, over adjacent PAIRS e[i]&e[i-1]:
            # pairs rank candidates by run-forming coverage (isolated
            # single-byte coincidences never emit — min run length is 3)
            # AND witness purity exactly: with L = n-1-d match slots,
            # pairs == L-1 iff every slot matches (any miss costs >= 1).
            e = s[:, d:n - 1] == s[:, :n - 1 - d]
            p2 = e[:, 1:] & e[:, :-1]
            cnt = jnp.sum(p2.astype(I32), axis=1)
            pairs.append(cnt)
            pures.append(cnt == n - 2 - d)
    stack = jnp.stack(pairs, 0)
    best = jnp.argmin(-stack, axis=0)                    # first (smallest d) max
    d_row = jnp.asarray(dists, I32)[best][:, None]       # (N, 1)
    d = d_row[:, 0]
    total = jnp.take_along_axis(stack, best[None, :], axis=0)[0]
    pure_best = jnp.take_along_axis(
        jnp.stack(pures, 0), best[None, :], axis=0)[0]
    pure = pure_best & (n - 1 - d >= 3) & (d <= 256)
    # purity implies total coverage n-2-d regardless of scoring lane
    # width — report it exactly so the entropy estimate stays faithful
    total = jnp.where(pure, n - 2 - d, total)
    return d_row, pure, total, total


def _eq_for(s: jax.Array, d_row: jax.Array, dists: tuple,
            last_lit: bool = True) -> jax.Array:
    """eq mask at each row's chosen distance, via a static-shift
    where-chain (one fused compare pass per candidate — no gathers, no
    per-candidate mask materialization). last_lit keeps the final byte
    out of matches (the blosclz grammar's trailing-literal rule;
    LZ4 handles its own end rules in its segmenter)."""
    N, n = s.shape
    idx = jnp.arange(n, dtype=I32)
    eq = jnp.zeros_like(s, dtype=bool)
    for d in dists:
        if d >= n:
            continue
        prev = jnp.concatenate([s[:, :d], s[:, :-d]], axis=1)
        e = (s == prev) & (idx >= d)
        eq = jnp.where(d_row == d, e, eq)
    if last_lit:
        eq = eq & (idx < n - 1)
    return eq


def _emit_pure(s: jax.Array, d_vec: jax.Array, W: int):
    """Closed-form emission for pure rows: one literal prefix of d
    bytes, ONE match token covering [d, n-1) (255-extension bytes make
    the match length unbounded, blosclz.c:698-706 — same as the
    reference encoder), a 1-byte literal tail. Byte-identical to the
    sort path on pure rows (asserted by tests/test_tpu_codec.py) at a
    fraction of its cost — no scans, no sort, one pass over a <=2 KB
    buffer."""
    G, n = s.shape
    PW = min(W, 2048)
    d = d_vec.reshape(-1, 1)                # (G,1)
    eff = n - 1 - d                         # the single run, >= 3 (pure)
    vp = eff - 3
    kp = jnp.where(vp >= 6, (vp - 6) // 255 + 1, 0)
    nc1 = (d + 31) // 32
    E1 = d + nc1
    E2 = E1 + 2 + kp                        # tok0 + ext... + dist_lo
    csize = (E2 + 2)[:, 0]                  # + tail ctrl + last byte

    dm1 = d - 1
    dhi, dlo = dm1 >> 8, dm1 & 255

    p = jnp.arange(PW, dtype=I32)[None, :]
    # region 1: literal chunks (ctrl every 33 emitted bytes). For
    # p < E1 = d + nc1 <= 33*nc1, p//33 never exceeds nc1-1, so the
    # chunk index is STATIC — the literal-byte gather compiles to a
    # constant-index reshuffle.
    k = p // 33
    isc1 = (p % 33 == 0)
    clen1 = jnp.minimum(32, d - 32 * k)
    src1 = jnp.clip(p - k - 1, 0, n - 1)[0]  # static index array
    lit1 = jnp.take(s, src1, axis=1).astype(I32)
    b1 = jnp.where(isc1, clen1 - 1, lit1)

    # region 2: the single token — tok0, kp extension bytes, dist_lo
    q = p - E1
    tok0p = (jnp.where(vp < 6, (vp + 1) << 5, 7 << 5)) | dhi
    extp = jnp.clip(vp - 6 - 255 * (q - 1), 0, 255)
    b2 = jnp.where(q == 0, tok0p, jnp.where(q <= kp, extp, dlo))

    # region 3: trailing ctrl (one literal) + the last byte
    b3 = jnp.where(p == E2, 0, s[:, n - 1:n].astype(I32))

    out = jnp.where(p < E1, b1, jnp.where(p < E2, b2, b3))
    out = jnp.where(p < csize[:, None], out, 0)
    out = out.at[:, 0].set(out[:, 0] | 32)               # format marker bit
    slots = jnp.pad(out.astype(U8), ((0, 0), (0, W - PW)))

    npart = ((d[:, 0] % 32 > 0).astype(I32) + 1)
    nfull = d[:, 0] // 32
    copy_iters = ((eff - 1) // _MATW + kp // 8)[:, 0]
    est = 1 + npart + nfull // _FASTLIT + copy_iters + 8
    return slots, csize, est


def _mine_distance(s: jax.Array, min_gap: int = 4,
                   max_gap: int = MAX_FARDIST) -> jax.Array:
    """Per-row adaptive match distance: the modal gap between repeated
    4-grams, restricted to run-boundary positions.

    This is the batched answer to the reference's hash table
    (blosclz.c:459-461): instead of chaining a table per stream, sort
    (gram, position) pairs so equal grams become neighbors — the
    predecessor with the same gram IS the nearest previous occurrence —
    then take the most common occurrence gap as the row's candidate
    distance. Restricting to positions where s[i] != s[i-1] skips run
    interiors (their trivial gap-1 repeats would drown the signal that
    matters: the large byte-plane periods of shuffled counters, which
    the static candidate set cannot reach).

    Returns (N,) int32 in [min_gap, max_gap], 0 when a row has no usable
    repeat structure.
    """
    N, n = s.shape
    idx = jnp.arange(n, dtype=I32)[None, :]
    su = s.astype(jnp.uint32)
    gram = su
    for k in range(1, 4):
        gram = gram | (jnp.roll(su, -k, axis=1) << (8 * k))
    novel = jnp.concatenate(
        [jnp.ones((N, 1), bool), s[:, 1:] != s[:, :-1]], axis=1)
    novel &= idx < n - 3
    key = jnp.where(novel, gram, _BIGU)
    sk, si = jax.lax.sort((key, jnp.broadcast_to(idx, (N, n))),
                          dimension=1, num_keys=1, is_stable=True)
    same = (sk == jnp.roll(sk, 1, axis=1)) & (sk != _BIGU)
    same = same.at[:, 0].set(False)
    gap = si - jnp.roll(si, 1, axis=1)
    usable = same & (gap >= min_gap) & (gap <= max_gap)
    ds = jax.lax.sort(jnp.where(usable, gap, _BIGI), dimension=1)
    # longest equal-value run in the sorted gaps = the mode
    change = jnp.concatenate(
        [jnp.ones((N, 1), bool), ds[:, 1:] != ds[:, :-1]], axis=1)
    rstart = jax.lax.cummax(jnp.where(change, idx, 0), axis=1)
    count = jnp.where(ds < _BIGI, idx - rstart + 1, 0)
    best = jnp.argmax(count, axis=1)
    d = jnp.take_along_axis(ds, best[:, None], axis=1)[:, 0]
    hits = jnp.take_along_axis(count, best[:, None], axis=1)[:, 0]
    d = jnp.where((hits >= 4) & (d < _BIGI), d, 0)
    return d, jnp.where(d > 0, hits, 0)


_BIGU = jnp.uint32(0xFFFFFFFF)
_BIGI = jnp.int32(0x7FFFFFFF)

_MINE_PREFIX = 4096         # near-range miner: exact grams on this prefix
                            # (round 4: 16384 -> 4096 — the prefix sorts
                            # were the dominant mining cost at 512-row
                            # clevel-5 batches, 9.2 of 27 ms; distances
                            # > 4096 that are 16-aligned stay visible to
                            # the fold16 miner, and the static candidate
                            # set owns everything <= 256)
_FOLD_G = 16                # far-range miner: group-fold factor


def _fold_g(n: int) -> int:
    """Fold factor by row width: wide rows (the clevel>=5 reference
    geometry) fold 32:1 so the fold sort stays ~4K lanes — halving the
    dominant mining cost at 128 KB splits while still reaching every
    distance ≡ 0 mod 32 (the byte-plane staircases of shuffled
    counters are power-of-two periods well above 32).
    CBLOSC_TPU_FOLD_G overrides for on-chip tuning."""
    import os

    v = os.environ.get("CBLOSC_TPU_FOLD_G")
    if v:
        try:
            return max(4, min(int(v), 256))
        except ValueError:
            pass
    return 32 if n >= 131072 else _FOLD_G


def _fold(s: jax.Array, G: int) -> jax.Array:
    """Fold every G bytes to one hash byte: a repeat of 4 consecutive
    hash bytes at group-gap g implies (whp) a true 4G-byte repeat at
    byte distance G*g — full-range structure at 1/G the mining cost
    (only distances ≡ 0 mod G are visible; the exact prefix miner owns
    the near range)."""
    N, n = s.shape
    g = s.reshape(N, n // G, G).astype(jnp.uint32)
    w = jnp.asarray(
        tuple(((2654435761 * (k + 1)) >> 13) & 0xFF for k in range(G)),
        jnp.uint32)[None, None, :]
    h = jnp.sum(g * w, axis=2)
    return ((h ^ (h >> 8) ^ (h >> 16)) & 0xFF).astype(U8)


def _fold16(s: jax.Array) -> jax.Array:     # compat shim (probes)
    return _fold(s, _FOLD_G)


def mine_group(s: jax.Array, d_row: jax.Array,
               max_d: int = MAX_FARDIST):
    """Dual-miner with exact verification for one emission group.

    Two cheap candidate miners run unconditionally: exact 4-gram mining
    on a _MINE_PREFIX-byte prefix (any distance < prefix) and 4-gram
    mining over the folded hash stream (full row, distances ≡ 0 mod FG
    — the far byte-plane periods of shuffled counters, e.g. the d=64000
    staircase that made mining worth 24% on the ramp workload). Exact
    coverage verification (_eq_at, one dynamic-slice + compare per
    candidate) runs only when some row produced a candidate — groups of
    random data pay only the candidate sorts (~1/10 of a full-width
    mining sort).

    Adoption demands cov >= n/6 (the coverage at which the emitted
    stream can beat blosclz's entropy-probe threshold) — weak adoptions
    would drag near-random rows through the wide emission sort for no
    ratio. No static-coverage comparison: mining LAYERS on the static
    class, so a far distance can replace hundreds of short-run tokens
    even when static coverage is near-total (staircase rows).

    Returns (d_m (N,) i32 with 0 = not adopted, eq_m (N, n) bool).
    """
    N, n = s.shape
    if n >= 1024:
        dp, hp = _mine_distance(s[:, :min(n, _MINE_PREFIX)])
    else:
        dp = hp = jnp.zeros((N,), I32)
    FG = _fold_g(n)
    if n >= 32768 and n % FG == 0:
        dg, hg = _mine_distance(_fold(s, FG), 1, max_d // FG)
        dg = dg * FG
        dg = jnp.where(dg < n, dg, 0)
        hg = jnp.where(dg > 0, hg * FG, 0)   # hits count FG-byte groups
    else:
        dg = hg = jnp.zeros((N,), I32)
    dp = jnp.where(dp <= max_d, dp, 0)
    hp = jnp.where(dp > 0, hp, 0)

    def verify(_):
        # ONE exact verification, of the candidate with more estimated
        # coverage (miner hits, byte-scaled) — the second _eq_at pass
        # bought nothing measurable and cost ~25% of mine_group
        use_g = hg > hp
        d = jnp.where(use_g, dg, dp)
        eq_m = _eq_at(s, jnp.maximum(d, 1))
        cov = jnp.where(d > 0, jnp.sum(eq_m.astype(I32), axis=1), -1)
        adopt = (cov >= n // 6) & (d > 0) & (d != d_row[:, 0])
        return jnp.where(adopt, d, 0), eq_m & adopt[:, None]

    return jax.lax.cond(
        jnp.any((dp > 0) | (dg > 0)), verify,
        lambda _: (jnp.zeros((N,), I32), jnp.zeros((N, n), bool)), None)


def _eq_at(s: jax.Array, d: jax.Array) -> jax.Array:
    """(N, n) bool: s[i] == s[i - d_row] with a per-row traced distance
    (one vmapped dynamic_slice per row — ~2 us/row on TPU, amortized
    over the whole row)."""
    N, n = s.shape
    padded = jnp.concatenate([jnp.zeros_like(s), s], axis=1)
    prev = jax.vmap(
        lambda row, st: jax.lax.dynamic_slice(row, (st,), (n,))
    )(padded, jnp.clip(n - d, 0, n))
    idx = jnp.arange(n, dtype=I32)[None, :]
    return (s == prev) & (idx >= d[:, None]) & (idx < n - 1)


_PURE_GROUP = 512       # rows per class-homogeneous emission group


def _emit_group_rows() -> int:
    """Emission group size (rows). CBLOSC_TPU_EMIT_GROUP overrides the
    default for on-chip tuning: bigger groups cut the sequential
    lax.map depth (67 groups per 64 MB at the clevel-1 geometry) at the
    price of a larger per-group sort workspace."""
    import os

    v = os.environ.get("CBLOSC_TPU_EMIT_GROUP")
    if v:
        try:
            return max(8, min(int(v), 1 << 15))
        except ValueError:
            pass
    return _PURE_GROUP


@partial(jax.jit, static_argnums=(1, 2, 3))
def encode(
    s: jax.Array, dists: tuple = DISTANCES, min_cratio_x100: int = 0,
    mine: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Encode batched streams.

    s: uint8 (N, n). Returns (slots uint8 (N, slot_width(n)), csizes int32
    (N,), est_iters int32 (N,)). est_iters estimates decoder while-loop
    iterations (for the caller's stored-raw speed policy). Rows that do
    not compress report csize >= n and the caller applies the stored-raw
    rule (blosc.c:705-714).

    Rows are scored once, then emitted in CLASS-UNIFORM groups (each
    class's row segment is padded to a multiple of the group size, so a
    group never mixes classes — mixed boundary groups previously dragged
    pure/hopeless rows through the wide emission sort and the mining
    machinery, the round-2 clevel>=5 collapse): PURE rows (one run
    covers everything matchable) take the closed-form path; HOPELESS
    rows (estimated ratio below min_cratio_x100/100 — blosclz's
    entropy-probe abort, blosclz.c:425-435) pay only the dual-miner
    candidate sorts and report csize = n when nothing is mined (a row
    can look hopeless to the static probe yet hold large-period
    structure only mining sees); NORMAL rows run the scan + sort
    emission, with mined adaptive distances layered in at clevel >= 5.
    """
    N, n = s.shape
    W = slot_width(n)
    d_row, pure, cov, total = _score(s, dists)

    if N <= 8 or n < 8:  # tiny batches: grouping overhead beats the win
        mined = mine_group(s, d_row) if (mine and n >= 1024) else None
        return _emit_full(s, _eq_for(s, d_row, dists), d_row, mined)

    # entropy-probe analog: matched bytes ~ cov; emitted ~ literals +
    # token bytes + ctrl overhead
    est_csize = n - cov + cov // 170 + n // 33 + 16
    hopeless = (~pure) & (100 * n < min_cratio_x100 * est_csize)

    # PURE rows never enter the sequential group map: their emission is
    # closed-form streaming (_emit_pure), so it runs WHOLE-BATCH — on
    # shuffled typed data this removes almost every map iteration.
    # Without mining, HOPELESS rows need nothing either (csize = n; the
    # caller's stored-raw rule overwrites their slots), so the map then
    # covers only the NORMAL rows.
    slots_p, csize_p, est_p = _emit_pure(s, d_row, W)
    # map classes: 0 = normal, 1 = hopeless (mining probes it);
    # excluded rows get class 2 (pure always; hopeless when not mining)
    cls = jnp.where(pure, 2,
                    jnp.where(hopeless, 1 if mine else 2, 0))
    ncls = 2 if mine else 1

    # group size: wide rows get small groups to bound each group's
    # sort/mining workspace
    gcap = max(8, (4 << 20) // max(n, 1))
    gcap = 1 << (gcap.bit_length() - 1)
    G = min(_emit_group_rows(), gcap, 1 << (N.bit_length() - 1))
    incl = cls < ncls

    def grouped_path(_):
        # ---- class-aligned layout: segment c occupies padded slots
        # [base[c], base[c] + counts[c]), base G-aligned, so every
        # G-group is class-uniform by construction ----------------------
        order = jnp.argsort(cls, stable=True)
        inv_order = jnp.argsort(order)
        counts = jnp.stack([jnp.sum((cls == c).astype(I32))
                            for c in range(ncls)])
        padded = -(-counts // G) * G
        base = jnp.concatenate(
            [jnp.zeros((1,), I32),
             jnp.cumsum(padded)[:ncls - 1].astype(I32)])
        cum = jnp.concatenate(
            [jnp.zeros((1,), I32),
             jnp.cumsum(counts)[:ncls - 1].astype(I32)])
        M = (-(-N // G) + ncls) * G          # static slot-count bound
        j = jnp.arange(M, dtype=I32)
        c_j = jnp.zeros((M,), I32)
        for cc in range(1, ncls):
            c_j = c_j + (j >= base[cc]).astype(I32)
        rank = j - base[c_j]
        real = rank < counts[c_j]
        src = jnp.where(real, cum[c_j] + rank, N)
        src = jnp.take(jnp.concatenate([order, jnp.zeros((1,), I32)]),
                       jnp.minimum(src, N))
        live = real

        def pad_rows(a, fill=0):
            extra = jnp.full((1,) + a.shape[1:], fill, a.dtype)
            return jnp.take(jnp.concatenate([a, extra]), src, axis=0)

        so = jnp.where(live[:, None], pad_rows(s), 0)
        do = jnp.where(live[:, None], pad_rows(d_row), 1)
        g = M // G
        cgrp = c_j.reshape(g, G)[:, 0]
        live_g = live.reshape(g, G)[:, 0]    # all-pad groups skip work

        zero_dm = jnp.zeros((G,), I32)

        def emit_group(t):
            sg, dg, c0, lv = t

            def do_normal(_):
                mined = mine_group(sg, dg) if mine else None
                sl, cs, es = _emit_full(sg, _eq_for(sg, dg, dists), dg,
                                        mined)
                return sl, cs, es, (mined[0] if mined else zero_dm)

            def skip(_):
                return (jnp.zeros((G, W), U8), jnp.full((G,), n, I32),
                        jnp.zeros((G,), I32), zero_dm)

            def do_hopeless(_):
                # static-hopeless rows still probe the miners (cheap);
                # only when something was adopted does the group pay
                # emission
                mined = mine_group(sg, dg)

                def emit_mined(_):
                    sl, cs, es = _emit_full(
                        sg, _eq_for(sg, dg, dists), dg, mined)
                    return sl, cs, es, mined[0]

                return jax.lax.cond(jnp.any(mined[0] > 0), emit_mined,
                                    skip, None)

            def dispatch(_):
                if not mine:
                    return do_normal(None)
                return jax.lax.cond(c0 == 1, do_hopeless, do_normal,
                                    None)

            return jax.lax.cond(lv, dispatch, skip, None)

        slots, csize, est, dm = jax.lax.map(
            emit_group,
            (so.reshape(g, G, n), do.reshape(g, G, 1), cgrp, live_g),
        )
        # row i's padded slot: base[cls_i] + (sorted rank - class cum)
        dest = jnp.where(incl,
                         base[jnp.minimum(cls, ncls - 1)] + inv_order
                         - cum[jnp.minimum(cls, ncls - 1)], 0)
        sl_g = jnp.take(slots.reshape(-1, W), dest, axis=0)
        return (jnp.where(pure[:, None], slots_p, sl_g),
                jnp.take(csize.reshape(-1), dest),
                jnp.take(est.reshape(-1), dest),
                jnp.take(dm.reshape(-1), dest))

    # the whole grouped machinery (layout sorts, gathers, the
    # sequential map) is skipped when every row is pure or excluded —
    # the common case for shuffled typed data at speed clevels. Each
    # branch returns the FINAL slot bytes (pure rows merged inside):
    # the trivial branch hands back slots_p untouched — hopeless rows'
    # garbage there is dead, their csize = n routes them through the
    # caller's stored-raw overwrite
    slots, csize, est, dm = jax.lax.cond(
        jnp.any(incl), grouped_path,
        lambda _: (slots_p, jnp.full((N,), n, I32),
                   jnp.zeros((N,), I32), jnp.zeros((N,), I32)),
        None)
    # excluded rows: pure -> closed-form emission (slot bytes already
    # merged inside the branches); hopeless (no mining) -> the entropy
    # abort (csize = n, slots irrelevant: stored raw)
    csize = jnp.where(pure, csize_p, jnp.where(incl, csize, n))
    est = jnp.where(pure, est_p, est)
    # the entropy abort stands unless mining adopted a distance
    csize = jnp.where(hopeless & (dm == 0), n, csize)
    return slots, csize, est


def _segment(eq: jax.Array, min_len, idx: jax.Array):
    """Run segmentation of an eq mask: one token per maximal run.

    Returns (is_match, sub_start, suboff, sub_len) — per-position. The
    255-extension length encoding is unbounded (blosclz.c:698-706), so
    a run of any length is ONE match token — same as the reference
    encoder. min_len (per-row or scalar) demotes short runs to
    literals."""
    n = eq.shape[1]
    noneq = jnp.where(eq, -1, idx)
    run_start = jax.lax.cummax(noneq, axis=1) + 1
    nxt = jnp.where(eq, n, idx)
    next_noneq = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
    runlen = next_noneq - run_start              # maximal run length at eq pos

    is_match = eq & (runlen >= min_len)
    suboff = idx - run_start
    sub_start = is_match & (suboff == 0)
    return is_match, sub_start, suboff, runlen


def _emit_full(s: jax.Array, eq: jax.Array, d_row: jax.Array,
               mined=None):
    """Scan + sort emission (any row shape).

    With mined = (d_m, eq_m) from mine_group, a second match class is
    layered in: runs at the row's mined adaptive distance claim their
    positions first and the static-candidate class fills the rest — the
    batched analog of the reference hash table finding large-period
    matches (blosclz.c:459-607), including far-distance (> 8191)
    emission via the 31/255 escape (blosclz.c:733-744).
    """
    N, n = s.shape
    W = slot_width(n)
    idx = jnp.arange(n, dtype=I32)

    # -- match segmentation ---------------------------------------------------
    if mined is not None:
        d_m, eq_m = mined
        m2, ss2, so2, sl2 = _segment(
            eq_m, jnp.int32(_MINRUN_MINED)[None, None], idx)
        m1, ss1, so1, sl1 = _segment(eq & ~m2, 3, idx)
        is_match = m1 | m2
        sub_start = jnp.where(m2, ss2, ss1)
        suboff = jnp.where(m2, so2, so1)
        sub_len = jnp.where(m2, sl2, sl1)
        d_pos = jnp.where(m2, d_m[:, None], d_row)       # (N, n)
    else:
        is_match, sub_start, suboff, sub_len = _segment(eq, 3, idx)
        d_pos = jnp.broadcast_to(d_row, (N, n))

    far = is_match & (d_pos > 8191)              # 31/255 escape + 2 bytes
    v = sub_len - 3                              # wire len field: mlen = v + 3
    kext = jnp.where(v >= 6, (v - 6) // 255 + 1, 0)      # extension bytes
    tok_size = 2 + kext + 2 * far.astype(I32)    # tok0 + ext... + dist bytes

    # -- literal segmentation -------------------------------------------------
    lit = ~is_match
    nonlit = jnp.where(lit, -1, idx)
    lit_start = jax.lax.cummax(nonlit, axis=1) + 1
    lit_off = idx - lit_start
    is_ctrl = lit & (lit_off % 32 == 0)
    nxtl = jnp.where(lit, n, idx)
    next_nonlit = jnp.flip(jax.lax.cummin(jnp.flip(nxtl, 1), axis=1), 1)
    chunk_len = jnp.minimum(32, next_nonlit - idx)       # at ctrl positions

    # -- output layout (exclusive scan replaces the reference's mutex
    #    reservation protocol, blosc.c:1843-1861) -----------------------------
    c = (jnp.where(lit, 1 + is_ctrl.astype(I32), 0)
         + jnp.where(sub_start, tok_size, 0))
    off = jnp.cumsum(c, axis=1) - c
    csize = off[:, -1] + c[:, -1]

    # decoder-iteration estimate: one per match token plus one per
    # _MATW copied bytes and 8 parsed extension bytes (long matches),
    # one per 8 full literal cells (fast path), one per partial chunk
    full31 = is_ctrl & (chunk_len == 32)
    nfull = jnp.sum(full31.astype(I32), axis=1)
    npart = jnp.sum((is_ctrl & ~full31).astype(I32), axis=1)
    ntok = jnp.sum(sub_start.astype(I32), axis=1)
    copy_iters = jnp.sum(
        jnp.where(sub_start, (sub_len - 1) // _MATW + kext // 8, 0), axis=1)
    est_iters = ntok + npart + nfull // _FASTLIT + copy_iters + 8

    # -- emission: one full lane + a 4:1-compacted side lane, one sort -------
    # Token bytes ride lane 0 of consecutive match positions (a match is
    # >= 3 long — tok_size > 2 implies sub_len >= 9 for the static class
    # and mined subs are >= _MINRUN_MINED — so position u exists for
    # every byte u < tok_size). Lane 1 is then used ONLY at control
    # positions, which are provably >= 4 apart (a stretch start follows
    # at least a 3-byte match plus one literal), so lane 1 compacts 4:1
    # with a group-min — the sort shrinks from 2n to 1.25n.
    dm1 = d_pos - 1
    # far form (d > 8191): dhi/dlo carry the 31/255 escape and the
    # distance rides two trailing bytes (blosclz.c:733-744)
    dhi = jnp.where(far, 31, dm1 >> 8)
    dlo = jnp.where(far, 255, dm1 & 255)
    fdist = d_pos - 8192
    tok0 = jnp.where(v < 6, (v + 1) << 5, 7 << 5) | dhi

    def tokbyte(j):
        """j-th token byte (0-based): tok0, ext bytes, dist_lo, then —
        far matches only — the two far-distance bytes."""
        ext = jnp.clip(v - 6 - 255 * (j - 1), 0, 255)
        tail = jnp.where(j == kext + 1, dlo,
                         jnp.where(j == kext + 2, fdist >> 8, fdist & 255))
        return jnp.where(j == 0, tok0, jnp.where(kext >= j, ext, tail))

    tokbase = jnp.where(sub_start, off, off - tok_size)
    si = s.astype(I32)

    # lane 0: ctrl byte | literal byte | token byte `suboff`
    val0 = jnp.where(
        is_ctrl, chunk_len - 1,
        jnp.where(is_match, tokbyte(suboff), si))
    pos0 = jnp.where(is_match, tokbase + suboff, off)
    valid0 = lit | (is_match & (suboff < tok_size))

    # lane 1: the data byte displaced by a control byte
    key1 = jnp.where(is_ctrl, ((off + 1) << 8) | si, _BIG)
    if n % 4 == 0:
        side = jnp.min(key1.reshape(N, n // 4, 4), axis=2)
    else:
        side = key1

    key0 = jnp.where(valid0, (pos0 << 8) | val0, _BIG)
    keys = jax.lax.sort(jnp.concatenate([key0, side], axis=1), dimension=1)

    slots = (keys[:, :W] & 0xFF).astype(U8)
    slots = jnp.where(jnp.arange(W, dtype=I32)[None, :] < csize[:, None],
                      slots, 0)
    slots = slots.at[:, 0].set(slots[:, 0] | 32)         # format marker bit
    return slots, csize, est_iters


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_one(src: jax.Array, csize: jax.Array, out_len: int):
    """Decode one stream (vmapped by ``decode``). src rows are zero past
    csize, so bounded window reads past the stream parse as zeros.

    The loop body is structured so the output buffer is never routed
    through a branch: branches are read-only and return a (buffer, pos,
    len) write request; the single dynamic_update_slice at the end of
    the body is the only write. Under vmap, lax.cond branches lower to
    selects over their *outputs* — carrying `out` through them would
    copy the whole buffer per branch per iteration.

    Returns (out uint8 (out_len,), produced int32, err bool).
    """
    W = src.shape[0]
    out0 = jnp.zeros(out_len + _MATW, U8)
    srci = src.astype(I32)
    mat_t = jnp.arange(_MATW, dtype=I32)
    span = _FASTLIT * 33

    def tok_at(ip):
        return jax.lax.dynamic_index_in_dim(srci, jnp.minimum(ip, W - 1),
                                            keepdims=False)

    # state: (out, ip, op, token, rem, back, extacc, err, fin)
    def cond(st):
        return ~(st[7] | st[8])

    def body(st):
        out, ip, op, token, rem, back, extacc, err, fin = st
        opc = jnp.minimum(op, out_len)          # op <= out_len or err already

        def match_copy(a):
            ip, op, token, rem, back, extacc, err, fin = a
            chunk = jnp.minimum(jnp.minimum(_MATW, rem), out_len - opc)
            pat = jax.lax.dynamic_slice(out, (jnp.maximum(opc - back, 0),),
                                        (_MATW,))
            splat = jnp.take(pat, jnp.maximum(back - 1, 0))
            run1 = back == 1
            f = jnp.where(run1, chunk, jnp.minimum(back, chunk))
            buf = jnp.where(run1, jnp.full((_MATW,), 1, U8) * splat, pat)
            # period promotion: out[x] = out[x-back] applied twice gives
            # out[x] = out[x-2*back], valid once a full `back` bytes of
            # this match are written — so a small-period match's distance
            # doubles per iteration and finishes in O(log mlen) steps.
            # (No promotion when the write was chunk- or rem-limited:
            # a plain far copy is not periodic.)
            back2 = jnp.where(run1 | (f < back), back, 2 * back)
            return (buf, f, ip, op + f, token, rem - f, back2,
                    extacc, err, fin)

        def fastlit(a):
            # 8 consecutive full 32-byte literal cells (our encoder's shape)
            ip, op, token, rem, back, extacc, err, fin = a
            ipc = jnp.minimum(ip, jnp.maximum(W - span, 0))
            w = jax.lax.dynamic_slice(src, (ipc,), (span,))
            cells = w.reshape(_FASTLIT, 33)
            data = cells[:, :32].reshape(-1)
            buf = jnp.where(mat_t < _FASTB,
                            jnp.pad(data, (0, _MATW - _FASTB)), 0)
            ip2 = ip + span
            tok2 = cells[_FASTLIT - 1, 32].astype(I32)
            err2 = err | (op + _FASTB > out_len) | (ip2 > csize)
            return (buf, jnp.int32(_FASTB), ip2, op + _FASTB, tok2, rem,
                    back, extacc, err2, ip2 >= csize)

        def slowlit(a):
            ip, op, token, rem, back, extacc, err, fin = a
            llen = token + 1
            ipc = jnp.minimum(ip, jnp.maximum(W - _LITW, 0))
            v32 = jax.lax.dynamic_slice(src, (ipc,), (_LITW,))
            v32 = jnp.take(v32, jnp.minimum(
                jnp.arange(_LITW, dtype=I32) + (ip - ipc), _LITW - 1))
            buf = jnp.take(v32, jnp.minimum(mat_t, _LITW - 1))
            ip2 = ip + llen
            op2 = op + llen
            err2 = err | (op2 > out_len) | (ip2 > csize)
            fin2 = ip2 >= csize
            tok2 = tok_at(ip2)
            return (buf, llen, jnp.where(fin2, ip2, ip2 + 1), op2, tok2,
                    rem, back, extacc, err2, fin2)

        def literal(a):
            ip, op, token, rem, back, extacc, err, fin = a
            ipc = jnp.minimum(ip, jnp.maximum(W - span, 0))
            ctrls = jax.lax.dynamic_slice(src, (ipc,), (span,)).reshape(
                _FASTLIT, 33)[:, 32]
            ok = ((token == 31) & (ip + span < csize)
                  & (op + _FASTB <= out_len) & (ipc == ip)
                  & jnp.all(ctrls[:_FASTLIT - 1] == 31))
            return jax.lax.cond(ok, fastlit, slowlit, a)

        def tokparse(a):
            ip, op, token, rem, back, extacc, err, fin = a
            mbase = (token >> 5) - 1
            ipc = jnp.minimum(ip, jnp.maximum(W - 8, 0))
            w8 = jax.lax.dynamic_slice(srci, (ipc,), (8,))
            w8 = jnp.take(w8, jnp.minimum(
                jnp.arange(8, dtype=I32) + (ip - ipc), 7))
            lead = jnp.cumprod((w8 == 255).astype(I32))
            k = jnp.sum(lead)
            has_ext = mbase == 6
            zbuf = jnp.zeros((_MATW,), U8)

            def continue_ext(a):
                ip, op, token, rem, back, extacc, err, fin = a
                return (zbuf, jnp.int32(0), ip + 8, op, token, rem, back,
                        extacc + 8 * 255, err | (ip + 8 >= csize), fin)

            def finish(a):
                ip, op, token, rem, back, extacc, err, fin = a
                lastb = jnp.take(w8, jnp.minimum(k, 7))
                mlen = jnp.where(has_ext, 6 + extacc + 255 * k + lastb,
                                 mbase) + 3
                ip2 = ip + jnp.where(has_ext, k + 1, 0)
                dhi = token & 31
                dlo = tok_at(ip2)
                ip3 = ip2 + 1
                far = (dlo == 255) & (dhi == 31)
                b1 = tok_at(ip3)
                b2 = tok_at(ip3 + 1)
                bk = jnp.where(far, (b1 << 8) + b2 + 8192,
                               (dhi << 8) + dlo + 1)
                ip4 = ip3 + jnp.where(far, 2, 0)
                err2 = err | (bk > op) | (op + mlen > out_len) | (ip4 >= csize)
                tok2 = tok_at(ip4)
                return (zbuf, jnp.int32(0), ip4 + 1, op, tok2, mlen, bk,
                        jnp.int32(0), err2, fin)

            return jax.lax.cond(has_ext & (k == 8), continue_ext, finish, a)

        a = (ip, op, token, rem, back, extacc, err, fin)
        buf, wlen, ip, op2, token, rem, back, extacc, err, fin = jax.lax.cond(
            rem > 0, match_copy,
            lambda a: jax.lax.cond(a[2] < 32, literal, tokparse, a),
            a,
        )
        cur = jax.lax.dynamic_slice(out, (opc,), (_MATW,))
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(mat_t < wlen, buf, cur), (opc,))
        return out, ip, op2, token, rem, back, extacc, err, fin

    out, ip, op, token, rem, back, extacc, err, fin = jax.lax.while_loop(
        cond, body,
        (out0, jnp.int32(1), jnp.int32(0), srci[0] & 31,
         jnp.int32(0), jnp.int32(1), jnp.int32(0), csize <= 0, csize <= 1),
    )
    err = err | (rem > 0)
    return out[:out_len], op, err


@partial(jax.jit, static_argnums=2)
def decode(slots: jax.Array, csizes: jax.Array, out_len: int):
    """Decode batched blosclz streams.

    slots: uint8 (N, W), each row's stream in its first csizes[i] bytes,
    zero beyond. Returns (out uint8 (N, out_len), produced int32 (N,),
    err bool (N,)).
    """
    minw = _FASTLIT * 33 + 24
    if slots.shape[1] < minw:                  # bounded windows need room
        slots = jnp.pad(slots, ((0, 0), (0, minw - slots.shape[1])))
    return jax.vmap(_decode_one, in_axes=(0, 0, None))(slots, csizes, out_len)
