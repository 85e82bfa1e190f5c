"""Pure policy functions: blocksize heuristic and block-split decision.

These are *format-relevant behavior* (they determine block geometry and the
DONT_SPLIT header bit) and therefore reproduce the reference's decision
tables exactly (blosc.c:929-959 split policy, blosc.c:962-1060 blocksize),
as pure functions with no global state.
"""

from __future__ import annotations

from ..format import constants as C

# Codecs "meant for high compression ratios" get doubled block sizes
# (reference HCR() macro, blosc.c:922-925).
_HCR_CODECS = frozenset({C.LZ4HC, C.ZLIB, C.ZSTD})

# clevel -> blocksize multiplier (in units of L1), blosc.c:996-1028.
_CLEVEL_SCALE = {
    0: 0.25,
    1: 0.5,
    2: 1,
    3: 2,
    4: 4,
    5: 4,
    6: 8,
    7: 8,
    8: 8,
    9: 8,
}


def split_block(
    compcode: int,
    typesize: int,
    blocksize: int,
    splitmode: int = C.FORWARD_COMPAT_SPLIT,
) -> bool:
    """Whether blocks are split into ``typesize`` independent sub-streams.

    Mirrors blosc.c:929-959. Splitting only ever applies when typesize is
    small (<= MAX_SPLITS) and the per-split stream is not tiny.
    """
    if splitmode == C.ALWAYS_SPLIT:
        return True
    if splitmode == C.NEVER_SPLIT:
        return False
    splittable = (
        typesize <= C.MAX_SPLITS and blocksize // typesize >= C.MIN_BUFFERSIZE
    )
    if splitmode == C.AUTO_SPLIT:
        # Fast codecs benefit from splits; LZ4 measured faster unsplit.
        return compcode in (C.BLOSCLZ, C.SNAPPY) and splittable
    if splitmode == C.FORWARD_COMPAT_SPLIT:
        # Split everything but zstd so old readers stay compatible.
        return compcode != C.ZSTD and splittable
    raise ValueError(f"split mode {splitmode} not supported")


def compute_blocksize(
    clevel: int,
    typesize: int,
    nbytes: int,
    forced_blocksize: int = 0,
    compcode: int = C.BLOSCLZ,
    splitmode: int = C.FORWARD_COMPAT_SPLIT,
) -> int:
    """Choose the internal block size (bytes). Mirrors blosc.c:962-1060.

    The heuristic targets L1-cache-resident working sets on CPUs; we keep it
    byte-for-byte identical because the blocksize is written into the chunk
    header and determines the block/bstarts geometry every reader relies on.
    (On the TPU path a block also becomes the unit that is DMA'd into VMEM,
    for which these 32KB-1MB sizes are likewise well-suited.)
    """
    if nbytes < typesize:
        return 1

    blocksize = nbytes

    if forced_blocksize:
        blocksize = min(max(forced_blocksize, C.MIN_BUFFERSIZE), C.MAX_BLOCKSIZE)
    elif nbytes >= C.L1:
        blocksize = C.L1
        if compcode in _HCR_CODECS:
            blocksize *= 2
        try:
            scale = _CLEVEL_SCALE[clevel]
        except KeyError:
            raise ValueError(f"clevel must be 0-9, got {clevel}")
        blocksize = int(blocksize * scale)
        if clevel == 9 and compcode in _HCR_CODECS:
            blocksize *= 2

    # Enlarge the blocksize for splittable codecs (blosc.c:1031-1047):
    # one split stream per typesize byte-plane should stay >= 64 KB total,
    # capped at 1 MB.
    if clevel > 0 and split_block(compcode, typesize, blocksize, splitmode):
        blocksize = min(blocksize, 1 << 18)
        blocksize *= typesize
        blocksize = max(blocksize, 1 << 16)
        blocksize = min(blocksize, 1 << 20)

    blocksize = min(blocksize, nbytes)

    # blocksize must be a multiple of typesize (blosc.c:1054-1057).
    if blocksize > typesize:
        blocksize = blocksize // typesize * typesize

    return blocksize


def compute_blocksize_device(
    clevel: int,
    typesize: int,
    nbytes: int,
    forced_blocksize: int = 0,
    compcode: int = C.BLOSCLZ,
    splitmode: int = C.FORWARD_COMPAT_SPLIT,
) -> int:
    """Blocksize for the TPU pipeline (same format, different tuning).

    The CPU heuristic above targets L1-resident blocks. On TPU, speed
    clevels (<= 4) use 8 KB splits — wide enough that per-row overhead
    (template compares, group dispatch) amortizes, narrow enough that
    the emission sort stays cheap when NORMAL rows do appear — and
    ratio clevels (>= 5) use the reference's own 128-256 KB split
    geometry (higher clevel = bigger blocks = longer matches = better
    ratio, mirroring the reference's clevel->blocksize philosophy,
    blosc.c:996-1028). Any blocksize is a conforming chunk — bstarts
    make the geometry explicit.
    """
    import os

    if forced_blocksize or nbytes < C.L1:
        return compute_blocksize(
            clevel, typesize, nbytes, forced_blocksize, compcode, splitmode
        )
    v = os.environ.get("CBLOSC_TPU_NEBLOCK")    # geometry tuning knob
    if v:
        try:
            neblock = max(256, min(int(v), 1 << 19))
        except ValueError:
            neblock = 0
        if neblock:
            nsplits = typesize if split_block(
                compcode, typesize, neblock * typesize, splitmode
            ) else 1
            blocksize = min(neblock * nsplits, C.MAX_BLOCKSIZE, nbytes)
            if blocksize > typesize:
                blocksize = blocksize // typesize * typesize
            return max(blocksize, C.MIN_BUFFERSIZE)
    if clevel <= 4:
        # 8 KB splits: the round-4 template/pure fast paths removed the
        # emission sort from the shuffled-data hot path, so the old
        # 2 KB "fastest sort" geometry only multiplied per-row
        # overhead. Measured at clevel 1 on 64 MB (scratch/
        # r5_ab_cl1_geom.py): 2 KB 10.1/25.9, 8 KB 14.8/45.1, 16 KB
        # 15.5/39.1 GB/s comp/decomp — 8 KB wins the weaker axis with
        # ratio slightly better (2.642 vs 2.623).
        neblock = 8192
    elif clevel <= 8:
        # The reference's own clevel-5 geometry (1 MB block / typesize
        # splits, blosc.c:996-1047): long splits amortize each split's
        # incompressible literal prefix and let the mined far-distance
        # matches (codec._mine_distance) reach the large byte-plane
        # periods of shuffled counters — an int64 ramp's plane-1
        # staircase repeats at 65536 bytes, so a round-4 A/B that
        # shrank this to 32 KB (10.2 vs 4 GB/s compress) doubled the
        # ramp csize and failed the match-or-beat-host ratio gate;
        # clevel >= 5 stays a ratio level. Speed comes from cheaper
        # mining instead (codec._fold_g, 4 KB exact prefix).
        neblock = 131072
    else:
        neblock = 262144        # max ratio; decoder MAX_OUT boundary
    nsplits = typesize if split_block(
        compcode, typesize, neblock * typesize, splitmode
    ) else 1
    blocksize = min(neblock * nsplits, C.MAX_BLOCKSIZE, nbytes)
    if blocksize > typesize:
        blocksize = blocksize // typesize * typesize
    return max(blocksize, C.MIN_BUFFERSIZE)


def block_geometry(nbytes: int, blocksize: int) -> tuple[int, int]:
    """Return (nblocks, leftover) for a buffer (blosc.c:1139-1142)."""
    if blocksize <= 0:
        return 0, 0
    nblocks, leftover = divmod(nbytes, blocksize)
    if leftover:
        nblocks += 1
    return nblocks, leftover


def nsplits_encode(dont_split: bool, typesize: int, leftoverblock: bool) -> int:
    """Number of codec sub-streams for one block, encode side.

    Mirrors blosc_c (blosc.c:627-633): only the header flag and the
    leftover-block condition matter; splittability was already folded into
    the flag by split_block().
    """
    return 1 if (dont_split or leftoverblock) else typesize


def nsplits_decode(
    dont_split: bool, typesize: int, blocksize: int, leftoverblock: bool
) -> int:
    """Number of codec sub-streams for one block, decode side.

    Decode must tolerate chunks written before the split flag existed, hence
    the extra splittability re-check mirroring blosc_d (blosc.c:749-757).
    """
    if dont_split or leftoverblock:
        return 1
    if typesize <= C.MAX_SPLITS and blocksize // typesize >= C.MIN_BUFFERSIZE:
        return typesize
    return 1


def get_accel(compcode: int, clevel: int) -> int:
    """LZ4 acceleration from clevel (blosc.c:577-587)."""
    if compcode == C.LZ4:
        return 10 - clevel
    return 1


def device_min_bytes_per_iter(clevel: int) -> int:
    """Decode-speed policy for the device encoder's stored-raw rule.

    Streams whose estimated decoder iteration count exceeds
    neblock / min_bytes_per_iter are stored raw even when they compress a
    little: a marginal ratio win is not worth serializing the whole
    batch's decode loop (see pipeline.compress_blocks). clevel 9 asks for
    maximum ratio, so the guard loosens there; the CBLOSC_TPU_DECODE_EFFORT
    env var overrides (0 = reference-like maximum-ratio behavior).
    """
    import os

    v = os.environ.get("CBLOSC_TPU_DECODE_EFFORT")
    if v is not None:
        try:
            return max(0, int(v))
        except ValueError:
            pass
    return 8 if clevel >= 9 else 48


# blosclz's entropy-probe abort thresholds x100 (blosclz.c:432-435):
# rows whose estimated compression ratio falls below the clevel's
# threshold are stored raw without paying for emission.
_MIN_CRATIO_X100 = (0, 200, 150, 120, 120, 120, 120, 115, 110, 100)


def device_min_cratio_x100(clevel: int) -> int:
    return _MIN_CRATIO_X100[max(0, min(clevel, 9))]


def device_mine(clevel: int) -> bool:
    """Whether the device encoder mines a per-row adaptive match
    distance (codec._mine_distance). Mining costs two extra row sorts,
    so it follows the reference's clevel philosophy: speed levels skip
    it, ratio levels pay for it (blosclz's own clevel tables trade the
    same way, blosclz.c:432-461)."""
    return clevel >= 5
