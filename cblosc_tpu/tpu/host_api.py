"""Host-facing TPU backend: serialized chunks in, serialized chunks out.

Bridges the byte-oriented public API (cblosc_tpu.api) to the device
pipeline (cblosc_tpu.tpu.pipeline). Full blocks run on device; the
leftover block (different geometry, blosc.c:627-633) runs through the
host engine; the serialized result is byte-for-byte a conforming chunk
(README_CHUNK_FORMAT.rst) that any reader — including the reference C
library — decodes.

BloscLZ and LZ4/LZ4HC have device codecs; snappy additionally has a
device decoder (tpu/codec_snappy.py — encoding stays host-side, as the
reference's external-library wrappers did); other compcodes return None
here and the backend router falls back to the native/numpy engines
(cblosc_tpu.core.backend). With the Pallas expand kernel (TPU default)
mixed-distance foreign streams — host/reference blosclz, any LZ4 block,
any snappy stream — decode on device; only record-overflow geometries
(token-dense beyond max_records) fall back.

For data that already lives on device (the TPU-native use case: compress
before a DCN transfer or a checkpoint write), use cblosc_tpu.tpu.pipeline
directly — this module exists for the drop-in byte API.
"""

from __future__ import annotations

import struct

import numpy as np

from ..core import engine, policy
from ..format import constants as C
from ..format.header import ChunkHeader, FormatError, read_bstarts, validate_header


def _jnp():
    import jax.numpy as jnp

    return jnp


def compress_chunk(ctx, data: bytes) -> bytes | None:
    """Compress via the device pipeline. Returns the chunk, b"" when the
    data is incompressible within destsize, or None to fall back."""
    from . import pipeline

    if (ctx.memcpyed or ctx.compcode not in pipeline.DEVICE_CODECS
            or ctx.nblocks == 0):
        return None
    # retune geometry for the device encoder when the caller used the
    # default (CPU L1) heuristic; a forced blocksize is respected
    default_bs = policy.compute_blocksize(
        ctx.clevel, ctx.typesize, ctx.nbytes, 0, ctx.compcode, ctx.splitmode
    )
    if ctx.blocksize == default_bs:
        dev_bs = policy.compute_blocksize_device(
            ctx.clevel, ctx.typesize, ctx.nbytes, 0, ctx.compcode,
            ctx.splitmode,
        )
        if dev_bs != ctx.blocksize:
            ctx = engine.build_context(
                ctx.clevel, ctx.doshuffle, ctx.typesize, ctx.nbytes,
                ctx.destsize, ctx.compcode, splitmode=ctx.splitmode,
                nthreads=ctx.nthreads, exact_blocksize=dev_bs,
            )
    nfull = ctx.nbytes // ctx.blocksize
    if nfull == 0:
        return None
    nsplits = policy.nsplits_encode(ctx.dont_split, ctx.typesize, False)
    if ctx.blocksize % nsplits:
        return None

    jnp = _jnp()
    src = np.frombuffer(bytes(data), dtype=np.uint8)
    x = jnp.asarray(src[: nfull * ctx.blocksize].reshape(nfull, ctx.blocksize))
    slots, csizes = pipeline.compress_blocks(
        x, ctx.doshuffle, ctx.typesize, nsplits,
        policy.device_min_bytes_per_iter(ctx.clevel), ctx.compcode,
        policy.device_min_cratio_x100(ctx.clevel),
        policy.device_mine(ctx.clevel),
    )
    # body assembly ON DEVICE (pipeline.compact_chunk at exclusively-
    # scanned offsets — the deterministic replacement for the reference's
    # mutex-reserved output cursor, blosc.c:1843-1861); one fetch of the
    # worst-case body replaces a Python join over every split frame
    neblock = ctx.blocksize // nsplits
    cap = nfull * nsplits * (neblock + 4)    # stored-raw rule caps csize
    body = np.asarray(_compact_body(slots, csizes, cap))
    cs_np = np.asarray(csizes, dtype=np.int64)

    header = 16 + 4 * ctx.nblocks
    blk_sizes = (cs_np.reshape(nfull, nsplits) + 4).sum(axis=1)
    bstarts = header + np.concatenate(([0], np.cumsum(blk_sizes)))
    body_len = int(bstarts[-1]) - header
    total = header + body_len
    bstarts = list(bstarts[:nfull])

    tail = b""
    if ctx.leftover:
        enc = engine.compress_block(ctx, src, nfull)
        if enc is None:
            return _fallback_memcpy(ctx, src)
        tail = bytes(enc)
        bstarts.append(total)
        total += len(tail)
    if total > ctx.destsize:
        return _fallback_memcpy(ctx, src)
    hdr = ChunkHeader(
        version=C.VERSION_FORMAT, versionlz=ctx.versionlz, flags=ctx.flags,
        typesize=ctx.typesize & 0xFF, nbytes=ctx.nbytes,
        blocksize=ctx.blocksize, cbytes=total,
    )
    return b"".join([
        hdr.encode(), struct.pack(f"<{ctx.nblocks}i", *bstarts),
        body[:body_len].tobytes(), tail,
    ])


def _compact_body(slots, csizes, cap: int):
    from . import pipeline

    jnp = _jnp()
    per = csizes + 4
    split_off = jnp.cumsum(per) - per        # body-relative offsets
    return pipeline.compact_chunk(slots, csizes, split_off.astype(jnp.int32),
                                  cap)


def _fallback_memcpy(ctx, src: np.ndarray) -> bytes:
    if ctx.nbytes + C.MAX_OVERHEAD <= ctx.destsize:
        return engine._memcpyed_chunk(ctx, src)
    return b""


def _escalated_budget(neblock: int, compcode: int) -> int:
    """Retry record budget for token-dense foreign chunks (short matches
    every few bytes, e.g. reference-encoded text). The default budget is
    sized for well-behaved streams; a chunk that overflows it reports
    err, and the caller retries ONCE with this budget before falling
    back to a host engine — only such chunks pay the second (lazily
    compiled) pass, and an insufficient budget only ever costs the
    fallback, never correctness. BloscLZ needs no retry: its overflow
    rows decode on-device through the generic loop decoder."""
    if compcode == C.BLOSCLZ:
        return 0
    if compcode == C.ZLIB:
        from . import codec_zlib

        return codec_zlib.high_events(neblock)
    if compcode == C.ZSTD:
        from . import codec_zstd

        return codec_zstd.high_events(neblock)
    from . import structured

    return structured.high_records(neblock)


def _split_table(chunk: np.ndarray, bstarts, nsplits: int):
    """Per-split (offset, csize) tables for the selected blocks.

    The wire layout chains split frames within a block ([int32 csize]
    [payload])*, so offsets within a block are sequential — but blocks
    are independent (bstarts is explicit), which lets the scan run
    VECTORIZED across blocks, one of nsplits (<= 16) numpy steps instead
    of a Python loop per split per block. Bounds mirror blosc_d's
    validation (blosc.c:762-770)."""
    clen = chunk.size
    nb = len(bstarts)
    pos = np.asarray(bstarts, dtype=np.int64)
    offs = np.empty((nb, nsplits), dtype=np.int32)
    csizes = np.empty((nb, nsplits), dtype=np.int32)
    for s in range(nsplits):
        if nb and (pos.min() < 0 or pos.max() + 4 > clen):
            raise FormatError("split offset out of range")
        idx = pos[:, None] + np.arange(4)
        cs = chunk[idx].astype(np.int64) @ (1 << (8 * np.arange(4)))
        cs = (cs & 0xFFFFFFFF).astype(np.int64)
        cs = np.where(cs >= 1 << 31, cs - (1 << 32), cs)    # int32 LE
        if nb and ((cs < 0).any() or (pos + 4 + cs > clen).any()):
            raise FormatError("split size out of range")
        offs[:, s] = pos + 4
        csizes[:, s] = cs
        pos = pos + 4 + cs
    return offs.reshape(-1), csizes.reshape(-1)


def getitem(chunk_bytes, start: int, nitems: int) -> bytes | None:
    """Partial decompression on device (blosc_getitem, blosc.c:1574-1703):
    only the blocks overlapping [start, start+nitems) items are decoded.
    Returns None to fall back to the host engine."""
    from . import pipeline

    chunk = np.frombuffer(bytes(chunk_bytes), dtype=np.uint8)
    hdr = ChunkHeader.decode(chunk_bytes)
    if (hdr.memcpyed or hdr.compcode not in pipeline.DEVICE_DECODE_CODECS
            or hdr.nbytes == 0):
        return None
    ts = hdr.typesize
    stop = start + nitems
    if start < 0 or stop * ts > hdr.nbytes or nitems < 0:
        raise IndexError("getitem range out of bounds")
    b0 = (start * ts) // hdr.blocksize
    b1 = min((stop * ts + hdr.blocksize - 1) // hdr.blocksize, hdr.nblocks)
    nfull = hdr.nblocks - (1 if hdr.leftover else 0)
    b1_dev = min(b1, nfull)
    if b1_dev <= b0:
        return None                      # only the leftover block: host path
    nsplits = policy.nsplits_decode(
        hdr.dont_split, hdr.typesize, hdr.blocksize, False
    )
    if hdr.blocksize % nsplits:
        return None
    neblock = hdr.blocksize // nsplits

    bstarts = read_bstarts(chunk_bytes, hdr.nblocks)
    offs, csizes = _split_table(chunk, bstarts[b0:b1_dev], nsplits)

    jnp = _jnp()
    width = pipeline.decode_slot_width(neblock, hdr.compcode)
    chunk_dev = jnp.asarray(chunk)
    rows = pipeline.gather_slots(chunk_dev, jnp.asarray(offs), width)
    rows = pipeline.mask_past_csize(rows, jnp.asarray(csizes), width)
    doshuffle = (
        C.SHUFFLE if hdr.doshuffle else (C.BITSHUFFLE if hdr.dobitshuffle else 0)
    )
    blocks, err = pipeline.decompress_blocks(
        rows, jnp.asarray(csizes), neblock, doshuffle, hdr.typesize, nsplits,
        hdr.compcode,
    )
    if bool(np.asarray(err).any()):
        hi = _escalated_budget(neblock, hdr.compcode)
        if hi:              # token-dense streams: one widened-budget retry
            blocks, err = pipeline.decompress_blocks(
                rows, jnp.asarray(csizes), neblock, doshuffle,
                hdr.typesize, nsplits, hdr.compcode, hi,
            )
        if bool(np.asarray(err).any()):
            if hdr.compcode != C.BLOSCLZ:
                return None  # foreign geometry: host engines decode it
            raise FormatError("corrupt blosclz stream (device getitem)")
    out = np.asarray(blocks).reshape(-1)

    if b1 > b1_dev:                      # leftover block overlaps the range
        tail = engine.decompress_block(
            hdr, chunk, bstarts[nfull], hdr.leftover, leftoverblock=True
        )
        out = np.concatenate([out, np.asarray(tail)])
    lo = start * ts - b0 * hdr.blocksize
    hi = stop * ts - b0 * hdr.blocksize
    return out[lo:hi].tobytes()


def decompress_chunk(chunk_bytes, destsize: int | None = None) -> bytes | None:
    """Decompress via the device pipeline; None to fall back to host."""
    chunk = np.frombuffer(bytes(chunk_bytes), dtype=np.uint8)
    from . import pipeline

    hdr = ChunkHeader.decode(chunk_bytes)
    if destsize is None:
        destsize = hdr.nbytes
    validate_header(hdr, destsize)
    if hdr.nbytes == 0:
        return b""
    if hdr.memcpyed or hdr.compcode not in pipeline.DEVICE_DECODE_CODECS:
        return None
    nblocks, leftover = hdr.nblocks, hdr.leftover
    nfull = nblocks - (1 if leftover else 0)
    if nfull == 0:
        return None
    nsplits = policy.nsplits_decode(
        hdr.dont_split, hdr.typesize, hdr.blocksize, False
    )
    if hdr.blocksize % nsplits:
        return None
    neblock = hdr.blocksize // nsplits

    bstarts = read_bstarts(chunk_bytes, nblocks)
    offs, csizes = _split_table(chunk, bstarts[:nfull], nsplits)

    jnp = _jnp()
    width = pipeline.decode_slot_width(neblock, hdr.compcode)
    chunk_dev = jnp.asarray(chunk)
    rows = pipeline.gather_slots(chunk_dev, jnp.asarray(offs), width)
    rows = pipeline.mask_past_csize(rows, jnp.asarray(csizes), width)
    doshuffle = (
        C.SHUFFLE if hdr.doshuffle else (C.BITSHUFFLE if hdr.dobitshuffle else 0)
    )
    blocks, err = pipeline.decompress_blocks(
        rows, jnp.asarray(csizes), neblock, doshuffle, hdr.typesize, nsplits,
        hdr.compcode,
    )
    if bool(np.asarray(err).any()):
        hi = _escalated_budget(neblock, hdr.compcode)
        if hi:              # token-dense streams: one widened-budget retry
            blocks, err = pipeline.decompress_blocks(
                rows, jnp.asarray(csizes), neblock, doshuffle,
                hdr.typesize, nsplits, hdr.compcode, hi,
            )
        if bool(np.asarray(err).any()):
            if hdr.compcode != C.BLOSCLZ:
                return None  # foreign geometry: host engines decode it
            raise FormatError("corrupt blosclz stream (device decode)")
    out = np.asarray(blocks).reshape(-1)

    if leftover:
        tail = engine.decompress_block(
            hdr, chunk, bstarts[nfull], leftover, leftoverblock=True
        )
        return out.tobytes() + tail.tobytes()
    return out.tobytes()
