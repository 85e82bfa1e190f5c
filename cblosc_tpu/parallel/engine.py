"""Multi-chip block parallelism: shard_map over a device mesh.

The reference scales with an intra-process pthread pool — dynamic
work-stealing over a mutex-guarded block counter, plus a mutex-serialized
output-offset reservation (blosc.c:1769-1861). The TPU-native replacement
(SURVEY.md sections 2.3/2.4):

  * the block axis is sharded over a 1-D ``jax.sharding.Mesh``; every
    device filters+encodes its contiguous slice of blocks (the static
    partition the reference already uses for decompression,
    blosc.c:1777-1791);
  * the output layout is not reserved under a lock — per-split compressed
    sizes are ``all_gather``-ed over ICI and the byte offsets fall out of
    an exclusive prefix scan, identical on every device (deterministic,
    order-preserving; both layouts are valid chunks since bstarts is
    explicit);
  * decompression is embarrassingly parallel: every device decodes its
    block slice from the replicated chunk bytes.

Multi-host deployments build the same programs under ``jax.distributed``
initialization; the mesh simply spans hosts (collectives ride ICI within
a slice and DCN across).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..tpu import pipeline

BLOCKS = "blocks"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the block axis (the framework's data-parallel axis)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (BLOCKS,))


def _nsplit_rows(mesh: Mesh) -> int:
    return mesh.shape[BLOCKS]


def compress_blocks_sharded(
    blocks: jax.Array,
    doshuffle: int,
    typesize: int,
    nsplits: int,
    mesh: Mesh,
    compcode: int = 0,
):
    """Compress a sharded batch of equal-size blocks.

    blocks: uint8 (nblocks, blocksize), nblocks % mesh size == 0.
    Returns (slots, csizes, split_off, total):
      slots     uint8 (nblocks*nsplits, W)   block-sharded
      csizes    int32 (nblocks*nsplits,)     block-sharded
      split_off int32 (nblocks*nsplits,)     block-sharded, absolute chunk
                                             offsets of each framed split
      total     int32 ()                     replicated chunk size
    """
    nblocks = blocks.shape[0]
    ndev = _nsplit_rows(mesh)
    if nblocks % ndev:
        raise ValueError(f"nblocks {nblocks} not divisible by mesh size {ndev}")
    header = 16 + 4 * nblocks

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=P(BLOCKS, None),
        out_specs=(P(BLOCKS, None), P(BLOCKS), P(BLOCKS), P()),
        check_vma=False,  # `total` is replicated by construction (all_gather)
    )
    def step(local):
        slots, csizes = pipeline.compress_blocks(
            local, doshuffle, typesize, nsplits, 48, compcode
        )
        # distributed layout: all_gather sizes over ICI, exclusive scan
        # (replaces the reference's mutex reservation, blosc.c:1843-1861)
        all_cs = jax.lax.all_gather(csizes, BLOCKS)           # (ndev, rows)
        framed = all_cs.reshape(-1) + 4
        starts = header + jnp.cumsum(framed) - framed
        total = header + framed.sum()
        my = jax.lax.axis_index(BLOCKS)
        rows = csizes.shape[0]
        my_off = jax.lax.dynamic_slice_in_dim(starts, my * rows, rows)
        return slots, csizes, my_off.astype(jnp.int32), total[None]

    slots, csizes, split_off, total = step(blocks)
    return slots, csizes, split_off, total[0]


def decompress_blocks_sharded(
    chunk: jax.Array,
    offs: jax.Array,
    csizes: jax.Array,
    neblock: int,
    doshuffle: int,
    typesize: int,
    nsplits: int,
    mesh: Mesh,
    compcode: int = 0,
):
    """Decode a chunk's full blocks across the mesh.

    chunk: uint8 (clen,) replicated; offs/csizes: int32 (rows,) sharded
    over blocks. Returns (blocks uint8 (nblocks, blocksize) sharded,
    err bool (rows,) sharded).
    """
    width = pipeline.decode_slot_width(neblock, compcode)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(BLOCKS), P(BLOCKS)),
        out_specs=(P(BLOCKS, None), P(BLOCKS)),
        check_vma=False,  # decoder cond branches mix varying/replicated
    )
    def step(chunk, offs, csizes):
        rows = pipeline.gather_slots(chunk, offs, width)
        rows = pipeline.mask_past_csize(rows, csizes, width)
        return pipeline.decompress_blocks(
            rows, csizes, neblock, doshuffle, typesize, nsplits, compcode
        )

    return step(chunk, offs, csizes)


def training_step(blocks: jax.Array, doshuffle: int, typesize: int,
                  nsplits: int, mesh: Mesh):
    """One full sharded roundtrip step (compress -> layout -> decompress),
    the framework's equivalent of a training step: this is what
    __graft_entry__.dryrun_multichip jit-compiles over an N-device mesh."""
    slots, csizes, split_off, total = compress_blocks_sharded(
        blocks, doshuffle, typesize, nsplits, mesh
    )
    neblock = blocks.shape[1] // nsplits

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(BLOCKS, None), P(BLOCKS)),
        out_specs=(P(BLOCKS, None), P(BLOCKS)),
        check_vma=False,
    )
    def dec(slots, csizes):
        rows = pipeline.mask_past_csize(slots, csizes, slots.shape[1])
        return pipeline.decompress_blocks(
            rows, csizes, neblock, doshuffle, typesize, nsplits
        )

    out, err = dec(slots, csizes)
    return out, err, total


SPLITS = "splits"


def make_mesh_2d(n_devices: int | None = None, splits_axis: int = 2) -> Mesh:
    """2-D mesh: blocks (data-parallel) x splits (tensor-parallel-like).

    Sharding the split axis places each block's byte-plane sub-streams on
    different devices — the TPU analog of the reference's per-split codec
    calls inside one worker (blosc.c:627-719) lifted onto the ICI.
    """
    import numpy as np

    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    while n % splits_axis:
        splits_axis //= 2
    return Mesh(np.array(devs).reshape(n // splits_axis, splits_axis),
                (BLOCKS, SPLITS))


def training_step_2d(blocks: jax.Array, doshuffle: int, typesize: int,
                     nsplits: int, mesh: Mesh):
    """Full roundtrip over a 2-D (blocks x splits) mesh.

    Filters run block-sharded (a block's shuffle needs its whole row),
    then the filtered streams reshard over BOTH axes for the codec —
    the reshard and the layout all_gathers ride the ICI.
    """
    from jax.sharding import NamedSharding

    nblocks, blocksize = blocks.shape
    neblock = blocksize // nsplits
    header = 16 + 4 * nblocks

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(BLOCKS, None), out_specs=P(BLOCKS, None),
        check_vma=False,
    )
    def filt(local):
        from ..tpu import filters

        return filters.apply_filter(doshuffle, typesize, local)

    filtered = filt(blocks).reshape(nblocks, nsplits, neblock)
    # reshard: split axis distributes over the second mesh axis
    filtered = jax.lax.with_sharding_constraint(
        filtered, NamedSharding(mesh, P(BLOCKS, SPLITS, None))
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(BLOCKS, SPLITS, None),
        out_specs=(P(BLOCKS, SPLITS, None), P(BLOCKS, SPLITS), P()),
        check_vma=False,
    )
    def enc(streams):
        from ..tpu import codec

        nb, ns, neb = streams.shape
        flat = streams.reshape(nb * ns, neb)
        slots, csizes, _ = codec.encode(flat)
        raw = csizes >= neb                    # stored-raw rule
        csizes = jnp.where(raw, neb, csizes)
        padded = jnp.pad(flat, ((0, 0), (0, slots.shape[1] - neb)))
        slots = jnp.where(raw[:, None], padded, slots)
        # layout scan over BOTH axes (deterministic bstarts input)
        all_cs = jax.lax.all_gather(
            jax.lax.all_gather(csizes, SPLITS), BLOCKS)
        framed = all_cs.reshape(-1) + 4
        total = header + framed.sum()
        return (slots.reshape(nb, ns, -1), csizes.reshape(nb, ns),
                total[None])

    slots, csizes, total = enc(filtered)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(BLOCKS, SPLITS, None), P(BLOCKS, SPLITS)),
        out_specs=(P(BLOCKS, SPLITS, None), P(BLOCKS, SPLITS)),
        check_vma=False,
    )
    def dec(slots, csizes):
        from ..tpu import pipeline, structured

        nb, ns, W = slots.shape
        rows = pipeline.mask_past_csize(
            slots.reshape(nb * ns, W), csizes.reshape(-1), W)
        raw = csizes.reshape(-1) >= neblock
        import jax.numpy as jnp2

        out, produced, err = structured.decode(
            rows, jnp.where(raw, 0, csizes.reshape(-1)), neblock)
        out = jnp.where(raw[:, None], rows[:, :neblock], out)
        err = jnp.where(raw, False, err | (produced != neblock))
        return out.reshape(nb, ns, neblock), err.reshape(nb, ns)

    streams, err = dec(slots, csizes)

    @partial(
        shard_map, mesh=mesh,
        in_specs=P(BLOCKS, None, None), out_specs=P(BLOCKS, None),
        check_vma=False,
    )
    def unfilt(streams):
        from ..tpu import filters

        nb = streams.shape[0]
        return filters.undo_filter(
            doshuffle, typesize, streams.reshape(nb, blocksize))

    # gather splits back per block before unfiltering
    streams = jax.lax.with_sharding_constraint(
        streams, NamedSharding(mesh, P(BLOCKS, None, None))
    )
    out = unfilt(streams)
    return out, err, total[0]


# ---------------------------------------------------------------------------
# Sharded byte API: serialized chunks in / out over the mesh
# ---------------------------------------------------------------------------

def compress_chunk(
    clevel: int,
    doshuffle: int,
    typesize: int,
    data: bytes,
    mesh: Mesh,
    compcode: int = 0,
) -> bytes:
    """bytes -> sharded pipeline -> serialized chunk.

    Full blocks compress across the mesh; each device compacts its
    contiguous body segment ON DEVICE (pipeline.compact_chunk at the
    globally-scanned offsets), so only final compressed bytes leave the
    devices. Blocks past the mesh-divisible prefix and the leftover
    block run through the host engine (uneven-block handling), exactly
    like the reference's serial tail.
    """
    import struct

    import numpy as np

    from ..core import engine, policy
    from ..format import constants as C
    from ..format.header import ChunkHeader

    nbytes = len(data)
    destsize = nbytes + C.MAX_OVERHEAD
    ctx = engine.build_context(
        clevel, doshuffle, typesize, nbytes, destsize, compcode,
        exact_blocksize=policy.compute_blocksize_device(
            clevel, typesize, nbytes, 0, compcode),
    )
    if (ctx.memcpyed or ctx.nblocks == 0
            or ctx.compcode not in pipeline.DEVICE_CODECS):
        return engine.compress_chunk(ctx, data)
    nsplits = policy.nsplits_encode(ctx.dont_split, ctx.typesize, False)
    if ctx.blocksize % nsplits:
        return engine.compress_chunk(ctx, data)
    ndev = _nsplit_rows(mesh)
    nfull = ctx.nbytes // ctx.blocksize
    ndevb = nfull - nfull % ndev
    src = np.frombuffer(data, dtype=np.uint8)

    parts: list[bytes] = []
    bstarts: list[int] = []
    header = 16 + 4 * ctx.nblocks
    pos = header

    if ndevb:
        x = jnp.asarray(src[: ndevb * ctx.blocksize].reshape(
            ndevb, ctx.blocksize))
        slots, csizes, split_off, _ = compress_blocks_sharded(
            x, ctx.doshuffle, ctx.typesize, nsplits, mesh, ctx.compcode)
        rows = ndevb * nsplits
        lrows = rows // ndev
        cap = int(lrows * (slots.shape[1] + 4))

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(BLOCKS, None), P(BLOCKS), P(BLOCKS)),
            out_specs=P(BLOCKS, None),
            check_vma=False,
        )
        def compact(sl, cs, offs):
            local = pipeline.compact_chunk(sl, cs, offs - offs[0], cap)
            return local[None]

        segs = np.asarray(compact(slots, csizes, split_off))
        cs_np = np.asarray(csizes).reshape(ndevb, nsplits)
        blk_sizes = (cs_np + 4).sum(axis=1)
        for j in range(ndevb):
            bstarts.append(pos)
            pos += int(blk_sizes[j])
        dev_lens = blk_sizes.reshape(ndev, -1).sum(axis=1)
        for dvi in range(ndev):
            parts.append(segs[dvi, : int(dev_lens[dvi])].tobytes())

    for j in range(ndevb, ctx.nblocks):
        enc = engine.compress_block(ctx, src, j)
        if enc is None:
            return engine.compress_chunk(ctx, data)   # incompressible path
        bstarts.append(pos)
        pos += len(enc)
        parts.append(enc)

    if pos > destsize:
        return engine.compress_chunk(ctx, data)
    hdr = ChunkHeader(
        version=C.VERSION_FORMAT, versionlz=ctx.versionlz, flags=ctx.flags,
        typesize=ctx.typesize & 0xFF, nbytes=ctx.nbytes,
        blocksize=ctx.blocksize, cbytes=pos,
    )
    return b"".join(
        [hdr.encode(), struct.pack(f"<{ctx.nblocks}i", *bstarts)] + parts)


def decompress_chunk(chunk_bytes: bytes, mesh: Mesh) -> bytes:
    """Serialized chunk -> sharded decode -> bytes (static contiguous
    block partition per device, as the reference's decompression side,
    blosc.c:1777-1791)."""
    import numpy as np

    from ..core import engine, policy
    from ..format.header import ChunkHeader, FormatError, read_bstarts

    chunk = np.frombuffer(bytes(chunk_bytes), dtype=np.uint8)
    hdr = ChunkHeader.decode(chunk_bytes)
    if (hdr.memcpyed or hdr.nbytes == 0
            or hdr.compcode not in pipeline.DEVICE_DECODE_CODECS):
        return engine.decompress_chunk(bytes(chunk_bytes), hdr.nbytes, 1)
    nsplits = policy.nsplits_decode(
        hdr.dont_split, hdr.typesize, hdr.blocksize, False)
    if hdr.blocksize % nsplits:
        return engine.decompress_chunk(bytes(chunk_bytes), hdr.nbytes, 1)
    neblock = hdr.blocksize // nsplits
    ndev = _nsplit_rows(mesh)
    nfull = hdr.nblocks - (1 if hdr.leftover else 0)
    ndevb = nfull - nfull % ndev

    from ..tpu.host_api import _split_table

    bstarts = read_bstarts(chunk_bytes, hdr.nblocks)
    offs, csizes = _split_table(chunk, bstarts[:ndevb], nsplits)

    out_parts = []
    if ndevb:
        from ..format import constants as C

        doshuffle = (C.SHUFFLE if hdr.doshuffle
                     else (C.BITSHUFFLE if hdr.dobitshuffle else 0))
        blocks, err = decompress_blocks_sharded(
            jnp.asarray(chunk), jnp.asarray(offs), jnp.asarray(csizes),
            neblock, doshuffle, hdr.typesize, nsplits, mesh, hdr.compcode)
        if bool(np.asarray(err).any()):
            return engine.decompress_chunk(bytes(chunk_bytes), hdr.nbytes, 1)
        out_parts.append(np.asarray(blocks).reshape(-1).tobytes())
    for j in range(ndevb, hdr.nblocks):
        bsize = hdr.blocksize
        lob = False
        if j == hdr.nblocks - 1 and hdr.leftover:
            bsize = hdr.leftover
            lob = True
        out_parts.append(engine.decompress_block(
            hdr, chunk, bstarts[j], bsize, leftoverblock=lob).tobytes())
    return b"".join(out_parts)
