"""Device chunk pipeline: filter + encode / decode + unfilter on TPU.

This is the TPU counterpart of the reference's block engine hot loop
(blosc_c / blosc_d driven by the pthread pool, blosc/blosc.c:591-800,
1706-1887). Instead of a worker pool pulling blocks off a mutex-guarded
queue, the whole batch of blocks is one data-parallel program:

    blocks (nblocks, blocksize)
      -> filter (shuffle/bitshuffle, VPU)                 [filters.py]
      -> split into (nblocks*nsplits, neblock) streams
      -> vectorized encode -> worst-case slots + csizes   [codec.py]
      -> stored-raw rule applied with a select

The variable-length problem (SURVEY.md hard part #2) is solved by
fixed-shape slots + a csize vector; the serialized chunk layout is an
exclusive scan over csizes (deterministic, replacing the reference's
arrival-order mutex reservation, blosc.c:1843-1861).

Everything here is shape-specialized and jit-cached per chunk geometry
(nblocks, blocksize, nsplits, typesize, filter) — the compiled-program
cache plays the role of the reference's persistent thread pool
(blosc.c:1890-1949).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import codec, codec_lz4, filters
from ..format import constants as C

I32 = jnp.int32
U8 = jnp.uint8

# compcodes with a device codec (LZ4HC chunks carry the LZ4 wire format)
DEVICE_CODECS = (C.BLOSCLZ, C.LZ4, C.LZ4HC)
# decode-side coverage is wider: snappy decodes on device via the shared
# record machinery (tpu/codec_snappy.py), zlib via the batched DEFLATE
# FSM (tpu/codec_zlib.py), and zstd via the batched frame FSM
# (tpu/codec_zstd.py); encoding stays on the host engines, as in the
# reference (external-library wrappers, blosc.c:443-522)
DEVICE_DECODE_CODECS = DEVICE_CODECS + (C.SNAPPY, C.ZLIB, C.ZSTD)


def _codec_mod(compcode: int):
    if compcode == C.BLOSCLZ:
        return codec
    if compcode in (C.LZ4, C.LZ4HC):
        return codec_lz4
    raise ValueError(f"no device encoder for compcode {compcode}")


# The encoder's sort keys cost 8 bytes per input byte transiently; group
# rows so peak device memory stays bounded on big batches (a 256 MB batch
# would otherwise materialize ~2 GB of keys plus sort workspace).
# CBLOSC_TPU_ENCODE_GROUP overrides (bytes) for geometry tuning.
_ENCODE_GROUP_BYTES = 64 << 20


def _encode_group_bytes() -> int:
    import os

    v = os.environ.get("CBLOSC_TPU_ENCODE_GROUP")
    if v:
        try:
            return max(1 << 20, min(int(v), 1 << 30))
        except ValueError:
            pass
    return _ENCODE_GROUP_BYTES


def _encode_grouped(streams: jax.Array, compcode: int = C.BLOSCLZ,
                    min_cratio_x100: int = 0, mine: bool = False):
    mod = _codec_mod(compcode)

    def enc(x):
        return mod.encode(x, codec.DISTANCES, min_cratio_x100, mine)
    rows, n = streams.shape
    # the dual miner's candidate sorts are sub-row-width, but exact
    # verification still materializes an extra (rows, n) compare; halve
    # the group so transient workspace stays bounded
    group_bytes = _encode_group_bytes() // (2 if mine else 1)
    group = max(group_bytes // max(n, 1), 8)
    if rows <= group:
        return enc(streams)
    pad = (-rows) % group
    sp = jnp.pad(streams, ((0, pad), (0, 0)))
    grouped = sp.reshape(-1, group, n)
    slots, csizes, est = jax.lax.map(enc, grouped)
    return (
        slots.reshape(-1, slots.shape[-1])[:rows],
        csizes.reshape(-1)[:rows],
        est.reshape(-1)[:rows],
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def compress_blocks(
    blocks: jax.Array, doshuffle: int, typesize: int, nsplits: int,
    min_bytes_per_iter: int = 48, compcode: int = C.BLOSCLZ,
    min_cratio_x100: int = 0, mine: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Filter + encode full blocks on device.

    blocks: uint8 (nblocks, blocksize) with blocksize % nsplits == 0.
    Returns (slots uint8 (nblocks*nsplits, W), csizes int32) where a
    csize == neblock marks a stored-raw split (blosc.c:705-714) whose
    slot holds the filtered bytes verbatim.

    min_bytes_per_iter is a decode-speed policy: streams whose estimated
    decoder iteration count exceeds neblock / min_bytes_per_iter are
    stored raw even if they compressed a little — dense token streams
    decode slowly on TPU (the while-loop advances one token per
    iteration across the whole batch), and a marginal ratio win is not
    worth serializing every other stream in the batch. Set 0 to disable
    (maximum ratio, reference-like behavior).
    """
    nblocks, blocksize = blocks.shape
    neblock = blocksize // nsplits

    def one_batch(blk):
        filtered = filters.apply_filter(doshuffle, typesize, blk)
        streams = filtered.reshape(blk.shape[0] * nsplits, neblock)
        slots, csizes, est_iters = _encode_grouped(
            streams, compcode, min_cratio_x100, mine)
        raw = csizes >= neblock
        if min_bytes_per_iter:
            raw |= est_iters > max(neblock // min_bytes_per_iter, 32)
        csizes = jnp.where(raw, neblock, csizes)
        padded = jnp.pad(streams,
                         ((0, 0), (0, slots.shape[1] - neblock)))
        slots = jnp.where(raw[:, None], padded, slots)
        return slots, csizes

    # batches beyond the encode-group budget run as a lax.map over
    # sub-batches of WHOLE BLOCKS: XLA's codegen for the filter
    # transpose and the score compares degrades superlinearly past
    # ~64 MB operands (measured 4x on the filter at 128 MB), so keeping
    # each sub-program at the 64 MB shape is faster than one big
    # program — and the filter/encode are block-parallel by definition
    gbytes = _encode_group_bytes()
    bpg = max(gbytes // blocksize, 1)
    if nblocks <= bpg:
        return one_batch(blocks)
    g = -(-nblocks // bpg)
    pad = g * bpg - nblocks
    bp = jnp.pad(blocks, ((0, pad), (0, 0)))
    slots, csizes = jax.lax.map(
        one_batch, bp.reshape(g, bpg, blocksize))
    rows = nblocks * nsplits
    return (slots.reshape(g * bpg * nsplits, -1)[:rows],
            csizes.reshape(-1)[:rows])


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def decompress_blocks(
    slots: jax.Array,
    csizes: jax.Array,
    neblock: int,
    doshuffle: int,
    typesize: int,
    nsplits: int,
    compcode: int = C.BLOSCLZ,
    maxrec_hint: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Decode + unfilter full blocks on device.

    slots: uint8 (nblocks*nsplits, W), each row a blosclz stream (or raw
    bytes when csize == neblock), zero-padded past its csize.
    Returns (blocks uint8 (nblocks, nsplits*neblock), err bool (rows,)).
    maxrec_hint widens the walk record budget for token-dense chunks
    (host_api._record_budget derives it from the csizes).
    """
    # stored-raw rule: csize == neblock marks a raw split (blosc.c:705-714
    # guarantees conforming encoders never emit a compressed split of
    # exactly neblock bytes). Snappy is the one codec whose compressed
    # split may legally EXCEED neblock (its maxout is 32+n+n/6,
    # blosc.c:640-645) — those must reach the decoder, not the raw copy.
    if compcode == C.SNAPPY:
        raw = csizes == neblock
    else:
        raw = csizes >= neblock
    # stored-raw rows skip the token decoder entirely (csize 0 => finished);
    # the structured decoder fast-paths uniform-distance streams and falls
    # back to the loop decoder per row otherwise. Row groups bound the
    # sort/fill workspace on large batches (as in _encode_grouped).
    from . import codec_snappy, codec_zlib, codec_zstd, structured

    if compcode == C.BLOSCLZ:
        dec0 = structured.decode
    elif compcode == C.SNAPPY:
        dec0 = codec_snappy.decode
    elif compcode == C.ZLIB:
        dec0 = codec_zlib.decode
    elif compcode == C.ZSTD:
        dec0 = codec_zstd.decode
    else:
        dec0 = codec_lz4.decode

    def dec(sl, cs, n):
        return dec0(sl, cs, n, maxrec_hint)

    def one_batch(sl, cs, rawg):
        dec_cs = jnp.where(rawg, 0, cs)
        decoded, produced, errg = dec(sl, dec_cs, neblock)
        streams = jnp.where(rawg[:, None], sl[:, :neblock], decoded)
        errg = jnp.where(rawg, False, errg | (produced != neblock))
        blk = streams.reshape(sl.shape[0] // nsplits, nsplits * neblock)
        return filters.undo_filter(doshuffle, typesize, blk), errg

    # sub-batch WHOLE BLOCKS past the group budget, decode + unfilter
    # inside each sub-program (the same >64 MB XLA codegen cliff the
    # compress side hits on the filter transpose; see compress_blocks)
    rows, _ = slots.shape
    blocksize = neblock * nsplits
    bpg = max(_encode_group_bytes() // max(blocksize, 1), 1)
    group = bpg * nsplits
    if rows <= group:
        return one_batch(slots, csizes, raw)
    pad = (-rows) % group
    sp = jnp.pad(slots, ((0, pad), (0, 0)))
    cp = jnp.pad(csizes, (0, pad))
    rp = jnp.pad(raw, (0, pad), constant_values=True)
    g = sp.shape[0] // group
    if g <= 4:
        # unrolled: lax.map's dynamic slice/update per group measured
        # ~20% of the whole 128 MB decompress; at small g the program
        # size stays reasonable and XLA schedules the groups back to
        # back with plain static slices
        outs = [one_batch(sp[i * group:(i + 1) * group],
                          cp[i * group:(i + 1) * group],
                          rp[i * group:(i + 1) * group])
                for i in range(g)]
        blocks = jnp.concatenate([o[0] for o in outs])
        err = jnp.concatenate([o[1] for o in outs])
    else:
        blocks, err = jax.lax.map(
            lambda t: one_batch(t[0], t[1], t[2]),
            (sp.reshape(g, group, sp.shape[1]), cp.reshape(g, group),
             rp.reshape(g, group)),
        )
    return (blocks.reshape(-1, blocksize)[: rows // nsplits],
            err.reshape(-1)[:rows])


def decode_slot_width(neblock: int, compcode: int = C.BLOSCLZ) -> int:
    """Gather width covering any conforming split stream: blosclz/LZ4
    splits never exceed neblock (their maxout IS neblock; bigger is
    stored raw), but a compressed snappy split may reach
    32 + n + n/6 (snappy_max_compressed_length, blosc.c:640-645)."""
    if compcode == C.SNAPPY:
        return neblock + neblock // 6 + 64
    return neblock + 64


@partial(jax.jit, static_argnums=(2, 3))
def gather_slots(
    chunk: jax.Array, offsets: jax.Array, width: int, csizes_width_hint: int = 0
) -> jax.Array:
    """Slice per-split streams out of a serialized chunk on device.

    chunk: uint8 (clen,); offsets: int32 (rows,) byte offsets of each
    stream. Returns uint8 (rows, width) rows; the caller masks bytes past
    each csize to zero (codec.decode requires it).
    """
    clen = chunk.shape[0]
    idx = offsets[:, None] + jnp.arange(width, dtype=I32)[None, :]
    return jnp.take(chunk, jnp.clip(idx, 0, clen - 1))


@partial(jax.jit, static_argnums=2)
def mask_past_csize(rows: jax.Array, csizes: jax.Array, width: int) -> jax.Array:
    keep = jnp.arange(width, dtype=I32)[None, :] < csizes[:, None]
    return jnp.where(keep, rows, 0)


# ---------------------------------------------------------------------------
# Deterministic chunk layout (device-side scan; cf. SURVEY.md section 2.3)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(1, 2))
def layout_chunk(csizes: jax.Array, nblocks: int, nsplits: int):
    """Compute the serialized layout from per-split csizes.

    Returns (bstarts int32 (nblocks,), split_off int32 (rows,), total):
    block j starts at bstarts[j]; split r's payload goes at
    split_off[r] + 4 (after its little-endian length word). Offsets are
    absolute chunk offsets (header 16 + 4*nblocks table included).
    """
    per_split = csizes.reshape(nblocks, nsplits) + 4
    per_block = per_split.sum(axis=1)
    header = 16 + 4 * nblocks
    bstarts = header + jnp.cumsum(per_block) - per_block
    flat = (per_split.reshape(-1))
    split_off = (header + jnp.cumsum(flat) - flat).astype(I32)
    total = header + per_block.sum()
    return bstarts.astype(I32), split_off, total


@partial(jax.jit, static_argnums=(3,))
def compact_chunk(
    slots: jax.Array, csizes: jax.Array, split_off: jax.Array, out_cap: int
) -> jax.Array:
    """Scatter framed split streams into their final chunk positions.

    Produces the chunk body (everything after the 16-byte header and the
    bstarts table, which the host writes); returns uint8 (out_cap,).
    """
    rows, W = slots.shape
    pos = jnp.arange(W + 4, dtype=I32)[None, :]
    # framed row r: 4-byte LE csize then payload
    cs = csizes[:, None]
    le = jnp.concatenate(
        [
            (cs >> 0) & 0xFF, (cs >> 8) & 0xFF,
            (cs >> 16) & 0xFF, (cs >> 24) & 0xFF,
        ],
        axis=1,
    ).astype(U8)
    framed = jnp.concatenate([le, slots], axis=1)
    keep = pos < cs + 4
    dest = jnp.where(keep, split_off[:, None] + pos, out_cap)
    out = jnp.zeros((out_cap + 1,), U8)
    out = out.at[dest.reshape(-1)].set(framed.reshape(-1), mode="drop")
    return out[:out_cap]
