"""Sharded engine on the 8-virtual-device CPU mesh (conftest)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cblosc_tpu import parallel
from cblosc_tpu.tpu import pipeline
from tests.conftest import make_buffer


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return parallel.make_mesh()


def test_sharded_compress_matches_single_device(rng, mesh):
    nblocks, bs, T = 16, 8192, 4
    data = np.frombuffer(
        make_buffer(rng, nblocks * bs, T, "lowentropy"), np.uint8
    ).reshape(nblocks, bs)
    x = jnp.asarray(data)
    slots1, cs1 = pipeline.compress_blocks(x, 1, T, T)
    slots8, cs8, off8, total8 = parallel.compress_blocks_sharded(
        x, 1, T, T, mesh
    )
    assert np.array_equal(np.asarray(cs1), np.asarray(cs8))
    assert np.array_equal(np.asarray(slots1), np.asarray(slots8))
    # deterministic layout: offsets are the exclusive scan of framed sizes
    framed = np.asarray(cs1) + 4
    starts = 16 + 4 * nblocks + np.cumsum(framed) - framed
    assert np.array_equal(np.asarray(off8), starts.astype(np.int32))
    assert int(total8) == 16 + 4 * nblocks + framed.sum()


def test_sharded_roundtrip_step(rng, mesh):
    nblocks, bs, T = 8, 4096, 4
    data = np.frombuffer(
        make_buffer(rng, nblocks * bs, T, "ramp"), np.uint8
    ).reshape(nblocks, bs)
    out, err, total = parallel.training_step(jnp.asarray(data), 1, T, T, mesh)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), data)
    assert int(total) < nblocks * bs  # ramps compress


def test_sharded_decompress(rng, mesh):
    import cblosc_tpu as b
    from cblosc_tpu.format.header import ChunkHeader, read_bstarts
    from cblosc_tpu.core import policy

    nbytes = 8 * 65536
    data = make_buffer(rng, nbytes, 8, "lowentropy")
    chunk = b.compress_ctx(5, 1, 8, data, backend="numpy")
    hdr = ChunkHeader.decode(chunk)
    nsp = policy.nsplits_decode(hdr.dont_split, hdr.typesize, hdr.blocksize, False)
    neblock = hdr.blocksize // nsp
    nfull = hdr.nblocks - (1 if hdr.leftover else 0)
    if nfull % len(jax.devices()):
        pytest.skip("block count not divisible by mesh")
    bstarts = read_bstarts(chunk, hdr.nblocks)
    carr = np.frombuffer(chunk, np.uint8)
    offs, csz = [], []
    for j in range(nfull):
        pos = bstarts[j]
        for s in range(nsp):
            cs = int(np.frombuffer(carr[pos:pos + 4].tobytes(), "<i4")[0])
            offs.append(pos + 4)
            csz.append(cs)
            pos += 4 + cs
    blocks, err = parallel.decompress_blocks_sharded(
        jnp.asarray(carr), jnp.asarray(np.array(offs, np.int32)),
        jnp.asarray(np.array(csz, np.int32)), neblock, 1, 8, nsp, mesh
    )
    assert not np.asarray(err).any()
    got = np.asarray(blocks).reshape(-1).tobytes()
    assert got == data[: nfull * hdr.blocksize]


def test_sharded_lz4_roundtrip(rng, mesh):
    from cblosc_tpu.format import constants as C

    nblocks, bs, T = 8, 4096, 4
    data = np.frombuffer(
        make_buffer(rng, nblocks * bs, T, "lowentropy"), np.uint8
    ).reshape(nblocks, bs)
    x = jnp.asarray(data)
    slots, cs, off, total = parallel.compress_blocks_sharded(
        x, 1, T, T, mesh, C.LZ4
    )
    s1, c1 = pipeline.compress_blocks(x, 1, T, T, 48, C.LZ4)
    assert np.array_equal(np.asarray(cs), np.asarray(c1))
    blocks, err = pipeline.decompress_blocks(
        pipeline.mask_past_csize(slots, cs, slots.shape[1]),
        cs, bs // T, 1, T, T, C.LZ4,
    )
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(blocks), data)


def test_sharded_bitshuffle_roundtrip(rng, mesh):
    nblocks, bs, T = 8, 4096, 4
    data = np.frombuffer(
        make_buffer(rng, nblocks * bs, T, "ramp"), np.uint8
    ).reshape(nblocks, bs)
    out, err, total = parallel.training_step(jnp.asarray(data), 2, T, T, mesh)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), data)


def test_2d_mesh_roundtrip(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    mesh2 = parallel.make_mesh_2d(8, 2)
    nblocks, bs, T = 16, 4096, 4
    data = np.frombuffer(
        make_buffer(rng, nblocks * bs, T, "lowentropy"), np.uint8
    ).reshape(nblocks, bs)
    out, err, total = jax.jit(
        lambda x: parallel.training_step_2d(x, 1, T, T, mesh2)
    )(data)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), data)


def test_sharded_byte_api_roundtrip(rng, mesh):
    """bytes -> sharded compress (device-side segment assembly) ->
    conforming chunk; decodes in the oracle AND back through the
    sharded decoder. Includes an uneven tail (blocks % mesh != 0 plus a
    leftover block)."""
    import cblosc_tpu as b

    data = make_buffer(rng, 300_000, 4, "ramp")   # blocks + uneven tail
    chunk = parallel.compress_chunk(5, 1, 4, data, mesh)
    assert chunk and len(chunk) < len(data)
    # conforming chunk: the plain byte API decodes it
    assert b.decompress_ctx(chunk) == data
    # sharded decode of a HOST-encoded chunk too (foreign layout)
    host_chunk = b.compress_ctx(5, 1, 4, data)
    assert parallel.decompress_chunk(host_chunk, mesh) == data
    # and of its own chunk
    assert parallel.decompress_chunk(chunk, mesh) == data


def test_sharded_byte_api_tiny_and_incompressible(rng, mesh):
    import cblosc_tpu as b

    tiny = b"x" * 64                                  # memcpy path
    c = parallel.compress_chunk(5, 1, 4, tiny, mesh)
    assert b.decompress_ctx(c) == tiny
    noise = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    c2 = parallel.compress_chunk(5, 1, 8, noise, mesh)
    assert c2 and b.decompress_ctx(c2) == noise
    assert parallel.decompress_chunk(c2, mesh) == noise


def test_sharded_byte_api_per_codec(rng, mesh):
    """Sharded byte API across every device codec (and the host-only
    codecs falling back correctly): LZ4/LZ4HC compress+decode on the
    mesh, snappy decodes host-written chunks on the mesh, zlib/zstd
    route to the host engine without corrupting the wire format."""
    import cblosc_tpu as b
    from cblosc_tpu.format import constants as C

    data = make_buffer(rng, 200_000, 4, "lowentropy")
    for code, name in [(C.LZ4, "lz4"), (C.LZ4HC, "lz4hc")]:
        chunk = parallel.compress_chunk(5, 1, 4, data, mesh, code)
        assert chunk and b.decompress_ctx(chunk) == data
        assert parallel.decompress_chunk(chunk, mesh) == data
    # snappy: host-encoded chunk through the sharded decoder
    sn = b.compress_ctx(5, 1, 4, data, compressor="snappy",
                        backend="numpy")
    assert parallel.decompress_chunk(sn, mesh) == data
    # host-only codecs must round-trip via the engine fallback with the
    # right wire format (a device LZ4 stream mislabeled zlib would not)
    for name in ["zlib", "zstd"]:
        code = b.compname_to_compcode(name)
        chunk = parallel.compress_chunk(5, 1, 4, data, mesh, code)
        assert chunk
        assert b.decompress_ctx(chunk, backend="numpy") == data
        assert parallel.decompress_chunk(chunk, mesh) == data


@pytest.mark.skipif(os.environ.get("CBLOSC_TPU_SOAK") is None,
                    reason="multi-process dryrun is slow; set "
                           "CBLOSC_TPU_SOAK=1 (CI soak leg) to run")
def test_dryrun_multihost():
    """Two localhost jax.distributed processes form one global mesh and
    run the sharded roundtrip step (SURVEY section 2.4 multi-host init;
    committed passing log: docs/logs/dryrun_multihost_r3.log)."""
    import __graft_entry__ as g

    g.dryrun_multihost(2, 4)
