"""Device snappy decoder (tpu/codec_snappy.py).

The walk must parse any conforming raw-snappy stream into records that
replay to the oracle's output; placement reuses the shared machines
(expand kernel for mixed distances — interpret mode on the CPU leg —
and the XLA sort machine for uniform-distance rows). The reference
treats snappy as an optional external codec (blosc/blosc.c:443-467);
device decode coverage here exceeds it.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cblosc_tpu as b
from cblosc_tpu.ops.codecs import snappy as snappy_host
from cblosc_tpu.tpu import codec_snappy, expand, structured
from tests.conftest import make_buffer


def _pack(rows):
    W = max(len(r) for r in rows) + 8
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    buf = np.zeros((len(rows), Wpad), np.uint8)
    cs = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        buf[i, : len(r)] = np.frombuffer(r, np.uint8)
        cs[i] = len(r)
    return buf, cs


def _oracle_streams(rng, n):
    """Oracle-encoded snappy streams over the standard data kinds."""
    arrs = [
        np.zeros(n, np.uint8),
        np.frombuffer(make_buffer(rng, n, 4, "ramp"), np.uint8),
        np.repeat(rng.integers(0, 5, max(n // 32, 1)).astype(np.uint8),
                  32)[:n],
        np.tile(np.arange(17, dtype=np.uint8), n // 17 + 1)[:n],
        (rng.integers(0, 4, n, dtype=np.uint8) * 3),
    ]
    rows, keep = [], []
    for a in arrs:
        enc = snappy_host.compress(a.tobytes(), 2 * n + 64)
        if enc:
            rows.append(enc)
            keep.append(a)
    return rows, keep


def test_snappy_walk_records_replay(rng):
    """Every row the walk accepts must replay record-by-record to the
    oracle's decode (grammar fidelity without placement)."""
    n = 8192
    rows, arrs = _oracle_streams(rng, n)
    buf, cs = _pack(rows)
    recs, dist, uni, ok = jax.jit(
        codec_snappy._walk_batch, static_argnums=(2, 3)
    )(jnp.asarray(buf), jnp.asarray(cs), n, codec_snappy.max_records(n))
    recs = np.asarray(structured.stack_records(recs))
    ok = np.asarray(ok)
    assert ok.all()
    for i, a in enumerate(arrs):
        out = np.zeros(n, np.uint8)
        comp = buf[i]
        op = 0
        for kind, src, dst, ln in recs[i]:
            if kind < 0:
                continue
            assert dst == op, "records must be in output order"
            if kind == 0:
                out[dst:dst + ln] = comp[src:src + ln]
            else:
                for j in range(ln):          # overlap-correct LZ copy
                    out[dst + j] = out[dst + j - src]
            op = dst + ln
        assert op == n
        assert np.array_equal(out, a)


def test_snappy_expand_interpret(rng):
    """walk -> compact -> expand (interpret mode) must be bit-exact,
    including mixed-distance hash-table streams."""
    n = 2048
    rows, arrs = _oracle_streams(rng, n)
    buf, cs = _pack(rows)
    recs, dist, uni, ok = jax.jit(
        codec_snappy._walk_batch, static_argnums=(2, 3)
    )(jnp.asarray(buf), jnp.asarray(cs), n, codec_snappy.max_records(n))
    assert np.asarray(ok).all()
    assert not np.asarray(uni).all()      # at least one mixed-distance row
    out = np.asarray(expand.expand(
        jnp.asarray(buf), expand.compact_records(recs), n, interpret=True))
    assert np.array_equal(out, np.stack(arrs))


def test_snappy_decode_errs_are_honest(rng):
    """decode() on the CPU leg: uniform-distance rows place through the
    sort machine; mixed-distance rows report err (host fallback) and
    must never return wrong bytes silently."""
    n = 8192
    rows, arrs = _oracle_streams(rng, n)
    buf, cs = _pack(rows)
    out, produced, err = codec_snappy.decode(
        jnp.asarray(buf), jnp.asarray(cs), n)
    out, err = np.asarray(out), np.asarray(err)
    handled = ~err
    assert handled.any()
    for i, a in enumerate(arrs):
        if handled[i]:
            assert np.array_equal(out[i], a)


def test_snappy_decode_rejects_corrupt(rng):
    """Bit-flipped streams must flag err, not crash or mis-place."""
    n = 4096
    a = np.repeat(rng.integers(0, 7, n // 32).astype(np.uint8), 32)
    enc = bytearray(snappy_host.compress(a.tobytes(), 2 * n + 64))
    bad = []
    for pos in (0, 1, 5, len(enc) // 2, len(enc) - 1):
        e = bytearray(enc)
        e[pos] ^= 0x80
        bad.append(bytes(e))
    bad.append(bytes(enc[: len(enc) // 2]))          # truncated
    buf, cs = _pack(bad)
    out, produced, err = codec_snappy.decode(
        jnp.asarray(buf), jnp.asarray(cs), n)
    out, err = np.asarray(out), np.asarray(err)
    want = np.asarray(a)
    for i, e in enumerate(bad):
        if not err[i]:
            # a surviving flip must still decode to SOMETHING the oracle
            # agrees with (e.g. a flipped literal byte value)
            try:
                ora = np.frombuffer(
                    snappy_host.decompress(e, n), np.uint8)
            except ValueError:
                pytest.fail("device accepted a stream the oracle rejects")
            assert np.array_equal(out[i], ora)


def test_snappy_chunk_device_decode_path(rng):
    """Host-compressed snappy chunks through the tpu backend byte API:
    the result must equal the source whether the device handled it or
    the router fell back."""
    for kind in ["zeros", "lowentropy", "ramp"]:
        data = make_buffer(rng, 200_000 + 36, 4, kind)
        chunk = b.compress_ctx(5, 1, 4, data, compressor="snappy",
                               backend="numpy")
        assert chunk
        assert b.decompress_ctx(chunk, backend="tpu") == data
        got = b.getitem(chunk, 100, 2000, backend="tpu")
        assert got == data[400:400 + 8000]


def test_snappy_expanded_split_not_mistaken_for_raw(rng):
    """A compressed snappy split may legally EXCEED neblock (snappy's
    maxout is 32+n+n/6, blosc.c:640-645) while blosclz/LZ4 splits never
    can. The device pipeline must decode such splits, not misclassify
    them as stored-raw and return compressed bytes as plaintext
    (regression: silent corruption with err=False)."""
    import jax.numpy as jnp

    from cblosc_tpu import parallel
    from cblosc_tpu.format.header import ChunkHeader
    from cblosc_tpu.tpu import host_api

    # low byte plane random (expands under snappy), upper planes zero:
    # the block compresses overall, split 0 stays compressed > neblock
    vals = rng.integers(0, 256, 65536, dtype=np.uint8).astype(np.uint32)
    data = vals.astype("<u4").tobytes()
    chunk = b.compress_ctx(5, 1, 4, data, compressor="snappy",
                           backend="numpy")
    assert chunk
    hdr = ChunkHeader.decode(chunk)
    neblock = hdr.blocksize // 4
    from cblosc_tpu.format.header import read_bstarts

    bstarts = read_bstarts(chunk, hdr.nblocks)
    offs, csizes = host_api._split_table(
        np.frombuffer(chunk, np.uint8), bstarts[:1], 4)
    assert (csizes > neblock).any(), "fixture must have an expanded split"

    got = host_api.decompress_chunk(chunk)
    if got is not None:                      # device handled it
        assert got == data
    assert b.decompress_ctx(chunk, backend="tpu") == data
    got_item = b.getitem(chunk, 17, 5000, backend="tpu")
    assert got_item == data[17 * 4:(17 + 5000) * 4]

    if len(jax.devices()) >= 2:
        mesh = parallel.make_mesh()
        assert parallel.decompress_chunk(chunk, mesh) == data
