"""Structured device decoder vs the generic loop decoder and the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.ops.codecs import blosclz as lzhost
from cblosc_tpu.tpu import codec, structured


def _encode_batch(S):
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    return slots, csizes


def _streams(rng, n):
    runs = np.repeat(
        rng.integers(0, 5, 40).astype(np.uint8), rng.integers(1, n // 4, 40)
    )[:n]
    return np.stack([
        np.pad(runs, (0, n - len(runs))),
        np.zeros(n, np.uint8),
        (np.arange(n) // 256).astype(np.uint8),
        np.tile(np.arange(128, dtype=np.uint8), n // 128),   # d=128 ramp
        np.tile(np.array([7, 9], np.uint8), n // 2),          # d=2
        rng.integers(0, 2, n, dtype=np.uint8) * 255,          # coin runs
    ]), n


@pytest.mark.parametrize("n", [1024, 4096, 16384])
def test_structured_matches_loop_on_our_streams(rng, n):
    S, n = _streams(rng, n)
    slots, csizes = _encode_batch(S)
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    assert np.array_equal(np.asarray(out), S)


def test_structured_falls_back_on_host_streams(rng):
    """Host-encoder streams use hash-table matches with mixed distances;
    the structured walk must flag them and the loop decoder must still
    produce exact output."""
    n = 4096
    S, _ = _streams(rng, n)
    rows = []
    for i in range(S.shape[0]):
        enc = lzhost.compress(9, S[i], n, True)
        if not enc:
            enc = b""
        rows.append(np.frombuffer(enc, np.uint8))
    W = max(len(r) for r in rows) + 300
    buf = np.zeros((len(rows), W), np.uint8)
    cs = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        buf[i, : len(r)] = r
        cs[i] = len(r)
    out, produced, err = structured.decode(
        jnp.asarray(buf), jnp.asarray(cs), n
    )
    out = np.asarray(out)
    for i, r in enumerate(rows):
        if len(r) == 0:
            continue
        assert not np.asarray(err)[i]
        assert np.array_equal(out[i], S[i]), f"row {i}"


def test_structured_bad_stream_errors():
    bad = np.zeros((1, 400), np.uint8)
    bad[0, 0] = 32 | 0
    bad[0, 1] = 7
    bad[0, 2] = (5 << 5) | 31     # absurd distance
    bad[0, 3] = 200
    out, produced, err = structured.decode(
        jnp.asarray(bad), jnp.asarray([4]), 64
    )
    assert bool(np.asarray(err)[0])


def test_structured_large_blocks_fall_back(rng):
    n = structured.MAX_OUT * 2   # beyond MAX_OUT: routes through the loop
    S = np.zeros((2, n), np.uint8)
    slots, csizes = _encode_batch(S)
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), S)


# ---------------------------------------------------------------------------
# Hand-built conforming streams: arbitrary distances and big splits
# ---------------------------------------------------------------------------

def _lz_stream(pieces):
    """Serialize (\"lit\", bytes) / (\"match\", mlen, dist) pieces into a
    conforming blosclz token stream (wire grammar blosc/blosclz.c:679-789)."""
    out = bytearray()
    for kind, *args in pieces:
        if kind == "lit":
            data = args[0]
            i = 0
            while i < len(data):
                c = min(32, len(data) - i)
                out.append(c - 1)
                out += bytes(data[i:i + c])
                i += c
        else:
            mlen, d = args
            v = mlen - 3
            assert v >= 0
            if d <= 8191:
                dm1 = d - 1
                dhi, dlo, far = dm1 >> 8, dm1 & 255, None
            else:
                fd = d - 8192
                dhi, dlo, far = 31, 255, (fd >> 8, fd & 255)
            if v < 6:
                out.append(((v + 1) << 5) | dhi)
            else:
                out.append((7 << 5) | dhi)
                rem = v - 6
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
            out.append(dlo)
            if far is not None:
                out += bytes(far)
    return bytes(out)


def _decode_rows(rows, n):
    W = max(len(r) for r in rows) + 80
    buf = np.zeros((len(rows), W), np.uint8)
    cs = np.zeros(len(rows), np.int32)
    for i, r in enumerate(rows):
        buf[i, :len(r)] = np.frombuffer(r, np.uint8)
        cs[i] = len(r)
    return structured.decode(jnp.asarray(buf), jnp.asarray(cs), n)


@pytest.mark.parametrize("d", [5, 7, 100, 1000, 8191])
def test_structured_arbitrary_uniform_distance(rng, d):
    """The residue-keyed fill handles ANY uniform distance < 8192, not
    just the encoder's candidate set."""
    n = 16384
    pat = rng.integers(0, 256, d, dtype=np.uint8)
    stream = _lz_stream([
        ("lit", pat.tobytes()),
        ("match", n - d - 8, d),
        ("lit", bytes(rng.integers(0, 256, 8, dtype=np.uint8))),
    ])
    want = np.frombuffer(lzhost.decompress(stream, n), np.uint8)
    out, produced, err = _decode_rows([stream], n)
    assert not bool(np.asarray(err)[0])
    assert int(np.asarray(produced)[0]) == n
    assert np.array_equal(np.asarray(out)[0], want)
    # and the structured machine itself handled it (no loop fallback)
    W = len(stream) + 80
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    buf = np.zeros((1, Wpad), np.uint8)
    buf[0, :len(stream)] = np.frombuffer(stream, np.uint8)
    recs, dist, uni, okf = structured._walk_batch(
        jnp.asarray(buf), jnp.asarray([len(stream)]), n,
        structured.max_records(n))
    assert bool(np.asarray(okf)[0]) and int(np.asarray(dist)[0]) == d
    assert bool(np.asarray(uni)[0])


def test_structured_far_distance_falls_back(rng):
    """d >= 8192 exceeds the residue key budget: the loop decoder must
    take over and still produce exact bytes."""
    n = 16384
    d = 9000
    pat = rng.integers(0, 256, d, dtype=np.uint8)
    stream = _lz_stream([
        ("lit", pat.tobytes()),
        ("match", n - d - 8, d),
        ("lit", bytes(rng.integers(0, 256, 8, dtype=np.uint8))),
    ])
    want = np.frombuffer(lzhost.decompress(stream, n), np.uint8)
    out, produced, err = _decode_rows([stream], n)
    assert not bool(np.asarray(err)[0])
    assert np.array_equal(np.asarray(out)[0], want)


def test_structured_256k_split(rng):
    """Reference-geometry 256 KB splits (blocksize table blosc.c:996-1047)
    decode on the structured path."""
    n = structured.MAX_OUT
    S = np.stack([
        (np.arange(n) // 1024).astype(np.uint8),      # long runs
        np.tile(np.arange(256, dtype=np.uint8), n // 256),   # d=256 ramp
    ])
    slots, csizes = _encode_batch(S)
    assert int(np.asarray(csizes).max()) < n
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert (np.asarray(produced) == n).all()
    assert np.array_equal(np.asarray(out), S)


def test_splat_slot_margin_max_density(rng):
    """Max-token-density splat boundary: a conforming d=1 stream with
    ~510 records in a <= _PREFIX-byte stream (every slot up to the
    prefix//2 slice boundary in use, value switch near the tail so a
    dropped record would corrupt output). Pins that _splat_place's
    record-slot slice is lossless at the density limit."""
    import numpy as np

    from cblosc_tpu.ops.codecs import blosclz as lzhost

    # 1 literal + 495 short d=1 matches (len 8) + 28 long matches
    # (3-byte token, len 263): csize = 2 + 495*2 + 28*3 = 1076 -> use
    # fewer shorts to stay under _PREFIX=1024
    out = bytearray([7])
    s = bytearray([0x00, 7])                 # first token: 1 literal
    nshort, nlong = 464, 29
    for _ in range(nshort):
        s += bytes([0xC0, 0x00])             # len 8, d=1
        out += bytes([7]) * 8
    s += bytes([0x00, 9])                    # value switch: the tail
    out += bytes([9])                        # records must carry 9s
    for _ in range(nlong):
        s += bytes([0xE0, 0xFE, 0x00])       # ext 254 -> len 263, d=1
        out += bytes([9]) * 263
    s += bytes([0x00, 9])                    # streams end on a literal
    out += bytes([9])
    assert len(s) <= structured._PREFIX, len(s)
    n = len(out)
    assert structured.max_records(n) > 512   # geometry with a big budget
    # oracle agreement first
    assert lzhost.decompress(bytes(s), n) == bytes(out)

    W = max(-(-(len(s) + structured._MARGIN) // 128) * 128,
            structured._WINW)
    buf = np.zeros((8, W), np.uint8)
    cs = np.zeros(8, np.int32)
    buf[3, : len(s)] = np.frombuffer(bytes(s), np.uint8)
    cs[3] = len(s)
    got, produced, err = structured.decode(
        jnp.asarray(buf), jnp.asarray(cs), n)
    got, err = np.asarray(got), np.asarray(err)
    assert not err[3]
    assert bytes(got[3]) == bytes(out)


def test_pure_tile_eligibility_and_placement(rng):
    """The pure-tile fast path (out[x] = prefix[x mod d], one broadcast)
    must trigger exactly on [d-literal prefix][one match][tail] rows
    with pow2 d <= 256, and its output must be bit-exact."""
    n = 2048
    rows, want = [], []
    for d in (1, 2, 4, 8, 16, 32, 128, 256):
        pat = rng.integers(0, 256, d, dtype=np.uint8)
        rows.append(np.tile(pat, n // d + 1)[:n])
        want.append(True)
    rows.append(np.tile(np.array([3, 5, 8], np.uint8), n // 3 + 1)[:n])
    want.append(False)                       # d=3: not pow2
    S = np.stack(rows)
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    maxrec = structured.max_records(n)
    W = slots.shape[1]
    Wpad = -(-(W + structured._MARGIN) // 128) * 128
    recs, dist, uni, ok = structured._walk_batch(
        jnp.pad(slots, ((0, 0), (0, Wpad - W))), csizes, n, maxrec)
    elig = structured.pure_tile_eligible(
        recs, recs[0] >= 0, dist, uni, ok, csizes, n)
    elig_np = np.asarray(elig)
    for i, w in enumerate(want):
        if w:
            assert elig_np[i], (i, int(dist[i]))
    assert not elig_np[-1]
    out, produced, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out), S)


def test_pure_tile_tail_and_geometry_corners(rng):
    """Tail byte lands exactly; non-multiple-of-256 out_len skips the
    tile path but still decodes; a whole eligible group round-trips
    through the byte API."""
    import cblosc_tpu as b

    # tail byte differs from the pattern
    n = 4096
    pat = rng.integers(0, 256, 16, dtype=np.uint8)
    row = np.tile(pat, n // 16)
    row[-1] = (int(row[-1]) + 1) % 256
    S = np.stack([row])
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    out, _, err = structured.decode(slots, csizes, n)
    assert not np.asarray(err).any()
    assert np.array_equal(np.asarray(out)[0], row)

    # odd out_len: path statically disabled, decode still exact
    n2 = 1000
    S2 = np.stack([np.tile(pat, n2 // 16 + 1)[:n2]])
    sl2, cs2, _ = codec.encode(jnp.asarray(S2))
    out2, _, err2 = structured.decode(sl2, cs2, n2)
    assert not np.asarray(err2).any()
    assert np.array_equal(np.asarray(out2)[0], S2[0])

    # end-to-end: typed ramp data through the public API (pure planes)
    data = np.arange(1 << 16, dtype=np.uint32).tobytes()
    chunk = b.compress_ctx(1, 1, 4, data, backend="tpu")
    assert b.decompress_ctx(chunk, backend="tpu") == data
    assert b.decompress_ctx(chunk, backend="numpy") == data
