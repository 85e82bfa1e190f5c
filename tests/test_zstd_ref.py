"""zstd reference decoder (ops/codecs/zstd_ref.py) vs libzstd.

The pure-Python frame decoder is the oracle for the device zstd decoder;
this pins it against libzstd across compression levels (which exercise
different block/literals/sequence encodings: level 1 favors raw+RLE
literals, high levels FSE-heavy streams) and data shapes (Huffman-heavy
low-entropy, periodic, text, incompressible). Wire format: RFC 8878.
"""

import ctypes

import numpy as np
import pytest

from cblosc_tpu.ops.codecs import zstd_ as zw
from cblosc_tpu.ops.codecs import zstd_ref

pytestmark = pytest.mark.skipif(not zw.AVAILABLE, reason="libzstd absent")


def _frame(data: bytes, level: int) -> bytes:
    buf = ctypes.create_string_buffer(len(data) * 2 + 512)
    code = zw._lib.ZSTD_compress(
        buf, ctypes.c_size_t(len(buf)), data, ctypes.c_size_t(len(data)),
        ctypes.c_int(level))
    assert not zw._lib.ZSTD_isError(ctypes.c_size_t(code))
    return buf.raw[:code]


def _cases(rng, n: int):
    yield "zeros", bytes(n)
    yield "rand", rng.integers(0, 256, n, dtype=np.uint8).tobytes()
    yield "lowent", (rng.integers(0, 6, n, dtype=np.uint8) * 16).tobytes()
    yield "ramp", (np.arange(n) % 251).astype(np.uint8).tobytes()
    t = np.tile(rng.integers(0, 256, 64, dtype=np.uint8), n // 64 + 2)[:n]
    yield "period64", t.tobytes()
    txt = (b"the quick brown fox jumps over the lazy dog. " * (n // 46 + 2))
    yield "text", txt[:n]


@pytest.mark.parametrize("level", [1, 3, 9, 19, 22])
@pytest.mark.parametrize("n", [13, 2048, 131072])
def test_roundtrip_matches_libzstd(rng, level, n):
    for name, data in _cases(rng, n):
        frame = _frame(data, level)
        out = zstd_ref.decompress(frame, n)
        assert out == data, (name, level, n)


def test_rejects_corruption(rng):
    data = (rng.integers(0, 6, 4096, dtype=np.uint8) * 16).tobytes()
    frame = bytearray(_frame(data, 3))
    frame[0] ^= 1                       # magic
    with pytest.raises(ValueError):
        zstd_ref.decompress(bytes(frame), 4096)


def test_blosc_mapped_levels(rng):
    """The exact levels blosc maps clevels to (zstd_.py _map_level)."""
    for cl in range(1, 10):
        lvl = zw._map_level(cl)
        data = (rng.integers(0, 11, 65536, dtype=np.uint8) * 7).tobytes()
        frame = _frame(data, lvl)
        assert zstd_ref.decompress(frame, 65536) == data
