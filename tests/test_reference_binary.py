"""Cross-validation against the ACTUAL reference C library.

Builds c-blosc out-of-tree (cached under /tmp/refbuild) and drives it
through ctypes: every chunk our engines write must decompress bit-exactly
in the reference binary, and chunks the reference writes must decompress
in every engine of ours. This is the strongest possible format-parity
oracle — stronger than the static golden files because it sweeps codecs,
clevels, shuffle modes and typesizes live.

Skipped when the reference tree or a toolchain is unavailable.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

import cblosc_tpu as b
from tests.conftest import REFERENCE, make_buffer, reference_available

BUILD = "/tmp/refbuild"
LIB = os.path.join(BUILD, "blosc", "libblosc.so")


def _build_reference():
    if os.path.exists(LIB):
        return True
    if not reference_available() or shutil.which("cmake") is None:
        return False
    try:
        subprocess.run(
            ["cmake", "-S", REFERENCE, "-B", BUILD,
             "-DCMAKE_BUILD_TYPE=Release", "-DBUILD_TESTS=OFF",
             "-DBUILD_BENCHMARKS=OFF", "-DBUILD_FUZZERS=OFF"],
            check=True, capture_output=True, timeout=300)
        subprocess.run(["cmake", "--build", BUILD, "-j", "4"],
                       check=True, capture_output=True, timeout=900)
    except Exception:
        return False
    return os.path.exists(LIB)


@pytest.fixture(scope="module")
def ref():
    if not _build_reference():
        pytest.skip("reference library unavailable")
    lib = ctypes.CDLL(LIB)
    lib.blosc_init()
    lib.blosc_compress.restype = ctypes.c_int
    lib.blosc_decompress.restype = ctypes.c_int
    lib.blosc_set_compressor.restype = ctypes.c_int
    yield lib
    lib.blosc_destroy()


def _ref_decompress(lib, chunk: bytes, nbytes: int) -> bytes:
    src = ctypes.create_string_buffer(chunk, len(chunk))
    dst = ctypes.create_string_buffer(nbytes or 1)
    n = lib.blosc_decompress(src, dst, ctypes.c_size_t(nbytes))
    assert n == nbytes, f"reference decompress returned {n}"
    return dst.raw[:nbytes]


def _ref_compress(lib, codec: bytes, clevel: int, shuffle: int,
                  typesize: int, data: bytes) -> bytes:
    assert lib.blosc_set_compressor(codec) >= 0
    src = ctypes.create_string_buffer(data, len(data))
    dst = ctypes.create_string_buffer(len(data) + 16)
    n = lib.blosc_compress(clevel, shuffle, ctypes.c_size_t(typesize),
                           ctypes.c_size_t(len(data)), src, dst,
                           ctypes.c_size_t(len(data) + 16))
    assert n > 0, "reference compress failed"
    return dst.raw[:n]


CONFIGS = [
    ("blosclz", 5, 1, 4), ("blosclz", 9, 2, 8), ("blosclz", 1, 0, 1),
    ("lz4", 5, 1, 4), ("lz4hc", 9, 1, 8), ("zlib", 5, 1, 4),
    ("zstd", 5, 1, 4),
]


@pytest.mark.parametrize("codec,clevel,shuffle,typesize", CONFIGS)
def test_reference_reads_our_chunks(ref, rng, codec, clevel, shuffle,
                                    typesize):
    if codec not in b.list_compressors():
        pytest.skip(codec)
    for kind in ("ramp", "lowentropy", "zeros"):
        data = make_buffer(rng, 65536 + 24, typesize, kind)
        for backend in ("numpy", "native", "tpu"):
            chunk = b.compress_ctx(clevel, shuffle, typesize, data,
                                   compressor=codec, backend=backend)
            assert chunk
            assert _ref_decompress(ref, chunk, len(data)) == data, (
                codec, kind, backend)


@pytest.mark.parametrize("codec,clevel,shuffle,typesize", CONFIGS)
def test_we_read_reference_chunks(ref, rng, codec, clevel, shuffle,
                                  typesize):
    if codec not in b.list_compressors():
        pytest.skip(codec)
    for kind in ("ramp", "lowentropy"):
        data = make_buffer(rng, 65536 + 24, typesize, kind)
        chunk = _ref_compress(ref, codec.encode(), clevel, shuffle,
                              typesize, data)
        for backend in ("numpy", "native", "tpu"):
            assert b.decompress_ctx(chunk, backend=backend) == data, (
                codec, kind, backend)


def test_reference_getitem_parity(ref, rng):
    data = make_buffer(rng, 100_000, 4, "ramp")
    chunk = _ref_compress(ref, b"blosclz", 5, 1, 4, data)
    assert b.getitem(chunk, 1000, 50) == data[4000:4200]


def test_reference_reads_far_distance_chunks(ref, rng):
    """clevel>=5 device chunks carry mined far-distance (> 8191) tokens
    on shuffled-counter byte planes; the reference binary must decode
    them bit-exactly (wire grammar blosclz.c:690-744)."""
    data = make_buffer(rng, 1 << 20, 8, "ramp")
    chunk = b.compress_ctx(5, 1, 8, data, backend="tpu")
    assert chunk and len(chunk) < len(data) // 64
    assert _ref_decompress(ref, chunk, len(data)) == data


def test_live_size_parity_per_clevel(ref):
    """Match-or-beat gate against the LIVE 1.21.7 build (same blocksize
    heuristic, so no version-geometry slack needed): for every codec the
    reference builds, our host encoder's chunk must not exceed the
    reference's on the compat workload at clevels 1/5/9. zstd gets 2%
    for libzstd version drift (vendored 1.5.6 vs the system binding).
    Ref: compat/filegen.c:66-76, VERDICT r2 item 6."""
    data = np.arange(1000 * 1000, dtype=np.int32).tobytes()
    margins = {"zstd": 1.02}
    for codec in ["blosclz", "lz4", "lz4hc", "zlib", "zstd"]:
        if codec not in b.list_compressors():
            continue
        for clevel in (1, 5, 9):
            theirs = len(_ref_compress(ref, codec.encode(), clevel, 1, 4,
                                       data))
            ours = len(b.compress_ctx(clevel, 1, 4, data, compressor=codec))
            assert ours <= theirs * margins.get(codec, 1.0), (
                codec, clevel, ours, theirs)
