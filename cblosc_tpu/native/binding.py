"""ctypes binding to the native C++ host engine.

Builds the shared library on first use (cached under native/build/) and
exposes the chunk-level entry points plus raw kernels for the
cross-validation tests. Falls back gracefully (callers get None and use
the numpy engine) when a toolchain is unavailable or the codec is not
handled natively.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..format import constants as C

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_BUILD = os.path.join(_HERE, "build")
_LIB = os.path.join(_BUILD, "libcblosc_tpu.so")

_lock = threading.RLock()  # the reference's global_comp_mutex analog
_lib = None
_build_failed = False

_SOURCES = ["filters.cc", "blosclz.cc", "lz4.cc", "codecs_ext.cc",
            "engine.cc"]


def _newer_than_lib(path: str) -> bool:
    try:
        return os.path.getmtime(path) > os.path.getmtime(_LIB)
    except OSError:
        return True


def _build() -> bool:
    os.makedirs(_BUILD, exist_ok=True)
    srcs = [os.path.join(_SRC, s) for s in _SOURCES]
    hdr = os.path.join(_SRC, "common.h")
    if os.path.exists(_LIB) and not any(_newer_than_lib(p) for p in srcs + [hdr]):
        return True
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
        "-pthread", "-Wall", "-o", _LIB, *srcs,
    ]
    # zlib: link the system library (the same one CPython's zlib module
    # uses, so chunk bytes match the numpy engine); zstd resolves at
    # runtime via dlopen (see codecs_ext.cc), needing only -ldl.
    if os.path.exists("/usr/include/zlib.h"):
        cmd += ["-DCBT_HAVE_ZLIB", "-lz"]
    if os.name == "posix":
        cmd += ["-DCBT_HAVE_DLOPEN", "-ldl"]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if res.returncode != 0:
        import sys

        print("cblosc_tpu native build failed:\n" + res.stderr, file=sys.stderr)
        return False
    return True


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if os.environ.get("CBLOSC_TPU_NO_NATIVE"):
            _build_failed = True
            return None
        if not _build():
            _build_failed = True
            return None
        # Point the engine's dlopen'd zstd at the exact library the numpy
        # engine uses (ops/codecs/zstd_._lib_path exports its choice via
        # CBLOSC_TPU_ZSTD_LIB) so both engines emit identical bytes.
        if "CBLOSC_TPU_ZSTD_LIB" not in os.environ:
            try:
                from ..ops.codecs import zstd_ as _zstd_oracle

                _zstd_oracle._lib_path()
            except Exception:
                pass
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64 = ctypes.c_int64
        i32 = ctypes.c_int

        lib.cbt_compress_chunk.restype = i64
        lib.cbt_compress_chunk.argtypes = [
            i32, i32, i32, u8p, i64, u8p, i64, i32, i64, i32, i32,
        ]
        lib.cbt_decompress_chunk.restype = i64
        lib.cbt_decompress_chunk.argtypes = [u8p, i64, u8p, i64, i32]
        lib.cbt_getitem.restype = i64
        lib.cbt_getitem.argtypes = [u8p, i64, i64, i64, u8p, i64]
        lib.cbt_free_resources.restype = None
        lib.cbt_free_resources.argtypes = []
        for name in ("cbt_shuffle", "cbt_unshuffle"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [i32, i64, u8p, u8p]
        for name in ("cbt_bitshuffle", "cbt_bitunshuffle"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [i32, i64, u8p, u8p, u8p]
        lib.cbt_blosclz_compress.restype = i32
        lib.cbt_blosclz_compress.argtypes = [i32, u8p, i32, u8p, i32, i32]
        lib.cbt_blosclz_decompress.restype = i32
        lib.cbt_blosclz_decompress.argtypes = [u8p, i32, u8p, i32]
        lib.cbt_lz4_compress.restype = i32
        lib.cbt_lz4_compress.argtypes = [u8p, i32, u8p, i32, i32]
        lib.cbt_lz4hc_compress.restype = i32
        lib.cbt_lz4hc_compress.argtypes = [u8p, i32, u8p, i32, i32]
        lib.cbt_lz4_decompress.restype = i32
        lib.cbt_lz4_decompress.argtypes = [u8p, i32, u8p, i32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


_NATIVE_CODECS = {C.BLOSCLZ, C.LZ4, C.LZ4HC, C.SNAPPY, C.ZLIB, C.ZSTD}


def _u8(buf) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.uint8)


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def compress_chunk(ctx, data: bytes) -> bytes | None:
    """Returns the chunk, b"" (incompressible), or None to fall back."""
    lib = _load()
    if lib is None or ctx.compcode not in _NATIVE_CODECS:
        return None
    src = _u8(data)
    dest = np.empty(ctx.destsize, dtype=np.uint8)
    with _lock:
        n = lib.cbt_compress_chunk(
            ctx.clevel, ctx.doshuffle, ctx.typesize, _ptr(src), len(data),
            _ptr(dest), ctx.destsize, ctx.compcode,
            ctx.blocksize, int(ctx.dont_split), ctx.nthreads,
        )
    if n < 0:
        return None  # fall back to the oracle engine
    if n == 0:
        return b""
    return dest[:n].tobytes()


def decompress_chunk(chunk: bytes, destsize: int | None, nthreads: int) -> bytes | None:
    lib = _load()
    if lib is None or len(chunk) < 16:
        return None
    from ..format.header import ChunkHeader, validate_header

    hdr = ChunkHeader.decode(chunk)
    if destsize is None:
        destsize = hdr.nbytes
    validate_header(hdr, destsize)  # python-side validation for rich errors
    if hdr.nbytes == 0:
        return b""
    if not hdr.memcpyed and hdr.compcode not in _NATIVE_CODECS:
        return None
    src = _u8(chunk)
    dest = np.empty(hdr.nbytes, dtype=np.uint8)
    with _lock:
        n = lib.cbt_decompress_chunk(_ptr(src), len(chunk), _ptr(dest),
                                     hdr.nbytes, nthreads)
    if n < 0:
        if n == -2:
            return None  # codec not handled natively
        from ..format.header import FormatError

        raise FormatError(f"native decompression failed (code {n})")
    return dest[:n].tobytes()


def getitem(chunk: bytes, start: int, nitems: int) -> bytes | None:
    """Partial decompression (blosc_getitem, blosc.c:1574-1703) in the
    C++ engine. Returns the slice bytes or None to fall back."""
    lib = _load()
    if lib is None or len(chunk) < 16:
        return None
    from ..format.header import ChunkHeader, FormatError

    hdr = ChunkHeader.decode(chunk)
    if not hdr.memcpyed and hdr.compcode not in _NATIVE_CODECS:
        return None
    ts = hdr.typesize if hdr.typesize else 1
    stop = start + nitems
    if start < 0 or nitems < 0 or stop * ts > hdr.nbytes:
        raise IndexError("getitem range out of bounds")
    src = _u8(chunk)
    dest = np.empty(max(nitems * ts, 1), dtype=np.uint8)
    with _lock:
        n = lib.cbt_getitem(_ptr(src), len(chunk), start, nitems,
                            _ptr(dest), nitems * ts)
    if n < 0:
        if n == -2:
            return None  # codec not handled natively
        raise FormatError(f"native getitem failed (code {n})")
    return dest[:n].tobytes()


def free_resources() -> None:
    with _lock:
        if _lib is not None:
            _lib.cbt_free_resources()


# --- raw kernel access (tests / benchmarks) --------------------------------

def shuffle(typesize: int, data) -> np.ndarray:
    lib = _load()
    src = _u8(data)
    out = np.empty(src.size, dtype=np.uint8)
    lib.cbt_shuffle(typesize, src.size, _ptr(src), _ptr(out))
    return out


def unshuffle(typesize: int, data) -> np.ndarray:
    lib = _load()
    src = _u8(data)
    out = np.empty(src.size, dtype=np.uint8)
    lib.cbt_unshuffle(typesize, src.size, _ptr(src), _ptr(out))
    return out


def bitshuffle(typesize: int, data) -> np.ndarray:
    lib = _load()
    src = _u8(data)
    out = np.empty(src.size, dtype=np.uint8)
    tmp = np.empty(src.size, dtype=np.uint8)
    lib.cbt_bitshuffle(typesize, src.size, _ptr(src), _ptr(out), _ptr(tmp))
    return out


def bitunshuffle(typesize: int, data) -> np.ndarray:
    lib = _load()
    src = _u8(data)
    out = np.empty(src.size, dtype=np.uint8)
    tmp = np.empty(src.size, dtype=np.uint8)
    lib.cbt_bitunshuffle(typesize, src.size, _ptr(src), _ptr(out), _ptr(tmp))
    return out


def blosclz_compress(clevel: int, data, maxout: int, split: bool) -> bytes:
    lib = _load()
    src = _u8(data)
    out = np.empty(max(maxout, 1), dtype=np.uint8)
    n = lib.cbt_blosclz_compress(clevel, _ptr(src), src.size, _ptr(out),
                                 maxout, int(split))
    return out[:n].tobytes() if n > 0 else b""


def blosclz_decompress(data, maxout: int) -> bytes:
    lib = _load()
    src = _u8(data)
    out = np.empty(max(maxout, 1), dtype=np.uint8)
    n = lib.cbt_blosclz_decompress(_ptr(src), src.size, _ptr(out), maxout)
    if n < 0:
        raise ValueError("malformed blosclz stream")
    return out[:n].tobytes()


def lz4_compress(data, maxout: int, accel: int = 1) -> bytes:
    lib = _load()
    src = _u8(data)
    out = np.empty(max(maxout, 1), dtype=np.uint8)
    n = lib.cbt_lz4_compress(_ptr(src), src.size, _ptr(out), maxout, accel)
    return out[:n].tobytes() if n > 0 else b""


def lz4hc_compress(data, maxout: int, clevel: int = 9) -> bytes:
    lib = _load()
    src = _u8(data)
    out = np.empty(max(maxout, 1), dtype=np.uint8)
    n = lib.cbt_lz4hc_compress(_ptr(src), src.size, _ptr(out), maxout, clevel)
    return out[:n].tobytes() if n > 0 else b""


def lz4_decompress(data, maxout: int) -> bytes:
    lib = _load()
    src = _u8(data)
    out = np.empty(max(maxout, 1), dtype=np.uint8)
    n = lib.cbt_lz4_decompress(_ptr(src), src.size, _ptr(out), maxout)
    if n < 0:
        raise ValueError("malformed lz4 stream")
    return out[:n].tobytes()
