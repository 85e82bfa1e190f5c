"""Zstd codec via the `zstandard` binding (native libzstd underneath).

Level mapping matches the reference wrapper (blosc/blosc.c:498-511):
clevel 1-8 -> zstd level 2*clevel-1, clevel 9 -> ZSTD maximum level.
Gated: when the binding is unavailable the codec reports itself absent,
mirroring the reference's compile-time HAVE_ZSTD gating.
"""

from __future__ import annotations

try:
    import zstandard as _zstd

    AVAILABLE = True
    LIBRARY_VERSION = _zstd.ZSTD_VERSION  # (major, minor, release)
except Exception:  # pragma: no cover - environment without zstandard
    _zstd = None
    AVAILABLE = False
    LIBRARY_VERSION = (0, 0, 0)


def _map_level(clevel: int) -> int:
    if clevel < 9:
        return clevel * 2 - 1
    return _zstd.MAX_COMPRESSION_LEVEL


def compress(src, maxout: int, clevel: int) -> bytes:
    if not AVAILABLE:
        raise RuntimeError("zstd support not available")
    cctx = _zstd.ZstdCompressor(level=_map_level(clevel), write_checksum=False,
                                write_content_size=True)
    out = cctx.compress(bytes(src))
    if len(out) > maxout:
        return b""
    return out


def decompress(src, maxout: int) -> bytes:
    if not AVAILABLE:
        raise RuntimeError("zstd support not available")
    dctx = _zstd.ZstdDecompressor()
    return dctx.decompress(bytes(src), max_output_size=maxout)
