"""Public API — the complete surface of the reference C library
(blosc/blosc.h's 24 exported functions) in idiomatic Python.

Two layers, like the reference:
  * the stateless context API (`compress_ctx` / `decompress_ctx`,
    blosc.h:232-302) — pure functions, safe under any concurrency; this is
    the primitive everything else builds on (and the layer the TPU/jit
    paths wrap);
  * the convenience global API (`compress` / `decompress` / `set_*`,
    blosc.h:120-219) holding process-global configuration plus the
    BLOSC_* environment-variable overrides (read per call, exactly like
    blosc.c:1320-1408).

Byte-oriented entry points return `bytes`; `compress` returns b"" when the
data is incompressible and does not fit the destination budget (the
reference's return-0 contract, blosc.h:167-169).
"""

from __future__ import annotations

import os
import threading

import numpy as np

from .format import constants as C
from .format.header import (
    FormatError,
    cbuffer_complib,
    cbuffer_metainfo,
    cbuffer_sizes,
    cbuffer_validate,
    cbuffer_versions,
)
from .core import engine
from .models import registry

__all__ = [
    "init", "destroy", "free_resources",
    "compress", "compress_ctx", "decompress", "decompress_ctx", "getitem",
    "set_nthreads", "get_nthreads", "set_compressor", "get_compressor",
    "set_blocksize", "get_blocksize", "set_splitmode", "get_splitmode",
    "compcode_to_compname", "compname_to_compcode", "list_compressors",
    "get_version_string", "get_complib_info",
    "cbuffer_sizes", "cbuffer_metainfo", "cbuffer_versions",
    "cbuffer_complib", "cbuffer_validate",
    "FormatError",
]


class _GlobalState:
    """Process-global knobs (cf. globals at blosc.c:142-150)."""

    def __init__(self) -> None:
        self.lock = threading.RLock()
        self.initialized = False
        self.compressor = C.BLOSCLZ
        self.nthreads = 1
        self.force_blocksize = 0
        self.splitmode = C.FORWARD_COMPAT_SPLIT

    def reset(self) -> None:
        self.compressor = C.BLOSCLZ
        self.nthreads = 1
        self.force_blocksize = 0
        self.splitmode = C.FORWARD_COMPAT_SPLIT


_state = _GlobalState()

# Fork safety (cf. pthread_atfork handler, blosc.c:2210-2244): child
# processes re-initialize lazily. Python re-creates the module state lock
# via os.register_at_fork.
if hasattr(os, "register_at_fork"):
    os.register_at_fork(after_in_child=lambda: _state.__init__())


def init() -> None:
    """No-op beyond marking initialization; kept for API parity
    (blosc_init, blosc.c:2223-2244). All entry points auto-init."""
    _state.initialized = True


def destroy() -> None:
    """Release global resources and reset configuration
    (blosc_destroy, blosc.c:2246-2260)."""
    with _state.lock:
        _state.initialized = False
        _state.reset()


def free_resources() -> None:
    """Release the worker pool / cached executors
    (blosc_free_resources, blosc.c:2311-2316)."""
    from .core import backend

    backend.free_resources()


# --- configuration ----------------------------------------------------------

def set_nthreads(n: int) -> int:
    """Set worker parallelism; returns the previous value
    (blosc_set_nthreads, blosc.c:1958-1973)."""
    if n <= 0 or n > C.MAX_THREADS:
        raise ValueError(f"nthreads must be in 1..{C.MAX_THREADS}")
    with _state.lock:
        prev = _state.nthreads
        _state.nthreads = int(n)
    return prev


def get_nthreads() -> int:
    return _state.nthreads


def set_compressor(name: str) -> int:
    """Select the default codec by name; returns its code
    (blosc_set_compressor, blosc.c:2010-2020)."""
    codec = registry.get_by_name(name)
    with _state.lock:
        _state.compressor = codec.code
    return codec.code


def get_compressor() -> str:
    return C.COMPNAMES[_state.compressor]


def set_blocksize(blocksize: int) -> None:
    """Force a blocksize (0 = automatic heuristic)
    (blosc_set_blocksize, blosc.c:2191-2194)."""
    with _state.lock:
        _state.force_blocksize = int(blocksize)


def get_blocksize() -> int:
    return _state.force_blocksize


def set_splitmode(splitmode: int) -> None:
    """(blosc_set_splitmode, blosc.c:2197-2200)"""
    if splitmode not in (C.ALWAYS_SPLIT, C.NEVER_SPLIT, C.AUTO_SPLIT,
                         C.FORWARD_COMPAT_SPLIT):
        raise ValueError(f"unknown split mode {splitmode}")
    with _state.lock:
        _state.splitmode = splitmode


def get_splitmode() -> int:
    return _state.splitmode


# --- name/code conversions ----------------------------------------------------

def compcode_to_compname(compcode: int) -> str:
    name = C.COMPNAMES.get(compcode)
    if name is None:
        raise ValueError(f"unknown compressor code {compcode}")
    return name


def compname_to_compcode(compname: str) -> int:
    code = C.COMPCODES.get(compname)
    if code is None:
        return -1
    try:
        registry.get(code)
    except RuntimeError:
        return -1
    return code


def list_compressors() -> list[str]:
    return registry.list_compressors()


def get_version_string() -> str:
    return C.VERSION_STRING


def get_complib_info(compname: str) -> tuple[str, str]:
    return registry.complib_info(compname)


# --- env-var layer (blosc.h:175-219, blosc.c:1320-1408) -----------------------

def _env_overrides(clevel, doshuffle, typesize):
    v = os.environ.get("BLOSC_CLEVEL")
    if v is not None:
        try:
            iv = int(v)
            if iv >= 0:
                clevel = iv
        except ValueError:
            pass
    v = os.environ.get("BLOSC_SHUFFLE")
    if v == "NOSHUFFLE":
        doshuffle = C.NOSHUFFLE
    elif v == "SHUFFLE":
        doshuffle = C.SHUFFLE
    elif v == "BITSHUFFLE":
        doshuffle = C.BITSHUFFLE
    v = os.environ.get("BLOSC_TYPESIZE")
    if v is not None:
        try:
            iv = int(v)
            if iv > 0:
                typesize = iv
        except ValueError:
            pass
    v = os.environ.get("BLOSC_COMPRESSOR")
    if v is not None:
        set_compressor(v)
    v = os.environ.get("BLOSC_BLOCKSIZE")
    if v is not None:
        try:
            iv = int(v)
            if iv > 0:
                set_blocksize(iv)
        except ValueError:
            pass
    v = os.environ.get("BLOSC_NTHREADS")
    if v is not None:
        try:
            iv = int(v)
            if iv > 0:
                set_nthreads(iv)
        except ValueError:
            pass
    v = os.environ.get("BLOSC_SPLITMODE")
    if v is not None:
        mode = C.SPLITMODE_NAMES.get(v)
        if mode is None:
            raise ValueError(f"BLOSC_SPLITMODE value '{v}' not recognized")
        set_splitmode(mode)
    return clevel, doshuffle, typesize


def _coerce_src(src) -> bytes:
    if isinstance(src, (bytes, bytearray, memoryview)):
        return bytes(src)
    if isinstance(src, np.ndarray):
        return src.tobytes()
    return bytes(src)


# --- compression / decompression ----------------------------------------------

def compress_ctx(
    clevel: int,
    doshuffle: int,
    typesize: int,
    src,
    destsize: int | None = None,
    compressor: str = "blosclz",
    blocksize: int = 0,
    numinternalthreads: int = 1,
    splitmode: int = C.FORWARD_COMPAT_SPLIT,
    backend: str | None = None,
) -> bytes:
    """Stateless compression (blosc_compress_ctx, blosc.h:262-302).

    Returns the serialized chunk, or b"" when the data is incompressible
    and does not fit `destsize`.
    """
    data = _coerce_src(src)
    nbytes = len(data)
    if destsize is None:
        destsize = nbytes + C.MAX_OVERHEAD
    codec = registry.get_by_name(compressor)
    ctx = engine.build_context(
        clevel, doshuffle, typesize, nbytes, destsize, codec.code,
        forced_blocksize=blocksize, splitmode=splitmode,
        nthreads=numinternalthreads,
    )
    from .core import backend as backend_mod

    out = backend_mod.compress_chunk(ctx, data, backend)
    # BLOSC_WARN: stderr verbosity on incompressible-input situations
    # (blosc.h:216-219, blosc.c:1076-1115)
    warn = os.environ.get("BLOSC_WARN")
    if warn:
        try:
            level = int(warn)
        except ValueError:
            level = 0
        if level >= 1 and not out:
            import sys

            print(
                "Blosc warning: input is not compressible within the "
                "destination budget (returning empty; keep the original "
                "buffer)", file=sys.stderr,
            )
        elif (level >= 2 and out and len(out) >= nbytes + C.MAX_OVERHEAD
              and clevel != 0 and nbytes >= C.MIN_BUFFERSIZE):
            # only warn when compression was attempted and fell back —
            # clevel 0 / tiny buffers are memcpy mode by design
            import sys

            print("Blosc warning: chunk stored uncompressed (memcpy mode)",
                  file=sys.stderr)
    return out


def compress(
    clevel: int,
    doshuffle: int,
    typesize: int,
    src,
    destsize: int | None = None,
    backend: str | None = None,
) -> bytes:
    """Global-config compression (blosc_compress, blosc.h:120-173)."""
    if not _state.initialized:
        init()
    # env overrides run BEFORE the NOLOCK reroute: the reference reads all
    # BLOSC_* vars first and notes NOLOCK "should be the last env var"
    # (blosc.c:1320-1408); NOLOCK triggers on ANY set value (getenv != NULL).
    clevel, doshuffle, typesize = _env_overrides(clevel, doshuffle, typesize)
    if os.environ.get("BLOSC_NOLOCK") is not None:
        # reroute to the lock-free context API (blosc.c:1379-1408)
        return compress_ctx(
            clevel, doshuffle, typesize, src, destsize,
            compressor=C.COMPNAMES[_state.compressor],
            blocksize=_state.force_blocksize,
            numinternalthreads=_state.nthreads,
            splitmode=_state.splitmode, backend=backend,
        )
    with _state.lock:
        name = C.COMPNAMES[_state.compressor]
        blocksize = _state.force_blocksize
        nthreads = _state.nthreads
        splitmode = _state.splitmode
    return compress_ctx(
        clevel, doshuffle, typesize, src, destsize,
        compressor=name, blocksize=blocksize,
        numinternalthreads=nthreads, splitmode=splitmode, backend=backend,
    )


def decompress_ctx(
    src, destsize: int | None = None, numinternalthreads: int = 1,
    backend: str | None = None,
) -> bytes:
    """Stateless decompression (blosc_decompress_ctx, blosc.h:304-330)."""
    from .core import backend as backend_mod

    return backend_mod.decompress_chunk(
        _coerce_src(src), destsize, numinternalthreads, backend
    )


def decompress(src, destsize: int | None = None, backend: str | None = None) -> bytes:
    """Global-config decompression (blosc_decompress, blosc.h:221-260)."""
    if not _state.initialized:
        init()
    # BLOSC_NTHREADS applies before the NOLOCK reroute (blosc.c:1543-1562);
    # NOLOCK triggers on any set value.
    v = os.environ.get("BLOSC_NTHREADS")
    if v is not None:
        try:
            iv = int(v)
            if iv > 0:
                set_nthreads(iv)
        except ValueError:
            pass
    # (the ctx path is already lock-free here, so BLOSC_NOLOCK needs no
    # separate reroute on decompression)
    return decompress_ctx(src, destsize, _state.nthreads, backend=backend)


def getitem(src, start: int, nitems: int, backend: str | None = None) -> bytes:
    """Partial decompression of items [start, start+nitems)
    (blosc_getitem, blosc.h:332-352). backend='tpu' decodes only the
    overlapping blocks on device; the default prefers the native C++
    engine (single-threaded, like the reference's) over the oracle."""
    data = _coerce_src(src)
    if backend == "tpu":
        from .tpu import host_api

        out = host_api.getitem(data, start, nitems)
        if out is not None:
            return out
    if backend in (None, "auto", "native", "tpu"):
        try:
            from .native import binding

            if binding.available():
                out = binding.getitem(data, start, nitems)
                if out is not None:
                    return out
        except ImportError:
            pass
    return engine.getitem(data, start, nitems)
