"""Backend selection: route chunk jobs to an execution engine.

Three engines provide the same chunk-format semantics:
  * "numpy"  — the pure-Python/numpy oracle (always available; this file's
               fallback; cblosc_tpu.core.engine).
  * "native" — the C++ host engine with a persistent thread pool
               (cblosc_tpu.native; plays the role of the reference's
               pthread pool + SIMD kernels, blosc.c:1706-1949).
  * "tpu"    — the JAX/Pallas device pipeline for filter-heavy paths
               (cblosc_tpu.tpu).

"auto" prefers native for host byte buffers, falling back to numpy. The
TPU pipeline is used explicitly via the device API (cblosc_tpu.tpu), since
host<->device transfer costs make implicit routing a bad default.
"""

from __future__ import annotations

import os

from . import engine

_DEFAULT = os.environ.get("CBLOSC_TPU_BACKEND", "auto")


def _native():
    try:
        from ..native import binding

        return binding if binding.available() else None
    except Exception:
        return None


def resolve(name: str | None) -> str:
    name = name or _DEFAULT
    if name == "auto":
        return "native" if _native() is not None else "numpy"
    if name not in ("numpy", "native", "tpu"):
        raise ValueError(f"unknown backend '{name}'")
    return name


def compress_chunk(ctx, data: bytes, backend: str | None = None) -> bytes:
    b = resolve(backend)
    if b == "native":
        native = _native()
        if native is not None:
            result = native.compress_chunk(ctx, data)
            if result is not None:
                return result
    if b == "tpu":
        from ..tpu import host_api as tpu_api

        result = tpu_api.compress_chunk(ctx, data)
        if result is not None:
            return result
        # device fallback prefers the native engine over the numpy
        # oracle (e.g. snappy encode: the oracle's per-byte Python loop
        # is format-correct but ~1000x slower than native/src)
        native = _native()
        if native is not None:
            result = native.compress_chunk(ctx, data)
            if result is not None:
                return result
    return engine.compress_chunk(ctx, data)


def decompress_chunk(
    chunk: bytes, destsize: int | None, nthreads: int, backend: str | None = None
) -> bytes:
    b = resolve(backend)
    if b == "native":
        native = _native()
        if native is not None:
            result = native.decompress_chunk(chunk, destsize, nthreads)
            if result is not None:
                return result
    if b == "tpu":
        from ..tpu import host_api as tpu_api

        result = tpu_api.decompress_chunk(chunk, destsize)
        if result is not None:
            return result
        native = _native()
        if native is not None:
            result = native.decompress_chunk(chunk, destsize, nthreads)
            if result is not None:
                return result
    return engine.decompress_chunk(chunk, destsize, nthreads)


def free_resources() -> None:
    native = _native()
    if native is not None:
        native.free_resources()
