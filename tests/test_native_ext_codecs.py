"""Native-engine zlib/zstd/snappy: byte parity with the numpy oracle.

The reference handles these codecs inside the same C engine (wrapper
dispatch blosc/blosc.c:412-574); round 1 left them to the Python block
loop. These tests pin the native engine's chunk bytes to the oracle's
(zlib links the same system library CPython uses; zstd dlopens the exact
library the `zstandard` binding bundles; snappy is an algorithm-identical
C++ port of ops/codecs/snappy.py) and cross-decode in both directions.
"""

import glob
import os

import numpy as np
import pytest

import cblosc_tpu as b
from cblosc_tpu.core import backend, engine
from cblosc_tpu.format import constants as C
from tests.conftest import REFERENCE, reference_available


def _native_available():
    try:
        from cblosc_tpu.native import binding

        return binding.available()
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _native_available(), reason="native engine unavailable"
)

CODECS = [C.SNAPPY, C.ZLIB, C.ZSTD]


def _datasets(rng):
    n = 220_000
    ramp = (np.arange(n) // 512).astype(np.uint8)
    runs = np.repeat(rng.integers(0, 9, 64).astype(np.uint8), n // 64 + 1)[:n]
    noise = rng.integers(0, 256, n, dtype=np.uint8)
    mixed = np.where(np.arange(n) % 3 == 0, ramp, runs)
    return {"ramp": ramp, "runs": runs, "noise": noise,
            "mixed": mixed.astype(np.uint8)}


@pytest.mark.parametrize("compcode", CODECS,
                         ids=[C.COMPNAMES[c] for c in CODECS])
@pytest.mark.parametrize("clevel", [1, 5, 9])
@pytest.mark.parametrize("doshuffle", [0, 1])
def test_native_matches_numpy_chunk_bytes(rng, compcode, clevel, doshuffle):
    for name, arr in _datasets(rng).items():
        data = arr.tobytes()
        ctx = engine.build_context(
            clevel, doshuffle, 8, len(data), len(data) + C.MAX_OVERHEAD,
            compcode)
        py = backend.compress_chunk(ctx, data, "numpy")
        nat = backend.compress_chunk(ctx, data, "native")
        assert nat == py, (name, len(nat), len(py))
        # cross-engine decode both ways
        assert backend.decompress_chunk(nat, len(data), 1, "numpy") == data
        assert backend.decompress_chunk(py, len(data), 2, "native") == data


@pytest.mark.parametrize("compcode", CODECS,
                         ids=[C.COMPNAMES[c] for c in CODECS])
def test_native_never_silently_degrades(monkeypatch, compcode):
    """backend='native' must run these codecs natively, not fall through
    to the Python block loop: the engine call itself returns a chunk."""
    from cblosc_tpu.native import binding

    data = (np.arange(100_000, dtype=np.uint8) // 7).tobytes()
    ctx = engine.build_context(5, 1, 4, len(data),
                               len(data) + C.MAX_OVERHEAD, compcode)
    out = binding.compress_chunk(ctx, data)
    assert out is not None and len(out) > 0
    assert binding.decompress_chunk(out, len(data), 2) == data


@pytest.mark.skipif(not reference_available(),
                    reason="reference compat files not mounted")
@pytest.mark.parametrize("name", ["snappy", "zlib", "zstd"])
def test_native_decodes_golden(name):
    """Cross-version golden chunks decode through the NATIVE engine."""
    from cblosc_tpu.native import binding

    expected = np.arange(1000 * 1000, dtype=np.int32).tobytes()
    paths = sorted(glob.glob(
        os.path.join(REFERENCE, "compat", f"*-{name}.cdata")))
    assert paths
    for path in paths:
        chunk = open(path, "rb").read()
        out = binding.decompress_chunk(chunk, len(expected), 2)
        assert out == expected, os.path.basename(path)


def test_native_snappy_speed_sanity(rng):
    """The native snappy encoder replaces the pure-Python per-byte loop;
    a 4 MB compressible buffer should encode in well under a second."""
    import time

    from cblosc_tpu.native import binding

    data = np.repeat(rng.integers(0, 200, 4096).astype(np.uint8),
                     1024).tobytes()
    ctx = engine.build_context(5, 1, 8, len(data),
                               len(data) + C.MAX_OVERHEAD, C.SNAPPY)
    t0 = time.perf_counter()
    out = binding.compress_chunk(ctx, data)
    dt = time.perf_counter() - t0
    assert out and len(out) < len(data) // 2
    assert dt < 1.0, f"native snappy too slow: {dt:.2f}s"
    assert backend.decompress_chunk(out, len(data), 1, "numpy") == data
