"""BLOSC_WARN env verbosity (blosc.h:216-219)."""

import numpy as np

import cblosc_tpu as b


def test_blosc_warn_on_incompressible(rng, capfd, monkeypatch):
    monkeypatch.setenv("BLOSC_WARN", "1")
    data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    out = b.compress_ctx(5, 1, 8, data, destsize=100)
    assert out == b""
    assert "not compressible" in capfd.readouterr().err


def test_blosc_warn_silent_by_default(rng, capfd, monkeypatch):
    monkeypatch.delenv("BLOSC_WARN", raising=False)
    data = rng.integers(0, 256, 50_000, dtype=np.uint8).tobytes()
    b.compress_ctx(5, 1, 8, data, destsize=100)
    assert capfd.readouterr().err == ""


def test_blosc_nolock_reroutes(rng, monkeypatch):
    """BLOSC_NOLOCK=1 routes through the stateless ctx path
    (blosc.c:1379-1408); results stay identical."""
    monkeypatch.setenv("BLOSC_NOLOCK", "1")
    data = rng.integers(0, 64, 100_000, dtype=np.uint8).tobytes()
    c = b.compress(5, 1, 4, data)
    assert b.decompress(c) == data
