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
