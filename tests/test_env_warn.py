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


def test_blosc_nolock_keeps_env_overrides(rng, monkeypatch):
    """The reference applies all BLOSC_* env vars BEFORE the NOLOCK
    reroute (blosc.c:1320-1408: NOLOCK 'should be the last env var'), so
    BLOSC_CLEVEL must still take effect with NOLOCK set."""
    data = (np.arange(200_000, dtype=np.uint8) // 7).tobytes()
    base9 = b.compress(9, 1, 8, data)
    monkeypatch.setenv("BLOSC_NOLOCK", "1")
    monkeypatch.setenv("BLOSC_CLEVEL", "9")
    nolock9 = b.compress(1, 1, 8, data)  # clevel 1 overridden to 9
    assert nolock9 == base9
    assert b.decompress(nolock9) == data


def test_blosc_nolock_any_value(rng, monkeypatch):
    """The reference reroutes whenever BLOSC_NOLOCK is set to ANY value
    (getenv != NULL, blosc.c:1379), not just '1'."""
    data = rng.integers(0, 16, 60_000, dtype=np.uint8).tobytes()
    for v in ("0", "true", ""):
        monkeypatch.setenv("BLOSC_NOLOCK", v)
        c = b.compress(5, 1, 4, data)
        assert b.decompress(c) == data


def test_blosc_warn_no_memcpy_warning_when_preordained(capfd, monkeypatch):
    """level>=2 memcpy-mode warning fires only when compression was
    attempted and fell back — not for clevel 0 or tiny buffers."""
    monkeypatch.setenv("BLOSC_WARN", "2")
    b.compress_ctx(0, 1, 4, b"\x00" * 4096)        # clevel 0: by design
    b.compress_ctx(5, 1, 4, b"\x01" * 64)          # < MIN_BUFFERSIZE
    assert capfd.readouterr().err == ""
    data = np.random.default_rng(3).integers(
        0, 256, 50_000, dtype=np.uint8).tobytes()
    out = b.compress_ctx(5, 1, 8, data)            # attempted, fell back
    assert len(out) == len(data) + 16
    assert "memcpy mode" in capfd.readouterr().err
