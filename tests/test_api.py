"""Public API surface tests (reference analogs: test_api.c,
test_compressor.c, test_nthreads.c, test_nolock.c/noinit.c behaviors)."""

import os

import pytest

import cblosc_tpu as b
from cblosc_tpu.format import constants as C


@pytest.fixture(autouse=True)
def clean_state():
    b.destroy()
    yield
    b.destroy()
    for var in ("BLOSC_CLEVEL", "BLOSC_SHUFFLE", "BLOSC_TYPESIZE",
                "BLOSC_COMPRESSOR", "BLOSC_NTHREADS", "BLOSC_BLOCKSIZE",
                "BLOSC_SPLITMODE"):
        os.environ.pop(var, None)


def test_noinit_works(rng):
    # entry points auto-initialize (test_noinit.c)
    data = bytes(1000)
    out = b.compress(5, 1, 4, data)
    assert b.decompress(out) == data


def test_nthreads_get_set():
    assert b.get_nthreads() == 1
    prev = b.set_nthreads(4)
    assert prev == 1
    assert b.get_nthreads() == 4
    with pytest.raises(ValueError):
        b.set_nthreads(0)
    with pytest.raises(ValueError):
        b.set_nthreads(C.MAX_THREADS + 1)


def test_compressor_get_set():
    assert b.get_compressor() == "blosclz"
    code = b.set_compressor("lz4")
    assert code == C.LZ4
    assert b.get_compressor() == "lz4"
    with pytest.raises(ValueError):
        b.set_compressor("nosuchcodec")


def test_list_compressors():
    names = b.list_compressors()
    for required in ("blosclz", "lz4", "lz4hc", "snappy", "zlib"):
        assert required in names


def test_compcode_conversions():
    assert b.compcode_to_compname(C.BLOSCLZ) == "blosclz"
    assert b.compname_to_compcode("zlib") == C.ZLIB
    assert b.compname_to_compcode("bogus") == -1
    with pytest.raises(ValueError):
        b.compcode_to_compname(42)


def test_complib_info():
    lib, version = b.get_complib_info("blosclz")
    assert lib == "BloscLZ"
    assert version
    lib, _ = b.get_complib_info("lz4hc")
    assert lib == "LZ4"


def test_version_string():
    assert "tpu" in b.get_version_string()


def test_blocksize_get_set(rng):
    assert b.get_blocksize() == 0
    b.set_blocksize(65536)
    assert b.get_blocksize() == 65536
    data = bytes(500_000)
    chunk = b.compress(5, 1, 4, data)
    # forced blocksize still goes through the split enlargement
    # (blosc.c:1031-1047): 65536 * typesize, clamped -> 262144
    assert b.cbuffer_sizes(chunk)[2] == 262144
    b.set_blocksize(0)
    assert b.decompress(chunk) == data


def test_splitmode_get_set():
    assert b.get_splitmode() == C.FORWARD_COMPAT_SPLIT
    b.set_splitmode(C.NEVER_SPLIT)
    assert b.get_splitmode() == C.NEVER_SPLIT
    with pytest.raises(ValueError):
        b.set_splitmode(77)


def test_env_clevel_override(rng):
    data = bytes(200_000)
    os.environ["BLOSC_CLEVEL"] = "0"
    chunk = b.compress(9, 1, 4, data)
    assert len(chunk) == len(data) + 16  # clevel 0 = memcpy


def test_env_compressor_override():
    os.environ["BLOSC_COMPRESSOR"] = "zlib"
    chunk = b.compress(5, 1, 4, bytes(10_000))
    assert b.cbuffer_complib(chunk) == "Zlib"


def test_env_shuffle_override():
    os.environ["BLOSC_SHUFFLE"] = "BITSHUFFLE"
    chunk = b.compress(5, C.NOSHUFFLE, 4, bytes(10_000))
    _, flags = b.cbuffer_metainfo(chunk)
    assert flags & C.DOBITSHUFFLE


def test_env_splitmode_invalid():
    os.environ["BLOSC_SPLITMODE"] = "WRONG"
    with pytest.raises(ValueError):
        b.compress(5, 1, 4, bytes(10_000))


def test_env_nthreads():
    os.environ["BLOSC_NTHREADS"] = "3"
    b.compress(5, 1, 4, bytes(10_000))
    assert b.get_nthreads() == 3


def test_destroy_resets_config():
    b.set_compressor("zstd" if "zstd" in b.list_compressors() else "zlib")
    b.set_nthreads(8)
    b.destroy()
    assert b.get_compressor() == "blosclz"
    assert b.get_nthreads() == 1


def test_free_resources():
    b.compress(5, 1, 4, bytes(10_000))
    b.free_resources()  # must not raise


def test_getitem_basic(rng):
    import numpy as np

    data = np.arange(100_000, dtype=np.int32)
    chunk = b.compress(5, 1, 4, data.tobytes())
    out = b.getitem(chunk, 1000, 250)
    assert np.frombuffer(out, np.int32).tolist() == list(range(1000, 1250))


def test_getitem_bounds(rng):
    chunk = b.compress(5, 1, 4, bytes(4000))
    with pytest.raises(IndexError):
        b.getitem(chunk, -1, 10)
    with pytest.raises(IndexError):
        b.getitem(chunk, 0, 1001)


def test_getitem_memcpyed(rng):
    import numpy as np

    data = np.arange(16, dtype=np.int32)  # small buffer -> memcpyed
    chunk = b.compress(5, 1, 4, data.tobytes())
    out = b.getitem(chunk, 4, 8)
    assert np.frombuffer(out, np.int32).tolist() == list(range(4, 12))


def test_fork_safety(rng):
    """Compress, fork, decompress in the child (test_forksafe.c)."""
    if not hasattr(os, "fork"):
        pytest.skip("no fork on this platform")
    data = bytes(range(256)) * 500
    chunk = b.compress(5, 1, 4, data)
    pid = os.fork()
    if pid == 0:
        ok = b.decompress(chunk) == data
        os._exit(0 if ok else 1)
    _, status = os.waitpid(pid, 0)
    assert os.waitstatus_to_exitcode(status) == 0
