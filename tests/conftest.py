"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that the multi-chip
sharding paths (cblosc_tpu.parallel) compile and execute without TPU
hardware — the equivalent of the reference CI's no-SSE2/no-AVX2 legs that
force the generic kernels (.github/workflows/cmake.yml).
"""

import os

# Force the CPU backend even when the shell pre-sets JAX_PLATFORMS (the
# axon TPU tunnel does — and its plugin wins platform selection over the
# env var, so the jax.config update below is required too); tests must
# see the virtual 8-device mesh. Set CBLOSC_TPU_TEST_PLATFORM=axon to run
# the single-chip legs on real TPU instead.
_platform = os.environ.get("CBLOSC_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE, "compat"))


@pytest.fixture()
def rng(request):
    # deterministic per test regardless of selection or execution order
    # (a session-scoped stream made failures depend on which tests ran);
    # crc32 because str hash is salted per process
    import zlib

    seed = zlib.crc32(request.node.nodeid.encode())
    return np.random.default_rng((20260816, seed))


def make_buffer(rng, nbytes: int, typesize: int, kind: str) -> bytes:
    """Synthetic data generator, mirroring the reference's test fill
    patterns (tests/test_common.h random fill, bench.c:150-169 ramp with
    limited significant bits)."""
    if kind == "ramp":
        n = max(nbytes // 4, 1)
        a = (np.arange(n, dtype=np.int64) & 0x7FFFFFFF).astype(np.int32)
        return a.tobytes()[:nbytes]
    if kind == "random":
        return rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    if kind == "lowentropy":
        a = (rng.integers(0, 8, nbytes, dtype=np.uint8) * 16)
        return a.tobytes()
    if kind == "zeros":
        return bytes(nbytes)
    raise ValueError(kind)
