"""Filter (shuffle/bitshuffle) roundtrip and equivalence tests.

Reference analogs: test_shuffle_roundtrip_generic/sse2/avx2.c matrices and
test_bitshuffle_leftovers.c. The numpy implementations here are the oracle
the Pallas kernels are cross-validated against in test_tpu_filters.py.
"""

import numpy as np
import pytest

from cblosc_tpu.ops import filters_np as F

TYPESIZES = [1, 2, 3, 4, 5, 7, 8, 11, 16, 22, 30, 32, 42, 80, 255]
SIZES = [0, 1, 7, 8, 17, 100, 256, 4096, 30000, 65536]


@pytest.mark.parametrize("typesize", TYPESIZES)
@pytest.mark.parametrize("nbytes", SIZES)
def test_shuffle_roundtrip(rng, typesize, nbytes):
    data = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    sh = F.shuffle(typesize, data)
    back = F.unshuffle(typesize, sh)
    assert back.tobytes() == data


@pytest.mark.parametrize("typesize", TYPESIZES)
@pytest.mark.parametrize("nbytes", SIZES)
def test_bitshuffle_roundtrip(rng, typesize, nbytes):
    data = rng.integers(0, 256, nbytes, dtype=np.uint8).tobytes()
    sh = F.bitshuffle(typesize, data)
    back = F.bitunshuffle(typesize, sh)
    assert back.tobytes() == data


def test_shuffle_is_byte_transpose():
    # 4 elements of 2 bytes: planes of first/second bytes
    data = bytes([1, 2, 3, 4, 5, 6, 7, 8])
    out = F.shuffle(2, data).tobytes()
    assert out == bytes([1, 3, 5, 7, 2, 4, 6, 8])


def test_shuffle_leftover_bytes_pass_through():
    # 10 bytes, typesize 4 -> 2 full elements shuffled, 2 bytes verbatim
    data = bytes(range(10))
    out = F.shuffle(4, data).tobytes()
    assert out == bytes([0, 4, 1, 5, 2, 6, 3, 7, 8, 9])


def test_bitshuffle_bit_planes():
    # 8 one-byte elements, each 0b00000001: bit-plane 0 is all-ones.
    data = bytes([1] * 8)
    out = F.bitshuffle(1, data).tobytes()
    assert out == bytes([0xFF, 0, 0, 0, 0, 0, 0, 0])


def test_bitshuffle_non_multiple_of_8_passthrough():
    # 7 elements: geometry unsupported -> block passes through
    data = bytes(range(7))
    assert F.bitshuffle(1, data).tobytes() == data


def test_bitshuffle_leftover_elements():
    # 9 elements of 2 bytes: 8 shuffled, 1 element (2 bytes) verbatim
    data = bytes(range(18))
    out = F.bitshuffle(2, data)
    assert out.tobytes()[-2:] == data[-2:]
    assert F.bitunshuffle(2, out).tobytes() == data


@pytest.mark.parametrize("typesize", [1, 2, 4, 8])
def test_bitshuffle_matches_bruteforce(rng, typesize):
    """Cross-validate the vectorized implementation against a naive
    per-bit transposition (the role of the scalar/SIMD equivalence tests,
    test_shuffle_roundtrip_sse2.c:44-66)."""
    size = 64  # elements
    data = rng.integers(0, 256, size * typesize, dtype=np.uint8)
    out = F.bitshuffle(typesize, data.tobytes())

    # naive: bit (elem i, byte j, bit k) -> row j*8+k, column i
    expected = np.zeros(size * typesize, dtype=np.uint8)
    elems = data.reshape(size, typesize)
    nrow_bytes = size // 8
    for j in range(typesize):
        for k in range(8):
            for i in range(size):
                bit = (elems[i, j] >> k) & 1
                idx = (j * 8 + k) * nrow_bytes + i // 8
                expected[idx] |= bit << (i % 8)
    assert np.array_equal(out, expected)
