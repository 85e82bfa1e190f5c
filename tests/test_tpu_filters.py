"""Device filters vs the numpy oracle — the TPU analog of the reference's
generic-vs-SIMD cross-validation (tests/test_shuffle_roundtrip_sse2.c:44-66).

Runs on the CPU backend (conftest) — the equivalent of the reference CI's
no-SIMD legs — and on TPU when one is present.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from cblosc_tpu.ops import filters_np
from cblosc_tpu.tpu import filters as tf

TYPESIZES = [1, 2, 3, 4, 5, 8, 12, 16, 24, 32]


def _blocks(rng, nblocks, blocksize):
    return rng.integers(0, 256, (nblocks, blocksize), dtype=np.uint8)


@pytest.mark.parametrize("typesize", TYPESIZES)
def test_shuffle_matches_oracle(rng, typesize):
    bs = 64 * typesize
    x = _blocks(rng, 4, bs)
    got = np.asarray(tf.shuffle(jnp.asarray(x), typesize))
    want = np.stack([filters_np.shuffle(typesize, row) for row in x])
    assert np.array_equal(got, want)


@pytest.mark.parametrize("typesize", TYPESIZES)
def test_unshuffle_roundtrip(rng, typesize):
    bs = 48 * typesize
    x = _blocks(rng, 3, bs)
    y = tf.shuffle(jnp.asarray(x), typesize)
    back = np.asarray(tf.unshuffle(y, typesize))
    assert np.array_equal(back, x)
    want = np.stack([filters_np.unshuffle(typesize, row) for row in np.asarray(y)])
    assert np.array_equal(back, want)


@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 16])
def test_bitshuffle_matches_oracle(rng, typesize):
    bs = 8 * 16 * typesize  # nel multiple of 8
    x = _blocks(rng, 4, bs)
    got = np.asarray(tf.bitshuffle(jnp.asarray(x), typesize))
    want = np.stack([filters_np.bitshuffle(typesize, row) for row in x])
    assert np.array_equal(got, want)


@pytest.mark.parametrize("typesize", [1, 2, 4, 8, 16])
def test_bitunshuffle_roundtrip(rng, typesize):
    bs = 8 * 32 * typesize
    x = _blocks(rng, 2, bs)
    y = tf.bitshuffle(jnp.asarray(x), typesize)
    back = np.asarray(tf.bitunshuffle(y, typesize))
    assert np.array_equal(back, x)
    want = np.stack(
        [filters_np.bitunshuffle(typesize, row) for row in np.asarray(y)]
    )
    assert np.array_equal(back, want)


def test_filter_dispatch_passthrough(rng):
    # bitshuffle with nel not a multiple of 8 passes through, like the
    # oracle (shuffle.c:412-414)
    x = _blocks(rng, 2, 4 * 9)
    got = np.asarray(tf.apply_filter(2, 4, jnp.asarray(x)))
    assert np.array_equal(got, x)


@pytest.mark.parametrize("typesize", [3, 5, 8, 16])
def test_apply_filter_leftover_tail_matches_oracle(rng, typesize):
    """Blocksize not a multiple of typesize: the body shuffles, the tail
    passes through (shuffle.c leftover memcpy) instead of raising —
    header-valid foreign chunks with dont_split can carry this geometry."""
    from cblosc_tpu.format import constants as C

    bs = 64 * typesize + (typesize - 1)
    x = _blocks(rng, 3, bs)
    got = np.asarray(tf.apply_filter(C.SHUFFLE, typesize, jnp.asarray(x)))
    want = np.stack([filters_np.shuffle(typesize, row) for row in x])
    assert np.array_equal(got, want)
    back = np.asarray(tf.undo_filter(C.SHUFFLE, typesize, jnp.asarray(got)))
    assert np.array_equal(back, x)


@pytest.mark.parametrize("typesize", [2, 4, 8])
def test_apply_filter_bitshuffle_leftover_tail(rng, typesize):
    from cblosc_tpu.format import constants as C

    bs = 8 * 16 * typesize + (typesize - 1)   # nel % 8 == 0, tail bytes
    x = _blocks(rng, 2, bs)
    got = np.asarray(tf.apply_filter(C.BITSHUFFLE, typesize, jnp.asarray(x)))
    want = np.stack([filters_np.bitshuffle(typesize, row) for row in x])
    assert np.array_equal(got, want)
    back = np.asarray(tf.undo_filter(C.BITSHUFFLE, typesize, jnp.asarray(got)))
    assert np.array_equal(back, x)
