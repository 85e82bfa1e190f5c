"""Device blocksize policy and grouped-walk unit coverage."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cblosc_tpu.core import policy
from cblosc_tpu.format import constants as C
from cblosc_tpu.tpu import codec, structured


def test_device_blocksize_by_clevel():
    # higher clevel -> bigger splits (ratio over sort speed)
    sizes = [policy.compute_blocksize_device(cl, 8, 1 << 22)
             for cl in (1, 3, 5, 9)]
    assert sizes == sorted(sizes)
    for bs in sizes:
        assert bs % 8 == 0
        assert C.MIN_BUFFERSIZE <= bs <= C.MAX_BLOCKSIZE


def test_device_blocksize_respects_force_and_small_buffers():
    forced = policy.compute_blocksize_device(5, 4, 1 << 22,
                                             forced_blocksize=65536)
    assert forced == policy.compute_blocksize(5, 4, 1 << 22, 65536)
    small = policy.compute_blocksize_device(5, 4, 1000)
    assert small == policy.compute_blocksize(5, 4, 1000)


def test_grouped_walk_matches_plain_vmap(rng):
    n = 2048
    rows = []
    for k in range(12):
        kind = k % 3
        if kind == 0:
            rows.append(np.zeros(n, np.uint8))
        elif kind == 1:
            rows.append(np.tile(np.arange(128, dtype=np.uint8), n // 128))
        else:
            rows.append(rng.integers(0, 6, n).astype(np.uint8))
    S = np.stack(rows)
    slots, csizes, _ = codec.encode(jnp.asarray(S))
    maxrec = structured.max_records(n)

    W = slots.shape[1]
    Wpad = max(-(-(W + structured._MARGIN) // 128) * 128, structured._WINW)
    sl = jnp.pad(slots, ((0, 0), (0, Wpad - W)))
    plain = structured._walk_batch(sl, csizes, n, maxrec)
    # csize-sorted 4-row groups (what decode() does for large batches)
    order = jnp.argsort(csizes)
    inv = np.asarray(jnp.argsort(order))
    gr = jax.lax.map(
        lambda t: structured._walk_batch(t[0], t[1], n, maxrec),
        (jnp.take(sl, order, axis=0).reshape(3, 4, -1),
         jnp.take(csizes, order).reshape(3, 4)),
    )
    grouped = jax.tree.map(
        lambda a: jnp.take(a.reshape(12, *a.shape[2:]), inv, axis=0), gr)
    # identical records, distances and ok flags
    for a, b in zip(plain, grouped):
        assert np.array_equal(np.asarray(a), np.asarray(b))
