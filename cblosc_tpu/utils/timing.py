"""Device-timing utilities shared by bench.py and the profiling scripts.

Measuring through the axon tunnel has two traps (CLAUDE.md):
`block_until_ready` does not reliably block, so every measurement must
end in a scalar readback (~35 ms tunnel latency, measured and
subtracted); and XLA hoists or dead-code-eliminates repeated work, so
timed loops run on-device as `fori_loop` chains whose body output feeds
the next input.
"""

from __future__ import annotations

import time

import numpy as np


def synth(nbytes: int, typesize: int, sbits: int, seed: int = 0) -> np.ndarray:
    """Reference bench data: integers with `sbits` significant bits
    (bench/bench.c:150-169), little-endian, viewed as bytes."""
    rng = np.random.default_rng(seed)
    n = nbytes // 8
    vals = rng.integers(0, 1 << min(sbits, 62), n, dtype=np.int64)
    vals <<= max(0, 32 - sbits)
    return vals.view(np.uint8)[:nbytes]


def readback_latency(jnp, y, reps: int = 6) -> float:
    """Scalar-readback latency for an already-materialized array: the
    constant to subtract from chained-loop timings."""
    t0 = time.perf_counter()
    for _ in range(reps):
        _ = float(jnp.sum(y[:8].astype(jnp.int32)))
    return (time.perf_counter() - t0) / reps


def sync_scalar(jnp, y) -> float:
    """Force completion of `y` via a scalar readback (the reliable
    barrier through the tunnel) and return the scalar."""
    return float(jnp.sum(y.reshape(-1)[:8].astype(jnp.int32)))


def chained(step, reps: int):
    """An on-device timing loop: `reps` applications of `step` whose
    int32 result feeds a one-byte carry mutation, so XLA can neither
    hoist nor eliminate any iteration. `step(x) -> int32 scalar` must
    depend on all outputs being timed; the mutated byte is x[0, 0] —
    callers timing DECODERS must instead mutate a byte provably outside
    every stream (see bench.py). NOTE: a scalar consumer only forces the
    work the scalar DEPENDS on — when the bytes themselves are the
    product (codec outputs), use carry_chained so they are materialized
    (round 4: out[0,0]+err.sum() let XLA slice the template decode's
    tile writes away — 5x inflation)."""
    import jax

    @jax.jit
    def many(x):
        def body(i, x):
            r = step(x)
            return x.at[0, 0].set(x[0, 0] ^ (r % 2).astype(x.dtype))
        return jax.lax.fori_loop(0, reps, body, x)

    return many


def carry_chained(step, reps: int, flip_pos: int = 0):
    """Honest output-materializing timing loop: `step(x) -> tuple of
    arrays`; every output rides in the fori_loop carry, so XLA must
    write it to HBM each iteration (the semantics of a codec whose
    consumer reads the buffer). The input byte at [0, flip_pos] is
    xored with a bit of the first output, serializing iterations;
    decoder callers pass a flip_pos provably outside every stream."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(x):
        outs0 = jax.tree_util.tree_map(
            lambda t: jnp.zeros(t.shape, t.dtype), jax.eval_shape(step, x))

        def body(i, st):
            xx = st[0]
            outs = step(xx)
            fb = jax.tree_util.tree_leaves(outs)[0].reshape(-1)[0]
            fb = fb.astype(jnp.int32) % 2
            xx = xx.at[0, flip_pos].set(
                xx[0, flip_pos] ^ fb.astype(xx.dtype))
            return (xx,) + tuple(outs)
        return jax.lax.fori_loop(0, reps, body, (x,) + tuple(outs0))

    return many
