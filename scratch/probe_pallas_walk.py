"""Round-2 feasibility probe: Pallas dynamic-window reads on real TPU.

The structured decoder's walk is capped by XLA's ~2 us per vmapped
dynamic-offset read (one 16B window per iteration).  Question: can a
Pallas kernel do per-row data-dependent window loads at ~ns cost?

Mosaic rejected u8 reshapes earlier; this probe stays in int32.
Each grid row runs a fori_loop of ITERS steps; each step loads a
WIN-element window at a data-dependent offset (chained so it can't be
hoisted) and accumulates.  Compare wall time against the measured XLA
dynamic-slice cost model.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

ROWS = 256
N = 8192          # int32 elements per row
WIN = 8           # window elements per iteration
ITERS = 512       # dependent dynamic reads per row


def kernel(x_ref, o_ref):
    accs = []
    for r in range(8):                       # sublane tile: 8 rows per step
        def body(i, carry):
            off, acc = carry
            # Mosaic wants lane offsets provably 128-aligned: load an
            # aligned 256-lane window, extract WIN elems by iota mask
            # (the real walk extracts bytes via masked sums anyway).
            base = pl.multiple_of((off // 128) * 128, 128)
            w = x_ref[r, pl.ds(base, 256)]
            sub = off - base
            lane = jax.lax.broadcasted_iota(jnp.int32, (256,), 0)
            s = jnp.sum(jnp.where((lane >= sub) & (lane < sub + WIN), w, 0))
            # data-dependent next offset: defeats hoisting, stays in range
            off = (off + (s & 0x7) + 1) % (N - 256)
            return off, acc + s

        _, acc = jax.lax.fori_loop(0, ITERS, body, (0, jnp.int32(0)))
        accs.append(acc)
    o_ref[:, :] = jnp.stack(accs).reshape(8, 1)


@functools.partial(jax.jit)
def run(x):
    f = pl.pallas_call(
        kernel,
        grid=(ROWS // 8,),
        in_specs=[pl.BlockSpec((8, N), lambda r: (r, 0))],
        out_specs=pl.BlockSpec((8, 1), lambda r: (r, 0)),
        out_shape=jax.ShapeDtypeStruct((ROWS, 1), jnp.int32),
    )
    return f(x)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 7, (ROWS, N)).astype(np.int32))
    out = run(x)
    out.block_until_ready()
    print("compiled; first result row:", int(np.asarray(out)[0]))

    reps = 20
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x)
    _ = int(np.asarray(out)[0])        # forced readback (axon)
    dt = time.perf_counter() - t0
    per_read = dt / reps / (ROWS * ITERS)
    print(f"{dt/reps*1e3:.2f} ms/rep -> {per_read*1e9:.1f} ns per "
          f"dynamic window read ({ROWS}x{ITERS} reads)")
    print("XLA cost-model reference: ~2000 ns per vmapped dynamic read")


if __name__ == "__main__":
    main()
