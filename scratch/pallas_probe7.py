"""Probe s7: the expand-kernel core — dynamic sublane RMW stores,
butterfly lane rotation, and a per-row record loop, validated against
numpy. Usage: python pallas_probe7.py [--real]"""
import sys
import numpy as np

REAL = "--real" in sys.argv
if not REAL:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERP = not REAL
I32 = jnp.int32

OB = 16           # output blocks of 128 per row
SPAD = 8          # scratch padding sublanes (window overread room)
WB = 19           # source blocks per row (incl. padding)
MAXREC = 12


def butterfly_roll_left(v, rot):
    """Roll (k, 128) left along lanes by traced rot in [0, 128)."""
    for b in range(7):
        amt = 1 << b
        rolled = jnp.concatenate([v[:, amt:], v[:, :amt]], axis=1)
        v = jnp.where((rot >> b) & 1 == 1, rolled, v)
    return v


def shift_down_sublanes(w, shift):
    """w (9,128) shifted down by traced shift in [0, 9): row j becomes
    row j - shift's data, zeros on top."""
    for b in range(4):
        amt = 1 << b
        shifted = jnp.concatenate(
            [jnp.zeros((amt, 128), w.dtype), w[:-amt]], axis=0)
        w = jnp.where((shift >> b) & 1 == 1, shifted, w)
    return w


def copy_bytes(read_win, wr_ref, s0, d0, L):
    """Copy L bytes from byte offset s0 (read_win(sublane) -> (9,128)
    i32; the window provider must tolerate sublane+9 overreads) to
    wr_ref at byte offset d0, via 8-sublane masked RMW tiles."""
    rot = (s0 - d0) % 128
    t0 = d0 // 1024
    t1 = (d0 + L - 1) // 1024

    def tile_body(t, _):
        src_byte0 = s0 + t * 1024 - d0
        sb = src_byte0 // 128              # jnp floor division: -3//128=-1
        sbc = jnp.maximum(sb, 0)
        w = read_win(sbc)                  # (9,128)
        w = shift_down_sublanes(w, sbc - sb)
        w = butterfly_roll_left(w, rot)
        lane = jax.lax.broadcasted_iota(I32, (8, 128), 1)
        r = jnp.where(lane < 128 - rot, w[0:8], w[1:9])
        pos = (t * 1024
               + jax.lax.broadcasted_iota(I32, (8, 128), 0) * 128 + lane)
        mask = (pos >= d0) & (pos < d0 + L)
        cur = wr_ref[pl.ds(t * 8, 8), :]
        wr_ref[pl.ds(t * 8, 8), :] = jnp.where(mask, r, cur)
        return 0

    jax.lax.fori_loop(t0, t1 + 1, tile_body, 0)


def kernel(src_ref, recs_ref, out_ref, scratch_ref):
    scratch_ref[:, :] = jnp.zeros((OB + SPAD, 128), I32)

    def src_win(sb):
        return src_ref[0, pl.ds(jnp.minimum(sb, WB - 9), 9), :]

    def out_win(sb):
        return scratch_ref[pl.ds(jnp.minimum(sb, OB + SPAD - 9), 9), :]

    def rec_body(k, _):
        kind = recs_ref[0, k, 0]
        a = recs_ref[0, k, 1]
        d0 = recs_ref[0, k, 2]
        L = recs_ref[0, k, 3]

        @pl.when(kind == 0)
        def _():
            copy_bytes(src_win, scratch_ref, a, d0, L)

        @pl.when(kind == 1)
        def _():
            def prom(state):
                done, d = state
                n = jnp.minimum(d, L - done)
                copy_bytes(out_win, scratch_ref,
                           d0 + done - d, d0 + done, n)
                return done + n, d * 2
            jax.lax.while_loop(lambda s: s[0] < L, prom,
                               (jnp.int32(0), a))
        return 0

    jax.lax.fori_loop(0, MAXREC, rec_body, 0)
    out_ref[0, :, :] = scratch_ref[:OB, :]


def run():
    rng = np.random.default_rng(0)
    R = 4
    src = rng.integers(0, 256, (R, WB * 128), np.int64).astype(np.int32)
    recs = np.full((R, MAXREC, 4), -1, np.int32)
    want = np.zeros((R, OB * 128), np.int32)
    for r in range(R):
        pieces = [
            (0, 5 + r, 0, 300 + r * 7),            # copy
            (1, 3 + r, 300 + r * 7, 700),          # fill small d
            (0, 700, 1000 + r * 7, 513),           # copy, s0 < d0%1024
            (1, 1, 1513 + r * 7, OB * 128 - (1513 + r * 7)),  # d=1 splat
        ]
        for k, (kind, a, d0, L) in enumerate(pieces):
            recs[r, k] = (kind, a, d0, L)
            if kind == 0:
                want[r, d0:d0 + L] = src[r, a:a + L]
            else:
                for x in range(d0, d0 + L):
                    want[r, x] = want[r, x - a]

    f = pl.pallas_call(
        kernel,
        grid=(R,),
        in_specs=[pl.BlockSpec((1, WB, 128), lambda r: (r, 0, 0)),
                  pl.BlockSpec((1, MAXREC, 4), lambda r: (r, 0, 0))],
        out_specs=pl.BlockSpec((1, OB, 128), lambda r: (r, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, OB, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((OB + SPAD, 128), jnp.int32)],
        interpret=INTERP,
    )
    y = f(jnp.asarray(src.reshape(R, WB, 128)), jnp.asarray(recs))
    got = np.asarray(y).reshape(R, OB * 128)
    ok = np.array_equal(got, want)
    print("s7", "OK" if ok else "MISMATCH", flush=True)
    if not ok:
        bad = np.argwhere(got != want)
        print("first bad:", bad[:5], got[bad[0][0], bad[0][1]],
              want[bad[0][0], bad[0][1]])


if __name__ == "__main__":
    print(f"[{'REAL' if REAL else 'interpret'}] s7", flush=True)
    run()
