"""Device BloscLZ codec: vectorized encoder + batched decoder.

The reference's blosclz (blosc/blosclz.c) is a pointer-chasing LZ77 with a
hash table — an inherently serial CPU idiom. The TPU encoder is a
different *strategy* over the same *wire format* (any conforming token
stream is a valid blosclz stream; the format is fixed by the decoder,
blosc/blosclz.c:679-789):

  * After the shuffle/bitshuffle filter, typed data is dominated by
    *periodic* structure inside each byte-plane: constant runs (period
    1) and arithmetic ramps (period 256/step), plus typesize-strided
    patterns in unsplit streams. The encoder emits literal chunks and
    fixed-distance matches: for every stream it scores a small static
    set of candidate distances with a cheap coverage proxy (three
    consecutive s[i]==s[i-d] hits), picks the best distance per stream,
    and run-length-codes s[i]==s[i-d] stretches as distance-d matches.
    Detection, segmentation, token sizing and output layout are all
    data-parallel primitives (compares, cummax/cummin, prefix sums) —
    no sequential scan anywhere — and bytes land via batched scatters.
  * Long matches are split into sub-matches of <= SUBMAX bytes so a
    token needs at most 4 length-extension bytes; all candidate
    distances are < 8192 so the far-distance escape is never needed.
  * Streams always end with at least one literal (a conforming stream
    never ends on a match — the reference decoder reads the next token
    byte before performing a match copy).

The decoder accepts ANY blosclz stream (reference-produced included). It
is a vmapped ``lax.while_loop`` state machine: one iteration parses a
token or copies a bounded window (literal <=32 B, match chunk <=256 B via
a modular gather that reproduces overlapping-copy semantics), so rows
with long runs need few iterations while worst-case streams remain
correct. Batched across (blocks x splits), all rows advance in lockstep.

Compressed outputs are written into fixed worst-case slots plus a csize
vector (SURVEY.md hard part #2: variable-length output under XLA static
shapes); chunk assembly compacts the slots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

I32 = jnp.int32
U8 = jnp.uint8

_EXT = 4              # max length-extension bytes per match token
SUBMAX = 3 + 6 + 255 * (_EXT - 1) + 254   # = 1028 bytes per match token
_LITW = 32            # literal copy window (a literal chunk is <= 32 B)
_MATW = 256           # match copy chunk

# Candidate match distances: 1 catches constant runs, powers of two catch
# arithmetic ramps (a step-s byte plane repeats with period 256/gcd(s,256))
# and strided layouts. All < 8192 so the near-distance form always fits.
DISTANCES = (1, 2, 3, 4, 8, 16, 32, 64, 128, 256, 512, 1024)


def slot_width(n: int) -> int:
    """Worst-case encoded size of an n-byte stream (all literals)."""
    return n + (n + 31) // 32 + 8


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _excl_cumsum(c: jax.Array) -> jax.Array:
    return jnp.cumsum(c, axis=1) - c


@partial(jax.jit, static_argnums=1)
def encode(s: jax.Array, dists: tuple = DISTANCES) -> tuple[jax.Array, jax.Array]:
    """Encode batched streams.

    s: uint8 (N, n). Returns (slots uint8 (N, slot_width(n)), csizes int32
    (N,)). A row's encoding is a conforming blosclz stream; rows that do
    not compress simply report csize >= n and the caller applies the
    stored-raw rule (blosc.c:705-714).
    """
    N, n = s.shape
    W = slot_width(n)
    idx = jnp.arange(n, dtype=I32)

    # -- per-stream distance selection (coverage proxy) ---------------------
    def eq_at(d):
        prev = jnp.take(s, jnp.maximum(idx - d, 0), axis=1)
        return (s == prev) & (idx >= d) & (idx < n - 1)  # last byte literal

    covs = []
    for d in dists:
        e = eq_at(jnp.int32(d))
        covs.append(jnp.sum(e[:, 2:] & e[:, 1:-1] & e[:, :-2], axis=1))
    best = jnp.argmin(-jnp.stack(covs, 0), axis=0)       # first max wins
    d_row = jnp.asarray(dists, I32)[best][:, None]       # (N, 1)

    # -- match detection at the chosen distance -----------------------------
    prev = jnp.take_along_axis(s, jnp.maximum(idx - d_row, 0), axis=1)
    eq = (s == prev) & (idx >= d_row) & (idx < n - 1)

    noneq = jnp.where(eq, -1, idx)
    run_start = jax.lax.cummax(noneq, axis=1) + 1
    nxt = jnp.where(eq, n, idx)
    next_noneq = jnp.flip(jax.lax.cummin(jnp.flip(nxt, 1), axis=1), 1)
    runlen = next_noneq - run_start              # maximal run length at eq pos

    is_match = eq & (runlen >= 3)
    # demote 1-2 byte tails of long runs (SUBMAX split remainder) to literals
    roff = idx - run_start
    tail_rem = runlen % SUBMAX
    short_tail = (tail_rem > 0) & (tail_rem < 3)
    eff_len = jnp.where(short_tail, runlen - tail_rem, runlen)
    is_match &= roff < eff_len

    suboff = roff % SUBMAX
    sub_start = is_match & (suboff == 0)
    sub_len = jnp.minimum(SUBMAX, eff_len - (roff - suboff))
    v = sub_len - 3                              # wire len field: mlen = v + 3
    kext = jnp.where(v >= 6, (v - 6) // 255 + 1, 0)      # extension bytes
    tok_size = 2 + kext                          # token + ext... + dist_lo

    # -- literal segmentation ------------------------------------------------
    lit = ~is_match
    nonlit = jnp.where(lit, -1, idx)
    lit_start = jax.lax.cummax(nonlit, axis=1) + 1
    lit_off = idx - lit_start
    is_ctrl = lit & (lit_off % 32 == 0)
    nxtl = jnp.where(lit, n, idx)
    next_nonlit = jnp.flip(jax.lax.cummin(jnp.flip(nxtl, 1), axis=1), 1)
    chunk_len = jnp.minimum(32, next_nonlit - idx)       # at ctrl positions

    # -- output layout (exclusive scan replaces the reference's mutex
    #    reservation protocol, blosc.c:1843-1861) ----------------------------
    c = (jnp.where(lit, 1 + is_ctrl.astype(I32), 0)
         + jnp.where(sub_start, tok_size, 0))
    off = _excl_cumsum(c)
    csize = off[:, -1] + c[:, -1]

    # -- emission: batched scatters into flat slots --------------------------
    base = (jnp.arange(N, dtype=I32) * W)[:, None]
    flat = jnp.zeros((N * W,), U8)
    oob = jnp.int32(N * W)

    def scat(buf, mask, pos, val):
        gi = jnp.where(mask, base + pos, oob).reshape(-1)
        vv = jnp.broadcast_to(val.astype(U8), mask.shape).reshape(-1)
        return buf.at[gi].set(vv, mode="drop")

    flat = scat(flat, is_ctrl, off, chunk_len - 1)
    flat = scat(flat, lit, off + is_ctrl.astype(I32), s)
    dm1 = d_row - 1
    dhi, dlo = dm1 >> 8, dm1 & 255
    tok0 = jnp.where(v < 6, (v + 1) << 5, 7 << 5) | dhi
    flat = scat(flat, sub_start, off, tok0)
    for j in range(1, _EXT + 1):                 # length-extension bytes
        ext_j = jnp.clip(v - 6 - 255 * (j - 1), 0, 255)
        flat = scat(flat, sub_start & (kext >= j), off + j, ext_j)
    flat = scat(flat, sub_start, off + 1 + kext, dlo)
    slots = flat.reshape(N, W)
    slots = slots.at[:, 0].set(slots[:, 0] | 32)         # format marker bit
    return slots, csize


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def _decode_one(src: jax.Array, csize: jax.Array, out_len: int, extw: int):
    """Decode one stream. src rows are zero past csize (so bounded window
    reads past the stream parse as zeros, never as a neighbour's bytes).

    Returns (out uint8 (out_len,), produced int32, err bool).
    """
    W = src.shape[0]
    out0 = jnp.zeros(out_len + _MATW, U8)
    srci = src.astype(I32)
    lit_t = jnp.arange(_LITW, dtype=I32)
    mat_t = jnp.arange(_MATW, dtype=I32)
    ext_t = jnp.arange(extw, dtype=I32)

    def tok_at(ip):
        return jax.lax.dynamic_index_in_dim(srci, ip, keepdims=False)

    # loop state: (out, ip, op, token, rem=match bytes pending, back, err, fin)
    def cond2(st):
        return ~(st[6] | st[7])

    def body2(st):
        out, ip, op, token, rem, back, err, fin = st

        def match_branch(a):
            out, ip, op, token, rem, back, err, fin = a
            chunk = jnp.minimum(_MATW, rem)
            period = jnp.maximum(back, 1)
            src_pos = jnp.clip(op - back + (mat_t % period), 0, out_len + _MATW - 1)
            vals = jnp.take(out, src_pos)
            cur = jax.lax.dynamic_slice(out, (op,), (_MATW,))
            neu = jnp.where(mat_t < chunk, vals, cur)
            out = jax.lax.dynamic_update_slice(out, neu, (op,))
            return out, ip, op + chunk, token, rem - chunk, back, err, fin

        def lit_branch(a):
            out, ip, op, token, rem, back, err, fin = a
            llen = token + 1
            vals = jax.lax.dynamic_slice(srci, (jnp.minimum(ip, W - _LITW),),
                                         (_LITW,))
            shift = ip - jnp.minimum(ip, W - _LITW)
            vals = jnp.take(vals, jnp.minimum(lit_t + shift, _LITW - 1)).astype(U8)
            op_c = jnp.minimum(op, out_len + _MATW - _LITW)
            cur = jax.lax.dynamic_slice(out, (op_c,), (_LITW,))
            neu = jnp.where(lit_t < llen, vals, cur)
            out = jax.lax.dynamic_update_slice(out, neu, (op_c,))
            ip2 = ip + llen
            op2 = op + llen
            err = err | (op2 > out_len) | (ip2 > csize) | (op_c != op)
            fin = ip2 >= csize
            tok2 = tok_at(jnp.minimum(ip2, W - 1))
            return out, jnp.where(fin, ip2, ip2 + 1), op2, tok2, rem, back, err, fin

        def tok_branch(a):
            out, ip, op, token, rem, back, err, fin = a
            mbase = (token >> 5) - 1
            ip_c = jnp.minimum(ip, W - extw)
            w = jax.lax.dynamic_slice(srci, (ip_c,), (extw,))
            w = jnp.take(w, jnp.minimum(ext_t + (ip - ip_c), extw - 1))
            lead = jnp.cumprod((w == 255).astype(I32))
            k255 = jnp.sum(lead)
            lastb = jnp.take(w, jnp.minimum(k255, extw - 1))
            has_ext = mbase == 6
            mlen = jnp.where(has_ext, 6 + 255 * k255 + lastb, mbase) + 3
            ip2 = ip + jnp.where(has_ext, k255 + 1, 0)
            dhi = token & 31
            dlo = tok_at(jnp.minimum(ip2, W - 1))
            ip3 = ip2 + 1
            far = (dlo == 255) & (dhi == 31)
            b1 = tok_at(jnp.minimum(ip3, W - 1))
            b2 = tok_at(jnp.minimum(ip3 + 1, W - 1))
            bk = jnp.where(far, (b1 << 8) + b2 + 8191 + 1, (dhi << 8) + dlo + 1)
            ip4 = ip3 + jnp.where(far, 2, 0)
            err = err | (bk > op) | (op + mlen > out_len) | (ip4 >= csize)
            tok2 = tok_at(jnp.minimum(ip4, W - 1))
            return out, ip4 + 1, op, tok2, mlen, bk, err, fin

        return jax.lax.cond(
            rem > 0, match_branch,
            lambda a: jax.lax.cond(a[3] < 32, lit_branch, tok_branch, a),
            (out, ip, op, token, rem, back, err, fin),
        )

    out, ip, op, token, rem, back, err, fin = jax.lax.while_loop(
        cond2, body2, (out0, jnp.int32(1), jnp.int32(0), srci[0] & 31,
                       jnp.int32(0), jnp.int32(1), csize <= 0, csize <= 1)
    )
    err = err | (rem > 0)
    return out[:out_len], op, err


@partial(jax.jit, static_argnums=2)
def decode(slots: jax.Array, csizes: jax.Array, out_len: int):
    """Decode batched blosclz streams.

    slots: uint8 (N, W), each row's stream in its first csizes[i] bytes,
    zero beyond. Returns (out uint8 (N, out_len), produced int32 (N,),
    err bool (N,)).
    """
    # length-extension window sized for the longest legal match (~out_len)
    extw = min(max(out_len // 255 + 2, 8), 4200)
    return jax.vmap(_decode_one, in_axes=(0, 0, None, None))(
        slots, csizes, out_len, extw
    )
