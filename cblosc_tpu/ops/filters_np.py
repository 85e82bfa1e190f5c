"""NumPy reference implementations of the Blosc filters.

These play the role of the reference's "generic" scalar kernels
(shuffle-generic.h:32-81, bitshuffle-generic.c:13-220): a portable oracle
against which the accelerated implementations (Pallas TPU kernels in
``cblosc_tpu.tpu.filters`` and the native C++ kernels) are cross-validated,
exactly as the reference cross-checks generic vs SSE2/AVX2
(tests/test_shuffle_roundtrip_sse2.c:44-66).

Block-level semantics (including leftover handling) follow
blosc/shuffle.c:367-443:
  * byte-shuffle: transpose the ``blocksize // typesize`` complete elements
    into typesize byte-planes; trailing ``blocksize % typesize`` bytes are
    copied through unfiltered.
  * bit-shuffle: operates on the complete elements only when their count is
    a multiple of 8; otherwise the whole block passes through unfiltered.
    Trailing bytes (incomplete element) are copied through.
"""

from __future__ import annotations

import numpy as np

_BITS = np.arange(8, dtype=np.uint8)


def _as_u8(buf) -> np.ndarray:
    a = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    return np.ascontiguousarray(a.view(np.uint8).ravel())


# --------------------------------------------------------------------------
# Byte shuffle
# --------------------------------------------------------------------------

def shuffle(typesize: int, block: bytes | np.ndarray) -> np.ndarray:
    """Byte-transpose: out[j*nel + i] = in[i*typesize + j]."""
    src = _as_u8(block)
    n = src.size
    if typesize <= 1:
        return src.copy()
    nel = n // typesize
    rem = n % typesize
    body = src[: nel * typesize].reshape(nel, typesize)
    out = np.empty(n, dtype=np.uint8)
    out[: nel * typesize] = body.T.reshape(-1)
    if rem:
        out[nel * typesize:] = src[nel * typesize:]
    return out


def unshuffle(typesize: int, block: bytes | np.ndarray) -> np.ndarray:
    src = _as_u8(block)
    n = src.size
    if typesize <= 1:
        return src.copy()
    nel = n // typesize
    rem = n % typesize
    body = src[: nel * typesize].reshape(typesize, nel)
    out = np.empty(n, dtype=np.uint8)
    out[: nel * typesize] = body.T.reshape(-1)
    if rem:
        out[nel * typesize:] = src[nel * typesize:]
    return out


# --------------------------------------------------------------------------
# Bit shuffle
# --------------------------------------------------------------------------
#
# For ``size`` elements of ``typesize`` bytes (size % 8 == 0), the output is
# organized as typesize*8 bit-rows of size/8 bytes each:
#
#   out[(j*8 + k) * size//8 + m] byte holds, at bit position i (LSB-first),
#   bit k of byte j of element 8*m + i.
#
# This reproduces the 3-stage pipeline of the reference
# (byte-elem transpose -> 8x8 bit transpose -> bitrow regroup,
# bitshuffle-generic.c:44-139) as a single vectorized bit transpose.

def _bitshuffle_core(src: np.ndarray, typesize: int) -> np.ndarray:
    size = src.size // typesize
    elems = src.reshape(size, typesize)
    # bits[i, j, k] = bit k of byte j of element i (LSB-first)
    bits = (elems[:, :, None] >> _BITS) & 1
    # -> [j, k, m, i] then pack i (LSB-first) into bytes
    bt = bits.transpose(1, 2, 0).reshape(typesize, 8, size // 8, 8)
    packed = (bt << _BITS).sum(axis=-1, dtype=np.uint16).astype(np.uint8)
    return packed.reshape(-1)


def _bitunshuffle_core(src: np.ndarray, typesize: int) -> np.ndarray:
    size = src.size // typesize
    rows = src.reshape(typesize, 8, size // 8)
    # bits[j, k, m, i] = bit i of rows[j, k, m]
    bits = (rows[:, :, :, None] >> _BITS) & 1
    # -> [m, i, j, k]: element index = 8*m + i
    bt = bits.transpose(2, 3, 0, 1).reshape(size, typesize, 8)
    packed = (bt << _BITS).sum(axis=-1, dtype=np.uint16).astype(np.uint8)
    return packed.reshape(-1)


def bitshuffle(typesize: int, block: bytes | np.ndarray) -> np.ndarray:
    src = _as_u8(block)
    n = src.size
    size = n // typesize
    if size % 8 != 0:
        # Unsupported geometry: pass through (shuffle.c:412-414).
        return src.copy()
    out = np.empty(n, dtype=np.uint8)
    body = size * typesize
    out[:body] = _bitshuffle_core(src[:body], typesize)
    out[body:] = src[body:]  # leftover bytes copied through (shuffle.c:407-409)
    return out


def bitunshuffle(typesize: int, block: bytes | np.ndarray) -> np.ndarray:
    src = _as_u8(block)
    n = src.size
    size = n // typesize
    if size % 8 != 0:
        return src.copy()
    out = np.empty(n, dtype=np.uint8)
    body = size * typesize
    out[:body] = _bitunshuffle_core(src[:body], typesize)
    out[body:] = src[body:]
    return out


def apply_filter(doshuffle: int, typesize: int, block) -> np.ndarray:
    from ..format import constants as C

    if doshuffle == C.SHUFFLE and typesize > 1:
        return shuffle(typesize, block)
    if doshuffle == C.BITSHUFFLE and len(block) >= typesize:
        return bitshuffle(typesize, block)
    return _as_u8(block).copy()


def undo_filter(doshuffle: int, typesize: int, block) -> np.ndarray:
    from ..format import constants as C

    if doshuffle == C.SHUFFLE and typesize > 1:
        return unshuffle(typesize, block)
    if doshuffle == C.BITSHUFFLE and len(block) >= typesize:
        return bitunshuffle(typesize, block)
    return _as_u8(block).copy()
