"""BloscLZ codec — pure-Python/numpy reference implementation.

BloscLZ is the in-house LZ77 codec of the reference (blosc/blosclz.c, a
FastLZ descendant). This module is the *oracle* implementation: exact wire
format, used for tests and as fallback; the fast paths live in the native
C++ engine (cblosc_tpu/native) and the TPU encoder (cblosc_tpu/tpu).

Token stream format (derived from blosclz.c:246-314 encode macros and
blosclz.c:679-789 decoder):

  * first byte: low 5 bits are the first token's literal-run control; the
    top 3 bits carry a codec marker (bit 5 set on encode, masked on decode).
  * literal token: ctrl < 32 encodes a run of ``ctrl + 1`` literal bytes
    that follow in the stream.
  * match token: ctrl >= 32. ``L = ctrl >> 5`` and ``Dhi = ctrl & 31``.
      - L in 1..6: copy length = L + 2.
      - L == 7: extension bytes follow, each added to the length, chain
        continues while a byte equals 255; copy length = 6 + sum + 3.
    Next byte Dlo. Back distance = (Dhi << 8) + Dlo + 1.
      - Far match: when Dlo == 255 and Dhi == 31, two more big-endian bytes
        D16 follow and back distance = D16 + 8191 + 1.
    A back distance of 1 is a run (RLE) of the previous output byte.
  * after every match the stream continues with another token; a valid
    stream always terminates with a literal token (the encoder guarantees
    at least ``ipshift`` trailing literals).

Length/distance limits: MAX_COPY=32 literals per token, biased distances
< 8191 (near) / < 73725 (far), matches may not be the final token.
"""

from __future__ import annotations

import numpy as np

MAX_COPY = 32
MAX_DISTANCE = 8191
MAX_FARDISTANCE = 65535 + MAX_DISTANCE - 1  # 73725
HASH_LOG = 14
HASH_LOG2 = 12

# clevel -> minimum estimated ratio for the entropy probe (blosclz.c:432).
_CRATIO_MIN = (0.0, 2.0, 1.5, 1.2, 1.2, 1.2, 1.2, 1.15, 1.1, 1.0)
# clevel -> hash table log2 size (blosclz.c:459-461).
_HASHLOG = (0, HASH_LOG - 2, HASH_LOG - 1, HASH_LOG, HASH_LOG,
            HASH_LOG, HASH_LOG, HASH_LOG, HASH_LOG, HASH_LOG)

_HASH_MULT = 2654435761


def _u32(a: np.ndarray, i: int) -> int:
    return int(a[i]) | int(a[i + 1]) << 8 | int(a[i + 2]) << 16 | int(a[i + 3]) << 24


def _common_prefix(a: np.ndarray, i: int, j: int, limit: int) -> int:
    """Length of the common prefix of a[i:] and a[j:], at most `limit`."""
    if limit <= 0:
        return 0
    d = a[i:i + limit] != a[j:j + limit]
    hit = np.argmax(d)
    if d[hit]:
        return int(hit)
    return limit


def _run_length(a: np.ndarray, j: int, x: int, limit: int) -> int:
    """Length of the run of byte value x in a[j:], at most `limit`."""
    if limit <= 0:
        return 0
    d = a[j:j + limit] != x
    hit = np.argmax(d)
    if d[hit]:
        return int(hit)
    return limit


def _scan(src: np.ndarray, ip: int, ip_bound: int, ref: int, run: bool) -> int:
    """Extend a match/run; returns the new input cursor.

    Mirrors the asymmetric termination of the reference scanners
    (blosclz.c:117-213): a match scan steps one past the mismatching byte,
    a run scan stops exactly at the first non-run byte; both never pass
    ip_bound.
    """
    if run:
        x = int(src[ip - 1])
        n = _run_length(src, ref, x, ip_bound - ip)
        return ip + n
    limit = ip_bound - ip
    m = _common_prefix(src, ip, ref, limit)
    return ip + m + 1 if m < limit else ip_bound


def compress(clevel: int, src, maxout: int, split_block: bool) -> bytes:
    """Compress one split stream. Returns b"" when incompressible
    (the engine then stores the stream raw, blosc.c:705-714).
    """
    a = np.frombuffer(bytes(src), dtype=np.uint8)
    length = a.size
    if length < 16 or maxout < 66:
        return b""

    cratio = _probe_cratio(a, length // 4, 3, 3)
    if cratio < _CRATIO_MIN[clevel]:
        return b""

    # Shift/minlen selection (blosclz.c:445-457): best effort for unsplit
    # blocks and low-entropy buffers.
    if (not split_block) or cratio < 4:
        ipshift = minlen = 3
    else:
        ipshift = minlen = 4

    hashlog = _HASHLOG[clevel]
    hshift = 32 - hashlog
    htab = np.zeros(1 << hashlog, dtype=np.int64)

    out = bytearray()
    emit = out.append
    ip = 4
    ip_bound = length - 1
    ip_limit = length - 12

    # Opening literal run: control placeholder + first 4 bytes.
    emit(MAX_COPY - 1)
    out += a[:4].tobytes()
    copy = 4

    def flush_ctrl() -> bool:
        """Patch the pending literal-control byte before a match."""
        nonlocal copy
        if copy:
            out[-copy - 1] = copy - 1
        else:
            out.pop()
        copy = 0
        return True

    while ip < ip_limit:
        anchor = ip
        seq = _u32(a, ip)
        hval = ((seq * _HASH_MULT) & 0xFFFFFFFF) >> hshift
        ref = int(htab[hval])
        distance = anchor - ref
        htab[hval] = anchor

        if distance == 0 or distance >= MAX_FARDISTANCE or _u32(a, ref) != seq:
            # Single literal byte, then retry at the next position.
            if len(out) + 2 > maxout:
                return b""
            emit(int(a[anchor]))
            ip = anchor + 1
            copy += 1
            if copy == MAX_COPY:
                copy = 0
                emit(MAX_COPY - 1)
            continue

        ip = anchor + 4
        distance -= 1  # biased: 0 means a run
        ip = _scan(a, ip, ip_bound, ref + 4, distance == 0)
        ip -= ipshift
        mlen = ip - anchor

        if mlen < minlen or (mlen <= 5 and distance >= MAX_DISTANCE):
            if len(out) + 2 > maxout:
                return b""
            emit(int(a[anchor]))
            ip = anchor + 1
            copy += 1
            if copy == MAX_COPY:
                copy = 0
                emit(MAX_COPY - 1)
            continue

        flush_ctrl()

        if distance < MAX_DISTANCE:
            if mlen < 7:
                if len(out) + 2 > maxout:
                    return b""
                emit((mlen << 5) + (distance >> 8))
                emit(distance & 255)
            else:
                rem = mlen - 7
                if len(out) + 2 + rem // 255 + 2 > maxout:
                    return b""
                emit((7 << 5) + (distance >> 8))
                while rem >= 255:
                    emit(255)
                    rem -= 255
                emit(rem)
                emit(distance & 255)
        else:
            dfar = distance - MAX_DISTANCE
            if mlen < 7:
                if len(out) + 4 > maxout:
                    return b""
                emit((mlen << 5) + 31)
                emit(255)
                emit(dfar >> 8)
                emit(dfar & 255)
            else:
                rem = mlen - 7
                if len(out) + 4 + rem // 255 + 1 > maxout:
                    return b""
                emit((7 << 5) + 31)
                while rem >= 255:
                    emit(255)
                    rem -= 255
                emit(rem)
                emit(255)
                emit(dfar >> 8)
                emit(dfar & 255)

        # Refresh hashes at the match boundary (blosclz.c:567-580). At max
        # level a second (3-byte) hash is inserted as well.
        seq = _u32(a, ip)
        hval = ((seq * _HASH_MULT) & 0xFFFFFFFF) >> hshift
        htab[hval] = ip
        ip += 1
        if clevel == 9:
            seq >>= 8
            hval = ((seq * _HASH_MULT) & 0xFFFFFFFF) >> hshift
            htab[hval] = ip
        ip += 1

        if len(out) + 1 > maxout:
            return b""
        emit(MAX_COPY - 1)  # placeholder: assume literals follow

    # Trailing bytes are always literals.
    while ip <= ip_bound:
        if len(out) + 2 > maxout:
            return b""
        emit(int(a[ip]))
        ip += 1
        copy += 1
        if copy == MAX_COPY:
            copy = 0
            emit(MAX_COPY - 1)
    if copy:
        out[-copy - 1] = copy - 1
    else:
        out.pop()

    out[0] |= 1 << 5  # codec marker bit
    return bytes(out)


def _probe_cratio(a: np.ndarray, maxlen: int, minlen: int, ipshift: int) -> float:
    """Entropy probe: estimate the ratio on the last quarter of the buffer
    with a small 12-bit hash table (blosclz.c:318-418). Cheap bail-out for
    incompressible data.
    """
    base = a.size - maxlen
    probe = a[base:]
    hashlen = 1 << HASH_LOG2
    limit = min(maxlen, hashlen)
    ip_bound = limit - 1
    ip_limit = limit - 12
    htab = np.zeros(hashlen, dtype=np.int64)

    oc = 5
    copy = 4
    ip = 0
    while ip < ip_limit:
        anchor = ip
        seq = _u32(probe, ip)
        hval = ((seq * _HASH_MULT) & 0xFFFFFFFF) >> (32 - HASH_LOG2)
        ref = int(htab[hval])
        distance = anchor - ref
        htab[hval] = anchor

        matched = (
            distance != 0
            and distance < MAX_FARDISTANCE
            and _u32(probe, ref) == seq
        )
        if not matched:
            oc += 1
            ip = anchor + 1
            copy += 1
            if copy == MAX_COPY:
                copy = 0
                oc += 1
            continue

        ip = anchor + 4
        distance -= 1
        ip = _scan(probe, ip, ip_bound, ref + 4, distance == 0)
        ip -= ipshift
        mlen = ip - anchor
        if mlen < minlen:
            oc += 1
            ip = anchor + 1
            copy += 1
            if copy == MAX_COPY:
                copy = 0
                oc += 1
            continue

        if not copy:
            oc -= 1
        copy = 0
        if mlen >= 7:
            oc += (mlen - 7) // 255 + 1
        oc += 2 if distance < MAX_DISTANCE else 4

        seq = _u32(probe, ip)
        hval = ((seq * _HASH_MULT) & 0xFFFFFFFF) >> (32 - HASH_LOG2)
        htab[hval] = ip
        ip += 2
        oc += 1

    return ip / oc


def decompress(src, maxout: int) -> bytes:
    """Decompress one split stream; raises ValueError on malformed input.

    Semantics match blosclz_decompress (blosclz.c:679-789), including the
    guard that a stream must not terminate on a match token.
    """
    s = np.frombuffer(bytes(src), dtype=np.uint8)
    n = s.size
    if n == 0:
        return b""
    out = np.empty(maxout, dtype=np.uint8)
    op = 0
    token = int(s[0]) & 31
    ip = 1

    while True:
        if token >= 32:
            mlen = (token >> 5) - 1
            dhi = token & 31
            if mlen == 6:  # extended length chain
                while True:
                    if ip + 1 >= n:
                        raise ValueError("truncated match length")
                    c = int(s[ip]); ip += 1
                    mlen += c
                    if c != 255:
                        break
            else:
                if ip + 1 >= n:
                    raise ValueError("truncated match")
            dlo = int(s[ip]); ip += 1
            mlen += 3
            back = (dhi << 8) + dlo + 1
            if dlo == 255 and dhi == 31:
                if ip + 1 >= n:
                    raise ValueError("truncated far distance")
                back = (int(s[ip]) << 8) + int(s[ip + 1]) + MAX_DISTANCE + 1
                ip += 2
            if op + mlen > maxout:
                raise ValueError("output overflow")
            if back > op:
                raise ValueError("match before start of output")
            if ip >= n:
                break  # stream may not end on a match
            token = int(s[ip]); ip += 1

            ref = op - back
            if back == 1:
                out[op:op + mlen] = out[ref]
            elif back >= mlen:
                out[op:op + mlen] = out[ref:ref + mlen]
            else:
                reps = -(-mlen // back)
                out[op:op + mlen] = np.tile(out[ref:op], reps)[:mlen]
            op += mlen
        else:
            llen = token + 1
            if op + llen > maxout:
                raise ValueError("output overflow")
            if ip + llen > n:
                raise ValueError("truncated literals")
            out[op:op + llen] = s[ip:ip + llen]
            op += llen
            ip += llen
            if ip >= n:
                break
            token = int(s[ip]); ip += 1

    return out[:op].tobytes()
