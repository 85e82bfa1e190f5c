"""Blosc chunk-format constants.

These mirror the public constants of the reference C library so that chunks
produced by this framework are bit-compatible with c-blosc 1.x consumers and
vice versa (reference: blosc/blosc.h:20-117, README_CHUNK_FORMAT.rst:14-96).

The values are part of the *serialized format contract* (they appear in chunk
headers on disk), hence they are fixed by the format spec, not by this
implementation.
"""

from __future__ import annotations

KB = 1024
MB = 1024 * KB

# --- Library version (this framework) -------------------------------------
VERSION_STRING = "1.21.7-tpu.0.1.0"
VERSION_DATE = "2026-08-16"

# --- Format versions (blosc.h:29,104-109) ----------------------------------
VERSION_FORMAT = 2          # Blosc chunk format version we emit/accept
BLOSCLZ_VERSION_FORMAT = 1
LZ4_VERSION_FORMAT = 1
LZ4HC_VERSION_FORMAT = 1
SNAPPY_VERSION_FORMAT = 1
ZLIB_VERSION_FORMAT = 1
ZSTD_VERSION_FORMAT = 1

# --- Size limits (blosc.h:32-51) -------------------------------------------
MIN_HEADER_LENGTH = 16
MAX_OVERHEAD = MIN_HEADER_LENGTH
MAX_BUFFERSIZE = 2**31 - 1 - MAX_OVERHEAD  # INT_MAX - 16
MAX_TYPESIZE = 255
MAX_BLOCKSIZE = 2**31 - 1 - MAX_TYPESIZE - MAX_OVERHEAD - 4  # see blosc.h:47
MAX_THREADS = 256

# Minimum buffer size to attempt compression at all (blosc.c:73).
MIN_BUFFERSIZE = 128
# Maximum number of per-block splits (blosc.c:76).
MAX_SPLITS = 16
# Assumed L1 cache size driving the blocksize heuristic (blosc.c:79).
L1 = 32 * KB

# --- Shuffle selectors (blosc.h:54-56) --------------------------------------
NOSHUFFLE = 0
SHUFFLE = 1
BITSHUFFLE = 2

# --- Header flag bits (blosc.h:59-61, README_CHUNK_FORMAT.rst:38-54) --------
DOSHUFFLE = 0x01     # byte-shuffle applied
MEMCPYED = 0x02      # buffer stored verbatim (no codec, no filter)
DOBITSHUFFLE = 0x04  # bit-shuffle applied
FLAG_RESERVED = 0x08  # must be zero; set => chunk from the future
DONT_SPLIT = 0x10    # blocks were NOT split into typesize sub-streams

# --- Compressor enumeration (blosc.h:64-69) ---------------------------------
BLOSCLZ = 0
LZ4 = 1
LZ4HC = 2
SNAPPY = 3
ZLIB = 4
ZSTD = 5

COMPNAMES = {
    BLOSCLZ: "blosclz",
    LZ4: "lz4",
    LZ4HC: "lz4hc",
    SNAPPY: "snappy",
    ZLIB: "zlib",
    ZSTD: "zstd",
}
COMPCODES = {name: code for code, name in COMPNAMES.items()}

# --- Compression library codes / names (blosc.h:80-91) ----------------------
BLOSCLZ_LIB = 0
LZ4_LIB = 1
SNAPPY_LIB = 2
ZLIB_LIB = 3
ZSTD_LIB = 4

LIBNAMES = {
    BLOSCLZ_LIB: "BloscLZ",
    LZ4_LIB: "LZ4",
    SNAPPY_LIB: "Snappy",
    ZLIB_LIB: "Zlib",
    ZSTD_LIB: "Zstd",
}

# Wire "compformat" values stored in flag bits 5-7 (blosc.h:94-99).
# LZ4 and LZ4HC share a format code; the distinction is not recoverable from
# the header (matches reference behavior).
COMPFORMATS = {
    BLOSCLZ: BLOSCLZ_LIB,
    LZ4: LZ4_LIB,
    LZ4HC: LZ4_LIB,
    SNAPPY: SNAPPY_LIB,
    ZLIB: ZLIB_LIB,
    ZSTD: ZSTD_LIB,
}
# compformat -> canonical compressor code for decoding.
FORMAT_TO_COMPCODE = {
    BLOSCLZ_LIB: BLOSCLZ,
    LZ4_LIB: LZ4,
    SNAPPY_LIB: SNAPPY,
    ZLIB_LIB: ZLIB,
    ZSTD_LIB: ZSTD,
}
FORMAT_VERSIONS = {
    BLOSCLZ_LIB: BLOSCLZ_VERSION_FORMAT,
    LZ4_LIB: LZ4_VERSION_FORMAT,
    SNAPPY_LIB: SNAPPY_VERSION_FORMAT,
    ZLIB_LIB: ZLIB_VERSION_FORMAT,
    ZSTD_LIB: ZSTD_VERSION_FORMAT,
}

CLIB_OF_COMPCODE = {
    BLOSCLZ: BLOSCLZ_LIB,
    LZ4: LZ4_LIB,
    LZ4HC: LZ4_LIB,
    SNAPPY: SNAPPY_LIB,
    ZLIB: ZLIB_LIB,
    ZSTD: ZSTD_LIB,
}

# --- Split modes (blosc.h:111-117) -------------------------------------------
ALWAYS_SPLIT = 1
NEVER_SPLIT = 2
AUTO_SPLIT = 3
FORWARD_COMPAT_SPLIT = 4

SPLITMODE_NAMES = {
    "ALWAYS": ALWAYS_SPLIT,
    "NEVER": NEVER_SPLIT,
    "AUTO": AUTO_SPLIT,
    "FORWARD_COMPAT": FORWARD_COMPAT_SPLIT,
}

# Error codes (negative returns of the reference API).
ERR_FUTURE_FORMAT = -1
ERR_NO_CODEC_SUPPORT = -5
ERR_VERSION_MISMATCH = -9
ERR_BAD_ARG = -10
