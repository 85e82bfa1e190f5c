"""Blosc chunk header serialization, parsing, validation and introspection.

Wire layout (16 bytes, all multi-byte fields little-endian), per
README_CHUNK_FORMAT.rst:14-96 and the reference writer/parser
(blosc/blosc.c:1148-1247 and blosc/blosc.c:1452-1508):

    byte 0   version        (chunk format version, currently 2)
    byte 1   versionlz      (inner codec format version)
    byte 2   flags          (shuffle/memcpy/bitshuffle/dont-split bits 0..4,
                             compformat enumeration in bits 5..7)
    byte 3   typesize
    bytes 4  nbytes   (u32) uncompressed size
    bytes 8  blocksize(u32)
    bytes 12 cbytes   (u32) compressed size including this header

Followed (unless MEMCPYED) by ``int32 bstarts[nblocks]`` holding the byte
offset of each encoded block counted from the start of the chunk.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from . import constants as C

_HDR = struct.Struct("<BBBBiii")


class FormatError(ValueError):
    """A malformed, truncated, or future-versioned chunk."""


@dataclass(frozen=True)
class ChunkHeader:
    version: int
    versionlz: int
    flags: int
    typesize: int
    nbytes: int
    blocksize: int
    cbytes: int

    # -- flag accessors -------------------------------------------------
    @property
    def doshuffle(self) -> bool:
        return bool(self.flags & C.DOSHUFFLE)

    @property
    def dobitshuffle(self) -> bool:
        return bool(self.flags & C.DOBITSHUFFLE)

    @property
    def memcpyed(self) -> bool:
        return bool(self.flags & C.MEMCPYED)

    @property
    def dont_split(self) -> bool:
        return bool(self.flags & C.DONT_SPLIT)

    @property
    def compformat(self) -> int:
        return (self.flags & 0xE0) >> 5

    @property
    def compcode(self) -> int:
        try:
            return C.FORMAT_TO_COMPCODE[self.compformat]
        except KeyError:
            raise FormatError(f"unknown compressor format {self.compformat}")

    @property
    def compname(self) -> str:
        return C.COMPNAMES[self.compcode]

    # -- derived block geometry (blosc.c:1484-1487) ----------------------
    @property
    def nblocks(self) -> int:
        if self.blocksize <= 0:
            return 0
        n, rem = divmod(self.nbytes, self.blocksize)
        return n + 1 if rem else n

    @property
    def leftover(self) -> int:
        if self.blocksize <= 0:
            return 0
        return self.nbytes % self.blocksize

    # -- serialization ----------------------------------------------------
    def encode(self) -> bytes:
        return _HDR.pack(
            self.version,
            self.versionlz,
            self.flags,
            self.typesize,
            self.nbytes,
            self.blocksize,
            self.cbytes,
        )

    @classmethod
    def decode(cls, buf: bytes | bytearray | memoryview) -> "ChunkHeader":
        if len(buf) < C.MIN_HEADER_LENGTH:
            raise FormatError(
                f"buffer too short for a chunk header: {len(buf)} < 16"
            )
        fields = _HDR.unpack_from(bytes(buf[:16]))
        return cls(*fields)


def make_flags(
    *,
    doshuffle: int,
    memcpyed: bool,
    dont_split: bool,
    compcode: int,
) -> int:
    """Assemble the flags byte (reference: blosc.c:1219-1244)."""
    flags = 0
    if doshuffle == C.SHUFFLE:
        flags |= C.DOSHUFFLE
    elif doshuffle == C.BITSHUFFLE:
        flags |= C.DOBITSHUFFLE
    if memcpyed:
        flags |= C.MEMCPYED
    if dont_split:
        flags |= C.DONT_SPLIT
    flags |= C.COMPFORMATS[compcode] << 5
    return flags


def validate_header(hdr: ChunkHeader, destsize: int | None = None) -> None:
    """Reject headers the reference rejects (blosc.c:1463-1507).

    Raises FormatError on: future chunk/codec versions, reserved flag bits,
    out-of-range blocksize/typesize, or destination too small.
    """
    if hdr.nbytes == 0:
        return  # empty source: nothing else is validated (blosc.c:1463-1466)
    if (
        hdr.blocksize <= 0
        or hdr.blocksize > C.MAX_BLOCKSIZE
        or hdr.typesize <= 0
        or hdr.typesize > C.MAX_TYPESIZE
    ):
        raise FormatError("header geometry out of range")
    if destsize is not None and hdr.blocksize > destsize:
        raise FormatError("blocksize larger than destination")
    if hdr.version != C.VERSION_FORMAT:
        raise FormatError(f"chunk format version {hdr.version} not supported")
    if hdr.flags & C.FLAG_RESERVED:
        raise FormatError("reserved flag bit set (chunk from the future)")
    if destsize is not None and hdr.nbytes > destsize:
        raise FormatError("destination too small for decompressed data")
    if hdr.memcpyed:
        if hdr.nbytes + C.MAX_OVERHEAD != hdr.cbytes:
            raise FormatError("memcpyed chunk with inconsistent sizes")
    else:
        if hdr.compformat not in C.FORMAT_TO_COMPCODE:
            raise FormatError("unknown compressor format")
        if hdr.versionlz != C.FORMAT_VERSIONS[hdr.compformat]:
            raise FormatError("codec format version mismatch")
        # bstarts[] must fit inside the compressed buffer (blosc.c:1505-1507)
        if hdr.nblocks > (hdr.cbytes - 16) // 4:
            raise FormatError("compressed buffer too small for bstarts")


def read_bstarts(src: bytes | memoryview, nblocks: int) -> list[int]:
    """Read the ``int32 bstarts[nblocks]`` array following the header."""
    if len(src) < 16 + 4 * nblocks:
        raise FormatError("truncated bstarts section")
    return list(struct.unpack_from(f"<{nblocks}i", bytes(src[16:16 + 4 * nblocks])))


# --- cbuffer introspection (blosc.c:2112-2180) -------------------------------

def cbuffer_sizes(cbuffer: bytes) -> tuple[int, int, int]:
    """Return (nbytes, cbytes, blocksize) of a compressed chunk."""
    hdr = ChunkHeader.decode(cbuffer)
    return hdr.nbytes, hdr.cbytes, hdr.blocksize


def cbuffer_metainfo(cbuffer: bytes) -> tuple[int, int]:
    """Return (typesize, flags) where flags only exposes the public bits
    (shuffle / memcpy / bitshuffle), as the reference does (blosc.c:2139-2154).
    """
    hdr = ChunkHeader.decode(cbuffer)
    pub = hdr.flags & (C.DOSHUFFLE | C.MEMCPYED | C.DOBITSHUFFLE)
    return hdr.typesize, pub


def cbuffer_versions(cbuffer: bytes) -> tuple[int, int]:
    hdr = ChunkHeader.decode(cbuffer)
    return hdr.version, hdr.versionlz


def cbuffer_complib(cbuffer: bytes) -> str:
    hdr = ChunkHeader.decode(cbuffer)
    return C.LIBNAMES[hdr.compformat]


def cbuffer_validate(cbuffer: bytes) -> int:
    """Return the expected nbytes if the buffer looks safe to decompress,
    else raise FormatError (mirrors blosc_cbuffer_validate, blosc.c:2129-2136).
    """
    hdr = ChunkHeader.decode(cbuffer)
    if hdr.cbytes != len(cbuffer):
        raise FormatError("stored cbytes does not match actual buffer length")
    return hdr.nbytes
