"""Header serialization / parsing / introspection tests
(reference analog: test_api.c cbuffer checks and the header spec in
README_CHUNK_FORMAT.rst)."""

import pytest

import cblosc_tpu as b
from cblosc_tpu.format import constants as C
from cblosc_tpu.format.header import ChunkHeader, FormatError, validate_header


def test_header_roundtrip():
    hdr = ChunkHeader(2, 1, 0x31, 4, 4000, 1024, 777)
    enc = hdr.encode()
    assert len(enc) == 16
    dec = ChunkHeader.decode(enc)
    assert dec == hdr


def test_header_fields_little_endian():
    hdr = ChunkHeader(2, 1, 0x21, 8, 0x01020304, 0x11121314, 0x21222324)
    enc = hdr.encode()
    assert enc[0] == 2 and enc[1] == 1 and enc[2] == 0x21 and enc[3] == 8
    assert enc[4:8] == bytes([0x04, 0x03, 0x02, 0x01])
    assert enc[8:12] == bytes([0x14, 0x13, 0x12, 0x11])
    assert enc[12:16] == bytes([0x24, 0x23, 0x22, 0x21])


def test_flags_decode():
    chunk = b.compress_ctx(5, C.SHUFFLE, 4, bytes(4096), compressor="lz4")
    hdr = ChunkHeader.decode(chunk)
    assert hdr.doshuffle and not hdr.dobitshuffle
    assert hdr.compcode in (C.LZ4, C.LZ4HC)
    assert hdr.compname == "lz4"


def test_cbuffer_introspection():
    data = bytes(range(256)) * 16
    chunk = b.compress_ctx(5, C.SHUFFLE, 4, data, compressor="blosclz")
    nbytes, cbytes, blocksize = b.cbuffer_sizes(chunk)
    assert nbytes == len(data)
    assert cbytes == len(chunk)
    assert blocksize > 0
    typesize, flags = b.cbuffer_metainfo(chunk)
    assert typesize == 4
    assert flags & C.DOSHUFFLE
    version, versionlz = b.cbuffer_versions(chunk)
    assert version == C.VERSION_FORMAT
    assert versionlz == 1
    assert b.cbuffer_complib(chunk) == "BloscLZ"
    assert b.cbuffer_validate(chunk) == len(data)


def test_cbuffer_validate_rejects_truncation():
    chunk = b.compress_ctx(5, 1, 4, bytes(4096))
    with pytest.raises(FormatError):
        b.cbuffer_validate(chunk[:-1])


def test_future_version_rejected():
    chunk = bytearray(b.compress_ctx(5, 1, 4, bytes(4096)))
    chunk[0] = 99
    with pytest.raises(FormatError):
        b.decompress_ctx(bytes(chunk))


def test_reserved_flag_rejected():
    chunk = bytearray(b.compress_ctx(5, 1, 4, bytes(4096)))
    chunk[2] |= C.FLAG_RESERVED
    with pytest.raises(FormatError):
        b.decompress_ctx(bytes(chunk))


def test_validate_header_bstarts_bounds():
    hdr = ChunkHeader(2, 1, 0x10, 1, 10_000_000, 1024, 100)
    with pytest.raises(FormatError):
        validate_header(hdr)


def test_short_buffer_rejected():
    with pytest.raises(FormatError):
        ChunkHeader.decode(b"\x02\x01")
