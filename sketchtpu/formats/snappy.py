"""Snappy codec: raw block format and framing format.

The reference stores .skm (CBOR) and .ski (MessagePack) payloads inside
snappy *framed* streams (snap::write::FrameEncoder,
/root/reference/src/sketch/multisketch.rs:84-95, src/inverted.rs:198-212).
Implemented here from the public format descriptions
(google/snappy format_description.txt and framing_format.txt).

A native C++ fast path is used when available; the pure-Python paths are
complete and used as fallback.
"""

from __future__ import annotations

import ctypes
import struct

from .._native import get_lib

_STREAM_IDENTIFIER = b"\xff\x06\x00\x00sNaPpY"
_CHUNK_COMPRESSED = 0x00
_CHUNK_UNCOMPRESSED = 0x01
_CHUNK_PADDING = 0xFE
_MAX_UNCOMPRESSED_CHUNK = 65536

# --- CRC32C ---

_crc_table = None


def _crc32c_py(data: bytes) -> int:
    global _crc_table
    if _crc_table is None:
        poly = 0x82F63B78
        table = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            table.append(crc)
        _crc_table = table
    crc = 0xFFFFFFFF
    tab = _crc_table
    for b in data:
        crc = tab[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def crc32c(data: bytes) -> int:
    lib = get_lib()
    if lib is not None:
        return lib.stpu_crc32c(data, len(data), 0)
    return _crc32c_py(data)


def _masked_crc(data: bytes) -> int:
    crc = crc32c(data)
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- raw block format ---


def _read_varint(data, pos):
    result = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def decompress_raw(data: bytes) -> bytes:
    """Decompress a snappy raw block."""
    ulen, _pos = _read_varint(data, 0)
    lib = get_lib()
    if lib is not None:
        out = ctypes.create_string_buffer(ulen) if ulen else ctypes.create_string_buffer(1)
        n = lib.stpu_snappy_decompress(data, len(data), out, ulen)
        if n == ctypes.c_size_t(-1).value:
            raise ValueError("malformed snappy block")
        return out.raw[:n]
    return _decompress_raw_py(data)


def _decompress_raw_py(data: bytes) -> bytes:
    ulen, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                length = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            out += data[pos : pos + length]
            pos += length
        else:
            if kind == 1:
                length = ((tag >> 2) & 7) + 4
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[pos : pos + 2], "little")
                pos += 2
            else:
                length = (tag >> 2) + 1
                offset = int.from_bytes(data[pos : pos + 4], "little")
                pos += 4
            if offset == 0 or offset > len(out):
                raise ValueError("bad copy offset")
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != ulen:
        raise ValueError("length mismatch in snappy block")
    return bytes(out)


def compress_raw(data: bytes) -> bytes:
    """Compress to a snappy raw block."""
    lib = get_lib()
    if lib is not None:
        cap = lib.stpu_snappy_max_compressed(len(data))
        out = ctypes.create_string_buffer(cap)
        n = lib.stpu_snappy_compress(data, len(data), out, cap)
        if n != 0:
            return out.raw[:n]
    # Fallback: a valid all-literal block.
    header = _write_varint(len(data))
    out = bytearray(header)
    pos = 0
    while pos < len(data):
        chunk = data[pos : pos + (1 << 24)]
        length = len(chunk) - 1
        if length < 60:
            out.append(length << 2)
        elif length < 1 << 8:
            out.append(60 << 2)
            out.append(length)
        elif length < 1 << 16:
            out.append(61 << 2)
            out += length.to_bytes(2, "little")
        else:
            out.append(62 << 2)
            out += length.to_bytes(3, "little")
        out += chunk
        pos += len(chunk)
    return bytes(out)


# --- framing format ---


def frame_compress(data: bytes) -> bytes:
    """Compress into a snappy framed stream (what snap::FrameEncoder writes)."""
    out = bytearray(_STREAM_IDENTIFIER)
    pos = 0
    data = bytes(data)
    while pos < len(data) or pos == 0 == len(data):
        chunk = data[pos : pos + _MAX_UNCOMPRESSED_CHUNK]
        pos += len(chunk)
        crc = _masked_crc(chunk)
        compressed = compress_raw(chunk)
        if len(compressed) < len(chunk):
            body = struct.pack("<I", crc) + compressed
            out.append(_CHUNK_COMPRESSED)
        else:
            body = struct.pack("<I", crc) + chunk
            out.append(_CHUNK_UNCOMPRESSED)
        out += len(body).to_bytes(3, "little")
        out += body
        if pos >= len(data):
            break
    return bytes(out)


def frame_decompress(data: bytes, verify_checksums: bool = True) -> bytes:
    """Decompress a snappy framed stream. Checksums are verified by
    default, like the reference's snap::FrameDecoder — corruption then
    fails here with a clear error instead of surfacing as a confusing
    CBOR/msgpack decode failure (or silently wrong metadata)."""
    if data[: len(_STREAM_IDENTIFIER)] != _STREAM_IDENTIFIER:
        raise ValueError("not a snappy framed stream")
    pos = len(_STREAM_IDENTIFIER)
    out = bytearray()
    n = len(data)
    while pos < n:
        ctype = data[pos]
        length = int.from_bytes(data[pos + 1 : pos + 4], "little")
        body = data[pos + 4 : pos + 4 + length]
        pos += 4 + length
        if ctype == _CHUNK_COMPRESSED:
            crc = struct.unpack("<I", body[:4])[0]
            chunk = decompress_raw(body[4:])
        elif ctype == _CHUNK_UNCOMPRESSED:
            crc = struct.unpack("<I", body[:4])[0]
            chunk = body[4:]
        elif ctype == _CHUNK_PADDING or 0x80 <= ctype <= 0xFD:
            continue
        elif ctype == 0xFF:  # repeated stream identifier
            continue
        else:
            raise ValueError(f"unskippable unknown chunk type 0x{ctype:02x}")
        if verify_checksums and _masked_crc(chunk) != crc:
            raise ValueError("snappy frame checksum mismatch")
        out += chunk
    return bytes(out)
