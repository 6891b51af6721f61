"""PLAIN encoding ≙ `/root/reference/src/encodings/encoding.rs:94-181` /
decoder `decoding.rs:88-247`.

* fixed-width types: back-to-back little-endian values
* BOOLEAN: 1 bit per value, LSB-first (BitWriter semantics)
* BYTE_ARRAY: u32-LE length prefix + bytes per value
* FIXED_LEN_BYTE_ARRAY: raw bytes back to back
"""

from __future__ import annotations

import numpy as np

from .base import ByteArrayVals, NUMPY_DTYPE, PhysicalType

CODEC_ID = "PLAIN"


def encode(phys: PhysicalType, values) -> bytes:
    if phys == PhysicalType.BOOLEAN:
        return np.packbits(np.asarray(values, dtype=np.uint8),
                           bitorder="little").tobytes()
    if phys in NUMPY_DTYPE:
        return np.ascontiguousarray(values, dtype=NUMPY_DTYPE[phys]).tobytes()
    if phys == PhysicalType.BYTE_ARRAY:
        return encode_byte_array(values)
    if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY:
        return values.data.tobytes()
    raise TypeError(phys)


def encode_byte_array(v: ByteArrayVals) -> bytes:
    """[u32 len][bytes] interleave. Two regimes: long values copy as
    contiguous slices (memcpy per value — per-byte gather indexes cost
    24 B of int64 index per payload byte and lose 100x on ~KiB html
    blobs); many short values use the vectorized index gather."""
    n = len(v)
    if n == 0:
        return b""
    lengths = v.lengths
    data_total = int(v.offsets[-1] - v.offsets[0])
    total = data_total + 4 * n
    if data_total >= 48 * n:   # (n == 0 returned above)
        lb = lengths.astype("<u4").tobytes()
        src = memoryview(np.ascontiguousarray(v.data, dtype=np.uint8))
        offs = (v.offsets - v.offsets[0]).tolist()
        out = bytearray(total)
        pos = 0
        for i in range(n):
            s, e = offs[i], offs[i + 1]
            out[pos:pos + 4] = lb[4 * i:4 * i + 4]
            pos += 4
            out[pos:pos + e - s] = src[s:e]
            pos += e - s
        return bytes(out)
    out = np.zeros(total, dtype=np.uint8)
    base = v.offsets[:-1] - v.offsets[0]
    dest_starts = base + 4 * np.arange(1, n + 1, dtype=np.int64)
    len_bytes = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    out[(dest_starts - 4)[:, None] + np.arange(4)] = len_bytes
    if data_total:
        within = np.arange(data_total, dtype=np.int64) - np.repeat(base, lengths)
        src_idx = np.repeat(base, lengths) + within
        dst_idx = np.repeat(dest_starts, lengths) + within
        out[dst_idx] = v.data[src_idx]
    return out.tobytes()


def decode(phys: PhysicalType, data: bytes, num_values: int,
           type_length: int = 0):
    if phys == PhysicalType.BOOLEAN:
        bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                             bitorder="little", count=max(num_values, 0))
        return bits[:num_values].astype(np.bool_)
    if phys in NUMPY_DTYPE:
        return np.frombuffer(data, dtype=NUMPY_DTYPE[phys], count=num_values)
    if phys == PhysicalType.BYTE_ARRAY:
        return decode_byte_array(data, num_values)
    if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY:
        buf = np.frombuffer(data, dtype=np.uint8, count=num_values * type_length)
        offsets = np.arange(num_values + 1, dtype=np.int64) * type_length
        return ByteArrayVals(offsets, buf)
    raise TypeError(phys)


def decode_byte_array(data: bytes, num_values: int) -> ByteArrayVals:
    """Walk u32 length prefixes. The offset chain is data-dependent, so
    this is a Python loop — but each value's bytes are a contiguous run,
    so the copy is one slice assignment per value (memcpy), not a
    per-byte gather; pages are capped (~1 MiB) so the loop stays small."""
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    total = len(data) - 4 * num_values
    out = bytearray(total)
    offs = offsets  # fill python-side, keep numpy result
    pos = 0
    acc = 0
    from_bytes = int.from_bytes
    for i in range(num_values):
        ln = from_bytes(data[pos:pos + 4], "little")
        pos += 4
        out[acc:acc + ln] = data[pos:pos + ln]
        acc += ln
        offs[i + 1] = acc
        pos += ln
    return ByteArrayVals(offsets, np.frombuffer(out, dtype=np.uint8,
                                                count=acc))
