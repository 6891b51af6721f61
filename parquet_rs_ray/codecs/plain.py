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
    """Vectorized [u32 len][bytes] interleave via two index gathers."""
    n = len(v)
    if n == 0:
        return b""
    lengths = v.lengths
    total = int(lengths.sum()) + 4 * n
    out = np.zeros(total, dtype=np.uint8)
    dest_starts = v.offsets[:-1] + 4 * np.arange(1, n + 1, dtype=np.int64)
    # length prefixes at dest_starts - 4
    len_bytes = lengths.astype("<u4").view(np.uint8).reshape(n, 4)
    out[(dest_starts - 4)[:, None] + np.arange(4)] = len_bytes
    # data bytes: gather src -> dest
    if total > 4 * n:
        within = np.arange(int(lengths.sum()), dtype=np.int64) - np.repeat(
            v.offsets[:-1], lengths)
        src_idx = np.repeat(v.offsets[:-1], lengths) + within
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
    """Walk u32 length prefixes. The offset chain is data-dependent, so this
    is a Python loop — pages are capped (~1 MiB) so the loop stays small."""
    buf = memoryview(data)
    raw = np.frombuffer(data, dtype=np.uint8)
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    starts = np.zeros(num_values, dtype=np.int64)
    pos = 0
    acc = 0
    u32 = np.dtype("<u4")
    for i in range(num_values):
        ln = int(np.frombuffer(buf, dtype=u32, count=1, offset=pos)[0])
        starts[i] = pos + 4
        acc += ln
        offsets[i + 1] = acc
        pos += 4 + ln
    lengths = np.diff(offsets)
    total = int(acc)
    out = np.empty(total, dtype=np.uint8)
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lengths)
        src = np.repeat(starts, lengths) + within
        out[:] = raw[src]
    return ByteArrayVals(offsets, out)
