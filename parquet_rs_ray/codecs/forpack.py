"""Frame-of-reference + bit-packing (north-star codec, not in the
reference; generalizes the reference's miniblock logic
`/root/reference/src/encodings/encoding.rs:622-641` chunk-wide without
delta chaining — see SURVEY.md §2.12).

Best for clustered values such as `warc_ts` timestamps.

Layout: vlq(num_values) zigzag_vlq(reference=min) vlq(bit_width)
        values bit-packed as (v - min) at bit_width, zero-padded to a byte.
"""

from __future__ import annotations

import numpy as np

from ..bitio import (decode_vlq, decode_zigzag_vlq, encode_vlq,
                     encode_zigzag_vlq, num_required_bits, pack_bits,
                     unpack_bits)

CODEC_ID = "FOR"


def encode(values: np.ndarray, is_int32: bool) -> bytes:
    dtype = np.int32 if is_int32 else np.int64
    udtype = np.uint32 if is_int32 else np.uint64
    v = np.ascontiguousarray(values, dtype=dtype)
    n = len(v)
    if n == 0:
        return encode_vlq(0) + encode_zigzag_vlq(0) + encode_vlq(0)
    ref = int(v.min())
    adj = (v - dtype(ref)).view(udtype).astype(np.uint64)
    width = num_required_bits(int(adj.max()))
    return (encode_vlq(n) + encode_zigzag_vlq(ref) + encode_vlq(width)
            + pack_bits(adj, width))


def decode(data: bytes, is_int32: bool) -> np.ndarray:
    dtype = np.int32 if is_int32 else np.int64
    udtype = np.uint32 if is_int32 else np.uint64
    buf = memoryview(data)
    n, pos = decode_vlq(buf, 0)
    ref, pos = decode_zigzag_vlq(buf, pos)
    width, pos = decode_vlq(buf, pos)
    adj = unpack_bits(buf[pos:], width, n)
    mask = 0xFFFFFFFF if dtype == np.int32 else 0xFFFFFFFFFFFFFFFF
    return (adj.astype(udtype) + udtype(ref & mask)).view(dtype)
