"""RLE value encoding for booleans ≙
`/root/reference/src/encodings/encoding.rs:422-501` (v2 data pages):
4-byte LE length prefix, then hybrid RLE runs at bit_width=1.
Decoder ≙ `decoding.rs:323-384`.
"""

from __future__ import annotations

import numpy as np

from ..rle import rle_decode, rle_encode

CODEC_ID = "RLE"


def encode(values: np.ndarray) -> bytes:
    body = rle_encode(np.asarray(values, dtype=np.uint64), 1)
    return len(body).to_bytes(4, "little") + body


def decode(data: bytes, num_values: int) -> np.ndarray:
    ln = int.from_bytes(data[:4], "little")
    return rle_decode(data[4:4 + ln], 1, num_values).astype(np.bool_)
