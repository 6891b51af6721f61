"""Definition/repetition level encoding ≙
`/root/reference/src/encodings/levels.rs:54-272`.

For our flat target schema only def levels with max_level=1 occur (null
bitmap), but the codec supports any max_level like the reference:
bit_width = ceil_log2(max_level + 1) (`levels.rs:39`).

* v1: RLE bytes prefixed with u32-LE byte length (`levels.rs:68-84,128-137`)
* v2: RLE bytes, no prefix (`levels.rs:88-91`)
* BIT_PACKED (legacy): plain bit-packing, no prefix (`levels.rs:76-81`)
"""

from __future__ import annotations

import numpy as np

from ..bitio import ceil_log2, pack_bits, unpack_bits
from ..rle import rle_decode, rle_encode


def bit_width_for(max_level: int) -> int:
    return ceil_log2(max_level + 1)


def encode_v1(levels: np.ndarray, max_level: int) -> bytes:
    body = rle_encode(np.asarray(levels, dtype=np.uint64),
                      bit_width_for(max_level))
    return len(body).to_bytes(4, "little") + body


def decode_v1(data: bytes, max_level: int, num_values: int):
    """Returns (levels, bytes_consumed)."""
    ln = int.from_bytes(data[:4], "little")
    levels = rle_decode(data[4:4 + ln], bit_width_for(max_level), num_values)
    return levels.astype(np.int16), 4 + ln


def encode_v2(levels: np.ndarray, max_level: int) -> bytes:
    return rle_encode(np.asarray(levels, dtype=np.uint64),
                      bit_width_for(max_level))


def decode_v2(data: bytes, max_level: int, num_values: int) -> np.ndarray:
    return rle_decode(data, bit_width_for(max_level), num_values).astype(np.int16)


def encode_bit_packed(levels: np.ndarray, max_level: int) -> bytes:
    return pack_bits(np.asarray(levels, dtype=np.uint64),
                     bit_width_for(max_level))


def decode_bit_packed(data: bytes, max_level: int, num_values: int) -> np.ndarray:
    return unpack_bits(data, bit_width_for(max_level), num_values).astype(np.int16)


# --- null-bitmap convenience for flat nullable columns (max_def_level=1) ---

def encode_validity(valid: np.ndarray) -> bytes:
    """valid: bool array (True = present) → v1 def-level bytes."""
    return encode_v1(np.asarray(valid, dtype=np.uint64), 1)


def decode_validity(data: bytes, num_values: int) -> np.ndarray:
    levels, _ = decode_v1(data, 1, num_values)
    return levels.astype(np.bool_)
