"""Dictionary encoding ≙ `/root/reference/src/encodings/encoding.rs:186-413`
(decoder `decoding.rs:256-315`).

* dict page: the unique values in first-occurrence order, PLAIN-encoded
  (`encoding.rs:262-267`); Arrow's `dictionary_encode` yields exactly
  first-occurrence order, replacing the reference's open-addressing table.
* data page: 1 byte bit_width then RLE/bit-packed hybrid of the indices
  (`encoding.rs:272-289`); bit_width: 0 entries→0, 1→1, else
  ceil_log2(n) (`encoding.rs:325-334`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bitio import ceil_log2
from ..rle import rle_decode, rle_encode
from . import plain
from .base import (ByteArrayVals, NUMPY_DTYPE, PhysicalType, values_from_arrow,
                   values_to_arrow)

CODEC_ID = "RLE_DICTIONARY"


def bit_width_for(num_entries: int) -> int:
    if num_entries == 0:
        return 0
    if num_entries == 1:
        return 1
    return ceil_log2(num_entries)


def dict_encode_indices(indices: np.ndarray, num_entries: int) -> bytes:
    bw = bit_width_for(num_entries)
    return bytes([bw]) + rle_encode(indices.astype(np.uint64), bw)


def dict_decode_indices(data: bytes, num_values: int) -> np.ndarray:
    bw = data[0]
    return rle_decode(data[1:], bw, num_values).astype(np.int64)


def encode(phys: PhysicalType, values) -> tuple[bytes, bytes, int]:
    """Encode non-null values → (data_bytes, dict_page_bytes, num_entries)."""
    arr = _to_arrow_for_encode(phys, values)
    denc = pc.dictionary_encode(arr)
    indices = np.asarray(denc.indices.to_numpy(zero_copy_only=False), dtype=np.int64)
    _, uniq_vals = values_from_arrow(denc.dictionary)
    dict_page = plain.encode(phys, uniq_vals)
    data = dict_encode_indices(indices, len(denc.dictionary))
    return data, dict_page, len(denc.dictionary)


def decode(phys: PhysicalType, data: bytes, dict_page: bytes,
           num_entries: int, num_values: int, type_length: int = 0):
    """Decode → canonical values (np.ndarray / ByteArrayVals)."""
    uniq = plain.decode(phys, dict_page, num_entries, type_length)
    idx = dict_decode_indices(data, num_values)
    if phys == PhysicalType.BOOLEAN or phys in NUMPY_DTYPE:
        return uniq[idx]
    # byte arrays: gather via repeat/cumsum (vectorized)
    u: ByteArrayVals = uniq
    lens = u.lengths[idx]
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    total = int(offsets[-1])
    out = np.empty(total, dtype=np.uint8)
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], lens)
        src = np.repeat(u.offsets[:-1][idx], lens) + within
        out[:] = u.data[src]
    return ByteArrayVals(offsets, out)


def _to_arrow_for_encode(phys: PhysicalType, values) -> pa.Array:
    if phys == PhysicalType.BOOLEAN:
        return pa.array(np.asarray(values, dtype=np.bool_))
    if phys in NUMPY_DTYPE:
        return pa.array(np.ascontiguousarray(values, NUMPY_DTYPE[phys]))
    return values_to_arrow(phys, values, pa.binary())
