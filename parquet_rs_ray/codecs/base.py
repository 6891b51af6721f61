"""Physical types and canonical value representations.

≙ the reference physical type system (`/root/reference/src/basic.rs:38-47`)
mapped onto Arrow (`SURVEY.md §1.3`). Codecs operate on:

* fixed-width types → a contiguous numpy array of non-null values
* BYTE_ARRAY / FIXED_LEN_BYTE_ARRAY → :class:`ByteArrayVals`
  (int64 offsets + uint8 data buffer), zero-copy from Arrow where possible.

Null handling follows the Dremel model: codecs see only the non-null
values; validity travels separately as RLE-encoded def-levels
(`codecs/levels.py` ≙ `/root/reference/src/encodings/levels.rs`).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

import numpy as np
import pyarrow as pa


class PhysicalType(str, Enum):
    BOOLEAN = "BOOLEAN"
    INT32 = "INT32"
    INT64 = "INT64"
    INT96 = "INT96"
    FLOAT = "FLOAT"
    DOUBLE = "DOUBLE"
    BYTE_ARRAY = "BYTE_ARRAY"
    FIXED_LEN_BYTE_ARRAY = "FIXED_LEN_BYTE_ARRAY"


NUMPY_DTYPE = {
    PhysicalType.INT32: np.dtype("<i4"),
    PhysicalType.INT64: np.dtype("<i8"),
    PhysicalType.FLOAT: np.dtype("<f4"),
    PhysicalType.DOUBLE: np.dtype("<f8"),
}


@dataclass
class ByteArrayVals:
    """Variable-length byte values: offsets[i]..offsets[i+1] slices data."""
    offsets: np.ndarray  # int64, len n+1
    data: np.ndarray     # uint8

    def __len__(self) -> int:
        return len(self.offsets) - 1

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def to_pylist(self) -> list[bytes]:
        d = self.data.tobytes()
        o = self.offsets
        return [d[o[i]:o[i + 1]] for i in range(len(self))]

    @classmethod
    def from_pylist(cls, items: list[bytes]) -> "ByteArrayVals":
        offs = np.zeros(len(items) + 1, dtype=np.int64)
        np.cumsum([len(b) for b in items], out=offs[1:])
        return cls(offs, np.frombuffer(b"".join(items), dtype=np.uint8))


def physical_of_arrow(typ: pa.DataType) -> PhysicalType:
    """Arrow type → physical type (SURVEY.md §1.3 table)."""
    if pa.types.is_boolean(typ):
        return PhysicalType.BOOLEAN
    if pa.types.is_integer(typ) and typ.bit_width <= 32:
        # uint32 needs INT64 storage (UINT_32 values exceed int32 range);
        # narrower unsigned types fit int32 (≙ logical UINT_8/16 on INT32,
        # `src/schema/types.rs:299-331` combos)
        if typ == pa.uint32():
            return PhysicalType.INT64
        return PhysicalType.INT32
    if (pa.types.is_integer(typ) or pa.types.is_timestamp(typ)
            or pa.types.is_time64(typ) or pa.types.is_date64(typ)
            or pa.types.is_duration(typ)):
        return PhysicalType.INT64
    if pa.types.is_date32(typ) or pa.types.is_time32(typ):
        return PhysicalType.INT32
    if pa.types.is_float32(typ):
        return PhysicalType.FLOAT
    if pa.types.is_float64(typ):
        return PhysicalType.DOUBLE
    if pa.types.is_string(typ) or pa.types.is_binary(typ) or pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        return PhysicalType.BYTE_ARRAY
    if pa.types.is_fixed_size_binary(typ):
        return PhysicalType.FIXED_LEN_BYTE_ARRAY
    if pa.types.is_decimal(typ):
        return PhysicalType.FIXED_LEN_BYTE_ARRAY
    raise TypeError(f"unsupported arrow type for encoding: {typ}")


def _storage_array(arr: pa.Array) -> pa.Array:
    """Cast arrow array to its physical storage form (non-null compacted)."""
    if arr.null_count:
        arr = arr.drop_null()
    t = arr.type
    if pa.types.is_timestamp(t) or pa.types.is_time64(t) or pa.types.is_date64(t):
        return arr.cast(pa.int64())
    if pa.types.is_date32(t) or pa.types.is_time32(t):
        return arr.cast(pa.int32())
    if t == pa.uint32():
        return arr.cast(pa.int64())
    if t == pa.uint64():
        # bit-reinterpret: values ≥ 2^63 can't cast; same-width wrap is
        # lossless and reversed on decode
        return pa.array(arr.to_numpy(zero_copy_only=False)
                        .astype(np.int64, copy=False, casting="unsafe"))
    if pa.types.is_integer(t) and t.bit_width <= 32 and t != pa.int32():
        return arr.cast(pa.int32())
    if pa.types.is_integer(t) and t.bit_width == 64 and t != pa.int64():
        return arr.cast(pa.int64())
    if pa.types.is_large_string(t):
        return arr.cast(pa.string())
    if pa.types.is_large_binary(t):
        return arr.cast(pa.binary())
    return arr


def values_from_arrow(arr: pa.Array):
    """Arrow array → canonical non-null values for codecs.

    Returns (phys, values) where values is np.ndarray / ByteArrayVals.
    """
    phys = physical_of_arrow(arr.type)
    arr = _storage_array(arr)
    if phys == PhysicalType.BOOLEAN:
        return phys, np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.bool_)
    if phys in NUMPY_DTYPE:
        return phys, np.ascontiguousarray(
            arr.to_numpy(zero_copy_only=False), dtype=NUMPY_DTYPE[phys])
    if phys == PhysicalType.BYTE_ARRAY:
        if pa.types.is_string(arr.type):
            arr = arr.cast(pa.binary())
        bufs = arr.buffers()
        # offsets buffer is int32 for binary
        offsets = np.frombuffer(bufs[1], dtype=np.int32,
                                count=len(arr) + 1,
                                offset=arr.offset * 4).astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        start = offsets[0]
        if start != 0:
            offsets = offsets - start
            data = data[start:start + offsets[-1]] if len(data) else data
        else:
            data = data[:offsets[-1]]
        return phys, ByteArrayVals(offsets, data)
    if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY:
        # decimals share the fixed-width layout (16 bytes for
        # decimal128, 32 for decimal256 — byte_width covers both);
        # pyarrow has no decimal↔binary cast, so read the buffer
        # directly
        width = arr.type.byte_width
        data = np.frombuffer(arr.buffers()[1], dtype=np.uint8,
                             count=len(arr) * width, offset=arr.offset * width)
        offsets = np.arange(len(arr) + 1, dtype=np.int64) * width
        return phys, ByteArrayVals(offsets, np.ascontiguousarray(data))
    raise TypeError(f"unsupported: {arr.type}")


def values_to_arrow(phys: PhysicalType, values, target_type: pa.DataType) -> pa.Array:
    """Canonical values → Arrow array of `target_type` (no nulls)."""
    if phys == PhysicalType.BOOLEAN:
        return pa.array(np.asarray(values, dtype=np.bool_), type=pa.bool_())
    if phys in NUMPY_DTYPE:
        if target_type == pa.uint64():
            # inverse of the encode-side bit reinterpretation
            return pa.array(np.asarray(values, dtype=np.int64)
                            .view(np.uint64))
        arr = pa.array(values)
        return arr if arr.type == target_type else arr.cast(target_type)
    if phys in (PhysicalType.BYTE_ARRAY, PhysicalType.FIXED_LEN_BYTE_ARRAY):
        v: ByteArrayVals = values
        if pa.types.is_decimal(target_type):
            # rebuild the fixed-width decimal buffer directly (no cast
            # path exists from binary in pyarrow)
            return pa.Array.from_buffers(
                target_type, len(v), [None, pa.py_buffer(v.data.tobytes())])
        offsets32 = v.offsets.astype(np.int32)
        arr = pa.Array.from_buffers(
            pa.binary(), len(v),
            [None, pa.py_buffer(offsets32.tobytes()), pa.py_buffer(v.data.tobytes())])
        return arr if target_type == pa.binary() else arr.cast(target_type)
    raise TypeError(f"unsupported: {phys}")
