"""BYTE_STREAM_SPLIT for FLOAT/DOUBLE columns (parquet-format standard
encoding, `Encoding::BYTE_STREAM_SPLIT` — absent from the reference's
v0.4 enum but part of the same public format family; SURVEY §2.12
north-star addition like FSST/FOR).

Values are split into per-byte-position streams: all byte-0s, then all
byte-1s, … On IEEE floats the high bytes (sign/exponent) are highly
repetitive across a chunk while mantissa bytes are noise, so grouping
them makes the downstream block codec (zstd) dramatically more
effective — BSS alone is a pure permutation (encoded size == PLAIN), so
the selector only offers it where an outer block codec gets to exploit
it (`block_codec="auto"`).

Layout: the raw streams back to back, no header — num_values comes from
the page row count and the stream width from the physical type,
mirroring the parquet spec's headerless BYTE_STREAM_SPLIT pages.
"""

from __future__ import annotations

import numpy as np

CODEC_ID = "BYTE_STREAM_SPLIT"

_WIDTHS = {"FLOAT": 4, "DOUBLE": 8}


def width_of(phys) -> int:
    w = _WIDTHS.get(getattr(phys, "value", phys))
    if w is None:
        raise ValueError(f"BYTE_STREAM_SPLIT supports FLOAT/DOUBLE, "
                         f"not {phys}")
    return w


def encode(values: np.ndarray, phys) -> bytes:
    w = width_of(phys)
    v = np.ascontiguousarray(values)
    n = len(v)
    if n == 0:
        return b""
    return v.view(np.uint8).reshape(n, w).T.tobytes()


def decode(data: bytes, num_values: int, phys) -> np.ndarray:
    w = width_of(phys)
    dtype = np.dtype("<f4") if w == 4 else np.dtype("<f8")
    if num_values == 0:
        return np.empty(0, dtype)
    if len(data) != num_values * w:
        raise ValueError(f"BYTE_STREAM_SPLIT payload is {len(data)} bytes, "
                         f"expected {num_values * w}")
    streams = np.frombuffer(data, dtype=np.uint8).reshape(w, num_values)
    return np.ascontiguousarray(streams.T).view(dtype).ravel()
