"""Codec registry: per-column lightweight compression codecs.

Each codec implements `encode(vals) -> bytes` / `decode(data, n) -> vals`
over the canonical value representations in `base.py`. Codec ids mirror
the reference `Encoding` enum (`/root/reference/src/basic.rs:166-200`)
plus the north-star additions (FSST, FOR).
"""

from .base import (PhysicalType, ByteArrayVals, physical_of_arrow,
                   values_from_arrow, values_to_arrow)
from . import (plain, levels, delta, dictionary, delta_bytes, forpack,
               fsst, rlebool, bss, alp)

__all__ = [
    "PhysicalType", "ByteArrayVals", "physical_of_arrow",
    "values_from_arrow", "values_to_arrow",
    "plain", "levels", "delta", "dictionary", "delta_bytes",
    "forpack", "fsst", "rlebool", "bss", "alp",
]
