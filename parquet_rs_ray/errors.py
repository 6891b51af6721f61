"""Typed error hierarchy (≙ reference `src/errors.rs:1-84`,
`ParquetError::{General, NYI, EOF}` via quick_error).

Decode paths wrap low-level exceptions in `DecodeError` with page
context so a corrupt block file names its column/codec/page instead of
surfacing a bare struct/buffer error (mirrors the reference's
corrupt-footer tests, `src/file/reader.rs:532-592`).
"""

from __future__ import annotations


class ParquetRsRayError(Exception):
    """Base class for engine errors."""


class EncodeError(ParquetRsRayError):
    """A value chunk could not be encoded."""


class DecodeError(ParquetRsRayError):
    """An encoded page failed to decode (truncated / corrupt buffer)."""


class FormatError(ParquetRsRayError):
    """Malformed page row / unknown codec id / bad metadata."""


class NotYetImplemented(ParquetRsRayError):
    """Feature gap (≙ ParquetError::NYI)."""
