"""Vectorized bit-level primitives.

Ray-Data-native re-creation of the reference BitWriter/BitReader
(`/root/reference/src/util/bit_util.rs:136-613`) and the generated
unpack routines (`/root/reference/src/util/bit_packing.rs:29-72`), expressed
as numpy kernels over whole arrays instead of per-value calls.

Bit order matches Parquet: values are packed LSB-first within each byte
(little-endian bit order), multi-byte values little-endian.
"""

from __future__ import annotations

import numpy as np

MAX_VLQ_BYTE_LEN = 5  # reference `bit_util.rs` MAX_VLQ_BYTE_LEN


def ceil_div(value: int, divisor: int) -> int:
    """≙ `bit_util::ceil` (`bit_util.rs:81-87`)."""
    return -(-value // divisor)


def ceil_log2(x: int) -> int:
    """≙ `bit_util::log2` (`bit_util.rs:91-102`): ceil(log2(x)), log2(1)=0."""
    if x <= 1:
        return 0
    return int(x - 1).bit_length()


def num_required_bits(x: int) -> int:
    """≙ `bit_util::num_required_bits` (`bit_util.rs:125-132`)."""
    if x < 0:
        raise ValueError("num_required_bits expects unsigned input")
    return int(x).bit_length()


def pack_bits(values: np.ndarray, bit_width: int) -> bytes:
    """Bit-pack `values` (non-negative, < 2**bit_width) LSB-first.

    Output is padded with zero bits to a whole byte, matching BitWriter
    semantics where the caller controls value-count padding separately.
    """
    n = len(values)
    if n == 0 or bit_width == 0:
        return b""
    width_bytes = 1 if bit_width <= 8 else 2 if bit_width <= 16 else 4 if bit_width <= 32 else 8
    u = np.ascontiguousarray(values, dtype=f"<u{width_bytes}")
    # C-speed bit spread: bytes -> per-value LSB-first bit rows -> repack
    bits = np.unpackbits(u.view(np.uint8).reshape(n, width_bytes),
                         axis=1, bitorder="little")[:, :bit_width]
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(data: bytes | memoryview | np.ndarray, bit_width: int,
                num_values: int, bit_offset: int = 0) -> np.ndarray:
    """Inverse of :func:`pack_bits`; returns uint64 array of `num_values`.

    Two regimes, measured (see SCALING.md "FastLanes experiment"):
    widths ≤ 8 run the unpackbits/packbits spread (its traffic scales
    with width, so narrow widths stay cheap); wider widths run a
    word-parallel gather in the spirit of FastLanes' word-at-a-time
    decoding (VLDB 2023, PAPERS.md) — each value is assembled from the
    one or two uint64 words covering its bit range with shift/or/mask,
    1.3–2.2× the spread path at widths 12–63."""
    if num_values == 0:
        return np.empty(0, dtype=np.uint64)
    if bit_width == 0:
        return np.zeros(num_values, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8)
    total_bits = bit_offset + num_values * bit_width
    nbytes = ceil_div(total_bits, 8)
    if bit_width > 8:
        # word-gather: pad to whole uint64 words + one guard word so
        # widx+1 never leaves the buffer
        padded = np.zeros(((nbytes + 7) // 8 + 1) * 8, dtype=np.uint8)
        padded[:nbytes] = buf[:nbytes]
        words = padded.view("<u8")
        bitpos = np.uint64(bit_offset) + np.arange(
            num_values, dtype=np.uint64) * np.uint64(bit_width)
        widx = (bitpos >> np.uint64(6)).astype(np.int64)
        shift = bitpos & np.uint64(63)
        val = words[widx] >> shift
        # straddling values take their top bits from the next word;
        # (64-shift)&63 keeps the shift count defined at shift==0, and
        # the where() discards that lane's bogus contribution
        hi = words[widx + 1] << ((np.uint64(64) - shift) & np.uint64(63))
        val |= np.where(shift == np.uint64(0), np.uint64(0), hi)
        if bit_width < 64:
            val &= np.uint64((1 << bit_width) - 1)
        return val
    bits = np.unpackbits(buf[:nbytes], bitorder="little", count=nbytes * 8)
    bits = bits[bit_offset:bit_offset + num_values * bit_width]
    bits = bits.reshape(num_values, bit_width)
    padded = np.zeros((num_values, 8), dtype=np.uint8)
    padded[:, :bit_width] = bits
    packed = np.packbits(padded, axis=1, bitorder="little")
    return packed.view("<u1").reshape(num_values).astype(np.uint64)


def encode_vlq(value: int) -> bytes:
    """ULEB128 varint ≙ `BitWriter::put_vlq_int` (`bit_util.rs`)."""
    out = bytearray()
    v = int(value)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_vlq(buf, offset: int = 0) -> tuple[int, int]:
    """Returns (value, new_offset)."""
    result = 0
    shift = 0
    while True:
        b = buf[offset]
        offset += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, offset
        shift += 7


def zigzag_encode(value: int) -> int:
    """64-bit zigzag ≙ `put_zigzag_vlq_int`."""
    sv = int(value)
    return ((sv << 1) ^ (sv >> 63)) & 0xFFFFFFFFFFFFFFFF


def zigzag_decode(value: int) -> int:
    v = int(value)
    out = (v >> 1) ^ -(v & 1)
    return out


def encode_zigzag_vlq(value: int) -> bytes:
    return encode_vlq(zigzag_encode(value))


def decode_zigzag_vlq(buf, offset: int = 0) -> tuple[int, int]:
    v, offset = decode_vlq(buf, offset)
    return zigzag_decode(v), offset
