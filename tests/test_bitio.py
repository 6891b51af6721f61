import numpy as np
import pytest

from parquet_rs_ray import bitio


def test_ceil_log2():
    # ≙ bit_util::log2 (reference bit_util.rs:91-102)
    assert bitio.ceil_log2(1) == 0
    assert bitio.ceil_log2(2) == 1
    assert bitio.ceil_log2(3) == 2
    assert bitio.ceil_log2(4) == 2
    assert bitio.ceil_log2(5) == 3
    assert bitio.ceil_log2(1024) == 10


def test_num_required_bits():
    assert bitio.num_required_bits(0) == 0
    assert bitio.num_required_bits(1) == 1
    assert bitio.num_required_bits(2) == 2
    assert bitio.num_required_bits(255) == 8
    assert bitio.num_required_bits(256) == 9


@pytest.mark.parametrize("width", [1, 2, 3, 5, 7, 8, 13, 16, 21, 31, 32, 33, 47, 57, 63, 64])
def test_pack_roundtrip(width):
    rng = np.random.default_rng(42)
    if width == 64:
        vals = rng.integers(0, 1 << 63, size=333, dtype=np.uint64) * 2 + 1
    else:
        vals = rng.integers(0, 1 << width, size=333, dtype=np.uint64)
    packed = bitio.pack_bits(vals, width)
    assert len(packed) == bitio.ceil_div(333 * width, 8)
    out = bitio.unpack_bits(packed, width, 333)
    np.testing.assert_array_equal(out, vals)


def test_pack_lsb_first():
    # values packed LSB-first within bytes (parquet bit order)
    assert bitio.pack_bits(np.array([1, 0, 1, 0, 1, 0, 1, 0], np.uint64), 1) == bytes([0b01010101])
    assert bitio.pack_bits(np.array([0, 1, 2, 3], np.uint64), 2) == bytes([0b11100100])


def test_vlq():
    for v in [0, 1, 127, 128, 300, 2 ** 32, 2 ** 60]:
        enc = bitio.encode_vlq(v)
        dec, off = bitio.decode_vlq(enc)
        assert dec == v and off == len(enc)
    assert bitio.encode_vlq(128) == bytes([0x80, 0x01])


def test_zigzag():
    cases = {0: 0, -1: 1, 1: 2, -2: 3, 2: 4}
    for v, z in cases.items():
        assert bitio.zigzag_encode(v) == z
        assert bitio.zigzag_decode(z) == v
    for v in [-(2 ** 63), 2 ** 63 - 1, -12345, 98765]:
        assert bitio.zigzag_decode(bitio.zigzag_encode(v)) == v


def test_unpack_bits_word_gather_with_bit_offset():
    """The width>8 word-gather path must honor arbitrary bit offsets,
    byte-aligned and sub-byte alike."""
    rng = np.random.default_rng(17)
    for w in (9, 12, 16, 24, 31, 33, 40, 63, 64):
        vals = rng.integers(0, 2 ** min(w, 63), 1000, dtype=np.uint64)
        # byte-aligned offsets: prepend whole junk bytes
        for off_bytes in (0, 1, 8, 9):
            blob = b"\xff" * off_bytes + bitio.pack_bits(vals, w)
            got = bitio.unpack_bits(blob, w, len(vals),
                                    bit_offset=off_bytes * 8)
            assert (got == vals).all(), (w, off_bytes)
        # sub-byte offsets (odd widths): skip k packed junk values
        for k in (1, 3, 7):
            junk = rng.integers(0, 2 ** min(w, 63), k, dtype=np.uint64)
            blob = bitio.pack_bits(np.concatenate((junk, vals)), w)
            got = bitio.unpack_bits(blob, w, len(vals), bit_offset=k * w)
            assert (got == vals).all(), (w, k)
