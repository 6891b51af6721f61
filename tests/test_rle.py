"""RLE hybrid tests. Pinned-byte fixtures come straight from the
reference unit tests (format truths):
  - rle_runs / rle_bitpacked: /root/reference/src/encodings/rle.rs:668-712
  - decode fixtures: rle.rs:524-535, 595-623
"""

import numpy as np
import pytest

from parquet_rs_ray.rle import (rle_decode, rle_encode, rle_encode_reference)


@pytest.mark.parametrize("width", list(range(1, 9)))
def test_rle_runs_pinned(width):
    # 50 zeros then 50 ones -> [100, 0, 100, 1] for bit widths 1..8
    vals = np.array([0] * 50 + [1] * 50, dtype=np.uint64)
    expected = bytes([100, 0, 100, 1])
    assert rle_encode(vals, width) == expected
    assert rle_encode_reference(vals, width) == expected
    np.testing.assert_array_equal(rle_decode(expected, width, 100), vals)


def test_rle_bitpacked_pinned():
    # 101 alternating 0/1 at width 1:
    # indicator (13<<1)|1, 12 x 0b10101010, final 0b00001010
    vals = np.arange(101, dtype=np.uint64) % 2
    expected = bytes([(13 << 1) | 1] + [0b10101010] * 12 + [0b00001010])
    assert rle_encode(vals, 1) == expected
    assert rle_encode_reference(vals, 1) == expected
    np.testing.assert_array_equal(rle_decode(expected, 1, 101), vals)


def test_rle_decode_int32_pinned():
    # bytes [0x03, 0x88, 0xC6, 0xFA] at width 3 -> values 0..7
    data = bytes([0x03, 0x88, 0xC6, 0xFA])
    np.testing.assert_array_equal(rle_decode(data, 3, 8), np.arange(8))
    # and our encoder reproduces those bytes
    assert rle_encode(np.arange(8, dtype=np.uint64), 3) == data


def test_rle_dict_decode_pinned():
    # [0x06,0x00,0x08,0x01,0x0A,0x02] width 3 with dict [10,20,30]
    data = bytes([0x06, 0x00, 0x08, 0x01, 0x0A, 0x02])
    idx = rle_decode(data, 3, 12)
    dict_vals = np.array([10, 20, 30])
    np.testing.assert_array_equal(
        dict_vals[idx.astype(np.int64)],
        np.array([10] * 3 + [20] * 4 + [30] * 5))
    # bit-packed variant (rle.rs:608-623)
    data2 = bytes([0x03, 0x88, 0xC6, 0xFA])
    idx2 = rle_decode(data2, 3, 8)
    dict8 = np.array([10, 20, 30, 40, 50, 60, 70, 80])
    np.testing.assert_array_equal(dict8[idx2.astype(np.int64)], dict8)


def _roundtrip_and_match(vals, width):
    fast = rle_encode(vals, width)
    ref = rle_encode_reference(vals, width)
    assert fast == ref, f"vectorized encoder diverged (width={width}, n={len(vals)})"
    np.testing.assert_array_equal(rle_decode(fast, width, len(vals)), vals)


@pytest.mark.parametrize("width", [1, 2, 3, 5, 8, 10, 16, 20, 32])
def test_rle_fuzz_vs_state_machine(width):
    rng = np.random.default_rng(7 + width)
    hi = min(1 << width, 1 << 20)
    for trial in range(12):
        # mixture of short and long runs (reference rle.rs:804-835 stress)
        n_groups = rng.integers(1, 60)
        runs = []
        for _ in range(n_groups):
            ln = int(rng.integers(1, 20))
            runs.extend([int(rng.integers(0, hi))] * ln)
        vals = np.array(runs, dtype=np.uint64)
        _roundtrip_and_match(vals, width)


@pytest.mark.parametrize("n", [1, 7, 8, 9, 15, 16, 63, 64, 100, 504, 505, 512, 1000])
def test_rle_boundary_lengths(n):
    rng = np.random.default_rng(n)
    for maker in [
        lambda: rng.integers(0, 2, n).astype(np.uint64),           # random bits
        lambda: np.zeros(n, dtype=np.uint64),                      # all same
        lambda: (np.arange(n) % 2).astype(np.uint64),              # alternating
        lambda: np.repeat(np.arange((n + 9) // 10), 10)[:n].astype(np.uint64) % 2,
    ]:
        vals = maker()
        _roundtrip_and_match(vals, 1)


def test_rle_63_group_finalization():
    # exactly 63 groups (504 values) then an all-same partial group
    # -> short trailing RLE run (flush all_repeat, rle.rs:224-228)
    vals = np.concatenate([np.arange(504) % 2, np.full(3, 1)]).astype(np.uint64)
    _roundtrip_and_match(vals, 1)
    # 504 random + 5 same at width 3
    rng = np.random.default_rng(0)
    vals = np.concatenate([rng.integers(0, 8, 504), np.full(5, 3)]).astype(np.uint64)
    _roundtrip_and_match(vals, 3)


def test_rle_misaligned_long_runs():
    # runs of >=8 entering mid-group commit the group remainder as literal
    vals = np.array([1, 2, 3] + [7] * 20 + [1, 2] + [5] * 9, dtype=np.uint64)
    _roundtrip_and_match(vals, 3)


def test_rle_trailing_partial_same_value():
    # ends with 3 equal values, no open bit-packed run -> rle run of 3
    vals = np.array([4] * 16 + [2] * 3, dtype=np.uint64)
    _roundtrip_and_match(vals, 3)
    enc = rle_encode(vals, 3)
    # 16-run rle + 3-run rle
    assert enc == bytes([32, 4, 6, 2])
