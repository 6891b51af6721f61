"""Codec unit tests: pinned-byte fixtures (FIXTURES.md F2, from the
reference unit tests) + seeded randomized roundtrips (F3)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.codecs import (ByteArrayVals, PhysicalType, delta,
                                   delta_bytes, dictionary, forpack, fsst,
                                   levels, plain, rlebool)


# ---------------------------------------------------------------- PLAIN

def test_plain_int32_pinned():
    # reference data_type.rs:348-389: 7 -> [7,0,0,0]
    assert plain.encode(PhysicalType.INT32, np.array([7], np.int32)) == bytes([7, 0, 0, 0])
    assert plain.encode(PhysicalType.INT64, np.array([7], np.int64)) == bytes([7, 0, 0, 0, 0, 0, 0, 0])


def test_plain_bool_bitpacked():
    vals = np.array([True, False, True, True, False, False, True, True, True], dtype=np.bool_)
    enc = plain.encode(PhysicalType.BOOLEAN, vals)
    assert enc == bytes([0b11001101, 0b00000001])
    np.testing.assert_array_equal(plain.decode(PhysicalType.BOOLEAN, enc, 9), vals)


def test_plain_byte_array_prefix():
    v = ByteArrayVals.from_pylist([b"hello", b"", b"ab"])
    enc = plain.encode(PhysicalType.BYTE_ARRAY, v)
    assert enc == (bytes([5, 0, 0, 0]) + b"hello" + bytes([0, 0, 0, 0])
                   + bytes([2, 0, 0, 0]) + b"ab")
    out = plain.decode(PhysicalType.BYTE_ARRAY, enc, 3)
    assert out.to_pylist() == [b"hello", b"", b"ab"]


@pytest.mark.parametrize("phys,dtype", [
    (PhysicalType.INT32, np.int32), (PhysicalType.INT64, np.int64),
    (PhysicalType.FLOAT, np.float32), (PhysicalType.DOUBLE, np.float64)])
def test_plain_fixed_roundtrip(phys, dtype):
    rng = np.random.default_rng(1)
    vals = rng.integers(-1000, 1000, 1024).astype(dtype)
    enc = plain.encode(phys, vals)
    np.testing.assert_array_equal(plain.decode(phys, enc, 1024), vals)


def test_plain_flba_roundtrip():
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 256, 10 * 16, dtype=np.uint8)
    v = ByteArrayVals(np.arange(11, dtype=np.int64) * 16, raw)
    enc = plain.encode(PhysicalType.FIXED_LEN_BYTE_ARRAY, v)
    assert enc == raw.tobytes()
    out = plain.decode(PhysicalType.FIXED_LEN_BYTE_ARRAY, enc, 10, type_length=16)
    assert out.to_pylist() == v.to_pylist()


# ---------------------------------------------------------------- DELTA

def test_delta_pinned_sample():
    # reference decoding.rs:1152-1167: [29,43,89] <-> exact 34-byte buffer,
    # header ends at offset 5, data at 34
    vals = np.array([29, 43, 89], dtype=np.int32)
    enc = delta.encode(vals, is_int32=True)
    assert len(enc) == 34
    assert enc[:5] == bytes([128, 1, 4, 3, 58])
    assert enc[5] == 28  # zigzag(min_delta=14)
    assert enc[6:10] == bytes([6, 0, 0, 0])  # miniblock widths
    out, consumed = delta.decode_with_consumed(enc, is_int32=True)
    np.testing.assert_array_equal(out, vals)
    assert consumed == 34


@pytest.mark.parametrize("n", [0, 1, 2, 63, 64, 128, 129, 256, 257, 1000])
@pytest.mark.parametrize("is32", [True, False])
def test_delta_roundtrip_lengths(n, is32):
    rng = np.random.default_rng(n + int(is32))
    dtype = np.int32 if is32 else np.int64
    vals = rng.integers(-10 ** 6, 10 ** 6, n).astype(dtype)
    enc = delta.encode(vals, is_int32=is32)
    np.testing.assert_array_equal(delta.decode(enc, is_int32=is32), vals)


@pytest.mark.parametrize("is32", [True, False])
def test_delta_wrapping_extremes(is32):
    # reference decoding.rs:1076-1089: MIN/MAX alternating exercises
    # wrapping arithmetic
    dtype = np.int32 if is32 else np.int64
    info = np.iinfo(dtype)
    vals = np.array([info.min, info.max] * 64, dtype=dtype)
    enc = delta.encode(vals, is_int32=is32)
    np.testing.assert_array_equal(delta.decode(enc, is_int32=is32), vals)


def test_delta_sorted_is_small():
    vals = np.arange(10000, dtype=np.int64) * 1000  # constant delta
    enc = delta.encode(vals, is_int32=False)
    # all deltas equal -> zero-width miniblocks, ~6 bytes per 128-value block
    assert len(enc) < 600


# ----------------------------------------------------------- DICTIONARY

def test_dict_sizes_pinned():
    # reference encoding.rs:1048-1077: 5 distinct i32 -> dict bytes 20;
    # strings "abcd","efj" -> 15 (two u32 prefixes + 7 bytes)
    data, page, n = dictionary.encode(
        PhysicalType.INT32, np.array([1, 2, 3, 4, 5], np.int32))
    assert n == 5 and len(page) == 20
    v = ByteArrayVals.from_pylist([b"abcd", b"efj"])
    data, page, n = dictionary.encode(PhysicalType.BYTE_ARRAY, v)
    assert n == 2 and len(page) == 15


def test_dict_bit_width_rule():
    # encoding.rs:325-334: 0 entries->0, 1->1, else ceil_log2
    assert dictionary.bit_width_for(0) == 0
    assert dictionary.bit_width_for(1) == 1
    assert dictionary.bit_width_for(2) == 1
    assert dictionary.bit_width_for(3) == 2
    assert dictionary.bit_width_for(1024) == 10


def test_dict_first_occurrence_order():
    v = ByteArrayVals.from_pylist([b"b", b"a", b"b", b"c", b"a"])
    data, page, n = dictionary.encode(PhysicalType.BYTE_ARRAY, v)
    # dict page is PLAIN uniques in first-occurrence order: b, a, c
    assert page == (bytes([1, 0, 0, 0]) + b"b" + bytes([1, 0, 0, 0]) + b"a"
                    + bytes([1, 0, 0, 0]) + b"c")
    out = dictionary.decode(PhysicalType.BYTE_ARRAY, data, page, n, 5)
    assert out.to_pylist() == [b"b", b"a", b"b", b"c", b"a"]


@pytest.mark.parametrize("phys,dtype", [
    (PhysicalType.INT32, np.int32), (PhysicalType.INT64, np.int64),
    (PhysicalType.DOUBLE, np.float64)])
def test_dict_fixed_roundtrip(phys, dtype):
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, 2000).astype(dtype)
    data, page, n = dictionary.encode(phys, vals)
    out = dictionary.decode(phys, data, page, n, 2000)
    np.testing.assert_array_equal(out, vals)


def test_dict_string_roundtrip():
    rng = np.random.default_rng(4)
    pool = [f"lang_{i}".encode() for i in range(30)]
    items = [pool[i] for i in rng.integers(0, 30, 5000)]
    v = ByteArrayVals.from_pylist(items)
    data, page, n = dictionary.encode(PhysicalType.BYTE_ARRAY, v)
    out = dictionary.decode(PhysicalType.BYTE_ARRAY, data, page, n, 5000)
    assert out.to_pylist() == items
    assert len(data) + len(page) < sum(map(len, items))


# ---------------------------------------------------------------- LEVELS

def test_levels_v1_roundtrip():
    rng = np.random.default_rng(5)
    for max_level in [1, 3, 10]:
        lv = rng.integers(0, max_level + 1, 997).astype(np.int16)
        enc = levels.encode_v1(lv, max_level)
        out, consumed = levels.decode_v1(enc, max_level, 997)
        np.testing.assert_array_equal(out, lv)
        assert consumed == len(enc)


def test_levels_v2_and_bitpacked():
    lv = np.array([0, 1, 1, 0, 1] * 100, dtype=np.int16)
    enc2 = levels.encode_v2(lv, 1)
    np.testing.assert_array_equal(levels.decode_v2(enc2, 1, 500), lv)
    encbp = levels.encode_bit_packed(lv, 1)
    np.testing.assert_array_equal(levels.decode_bit_packed(encbp, 1, 500), lv)


def test_validity_bitmap():
    rng = np.random.default_rng(6)
    valid = rng.random(1000) > 0.3
    enc = levels.encode_validity(valid)
    np.testing.assert_array_equal(levels.decode_validity(enc, 1000), valid)


# -------------------------------------------------------------- RLE BOOL

def test_rlebool_roundtrip():
    rng = np.random.default_rng(7)
    for n in [256, 257, 126]:
        vals = rng.random(n) > 0.5
        enc = rlebool.encode(vals)
        assert int.from_bytes(enc[:4], "little") == len(enc) - 4
        np.testing.assert_array_equal(rlebool.decode(enc, n), vals)


# ------------------------------------------------------------------- FOR

@pytest.mark.parametrize("is32", [True, False])
def test_for_roundtrip(is32):
    rng = np.random.default_rng(8)
    dtype = np.int32 if is32 else np.int64
    base = 1_600_000_000_000_000 if not is32 else 1_000_000
    vals = (base + rng.integers(0, 3600 * 10 ** 6 if not is32 else 3600, 1000)).astype(dtype)
    enc = forpack.encode(vals, is_int32=is32)
    np.testing.assert_array_equal(forpack.decode(enc, is_int32=is32), vals)
    # clustered timestamps compress far better than plain
    assert len(enc) <= 1000 * (4 if is32 else 8) / 2 + 64


def test_for_constant_column():
    vals = np.full(500, 42, dtype=np.int64)
    enc = forpack.encode(vals, is_int32=False)
    assert len(enc) < 16
    np.testing.assert_array_equal(forpack.decode(enc, is_int32=False), vals)


# ---------------------------------------------------------- DELTA BYTES

def test_delta_length_roundtrip():
    items = [b"hello", b"", b"a" * 300, b"xy"]
    v = ByteArrayVals.from_pylist(items)
    enc = delta_bytes.encode_delta_length(v)
    out = delta_bytes.decode_delta_length(enc, 4)
    assert out.to_pylist() == items


def test_delta_byte_array_prefixes():
    items = [b"https://a.com/page1", b"https://a.com/page2", b"https://b.org/x"]
    v = ByteArrayVals.from_pylist(items)
    pl = delta_bytes.common_prefix_lengths(v)
    np.testing.assert_array_equal(pl, [0, 18, 8])
    enc = delta_bytes.encode_delta_byte_array(v)
    out = delta_bytes.decode_delta_byte_array(enc, 3)
    assert out.to_pylist() == items


def test_delta_byte_array_reuse_regression():
    # reference encoding.rs:1150-1177 (issue #47): put/flush/put again
    items = [b"aa", b"aaa"]
    v = ByteArrayVals.from_pylist(items)
    for _ in range(2):
        enc = delta_bytes.encode_delta_byte_array(v)
        out = delta_bytes.decode_delta_byte_array(enc, 2)
        assert out.to_pylist() == items


def test_delta_byte_array_long_prefix():
    # prefixes longer than the vectorized cap (64) fall back per-row
    a = b"p" * 200 + b"x"
    b = b"p" * 200 + b"y"
    v = ByteArrayVals.from_pylist([a, b])
    pl = delta_bytes.common_prefix_lengths(v)
    np.testing.assert_array_equal(pl, [0, 200])
    enc = delta_bytes.encode_delta_byte_array(v)
    assert delta_bytes.decode_delta_byte_array(enc, 2).to_pylist() == [a, b]


def test_delta_byte_array_sorted_urls_compress():
    urls = [f"https://domain{i % 5}.com/path/{i:06d}".encode() for i in range(1000)]
    urls.sort()
    v = ByteArrayVals.from_pylist(urls)
    enc = delta_bytes.encode_delta_byte_array(v)
    assert len(enc) < sum(map(len, urls)) // 2
    assert delta_bytes.decode_delta_byte_array(enc, 1000).to_pylist() == urls


# ------------------------------------------------------------------ FSST

def test_fsst_roundtrip_basic():
    items = [b"the quick brown fox", b"the lazy dog", b"", b"the the the"]
    v = ByteArrayVals.from_pylist(items)
    enc = fsst.encode(v)
    out = fsst.decode(enc)
    assert out.to_pylist() == items


def test_fsst_compresses_redundant_text():
    words = ["the", "of", "and", "compression", "symbol", "table"]
    rng = np.random.default_rng(9)
    items = [(" ".join(words[i] for i in rng.integers(0, 6, 30))).encode()
             for _ in range(200)]
    v = ByteArrayVals.from_pylist(items)
    enc = fsst.encode(v)
    raw = sum(map(len, items))
    assert len(enc) < raw * 0.7, (len(enc), raw)
    assert fsst.decode(enc).to_pylist() == items


def test_fsst_binary_with_escapes():
    rng = np.random.default_rng(10)
    items = [rng.integers(0, 256, rng.integers(0, 50), endpoint=False)
             .astype(np.uint8).tobytes() for _ in range(100)]
    items.append(b"\xff" * 17)  # escape-code byte runs
    items.append(b"\xff\x00\xff")
    v = ByteArrayVals.from_pylist(items)
    enc = fsst.encode(v)
    assert fsst.decode(enc).to_pylist() == items


def test_fsst_table_roundtrip():
    t = fsst.train(b"ababab cdcdcd ababab")
    data = t.serialize()
    t2, pos = fsst.SymbolTable.deserialize(data)
    assert pos == len(data)
    assert t2.symbols == t.symbols


@pytest.mark.parametrize("codec,typ,vals", [
    ("PLAIN", pa.string(), ["a", "bb", "", "ccc"] * 50),
    ("DELTA_LENGTH_BYTE_ARRAY", pa.binary(), [b"x" * i for i in range(100)]),
    ("DELTA_BYTE_ARRAY", pa.string(),
     [f"https://site/{i:06d}" for i in range(200)]),
    ("RLE_DICTIONARY", pa.string(), ["en", "de", "fr"] * 100),
    ("FSST", pa.string(), ["the quick brown fox " * 3] * 150),
    ("DELTA_BINARY_PACKED", pa.int64(), list(range(0, 5000, 7))),
    ("FOR", pa.int64(), [10_000_000 + i for i in range(500)]),
    ("RLE", pa.bool_(), [True] * 100 + [False] * 37),
    ("BYTE_STREAM_SPLIT", pa.float64(),
     [100.0 + i * 0.125 for i in range(300)]),
    ("BYTE_STREAM_SPLIT", pa.float32(),
     [float(i) / 7 for i in range(300)]),
    ("ALP", pa.float64(), [round(19.99 + i * 0.01, 2) for i in range(300)]),
    ("ALP", pa.float32(), [float(i) for i in range(300)]),
])
def test_force_codec_roundtrip(codec, typ, vals):
    """Every codec is reachable via force_codec (≙ explicitly-chosen
    encodings per type, `writer.rs:731-792`), not only when it wins."""
    from parquet_rs_ray.page import decode_page_row, encode_column_chunk
    from parquet_rs_ray.selector import CodecSelector
    col = pa.array(vals, typ)
    sel = CodecSelector(force_codec=codec)
    rows = encode_column_chunk("c", 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=len(col),
                               n_cols=1)
    assert all(r["codec"] == codec for r in rows)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.to_pylist()


def test_byte_stream_split_wins_under_auto_block_codec():
    """Clustered doubles (shared sign/exponent bytes): the bit-level
    splitters beat zstd over PLAIN, so the auto selector picks one —
    BYTE_STREAM_SPLIT originally; since ALP_RD landed it wins this
    corpus outright (its left-part dictionary is the precise form of
    what zstd recovers from BSS's byte transposition, measured 23.1 KB
    vs BSS's larger stacked size). BSS is never offered without a
    block codec (alone it is a pure permutation, raw size == PLAIN)
    and stays reachable via force_codec (matrix test above)."""
    import numpy as np
    from parquet_rs_ray.page import decode_page_row, encode_column_chunk
    from parquet_rs_ray.selector import CodecSelector
    rng = np.random.default_rng(9)
    # random-walk sensor values: near-constant high bytes, noisy mantissa
    vals = 1000.0 + np.cumsum(rng.standard_normal(4000) * 0.01)
    col = pa.chunked_array([pa.array(vals, pa.float64())])

    sel = CodecSelector(block_codec="auto")
    rows = encode_column_chunk("c", 0, col, selector=sel, path="",
                               block_id="b", block_rows=len(vals), n_cols=1)
    assert all(r["codec"] in ("BYTE_STREAM_SPLIT", "ALP_RD")
               for r in rows), [r["codec"] for r in rows]
    assert sum(r["encoded_size"] for r in rows) < \
        sum(r["plain_size"] for r in rows)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.combine_chunks().to_pylist()

    sel2 = CodecSelector(block_codec=None)
    rows2 = encode_column_chunk("c", 0, col, selector=sel2, path="",
                                block_id="b", block_rows=len(vals), n_cols=1)
    assert all(r["codec"] != "BYTE_STREAM_SPLIT" for r in rows2)


def test_alp_bitwise_roundtrip_adversarial():
    """ALP must roundtrip BIT-identically on every float, including the
    values the decimal model can't represent — those become verbatim
    exceptions (NaN, ±inf, -0.0, subnormals, mantissa noise)."""
    import numpy as np
    from parquet_rs_ray.codecs import alp
    from parquet_rs_ray.codecs.base import PhysicalType

    rng = np.random.default_rng(13)
    v = np.concatenate([
        np.round(rng.uniform(-1e6, 1e6, 2000), 2),       # 2-decimal bulk
        [np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324,     # specials
         1.7976931348623157e308, np.pi, np.e],
        rng.standard_normal(200),                        # mantissa noise
        rng.integers(-2**62, 2**62, 50).astype(np.float64),  # huge digits
    ])
    enc = alp.encode(v, PhysicalType.DOUBLE)
    got = alp.decode(enc, len(v), PhysicalType.DOUBLE)
    assert got.view(np.uint64).tolist() == v.view(np.uint64).tolist()

    v32 = np.concatenate([
        np.round(rng.uniform(-1e4, 1e4, 1500), 1),
        [np.nan, np.inf, -np.inf, -0.0, 1e-45],
        rng.standard_normal(100),
    ]).astype(np.float32)
    enc32 = alp.encode(v32, PhysicalType.FLOAT)
    got32 = alp.decode(enc32, len(v32), PhysicalType.FLOAT)
    assert got32.view(np.uint32).tolist() == v32.view(np.uint32).tolist()
    # empty chunk frames/parses
    e0 = alp.encode(np.empty(0, np.float64), PhysicalType.DOUBLE)
    assert len(alp.decode(e0, 0, PhysicalType.DOUBLE)) == 0


def test_alp_wins_on_decimal_floats_and_skips_noise():
    """2-decimal prices: ALP beats PLAIN in RAW bytes (no block codec
    needed, unlike BSS); iid mantissa noise: the probe bails and the
    selector never offers ALP."""
    import numpy as np
    from parquet_rs_ray.page import decode_page_row, encode_column_chunk
    from parquet_rs_ray.selector import CodecSelector

    rng = np.random.default_rng(17)
    prices = np.round(rng.uniform(1.0, 90000.0, 6000), 2)
    col = pa.chunked_array([pa.array(prices, pa.float64())])
    rows = encode_column_chunk("c", 0, col, selector=CodecSelector(),
                               path="", block_id="b",
                               block_rows=len(prices), n_cols=1)
    assert any(r["codec"] == "ALP" for r in rows), \
        [r["codec"] for r in rows]
    assert sum(r["encoded_size"] for r in rows) < \
        0.5 * sum(r["plain_size"] for r in rows)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.combine_chunks().to_pylist()

    noise = rng.standard_normal(6000)
    ncol = pa.chunked_array([pa.array(noise, pa.float64())])
    nrows = encode_column_chunk("c", 0, ncol, selector=CodecSelector(),
                                path="", block_id="b",
                                block_rows=len(noise), n_cols=1)
    assert all(r["codec"] != "ALP" for r in nrows)


def test_alp_rd_bitwise_roundtrip_and_selector():
    """ALP-RD (real-doubles split) roundtrips BIT-identically on noise
    floats incl. specials — it stores every bit — and the selector
    picks it for mantissa-noise columns where plain ALP bails."""
    import numpy as np
    from parquet_rs_ray.codecs import alp
    from parquet_rs_ray.codecs.base import PhysicalType
    from parquet_rs_ray.page import decode_page_row, encode_column_chunk
    from parquet_rs_ray.selector import CodecSelector

    rng = np.random.default_rng(21)
    v = np.concatenate([rng.standard_normal(4000),
                        [np.nan, np.inf, -np.inf, -0.0, 0.0, 5e-324]])
    enc = alp.encode_rd(v, PhysicalType.DOUBLE)
    got = alp.decode_rd(enc, len(v), PhysicalType.DOUBLE)
    assert got.view(np.uint64).tolist() == v.view(np.uint64).tolist()
    assert len(enc) < 0.95 * v.nbytes

    e32 = rng.uniform(-1, 1, 3000).astype(np.float32)   # embedding-like
    enc32 = alp.encode_rd(e32, PhysicalType.FLOAT)
    got32 = alp.decode_rd(enc32, len(e32), PhysicalType.FLOAT)
    assert got32.view(np.uint32).tolist() == e32.view(np.uint32).tolist()
    e0 = alp.encode_rd(np.empty(0, np.float32), PhysicalType.FLOAT)
    assert len(alp.decode_rd(e0, 0, PhysicalType.FLOAT)) == 0

    col = pa.chunked_array([pa.array(rng.standard_normal(6000),
                                     pa.float64())])
    rows = encode_column_chunk("c", 0, col, selector=CodecSelector(),
                               path="", block_id="b", block_rows=6000,
                               n_cols=1)
    assert any(r["codec"] == "ALP_RD" for r in rows), \
        [r["codec"] for r in rows]
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.combine_chunks().to_pylist()
