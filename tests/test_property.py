"""Hypothesis property tests: randomized encode→decode equality for
every (type × codec) combination, mirroring the reference's RandGen
roundtrips (`src/util/test_common.rs:28-132`,
`src/encodings/encoding.rs:1179-1265`) including encoder re-use across
chunks and block-boundary sizes (64/128/256/257,
`src/encodings/decoding.rs:1092-1148`)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_rs_ray.codecs import (ByteArrayVals, PhysicalType, delta,
                                   delta_bytes, dictionary, forpack, fsst,
                                   levels, plain, rlebool)
from parquet_rs_ray.rle import rle_decode, rle_encode
from parquet_rs_ray.page import decode_page_row, encode_column_chunk
from parquet_rs_ray.selector import CodecSelector

SIZES = st.sampled_from([1, 2, 63, 64, 128, 256, 257, 1000])


def _bav(items: list[bytes]) -> ByteArrayVals:
    return ByteArrayVals.from_pylist(items)


@settings(max_examples=25, deadline=None)
@given(st.data(), SIZES, st.integers(1, 8))
def test_rle_roundtrip(data, n, bit_width):
    vals = data.draw(st.lists(
        st.integers(0, (1 << bit_width) - 1), min_size=n, max_size=n))
    arr = np.asarray(vals, dtype=np.int32)
    out = rle_decode(rle_encode(arr, bit_width), bit_width, n)
    assert out.tolist() == vals


@settings(max_examples=25, deadline=None)
@given(st.data(), SIZES, st.booleans())
def test_delta_binary_packed_roundtrip(data, n, is32):
    lo, hi = (-(2**31), 2**31 - 1) if is32 else (-(2**63), 2**63 - 1)
    vals = data.draw(st.lists(st.integers(lo, hi), min_size=n, max_size=n))
    arr = np.asarray(vals, dtype=np.int32 if is32 else np.int64)
    out = delta.decode(delta.encode(arr, is32), is32)
    assert out.tolist() == vals  # wrapping arithmetic must round-trip


@settings(max_examples=25, deadline=None)
@given(st.data(), SIZES, st.booleans())
def test_forpack_roundtrip(data, n, is32):
    lo, hi = (-(2**31), 2**31 - 1) if is32 else (-(2**62), 2**62 - 1)
    vals = data.draw(st.lists(st.integers(lo, hi), min_size=n, max_size=n))
    arr = np.asarray(vals, dtype=np.int32 if is32 else np.int64)
    out = forpack.decode(forpack.encode(arr, is32), is32)
    assert out.tolist() == vals


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=40), min_size=1, max_size=300))
def test_delta_length_and_delta_byte_array_roundtrip(items):
    v = _bav(items)
    out = delta_bytes.decode_delta_length(
        delta_bytes.encode_delta_length(v), len(items))
    assert out.to_pylist() == items
    out2 = delta_bytes.decode_delta_byte_array(
        delta_bytes.encode_delta_byte_array(v), len(items))
    assert out2.to_pylist() == items


@settings(max_examples=20, deadline=None)
@given(st.lists(st.binary(min_size=0, max_size=30), min_size=1, max_size=300))
def test_plain_and_dict_byte_array_roundtrip(items):
    v = _bav(items)
    out = plain.decode(PhysicalType.BYTE_ARRAY,
                       plain.encode(PhysicalType.BYTE_ARRAY, v), len(items))
    assert out.to_pylist() == items
    data, page, entries = dictionary.encode(PhysicalType.BYTE_ARRAY, v)
    out2 = dictionary.decode(PhysicalType.BYTE_ARRAY, data, page, entries,
                             len(items))
    assert out2.to_pylist() == items


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=200))
def test_fsst_roundtrip(texts):
    items = [t.encode() for t in texts]
    v = _bav(items)
    table = fsst.train(v.data.tobytes())
    out = fsst.decode(fsst.encode(v, table))
    assert out.to_pylist() == items


@settings(max_examples=25, deadline=None)
@given(st.lists(st.booleans(), min_size=1, max_size=600))
def test_rle_bool_and_validity_roundtrip(bits):
    arr = np.asarray(bits, dtype=bool)
    assert rlebool.decode(rlebool.encode(arr), len(bits)).tolist() == bits
    assert levels.decode_validity(levels.encode_validity(arr),
                                  len(bits)).tolist() == bits


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_full_page_roundtrip_nullable_mixed(data):
    """Fuzz the whole page layer: nullable columns of several Arrow
    types through selector → page rows → decode."""
    n = data.draw(st.integers(1, 400))
    kind = data.draw(st.sampled_from(["int", "str", "float", "ts"]))
    vals = data.draw(st.lists(
        {"int": st.integers(-2**40, 2**40),
         "str": st.text(max_size=20),
         "float": st.floats(allow_nan=False),
         "ts": st.integers(0, 2**45)}[kind]
        | st.none(), min_size=n, max_size=n))
    typ = {"int": pa.int64(), "str": pa.string(), "float": pa.float64(),
           "ts": pa.timestamp("us")}[kind]
    col = pa.chunked_array([pa.array(vals, typ)])
    sel = CodecSelector(block_codec=data.draw(
        st.sampled_from([None, "auto", "zstd"])))
    rows = encode_column_chunk("c", 0, col, selector=sel, path="",
                               block_id="b", block_rows=n, n_cols=1)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.combine_chunks().to_pylist()


def _nested_type(draw, depth):
    leaf = st.sampled_from([pa.int64(), pa.float64(), pa.string()])
    if depth <= 0:
        return draw(leaf)
    kind = draw(st.sampled_from(["leaf", "list", "struct"]))
    if kind == "leaf":
        return draw(leaf)
    if kind == "list":
        return pa.list_(_nested_type(draw, depth - 1))
    nf = draw(st.integers(1, 3))
    return pa.struct([(f"f{i}", _nested_type(draw, depth - 1))
                      for i in range(nf)])


def _value_for(draw, typ):
    if draw(st.integers(0, 9)) == 0:
        return None
    if pa.types.is_int64(typ):
        return draw(st.integers(-2**40, 2**40))
    if pa.types.is_float64(typ):
        return draw(st.floats(allow_nan=False, allow_infinity=False))
    if pa.types.is_string(typ):
        return draw(st.text(max_size=12))
    if pa.types.is_list(typ):
        return [_value_for(draw, typ.value_type)
                for _ in range(draw(st.integers(0, 4)))]
    if pa.types.is_struct(typ):
        return {typ.field(i).name: _value_for(draw, typ.field(i).type)
                for i in range(typ.num_fields)}
    raise AssertionError(typ)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_random_nested_roundtrip(data):
    """Fuzz the nested codec with random type trees (depth ≤ 3, nulls at
    every level) — ≙ the reference's AFL fuzz harness intent, aimed at
    the record-assembly layer."""
    typ = _nested_type(data.draw, 3)
    n = data.draw(st.integers(1, 60))
    vals = [_value_for(data.draw, typ) for _ in range(n)]
    col = pa.array(vals, typ)
    sel = CodecSelector(block_codec=data.draw(
        st.sampled_from([None, "auto"])))
    rows = encode_column_chunk("c", 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=n, n_cols=1)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.to_pylist()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.one_of(st.none(), st.text(max_size=60)), max_size=40),
       st.lists(st.one_of(st.none(), st.binary(max_size=60)), max_size=40))
def test_hash_strings_large_offset_parity(texts, blobs):
    """_hash_strings must accept large_string/large_binary (int64
    offsets — the >2 GiB-batch regime) and hash byte-identically to the
    int32-offset types, including sliced arrays (VERDICT r2 item 6)."""
    from parquet_rs_ray.ops.dedup import _hash_strings
    cases = [
        (pa.array(texts, pa.string()), pa.array(texts, pa.large_string())),
        (pa.array(blobs, pa.binary()), pa.array(blobs, pa.large_binary())),
    ]
    for small, large in cases:
        assert np.array_equal(_hash_strings(small), _hash_strings(large))
        if len(small) > 2:
            assert np.array_equal(_hash_strings(small.slice(1, 2)),
                                  _hash_strings(large.slice(1, 2)))


@settings(max_examples=25, deadline=None)
@given(st.data(), SIZES, st.booleans())
def test_byte_stream_split_roundtrip(data, n, is_double):
    """BYTE_STREAM_SPLIT is a pure byte permutation: decode(encode(v))
    must be bit-identical for any floats incl. NaN/inf/-0.0."""
    from parquet_rs_ray.codecs import bss
    phys = PhysicalType.DOUBLE if is_double else PhysicalType.FLOAT
    dt = np.float64 if is_double else np.float32
    specials = [0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300 if is_double else 1e-30]
    vals = data.draw(st.lists(
        st.one_of(st.floats(allow_nan=True, width=64 if is_double else 32),
                  st.sampled_from(specials)),
        min_size=n, max_size=n))
    v = np.array(vals, dtype=dt)
    out = bss.decode(bss.encode(v, phys), n, phys)
    assert out.dtype == v.dtype
    assert np.array_equal(out.view(np.uint8), v.view(np.uint8))


@given(st.lists(st.one_of(
    st.floats(width=64, allow_nan=True, allow_infinity=True),
    st.decimals(min_value=-10**9, max_value=10**9, places=2)
    .map(float)), min_size=0, max_size=400))
@settings(max_examples=60, deadline=None)
def test_alp_roundtrip_property(vals):
    """ALP is bitwise-lossless on arbitrary doubles: decimals take the
    digit path, everything else (nan/inf/-0.0/noise) must survive as
    verbatim exceptions."""
    import numpy as np
    from parquet_rs_ray.codecs import alp
    from parquet_rs_ray.codecs.base import PhysicalType

    v = np.asarray(vals, np.float64)
    enc = alp.encode(v, PhysicalType.DOUBLE)
    got = alp.decode(enc, len(v), PhysicalType.DOUBLE)
    assert got.view(np.uint64).tolist() == v.view(np.uint64).tolist()
