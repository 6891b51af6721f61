"""Exotic logical types (≙ Field::convert_*, `src/record/api.rs:449+`,
and legal physical/logical combos `src/schema/types.rs:238-387`) and
skewed inputs (giant html blobs — north-star skew case): every column
must round-trip exactly and giant values must force page cuts rather
than unbounded pages."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.page import (DATA_PAGE_SIZE, decode_page_row,
                                 encode_column_chunk)
from parquet_rs_ray.selector import CodecSelector


def _roundtrip_col(col: pa.Array, block_codec=None) -> list:
    sel = CodecSelector(block_codec=block_codec)
    rows = encode_column_chunk("c", 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=len(col),
                               n_cols=1)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.type == col.type
    return rows, got


@pytest.mark.parametrize("typ,vals", [
    (pa.decimal128(12, 2), ["123456.78", "-0.01", None, "99.99"]),
    (pa.decimal256(50, 2), ["1" * 40 + ".99", "-0.01", None, "7.00"]),
    (pa.date32(), [1, 20000, None, -5]),
    (pa.time32("ms"), [0, 86399999, None, 12]),
    (pa.time64("us"), [0, 86399999999, None, 12]),
    (pa.date64(), [86400000, 0, None, 172800000]),
    (pa.uint8(), [0, 255, None, 7]),
    (pa.uint32(), [0, 2**31 + 5, None, 7]),  # needs widening beyond int32
    (pa.uint64(), [0, 2**64 - 1, None, 2**63]),  # bit-reinterpret path
    (pa.int16(), [-32768, 32767, None, 0]),
    (pa.binary(4), [b"abcd", b"efgh", None, b"zzzz"]),
    (pa.large_string(), ["a", None, "bb", ""]),
    (pa.large_list(pa.int64()), [[1, 2], None, [], [3]]),
    (pa.float32(), [1.5, None, -2.25, 0.0]),
])
def test_exotic_type_roundtrip(typ, vals):
    if pa.types.is_decimal(typ):
        from decimal import Decimal
        vals = [None if v is None else Decimal(v) for v in vals]
    col = pa.array(vals, typ)
    _, got = _roundtrip_col(col)
    assert got.to_pylist() == col.to_pylist()


def test_uint32_widening_exact():
    """uint32 > int32 max must not wrap (INT32 physical is signed)."""
    col = pa.array([2**32 - 1, 0, 2**31], pa.uint32())
    _, got = _roundtrip_col(col)
    assert got.to_pylist() == [2**32 - 1, 0, 2**31]


def test_giant_blob_forces_page_cut():
    """One row larger than the page budget gets its own page (reference
    policy: cut on estimated size after append, `writer.rs:408-410`);
    nothing is truncated."""
    rng = np.random.default_rng(5)
    giant = rng.integers(0, 256, 3 * DATA_PAGE_SIZE, dtype=np.uint8).tobytes()
    small = [b"tiny-%d" % i for i in range(200)]
    items = small[:100] + [giant] + small[100:]
    col = pa.array(items, pa.binary())
    rows, got = _roundtrip_col(col, block_codec="auto")
    assert len(rows) >= 2  # the giant row forced a cut
    assert got.to_pylist() == items
    # cut-after-append policy (≙ `writer.rs:408-410`): a page may exceed
    # the budget only by its final (giant) value — dropping that value
    # must bring it back under budget
    giant_cost = len(giant) + 4
    for r in rows:
        if r["plain_size"] > 2 * DATA_PAGE_SIZE:
            assert r["plain_size"] - giant_cost <= DATA_PAGE_SIZE


def test_skewed_lang_distribution_dictionary():
    """Long-tail lang values (north-star skew case): 99% one value plus a
    tail — dictionary must win and round-trip, with the dict page tiny."""
    vals = ["en"] * 9900 + [f"xx-{i}" for i in range(100)]
    col = pa.array(vals, pa.string())
    rows, got = _roundtrip_col(col)
    assert got.to_pylist() == vals
    assert rows[0]["codec"] == "RLE_DICTIONARY"
    assert sum(r["encoded_size"] for r in rows) < 0.1 * sum(
        r["plain_size"] for r in rows)


NESTED_CASES = [
    pa.array([[1, None, 3], None, [], [4, 5]], pa.list_(pa.int64())),
    pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "z"}],
             pa.struct([("a", pa.int64()), ("b", pa.string())])),
    pa.array([[{"u": 1.5}, None], None, [{"u": None}]],
             pa.list_(pa.struct([("u", pa.float64())]))),
    pa.array([{"pos": [1, 2], "tag": "t"}, {"pos": None, "tag": None}],
             pa.struct([("pos", pa.list_(pa.int32())), ("tag", pa.string())])),
    pa.array([[[1], [None, 2]], None], pa.list_(pa.list_(pa.int64()))),
    pa.array([["a", None, "bb"], []], pa.list_(pa.string())),
]


@pytest.mark.parametrize("col", NESTED_CASES,
                         ids=[str(c.type) for c in NESTED_CASES])
@pytest.mark.parametrize("block_codec", [None, "auto"])
def test_nested_roundtrip(col, block_codec):
    """Dremel-style nesting with per-level validity: null elements inside
    lists, null structs, struct-of-list, list-of-struct, list-of-list
    (≙ record assembly over def/rep levels, `record/reader.rs:382-472`)."""
    _, got = _roundtrip_col(col, block_codec=block_codec)
    assert got.to_pylist() == col.to_pylist()


def test_dictionary_typed_input_roundtrip():
    """dictionary<string> Arrow input (read_parquet read_dictionary):
    decoded to values at encode; selector re-derives its own dict."""
    col = pa.array(["a", "b", "a", None, "c"] * 40).dictionary_encode()
    sel = CodecSelector()
    rows = encode_column_chunk("c", 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=len(col),
                               n_cols=1)
    got = pa.concat_arrays([decode_page_row(r) for r in rows])
    assert got.to_pylist() == col.to_pylist()


def test_dictionary_typed_input_roundtrips(ray_session):
    """pa.dictionary input columns encode and come back as their VALUE
    type (dictionary is an encoding, not a logical type — same stance
    as Parquet itself); values byte-identical."""
    import ray
    from parquet_rs_ray.pipeline import roundtrip
    tbl = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "cat": pa.array(["a", "b", "c", "a"] * 25,
                        pa.string()).dictionary_encode(),
    })
    out = roundtrip(ray.data.from_arrow(tbl), concurrency=2).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert out["cat"].tolist() == tbl.column("cat").to_pylist()
