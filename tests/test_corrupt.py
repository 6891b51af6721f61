"""Corrupt-input handling (≙ reference corrupt-footer tests,
`src/file/reader.rs:532-592`, and AFL fuzz harness `fuzz/src/main.rs`):
truncated / garbage page buffers must raise typed DecodeError /
FormatError naming the page, and torn manifest entries must read as
uncommitted (resume re-executes them instead of crashing)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray import manifest
from parquet_rs_ray.errors import DecodeError, FormatError
from parquet_rs_ray.page import decode_page_row, encode_column_chunk
from parquet_rs_ray.selector import CodecSelector


def _pages_for(col, name="c"):
    sel = CodecSelector()
    return encode_column_chunk(name, 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=len(col),
                               n_cols=1)


def _corrupt(row, **kw):
    r = dict(row)
    r.update(kw)
    return r


def test_roundtrip_then_truncated_data_raises():
    col = pa.array([f"value-{i:06d}" for i in range(500)], pa.string())
    [row] = _pages_for(col)
    assert decode_page_row(row).to_pylist() == col.to_pylist()
    with pytest.raises(DecodeError, match="column='c'"):
        decode_page_row(_corrupt(row, data=row["data"][:7]))


def test_garbage_compressed_bytes_raise():
    col = pa.array(list(range(4096)), pa.int64())
    sel = CodecSelector(block_codec="zstd")
    [row] = encode_column_chunk("ints", 0, pa.chunked_array([col]),
                                selector=sel, path="", block_id="b",
                                block_rows=len(col), n_cols=1)
    assert row["block_codec"] == "zstd"
    bad = os.urandom(len(row["data"]))
    with pytest.raises(DecodeError):
        decode_page_row(_corrupt(row, data=bad))


def test_unknown_codec_is_format_error():
    col = pa.array([1.5, 2.5], pa.float64())
    [row] = _pages_for(col)
    with pytest.raises(FormatError, match="unknown codec"):
        decode_page_row(_corrupt(row, codec="NOT_A_CODEC"))


def test_torn_manifest_entry_treated_as_uncommitted(tmp_path):
    mdir = str(tmp_path / "manifest")
    manifest.record(mdir, "shard-a", output_path="[]", rows=1,
                    plain_bytes=1, encoded_bytes=1, codecs={}, checksum="x")
    manifest.record(mdir, "shard-b", output_path="[]", rows=1,
                    plain_bytes=1, encoded_bytes=1, codecs={}, checksum="x")
    # tear shard-b's entry mid-json (simulates a crash during commit)
    name = manifest._entry_name("shard-b")
    with open(os.path.join(mdir, name), "w") as f:
        f.write('{"shard": "shard-b", "rows"')
    todo = manifest.pending(mdir, ["shard-a", "shard-b", "shard-c"])
    assert todo == ["shard-b", "shard-c"]


def test_wrong_num_values_raises_not_garbage():
    col = pa.array(np.arange(1000, dtype=np.int64))
    [row] = _pages_for(col)
    bad = _corrupt(row, data=row["data"][: len(row["data"]) // 2])
    with pytest.raises(DecodeError):
        arr = decode_page_row(bad)
        # if a codec tolerates truncation it must still fail the length
        if len(arr) != row["num_values"]:
            raise DecodeError("short page")
