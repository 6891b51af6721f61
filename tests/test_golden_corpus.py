"""The reference's golden Parquet corpus (≙ its reader/record tests and
benches over `data/*.parquet` — `src/file/reader.rs:544-557`,
`benches/reader.rs:34-64`): every file must round-trip value-identical
through our selector → page → decode path, covering INT96 timestamps,
dictionary pages, snappy pages, v2 data pages, deep nesting, maps with
nulls, and malformed-dictionary recovery output."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_rs_ray.page import decode_page_row, encode_column_chunk
from parquet_rs_ray.selector import CodecSelector

GOLDEN_DIR = "/root/reference/data"
FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "*.parquet")))


@pytest.mark.skipif(not FILES, reason="reference corpus not present")
@pytest.mark.parametrize("path", FILES,
                         ids=[os.path.basename(f) for f in FILES])
@pytest.mark.parametrize("block_codec", [None, "auto"])
def test_golden_file_roundtrip(path, block_codec):
    tbl = pq.read_table(path)
    sel = CodecSelector(block_codec=block_codec)
    for i, name in enumerate(tbl.column_names):
        col = tbl.column(name)
        rows = encode_column_chunk(name, i, col, selector=sel, path="",
                                   block_id="b", block_rows=tbl.num_rows,
                                   n_cols=tbl.num_columns)
        got = pa.concat_arrays([decode_page_row(r) for r in rows])
        want = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        assert got.to_pylist() == want.to_pylist(), f"column {name}"
