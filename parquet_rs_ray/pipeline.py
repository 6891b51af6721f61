"""Ray Data encode/decode pipelines.

Shape (SURVEY §3.1): `ray.data.read_parquet(shards)` →
`map_batches(EncodeActor, batch_format="pyarrow", zero_copy_batch=True,
concurrency=...)` (actor pool holding reusable dict builders / FSST
symbol tables) → encoded-page dataset → optional per-shard writer with a
checkpoint manifest. Decode is a second `map_batches` pass
(`DecodeActor`) that must round-trip every column byte-identical.

One input block ≙ one reference row group; page rows for a block always
stay within one output batch (map_batches emits one output table per
input block, and we never repartition between encode and decode).
"""

from __future__ import annotations

import uuid
from collections import defaultdict

import numpy as np
import pyarrow as pa

from .page import PAGE_SCHEMA, decode_page_row, encode_column_chunk
from .selector import CodecSelector

META_COLUMNS = ("path",)


def _pin_arrow_threads() -> None:
    """Cap Arrow's intra-op thread pools inside Ray workers. Each worker
    is scheduled as 1 CPU; Arrow's default pool is cpu_count threads, so
    a 31-actor pool would run 31×32 threads and thrash the node once the
    pool covers most cores (measured: per-actor throughput halves)."""
    if pa.cpu_count() > 2:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)


class EncodeActor:
    """Stateful encode stage: one selector (with reusable FSST tables /
    dictionary scratch) per actor, set up once in __init__ (not per batch)."""

    def __init__(self, block_codec: str | None = None,
                 enable_fsst: bool = True, force_codec: str | None = None):
        _pin_arrow_threads()
        self.selector = CodecSelector(enable_fsst=enable_fsst,
                                      force_codec=force_codec,
                                      block_codec=block_codec)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        # group by source path when present (read_parquet include_paths)
        if "path" in batch.column_names:
            paths = batch.column("path")
            data_tbl = batch.drop_columns(["path"])
            uniq = paths.unique().to_pylist()
            if len(uniq) == 1:
                groups = [(uniq[0], data_tbl)]
            else:
                import pyarrow.compute as pc
                groups = [(p, data_tbl.filter(pc.equal(paths, p))) for p in uniq]
        else:
            groups = [("", batch)]
        for path, tbl in groups:
            block_id = uuid.uuid4().hex[:16]
            n_cols = tbl.num_columns
            for idx, name in enumerate(tbl.column_names):
                col = tbl.column(name)
                rows.extend(encode_column_chunk(
                    name, idx, col, selector=self.selector, path=path,
                    block_id=block_id, block_rows=tbl.num_rows, n_cols=n_cols))
        return pa.Table.from_pylist(rows, schema=PAGE_SCHEMA)


def decode_batch(batch: pa.Table) -> pa.Table:
    """Decode stage: page rows → original-schema table(s). Stateless —
    runs as Ray tasks (no actor pool needed)."""
    _pin_arrow_threads()
    rows = batch.to_pylist()
    blocks: dict[tuple, list[dict]] = defaultdict(list)
    for r in rows:
        blocks[(r["path"], r["block_id"])].append(r)
    out_tables = []
    for (_path, _bid), rs in blocks.items():
        by_col: dict[int, list[dict]] = defaultdict(list)
        for r in rs:
            by_col[r["col_idx"]].append(r)
        arrays, names = [], []
        for cidx in sorted(by_col):
            pages = sorted(by_col[cidx], key=lambda r: r["page_id"])
            assert len(pages) == pages[0]["n_pages"], \
                "block split across decode batches — do not repartition between encode and decode"
            parts = [decode_page_row(r) for r in pages]
            arr = pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
            assert len(arr) == pages[0]["block_rows"]
            arrays.append(arr)
            names.append(pages[0]["column"])
        out_tables.append(pa.table(dict(zip(names, arrays))))
    if len(out_tables) == 1:
        return out_tables[0]
    return pa.concat_tables(out_tables, promote_options="default")


def encode_dataset(ds, *, concurrency=(1, 8), block_codec: str | None = None,
                   enable_fsst: bool = True, force_codec: str | None = None):
    """Dataset of original rows → Dataset of encoded page rows (streaming)."""
    return ds.map_batches(
        EncodeActor,
        fn_constructor_kwargs={"block_codec": block_codec,
                               "enable_fsst": enable_fsst,
                               "force_codec": force_codec},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        concurrency=concurrency)


def decode_dataset(encoded_ds):
    """Dataset of page rows → Dataset with the original schema (streaming)."""
    return encoded_ds.map_batches(
        decode_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)


def roundtrip(ds, **kwargs):
    """encode → decode in one lazy pipeline (flagship correctness path)."""
    return decode_dataset(encode_dataset(ds, **kwargs))
