"""Per-column projection IO + per-block zone selection (reader.py).

The container's parquet footer doubles as the column index (one row
group per (block, source column) under layout="column"), so a
projected decode must READ only the selected columns' bytes and a
predicate must READ only the surviving blocks' row groups — the
byte-level behavior the reference gets from per-column chunk offsets
(`src/file/reader.rs:295-330`) and per-row-group metadata
(`src/file/metadata.rs:167-172`).
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_rs_ray.job import (committed_blocks, compact_job, decode_job,
                                encode_job)
from parquet_rs_ray.reader import (plan_container, plan_read,
                                   read_container_pages)
from parquet_rs_ray.webgen import write_web_shards


def _rchar() -> int:
    with open("/proc/self/io") as f:
        return int(next(l for l in f if l.startswith("rchar:")).split()[1])


@pytest.fixture(scope="module")
def web_encoded(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("webenc")
    paths = write_web_shards(str(tmp / "web"), rows_per_shard=400,
                             n_shards=2)
    out = str(tmp / "enc")
    # low own-rg threshold: url/html/text earn their own row groups at
    # this tiny scale too (at production block sizes the 256 KiB
    # default achieves the same split)
    encode_job(paths, out, concurrency=2, own_rg_min_bytes=4096)
    return paths, out


def _col_bytes(md, plan, cols):
    """Total byte size of the row groups whose footer identity is one of
    ``cols`` (column layout ⇒ min == max ⇒ exact attribution)."""
    return sum(md.row_group(i).total_byte_size
               for (i, _b, cmin, cmax) in plan
               if cmin == cmax and cmin in cols)


def test_projected_read_touches_only_selected_columns(web_encoded):
    """2-of-5-column read plan ≈ those columns' encoded bytes; actual
    bytes read (rchar) stay far below the container size (html+text
    dominate the corpus and must never leave disk)."""
    _paths, out = web_encoded
    files, _ = committed_blocks(out)
    for f in files:
        md = pq.ParquetFile(f).metadata
        plan = plan_container(md)
        # big columns sit in exact-identity row groups (min == max);
        # the small leftovers (warc_ts, lang) share one group
        own = {cmin for (_i, _b, cmin, cmax) in plan if cmin == cmax}
        assert {"url", "html", "text"} <= own
        _probe, full_fn = plan_read(md, columns=["url", "lang"])
        full = set(full_fn(set()))
        # the big unselected columns' bytes are never read ...
        skipped = {i for (i, _b, cmin, cmax) in plan
                   if cmin == cmax and cmin in ("html", "text")}
        assert full.isdisjoint(skipped)
        planned = sum(md.row_group(i).total_byte_size for i in full)
        total = sum(md.row_group(i).total_byte_size
                    for i in range(md.num_row_groups))
        # ... which is most of the container
        assert planned < 0.5 * total

        before = _rchar()
        pages = read_container_pages(f, columns=["url", "lang"])
        read_bytes = _rchar() - before
        # real IO ≈ selected row groups + footer, NOT the whole file
        assert read_bytes < 0.5 * os.path.getsize(f)
        # shared-group co-tenants may ride along; the big payloads never
        got = set(pages.column("column").to_pylist())
        assert "url" in got and "lang" in got
        assert not ({"html", "text"} & got)

    # and the decoded projection round-trips exactly
    exp = pa.concat_tables([pq.read_table(p, columns=["url", "lang"])
                            for p in _paths]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    got = decode_job(out, columns=["url", "lang"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(exp)


def test_predicate_reads_exactly_one_blocks_row_groups(ray_session,
                                                       tmp_path):
    """One container, two blocks with disjoint k ranges: the predicate's
    full read must touch only the matching block's row groups (the
    metadata probe pays tiny stats chunks for both)."""
    a = pa.table({"k": pa.array(range(0, 800), pa.int64()),
                  "s": pa.array([f"s{i:05d}" * 300 for i in range(800)])})
    p = str(tmp_path / "shard.parquet")
    pq.write_table(a, p, row_group_size=400)  # → 2 blocks, 1 container
    out = str(tmp_path / "enc")
    encode_job([p], out, concurrency=1, own_rg_min_bytes=4096)
    files, n_blocks = committed_blocks(out)
    assert len(files) == 1 and n_blocks == 2
    md = pq.ParquetFile(files[0]).metadata
    plan = plan_container(md)
    blocks = sorted({b for (_i, b, _c, _x) in plan})
    assert len(blocks) == 2

    probe, full_fn = plan_read(md, predicate=("k", ">=", 400))
    # probe: only k's row groups (one per block), payload-free columns
    probe_cols = {cmin for (i, _b, cmin, _x) in plan if i in set(probe)}
    assert probe_cols == {"k"}
    # emulate the probe verdict the reader computes
    pages = read_container_pages(files[0], predicate=("k", ">=", 400))
    touched_blocks = set(pages.column("block_id").to_pylist())
    assert len(touched_blocks) == 1  # second block's bytes never read
    full = full_fn({b for b in blocks if b not in touched_blocks})
    kept_blocks = {b for (i, b, _c, _x) in plan if i in set(full)}
    assert kept_blocks == touched_blocks

    got = decode_job(out, predicate=("k", ">=", 400)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(range(400, 800))
    assert list(got["s"]) == [f"s{i:05d}" * 300 for i in range(400, 800)]


def test_block_partition_slots_cover_exactly_once(web_encoded):
    """Intra-file parallel slots (i, k): the union over i of each slot's
    pages equals the unpartitioned read, with no block in two slots."""
    _paths, out = web_encoded
    files, _ = committed_blocks(out)
    f = files[0]
    whole = read_container_pages(f)
    seen = []
    for i in range(3):
        part = read_container_pages(f, part=(i, 3))
        if part is not None:
            seen.append(part)
    union = pa.concat_tables(seen)
    assert union.num_rows == whole.num_rows
    blocks_per_slot = [set(t.column("block_id").to_pylist()) for t in seen]
    for x in range(len(blocks_per_slot)):
        for y in range(x + 1, len(blocks_per_slot)):
            assert not (blocks_per_slot[x] & blocks_per_slot[y])


def test_legacy_block_layout_still_decodes_and_projects(ray_session,
                                                        tmp_path):
    """layout='block' (legacy) and layout='column' produce identical
    decodes — full, projected, and mixed in one corpus."""
    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=200,
                             n_shards=2)
    out_b = str(tmp_path / "legacy")
    out_c = str(tmp_path / "column")
    encode_job([paths[0]], out_b, concurrency=1, layout="block")
    encode_job([paths[1]], out_b, concurrency=1, layout="column")  # mixed
    encode_job(paths, out_c, concurrency=1)
    cols = ["url", "text"]
    a = decode_job(out_b, columns=cols).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    b = decode_job(out_c, columns=cols).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    fa = decode_job(out_b).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    fb = decode_job(out_c).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert fa.equals(fb)


def test_compaction_preserves_column_prunability(ray_session, tmp_path):
    """Merged containers keep per-(block, column) row groups verbatim, so
    projected reads stay cheap after compaction and decode is unchanged."""
    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=150,
                             n_shards=4)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=2, own_rg_min_bytes=2048)
    exp = decode_job(out, columns=["url", "lang"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    s = compact_job(out, target_file_bytes=1 << 30)
    assert s["files_merged"] >= 2
    files, _ = committed_blocks(out)
    assert len(files) == 1
    md = pq.ParquetFile(files[0]).metadata
    plan = plan_container(md)
    assert {"html", "text"} <= {cmin for (_i, _b, cmin, cmax) in plan
                                if cmin == cmax}
    _probe, full_fn = plan_read(md, columns=["url", "lang"])
    planned = sum(md.row_group(i).total_byte_size for i in full_fn(set()))
    total = sum(md.row_group(i).total_byte_size
                for i in range(md.num_row_groups))
    assert planned < 0.5 * total
    # REAL IO, not just the plan: a projected read of the compacted
    # container must leave the merged html/text bytes on disk
    before = _rchar()
    pages = read_container_pages(files[0], columns=["url", "lang"])
    read_bytes = _rchar() - before
    assert read_bytes < 0.5 * os.path.getsize(files[0])
    assert not ({"html", "text"}
                & set(pages.column("column").to_pylist()))
    got = decode_job(out, columns=["url", "lang"]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(exp)
