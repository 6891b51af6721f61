"""Projected container reads: the parquet footer IS the column index.

A container file stores encoded blocks as parquet row groups over
PAGE_SCHEMA rows. With ``layout="column"`` (the encode default) each
row group holds the pages of exactly ONE (block, source-column) pair,
so the footer's row-group statistics for the ``block_id`` and
``column`` fields identify every row group without any stored index —
the same role the reference's per-row-group metadata plays
(`/root/reference/src/file/metadata.rs:167-172`), where a projected
read seeks one column chunk's byte range
(`/root/reference/src/file/reader.rs:295-330`). Consequences:

* ``columns=[...]`` reads ONLY the selected source columns' row groups
  — a 2-of-5-column decode reads ~those columns' encoded bytes, not
  the whole container;
* a ``predicate`` first reads the payload-free metadata chunks
  (block_id, column, stats_json, stats_crc32) of the predicate
  columns' row groups, proves blocks unmatched, and then reads only
  the surviving blocks' selected row groups — per-block zone
  selection INSIDE a kept container, below the manifest's file-level
  elimination.

Legacy ``layout="block"`` files (one row group per block, all columns
together) stay readable by the same planner: their ``column`` bounds
span several names, `_rg_may_contain` conservatively keeps them, and
the page-level pruner drops the unneeded pages after the read. Every
decision is sound-by-construction: missing/truncated footer stats ⇒
keep; unknown block id ⇒ keep; the exact post-decode filter always
runs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from .pipeline import (_normalize_predicates, decode_batch,
                       make_exact_filter, make_page_pruner,
                       provably_unmatched_blocks)

# payload-free projection for the predicate probe: everything the
# block-level pruner needs, none of the data/dict/levels bytes
_PROBE_COLUMNS = ["block_id", "column", "stats_json", "stats_crc32"]


def plan_container(md) -> list[tuple[int, str | None, str | None, str | None]]:
    """``(rg_index, block_id | None, column_min, column_max)`` per row
    group, from footer statistics alone (no payload IO). ``block_id``
    is exact when the row group holds a single block (min == max, true
    for both layouts); ``None`` means unknown ⇒ callers must keep the
    row group. ``column_min/max`` of ``None`` likewise means unknown."""
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    bi, ci = names.index("block_id"), names.index("column")
    plan = []
    for i in range(md.num_row_groups):
        rg = md.row_group(i)
        sb = rg.column(bi).statistics
        sc = rg.column(ci).statistics
        block = sb.min if (sb is not None and sb.has_min_max
                           and sb.min == sb.max) else None
        if sc is not None and sc.has_min_max:
            cmin, cmax = sc.min, sc.max
        else:
            cmin, cmax = None, None
        plan.append((i, block, cmin, cmax))
    return plan


def _rg_may_contain(cmin, cmax, cols) -> bool:
    """May this row group hold pages of any column in ``cols``? Unknown
    bounds ⇒ True (sound). Exact for column-layout row groups
    (min == max); for legacy all-column row groups the [min, max] name
    range keeps the group whenever a wanted column sorts inside it."""
    if cmin is None or cmax is None:
        return True
    return any(cmin <= c <= cmax for c in cols)


def plan_read(md, *, columns=None, predicate=None,
              part: tuple[int, int] = (0, 1)):
    """Pure planning step (unit-testable without IO): returns
    ``(probe_rgs, full_rgs_fn)`` where ``probe_rgs`` are the row groups
    whose metadata chunks the predicate probe must read, and
    ``full_rgs_fn(drop_blocks)`` yields the row groups to read fully
    once the probe proved ``drop_blocks`` unmatched. ``part=(i, k)``
    restricts to this task's share of the file's blocks (blocks sorted
    by id, slot ``i::k``) for intra-file parallelism."""
    preds = _normalize_predicates(predicate)
    pred_cols = {p[0] for p in preds}
    if columns:
        from .reorder import PERM_COL
        keep_cols = set(columns) | pred_cols | {PERM_COL}
    else:
        keep_cols = None
    plan = plan_container(md)

    i_part, k_part = part
    if k_part > 1:
        blocks_sorted = sorted({b for (_, b, _, _) in plan if b is not None})
        mine = set(blocks_sorted[i_part::k_part])

        def part_ok(b):
            # a row group whose block id the footer can't prove goes to
            # slot 0 only — read exactly once, never dropped
            return (b in mine) if b is not None else (i_part == 0)
    else:
        def part_ok(b):
            return True

    probe_rgs = [i for (i, b, cmin, cmax) in plan
                 if preds and part_ok(b)
                 and _rg_may_contain(cmin, cmax, pred_cols)]

    def full_rgs_fn(drop_blocks: set) -> list[int]:
        return [i for (i, b, cmin, cmax) in plan
                if part_ok(b)
                and (b is None or b not in drop_blocks)
                and (keep_cols is None
                     or _rg_may_contain(cmin, cmax, keep_cols))]

    return probe_rgs, full_rgs_fn


def read_container_pages(path: str, *, columns=None, predicate=None,
                         part: tuple[int, int] = (0, 1)) -> pa.Table | None:
    """Page rows of one container, restricted at the IO layer to this
    task's blocks, the selected columns' row groups, and (under a
    predicate) the blocks the metadata probe could not rule out.
    ``None`` when nothing in this container/part can match."""
    pf = pq.ParquetFile(path)
    probe_rgs, full_rgs_fn = plan_read(
        pf.metadata, columns=columns, predicate=predicate, part=part)
    drop_blocks: set = set()
    preds = _normalize_predicates(predicate)
    if preds and probe_rgs:
        meta = pf.read_row_groups(probe_rgs, columns=_PROBE_COLUMNS)
        if meta.num_rows:
            drop_blocks = provably_unmatched_blocks(meta, preds)
    full_rgs = full_rgs_fn(drop_blocks)
    if not full_rgs:
        return None
    return pf.read_row_groups(full_rgs)


def make_container_decoder(columns=None, predicate=None):
    """Batch fn for ``map_batches`` over read descriptors
    ``{file: str, part_i: int, part_k: int}`` → decoded original-schema
    tables, one yield per descriptor (streaming; a task holding several
    descriptors never concatenates them). Fuses read → IO-level row
    group selection → page-level prune → decode → exact filter in ONE
    task, so encoded pages never transit the object store."""
    pruner = make_page_pruner(columns, predicate)
    exact = make_exact_filter(columns, predicate)

    def decode_files(batch: pa.Table):
        from .pipeline import _pin_arrow_threads
        _pin_arrow_threads()
        got_any = False
        for f, i, k in zip(batch.column("file").to_pylist(),
                           batch.column("part_i").to_pylist(),
                           batch.column("part_k").to_pylist()):
            pages = read_container_pages(
                f, columns=columns, predicate=predicate, part=(i, k))
            if pages is None or pages.num_rows == 0:
                continue
            if pruner is not None:
                pages = pruner(pages)
                if pages.num_rows == 0:
                    continue
            out = decode_batch(pages)
            if exact is not None:
                out = exact(out)
            got_any = True
            yield out
        if not got_any:
            # Ray requires at least one (possibly empty) output batch
            yield pa.table({})

    return decode_files
