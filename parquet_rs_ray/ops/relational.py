"""Relational operators Ray Data lacks as one-liners, composed
Ray-Data-first (SURVEY §2.10 "custom operators" path):

* grouped_topk        — top-k rows per group (window-function shape)
                        via hash-partition + per-partition vectorized
                        rank, one Python call per PARTITION, not per
                        group (same scale design as ops/temporal.py)
* broadcast_hash_join — equi-join against a SMALL dimension table:
                        `ray.put` the table once, per-batch Acero
                        (pyarrow) hash join inside map_batches; the
                        canonical alternative to an all-to-all shuffle
                        join when one side fits in memory
* distinct_count      — exact global COUNT(DISTINCT col): per-batch
                        combiner dedup → groupby shuffle of DISTINCT
                        values only → count
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def grouped_topk(ds, *, group_col: str, order_col: str, k: int,
                 descending: bool = True, tiebreak_col: str | None = None,
                 num_partitions: int | None = None):
    """Top-k rows per group ordered by ``order_col`` (ties broken by
    ``tiebreak_col`` ascending for determinism). ≙ SQL
    ``QUALIFY row_number() OVER (PARTITION BY g ORDER BY o [DESC], t)
    <= k``. Only one map_groups call per hash PARTITION."""
    from .temporal import _default_partitions, _key_part, _new_key_mask
    P = num_partitions or _default_partitions()

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(group_col), P))

    sort_keys = [(group_col, "ascending"),
                 (order_col, "descending" if descending else "ascending")]
    if tiebreak_col:
        sort_keys.append((tiebreak_col, "ascending"))

    def per_part(group: pa.Table) -> pa.Table:
        g = group.sort_by(sort_keys)
        new_grp = _new_key_mask(g.column(group_col))
        seg_first = np.flatnonzero(new_grp)
        seg_of_row = np.cumsum(new_grp) - 1
        rank = np.arange(g.num_rows) - seg_first[seg_of_row]
        return g.filter(pa.array(rank < k)).drop_columns(["__part"])

    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")


def broadcast_hash_join(ds, small: pa.Table, *, on: str,
                        right_on: str | None = None,
                        join_type: str = "inner"):
    """Join a Dataset against a small in-memory table: the table is
    broadcast ONCE via ray.put and each batch runs one Acero hash join
    (`pa.Table.join`) — no shuffle of the big side, no per-batch
    reshipping. ``join_type``: "inner" or "left outer"."""
    import ray
    if join_type not in ("inner", "left outer"):
        # fail loudly like every other op's mode validation — silently
        # coercing e.g. "left_outer" to inner would drop unmatched rows
        raise ValueError(f"unknown join_type {join_type!r} "
                         "(use 'inner' or 'left outer')")
    small_ref = ray.put(small)
    rkey = right_on or on

    def join(batch: pa.Table) -> pa.Table:
        right = ray.get(small_ref)
        return batch.join(right, keys=[on], right_keys=[rkey],
                          join_type=join_type)

    return ds.map_batches(join, batch_format="pyarrow",
                          zero_copy_batch=True)


def distinct_count(ds, col: str):
    """Exact global COUNT(DISTINCT col), distributed: per-batch dedup
    (combiner — only distinct values leave each batch) → groupby(col)
    shuffle of the compacted values → one surviving row per value →
    count. Returns a 1-row pandas DataFrame {n_distinct}."""
    import pandas as pd
    import ray

    def local_distinct(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()  # COUNT(DISTINCT) excludes NULL (and
            # must agree with hll_distinct)
        return pa.table({col: arr.unique()})

    # groupby().count() is Ray-native vectorized aggregation — one row
    # per distinct value, no per-group Python dispatch. (.count() on the
    # result sums block row-counts; aggregate(Count()) collides with the
    # existing "count()" column.)
    distinct = ds.select_columns([col]) \
        .map_batches(local_distinct, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby(col).count()
    return pd.DataFrame({"n_distinct": [int(distinct.count())]})


def _grouped_cnt(t: pa.Table, keys: list, agg: str) -> pa.Table:
    """TableGroupBy with the count/sum column renamed to ``cnt`` — the
    shared map-side-combine kernel of quantiles and top_terms (one place
    to change if the merge convention ever does)."""
    if agg == "count":
        g = pa.TableGroupBy(t, keys).aggregate([([], "count_all")])
        src = "count_all"
    else:
        g = pa.TableGroupBy(t, keys).aggregate([("cnt", "sum")])
        src = "cnt_sum"
    return g.rename_columns(
        [n if n != src else "cnt" for n in g.column_names])


def exact_quantiles(ds, col: str, qs=(0.25, 0.5, 0.75, 0.9)):
    """EXACT distributed quantiles (SQL ``quantile_disc`` semantics:
    sorted[max(ceil(q·n)−1, 0)], nulls excluded) via a value-count
    histogram.

    Scale shape: each batch combines to (value, count) pairs, pairs
    merge per coarse hash partition, and only the MERGED histogram —
    bounded by column cardinality, not row count — reaches the driver
    for the final cumsum. The right regime for ints / categoricals /
    fixed-precision decimals; for unbounded-cardinality doubles the
    histogram degenerates to the column itself, so quantize first or
    accept the shuffle. Returns a pandas DataFrame (q, value)."""
    import pandas as pd

    from .temporal import _default_partitions, _key_part
    P = _default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if arr.null_count:
            arr = arr.drop_null()
        vc = arr.value_counts()
        return pa.table({col: vc.field("values"),
                         "cnt": vc.field("counts").cast(pa.int64())})

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(col), P))

    def merge(group: pa.Table) -> pa.Table:
        return _grouped_cnt(group.drop_columns(["__part"]), [col], "sum")

    hist = ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("__part").map_groups(merge, batch_format="pyarrow") \
        .sort(col)
    batches = list(hist.iter_batches(batch_format="pyarrow"))  # ONE exec
    tbl = pa.concat_tables(batches) if batches else \
        pa.table({col: [], "cnt": []})
    counts = np.asarray(tbl.column("cnt").to_numpy(zero_copy_only=False),
                        dtype=np.int64)
    cum = np.cumsum(counts)
    n = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    vals = tbl.column(col)
    for q in qs:
        if n == 0:
            out_q.append(q); out_v.append(None)
            continue
        target = max(int(np.ceil(q * n)) - 1, 0) + 1  # 1-based rank
        idx = int(np.searchsorted(cum, target))
        out_q.append(q)
        out_v.append(vals[idx].as_py())
    return pd.DataFrame({"q": out_q, "value": out_v})


def grouped_quantiles(ds, *, group_col: str, col: str,
                      qs=(0.25, 0.5, 0.75), num_partitions: int | None = None):
    """EXACT per-group quantiles (``quantile_disc`` semantics), fully
    distributed — unlike `exact_quantiles` nothing reaches the driver:
    batches combine to (group, value, cnt) histogram partials map-side,
    partials hash-partition by GROUP, and each partition resolves all
    its groups' quantiles in one vectorized pass (segment cumsum +
    searchsorted per quantile). Returns (group, q, value) rows.
    Groups whose values are ALL null are omitted (SQL would emit a
    NULL-valued row for them)."""
    from .temporal import _default_partitions, _key_part, _new_key_mask
    P = num_partitions or _default_partitions()
    qarr = np.asarray(sorted(qs), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group_col, col])
        vcol = t.column(col)
        if vcol.null_count:
            t = t.filter(pc.is_valid(vcol))  # quantile_disc skips nulls
        return _grouped_cnt(t, [group_col, col], "count")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(group_col), P))

    def per_part(group: pa.Table) -> pa.Table:
        t = _grouped_cnt(group.drop_columns(["__part"]),
                         [group_col, col], "sum") \
            .sort_by([(group_col, "ascending"), (col, "ascending")])
        gtype = t.schema.field(group_col).type
        vtype = t.schema.field(col).type
        if t.num_rows == 0:
            return pa.table({group_col: pa.array([], gtype),
                             "q": pa.array([], pa.float64()),
                             "value": pa.array([], vtype)})
        cnt = t.column("cnt").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        new_g = _new_key_mask(t.column(group_col))
        seg_first = np.flatnonzero(new_g)
        n_seg = len(seg_first)
        cum = np.cumsum(cnt)                      # global running count
        seg_base = np.zeros(n_seg, dtype=np.int64)
        seg_base[1:] = cum[seg_first[1:] - 1]     # rows before segment
        seg_end = np.append(seg_first[1:], len(cnt)) - 1
        seg_n = cum[seg_end] - seg_base           # rows per group
        # per (group, q): 1-based target rank, then searchsorted into the
        # group's cumulative counts (global cum minus the segment base)
        tgt = np.maximum(np.ceil(qarr[None, :] * seg_n[:, None]), 1) \
            .astype(np.int64)                     # (n_seg, n_q)
        flat_tgt = (tgt + seg_base[:, None]).ravel()
        idx = np.searchsorted(cum, flat_tgt, side="left")
        gidx = np.repeat(seg_first, len(qarr))
        return pa.table({
            group_col: t.column(group_col).take(pa.array(gidx)),
            "q": pa.array(np.tile(qarr, n_seg)),
            "value": t.column(col).take(pa.array(idx)),
        })

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")


def filter_by_group_quantile(ds, *, group_col: str, col: str,
                             q: float = 0.5,
                             num_partitions: int | None = None):
    """Keep only rows whose ``col`` value is >= their group's exact
    ``q``-quantile (``quantile_disc``) — the per-language "drop the
    bottom half by length" quality gate of web-corpus curation.

    Two-phase shape: the per-group thresholds come from the fully
    distributed `grouped_quantiles` (histogram partials shuffle, never
    raw rows), and since there is one threshold PER GROUP the result is
    a tiny table — it broadcasts back onto the stream as a
    constant-size lookup inside one map_batches filter (the classic
    aggregate-broadcast-join pattern; no second shuffle of the corpus).
    Rows with a null value or a group absent from the thresholds (an
    all-null group) are dropped, matching the SQL inner-join oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    thr = grouped_quantiles(ds, group_col=group_col, col=col, qs=(q,),
                            num_partitions=num_partitions)
    parts = [b for b in thr.iter_batches(batch_format="pyarrow")]
    tt = pa.concat_tables(parts) if parts else None
    if tt is None or tt.num_rows == 0:
        return ds.map_batches(lambda b: b.slice(0, 0),
                              batch_format="pyarrow",
                              zero_copy_batch=True)
    groups = tt.column(group_col).combine_chunks()
    cuts_ref = ray.put(tt.column("value").to_numpy(
        zero_copy_only=False))

    def keep(batch: pa.Table) -> pa.Table:
        cuts = ray.get(cuts_ref)
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        idx = pc.index_in(g, value_set=groups)
        v = batch.column(col)
        ok = pc.and_(pc.is_valid(idx), pc.is_valid(v))
        import numpy as np
        ix = idx.fill_null(0).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        vv = v.cast(pa.float64()).fill_null(0.0) \
            .to_numpy(zero_copy_only=False)
        passed = vv >= cuts[ix]
        return batch.filter(pc.and_(ok, pa.array(passed)))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)
