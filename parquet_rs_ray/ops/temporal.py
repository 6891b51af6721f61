"""Temporal operators Ray Data lacks natively: sessionization (windowed
aggregate) and as-of join — expressed as `groupby(key).map_groups` over
time-sorted per-key groups (the composition path of SURVEY §2.10 /
task-spec "custom operators": no raw actors needed).

Partitioning assumption (documented per task spec): one key's events fit
in a single group worker — true for user-keyed event streams (the
groupby shuffle delivers each key to exactly one `map_groups` call). At
10^12 events, salt hot keys first and merge adjacent sessions in a
second pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0):
    """Per-key sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Returns one row per session
    (key, session_id, n_events, start_ts, end_ts); session_id numbers
    sessions per key in time order from 1."""
    gap_us = int(gap_minutes * 60 * 1_000_000)

    def per_key(group: pa.Table) -> pa.Table:
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        new_session = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new_session[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        session_id = np.cumsum(new_session)
        starts = np.nonzero(new_session)[0]
        ends = np.append(starts[1:], len(ts)) - 1
        key = group.column(key_col)[0].as_py()
        ts_type = group.schema.field(ts_col).type
        return pa.table({
            key_col: pa.array([key] * len(starts),
                              group.schema.field(key_col).type),
            "session_id": pa.array(session_id[starts], pa.int64()),
            "n_events": pa.array(ends - starts + 1, pa.int64()),
            "start_ts": pa.array(ts[starts], pa.int64()).cast(ts_type),
            "end_ts": pa.array(ts[ends], pa.int64()).cast(ts_type),
        })

    return ds.select_columns([key_col, ts_col]).groupby(key_col) \
        .map_groups(per_key, batch_format="pyarrow")


def asof_join(left_ds, right_ds, *, key_col: str, ts_col: str,
              right_ts_name: str = "right_ts"):
    """For every left row, the greatest right ``ts_col`` ≤ the left row's
    (same key); null when no such right row. Composition: tag sides →
    union → groupby(key) → per-group vectorized searchsorted. Only
    (key, ts, id) triples shuffle."""
    ls = left_ds.schema()  # Ray schema wrapper: .names / .types lists
    left_fields = list(zip(ls.names, ls.types))

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column("__side",
                               pa.array([0] * b.num_rows, pa.int8()))

    def tag_right(b: pa.Table) -> pa.Table:
        # union requires identical schemas: project to (key, ts) and pad
        # the left-side payload columns with nulls, in left's order
        cols = {}
        for name, typ in left_fields:
            if name in (key_col, ts_col):
                cols[name] = b.column(name)
            else:
                cols[name] = pa.nulls(b.num_rows, typ)
        out = pa.table(cols)
        return out.append_column("__side",
                                 pa.array([1] * b.num_rows, pa.int8()))

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow",
                                      zero_copy_batch=True)
    right_tagged = right_ds.select_columns([key_col, ts_col]).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True)
    both = left_tagged.union(right_tagged)

    def per_key(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        lmask, rmask = side == 0, side == 1
        lts = ts[lmask]
        rts = np.sort(ts[rmask])
        ts_type = group.schema.field(ts_col).type
        out = group.filter(pa.array(lmask)).drop_columns(["__side"])
        if len(rts) == 0:
            matched = pa.nulls(len(lts), ts_type)
        else:
            idx = np.searchsorted(rts, lts, side="right") - 1
            vals = rts[np.maximum(idx, 0)]
            matched = pa.array(vals, pa.int64()).cast(ts_type)
            if (idx < 0).any():
                matched = pa.array(
                    [None if i < 0 else v.as_py()
                     for i, v in zip(idx, matched)], ts_type)
        return out.append_column(right_ts_name, matched)

    return both.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def range_join_broadcast(ds, ranges, *, value_col: str,
                         label_name: str = "band"):
    """Range join against a small interval table: each row labeled with
    the interval [lo, hi) containing ``value_col`` (null when none).

    ``ranges`` = [(label, lo, hi), ...], non-overlapping. The interval
    table is the broadcast small side (`ray.put` once, searchsorted per
    batch) — the canonical alternative to an all-to-all interval join
    when one side is tiny."""
    import ray

    rs = sorted(ranges, key=lambda r: r[1])
    labels = [r[0] for r in rs]
    los = np.array([r[1] for r in rs], dtype=np.float64)
    his = np.array([r[2] for r in rs], dtype=np.float64)
    bcast = ray.put((labels, los, his))

    def label(batch: pa.Table) -> pa.Table:
        lb, lo, hi = ray.get(bcast)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        idx = np.searchsorted(lo, v, side="right") - 1
        ok = (idx >= 0) & (v < hi[np.maximum(idx, 0)])
        out = [lb[i] if k else None for i, k in zip(idx, ok)]
        return batch.append_column(label_name, pa.array(out, pa.string()))

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)
