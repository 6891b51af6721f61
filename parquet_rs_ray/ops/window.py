"""Tumbling / hopping windowed aggregates over a timestamp column — the
"windowed aggregate" custom operator of the task spec (Ray Data has no
native window functions; SURVEY §2.10 "custom operators").

Scale design: the raw event stream is NEVER shuffled. Each input batch
is partially aggregated to (key, window) partials with Arrow's C++
``TableGroupBy`` inside ``map_batches`` (the map-side combiner), so the
only all-to-all exchange moves one tiny partial row per (key, window,
block) — orders of magnitude smaller than the input at any realistic
window width. Partials are then hash-partitioned on (key, window) into
~num_cpus coarse partitions and merged with ONE vectorized group-by per
partition (same coarse-partition pattern as ops/temporal.py — no
per-group Python dispatch).

Hopping windows (width W, hop H, W = n·H) use the classic two-level
scheme: partial-aggregate to HOP granularity first, then fan each hop
partial out to the n windows containing it (duplicating tiny partials,
never events), then merge. Tumbling is the n = 1 case.

Sums are computed in integer cents (``half_away_cents``) so grouped
totals are bit-exact regardless of reduction order — float sums are
order-dependent and would not be reproducible across partitionings.
Rows with a null timestamp are dropped (SQL ``time_bucket`` would group
them under NULL; a windowed aggregate over unknown time is meaningless).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import splitmix64

_US_PER_MIN = 60_000_000

# output/internal column names an aggregate stage owns — user key/value
# columns must not collide with them (windowed_agg validates)
_RESERVED = ("__hb", "__ws", "__part", "__nn", "window_start",
             "n_events", "value_cents", "value_min", "value_max")

# TableGroupBy appends the agg name; this is the exact (and only)
# rename set — suffix guessing would mangle user columns like "bytes_sum"
_AGG_RENAME = {"n_events_sum": "n_events", "value_cents_sum": "value_cents",
               "value_min_min": "value_min", "value_max_max": "value_max",
               "__nn_sum": "__nn"}


def half_away_cents(values: np.ndarray) -> np.ndarray:
    """value·100 rounded half AWAY from zero, as float (caller casts).
    Matches SQL ``round()``; ``np.rint`` is half-to-even and diverges on
    exact half-cents (0.125 → 12 vs SQL 13)."""
    c = values * 100.0
    return np.copysign(np.floor(np.abs(c) + 0.5), c)


def _merge_aggs(value_col: str | None):
    """(col, agg) list — used for the map-side partials AND for merging
    them (sums/counts add, min/max re-min/max)."""
    aggs = [("n_events", "sum")]
    if value_col is not None:
        aggs += [("value_cents", "sum"), ("value_min", "min"),
                 ("value_max", "max"), ("__nn", "sum")]
    return aggs


def _rename_grouped(t: pa.Table) -> pa.Table:
    return t.rename_columns([_AGG_RENAME.get(n, n)
                             for n in t.column_names])


def windowed_agg(ds, *, ts_col: str = "ts", key_col: str | None = None,
                 value_col: str | None = None, width_minutes: float = 60.0,
                 hop_minutes: float | None = None,
                 num_partitions: int | None = None):
    """Aggregate per (key, window): ``n_events`` plus, when ``value_col``
    is given, ``value_cents`` (exact integer-cents sum), ``value_min``,
    ``value_max``. ``window_start`` is emitted as timestamp[us].

    ``hop_minutes`` (must divide ``width_minutes``) turns tumbling into
    hopping windows: each event lands in width/hop overlapping windows.
    """
    from .temporal import _default_partitions

    for col in (key_col, ts_col, value_col):
        if col is not None and col in _RESERVED:
            raise ValueError(
                f"column name {col!r} collides with a windowed_agg "
                f"output/internal column ({', '.join(_RESERVED)})")

    width_us = int(round(width_minutes * _US_PER_MIN))
    hop_us = width_us if hop_minutes is None else \
        int(round(hop_minutes * _US_PER_MIN))
    if width_us % hop_us:
        raise ValueError("width_minutes must be a multiple of hop_minutes")
    n_per = width_us // hop_us
    nparts = num_partitions or _default_partitions()
    keys = ([key_col] if key_col else []) + ["__hb"]

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col)
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if ts.null_count:
            keep = pc.is_valid(ts)
            batch = batch.filter(keep)
            ts = ts.filter(keep)
        t_us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        hb = np.floor_divide(t_us, hop_us) * hop_us  # hop-bucket start
        cols = {"__hb": pa.array(hb), "n_events": pa.array(
            np.ones(len(hb), dtype=np.int64))}
        if key_col:
            cols[key_col] = batch.column(key_col)
        if value_col is not None:
            v = batch.column(value_col)
            if isinstance(v, pa.ChunkedArray):
                v = v.combine_chunks()
            # canonicalize signed zeros (-0.0 + 0.0 = +0.0): Arrow's
            # grouped min/max treats -0.0 == 0.0 and returns either,
            # which is partitioning-dependent — canonical inputs make
            # the result deterministic on any cluster shape
            vn = v.cast(pa.float64()).to_numpy(zero_copy_only=False) + 0.0
            cents = half_away_cents(vn)
            # SUM/MIN/MAX ignore nulls: contribute 0 cents / ±inf.
            # Non-null NaN values are masked like nulls too — their
            # cents would int64-cast to garbage and silently poison
            # every sum sharing the partial (ADVICE r2); DuckDB errors
            # on the equivalent CAST, so skipping is the deterministic
            # choice (documented NaN≡NULL semantics).
            null_mask = np.asarray(pc.is_null(v)) | np.isnan(vn)
            if null_mask.any():
                # ±inf/0 identities make Arrow's grouped aggs skip
                # nulls; __nn tracks non-null counts so all-NULL
                # windows surface as SQL NULL, not the identities
                cents = np.where(null_mask, 0.0, cents)
                cols["value_min"] = pa.array(
                    np.where(null_mask, np.inf, vn))
                cols["value_max"] = pa.array(
                    np.where(null_mask, -np.inf, vn))
            else:
                cols["value_min"] = pa.array(vn)
                cols["value_max"] = pa.array(vn)
            cols["value_cents"] = pa.array(cents.astype(np.int64))
            cols["__nn"] = pa.array(
                (~null_mask).astype(np.int64))
        t = pa.table(cols)
        return _rename_grouped(
            pa.TableGroupBy(t, keys).aggregate(_merge_aggs(value_col)))

    def fan_out(batch: pa.Table) -> pa.Table:
        """Hop partial → its n_per containing windows (tumbling: rename
        only). window w contains hop bucket b iff w ≤ b < w+width, i.e.
        w = b - k·hop for k in 0..n_per-1."""
        hb = batch.column("__hb").to_numpy(zero_copy_only=False)
        if n_per == 1:
            ws = hb
            rest = batch.drop_columns(["__hb"])
        else:
            offs = (np.arange(n_per, dtype=np.int64) * hop_us)
            ws = (hb[:, None] - offs[None, :]).ravel()
            idx = np.repeat(np.arange(len(hb), dtype=np.int64), n_per)
            rest = batch.drop_columns(["__hb"]).take(pa.array(idx))
        part = (splitmix64(ws.astype(np.uint64))
                % np.uint64(nparts)).astype(np.int32)
        return rest.append_column("__ws", pa.array(ws)) \
                   .append_column("__part", pa.array(part))

    def merge(group: pa.Table) -> pa.Table:
        gkeys = ([key_col] if key_col else []) + ["__ws"]
        t = _rename_grouped(
            pa.TableGroupBy(group.drop_columns(["__part"]), gkeys)
            .aggregate(_merge_aggs(value_col)))
        if value_col is not None:
            # all-NULL window: SQL SUM/MIN/MAX return NULL, not the
            # aggregation identities (0 / +inf / -inf)
            nn0 = np.asarray(pc.equal(t.column("__nn"), 0))
            if nn0.any():
                for name in ("value_cents", "value_min", "value_max"):
                    vals = t.column(name).to_numpy(zero_copy_only=False)
                    t = t.set_column(
                        t.column_names.index(name), name,
                        pa.array(vals, mask=nn0))
            t = t.drop_columns(["__nn"])
        ws = t.column("__ws").cast(pa.timestamp("us"))
        return t.drop_columns(["__ws"]).append_column("window_start", ws)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True) \
        .map_batches(fan_out, batch_format="pyarrow", zero_copy_batch=True)
    return partials.groupby("__part").map_groups(
        merge, batch_format="pyarrow")
