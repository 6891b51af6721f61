"""Temporal operators Ray Data lacks natively: sessionization (windowed
aggregate), as-of join, and broadcast range join — composed from
map_batches + a coarse hash-partition groupby + per-partition vectorized
numpy kernels (SURVEY §2.10 / task-spec "custom operators").

Scale design (≙ VERDICT r1 #3): one `map_groups` call per KEY is pure
Python dispatch overhead at 10^8 keys, so rows are hash-partitioned on
the key into `num_partitions` coarse partitions (every row of a key
shares a partition) and each partition is ONE vectorized pass over all
its keys: Arrow sort by (key, ts), segment boundaries via
`key[1:] != key[:-1]`, session/as-of logic on whole arrays.

Hot keys: `sessionize(salt_period_minutes=...)` additionally salts the
partition key with a coarse TIME bucket and merges adjacent
cross-bucket sessions in a second, session-level pass (tiny rows), so
no single worker ever holds a hot key's full event stream. For as-of
joins a hot key stays in one partition but costs only its share of one
vectorized sort — document the regime, don't per-key-dispatch it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _default_partitions() -> int:
    import ray
    return max(2, int(ray.cluster_resources().get("CPU", 32)))


def _key_part(arr, num_partitions: int) -> pa.Array:
    """Deterministic partition id per key value (any key type; null- and
    uint64-safe)."""
    from .dedup import _hash_strings, int_column_u64, splitmix64
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        h = splitmix64(int_column_u64(arr))
    else:
        # cast FIRST: fill_null("") on a non-string array (float,
        # timestamp, bool) raises; on the string cast it always works
        arr = arr.cast(pa.string())
        if arr.null_count:
            arr = arr.fill_null("")
        h = _hash_strings(arr)
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


def _new_key_mask(key_arr: pa.Array) -> np.ndarray:
    """True where row starts a new key segment (sorted input); Arrow
    equality kernel — works for any key type, no Python compares.
    Null keys compare equal to each other (one group, matching
    groupby semantics) — plain pc.equal yields null there, which
    to_numpy turns into an object array that breaks `~`."""
    n = len(key_arr)
    mask = np.ones(n, dtype=bool)
    if n > 1:
        hi, lo = key_arr.slice(1), key_arr.slice(0, n - 1)
        eq = pc.fill_null(pc.equal(hi, lo), False)
        both_null = pc.and_(pc.is_null(hi), pc.is_null(lo))
        eq = pc.or_(eq, both_null)
        mask[1:] = ~eq.to_numpy(zero_copy_only=False)
    return mask


def sessionize(ds, *, key_col: str = "user_id", ts_col: str = "ts",
               gap_minutes: float = 30.0, num_partitions: int | None = None,
               salt_period_minutes: float | None = None):
    """Per-key sessions: a new session starts when the gap since the
    previous event exceeds ``gap_minutes``. Returns one row per session
    (key, session_id, n_events, start_ts, end_ts); session_id numbers
    sessions per key in time order from 1.

    ``salt_period_minutes`` (optional, >> gap): hot-key salting — stage
    1 sessionizes within (key, time-bucket) salted partitions, stage 2
    merges adjacent cross-bucket sessions per key over SESSION rows
    only (tiny), giving identical output to the unsalted path.
    """
    gap_us = int(gap_minutes * 60 * 1_000_000)
    P = num_partitions or _default_partitions()
    proj = ds.select_columns([key_col, ts_col])

    # a null timestamp has no position in any session (SQL windows
    # over ts skip them the same way) — drop map-side, BEFORE the
    # shuffle, or the int64 NaN conversion corrupts gap detection and
    # then crashes the session builder
    def _drop_null_ts(batch: pa.Table) -> pa.Table:
        col = batch.column(ts_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return batch.filter(pc.is_valid(col)) if col.null_count else batch

    proj = proj.map_batches(_drop_null_ts, batch_format="pyarrow",
                            zero_copy_batch=True)

    if salt_period_minutes is None:
        def add_part(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "__part", _key_part(batch.column(key_col), P))

        def per_part(group: pa.Table) -> pa.Table:
            return _sessionize_partition(
                group, key_col, ts_col, gap_us)

        return proj.map_batches(add_part, batch_format="pyarrow",
                                zero_copy_batch=True) \
            .groupby("__part").map_groups(per_part, batch_format="pyarrow")

    # ---- salted two-stage path ----
    period_us = int(salt_period_minutes * 60 * 1_000_000)
    if period_us <= gap_us:
        raise ValueError("salt_period_minutes must exceed gap_minutes")

    def add_salted_part(batch: pa.Table) -> pa.Table:
        kp = _key_part(batch.column(key_col), 1 << 20) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        tb = batch.column(ts_col).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False) // period_us
        part = ((kp * np.int64(1_000_003) + tb) % P).astype(np.int32)
        return batch.append_column("__part", pa.array(part)) \
            .append_column("__bucket", pa.array(tb))

    def stage1(group: pa.Table) -> pa.Table:
        # sessions within each (key, time-bucket); buckets don't span
        # partitions, keys may — stage 2 re-groups by key only
        return _sessionize_partition(group, key_col, ts_col, gap_us,
                                     extra_group_col="__bucket")

    sessions = proj.map_batches(add_salted_part, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("__part").map_groups(stage1, batch_format="pyarrow")

    def add_part2(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(key_col), P))

    def merge(group: pa.Table) -> pa.Table:
        # session-level merge: adjacent sessions of one key merge when
        # the cross-bucket gap closes (start_next - end_prev <= gap)
        g = group.sort_by([(key_col, "ascending"),
                           ("start_ts", "ascending")])
        starts = g.column("start_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ends = g.column("end_ts").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        nev = g.column("n_events").to_numpy(zero_copy_only=False)
        new_key = _new_key_mask(g.column(key_col))
        gapped = np.ones(len(starts), dtype=bool)
        if len(starts) > 1:
            gapped[1:] = (starts[1:] - ends[:-1]) > gap_us
        new_sess = new_key | gapped
        first = np.flatnonzero(new_sess)
        ts_type = g.schema.field("start_ts").type
        key_first = np.flatnonzero(new_key)        # ⊆ first
        key_of_sess = np.searchsorted(key_first, first, side="right") - 1
        first_sess_of_key = np.searchsorted(first, key_first[key_of_sess])
        sid = np.arange(len(first)) - first_sess_of_key + 1
        return pa.table({
            key_col: g.column(key_col).take(pa.array(first)),
            "session_id": pa.array(sid, pa.int64()),
            "n_events": pa.array(np.add.reduceat(nev, first), pa.int64()),
            "start_ts": pa.array(starts[first], pa.int64()).cast(ts_type),
            "end_ts": pa.array(
                ends[np.append(first[1:], len(ends)) - 1],
                pa.int64()).cast(ts_type),
        })

    return sessions.map_batches(add_part2, batch_format="pyarrow",
                                zero_copy_batch=True) \
        .groupby("__part").map_groups(merge, batch_format="pyarrow")


def _sessionize_partition(group: pa.Table, key_col: str, ts_col: str,
                          gap_us: int, extra_group_col: str | None = None):
    """Vectorized sessionization of ONE partition (many keys)."""
    sort_keys = [(key_col, "ascending")]
    if extra_group_col:
        sort_keys.append((extra_group_col, "ascending"))
    sort_keys.append((ts_col, "ascending"))
    g = group.sort_by(sort_keys)
    ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    n = len(ts)
    if n == 0:
        ts_type = group.schema.field(ts_col).type
        return pa.table({
            key_col: group.column(key_col).slice(0, 0),
            "session_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "start_ts": pa.array([], pa.int64()).cast(ts_type),
            "end_ts": pa.array([], pa.int64()).cast(ts_type),
        })
    new_key = _new_key_mask(g.column(key_col))
    if extra_group_col:
        new_key |= _new_key_mask(g.column(extra_group_col))
    gapped = np.ones(n, dtype=bool)
    gapped[1:] = (ts[1:] - ts[:-1]) > gap_us
    new_sess = new_key | gapped
    first = np.flatnonzero(new_sess)               # session start rows
    last = np.append(first[1:], n) - 1             # session end rows
    # session_id within key: session ordinal minus ordinal of the key's
    # first session + 1
    key_first = np.flatnonzero(new_key)            # rows starting a key
    # ordinal (0-based) of each session; sessions starting a key reset
    sess_ord = np.arange(len(first))
    key_of_sess = np.searchsorted(key_first, first, side="right") - 1
    first_sess_of_key = np.searchsorted(first, key_first[key_of_sess])
    sid = sess_ord - first_sess_of_key + 1
    ts_type = g.schema.field(ts_col).type
    out = {
        key_col: g.column(key_col).take(pa.array(first)),
        "session_id": pa.array(sid, pa.int64()),
        "n_events": pa.array(last - first + 1, pa.int64()),
        "start_ts": pa.array(ts[first], pa.int64()).cast(ts_type),
        "end_ts": pa.array(ts[last], pa.int64()).cast(ts_type),
    }
    return pa.table(out)


def asof_join(left_ds, right_ds, *, key_col: str, ts_col: str,
              right_ts_name: str = "right_ts",
              num_partitions: int | None = None, mode: str = "shuffle"):
    """For every left row, the greatest right ``ts_col`` ≤ the left
    row's (same key); null when no such right row.

    ``mode="shuffle"`` (default): tag sides → union → hash-partition on
    key → per-partition vectorized merge scan: Arrow sort by (key, ts,
    side right-first), forward-fill the last right-row index with
    `np.maximum.accumulate`, reset at key boundaries. Only (key, ts,
    left payload) rows shuffle; one Python call per PARTITION.

    ``mode="broadcast"``: the HOT-KEY / small-right regime — the right
    side's (key, ts) pairs are collected once, sorted, and `ray.put`;
    each left batch resolves matches locally with per-key searchsorted.
    The left side never shuffles at all, so a key owning 50% of left
    rows costs nothing extra (left stays embarrassingly parallel)."""
    if mode == "broadcast":
        return _asof_join_broadcast(left_ds, right_ds, key_col=key_col,
                                    ts_col=ts_col,
                                    right_ts_name=right_ts_name)
    P = num_partitions or _default_partitions()
    ls = left_ds.schema()  # Ray schema wrapper: .names / .types lists
    left_fields = list(zip(ls.names, ls.types))

    def tag_left(b: pa.Table) -> pa.Table:
        return b.append_column("__side",
                               pa.array(np.ones(b.num_rows, np.int8)))

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
                                 pa.array(np.zeros(b.num_rows, np.int8)))

    left_tagged = left_ds.map_batches(tag_left, batch_format="pyarrow",
                                      zero_copy_batch=True)
    right_tagged = right_ds.select_columns([key_col, ts_col]).map_batches(
        tag_right, batch_format="pyarrow", zero_copy_batch=True)
    both = left_tagged.union(right_tagged)

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(key_col), P))

    def per_part(group: pa.Table) -> pa.Table:
        # null key/ts handling: a null RIGHT row can never match (drop);
        # a null LEFT row emits with a null match. Nulls would otherwise
        # poison the int64 ts view (to_numpy goes float64+NaN) and the
        # key-boundary mask.
        kv = pc.and_(pc.is_valid(group.column(key_col)),
                     pc.is_valid(group.column(ts_col)))
        null_left = None
        if group.num_rows and not pc.all(kv).as_py():
            bad = pc.invert(kv)
            null_left = group.filter(pc.and_(
                bad, pc.equal(group.column("__side"), 1)))
            group = group.filter(kv)
        # right rows (side=0) sort before left rows at equal ts, so the
        # forward scan's "last right so far" includes ties (≤ semantics)
        g = group.sort_by([(key_col, "ascending"), (ts_col, "ascending"),
                           ("__side", "ascending")])
        n = g.num_rows
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        side = g.column("__side").to_numpy(zero_copy_only=False)
        new_key = _new_key_mask(g.column(key_col))
        seg_first = np.flatnonzero(new_key)
        seg_of_row = np.cumsum(new_key) - 1
        seg_start = seg_first[seg_of_row]          # first row of own key
        r_pos = np.where(side == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(r_pos)
        valid = last_r >= seg_start
        matched = ts[np.maximum(last_r, 0)]
        ts_type = g.schema.field(ts_col).type
        matched_arr = pc.if_else(
            pa.array(valid),
            pa.array(matched, pa.int64()).cast(ts_type),
            pa.scalar(None, ts_type))
        lmask = side == 1
        out = g.filter(pa.array(lmask)) \
            .drop_columns(["__side", "__part"])
        out = out.append_column(right_ts_name,
                                matched_arr.filter(pa.array(lmask)))
        if null_left is not None and null_left.num_rows:
            nl = null_left.drop_columns(["__side", "__part"]) \
                .append_column(right_ts_name,
                               pa.nulls(null_left.num_rows, ts_type))
            out = pa.concat_tables([out, nl])
        return out

    return both.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")


def _asof_join_broadcast(left_ds, right_ds, *, key_col: str, ts_col: str,
                         right_ts_name: str):
    """Broadcast-right as-of join (see asof_join mode='broadcast')."""
    import ray

    side = pa.concat_tables(
        right_ds.select_columns([key_col, ts_col]).iter_batches(
            batch_format="pyarrow"))
    # null right keys/timestamps can never be matched and break the
    # object-array searchsorted below (shuffle mode drops them via
    # _key_part / _new_key_mask)
    side = side.filter(pc.and_(pc.is_valid(side.column(key_col)),
                               pc.is_valid(side.column(ts_col))))
    side = side.sort_by([(key_col, "ascending"), (ts_col, "ascending")])
    rk = side.column(key_col).combine_chunks() \
        if isinstance(side.column(key_col), pa.ChunkedArray) \
        else side.column(key_col)
    rts = side.column(ts_col).cast(pa.int64()) \
        .to_numpy(zero_copy_only=False)
    # key segment table: unique keys + [start, end) offsets
    new_key = _new_key_mask(rk) if len(rk) else np.zeros(0, bool)
    starts = np.flatnonzero(new_key)
    ends = np.append(starts[1:], len(rts))
    uniq_keys = rk.take(pa.array(starts)) if len(starts) else rk.slice(0, 0)
    uk_np = uniq_keys.to_numpy(zero_copy_only=False)
    bcast = ray.put((uk_np, starts, ends, rts))

    def match(batch: pa.Table) -> pa.Table:
        uk, st, en, ts_sorted = ray.get(bcast)
        # null left keys/timestamps are "no match": a None inside the
        # object-array searchsorted raises TypeError, and a null ts
        # turns the int64 cast into float64+NaN (matches-last garbage)
        lvalid = pc.and_(pc.is_valid(batch.column(key_col)),
                         pc.is_valid(batch.column(ts_col))) \
            .to_numpy(zero_copy_only=False)
        vrows = np.flatnonzero(lvalid)
        lk = batch.column(key_col).take(pa.array(vrows)) \
            .to_numpy(zero_copy_only=False)
        lt = batch.column(ts_col).take(pa.array(vrows)).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        n = batch.num_rows
        out_ts = np.zeros(n, dtype=np.int64)
        valid = np.zeros(n, dtype=bool)
        if len(uk) and len(vrows):
            ki = np.searchsorted(uk, lk)
            has_key = (ki < len(uk)) & (uk[np.minimum(ki, len(uk) - 1)] == lk)
            # per distinct batch key: one vectorized searchsorted over
            # that key's right segment (few distinct keys per batch in
            # the hot-key regime this mode targets)
            for k in np.unique(ki[has_key]):
                sel = has_key & (ki == k)
                rows = vrows[np.flatnonzero(sel)]
                seg = ts_sorted[st[k]:en[k]]
                pos = np.searchsorted(seg, lt[sel], side="right") - 1
                ok = pos >= 0
                out_ts[rows[ok]] = seg[pos[ok]]
                valid[rows] = ok
        ts_type = batch.schema.field(ts_col).type
        matched = pc.if_else(pa.array(valid),
                             pa.array(out_ts, pa.int64()).cast(ts_type),
                             pa.scalar(None, ts_type))
        return batch.append_column(right_ts_name, matched)

    return left_ds.map_batches(match, batch_format="pyarrow",
                               zero_copy_batch=True)


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
    labels = np.array([r[0] for r in rs], dtype=object)
    los = np.array([r[1] for r in rs], dtype=np.float64)
    his = np.array([r[2] for r in rs], dtype=np.float64)
    bcast = ray.put((labels, los, his))

    def label(batch: pa.Table) -> pa.Table:
        lb, lo, hi = ray.get(bcast)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        idx = np.searchsorted(lo, v, side="right") - 1
        ok = (idx >= 0) & (v < hi[np.maximum(idx, 0)])
        out = np.where(ok, lb[np.maximum(idx, 0)], None)
        return batch.append_column(label_name, pa.array(out, pa.string()))

    return ds.map_batches(label, batch_format="pyarrow",
                          zero_copy_batch=True)


def rolling_window(ds, *, key_col: str, ts_col: str,
                   value_col: str | None = None,
                   preceding_minutes: float = 5.0,
                   num_partitions: int | None = None):
    """Per-ROW sliding-window aggregate — SQL ``COUNT(*)/SUM(...) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL W PRECEDING AND
    CURRENT ROW)``: for every event, the count (``roll_cnt``) and exact
    integer-cents sum (``roll_cents``, when ``value_col`` is given) of
    same-key events with ts in [ts − W, ts]. RANGE semantics: frame
    bounds are VALUES, so peers (equal ts) are always included; NULL-ts
    rows form their own peer group per key (their frame is exactly the
    key's NULL rows — SQL NULLS LAST ordering), and a frame whose
    values are all NULL sums to NULL, exactly as SQL ``SUM() OVER``.

    Vectorized with NO per-key loop: rows hash-partition by key, each
    partition sorts by (key, ts) once, then key segments are LINEARIZED
    onto one monotonic int64 axis — segment k's timestamps shift to
    base_k with base_{k+1} ≥ base_k + span_k + W + 2, so a single global
    ``np.searchsorted`` per bound resolves every row's frame without
    windows ever crossing a key boundary. Frame sums come from one
    prefix-sum (cum[right] − cum[left]). Falls back to a per-segment
    loop only on int64 overflow of the linearized axis (Σ spans +
    (W+2)·segments ≥ 2^63 — centuries of µs)."""
    w_us = int(round(preceding_minutes * 60 * 1_000_000))
    P = num_partitions or _default_partitions()

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column(key_col), P))

    def roll_frames(g: pa.Table) -> pa.Table:
        """Frames for a sorted (key, ts) table with NO null ts."""
        n = g.num_rows
        if n == 0:
            return _attach_roll(g, np.zeros(0, np.int64),
                                np.zeros(0, np.int64))
        ts = g.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        new_key = _new_key_mask(g.column(key_col))
        seg_first = np.flatnonzero(new_key)          # segment start rows
        seg_of = np.cumsum(new_key) - 1              # segment id per row
        seg_min = ts[seg_first]                      # sorted: first = min
        seg_last = np.append(seg_first[1:], n) - 1
        spans = ts[seg_last] - ts[seg_first]         # exact int64
        # overflow guard (float is fine for the GUARD, never the axis:
        # float spans would round near 2^53 and shrink inter-segment
        # gaps) BEFORE any uint64 cumsum — a wrapped cumsum can land
        # back under the limit and silently corrupt the axis
        if spans.astype(np.float64).sum() \
                + len(seg_first) * (w_us + 2) < 2.0 ** 62:
            su = spans.astype(np.uint64)
            bases = np.zeros(len(seg_first), dtype=np.uint64)
            np.cumsum(su[:-1] + np.uint64(w_us + 2), out=bases[1:])
            lin = (bases[seg_of] + (ts - seg_min[seg_of])
                   .astype(np.uint64)).astype(np.int64)
            left = np.searchsorted(lin, lin - w_us, side="left")
            right = np.searchsorted(lin, lin, side="right")
        else:                                        # pragma: no cover
            left = np.empty(n, dtype=np.int64)       # centuries of µs
            right = np.empty(n, dtype=np.int64)
            for k in range(len(seg_first)):
                s, e = seg_first[k], seg_last[k] + 1
                left[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e] - w_us, side="left")
                right[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e], side="right")
        return _attach_roll(g, left, right)

    def null_frames(g: pa.Table) -> pa.Table:
        """Frames for the NULL-ts rows (sorted by key): each row's frame
        is its key's whole NULL run."""
        n = g.num_rows
        new_key = _new_key_mask(g.column(key_col))
        seg_first = np.flatnonzero(new_key)
        seg_of = np.cumsum(new_key) - 1
        seg_end = np.append(seg_first[1:], n)
        return _attach_roll(g, seg_first[seg_of], seg_end[seg_of])

    def _attach_roll(g, left, right):
        out = g.append_column(
            "roll_cnt", pa.array((right - left).astype(np.int64)))
        if value_col is None:
            return out
        from .window import half_away_cents
        n = g.num_rows
        v = g.column(value_col)
        vn = v.cast(pa.float64()).to_numpy(zero_copy_only=False)
        cents = half_away_cents(vn)
        # NaN values are masked like nulls — their cents would
        # int64-cast to garbage and poison the shared prefix-sum
        # (ADVICE r2; NaN≡NULL semantics as in ops/window.py)
        null_mask = (np.asarray(pc.is_null(v)) | np.isnan(vn)) if n \
            else np.zeros(0, dtype=bool)
        if null_mask.any():
            cents = np.where(null_mask, 0.0, cents)
        cum = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(cents.astype(np.int64), out=cum[1:])
        cumnn = np.zeros(n + 1, dtype=np.int64)
        np.cumsum((~null_mask).astype(np.int64), out=cumnn[1:])
        # SQL SUM over an all-NULL frame is NULL, not 0
        all_null = (cumnn[right] - cumnn[left]) == 0
        return out.append_column(
            "roll_cents", pa.array(cum[right] - cum[left], mask=all_null))

    def per_part(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__part"]) \
            .sort_by([(key_col, "ascending"), (ts_col, "ascending")])
        tcol = g.column(ts_col)
        if isinstance(tcol, pa.ChunkedArray):
            tcol = tcol.combine_chunks()
        if tcol.null_count:
            valid = pc.is_valid(tcol)
            parts = [roll_frames(g.filter(valid)),
                     null_frames(g.filter(pc.invert(valid)))]
            return pa.concat_tables([p for p in parts if p.num_rows])
        return roll_frames(g)

    return ds.map_batches(add_part, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")
