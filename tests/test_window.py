"""Windowed aggregate operator (ops/window.py) vs DuckDB ground truth."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.window import windowed_agg

SF = "/root/testdata/sf0.001"


def _oracle(sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return con.execute(sql).fetchdf()


def _cmp(df, odf, keys):
    a = df.sort_values(keys).reset_index(drop=True)[sorted(df.columns)]
    b = odf.sort_values(keys).reset_index(drop=True)[sorted(odf.columns)]
    assert list(a.columns) == list(b.columns)
    assert a.astype(str).equals(b.astype(str))


def test_tumbling_window_oracle(ray_session):
    import ray
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "event_type", "value"])
    out = windowed_agg(ds, ts_col="ts", key_col="event_type",
                       value_col="value", width_minutes=60).to_pandas()
    odf = _oracle(
        "SELECT event_type, time_bucket(INTERVAL '60 minutes', ts) AS "
        "window_start, CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS "
        "value_cents, MIN(value) AS value_min, MAX(value) AS value_max "
        "FROM events GROUP BY event_type, "
        "time_bucket(INTERVAL '60 minutes', ts)")
    _cmp(out, odf, ["event_type", "window_start"])


def test_hopping_window_oracle(ray_session):
    import ray
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "event_type", "value"])
    out = windowed_agg(ds, ts_col="ts", key_col="event_type",
                       value_col="value", width_minutes=60,
                       hop_minutes=15).to_pandas()
    odf = _oracle(
        "SELECT event_type, ws AS window_start, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS "
        "value_cents, MIN(value) AS value_min, MAX(value) AS value_max "
        "FROM (SELECT e.*, time_bucket(INTERVAL '15 minutes', ts) "
        "- k * (INTERVAL '15 minutes') AS ws "
        "FROM events e, unnest([0,1,2,3]) AS t(k)) "
        "GROUP BY event_type, ws")
    _cmp(out, odf, ["event_type", "window_start"])
    # every event lands in exactly width/hop windows
    n = _oracle("SELECT COUNT(*) AS n FROM events")["n"][0]
    assert out["n_events"].sum() == 4 * n


def test_window_no_key_and_count_only(ray_session):
    import ray
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    out = windowed_agg(ds, ts_col="ts", width_minutes=1440).to_pandas()
    odf = _oracle(
        "SELECT time_bucket(INTERVAL '24 hours', ts) AS window_start, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM events "
        "GROUP BY time_bucket(INTERVAL '24 hours', ts)")
    _cmp(out, odf, ["window_start"])


def test_window_nulls_and_negative_ts(ray_session):
    """Null ts rows are dropped; null values ignored by sum/min/max;
    an ALL-null window yields SQL NULL (not identities); pre-epoch
    timestamps floor toward -inf (window containing, not truncation
    toward zero)."""
    import ray
    ts = pa.array([-90 * 60_000_000, -30 * 60_000_000, 30 * 60_000_000,
                   None], pa.timestamp("us"))
    val = pa.array([1.25, None, 3.5, 9.9], pa.float64())
    tbl = pa.table({"ts": ts, "value": val})
    out = windowed_agg(ray.data.from_arrow(tbl), ts_col="ts",
                       value_col="value", width_minutes=60).to_pandas()
    out = out.sort_values("window_start").reset_index(drop=True)
    starts = (out["window_start"].astype("int64") // 60_000_000).tolist()
    assert starts == [-120, -60, 0]
    assert out["n_events"].tolist() == [1, 1, 1]
    assert out["value_cents"][0] == 125 and out["value_cents"][2] == 350
    # all-null window: SQL SUM/MIN/MAX are NULL, never 0 / +inf / -inf
    assert out["value_cents"].isna()[1]
    assert out["value_min"].isna()[1] and out["value_max"].isna()[1]


def test_window_and_rolling_nan_values_mask_like_null(ray_session):
    """ADVICE r2: a non-null NaN value must not int64-poison the cents
    sums — NaN ≡ NULL (skipped; all-NaN window/frame sums NULL)."""
    import ray
    from parquet_rs_ray.ops.temporal import rolling_window
    M = 60_000_000
    tbl = pa.table({
        "ts": pa.array([0, 10 * M, 70 * M, 80 * M], pa.timestamp("us")),
        "k": pa.array(["a", "a", "a", "a"]),
        "value": pa.array([1.25, float("nan"), float("nan"),
                           float("nan")], pa.float64()),
    })
    out = windowed_agg(ray.data.from_arrow(tbl), ts_col="ts",
                       value_col="value", width_minutes=60).to_pandas() \
        .sort_values("window_start").reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 2]
    assert out["value_cents"][0] == 125      # NaN skipped, not garbage
    assert out["value_cents"].isna()[1]      # all-NaN window → NULL
    assert out["value_min"].isna()[1] and out["value_max"].isna()[1]

    roll = rolling_window(ray.data.from_arrow(
        tbl.append_column("event_id", pa.array(np.arange(4)))),
        key_col="k", ts_col="ts", value_col="value",
        preceding_minutes=30).to_pandas().sort_values("event_id") \
        .reset_index(drop=True)
    assert roll["roll_cnt"].tolist() == [1, 2, 1, 2]
    assert roll["roll_cents"][0] == 125 and roll["roll_cents"][1] == 125
    assert roll["roll_cents"].isna()[2] and roll["roll_cents"].isna()[3]


def test_window_hop_must_divide_width(ray_session):
    import ray
    ds = ray.data.range(1)
    with pytest.raises(ValueError):
        windowed_agg(ds, ts_col="ts", width_minutes=60, hop_minutes=25)


def test_window_half_cent_rounding_matches_sql(ray_session):
    """np.rint would give 12 for 0.125·100; SQL round() gives 13 —
    half_away_cents must match SQL."""
    import ray
    from parquet_rs_ray.ops.window import half_away_cents
    # note 1.005*100 = 100.4999... in float64, so BOTH sides give 100
    assert half_away_cents(np.array([0.125, -0.125, 1.005])).tolist() == \
        [13.0, -13.0, 100.0]
    assert duckdb.sql("SELECT round(0.125::DOUBLE*100), "
                      "round(-0.125::DOUBLE*100), "
                      "round(1.005::DOUBLE*100)").fetchone() == \
        (13.0, -13.0, 100.0)
    ts = pa.array([0, 1], pa.timestamp("us"))
    val = pa.array([0.125, -0.125], pa.float64())
    out = windowed_agg(ray.data.from_arrow(pa.table({"ts": ts, "value": val})),
                       ts_col="ts", value_col="value",
                       width_minutes=1).to_pandas()
    assert out["value_cents"].tolist() == [0]  # 13 + (-13)
    odf = duckdb.sql(
        "SELECT CAST(SUM(CAST(round(v*100) AS BIGINT)) AS BIGINT) AS c "
        "FROM (VALUES (0.125::DOUBLE), (-0.125::DOUBLE)) t(v)").fetchone()
    assert odf[0] == 0


def test_window_reserved_column_names_raise(ray_session):
    import ray
    ds = ray.data.range(1)
    with pytest.raises(ValueError):
        windowed_agg(ds, ts_col="ts", key_col="n_events")
    with pytest.raises(ValueError):
        windowed_agg(ds, ts_col="ts", value_col="__ws")


# ------------------------------------------------------- property fuzz

from hypothesis import given, settings, strategies as st


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_window_random_events_vs_duckdb(ray_session, data):
    """Random keys/timestamps/values (incl. negatives, ties, sub-cent
    precision) must match the DuckDB oracle bit-exactly for tumbling
    AND hopping windows."""
    import ray
    n = data.draw(st.integers(1, 120))
    rng_ts = data.draw(st.lists(
        st.integers(-10**9, 10**9), min_size=n, max_size=n))
    vals = data.draw(st.lists(
        st.one_of(st.none(),
                  st.floats(-1e4, 1e4, allow_nan=False, width=32)),
        min_size=n, max_size=n))
    keys = data.draw(st.lists(st.sampled_from(["a", "b", "c"]),
                              min_size=n, max_size=n))
    hop = data.draw(st.sampled_from([None, 5]))
    # -0.0 excluded: windowed_agg canonicalizes signed zeros (+0.0) while
    # DuckDB MIN orders -0.0 < 0.0 — a representation detail, not a value
    tbl = pa.table({"ts": pa.array(rng_ts, pa.timestamp("us")),
                    "value": pa.array(
                        [None if v is None else float(v) + 0.0
                         for v in vals], pa.float64()),
                    "k": pa.array(keys, pa.string())})
    out = windowed_agg(ray.data.from_arrow(tbl), ts_col="ts", key_col="k",
                       value_col="value", width_minutes=10,
                       hop_minutes=hop).to_pandas()
    con = duckdb.connect()
    con.register("ev", tbl)
    if hop is None:
        sql = ("SELECT k, time_bucket(INTERVAL '10 minutes', ts) AS "
               "window_start, CAST(COUNT(*) AS BIGINT) AS n_events, "
               "CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS "
               "value_cents, MIN(value) AS value_min, MAX(value) AS "
               "value_max FROM ev GROUP BY 1, 2")
    else:
        sql = ("SELECT k, ws AS window_start, "
               "CAST(COUNT(*) AS BIGINT) AS n_events, "
               "CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS "
               "value_cents, MIN(value) AS value_min, MAX(value) AS "
               "value_max FROM (SELECT e.*, "
               "time_bucket(INTERVAL '5 minutes', ts) - kk * "
               "(INTERVAL '5 minutes') AS ws FROM ev e, "
               "unnest([0]) AS t(kk) UNION ALL SELECT e.*, "
               "time_bucket(INTERVAL '5 minutes', ts) - 1 * "
               "(INTERVAL '5 minutes') AS ws FROM ev e) GROUP BY 1, 2")
    odf = con.execute(sql).fetchdf()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b), (a[(a != b).any(axis=1)].head(),
                        b[(a != b).any(axis=1)].head())


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_quantiles_random_vs_duckdb(ray_session, data):
    import ray
    from parquet_rs_ray.ops.relational import exact_quantiles
    n = data.draw(st.integers(1, 200))
    vals = data.draw(st.lists(
        st.one_of(st.integers(-1000, 1000), st.none()),
        min_size=n, max_size=n))
    if all(v is None for v in vals):
        vals[0] = 0
    qs = tuple(sorted(data.draw(st.sets(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
        min_size=1, max_size=4))))
    tbl = pa.table({"x": pa.array(vals, pa.int64())})
    got = exact_quantiles(ray.data.from_arrow(tbl), "x", qs=qs)
    con = duckdb.connect()
    con.register("t", tbl)
    sql = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(x, {q}) AS value FROM t"
        for q in qs)
    exp = con.execute(sql).fetchdf().sort_values("q")
    assert got.value.tolist() == exp.value.tolist()


# --------------------------------------------------- rolling (sliding)

def test_rolling_window_oracle(ray_session):
    import ray
    from parquet_rs_ray.ops.temporal import rolling_window
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "value"])
    out = rolling_window(ds, key_col="user_id", ts_col="ts",
                         value_col="value",
                         preceding_minutes=30).to_pandas()
    odf = _oracle(
        "SELECT event_id, user_id, ts, value, "
        "CAST(COUNT(*) OVER w AS BIGINT) AS roll_cnt, "
        "CAST(SUM(CAST(round(value*100) AS BIGINT)) OVER w AS BIGINT) "
        "AS roll_cents FROM events WINDOW w AS (PARTITION BY user_id "
        "ORDER BY ts RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING "
        "AND CURRENT ROW)")
    _cmp(out, odf, ["event_id"])


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_rolling_window_random_vs_duckdb(ray_session, data):
    """Random keys/timestamps (ties, negatives, window-boundary exact
    hits) against DuckDB's RANGE frame."""
    import duckdb as ddb
    import ray
    from parquet_rs_ray.ops.temporal import rolling_window
    n = data.draw(st.integers(1, 100))
    # coarse grid makes boundary ties (ts diff exactly == W) likely
    ts = data.draw(st.lists(st.integers(-20, 20), min_size=n, max_size=n))
    keys = data.draw(st.lists(st.integers(0, 3), min_size=n, max_size=n))
    tbl = pa.table({
        "eid": pa.array(range(n), pa.int64()),
        "k": pa.array(keys, pa.int64()),
        "ts": pa.array([t * 60_000_000 for t in ts], pa.timestamp("us")),
    })
    out = rolling_window(ray.data.from_arrow(tbl), key_col="k",
                         ts_col="ts", preceding_minutes=5).to_pandas()
    con = ddb.connect()
    con.register("ev", tbl)
    odf = con.execute(
        "SELECT eid, k, ts, CAST(COUNT(*) OVER w AS BIGINT) AS roll_cnt "
        "FROM ev WINDOW w AS (PARTITION BY k ORDER BY ts RANGE BETWEEN "
        "INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW)").fetchdf()
    cols = sorted(out.columns)
    a = out[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b)
