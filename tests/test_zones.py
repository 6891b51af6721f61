"""Manifest-level zone maps for partition elimination (EDBT 2018
"Global Range Encoding" from PAPERS.md): per-block column ranges folded
into the manifest at encode time so `decode_job(predicate=...)` skips
whole container files before reading a byte of them."""
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_rs_ray.page import merge_stats_zones, merge_zone_dicts


def test_merge_stats_zones_basic():
    a = {"min": 1, "max": 5, "kind": "int"}
    b = {"min": 3, "max": 9, "kind": "int"}
    assert merge_stats_zones([a, b]) == {"min": 1, "max": 9, "kind": "int"}
    # kind mismatch or missing bounds → unsound, no zone
    assert merge_stats_zones([a, {"min": "x", "max": "y", "kind": "str"}]) == {}
    assert merge_stats_zones([a, {"null_count": 4}]) == {}
    assert merge_stats_zones([]) == {}
    # truncated max propagates
    t = {"min": "aa", "max": "zz", "kind": "str", "trunc": True}
    assert merge_stats_zones([t, {"min": "bb", "max": "cc",
                                  "kind": "str"}])["trunc"] is True
    # decimals compare numerically, not lexically
    d1 = {"min": "9.5", "max": "10.1", "kind": "dec"}
    d2 = {"min": "2.0", "max": "100.0", "kind": "dec"}
    z = merge_stats_zones([d1, d2])
    assert z["min"] == "2.0" and z["max"] == "100.0"


def test_merge_zone_dicts_intersects_columns():
    a = {"x": {"min": 0, "max": 4, "kind": "int"},
         "y": {"min": 1, "max": 2, "kind": "int"}}
    b = {"x": {"min": 2, "max": 9, "kind": "int"}}
    out = merge_zone_dicts(a, b)
    assert out == {"x": {"min": 0, "max": 9, "kind": "int"}}


def _range_shards(tmp_path, n_shards=4, rows=800):
    """Shards with DISJOINT key ranges (shard i holds keys
    [i*rows, (i+1)*rows)) — the clustered layout zone maps exploit."""
    paths = []
    rng = np.random.default_rng(3)
    for i in range(n_shards):
        k = np.arange(i * rows, (i + 1) * rows, dtype=np.int64)
        tbl = pa.table({
            "k": k,
            "grp": (k % 7).astype(np.int32),
            "payload": rng.random(rows),
            "name": pa.array([f"row-{v}" for v in k]),
        })
        p = str(tmp_path / f"shard_{i}.parquet")
        pq.write_table(tbl, p)
        paths.append(p)
    return paths


def test_zone_elimination_end_to_end(ray_session, tmp_path):
    from parquet_rs_ray import manifest
    from parquet_rs_ray.job import (committed_blocks, committed_zones,
                                    decode_job, eliminate_files,
                                    encode_job)

    paths = _range_shards(tmp_path)
    out_dir = str(tmp_path / "enc")
    encode_job(paths, out_dir, concurrency=2)

    files, _ = committed_blocks(out_dir)
    zones = committed_zones(out_dir)
    assert set(zones) == set(files)
    assert all(z is not None and "k" in z for z in zones.values())

    # point predicate inside shard 2's range → exactly one file survives
    kept = eliminate_files(files, zones, ("k", "==", 2 * 800 + 5))
    assert len(kept) == 1
    # range predicate covering shards 2..3
    kept = eliminate_files(files, zones, ("k", ">=", 2 * 800))
    assert len(kept) == 2
    # non-zone column keeps everything (no bounds ⇒ conservative)
    kept = eliminate_files(files, zones, [("k", ">=", 0)])
    assert len(kept) == 4

    # decoded rows match a brute-force filter of the inputs
    got = decode_job(out_dir, predicate=("k", ">=", 2 * 800)) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(range(1600, 3200))
    assert (got["name"] == [f"row-{v}" for v in got["k"]]).all()

    # predicate matching NOTHING: zero rows, no crash (the kept file's
    # pages are then block-pruned; empty results drop the schema, a
    # pre-existing page-pruning property, same as before zones)
    empty = decode_job(out_dir, predicate=("k", "==", -1)).to_pandas()
    assert len(empty) == 0

    # pre-zones manifests (older encode runs) are never eliminated
    from parquet_rs_ray import manifest as _m
    mdir = os.path.join(out_dir, "manifest")
    path = sorted(_m._entry_files(mdir))[0]
    with open(path) as f:
        e = json.load(f)
    e.pop("zones")
    with open(path, "w") as f:
        json.dump(e, f)
    zones2 = committed_zones(out_dir)
    legacy_files = [f for f in json.loads(e["output"]) if f]
    assert all(zones2[f] is None for f in legacy_files)
    assert len(eliminate_files(files, zones2, ("k", "==", 5))) >= 1


def test_zones_survive_compaction(ray_session, tmp_path):
    from parquet_rs_ray.job import (committed_blocks, committed_zones,
                                    compact_job, decode_job,
                                    eliminate_files, encode_job)

    paths = _range_shards(tmp_path)
    out_dir = str(tmp_path / "enc")
    encode_job(paths, out_dir, concurrency=2)
    s = compact_job(out_dir, target_file_bytes=1 << 30, concurrency=2)
    assert s["files_merged"] >= 2

    files, _ = committed_blocks(out_dir)
    zones = committed_zones(out_dir)
    # every surviving container still has a zone map (merged, not lost)
    assert all(zones[f] is not None and "k" in zones[f] for f in files)
    # the merged container's zone spans the union of its sources, so an
    # in-range point keeps it…
    assert len(eliminate_files(files, zones, ("k", "==", 100))) >= 1
    # …and an out-of-range predicate eliminates everything
    assert eliminate_files(files, zones, ("k", ">=", 10_000)) == []

    got = decode_job(out_dir, predicate=("k", "<", 800)) \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(range(0, 800))


def test_all_null_column_shard_conservative(ray_session, tmp_path):
    from parquet_rs_ray.job import (committed_blocks, committed_zones,
                                    decode_job, eliminate_files,
                                    encode_job)

    tbl = pa.table({
        "k": pa.array([None] * 300, pa.int64()),
        "v": pa.array(range(300), pa.int64()),
    })
    p = str(tmp_path / "nulls.parquet")
    pq.write_table(tbl, p)
    out_dir = str(tmp_path / "enc")
    encode_job([p], out_dir, concurrency=1)
    files, _ = committed_blocks(out_dir)
    zones = committed_zones(out_dir)
    # all-null column: no zone for k (nothing to bound), but v is bounded
    z = zones[files[0]]
    assert "k" not in z and z["v"]["min"] == 0
    # predicate on k cannot eliminate the file (nulls prove nothing) —
    # the exact filter then returns zero matching rows
    assert eliminate_files(files, zones, ("k", "==", 7)) == files
    got = decode_job(out_dir, predicate=("k", "==", 7)).to_pandas()
    assert len(got) == 0


def test_stats_job_metadata_only(ray_session, tmp_path):
    """Global column stats computed purely from page-stats metadata
    (no payload reads): exact rows/null_count, sound min/max, blob
    columns honestly unbounded."""
    from parquet_rs_ray.job import encode_job, stats_job

    rng = np.random.default_rng(9)
    n = 2000
    big = ["x" * 300 + f"{i}" for i in range(n)]     # blob: stats skipped
    k = rng.integers(-50, 1000, n)
    kmask = rng.random(n) < 0.25
    tbl = pa.table({
        "k": pa.array(np.where(kmask, None, k).tolist(), pa.int64()),
        "name": pa.array([f"id-{i:05d}" for i in range(n)]),
        "blob": pa.array(big),
    })
    p = str(tmp_path / "t.parquet")
    pq.write_table(tbl, p, row_group_size=500)
    out_dir = str(tmp_path / "enc")
    encode_job([p], out_dir, concurrency=1)

    st = stats_job(out_dir).to_pylist()
    by = {r["column"]: r for r in st}
    assert set(by) == {"k", "name", "blob"}
    assert all(r["rows"] == n for r in st)
    assert by["k"]["null_count"] == int(kmask.sum())
    kv = k[~kmask]
    assert by["k"]["min"] == str(kv.min()) and by["k"]["max"] == str(kv.max())
    assert by["name"]["min"] == "id-00000"
    assert by["name"]["max"] == f"id-{n-1:05d}"
    # huge-blob pages skip min/max by design → honestly unbounded
    assert by["blob"]["min"] == "" and by["blob"]["max"] == ""
    # column selection
    one = stats_job(out_dir, columns=["k"]).to_pylist()
    assert len(one) == 1 and one[0]["column"] == "k"


def test_pruning_stack_soundness_fuzz(ray_session, tmp_path):
    """End-to-end pruning soundness fuzz: random typed shards + random
    predicates through encode_job → decode_job(predicate=...) must
    equal the brute-force Arrow filter of the inputs — file-level zone
    elimination, page-level stats pruning, and the exact filter may
    never drop a matching row. Covers int+nulls, float+NaN, short and
    64-char-straddling strings, timestamps, and date-vs-timestamp
    granularity (the ADVICE-r2 soundness class)."""
    import datetime

    import pyarrow.compute as pc
    from parquet_rs_ray.job import decode_job, encode_job

    rng = np.random.default_rng(123)
    n_per, n_shards = 300, 3

    def build(case):
        tbls = []
        for s in range(n_shards):
            base = case * 1000 + s * n_per
            iv = rng.integers(-100, 5000, n_per)
            imask = rng.random(n_per) < 0.2
            fv = rng.random(n_per) * 100
            fv[rng.random(n_per) < 0.1] = np.nan
            sv = ["s" + "x" * int(rng.integers(0, 70)) + str(int(v))
                  for v in rng.integers(0, 50, n_per)]
            ts = (np.int64(1577836800) + rng.integers(0, 86400 * 400,
                                                      n_per)) * 1_000_000
            tbls.append(pa.table({
                "i": pa.array(np.where(imask, None, iv).tolist(),
                              pa.int64()),
                "f": pa.array(fv),
                "s": pa.array(sv),
                "t": pa.array(ts, pa.timestamp("us")),
                "row": pa.array(range(base, base + n_per), pa.int64()),
            }))
        return tbls

    preds = [
        ("i", "==", 250), ("i", ">", 4000), ("i", "<=", -50),
        ("i", ">=", 99999),                       # eliminates everything
        ("f", ">", 50.0), ("f", "<", 0.5),
        ("s", ">=", "sxxx"), ("s", "==", "s0"),
        ("t", ">", datetime.datetime(2020, 6, 1)),
        ("t", "<=", datetime.date(2020, 1, 10)),  # date vs timestamp col
        ("t", ">=", datetime.datetime(2021, 1, 1)),
        ("i", "<", 0),
    ]
    kernels = {"==": pc.equal, ">": pc.greater, ">=": pc.greater_equal,
               "<": pc.less, "<=": pc.less_equal}
    for case, pred in enumerate(preds):
        tbls = build(case)
        paths = []
        for s, t in enumerate(tbls):
            p = str(tmp_path / f"c{case}_s{s}.parquet")
            pq.write_table(t, p, row_group_size=100)
            paths.append(p)
        out_dir = str(tmp_path / f"enc{case}")
        encode_job(paths, out_dir, concurrency=2)
        got = decode_job(out_dir, predicate=pred).to_pandas()
        full = pa.concat_tables(tbls)
        col, op, val = pred
        arr = full.column(col)
        try:
            sval = pa.scalar(val, type=arr.type)
        except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
            sval = val
        exp = full.filter(kernels[op](arr, sval)).to_pandas()
        if len(got) == 0:
            # fully-pruned results legitimately drop the schema
            assert len(exp) == 0, pred
        else:
            assert sorted(got["row"]) == sorted(exp["row"]), pred


def test_stats_job_all_null_shard_keeps_bounds(ray_session, tmp_path):
    """A shard whose pages for a column are ENTIRELY null is sound — it
    constrains nothing — so the corpus min/max must still come from the
    valued shard (ADVICE r3: the empty partial used to be conflated
    with 'unsound bounds' and blanked the whole column)."""
    from parquet_rs_ray.job import encode_job, stats_job

    a = pa.table({"k": pa.array([None] * 400, pa.int64()),
                  "s": pa.array([None] * 400, pa.string())})
    b = pa.table({"k": pa.array([5, 9, 7, 6] * 100, pa.int64()),
                  "s": pa.array(["mm", "aa", "zz", "qq"] * 100)})
    pa_, pb = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(a, pa_)
    pq.write_table(b, pb)
    out_dir = str(tmp_path / "enc")
    encode_job([pa_, pb], out_dir, concurrency=1)
    st = {r["column"]: r for r in stats_job(out_dir).to_pylist()}
    assert st["k"]["min"] == "5" and st["k"]["max"] == "9"
    assert st["s"]["min"] == "aa" and st["s"]["max"] == "zz"
    assert st["k"]["rows"] == 800 and st["k"]["null_count"] == 400
    # a column null across the WHOLE corpus stays honestly unbounded
    # ... and remains sound: min/max empty, counts exact
