"""Manifest scale layout: sharded entry dirs, snapshot fold, precedence
(snapshot < per-shard deltas < journal), legacy-flat compatibility."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from parquet_rs_ray import manifest


def _rec(mdir, shard, rows=1, output='["f1"]'):
    return manifest.record(mdir, shard, output_path=output, rows=rows,
                           plain_bytes=10, encoded_bytes=5, codecs={},
                           checksum="c")


def test_sharded_layout_and_load(tmp_path):
    mdir = str(tmp_path / "m")
    shards = [f"/data/shard-{i:04d}.parquet" for i in range(40)]
    for s in shards:
        _rec(mdir, s)
    # entries fan out over 2-hex-char subdirectories, flat dir stays tiny
    top = [n for n in os.listdir(mdir) if n.endswith(".json")]
    assert not top
    subdirs = [n for n in os.listdir(mdir) if len(n) == 2]
    assert len(subdirs) > 1
    loaded = manifest.load(mdir)
    assert set(loaded) == set(shards)
    assert manifest.pending(mdir, shards + ["/data/new.parquet"]) == \
        ["/data/new.parquet"]


def test_legacy_flat_entries_still_load(tmp_path):
    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    legacy = {"shard": "/old/a.parquet", "output": '["x"]', "rows": 3,
              "plain_bytes": 1, "encoded_bytes": 1, "codecs": {},
              "checksum": "c", "committed_at": 0}
    with open(os.path.join(mdir,
                           manifest._entry_name(legacy["shard"])), "w") as f:
        json.dump(legacy, f)
    _rec(mdir, "/new/b.parquet")
    loaded = manifest.load(mdir)
    assert set(loaded) == {"/old/a.parquet", "/new/b.parquet"}
    # re-recording a legacy shard moves it to the sharded layout and the
    # old flat file no longer shadows the fresh entry
    _rec(mdir, "/old/a.parquet", rows=9)
    assert not os.path.exists(
        os.path.join(mdir, manifest._entry_name("/old/a.parquet")))
    assert manifest.load(mdir)["/old/a.parquet"]["rows"] == 9


def test_snapshot_folds_and_deltas_override(tmp_path):
    mdir = str(tmp_path / "m")
    for i in range(20):
        _rec(mdir, f"/s/{i}.parquet", rows=i)
    n = manifest.snapshot(mdir)
    assert n == 20
    # snapshots are per-subdir (bounded fold memory, incremental refold)
    subsnaps = [p for p in manifest._snapshot_files(mdir)
                if os.path.isfile(p)]
    assert subsnaps and all(os.path.dirname(p) != mdir for p in subsnaps)
    assert not manifest._entry_files(mdir)      # all folded
    loaded = manifest.load(mdir)
    assert len(loaded) == 20 and loaded["/s/7.parquet"]["rows"] == 7
    # a delta recorded after the fold overrides the snapshot
    _rec(mdir, "/s/7.parquet", rows=777)
    assert manifest.load(mdir)["/s/7.parquet"]["rows"] == 777
    # ... and the journal overlays both
    manifest.write_journal(mdir, {"/s/7.parquet": dict(
        manifest.load(mdir)["/s/7.parquet"], rows=-1)})
    assert manifest.load(mdir)["/s/7.parquet"]["rows"] == -1
    manifest.clear_journal(mdir)
    # snapshot again: folds the delta in (rewriting ONLY its subdir),
    # idempotent after
    import time
    mtimes = {p: os.path.getmtime(p) for p in manifest._snapshot_files(mdir)
              if os.path.isfile(p)}
    time.sleep(0.02)
    assert manifest.snapshot(mdir) == 20
    assert manifest.load(mdir)["/s/7.parquet"]["rows"] == 777
    delta_sub = manifest._entry_name("/s/7.parquet")[:2]
    for p, m in mtimes.items():
        touched = os.path.getmtime(p) != m
        assert touched == (os.path.basename(os.path.dirname(p)) == delta_sub)


def test_resume_skips_snapshotted_shards(ray_session, tmp_path):
    from parquet_rs_ray.job import decode_job, encode_job
    paths = []
    for i in range(4):
        t = pa.table({"k": pa.array(range(i * 10, i * 10 + 10), pa.int64()),
                      "url": pa.array([f"u{i}-{j}" for j in range(10)])})
        p = str(tmp_path / f"s{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    out = str(tmp_path / "enc")
    s1 = encode_job(paths[:2], out, concurrency=1)
    assert s1["shards_encoded"] == 2
    manifest.snapshot(os.path.join(out, "manifest"))
    # resume: snapshotted shards are committed, only the new two run
    s2 = encode_job(paths, out, concurrency=1)
    assert s2["shards_skipped"] == 2 and s2["shards_encoded"] == 2
    got = decode_job(out).to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == list(range(40))


def test_compact_job_writes_snapshot(ray_session, tmp_path):
    from parquet_rs_ray.job import compact_job, decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards
    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=100,
                             n_shards=3)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=1)
    exp = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    s = compact_job(out, target_file_bytes=1 << 30)
    assert s["manifest_folded"] == 3
    mdir = os.path.join(out, "manifest")
    assert any(os.path.isfile(p) for p in manifest._snapshot_files(mdir))
    assert not manifest._entry_files(mdir)
    got = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)


def test_legacy_toplevel_snapshot_migrates(tmp_path):
    mdir = str(tmp_path / "m")
    os.makedirs(mdir)
    legacy = {f"/s/{i}.parquet": {
        "shard": f"/s/{i}.parquet", "output": '["x"]', "rows": i,
        "plain_bytes": 1, "encoded_bytes": 1, "codecs": {},
        "checksum": "c", "committed_at": 0} for i in range(10)}
    with open(os.path.join(mdir, manifest.SNAPSHOT), "w") as f:
        json.dump(legacy, f)
    assert len(manifest.load(mdir)) == 10          # readable pre-fold
    _rec(mdir, "/s/3.parquet", rows=33)            # delta beats it
    assert manifest.load(mdir)["/s/3.parquet"]["rows"] == 33
    assert manifest.snapshot(mdir) == 10
    # redistributed into per-subdir snapshots; top-level file gone
    assert not os.path.exists(os.path.join(mdir, manifest.SNAPSHOT))
    loaded = manifest.load(mdir)
    assert len(loaded) == 10 and loaded["/s/3.parquet"]["rows"] == 33
