"""Incremental ingestion dedup: hash_index_job builds a content-hash
index of the committed corpus's text column (reading only that column's
bytes); dedup_against_index drops already-seen documents from new
shards without re-reading the corpus — broadcast, join, and
metadata-probe auto regimes."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from parquet_rs_ray.job import encode_job, hash_index_job
from parquet_rs_ray.ops.dedup import dedup_against_index

SF = "/root/testdata/sf0.001"


def _corpus_and_new(tmp_path):
    """Encode a 2-shard corpus; return (enc_dir, new_ds, expected_ids).

    The 'new crawl' overlaps the corpus on some texts (dropped), brings
    fresh texts (kept), and repeats one of its own texts twice (BOTH
    kept — this op is cross-corpus only, exact_dedup handles within)."""
    import ray
    corpus_texts = [f"seen document {i} body" for i in range(40)]
    shards = []
    for si in range(2):
        t = pa.table({
            "doc_id": pa.array(range(si * 20, si * 20 + 20), pa.int64()),
            "text": pa.array(corpus_texts[si * 20:si * 20 + 20]),
        })
        p = str(tmp_path / f"corpus{si}.parquet")
        pq.write_table(t, p)
        shards.append(p)
    enc = str(tmp_path / "enc")
    encode_job(shards, enc, concurrency=1)

    new_rows = [(100, corpus_texts[3]),         # seen -> dropped
                (101, "fresh document alpha"),  # kept
                (102, corpus_texts[25]),        # seen -> dropped
                (103, "fresh document beta"),   # kept
                (104, "fresh document alpha"),  # kept (within-new dup)
                (105, corpus_texts[39])]        # seen -> dropped
    new_tbl = pa.table({
        "doc_id": pa.array([r[0] for r in new_rows], pa.int64()),
        "text": pa.array([r[1] for r in new_rows]),
    })
    return enc, ray.data.from_arrow(new_tbl), [101, 103, 104]


def test_hash_index_and_all_regimes_agree(ray_session, tmp_path):
    enc, new_ds, expected = _corpus_and_new(tmp_path)
    s = hash_index_job(enc, "text")
    assert s["hashes"] == 40                    # corpus texts distinct
    assert os.path.isdir(s["index_dir"])
    for mode in ("broadcast", "join", "auto"):
        got = dedup_against_index(new_ds, s["index_dir"], mode=mode) \
            .to_pandas().sort_values("doc_id")
        assert list(got["doc_id"]) == expected, mode
        assert set(got.columns) == {"doc_id", "text"}, mode


def test_auto_probe_is_metadata_only_and_flips(ray_session, tmp_path):
    enc, new_ds, expected = _corpus_and_new(tmp_path)
    s = hash_index_job(enc, "text")
    # a 1-byte budget forces the join regime; result identical
    got = dedup_against_index(new_ds, s["index_dir"], mode="auto",
                              broadcast_budget_bytes=1) \
        .to_pandas().sort_values("doc_id")
    assert list(got["doc_id"]) == expected
    import pytest
    with pytest.raises(ValueError):
        dedup_against_index(new_ds, s["index_dir"], mode="nope").count()


def test_index_is_resumable_shape(ray_session, tmp_path):
    """The index is a directory of small parquets (streamed write, no
    driver materialization) and rebuilding it is idempotent."""
    enc, _new, _exp = _corpus_and_new(tmp_path)
    s1 = hash_index_job(enc, "text")
    files = [f for f in os.listdir(s1["index_dir"])
             if f.endswith(".parquet")]
    assert files
    s2 = hash_index_job(enc, "text", index_dir=str(tmp_path / "idx2"))
    assert s2["hashes"] == s1["hashes"]


def test_against_index_duckdb_parity(ray_session, tmp_path):
    """Oracle parity on the real documents table: corpus = doc_id%3!=0
    rows, new = all rows; survivors must match the SQL anti-join."""
    import duckdb
    import ray
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    ids = docs.column("doc_id").to_numpy()
    corpus = docs.filter(pa.array(ids % 3 != 0))
    shard = str(tmp_path / "corpus.parquet")
    pq.write_table(corpus, shard)
    enc = str(tmp_path / "enc")
    encode_job([shard], enc, concurrency=1)
    s = hash_index_job(enc, "text")
    got = dedup_against_index(
        ray.data.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"]),
        s["index_dir"]).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT doc_id, text "
                f"FROM '{SF}/documents.parquet'")
    odf = con.execute(
        "SELECT d.doc_id, d.text FROM documents d WHERE NOT EXISTS ("
        "SELECT 1 FROM documents c WHERE c.doc_id % 3 <> 0 "
        "AND c.text IS NOT DISTINCT FROM d.text) ORDER BY d.doc_id"
    ).fetchdf()
    assert list(got["doc_id"]) == list(odf["doc_id"])
    assert list(got["text"]) == list(odf["text"])


def test_cli_index_smoke(ray_session, tmp_path):
    import json
    import subprocess
    import sys
    t = pa.table({"doc_id": pa.array(range(30), pa.int64()),
                  "text": pa.array([f"doc {i}" for i in range(30)])})
    shard = str(tmp_path / "s.parquet")
    pq.write_table(t, shard)
    enc = str(tmp_path / "enc")
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "encode", shard,
         enc, "--concurrency", "1"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "index", enc,
         "text"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["hashes"] == 30 and os.path.isdir(s["index_dir"])
