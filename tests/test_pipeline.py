"""Ray Data end-to-end tests: encode→decode roundtrip, resumable job,
global dictionary shuffle."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _sorted_pandas(tbl, key):
    df = tbl.to_pandas() if not hasattr(tbl, "to_pandas") or not isinstance(tbl, pa.Table) else tbl.to_pandas()
    return df.sort_values(key).reset_index(drop=True)


def test_ray_roundtrip_documents(ray_session):
    import ray
    from parquet_rs_ray.pipeline import roundtrip
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = roundtrip(ds, concurrency=2).to_pandas()
    exp = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)[exp.columns.tolist()]
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(out, exp)


def test_ray_roundtrip_web_table(ray_session, tmp_path):
    import ray
    from parquet_rs_ray.pipeline import roundtrip
    from parquet_rs_ray.webgen import write_web_shards
    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=800, n_shards=2)
    ds = ray.data.read_parquet(paths)
    out = roundtrip(ds, concurrency=2).to_pandas().sort_values("url").reset_index(drop=True)
    exp = pa.concat_tables([pq.read_table(p) for p in paths]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    # byte-identical text per url (north-star invariant)
    assert (out["url"] == exp["url"]).all()
    assert (out["text"] == exp["text"]).all()
    assert out["warc_ts"].equals(exp["warc_ts"])
    h_out = out["html"].map(lambda b: b if b is None else bytes(b))
    h_exp = exp["html"].map(lambda b: b if b is None else bytes(b))
    assert h_out.equals(h_exp)
    assert (out["lang"] == exp["lang"]).all()


def test_encode_job_resume_and_decode(ray_session, tmp_path):
    from parquet_rs_ray import manifest
    from parquet_rs_ray.job import encode_job, decode_job, committed_block_files
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=500, n_shards=3)
    out_dir = str(tmp_path / "encoded")

    s1 = encode_job(paths, out_dir, concurrency=2)
    assert s1["shards_encoded"] == 3 and s1["shards_skipped"] == 0
    assert s1["encoded_bytes"] < s1["plain_bytes"]

    # resume: nothing left to do
    s2 = encode_job(paths, out_dir, concurrency=2)
    assert s2["shards_encoded"] == 0 and s2["shards_skipped"] == 3

    # simulate a partially-failed run: drop one manifest entry → only that
    # shard re-executes
    mdir = os.path.join(out_dir, "manifest")
    from parquet_rs_ray import manifest as _m
    victim = sorted(_m._entry_files(mdir))[0]
    os.remove(victim)
    s3 = encode_job(paths, out_dir, concurrency=2)
    assert s3["shards_encoded"] == 1 and s3["shards_skipped"] == 2

    # decode only committed blocks; full equality with the inputs
    dec = decode_job(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
    exp = pa.concat_tables([pq.read_table(p) for p in paths]).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(dec) == len(exp)
    assert (dec["text"] == exp["text"]).all()
    # lineage entries carry codec + size metrics
    entries = manifest.load(mdir)
    assert len(entries) == 3
    e = next(iter(entries.values()))
    assert e["encoded_bytes"] > 0 and e["codecs"] and e["checksum"]
    # containerized layout: file count bounded by SHARD count (one
    # container per shard, one parquet row group per block), and no
    # orphan .tmp files after commit
    data_files = [f for f in os.listdir(os.path.join(out_dir, "data"))
                  if f.endswith(".parquet")]
    committed = committed_block_files(out_dir)
    assert len(committed) <= 2 * len(paths)  # 3 shards + 1 re-run shard
    assert not any(f.endswith(".tmp") for f in data_files)
    assert all(pq.ParquetFile(f).metadata.num_row_groups >= 1
               for f in committed)


def test_global_dictionary(ray_session):
    import ray
    from parquet_rs_ray.globaldict import build_global_dictionary
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    langs = build_global_dictionary(ds, "lang", num_salts=8)
    exp = sorted(set(pq.read_table(f"{SF}/documents.parquet")
                     .column("lang").to_pylist()))
    assert langs == exp


def test_all_block_codecs_roundtrip(ray_session):
    """All five reference block codecs (§2.3: SNAPPY GZIP BROTLI LZ4 ZSTD,
    `/root/reference/src/compression.rs:69-79`) as the outer page layer."""
    import ray
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    tbl = pa.table({
        "a": pa.array(list(range(3000)), pa.int64()),
        "s": pa.array([f"value-{i % 97}" for i in range(3000)], pa.string()),
    })
    for codec in ["snappy", "gzip", "brotli", "lz4", "zstd"]:
        enc = encode_dataset(ray.data.from_arrow(tbl), concurrency=1,
                             block_codec=codec)
        out = pa.concat_tables(
            list(decode_dataset(enc).iter_batches(batch_format="pyarrow")))
        assert out.sort_by("a").equals(tbl), codec


def test_predicate_projection_pushdown(ray_session):
    """Stats-based block pruning + projection over the encoded format:
    pruned page rows shrink, and the result is exact."""
    import ray
    import numpy as np
    import pyarrow as pa
    from parquet_rs_ray.pipeline import (decode_dataset, encode_dataset,
                                         prune_pages)
    # two well-separated key ranges → prunable blocks
    t1 = pa.table({"k": pa.array(np.arange(0, 1000), pa.int64()),
                   "v": pa.array(["a"] * 1000)})
    t2 = pa.table({"k": pa.array(np.arange(50_000, 51_000), pa.int64()),
                   "v": pa.array(["b"] * 1000)})
    ds = ray.data.from_arrow([t1, t2])
    pages = encode_dataset(ds, concurrency=2).materialize()
    pruned = prune_pages(pages, columns=["k"], predicate=("k", ">=", 50_000))
    assert pruned.count() < pages.count()  # blocks + columns dropped
    out = decode_dataset(pages, columns=["k"],
                         predicate=("k", ">=", 50_000)).to_pandas()
    assert sorted(out.columns) == ["k"]
    assert len(out) == 1000 and out["k"].min() == 50_000


def test_bloom_equality_pruning(ray_session):
    """Per-page bloom filters prune equality predicates that min/max
    stats cannot (point lookup on a high-cardinality key column)."""
    import ray
    import numpy as np
    import pyarrow as pa
    from parquet_rs_ray.pipeline import (decode_dataset, encode_dataset,
                                         prune_pages)
    rng = np.random.default_rng(9)
    # interleaved key ranges → min/max overlap, only bloom can prune
    t1 = pa.table({"k": pa.array(rng.permutation(np.arange(0, 20000, 2)),
                                 pa.int64())})
    t2 = pa.table({"k": pa.array(rng.permutation(np.arange(1, 20000, 2)),
                                 pa.int64())})
    ds = ray.data.from_arrow([t1, t2])
    pages = encode_dataset(ds, concurrency=2).materialize()
    target = 4242  # even → lives only in t1's block
    pruned = prune_pages(pages, predicate=("k", "==", target))
    assert pruned.count() < pages.count()
    out = decode_dataset(pages, predicate=("k", "==", target)).to_pandas()
    assert out["k"].tolist() == [target]
    # string bloom: urls
    urls = [f"https://example.com/{i}" for i in range(5000)]
    tbl = pa.table({"url": pa.array(urls, pa.string())})
    p2 = encode_dataset(ray.data.from_arrow(tbl),
                        concurrency=2).materialize()
    out2 = decode_dataset(
        p2, predicate=("url", "==", urls[17])).to_pandas()
    assert out2["url"].tolist() == [urls[17]]
    none = decode_dataset(
        p2, predicate=("url", "==", "https://nope.invalid/x")).to_pandas()
    assert len(none) == 0


def test_multi_predicate_pushdown(ray_session):
    import ray
    import numpy as np
    import pyarrow as pa
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    tbl = pa.table({
        "k": pa.array(np.arange(2000), pa.int64()),
        "grp": pa.array(["a" if i % 2 else "b" for i in range(2000)]),
    })
    pages = encode_dataset(ray.data.from_arrow(tbl),
                           concurrency=2).materialize()
    out = decode_dataset(pages, predicate=[("k", ">=", 100),
                                           ("k", "<", 110),
                                           ("grp", "==", "a")]).to_pandas()
    assert sorted(out["k"].tolist()) == [101, 103, 105, 107, 109]


def test_pushdown_random_predicates(ray_session):
    """Property: pruned+filtered decode ≡ decode-then-filter for random
    data and predicates (pruning must never drop a matching row)."""
    import ray
    import numpy as np
    import pyarrow as pa
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    rng = np.random.default_rng(123)
    tables = []
    for b in range(4):
        n = 3000
        tables.append(pa.table({
            "k": pa.array(rng.integers(0, 5000, n), pa.int64()),
            "s": pa.array([f"w{int(x)}" for x in
                           rng.integers(0, 200, n)], pa.string()),
            "f": pa.array(rng.normal(size=n), pa.float64()),
        }))
    full = pa.concat_tables(tables)
    pages = encode_dataset(ray.data.from_arrow(tables),
                           concurrency=2).materialize()
    cases = [
        [("k", "==", int(full.column("k")[5].as_py()))],
        [("k", ">=", 2500), ("k", "<", 2600)],
        [("s", "==", "w17")],
        [("f", ">", 1.5), ("k", "<", 1000)],
        [("k", "==", -1)],  # no match anywhere
    ]
    df = full.to_pandas()
    ops = {"==": "eq", ">": "gt", ">=": "ge", "<": "lt", "<=": "le"}
    for preds in cases:
        got = decode_dataset(pages, predicate=preds).to_pandas()
        want = df
        for c, op, v in preds:
            want = want[getattr(want[c], ops[op])(v)]
        if len(want) == 0:
            assert len(got) == 0, preds
            continue
        g = got.sort_values(["k", "s", "f"]).reset_index(drop=True)
        w = want.sort_values(["k", "s", "f"]).reset_index(drop=True)
        assert len(g) == len(w) and (g.values == w.values).all(), preds


def test_pushdown_typed_predicates(ray_session):
    """Typed stats soundness: bytes (hex order), uint64 / int64 past
    2^53 (no float64 rounding), negatives, timestamps, and >64-char
    strings (truncated max ⇒ pruning disabled) — pruned decode must
    equal decode-then-filter, and separated ranges must actually prune."""
    import datetime
    import ray
    from parquet_rs_ray.pipeline import (decode_dataset, encode_dataset,
                                         prune_pages)

    rng = np.random.default_rng(7)
    base = 1 << 62
    long_a = "a" * 200
    long_z = "z" * 200

    def mk(lo_bytes, int_off, ts_day, s_val):
        n = 500
        return pa.table({
            "b": pa.array([bytes([lo_bytes + (i % 16)]) for i in range(n)],
                          pa.binary()),
            "big": pa.array(np.arange(int_off, int_off + n), pa.int64()),
            "u": pa.array(np.arange(n, dtype=np.uint64)
                          + np.uint64(2 ** 63 if int_off else 0)),
            "neg": pa.array(rng.integers(-10**6, -1, n), pa.int64()),
            "ts": pa.array([datetime.datetime(2024, 1, ts_day, i % 24)
                            for i in range(n)], pa.timestamp("us")),
            "longs": pa.array([s_val + str(i % 7) for i in range(n)]),
        })

    t1 = mk(0x00, 0, 1, long_a)          # low bytes, small ints, Jan 1
    t2 = mk(0xA0, base, 20, long_z)      # high bytes, huge ints, Jan 20
    full = pa.concat_tables([t1, t2])
    pages = encode_dataset(ray.data.from_arrow([t1, t2]),
                           concurrency=2).materialize()

    cases = [
        ("b", ">", b"\x00"),            # the ADVICE bytes-vs-str repro
        ("b", ">=", b"\xa0"),
        ("b", "<", b"\x10"),
        ("b", "==", b"\xa5"),
        ("big", ">=", base),            # exactly 2^62: float64-exact trap
        ("big", "==", base + 3),
        ("big", "<", 100),
        ("u", ">=", 2 ** 63 + 5),       # unsigned, above int64 range
        ("neg", "<", -500_000),
        ("ts", ">=", datetime.datetime(2024, 1, 10)),
        ("ts", "==", datetime.datetime(2024, 1, 1, 0)),
        ("longs", ">", long_z),         # truncated max: must not prune
        ("longs", "<=", long_a + "0"),
    ]
    import pyarrow.compute as pc2
    kern = {"==": pc2.equal, ">": pc2.greater, ">=": pc2.greater_equal,
            "<": pc2.less, "<=": pc2.less_equal}
    for col, op, val in cases:
        batches = [b for b in decode_dataset(pages, predicate=(col, op, val))
                   .iter_batches(batch_format="pyarrow") if b.num_rows]
        want = full.filter(kern[op](
            full.column(col), pa.scalar(val, full.schema.field(col).type)))
        if not batches:
            assert want.num_rows == 0, (col, op, val)
            continue
        got = pa.concat_tables(batches, promote_options="default")
        assert got.num_rows == want.num_rows, (col, op, val)
        assert got.sort_by("big").equals(want.sort_by("big")), (col, op, val)

    # separated ranges must actually drop blocks (pruning effective)
    for col, op, val in [("b", ">=", b"\xa0"), ("big", "<", 100),
                         ("u", ">=", 2 ** 63),
                         ("ts", ">=", datetime.datetime(2024, 1, 10))]:
        pruned = prune_pages(pages, predicate=(col, op, val))
        assert pruned.count() < pages.count(), (col, op, val)


def test_pushdown_mixed_temporal_granularity(ray_session):
    """ADVICE r2: a datetime.date predicate against a timestamp column
    renders '2024-01-10' vs stored '2024-01-10 00:00:00'; a strict-prefix
    string compare would prune the block holding the exact-midnight row.
    Pruned decode must equal decode-then-filter for every mixed pairing."""
    import datetime
    import ray
    import pyarrow.compute as pc2
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset

    n = 300
    # block 1 min is EXACTLY midnight Jan 10 (the boundary row at risk)
    t1 = pa.table({
        "ts": pa.array([datetime.datetime(2024, 1, 10) +
                        datetime.timedelta(minutes=i) for i in range(n)],
                       pa.timestamp("us")),
        "d": pa.array([datetime.date(2024, 1, 10)] * n, pa.date32()),
        "i": pa.array(np.arange(n), pa.int64()),
    })
    t2 = pa.table({
        "ts": pa.array([datetime.datetime(2024, 2, 1) +
                        datetime.timedelta(minutes=i) for i in range(n)],
                       pa.timestamp("us")),
        "d": pa.array([datetime.date(2024, 2, 1)] * n, pa.date32()),
        "i": pa.array(np.arange(n, 2 * n), pa.int64()),
    })
    full = pa.concat_tables([t1, t2])
    pages = encode_dataset(ray.data.from_arrow([t1, t2]),
                           concurrency=2).materialize()

    kern = {"==": pc2.equal, ">": pc2.greater, ">=": pc2.greater_equal,
            "<": pc2.less, "<=": pc2.less_equal}
    cases = [
        # date predicate on timestamp column (midnight boundary, all ops)
        ("ts", "<=", datetime.date(2024, 1, 10)),
        ("ts", "==", datetime.date(2024, 1, 10)),
        ("ts", "<", datetime.date(2024, 1, 10)),
        ("ts", ">=", datetime.date(2024, 2, 1)),
        ("ts", ">", datetime.date(2024, 1, 10)),
        # datetime predicate on date column (pa.scalar truncates to date)
        ("d", "<=", datetime.datetime(2024, 1, 10, 5, 30)),
        ("d", "==", datetime.datetime(2024, 1, 10, 5, 30)),
        ("d", ">=", datetime.datetime(2024, 2, 1, 0, 0)),
        # same-granularity still exact
        ("ts", "<=", datetime.datetime(2024, 1, 10)),
        ("d", "==", datetime.date(2024, 2, 1)),
    ]
    for col, op, val in cases:
        batches = [b for b in decode_dataset(pages, predicate=(col, op, val))
                   .iter_batches(batch_format="pyarrow") if b.num_rows]
        got = (pa.concat_tables(batches, promote_options="default")
               if batches else full.slice(0, 0))
        try:
            sval = pa.scalar(val, full.schema.field(col).type)
        except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
            sval = val
        want = full.filter(kern[op](full.column(col), sval))
        assert got.num_rows == want.num_rows, (col, op, val)
        assert got.sort_by("i").equals(want.sort_by("i")), (col, op, val)


def test_encode_job_empty_shard_commits(ray_session, tmp_path):
    """A shard with zero rows (pq.write_table of an empty table yields one
    0-row row group) must still COMMIT via a sentinel lineage row, or
    resume re-runs it forever."""
    from parquet_rs_ray.job import decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=200,
                             n_shards=2)
    empty = str(tmp_path / "web" / "empty.parquet")
    pq.write_table(pq.read_table(paths[0]).slice(0, 0), empty)
    all_paths = paths + [empty]
    out_dir = str(tmp_path / "encoded")

    s1 = encode_job(all_paths, out_dir, concurrency=2)
    assert s1["shards_encoded"] == 3 and s1["shards_skipped"] == 0
    # resume: the empty shard is committed, nothing re-runs
    s2 = encode_job(all_paths, out_dir, concurrency=2)
    assert s2["shards_encoded"] == 0 and s2["shards_skipped"] == 3
    # decode sees exactly the non-empty rows
    assert decode_job(out_dir).count() == 400


def test_compact_job_merges_and_stays_decodable(ray_session, tmp_path):
    """Compaction merges small containers, preserves every block verbatim
    (decode equality + checksums), rewrites the manifest atomically, and
    is idempotent; resume still skips all shards."""
    from parquet_rs_ray.job import (committed_block_files, compact_job,
                                    decode_job, encode_job)
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=150,
                             n_shards=6)
    out_dir = str(tmp_path / "encoded")
    encode_job(paths, out_dir, concurrency=2)
    before_files = committed_block_files(out_dir)
    assert len(before_files) == 6  # one container per shard
    exp = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)

    s = compact_job(out_dir, target_file_bytes=1 << 30)
    after_files = committed_block_files(out_dir)
    assert len(after_files) < len(before_files)
    assert s["files_merged"] == 6
    for f in before_files:  # sources gone, new containers exist
        assert not os.path.exists(f)
    for f in after_files:
        assert os.path.exists(f)

    got = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)
    # resume: all shards still committed
    s2 = encode_job(paths, out_dir, concurrency=2)
    assert s2["shards_encoded"] == 0 and s2["shards_skipped"] == 6
    # idempotent: nothing left to merge
    s3 = compact_job(out_dir, target_file_bytes=1 << 30)
    assert s3["bins"] == 0 or s3["files_merged"] == 0


def test_compact_job_shard_spanning_containers(ray_session, tmp_path):
    """ADVICE r2: a shard whose blocks span several container files
    (the EncodeWriteActor layout — one container per batch) must compact
    correctly even when those files land in DIFFERENT bins or only some
    of them are merged; previously the per-shard block-count validation
    aborted (or the updates dict dropped blocks)."""
    import json as _json
    from parquet_rs_ray import manifest
    from parquet_rs_ray.job import compact_job, decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=120,
                             n_shards=3)
    # shard 0 gets TWO row groups ⇒ two blocks in its container
    t0 = pq.read_table(paths[0])
    pq.write_table(t0, paths[0], row_group_size=60)
    out_dir = str(tmp_path / "encoded")
    encode_job(paths, out_dir, concurrency=2)

    mdir = os.path.join(out_dir, "manifest")
    ddir = os.path.join(out_dir, "data")
    entries = manifest.load(mdir)
    e0 = entries[paths[0]]
    files0 = _json.loads(e0["output"])
    assert len(files0) == 2 and len(set(files0)) == 1  # 2 blocks, 1 file
    # split shard 0's container into two files, one per BLOCK (names
    # chosen so the greedy name-sorted binning puts them in different
    # bins); layout-agnostic: group the page rows by block_id rather
    # than assuming one row group per block
    src = files0[0]
    pages = pq.read_table(src)
    bids = pages.column("block_id").unique().to_pylist()
    assert len(bids) == 2
    fa = os.path.join(ddir, "00000000aaaaaaaa.parquet")
    fz = os.path.join(ddir, "zzzzzzzzzzzzzzzz.parquet")
    import pyarrow.compute as _pc
    for f, bid in ((fa, bids[0]), (fz, bids[1])):
        blk = pages.filter(_pc.equal(pages.column("block_id"), bid))
        pq.write_table(blk, f, compression="none")
    os.remove(src)
    manifest.record(
        mdir, paths[0], output_path=_json.dumps([fa, fz]),
        rows=e0["rows"], plain_bytes=e0["plain_bytes"],
        encoded_bytes=e0["encoded_bytes"],
        codecs=_json.loads(e0["codecs"]) if isinstance(e0["codecs"], str)
        else e0["codecs"], checksum=e0["checksum"])

    exp = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    # bin capacity ≈ 2 files: fa pairs with the other shards' containers,
    # fz lands in a different bin (or stays unmerged) — shard 0's entry
    # must get BOTH mappings applied, not last-bin-wins
    sizes = [os.path.getsize(os.path.join(ddir, f))
             for f in os.listdir(ddir)]
    target = max(sizes) * 5 // 2
    s = compact_job(out_dir, target_file_bytes=target)
    assert s["files_merged"] >= 2

    new0 = _json.loads(manifest.load(mdir)[paths[0]]["output"])
    assert len(new0) == 2
    for f in new0:
        assert os.path.exists(f)
    got = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)

    # and the all-in-one-bin variant stays correct too (idempotent run
    # with a huge target merges whatever is left)
    s2 = compact_job(out_dir, target_file_bytes=1 << 30)
    got2 = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got2.equals(exp)


def test_compact_job_multi_stage(ray_session, tmp_path):
    """Re-compacting already-merged containers (multi-shard files) keeps
    decode equality — shard attribution comes from the blocks' path
    column, not file naming."""
    from parquet_rs_ray.job import (committed_block_files, compact_job,
                                    decode_job, encode_job)
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=120,
                             n_shards=8)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=2)
    exp = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    s1 = compact_job(out, target_file_bytes=400_000)
    assert 1 < len(committed_block_files(out)) < 8 and s1["files_merged"]
    s2 = compact_job(out, target_file_bytes=1 << 30)
    assert len(committed_block_files(out)) == 1 and s2["files_merged"]
    got = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)


def test_compact_job_crash_mid_rewrite_stays_consistent(
        ray_session, tmp_path, monkeypatch):
    """Crash between per-shard entry rewrites (phase 3): the pending
    journal OVERLAYS reads, so decode sees the new containers exactly
    once (no duplicates); the next run folds the journal and GCs."""
    from parquet_rs_ray import manifest
    from parquet_rs_ray.job import (committed_block_files, compact_job,
                                    decode_job, encode_job)
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=100,
                             n_shards=4)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=2)
    exp = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    old_files = committed_block_files(out)

    real_record = manifest.record
    calls = {"n": 0}

    def crashing_record(*a, **k):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid phase 3")
        return real_record(*a, **k)

    monkeypatch.setattr(manifest, "record", crashing_record)
    with pytest.raises(RuntimeError):
        compact_job(out, target_file_bytes=1 << 30)
    monkeypatch.setattr(manifest, "record", real_record)

    mdir = os.path.join(out, "manifest")
    assert manifest.pending_journal(mdir)          # journal pending
    for f in old_files:
        assert os.path.exists(f)                   # phase 4 never ran
    # journal overlay: decode already sees the NEW state, exactly once
    got = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got.equals(exp)
    assert len(committed_block_files(out)) == 1

    # repair run: folds journal, clears it, GCs old containers
    s = compact_job(out, target_file_bytes=1 << 30)
    assert not manifest.pending_journal(mdir)
    assert s["orphans_deleted"] >= len(old_files)
    for f in old_files:
        assert not os.path.exists(f)
    got2 = decode_job(out).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    assert got2.equals(exp)


def test_compact_job_gcs_orphan_containers(ray_session, tmp_path):
    """A committed-but-unreferenced container (phase-1 crash of an
    earlier run) is garbage-collected; in-flight .tmp files are not."""
    from parquet_rs_ray.job import compact_job, decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=100,
                             n_shards=2)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=2)
    data = os.path.join(out, "data")
    orphan = os.path.join(data, "deadbeef.parquet")
    inflight = os.path.join(data, "cafe.parquet.tmp")
    open(orphan, "wb").write(b"x")
    open(inflight, "wb").write(b"y")
    s = compact_job(out, target_file_bytes=1 << 30)
    assert not os.path.exists(orphan)
    assert os.path.exists(inflight)
    assert s["orphans_deleted"] >= 1
    assert decode_job(out).count() == 200


def test_compact_then_pruned_decode(ray_session, tmp_path):
    """Stats/bloom pushdown keeps working through compacted containers
    (pruning is per BLOCK row, not per file)."""
    from parquet_rs_ray.job import compact_job, decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=200,
                             n_shards=4)
    out = str(tmp_path / "enc")
    encode_job(paths, out, concurrency=2)
    exp = decode_job(out, columns=["url", "lang"],
                     predicate=("lang", "==", "en")).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    compact_job(out, target_file_bytes=1 << 30)
    got = decode_job(out, columns=["url", "lang"],
                     predicate=("lang", "==", "en")).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert got.equals(exp) and len(got) > 0


def test_iter_jsonl_tables_chunk_boundaries(tmp_path):
    """Slice cuts land mid-line at tiny target_bytes; the parse must
    still see whole lines, handle a giant line spanning slices, an
    unterminated last line, and the gzip variant."""
    import gzip
    import json

    import pyarrow.json as pj
    from parquet_rs_ray.job import iter_jsonl_tables

    rows = [{"url": f"https://ex.com/{i}", "n": i,
             "text": ("x" * 300 if i == 7 else f"doc {i} äö")}
            for i in range(40)]
    raw = "\n".join(json.dumps(r, ensure_ascii=False) for r in rows)
    p = tmp_path / "shard.jsonl"
    p.write_text(raw, encoding="utf-8")        # no trailing newline
    got = pa.concat_tables(list(iter_jsonl_tables(str(p),
                                                  target_bytes=64)))
    import io
    want = pj.read_json(io.BytesIO(raw.encode()))
    assert got.equals(want)
    assert len(list(iter_jsonl_tables(str(p), target_bytes=64))) > 1

    pgz = tmp_path / "shard.jsonl.gz"
    with gzip.open(pgz, "wb") as f:
        f.write((raw + "\n").encode())
    got2 = pa.concat_tables(list(iter_jsonl_tables(str(pgz),
                                                   target_bytes=64)))
    assert got2.equals(want)


def test_encode_job_ingests_jsonl(ray_session, tmp_path):
    """A .jsonl.gz corpus shard encodes through the same fused
    resumable pass as parquet/WARC and decodes value-identical."""
    import gzip
    import json

    from parquet_rs_ray.job import decode_job, encode_job
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(300, seed=5).select(["url", "text", "lang"])
    lines = [json.dumps({k: tbl.column(k)[i].as_py() for k in
                         tbl.column_names}, ensure_ascii=False)
             for i in range(len(tbl))]
    p = tmp_path / "corpus.jsonl.gz"
    with gzip.open(p, "wb") as f:
        f.write(("\n".join(lines) + "\n").encode())

    out_dir = str(tmp_path / "enc")
    s = encode_job([str(p)], out_dir, concurrency=2)
    assert s["shards_encoded"] == 1 and s["rows"] == 300
    got = decode_job(out_dir).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    exp = tbl.to_pandas().sort_values("url").reset_index(drop=True)
    assert (got["url"] == exp["url"]).all()
    assert got["text"].equals(exp["text"])     # byte-identical per url
    assert (got["lang"] == exp["lang"]).all()
    # resume: nothing re-encodes
    s2 = encode_job([str(p)], out_dir, concurrency=2)
    assert s2["shards_encoded"] == 0 and s2["shards_skipped"] == 1


def test_iter_jsonl_schema_drift_fails_typed(tmp_path):
    """Mid-file type drift (string id after int ids) must fail with a
    typed Arrow error at parse time, not produce blocks that cannot
    concatenate at decode."""
    import pyarrow.lib
    from parquet_rs_ray.job import iter_jsonl_tables

    lines = [f'{{"id": {i}, "text": "doc {i}"}}' for i in range(30)]
    lines += ['{"id": "not-a-number", "text": "drifted"}'] * 30
    p = tmp_path / "drift.jsonl"
    p.write_text("\n".join(lines) + "\n")
    with pytest.raises((pa.lib.ArrowInvalid, pa.lib.ArrowTypeError)):
        list(iter_jsonl_tables(str(p), target_bytes=256))


def test_iter_jsonl_sparse_and_extra_fields(tmp_path):
    """A slice whose rows all omit an optional field aligns as nulls;
    a field the first block never saw raises typed (no silent loss)."""
    from parquet_rs_ray.job import iter_jsonl_tables

    lines = [f'{{"id": {i}, "lang": "en"}}' for i in range(20)]
    lines += [f'{{"id": {i}}}' for i in range(20, 40)]   # lang omitted
    p = tmp_path / "sparse.jsonl"
    p.write_text("\n".join(lines) + "\n")
    got = pa.concat_tables(list(iter_jsonl_tables(str(p),
                                                  target_bytes=128)))
    assert got.num_rows == 40
    assert got.column("lang").null_count == 20
    assert got.column("id").to_pylist() == list(range(40))

    lines2 = [f'{{"id": {i}}}' for i in range(20)]
    lines2 += ['{"id": 99, "surprise": true}']
    p2 = tmp_path / "extra.jsonl"
    p2.write_text("\n".join(lines2) + "\n")
    with pytest.raises(ValueError, match="surprise"):
        list(iter_jsonl_tables(str(p2), target_bytes=64))


def test_iter_jsonl_giant_line(tmp_path):
    """A single multi-MB document line parses (pyarrow's default 1 MiB
    json block would raise 'straddling object')."""
    from parquet_rs_ray.job import iter_jsonl_tables

    big = "x" * (2 << 20)
    p = tmp_path / "big.jsonl"
    p.write_text(f'{{"id": 1, "text": "{big}"}}\n{{"id": 2, "text": "s"}}\n')
    got = pa.concat_tables(list(iter_jsonl_tables(str(p))))
    assert got.num_rows == 2
    assert len(got.column("text")[0].as_py()) == 2 << 20


def test_huge_int_predicates_fold_not_crash(ray_session):
    """Predicate values outside int64's domain must constant-fold
    (x==2^63: no rows; x<2^63: all rows) instead of crashing the bloom
    probe (OverflowError) or the exact filter (TypeError)."""
    import ray

    from parquet_rs_ray.page import bloom_might_contain, bloom_from_hashes
    from parquet_rs_ray.ops.dedup import splitmix64
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset

    h = splitmix64(np.arange(10, dtype=np.int64).view(np.uint64))
    bl = bloom_from_hashes(h)
    assert bloom_might_contain(bl, 2**63) is False       # no OverflowError
    assert bloom_might_contain(bl, -2**63 - 1) is False
    assert bloom_might_contain(bl, 5) is True

    tbl = pa.table({"x": pa.array(range(100), pa.int64())})
    enc = encode_dataset(ray.data.from_arrow(tbl))
    assert decode_dataset(enc, predicate=[("x", "==", 2**63)]).count() == 0
    assert decode_dataset(enc, predicate=[("x", "<", 2**63)]).count() == 100
    assert decode_dataset(enc, predicate=[("x", ">", 2**63)]).count() == 0
    assert decode_dataset(enc,
                          predicate=[("x", ">=", -2**70)]).count() == 100


def test_plain_string_bounds_keep_raw_pruning():
    """Regression: url-like string bounds containing hyphens/spaces
    must still prune with raw min/max compares — only bounds that
    actually parse as temporal renderings fall back to the
    shape-mismatch keep rule."""
    from parquet_rs_ray.pipeline import _stats_can_match

    st = {"kind": "str", "min": "http://a-site.com/p 1",
          "max": "http://m-site.com/p 9"}
    assert _stats_can_match(st, "==", "http://b-site.com/x") is True
    assert _stats_can_match(st, "==", "http://z-site.com/x") is False
    assert _stats_can_match(st, "<", "http://a-site.com/p 1") is False
    assert _stats_can_match(st, ">", "http://m-site.com/p 9") is False
    # genuinely temporal bounds still use the shape rule: a date-shaped
    # predicate against timestamp-shaped bounds must NOT prune
    st2 = {"kind": "str", "min": "2024-01-10 00:00:00",
           "max": "2024-01-10 23:59:59"}
    assert _stats_can_match(st2, "==", "2024-01-10") is True
    # non-str predicate against plain string bounds stays conservative
    assert _stats_can_match(st, "==", 5) is True


def test_int_predicate_on_string_column_raises():
    """Regression: an int predicate against a string column is a caller
    type error — it must raise, not silently constant-fold to an empty
    (or all-rows) result."""
    from parquet_rs_ray.pipeline import make_exact_filter

    tbl = pa.table({"s": pa.array(["a", "b"], pa.string())})
    f = make_exact_filter(predicate=[("s", "==", 5)])
    with pytest.raises(Exception):
        f(tbl)
    # huge ints against numeric columns still fold
    tbl2 = pa.table({"x": pa.array([1, 2], pa.int64())})
    f2 = make_exact_filter(predicate=[("x", "<", 2**70)])
    assert f2(tbl2).num_rows == 2


def test_float_inf_nan_vs_out_of_range_predicate():
    """Regression (review repro): a float column holding ±inf/NaN must
    compare EXACTLY against an out-of-float-range int predicate — a
    pure always/never fold keeps +inf and NaN rows that x < 2**1100
    actually drops."""
    from parquet_rs_ray.pipeline import make_exact_filter

    tbl = pa.table({"x": pa.array([1.0, float("inf"), float("-inf"),
                                   float("nan")], pa.float64())})

    def rows(op, val):
        f = make_exact_filter(predicate=[("x", op, val)])
        return f(tbl).column("x").to_pylist()

    big, neg = 2 ** 1100, -(2 ** 1100)
    assert rows("<", big) == [1.0, float("-inf")]
    assert rows("<=", big) == [1.0, float("-inf")]
    assert rows(">", big) == [float("inf")]
    assert rows(">=", big) == [float("inf")]
    assert rows("==", big) == []
    assert rows(">", neg) == [1.0, float("inf")]
    assert rows(">=", neg) == [1.0, float("inf")]
    assert rows("<", neg) == [float("-inf")]
    assert rows("<=", neg) == [float("-inf")]
    assert rows("==", neg) == []


def test_iso_t_timestamp_predicate_not_pruned(ray_session):
    """An ISO-8601 'T'-separator string predicate against a timestamp
    column must return the matching row — the string-rendered bounds
    use a space, and a raw string compare would unsoundly prune the
    block holding the exact match."""
    import datetime

    import ray

    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset

    ts = [datetime.datetime(2024, 1, 15, h) for h in range(24)]
    tbl = pa.table({"t": pa.array(ts, pa.timestamp("us")),
                    "v": pa.array(range(24), pa.int64())})
    enc = encode_dataset(ray.data.from_arrow(tbl))
    out = decode_dataset(
        enc, predicate=[("t", "==", "2024-01-15T10:00:00")]).to_pandas()
    assert out.v.tolist() == [10]
    # space form still prunes+matches
    out2 = decode_dataset(
        enc, predicate=[("t", "==", "2024-01-15 10:00:00")]).to_pandas()
    assert out2.v.tolist() == [10]
