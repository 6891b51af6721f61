"""Training-data pipeline operators: dedup, similarity, text stats,
multimodal plumbing (SURVEY §2.12-adjacent; BASELINE north-star extras)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops import dedup, multimodal, similarity, textstats

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------------ dedup

def test_hash_strings_distinct_and_deterministic():
    vals = ["", "a", "b", "ab", "ba", "hello world", "hello worlc", "a" * 500]
    arr = pa.array(vals, pa.string())
    h1 = dedup._hash_strings(arr)
    h2 = dedup._hash_strings(pa.array(vals, pa.string()))
    assert (h1 == h2).all()
    assert len(set(h1.tolist())) == len(vals)


def test_hash_strings_matches_slice_offset():
    arr = pa.array(["xx", "yy", "zz", "ww"], pa.string())
    full = dedup._hash_strings(arr)
    sliced = dedup._hash_strings(arr.slice(1, 2))
    assert sliced.tolist() == full[1:3].tolist()


@pytest.mark.parametrize("mode", ["broadcast", "join"])
def test_exact_dedup(ray_session, mode):
    import ray
    tbl = pa.table({
        "doc_id": pa.array([5, 1, 2, 3, 4], pa.int64()),
        "text": ["dup", "dup", "unique1", "dup", "unique2"],
    })
    ds = ray.data.from_arrow(tbl)
    out = dedup.exact_dedup(ds, "text", "doc_id", mode=mode,
                            num_partitions=4).to_pandas()
    assert sorted(out["doc_id"].tolist()) == [1, 2, 4]
    assert sorted(out.columns) == ["doc_id", "text"]


def test_minhash_lsh_finds_near_dup(ray_session):
    import ray
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different content with no overlap at all " * 20
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, other],
    })
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.minhash_lsh_candidates(ds, concurrency=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got
    # verify stage: exact n-gram Jaccard on the candidate pair
    assert dedup.ngram_jaccard(base, near) > 0.5
    assert dedup.ngram_jaccard(base, other) < 0.1


def test_simhash_near_and_far():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("dog", "cat", 2)
    far = "lorem ipsum dolor sit amet consectetur adipiscing elit " * 10
    h = dedup.simhash([base, near, far])
    def ham(a, b):
        return bin(int(a) ^ int(b)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[2])
    assert (dedup.simhash([base]) == h[0]).all()  # deterministic


# ------------------------------------------------------------- similarity

def test_brute_force_topk_matches_numpy(ray_session):
    import ray
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    out = similarity.brute_force_topk(ds, q, k=5).to_pandas()
    # exact reference: full normalized matmul
    vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    scores = vn @ qn.T
    for qi in range(3):
        expect = set(np.argsort(-scores[:, qi])[:5].tolist())
        got = set(out[out["query_idx"] == qi]["vec_id"].tolist())
        assert got == expect


def test_lsh_topk_recalls_self(ray_session):
    import ray
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((300, 16)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(300), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    q = vecs[7:8]  # query IS a dataset vector → its bucket contains it
    out = similarity.lsh_topk(ds, q, k=5, nbits=8, concurrency=2).to_pandas()
    assert 7 in out["vec_id"].tolist()
    assert out.iloc[0]["score"] == pytest.approx(1.0, abs=1e-5) or \
        max(out["score"]) == pytest.approx(1.0, abs=1e-5)


def test_similarity_on_embeddings_table(ray_session):
    import ray
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    first = ds.take(1)[0]
    q = np.asarray([first["embedding"]], dtype=np.float32)
    out = similarity.brute_force_topk(ds, q, k=3).to_pandas()
    assert out.iloc[0]["vec_id"] == first["vec_id"]


# -------------------------------------------------------------- textstats

def test_token_counts_ws_definition():
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["a b  c", "hello"]})
    out = textstats.token_counts(batch).to_pandas()
    # definition: count(' ')+1 (SQL-reproducible), so "a b  c" → 4
    assert out["n_tokens_ws"].tolist() == [4, 1]
    assert out["n_tokens_re"].tolist() == [3, 1]
    assert "doc_id" in out.columns


def test_quality_and_language(ray_session):
    import ray
    en = ("the cat sat on the mat and it is a fine day for all of the "
          "animals in the garden to play ") * 3
    de = "der hund und die katze sind in den garten mit dem ball " * 3
    junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"
    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": [en, de, junk]})
    ds = ray.data.from_arrow(tbl)
    scored = ds.map_batches(textstats.QualityScorer, batch_format="pyarrow",
                            concurrency=1).to_pandas().set_index("doc_id")
    assert scored.loc[1, "quality_score"] > scored.loc[3, "quality_score"]
    langs = ds.map_batches(textstats.LanguageId, batch_format="pyarrow",
                           concurrency=1).to_pandas().set_index("doc_id")
    assert langs.loc[1, "lang_pred"] == "en"
    assert langs.loc[2, "lang_pred"] == "de"


def test_fingerprints_deterministic():
    batch = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["alpha", "beta"]})
    f1 = textstats.fingerprints(batch).to_pandas()
    f2 = textstats.fingerprints(batch).to_pandas()
    assert f1["fingerprint"].tolist() == f2["fingerprint"].tolist()
    assert f1["fingerprint"][0] != f1["fingerprint"][1]


# ------------------------------------------------------------- multimodal

def test_attach_media_schema():
    batch = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "media": pa.array([b"\xff\xd8fakejpeg"], pa.binary())})
    out = multimodal.attach_media(batch, payload_col="media", fmt="jpeg",
                                  meta={"width": 8})
    assert out.column_names == ["doc_id", "media", "media_format",
                                "media_meta"]
    assert out.column("media_format")[0].as_py() == "jpeg"


def test_decode_image_stub_gate():
    # lossy-VP8 webp / avif remain the codec-library seam (JPEG, PNG,
    # GIF and LOSSLESS webp decode natively — ops/jpeg.py, ops/png.py,
    # ops/gif.py, ops/webp.py — so magic-bytes payloads that are
    # garbage now raise the decoders' typed errors, not the seam)
    dec = multimodal.DecodeImage(fake=False)
    webp = pa.table({"media": pa.array(
        [b"RIFF\x10\x00\x00\x00WEBP"
         b"VP8 \x04\x00\x00\x00\x00\x00\x00\x00"], pa.binary())})
    with pytest.raises(NotImplementedError):
        dec(webp)
    from parquet_rs_ray.ops.jpeg import JpegError
    bad_jpeg = pa.table({"media": pa.array([b"\xff\xd8fakejpeg"],
                                           pa.binary())})
    with pytest.raises(JpegError):
        dec(bad_jpeg)
    from parquet_rs_ray.ops.png import PngError
    bad_png = pa.table({"media": pa.array([b"\x89PNG\r\n\x1a\nxx"],
                                          pa.binary())})
    with pytest.raises(PngError):
        dec(bad_png)


def _ppm_bytes(img: np.ndarray, comment: bool = False) -> bytes:
    h, w = img.shape[:2]
    hdr = b"P6\n" + (b"# synthetic\n" if comment else b"") + \
        f"{w} {h}\n255\n".encode()
    return hdr + img.astype(np.uint8).tobytes()


def _bmp_bytes(img: np.ndarray, bpp: int = 24, top_down: bool = False) -> bytes:
    h, w = img.shape[:2]
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for r in order:
        row = bytearray()
        for c in range(w):
            px = img[r, c]
            row += bytes([px[2], px[1], px[0]])       # BGR
            if nb == 4:
                row += b"\xff"                        # alpha
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    raster = b"".join(rows)
    off = 14 + 40
    hdr = (b"BM" + (off + len(raster)).to_bytes(4, "little") + b"\x00" * 4
           + off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + (-h if top_down else h).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + bpp.to_bytes(2, "little")
           + (0).to_bytes(4, "little") + b"\x00" * 20)
    return hdr + raster


def test_ppm_decode_real():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (5, 3, 3), np.uint8)
    got = multimodal._decode_ppm(_ppm_bytes(img, comment=True))
    assert (got == img).all()
    # PGM grayscale expands to 3 identical channels
    gray = rng.randint(0, 256, (4, 6), np.uint8)
    pgm = b"P5\n6 4\n255\n" + gray.tobytes()
    got = multimodal._decode_ppm(pgm)
    assert got.shape == (4, 6, 3) and (got[:, :, 0] == gray).all() \
        and (got[:, :, 2] == gray).all()


@pytest.mark.parametrize("bpp,top_down", [(24, False), (24, True),
                                          (32, False)])
def test_bmp_decode_real(bpp, top_down):
    rng = np.random.RandomState(bpp + top_down)
    img = rng.randint(0, 256, (3, 3, 3), np.uint8)   # w=3 → padded stride
    got = multimodal._decode_bmp(_bmp_bytes(img, bpp=bpp,
                                            top_down=top_down))
    assert (got == img).all()
    with pytest.raises(NotImplementedError):
        payload = bytearray(_bmp_bytes(img))
        payload[30] = 1                              # BI_RLE8
        multimodal._decode_bmp(bytes(payload))


def test_resize_nearest():
    img = np.arange(4 * 3).reshape(2, 2, 3).astype(np.uint8)
    up = multimodal._resize_nearest(img, (4, 4))
    assert up.shape == (4, 4, 3)
    assert (up[:2, :2] == img[0, 0]).all() and (up[2:, 2:] == img[1, 1]).all()
    down = multimodal._resize_nearest(up, (2, 2))
    assert (down == img).all()


def test_decode_images_real_pipeline(ray_session):
    import ray
    rng = np.random.RandomState(3)
    imgs = [rng.randint(0, 256, (6 + i, 5, 3), np.uint8) for i in range(6)]
    payloads = [_ppm_bytes(im) if i % 2 == 0 else _bmp_bytes(im)
                for i, im in enumerate(imgs)]
    tbl = pa.table({"doc_id": pa.array(range(6), pa.int64()),
                    "media": pa.array(payloads, pa.binary())})
    out = multimodal.decode_images(ray.data.from_arrow(tbl), batch_size=2,
                                   concurrency=2, fake=False,
                                   target_hw=(8, 8)).to_pandas() \
        .sort_values("doc_id")
    assert (out.height == 8).all() and (out.width == 8).all()
    # checksums equal a direct single-process decode
    import hashlib
    for i, p in enumerate(payloads):
        raw = multimodal.decode_image_bytes(p, (8, 8)).tobytes()
        exp = int.from_bytes(hashlib.blake2b(raw, digest_size=8).digest(),
                             "little", signed=True)
        assert out.pixel_checksum.iloc[i] == exp


def test_decode_images_pipeline(ray_session):
    import ray
    payloads = [bytes([i]) * (100 + i) for i in range(10)]
    tbl = pa.table({"doc_id": pa.array(range(10), pa.int64()),
                    "media": pa.array(payloads, pa.binary())})
    ds = ray.data.from_arrow(tbl)
    out = multimodal.decode_images(ds, batch_size=4, concurrency=2,
                                   fake=True).to_pandas()
    assert len(out) == 10
    assert set(out.columns) >= {"doc_id", "height", "width", "channels",
                                "pixel_checksum"}
    assert (out["height"] == 224).all()
    # deterministic across runs
    out2 = multimodal.decode_images(ds, batch_size=4, concurrency=2,
                                    fake=True).to_pandas()
    m1 = out.sort_values("doc_id")["pixel_checksum"].tolist()
    m2 = out2.sort_values("doc_id")["pixel_checksum"].tolist()
    assert m1 == m2


def test_sample_frames():
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "media": pa.array([bytes(range(100))], pa.binary())})
    out = multimodal.SampleFrames(num_frames=4)(tbl).to_pandas()
    assert len(out) == 4
    assert out["frame_idx"].tolist() == [0, 1, 2, 3]
    joined = b"".join(out["frame_bytes"])
    assert joined == bytes(range(100))


def test_near_dedup_drops_verified_dupes(ray_session):
    import ray
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different content with no overlap at all " * 20
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, other],
    })
    ds = ray.data.from_arrow(tbl)
    out = dedup.near_dedup(ds, jaccard_threshold=0.5, concurrency=2)
    assert sorted(out.to_pandas()["doc_id"].tolist()) == [1, 3]


def test_simhash_candidates_buckets(ray_session):
    import ray
    base = "the quick brown fox jumps over the lazy dog " * 20
    near = base.replace("lazy", "sleepy", 1)
    other = "completely different content with no overlap at all " * 20
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": [base, near, other],
    })
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.simhash_candidates(ds, max_hamming=6,
                                     concurrency=2).to_pandas()
    got = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_embedding_near_dup_matches_bruteforce(ray_session):
    import ray
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    vecs[7] = vecs[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    out = dedup.embedding_near_dup(ds, threshold=0.9).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    m = vecs.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    s = m @ m.T
    want = {(i, j) for i in range(40) for j in range(i + 1, 40)
            if s[i, j] >= 0.9}
    assert got == want and (3, 7) in got


def test_ivf_topk_recall_vs_bruteforce(ray_session):
    import ray
    rng = np.random.default_rng(11)
    # clustered data so IVF cells are meaningful
    centers = rng.standard_normal((4, 16)).astype(np.float32) * 3
    vecs = np.vstack([c + rng.standard_normal((50, 16)).astype(np.float32)
                      for c in centers])
    tbl = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    q = vecs[[0, 60, 120]]
    exact = similarity.brute_force_topk(ds, q, k=5).to_pandas()
    approx = similarity.ivf_topk(ds, q, k=5, nlist=4, nprobe=2,
                                 sample_size=200).to_pandas()
    for qi in range(3):
        e = set(exact[exact.query_idx == qi].vec_id)
        a = set(approx[approx.query_idx == qi].vec_id)
        assert len(e & a) >= 4  # ≥80% recall per query


def test_sessionize_gap_semantics(ray_session):
    import ray
    from parquet_rs_ray.ops.temporal import sessionize
    us = 60_000_000
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([0, 10 * us, 50 * us, 5 * us], pa.timestamp("us")),
    })
    out = sessionize(ray.data.from_arrow(tbl), gap_minutes=30).to_pandas()
    out = out.sort_values(["user_id", "session_id"]).reset_index(drop=True)
    assert out["n_events"].tolist() == [2, 1, 1]
    assert out["session_id"].tolist() == [1, 2, 1]


def test_asof_join_matches_and_nulls(ray_session):
    import ray
    from parquet_rs_ray.ops.temporal import asof_join
    us = 60_000_000
    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "event_id": pa.array([100, 101, 102], pa.int64()),
        "ts": pa.array([20 * us, 60 * us, 7 * us], pa.timestamp("us")),
    }))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array([0, 30 * us], pa.timestamp("us")),
    }))
    out = asof_join(left, right, key_col="user_id", ts_col="ts",
                    right_ts_name="m").to_pandas().sort_values("event_id")
    got = [None if v != v else int(v.timestamp() // 60) for v in out["m"]]
    assert got == [0, 30, None]  # minutes (NaT != NaT)


def test_range_join_broadcast(ray_session):
    import ray
    from parquet_rs_ray.ops.temporal import range_join_broadcast
    tbl = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                    "v": pa.array([5.0, 150.0, 99.9, -1.0], pa.float64())})
    out = range_join_broadcast(
        ray.data.from_arrow(tbl), [("a", 0.0, 100.0), ("b", 100.0, 200.0)],
        value_col="v").to_pandas().sort_values("id")
    assert out["band"].tolist() == ["a", "b", "a", None]


def test_near_dedup_majority_dups_distributed(ray_session):
    """Scale-shape regression: >50% of docs are near-dups across many
    blocks — the distributed verify (joins + anti-join, no driver
    materialization of pairs/texts) must keep exactly one doc per
    near-dup cluster plus all uniques."""
    import ray
    words = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
             "lambda mu nu xi omicron pi rho sigma tau upsilon ").split()
    base1 = " ".join(words * 10)                    # 200 words
    base2 = " ".join(reversed(words * 10))
    rows_id, rows_text = [], []
    for i in range(120):                            # cluster 1: ids 0..119
        rows_id.append(i)
        rows_text.append(base1.replace("alpha", f"tok{i}", 1))
    for i in range(120, 240):                       # cluster 2: ids 120..239
        rows_id.append(i)
        rows_text.append(base2.replace("sigma", f"tok{i}", 1))
    for i in range(240, 400):                       # uniques
        rows_id.append(i)
        rows_text.append(" ".join(f"u{i}w{j}" for j in range(60)))
    tables = [pa.table({
        "doc_id": pa.array(rows_id[s:s + 40], pa.int64()),
        "text": pa.array(rows_text[s:s + 40], pa.string()),
    }) for s in range(0, 400, 40)]                  # 10 blocks
    ds = ray.data.from_arrow(tables)
    out = dedup.near_dedup(ds, jaccard_threshold=0.5, concurrency=2)
    got = sorted(out.to_pandas()["doc_id"].tolist())
    assert got == [0, 120] + list(range(240, 400))


def _session_reference(keys, ts, gap_us):
    """In-test oracle: per-key sorted scan (plain Python, small n)."""
    import collections
    by_key = collections.defaultdict(list)
    for k, t in zip(keys, ts):
        by_key[k].append(t)
    rows = []
    for k, tss in by_key.items():
        tss.sort()
        sid, start, prev, n = 0, None, None, 0
        for t in tss:
            if prev is None or t - prev > gap_us:
                if prev is not None:
                    rows.append((k, sid, n, start, prev))
                sid += 1
                start, n = t, 0
            n += 1
            prev = t
        rows.append((k, sid, n, start, prev))
    return sorted(rows)


def test_sessionize_randomized_and_salted(ray_session):
    """Partition-vectorized sessionize ≡ per-key reference, with and
    without hot-key time salting, on a skewed corpus (1 user = 50%)."""
    import ray
    from parquet_rs_ray.ops.temporal import sessionize
    rng = np.random.default_rng(42)
    n = 4000
    hot = rng.integers(0, 2, n).astype(bool)       # ~50% on user 0
    keys = np.where(hot, 0, rng.integers(1, 40, n)).astype(np.int64)
    ts = rng.integers(0, 3 * 24 * 3600, n).astype(np.int64) * 1_000_000
    gap_us = 30 * 60 * 1_000_000
    tbl = pa.table({"user_id": pa.array(keys),
                    "ts": pa.array(ts, pa.timestamp("us"))})
    tables = [tbl.slice(s, 500) for s in range(0, n, 500)]
    want = _session_reference(keys.tolist(), ts.tolist(), gap_us)

    for salt in (None, 240.0):                     # 4 h buckets >> 30 min
        out = sessionize(ray.data.from_arrow(tables), gap_minutes=30,
                         salt_period_minutes=salt).to_pandas()
        got = sorted(
            (int(r.user_id), int(r.session_id), int(r.n_events),
             int(r.start_ts.value) // 1000, int(r.end_ts.value) // 1000)
            for r in out.itertuples())
        assert got == want, f"salt={salt}"


@pytest.mark.parametrize("mode", ["shuffle", "broadcast"])
def test_asof_join_randomized(ray_session, mode):
    """Partition-vectorized (and broadcast-right) as-of join ≡ per-key
    searchsorted oracle."""
    import ray
    from parquet_rs_ray.ops.temporal import asof_join
    rng = np.random.default_rng(5)
    nl, nr = 1500, 1200
    lk = rng.integers(0, 30, nl).astype(np.int64)
    lt = rng.integers(0, 10**6, nl).astype(np.int64)
    rk = rng.integers(5, 25, nr).astype(np.int64)  # some keys right-less
    rt = rng.integers(0, 10**6, nr).astype(np.int64)
    left = ray.data.from_arrow(pa.table({
        "user_id": pa.array(lk), "event_id": pa.array(np.arange(nl)),
        "ts": pa.array(lt, pa.timestamp("us"))}))
    right = ray.data.from_arrow(pa.table({
        "user_id": pa.array(rk), "ts": pa.array(rt, pa.timestamp("us"))}))
    out = asof_join(left, right, key_col="user_id", ts_col="ts",
                    right_ts_name="m", mode=mode) \
        .to_pandas().sort_values("event_id")
    got = [None if v != v else int(v.value) // 1000 for v in out["m"]]
    want = []
    for i in range(nl):
        cand = rt[(rk == lk[i]) & (rt <= lt[i])]
        want.append(int(cand.max()) if len(cand) else None)
    assert got == want


@pytest.mark.parametrize("mode", ["shuffle", "broadcast"])
def test_asof_join_null_string_keys(ray_session, mode):
    """ADVICE r2: broadcast mode crashed (TypeError in the object-array
    searchsorted) on string keys with nulls; null key or ts on either
    side must mean "no match", identically in both modes."""
    import ray
    from parquet_rs_ray.ops.temporal import asof_join
    lk = ["a", None, "b", "a", None, "c", "b"]
    lt = [100, 200, 300, None, 50, 400, 500]
    rk = ["a", "b", None, "a", "c", None]
    rt = [90, 250, 10, None, 500, None]
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(lk), "event_id": pa.array(np.arange(len(lk))),
        "ts": pa.array(lt, pa.timestamp("us"))}))
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(rk), "ts": pa.array(rt, pa.timestamp("us"))}))
    out = asof_join(left, right, key_col="k", ts_col="ts",
                    right_ts_name="m", mode=mode) \
        .to_pandas().sort_values("event_id")
    got = [None if v != v else int(v.value) // 1000 for v in out["m"]]
    # per-row oracle: max right ts <= left ts among same non-null key
    want = []
    for i in range(len(lk)):
        if lk[i] is None or lt[i] is None:
            want.append(None)
            continue
        cand = [t for kk, t in zip(rk, rt)
                if kk == lk[i] and t is not None and t <= lt[i]]
        want.append(max(cand) if cand else None)
    assert got == want, mode


def test_embedding_near_dup_lsh_scale_path(ray_session):
    """Bucketed LSH near-dup: finds planted near-identical pairs, never
    emits a below-threshold pair (per-bucket verify is exact), and all
    emitted pairs agree bit-for-bit with the broadcast-exact scores."""
    import ray
    rng = np.random.default_rng(8)
    vecs = rng.standard_normal((120, 16)).astype(np.float32)
    vecs[11] = vecs[3] + 0.01 * rng.standard_normal(16).astype(np.float32)
    vecs[77] = vecs[40] + 0.01 * rng.standard_normal(16).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(120), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow([tbl.slice(0, 60), tbl.slice(60, 60)])
    out = dedup.embedding_near_dup_lsh(ds, threshold=0.9, nbits=4,
                                       n_tables=8, concurrency=2).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert (3, 11) in got and (40, 77) in got
    # exact-verify property: every emitted pair truly scores >= 0.9
    exact = dedup.embedding_near_dup(ds, threshold=0.9).to_pandas()
    exact_pairs = set(map(tuple, exact[["id_a", "id_b"]].values.tolist()))
    assert got <= exact_pairs
    m = exact.set_index(["id_a", "id_b"])["score"]
    for p in got:
        row = out[(out.id_a == p[0]) & (out.id_b == p[1])].iloc[0]
        assert row["score"] == m.loc[p]


def test_textstats_vectorized_equals_per_doc_reference():
    """The Arrow-kernel QualityScorer / LanguageId must reproduce the
    original per-document Python logic exactly (incl. whitespace runs,
    empty docs, unicode words, >200-word docs)."""
    import re as _re
    texts = [
        "the cat  sat   on the mat!! truly, the   best of days",
        "", "   ", "der hund und die katze sind Hier.",
        "le chat et\tles chiens\n\nen ville",
        "x" * 300, "one-word",
        " ".join(f"w{i}" for i in range(400)) + " the of and to in a",
        "el perro y la casa de! los niños",
        "naïve café déjà-vu — em–dash",
    ]
    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts, pa.string())})
    got_q = textstats.QualityScorer()(batch).to_pandas()
    got_l = textstats.LanguageId()(batch).to_pandas()

    punct_re = _re.compile(r"[^\w\s]", _re.ASCII)
    all_stop = set().union(*textstats._STOPWORDS.values())
    for i, t in enumerate(texts):
        # the op's contract: LITERAL space split (SQL-reproducible)
        words = [w for w in t.split(" ") if w]
        n_words = float(len(words))
        mean_wl = np.mean([len(x) for x in words]) if words else 0.0
        punct = float(len(punct_re.findall(t)))
        stop_ratio = (sum(1 for x in words if x.lower() in all_stop)
                      / len(words)) if words else 0.0
        score = (np.clip(n_words / 50.0, 0, 1) * 0.3
                 + np.clip(1 - abs(mean_wl - 5.0) / 5.0, 0, 1) * 0.3
                 + np.clip(stop_ratio * 4, 0, 1) * 0.2
                 + np.clip(1 - punct / max(len(t), 1) * 5, 0, 1) * 0.2)
        assert got_q.iloc[i]["quality_score"] == pytest.approx(
            round(float(score), 6), abs=2e-6), (i, t[:40])
        wset = set(w.lower() for w in
                   [x for x in t.split(" ") if x][:200])
        best, best_n = "unknown", 0
        for lang, prof in textstats._STOPWORDS.items():
            hits = len(wset & prof)
            if hits > best_n:
                best, best_n = lang, hits
        assert got_l.iloc[i]["lang_pred"] == best, (i, t[:40])


def test_grouped_topk_matches_reference(ray_session):
    import ray
    from parquet_rs_ray.ops.relational import grouped_topk
    rng = np.random.default_rng(2)
    n = 5000
    tbl = pa.table({
        "g": pa.array(rng.integers(0, 200, n), pa.int64()),
        "v": pa.array(rng.standard_normal(n)),
        "id": pa.array(np.arange(n), pa.int64()),
    })
    ds = ray.data.from_arrow([tbl.slice(s, 1000) for s in range(0, n, 1000)])
    out = grouped_topk(ds, group_col="g", order_col="v", k=3,
                       tiebreak_col="id").to_pandas()
    df = tbl.to_pandas()
    want = df.sort_values(["g", "v", "id"], ascending=[True, False, True]) \
        .groupby("g").head(3)
    got = out.sort_values(["g", "v", "id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert got[["g", "v", "id"]].equals(want[["g", "v", "id"]])


def test_broadcast_hash_join(ray_session):
    import ray
    from parquet_rs_ray.ops.relational import broadcast_hash_join
    left = pa.table({"k": pa.array([1, 2, 3, 2, 9], pa.int64()),
                     "x": pa.array(list("abcde"))})
    dim = pa.table({"dk": pa.array([1, 2, 3], pa.int64()),
                    "name": pa.array(["one", "two", "three"])})
    ds = ray.data.from_arrow(left)
    inner = broadcast_hash_join(ds, dim, on="k", right_on="dk") \
        .to_pandas().sort_values(["k", "x"])
    assert inner["name"].tolist() == ["one", "two", "two", "three"]
    louter = broadcast_hash_join(ds, dim, on="k", right_on="dk",
                                 join_type="left outer") \
        .to_pandas().sort_values(["k", "x"])
    assert len(louter) == 5
    assert louter[louter.k == 9]["name"].isna().all()


def test_distinct_count_and_hll(ray_session):
    import ray
    from parquet_rs_ray.ops.relational import distinct_count
    from parquet_rs_ray.ops.sketch import hll_distinct
    rng = np.random.default_rng(3)
    vals = [f"value-{int(v)}" for v in rng.integers(0, 7000, 40_000)]
    exact_n = len(set(vals))
    tbl = pa.table({"text": pa.array(vals, pa.string())})
    ds = ray.data.from_arrow(
        [tbl.slice(s, 5000) for s in range(0, 40_000, 5000)])
    assert distinct_count(ds, "text")["n_distinct"][0] == exact_n
    approx = hll_distinct(ds, "text")["approx_distinct"][0]
    assert abs(approx - exact_n) / exact_n < 0.05  # p=12 ⇒ ~1.6% σ


def test_pack_sequences_invariants(ray_session):
    """FFD packing: every doc assigned once, every bin ≤ budget (except
    single over-long docs), fill monitored, deterministic."""
    import ray
    from parquet_rs_ray.ops.packing import pack_sequences
    rng = np.random.default_rng(4)
    lens = rng.integers(1, 900, 3000)
    texts = ["w " * int(l - 1) + "w" for l in lens]   # exactly l ws-tokens
    texts[0] = "x " * 9000                             # over-long doc
    tbl = pa.table({"doc_id": pa.array(range(3000), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow([tbl.slice(0, 1500), tbl.slice(1500, 1500)])
    out = pack_sequences(ds, bin_tokens=4096).to_pandas()
    assert len(out) == 3000 and out["doc_id"].is_unique
    g = out.groupby("bin_uid").agg(total=("n_tokens", "sum"),
                                   claimed=("bin_total", "first"))
    assert (g["total"] == g["claimed"]).all()
    multi = out.groupby("bin_uid").size()
    over = out[out["n_tokens"] > 4096]["bin_uid"]
    assert (g.drop(index=over).total <= 4096).all()
    assert multi[over].eq(1).all()                     # over-long: own bin
    # efficiency: FFD should fill bins well on this distribution
    assert g.drop(index=over).total.mean() / 4096 > 0.8


def test_simhash_trailing_empty_docs():
    """Regression: a batch ending in empty/whitespace docs must not
    corrupt the preceding doc's hash (reduceat segment clamping)."""
    doc = "alpha beta gamma delta"
    solo = dedup.simhash([doc])[0]
    assert dedup.simhash([doc, ""])[0] == solo
    assert dedup.simhash([doc, "   "])[0] == solo
    assert dedup.simhash(["", doc, "", ""])[1] == solo
    assert dedup.simhash([""])[0] == 0


def test_hll_float_and_null_columns(ray_session):
    import ray
    from parquet_rs_ray.ops.sketch import hll_distinct
    tbl = pa.table({
        "f": pa.array([1.5, 2.5, 1.5, None, 3.0], pa.float64()),
        "i": pa.array([1, 2, None, 2, 3], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    approx_f = hll_distinct(ds, "f")["approx_distinct"][0]
    approx_i = hll_distinct(ds, "i")["approx_distinct"][0]
    assert approx_f == 3 and approx_i == 3  # exact at tiny cardinality


def test_prefix_block_pairs_and_ngram_jaccard(ray_session):
    """Prefix blocking finds exactly the docs sharing a 50-char head;
    distributed pair scoring agrees with the scalar ngram_jaccard."""
    import ray
    texts = {
        1: "the quick brown fox jumps over the lazy dog again and again",
        2: "the quick brown fox jumps over the lazy dog again and AGAIN",
        3: "a completely different document body with no shared head",
        4: "the quick brown fox jumps over the lazy dog again and again",
    }
    # 1/2/4 share the first 50 chars; 3 is alone
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()), pa.string())})
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.prefix_block_pairs(ds, prefix_len=50).to_pandas()
    got = sorted(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert got == [(1, 2), (1, 4), (2, 4)]

    scored = dedup.ngram_jaccard_pairs(
        ray.data.from_arrow(pa.table(
            {"a": pa.array([1, 1, 2, 1], pa.int64()),
             "b": pa.array([2, 3, 4, 4], pa.int64())})),
        ds).to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    for _, r in scored.iterrows():
        expect = dedup.ngram_jaccard(texts[r.a], texts[r.b])
        assert r.jaccard == pytest.approx(expect, abs=0)
    assert scored.loc[2, "jaccard"] == 1.0          # (1,4): identical docs
    assert 0 < scored.loc[0, "jaccard"] < 1         # (1,2): near-dup
    assert scored.loc[1, "jaccard"] == 0.0          # (1,3): unrelated


def test_top_terms_oracle(ray_session):
    import duckdb
    import ray
    from parquet_rs_ray.ops.textstats import top_terms
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["lang", "text"])
    out = top_terms(ds, k=5).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    odf = con.execute(
        "WITH w AS (SELECT lang, unnest(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS word "
        "FROM documents), "
        "c AS (SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM w GROUP BY lang, word) "
        "SELECT lang, word, cnt FROM c QUALIFY ROW_NUMBER() OVER "
        "(PARTITION BY lang ORDER BY cnt DESC, word) <= 5").fetchdf()
    cols = ["lang", "word", "cnt"]
    a = out[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b)


WORD_DF_SQL = """
WITH w AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
  x -> x <> '')) AS word FROM documents),
dfreq AS (SELECT word, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM w GROUP BY word),
agg AS (SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
  CAST(SUM(df) AS BIGINT) AS sum_df, CAST(MIN(df) AS BIGINT) AS min_df
  FROM w JOIN dfreq USING(word) GROUP BY w.doc_id)
SELECT d.doc_id, COALESCE(n_words, 0) AS n_words,
  COALESCE(sum_df, 0) AS sum_df, COALESCE(min_df, 0) AS min_df
FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
ORDER BY d.doc_id
"""


def test_word_df_stats_oracle(ray_session):
    import duckdb
    import ray
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    got = textstats.word_df_stats(ds).to_pandas().sort_values("doc_id")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    exp = con.execute(WORD_DF_SQL).fetchdf()
    g = got[exp.columns].reset_index(drop=True)
    assert g.equals(exp.astype(g.dtypes.to_dict()))


def test_word_df_stats_edges(ray_session):
    import ray
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["rare common common", "", "common"]),
    })
    out = textstats.word_df_stats(ray.data.from_arrow(tbl)) \
        .to_pandas().set_index("doc_id").sort_index()
    # df(common)=2 (docs 1,3), df(rare)=1
    assert out.loc[1].tolist() == [3, 1 + 2 + 2, 1]
    assert out.loc[2].tolist() == [0, 0, 0]
    assert out.loc[3].tolist() == [1, 2, 2]


def test_exact_quantiles_oracle_and_edges(ray_session):
    import duckdb
    import ray
    from parquet_rs_ray.ops.relational import exact_quantiles
    qs = (0.0, 0.1, 0.5, 0.9, 1.0)
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["n_chars"])
    got = exact_quantiles(ds, "n_chars", qs=qs)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    sql = " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(n_chars, {q}) AS value "
        f"FROM documents" for q in qs)
    exp = con.execute(sql).fetchdf().sort_values("q")
    assert got.value.tolist() == exp.value.tolist()
    # nulls excluded, tiny input, duplicate values
    tbl = pa.table({"x": pa.array([3, 1, None, 3, 2], pa.int64())})
    got2 = exact_quantiles(ray.data.from_arrow(tbl), "x", qs=(0.5, 1.0))
    assert got2.value.tolist() == [2, 3]  # sorted [1,2,3,3]: ceil(.5*4)-1=1


def test_audio_pcm_features_analytic():
    """Real DSP kernel (raw PCM needs no codec lib): analytic values for
    square wave (rms .5, zcr 1), DC (rms .25, zcr 0), empty, and the
    empty-leading-clip boundary-mask edge."""
    from parquet_rs_ray.ops.multimodal import AudioPcmFeatures
    sq = np.tile(np.array([16384, -16384], dtype=np.int16), 100)
    const = np.full(50, 8192, dtype=np.int16)
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "media": pa.array([sq.tobytes(), const.tobytes(), b""],
                                    pa.binary())})
    out = AudioPcmFeatures()(t).to_pandas()
    assert out.rms[0] == pytest.approx(0.5) and \
        out.zero_crossing_rate[0] == pytest.approx(1.0)
    assert out.rms[1] == pytest.approx(0.25) and \
        out.zero_crossing_rate[1] == 0.0
    assert out.duration_s[2] == 0.0 and out.rms[2] == 0.0
    # empty FIRST clip must not mask the last crossing of the next clip
    t2 = pa.table({"id": pa.array([1, 2], pa.int64()),
                   "media": pa.array([b"", sq[:4].tobytes()], pa.binary())})
    out2 = AudioPcmFeatures()(t2).to_pandas()
    assert out2.zero_crossing_rate[1] == pytest.approx(1.0)


def test_audio_features_dataset(ray_session):
    import ray
    from parquet_rs_ray.ops.multimodal import audio_features
    rng = np.random.default_rng(3)
    clips = [(rng.standard_normal(256) * 8000).astype(np.int16).tobytes()
             for _ in range(20)]
    tbl = pa.table({"clip_id": pa.array(range(20), pa.int64()),
                    "media": pa.array(clips, pa.binary())})
    out = audio_features(ray.data.from_arrow(tbl), batch_size=6,
                         concurrency=2).to_pandas()
    assert len(out) == 20 and (out.rms > 0).all()
    assert set(out.columns) == {"clip_id", "duration_s", "sample_rate",
                                "rms", "peak", "zero_crossing_rate"}


def test_audio_wav_container():
    """RIFF/WAVE parses natively: fmt rate overrides the default,
    stereo downmixes by channel mean, raw-PCM clips mix in the same
    batch, compressed tags raise the named seam, truncation is typed."""
    import struct

    from parquet_rs_ray.ops.multimodal import AudioPcmFeatures, parse_wav

    def wav(samples: np.ndarray, rate: int, ch: int, tag: int = 1,
            bits: int = 16) -> bytes:
        raw = samples.astype("<i2").tobytes()
        fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * 2 * ch,
                          2 * ch, bits)
        body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(raw)) + raw)
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    sq = np.tile(np.array([16384, -16384], np.int16), 100)
    s, r = parse_wav(wav(sq, 8000, 1))
    assert r == 8000 and np.allclose(s, sq / 32768.0)
    # stereo: L = sq, R = 0 -> mean halves the amplitude
    inter = np.zeros(2 * len(sq), np.int16)
    inter[0::2] = sq
    s2, r2 = parse_wav(wav(inter, 44100, 2))
    assert r2 == 44100 and np.allclose(s2, sq / 65536.0)

    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "media": pa.array([wav(sq, 8000, 1), sq.tobytes()],
                                    pa.binary())})
    out = AudioPcmFeatures(sample_rate=16000)(t).to_pandas()
    assert out.sample_rate.tolist() == [8000.0, 16000.0]
    assert out.duration_s[0] == pytest.approx(len(sq) / 8000)
    assert out.duration_s[1] == pytest.approx(len(sq) / 16000)
    assert out.rms.tolist() == pytest.approx([0.5, 0.5])

    with pytest.raises(NotImplementedError, match="PCM16"):
        parse_wav(wav(sq, 8000, 1, tag=85))        # mp3-in-wav
    with pytest.raises(ValueError, match="truncated"):
        parse_wav(wav(sq, 8000, 1)[:30])


def test_grouped_quantiles_oracle_and_nulls(ray_session):
    import duckdb
    import ray
    from parquet_rs_ray.ops.relational import grouped_quantiles
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["lang", "n_chars"])
    out = grouped_quantiles(ds, group_col="lang", col="n_chars",
                            qs=(0.25, 0.5, 0.9)).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{SF}/documents.parquet'")
    sql = " UNION ALL ".join(
        f"SELECT lang, CAST({q} AS DOUBLE) AS q, "
        f"quantile_disc(n_chars, {q}) AS value FROM documents "
        f"GROUP BY lang" for q in (0.25, 0.5, 0.9))
    odf = con.execute(sql).fetchdf()
    cols = ["lang", "q", "value"]
    a = out[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b)
    # null values excluded; ties and single-value groups
    tbl = pa.table({"g": ["a", "a", "a", "b", "b"],
                    "x": pa.array([5, None, 1, 7, 7], pa.int64())})
    got = grouped_quantiles(ray.data.from_arrow(tbl), group_col="g",
                            col="x", qs=(0.5, 1.0)).to_pandas() \
        .sort_values(["g", "q"]).reset_index(drop=True)
    assert got.value.tolist() == [1, 5, 7, 7]


def test_prefix_block_max_bucket_matches_capped_oracle(ray_session):
    """Bucket truncation keeps the max_bucket SMALLEST keys — exactly
    the oracle's QUALIFY row_number() OVER (ORDER BY doc_id) <= cap."""
    import duckdb
    import ray
    head = "Z" * 60
    tbl = pa.table({"doc_id": pa.array([9, 3, 7, 1, 5], pa.int64()),
                    "text": pa.array([head + str(i) for i in range(5)],
                                     pa.string())})
    pairs = dedup.prefix_block_pairs(ray.data.from_arrow(tbl),
                                     prefix_len=50, max_bucket=3) \
        .to_pandas()
    got = sorted(map(tuple, pairs[["a", "b"]].values.tolist()))
    assert got == [(1, 3), (1, 5), (3, 5)]  # 3 smallest keys only
    con = duckdb.connect()
    con.register("documents", tbl)
    odf = con.execute(
        "WITH d AS (SELECT doc_id, substr(text,1,50) AS pfx FROM documents "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY pfx ORDER BY doc_id) <= 3) "
        "SELECT a.doc_id AS a, b.doc_id AS b FROM d a JOIN d b "
        "ON a.pfx = b.pfx AND b.doc_id > a.doc_id").fetchdf()
    assert sorted(map(tuple, odf[["a", "b"]].values.tolist())) == got


def test_rolling_window_hot_key(ray_session):
    """One key owning 50% of rows must not degrade: the partition pass
    is one vectorized searchsorted regardless of key distribution."""
    import ray
    from parquet_rs_ray.ops.temporal import rolling_window
    rng = np.random.default_rng(7)
    n = 200_000
    hot = rng.integers(0, 2, n).astype(bool)
    keys = np.where(hot, 0, rng.integers(1, 2000, n)).astype(np.int64)
    ts = np.sort(rng.integers(0, 10**9, n)).astype(np.int64)
    tbl = pa.table({"k": pa.array(keys),
                    "ts": pa.array(ts, pa.timestamp("us"))})
    ds = ray.data.from_arrow([tbl.slice(s, 20_000)
                              for s in range(0, n, 20_000)])
    out = rolling_window(ds, key_col="k", ts_col="ts",
                         preceding_minutes=1)
    assert out.count() == n
    # the hot key's counts are self-consistent: at least 1, at most its
    # total row count
    hot_rows = out.filter(lambda r: r["k"] == 0).to_pandas()
    assert (hot_rows.roll_cnt >= 1).all()
    assert hot_rows.roll_cnt.max() <= len(hot_rows)


def test_cms_topk_recalls_exact_heavy_hitters(ray_session):
    """CMS top-k must contain the exact top-k (count-min never
    undercounts; candidates survive local tops), and approx counts are
    within eps*N of exact."""
    import ray
    from parquet_rs_ray.ops.sketch import cms_topk
    rng = np.random.default_rng(5)
    # zipf-ish: heavy head + long tail
    head = [f"hot{i}" for i in range(10)]
    vals = []
    for i, h in enumerate(head):
        vals += [h] * (2000 - 150 * i)
    vals += [f"tail{i}" for i in range(20000)]
    rng.shuffle(vals)
    tbl = pa.table({"w": pa.array(vals, pa.string())})
    ds = ray.data.from_arrow(
        [tbl.slice(s, 4000) for s in range(0, len(vals), 4000)])
    out = cms_topk(ds, "w", k=10)
    exact = {h: 2000 - 150 * i for i, h in enumerate(head)}
    assert set(out.value) == set(head)          # full recall of top-10
    n = len(vals)
    for _, r in out.iterrows():
        assert exact[r.value] <= r.approx_count <= exact[r.value] + 0.01 * n


def test_sketch_driver_payload_is_tree_merged(ray_session):
    """VERDICT r2: sketch partials must pre-merge distributedly — the
    driver reads O(#batches/64²) summary rows, not one per batch.
    200 input blocks ⇒ a handful of rows reach the final merge, and the
    estimates are unchanged vs the direct fold (merges are exact:
    max / sum / weight-preserving re-grid)."""
    import ray
    from parquet_rs_ray.ops.sketch import (_cms_merged_parts, _hll_parts,
                                           cms_topk, hll_distinct)
    n_blocks = 200
    tbls = [pa.table({"w": pa.array(
        [f"hot{j}" for j in range(5)] * 10 + [f"t{i}_{j}" for j in range(30)]
    )}) for i in range(n_blocks)]
    ds = ray.data.from_arrow(tbls)

    hparts = _hll_parts(ds, "w").materialize()
    assert hparts.count() <= 8          # 200 → ≤4 after stage 1 → ≤8 slack
    approx = hll_distinct(ds, "w")["approx_distinct"][0]
    exact = 5 + 30 * n_blocks
    assert abs(approx - exact) / exact < 0.05

    out = cms_topk(ds, "w", k=5)
    assert set(out.value) == {f"hot{j}" for j in range(5)}
    # and the merged parts the driver reads are few
    def fold_count(b):
        return pa.table({"n": pa.array([b.num_rows])})
    cparts = _cms_merged_parts(ds.map_batches(
        lambda b: pa.table({
            "mat": pa.array([np.zeros((4, 1 << 14), np.int64).tobytes()],
                            pa.binary()),
            "cands": pa.array([[b"x"]], pa.list_(pa.binary()))}),
        batch_format="pyarrow")).materialize()
    assert cparts.count() <= 8


def test_quantile_sketch_accuracy(ray_session):
    """Grid-sketch quantiles of a continuous double column land within
    the documented rank tolerance of the exact quantiles."""
    import duckdb
    import ray
    from parquet_rs_ray.ops.sketch import quantile_sketch
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(0, 1, 30_000),
                           rng.exponential(5, 20_000)])
    tbl = pa.table({"x": pa.array(vals, pa.float64())})
    ds = ray.data.from_arrow(
        [tbl.slice(s, 5000) for s in range(0, len(vals), 5000)])
    got = quantile_sketch(ds, "x", qs=(0.1, 0.5, 0.9, 0.99))
    con = duckdb.connect()
    con.register("t", tbl)
    for _, r in got.iterrows():
        lo, hi = con.execute(
            f"SELECT quantile_disc(x, {max(r.q - 0.01, 0)}), "
            f"quantile_disc(x, {min(r.q + 0.01, 1)}) FROM t").fetchone()
        assert lo <= r.value <= hi, (r.q, r.value, lo, hi)
    # all-null / empty safety
    t2 = pa.table({"x": pa.array([None, None], pa.float64())})
    out2 = quantile_sketch(ray.data.from_arrow(t2), "x", qs=(0.5,))
    assert out2.value.isna().all() or out2.value.tolist() == [None]


def test_hash_sample_and_split_deterministic(ray_session):
    """Sampling/split membership is a pure row property: identical
    results for any partitioning; split labels are exhaustive+disjoint
    with fractions near the weights; null keys excluded from samples
    and routed to the LAST split (SQL CASE ELSE parity)."""
    import ray
    from parquet_rs_ray.ops.sampling import (hash_sample, hash_split,
                                             sample_rate_threshold,
                                             split_cut_points)
    n = 20_000
    tbl = pa.table({"id": pa.array(np.arange(n)),
                    "v": pa.array(np.arange(n) % 7)})
    one = ray.data.from_arrow(tbl)
    many = ray.data.from_arrow([tbl.slice(s, 500)
                                for s in range(0, n, 500)])

    s1 = hash_sample(one, key_col="id", rate_ppm=100_000).to_pandas()
    s2 = hash_sample(many, key_col="id", rate_ppm=100_000).to_pandas()
    assert sorted(s1.id) == sorted(s2.id)
    assert abs(len(s1) / n - 0.1) < 0.01  # ~10% ±1pp at 20k keys

    w = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    p1 = hash_split(one, key_col="id", weights=w).to_pandas()
    p2 = hash_split(many, key_col="id", weights=w).to_pandas()
    assert len(p1) == n  # exhaustive
    m1 = dict(zip(p1.id, p1.split))
    assert m1 == dict(zip(p2.id, p2.split))
    frac = p1.split.value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.02
    assert abs(frac["val"] - 0.1) < 0.01

    # null keys: dropped from sample, last label in split
    tnull = pa.table({"id": pa.array([1, None, 3], pa.int64())})
    ds = ray.data.from_arrow(tnull)
    got = hash_sample(ds, key_col="id", rate_ppm=1_000_000).to_pandas()
    assert sorted(got.id) == [1, 3]
    sp = hash_split(ds, key_col="id", weights=w).to_pandas()
    assert sp[sp.id.isna()].split.tolist() == ["test"]

    # negative keys refuse loudly (SQL % divergence)
    import pytest as _pytest
    bad = ray.data.from_arrow(pa.table({"id": pa.array([-5])}))
    with _pytest.raises(Exception):
        hash_sample(bad, key_col="id", rate_ppm=10).to_pandas()

    # helper constants are exact integers (oracle embeds them)
    assert sample_rate_threshold(250_000) == (1 << 32) // 4
    cuts = split_cut_points(w)
    assert cuts[-1][1] == 1 << 32 and cuts[0][1] < cuts[1][1]


def test_connected_components_shapes(ray_session):
    """CC labels = min key per component on a mixed graph (chain +
    triangle + singleton vertices from the node universe); empty edge
    set degenerates to all-singletons; non-convergence raises."""
    import pytest as _pytest
    import ray
    from parquet_rs_ray.ops.graph import connected_components

    # chain 1-2-3-4, triangle 10-11-12 (+ redundant edge), isolated 99
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 10, 11, 10], pa.int64()),
        "b": pa.array([2, 3, 4, 11, 12, 12], pa.int64())}))
    nodes = ray.data.from_arrow(pa.table({
        "node": pa.array([1, 2, 3, 4, 10, 11, 12, 99], pa.int64())}))
    got = connected_components(edges, nodes=nodes, key_col="node") \
        .to_pandas().sort_values("node").reset_index(drop=True)
    assert got.node.tolist() == [1, 2, 3, 4, 10, 11, 12, 99]
    assert got.cluster_id.tolist() == [1, 1, 1, 1, 10, 10, 10, 99]

    # without a node universe: vertices derived from edges
    got2 = connected_components(edges, key_col="v").to_pandas()
    assert dict(zip(got2.v, got2.cluster_id)) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    # empty edges → every vertex its own cluster
    e0 = ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    got3 = connected_components(e0, nodes=nodes, key_col="node") \
        .to_pandas()
    assert dict(zip(got3.node, got3.cluster_id)) == {
        k: k for k in [1, 2, 3, 4, 10, 11, 12, 99]}

    # a 6-chain cannot converge in 2 rounds → loud error, not wrong data
    chain = ray.data.from_arrow(pa.table({
        "a": pa.array([5, 6, 7, 8, 9], pa.int64()),
        "b": pa.array([6, 7, 8, 9, 10], pa.int64())}))
    with _pytest.raises(RuntimeError, match="fixpoint"):
        connected_components(chain, max_iters=2)


def test_dup_clusters_oracle(ray_session):
    """dup_clusters matches the recursive-CTE SQL oracle bit-exactly on
    real test data (prefix-block + jaccard>=0.9 edges, min-key label)."""
    import duckdb
    import ray
    from parquet_rs_ray.ops.graph import dup_clusters

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
    got = dup_clusters(ds, jaccard_threshold=0.9).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    import __ray_entry__ as E
    ora = con.execute(E.oracle_sql()["dup_clusters_documents"]).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.doc_id.tolist() == ora.doc_id.tolist()
    assert got.cluster_id.tolist() == ora.cluster_id.tolist()
    # sanity: at least one multi-doc cluster exists in the fixture
    assert (got.groupby("cluster_id").size() > 1).any()


def test_decontaminate_planted(ray_session):
    """Planted contamination: docs sharing a 5-gram with the ref set are
    dropped, others survive; invert=True returns exactly the dropped
    set; empty blocklist keeps everything."""
    import ray
    from parquet_rs_ray.ops.decontam import (contamination_ngrams,
                                             decontaminate)

    ref = ray.data.from_arrow(pa.table({
        "text": ["the quick brown fox jumps over the lazy dog"]}))
    corpus_tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["xx the quick brown fox jumps yy",   # shares a 5-gram
                 "completely different words here entirely now",
                 "quick brown fox over dog",           # no shared 5-gram
                 None]})                               # null → padded gram
    corpus = ray.data.from_arrow(corpus_tbl)
    kept = decontaminate(corpus, ref).to_pandas()
    assert sorted(kept.doc_id.tolist()) == [1, 2, 3]
    dropped = decontaminate(corpus, ref, invert=True).to_pandas()
    assert dropped.doc_id.tolist() == [0]

    bl = contamination_ngrams(ref)
    assert bl.dtype == np.uint64 and len(bl) == 5  # 9 words → 5 5-grams
    kept2 = decontaminate(corpus, blocklist=bl).to_pandas()
    assert sorted(kept2.doc_id.tolist()) == [1, 2, 3]

    empty_bl = np.zeros(0, np.uint64)
    all_kept = decontaminate(corpus, blocklist=empty_bl).to_pandas()
    assert len(all_kept) == 4

    # short/null docs pad to hash("")-grams: a null ref doc contaminates
    # null+short corpus docs (SQL list_resize parity), not real text
    nref = ray.data.from_arrow(pa.table({"text": pa.array([None],
                                                          pa.string())}))
    kept3 = decontaminate(corpus, nref).to_pandas()
    assert sorted(kept3.doc_id.tolist()) == [0, 1, 2]


def test_stratified_hash_sample(ray_session):
    """Per-group rates hold; unknown + null groups take default_ppm;
    membership is partition-invariant and agrees with hash_sample at
    the same rate."""
    import ray
    from parquet_rs_ray.ops.sampling import (hash_sample,
                                             stratified_hash_sample)

    n = 30_000
    langs = pa.array((["en", "zh", "xx"] * (n // 3 + 1))[:n])
    ids = pa.array(np.arange(n), pa.int64())
    tbl = pa.table({"id": ids, "lang": langs})
    ds = ray.data.from_arrow(tbl)
    got = stratified_hash_sample(
        ds, key_col="id", group_col="lang",
        rates_ppm={"en": 600_000, "zh": 200_000},
        default_ppm=50_000).to_pandas()
    frac = got.lang.value_counts() / (n / 3)
    assert abs(frac.get("en", 0) - 0.6) < 0.03
    assert abs(frac.get("zh", 0) - 0.2) < 0.02
    assert abs(frac.get("xx", 0) - 0.05) < 0.02

    # same membership as plain hash_sample at the group's rate
    import pyarrow.compute as pc
    en = ray.data.from_arrow(tbl.filter(pc.equal(tbl.column("lang"),
                                                 "en")))
    plain = hash_sample(en, key_col="id", rate_ppm=600_000).to_pandas()
    assert sorted(got[got.lang == "en"].id) == sorted(plain.id)

    # partition invariance
    many = ray.data.from_arrow([tbl.slice(s, 1000)
                                for s in range(0, n, 1000)])
    got2 = stratified_hash_sample(
        many, key_col="id", group_col="lang",
        rates_ppm={"en": 600_000, "zh": 200_000},
        default_ppm=50_000).to_pandas()
    assert sorted(got.id) == sorted(got2.id)

    # null group → default rate bucket (keeps iff hash below default)
    tnull = pa.table({"id": pa.array([7, 8], pa.int64()),
                      "lang": pa.array([None, "en"], pa.string())})
    res = stratified_hash_sample(
        ray.data.from_arrow(tnull), key_col="id", group_col="lang",
        rates_ppm={"en": 1_000_000}, default_ppm=1_000_000).to_pandas()
    assert sorted(res.id.tolist()) == [7, 8]


def test_url_ops(ray_session):
    """url_parts / normalize_url / registered_domain / host_stats over
    messy inputs: query+fragment stripped, case normalized, unparseable
    and null urls yield null parts, host_stats groups raw hosts."""
    import ray
    from parquet_rs_ray.ops.url import (host_stats, normalize_url,
                                        registered_domain, url_parts)

    t = pa.table({"url": ["https://www.Example.com/a/b?q=1#f",
                          "http://sub.shop.co.uk/x",
                          "ftp://files.org",
                          "not a url", None],
                  "n_chars": pa.array([10, 20, 30, 40, 50], pa.int64())})
    ds = ray.data.from_arrow(t)
    parts = url_parts(ds).to_pandas()
    assert parts.scheme.tolist()[:3] == ["https", "http", "ftp"]
    assert parts.host.tolist()[:3] == ["www.Example.com",
                                       "sub.shop.co.uk", "files.org"]
    assert parts.path.tolist()[:3] == ["/a/b", "/x", ""]
    assert parts.scheme.isna().tolist()[3:] == [True, True]

    norm = normalize_url(ds).to_pandas().url_norm
    assert norm.tolist()[:3] == ["https://www.example.com/a/b",
                                 "http://sub.shop.co.uk/x",
                                 "ftp://files.org"]
    assert norm.isna().tolist()[3:] == [True, True]

    rd = registered_domain(pa.array(["www.example.com", "localhost",
                                     "a.b.co.uk", None]))
    assert rd.to_pylist() == ["example.com", "localhost", "co.uk", None]

    hs = host_stats(ds, chars_col="n_chars").to_pandas()
    got = {r.host: (r.n_docs, r.total_chars)
           for r in hs.itertuples() if isinstance(r.host, str)}
    assert got == {"www.Example.com": (1, 10),
                   "sub.shop.co.uk": (1, 20), "files.org": (1, 30)}
    # unparseable + null urls share the null-host group
    nullrow = hs[hs.host.isna()]
    assert nullrow.n_docs.tolist() == [2]

    hs2 = host_stats(ds).to_pandas()
    assert set(hs2.columns) == {"host", "n_docs"}


def test_dup_clusters_minhash_method(ray_session):
    """method='minhash' (LSH candidates instead of prefix blocking)
    finds the same multi-doc duplicate families on the fixture — the
    recall-robust path when dups don't share literal heads."""
    import ray
    from parquet_rs_ray.ops.graph import dup_clusters

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "text"])
    pfx = dup_clusters(ds, jaccard_threshold=0.9).to_pandas()
    # concurrency=2: the 4-CPU test session can't host a 4-actor pool
    # alongside the join aggregators (same sizing as the near_dedup
    # tests)
    mh = dup_clusters(ds, jaccard_threshold=0.9,
                      method="minhash", concurrency=2).to_pandas()

    def families(df):
        g = df.groupby("cluster_id").doc_id.apply(
            lambda s: tuple(sorted(s)))
        return {fam for fam in g if len(fam) > 1}

    # every prefix-found family is found by minhash too (candidates are
    # a superset on this fixture: 0.9-Jaccard dups collide in bands)
    assert families(pfx) <= families(mh)
    assert families(mh)  # and it actually found something


def test_filter_by_group_quantile(ray_session):
    """Per-group quantile gate: matches the SQL join oracle on real
    data; null values and all-null groups are dropped; q=1.0 keeps
    only each group's max."""
    import duckdb
    import ray
    from parquet_rs_ray.ops.relational import filter_by_group_quantile

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/documents.parquet",
                               columns=["doc_id", "lang", "n_chars"])
    got = filter_by_group_quantile(ds, group_col="lang", col="n_chars",
                                   q=0.5).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    ora = con.execute(
        "WITH m AS (SELECT lang, quantile_disc(n_chars, 0.5) AS med "
        "FROM documents GROUP BY lang) "
        "SELECT doc_id, d.lang, n_chars FROM documents d "
        "JOIN m ON d.lang = m.lang WHERE n_chars >= med "
        "ORDER BY doc_id").fetchdf()
    assert got.equals(ora.reset_index(drop=True))
    assert 0 < len(got) < ds.count()

    # nulls: null values dropped; all-null group vanishes; q=1.0 == max
    t = pa.table({"g": ["a", "a", "a", "b", "b"],
                  "v": pa.array([1, 2, None, None, None], pa.int64()),
                  "id": pa.array([0, 1, 2, 3, 4], pa.int64())})
    small = ray.data.from_arrow(t)
    top = filter_by_group_quantile(small, group_col="g", col="v",
                                   q=1.0).to_pandas()
    assert top.id.tolist() == [1]


def _ppm(w, h, seed):
    rng = np.random.default_rng(seed)
    return (f"P6\n{w} {h}\n255\n".encode()
            + rng.integers(0, 256, w * h * 3).astype(np.uint8).tobytes())


def test_sample_frames_real_ppm_stream():
    frames = [_ppm(6, 4, s) for s in range(10)]
    stream = b"".join(frames)
    tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "media": pa.array([stream], pa.binary())})
    out = multimodal.SampleFrames(num_frames=4)(tbl).to_pandas()
    # uniform temporal sampling: floor(k*10/4) = 0,2,5,7
    assert out["frame_idx"].tolist() == [0, 2, 5, 7]
    assert out["n_frames"].tolist() == [10] * 4
    # sampled bytes are the EXACT standalone netpbm frames, decodable
    # by the real image kernel
    for k, fb in zip([0, 2, 5, 7], out["frame_bytes"]):
        assert fb == frames[k]
        img = multimodal.decode_image_bytes(fb, (4, 6))
        assert img.shape == (4, 6, 3)
    # short video: fewer frames than requested → one row per real frame
    out = multimodal.SampleFrames(num_frames=8)(
        pa.table({"doc_id": pa.array([1], pa.int64()),
                  "media": pa.array([b"".join(frames[:3])], pa.binary())})
    ).to_pandas()
    assert out["frame_idx"].tolist() == [0, 1, 2]
    # PGM (P5) streams parse too
    g = b"P5\n2 2\n255\n" + bytes(4)
    bounds = multimodal.split_ppm_stream(g * 3)
    assert len(bounds) == 3
    # truncated stream raises (corrupt != short)
    with pytest.raises(ValueError):
        multimodal.split_ppm_stream(stream[:-5])


def test_decontaminate_join_matches_broadcast(ray_session):
    """Join-mode (both-sides-big regime) must equal the broadcast
    filter exactly, both polarities, including short-doc padding."""
    import ray
    from parquet_rs_ray.ops.decontam import decontaminate, decontaminate_join

    rng = np.random.default_rng(31)
    words = [f"t{i}" for i in range(60)]
    corpus_texts = [" ".join(rng.choice(words, 12)) for _ in range(70)]
    ref_texts = [" ".join(rng.choice(words, 9)) for _ in range(25)]
    # plant exact overlap: corpus docs 3 and 9 contain a ref 5-gram
    shared = " ".join(words[:5])
    corpus_texts[3] = "prefix " + shared + " suffix"
    corpus_texts[9] = shared
    ref_texts[0] = "aa " + shared + " bb"
    corpus_texts[11] = "tiny doc"          # < k words: padding path
    docs = pa.table({"doc_id": pa.array(range(70), pa.int64()),
                     "text": pa.array(corpus_texts)})
    ref = pa.table({"text": pa.array(ref_texts)})
    for invert in (False, True):
        a = decontaminate(ray.data.from_arrow(docs),
                          ray.data.from_arrow(ref), invert=invert) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        b = decontaminate_join(ray.data.from_arrow(docs),
                               ray.data.from_arrow(ref), invert=invert) \
            .to_pandas()[["doc_id", "text"]] \
            .sort_values("doc_id").reset_index(drop=True)
        assert a[["doc_id", "text"]].equals(b), invert
    dropped = decontaminate_join(ray.data.from_arrow(docs),
                                 ray.data.from_arrow(ref), invert=True) \
        .to_pandas()
    assert {3, 9} <= set(dropped["doc_id"])


def test_word_df_stats_join_matches_broadcast(ray_session):
    """mode='join' (beyond-heap vocabulary regime) must be bit-equal to
    the broadcast scorer, including repeats, empty and null docs."""
    import ray
    from parquet_rs_ray.ops.textstats import word_df_stats

    rng = np.random.default_rng(41)
    words = [f"v{i}" for i in range(50)]
    texts = [" ".join(rng.choice(words, int(rng.integers(1, 20))))
             for _ in range(90)]
    texts[5] = "  "                      # only empty tokens -> 0 words
    texts[11] = ""
    texts[17] = None
    texts[23] = "v0 v0 v0 v1"            # repeats count in sum_df
    docs = pa.table({"doc_id": pa.array(range(90), pa.int64()),
                     "lang": pa.array(["en", "de", "zh"] * 30),
                     "text": pa.array(texts)})
    cols = ["doc_id", "lang", "n_words", "sum_df", "min_df"]
    a = word_df_stats(ray.data.from_arrow(docs)) \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = word_df_stats(ray.data.from_arrow(docs), mode="join") \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    assert a.loc[23, "sum_df"] >= 4      # repeats contributed


def test_word_df_stats_join_string_ids(ray_session):
    """join mode keyed by a STRING id column: empty word/id hash
    partitions must emit string-typed __id empties (schema parity with
    the non-empty partitions), matching broadcast mode bit-exactly."""
    import ray
    from parquet_rs_ray.ops.textstats import word_df_stats

    texts = [f"common w{i % 3}" for i in range(10)]
    texts[4] = None
    docs = pa.table({"url": pa.array([f"https://x/{i}" for i in range(10)]),
                     "text": pa.array(texts)})
    cols = ["url", "n_words", "sum_df", "min_df"]
    a = word_df_stats(ray.data.from_arrow(docs), id_col="url") \
        .to_pandas()[cols].sort_values("url").reset_index(drop=True)
    b = word_df_stats(ray.data.from_arrow(docs), mode="join",
                      id_col="url", num_partitions=8) \
        .to_pandas()[cols].sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_sample_to_token_budget(ray_session):
    """Token-budget mixing: exact per-group totals, integer-ppm rates,
    deterministic membership; realized tokens concentrate on budget."""
    import duckdb
    import ray
    from parquet_rs_ray.ops.sampling import sample_to_token_budget
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "lang", "text"])
    budget = 3000
    out, plan = sample_to_token_budget(
        ds, key_col="doc_id", group_col="lang",
        budgets_tokens={"en": budget})
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert set(got["lang"]) <= {"en"}       # unbudgeted groups dropped
    assert plan["en"]["total_tokens"] > budget
    assert 0 < plan["en"]["rate_ppm"] < 1_000_000
    # bit-exact SQL twin: totals -> rate -> hash threshold
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    odf = con.execute(f"""
        WITH w AS (SELECT doc_id, lang,
            len(list_filter(string_split(text, ' '), x -> x <> ''))
            AS n FROM documents),
        tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM w
                WHERE lang = 'en'),
        rate AS (SELECT LEAST(1000000,
            (CAST({budget} AS HUGEINT) * 1000000) // total) AS ppm FROM tot)
        SELECT d.doc_id FROM documents d, rate
        WHERE d.lang = 'en'
          AND (CAST(d.doc_id % 4294967296 AS HUGEINT) * 2654435761)
              % 4294967296
              < (CAST(rate.ppm AS HUGEINT) * 4294967296) // 1000000
        ORDER BY d.doc_id""").fetchdf()
    assert list(got["doc_id"]) == list(odf["doc_id"])
    assert plan["en"]["total_tokens"] == int(con.execute(
        "SELECT CAST(SUM(len(list_filter(string_split(text, ' '), "
        "x -> x <> ''))) AS BIGINT) FROM documents WHERE lang='en'"
    ).fetchone()[0])
    # realized tokens near the budget (document-level sampling)
    realized = sum(len([w for w in t.split(" ") if w])
                   for t in got["text"])
    assert 0.3 * budget < realized < 3 * budget


def test_corpus_report_duckdb_parity(ray_session):
    """corpus_report bit-matches the plain SQL profile (COUNT, COUNT
    DISTINCT, quantile_disc, byte sums) per language, including a
    planted null text."""
    import duckdb
    import pandas as pd
    import ray

    import pyarrow.parquet as pq

    from parquet_rs_ray.ops.textstats import corpus_report

    base = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"])
    # plant a null text so n_null_text is exercised
    txt = base.column("text").to_pylist()
    txt[3] = None
    tbl = base.set_column(base.schema.get_field_index("text"), "text",
                          pa.array(txt, pa.string()))
    got = corpus_report(ray.data.from_arrow(tbl).repartition(4)) \
        .to_pandas().sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(*) - COUNT(text) AS BIGINT) AS n_null_text, "
        "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(quantile_disc(octet_length(ENCODE(text)), 0.5) AS BIGINT) "
        "AS p50_bytes, "
        "CAST(SUM(COALESCE(octet_length(ENCODE(text)), 0)) AS BIGINT) "
        "AS total_bytes FROM documents GROUP BY lang ORDER BY lang") \
        .fetchdf()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)],
        check_dtype=False)


def test_corpus_report_null_lang_and_source(ray_session):
    """Null lang gets its own report row (SQL's NULL group) instead of
    crashing bincount; null sources are excluded from n_sources
    (COUNT DISTINCT semantics)."""
    import duckdb
    import pandas as pd
    import ray

    from parquet_rs_ray.ops.textstats import corpus_report

    tbl = pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array(["aaa", "bb", None, "dddd",
                          "ee", "f", "gg", "hhh"], pa.string()),
        "lang": pa.array(["en", "en", None, None,
                          "de", "de", "en", None], pa.string()),
        "source": pa.array(["s1", None, "s2", "s1",
                            "s3", "s3", "s1", None], pa.string())})
    got = corpus_report(ray.data.from_arrow(tbl).repartition(3)) \
        .to_pandas()
    con = duckdb.connect()
    con.register("documents", tbl)
    exp = con.execute(
        "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(*) - COUNT(text) AS BIGINT) AS n_null_text, "
        "CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources, "
        "CAST(quantile_disc(octet_length(ENCODE(text)), 0.5) AS BIGINT) "
        "AS p50_bytes, "
        "CAST(SUM(COALESCE(octet_length(ENCODE(text)), 0)) AS BIGINT) "
        "AS total_bytes FROM documents GROUP BY lang").fetchdf()
    key = lambda df: df.assign(
        _k=df.lang.fillna("￿")).sort_values("_k") \
        .drop(columns="_k").reset_index(drop=True)
    pd.testing.assert_frame_equal(key(got)[sorted(got.columns)],
                                  key(exp)[sorted(exp.columns)],
                                  check_dtype=False)


def test_audio_riff_prefix_raw_pcm_not_misrouted():
    """Raw s16le PCM whose first bytes happen to spell b'RIFF' must
    stay on the raw path (the sniff checks the full RIFF....WAVE
    signature)."""
    from parquet_rs_ray.ops.multimodal import AudioPcmFeatures

    raw = b"RIFF" + np.full(100, 4096, np.int16).tobytes()
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "media": pa.array([raw], pa.binary())})
    out = AudioPcmFeatures()(t).to_pandas()
    assert out.duration_s[0] == pytest.approx(102 / 16000)
    assert out.rms[0] > 0


def test_ops_review_regressions(ray_session):
    """Round-4 review fixes: uppercase URL schemes parse (RFC 3986
    case-insensitive), sessionize tolerates null timestamps, a negative
    LAST split weight raises, and broadcast_hash_join rejects unknown
    join types instead of silently running inner."""
    import datetime

    import ray

    from parquet_rs_ray.ops.relational import broadcast_hash_join
    from parquet_rs_ray.ops.sampling import split_cut_points
    from parquet_rs_ray.ops.temporal import sessionize
    from parquet_rs_ray.ops.url import url_parts

    t = pa.table({"url": pa.array(
        ["HTTP://Example.com/A", "http://ex.com/b"], pa.string())})
    parts = url_parts(ray.data.from_arrow(t)).to_pandas()
    assert parts.scheme.tolist() == ["HTTP", "http"]
    assert parts.host.tolist() == ["Example.com", "ex.com"]

    ts = pa.table({
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([datetime.datetime(2024, 1, 1, 0, 0),
                        datetime.datetime(2024, 1, 1, 0, 5),
                        None], pa.timestamp("us"))})
    out = sessionize(ray.data.from_arrow(ts), gap_minutes=30).to_pandas()
    assert len(out) == 1 and out.n_events[0] == 2   # null-ts row dropped

    with pytest.raises(ValueError, match="negative"):
        split_cut_points([("train", 1.0), ("test", -0.5)])

    with pytest.raises(ValueError, match="join_type"):
        broadcast_hash_join(ray.data.from_arrow(t),
                            pa.table({"url": pa.array(["x"])}),
                            on="url", join_type="left_outer")


def test_ops_review_regressions_wave4(ray_session):
    """Fourth review wave: null text packs as 0 tokens (not INT64_MIN),
    quality_score is NULL for null text, double-quoted hrefs keep
    their apostrophes, manifest tolerates non-UTF-8 torn entries."""
    import ray

    from parquet_rs_ray import manifest
    from parquet_rs_ray.ops.html import extract_links
    from parquet_rs_ray.ops.packing import pack_sequences
    from parquet_rs_ray.ops.textstats import QualityScorer

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(["a b c", None, "d e"], pa.string())})
    packed = pack_sequences(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert packed.n_tokens.tolist() == [3, 0, 2]
    assert (packed.bin_total >= 0).all()

    q = QualityScorer()(t).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert q.quality_score[1] is None or np.isnan(q.quality_score[1])
    assert q.quality_score.notna().tolist() == [True, False, True]

    h = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "html": pa.array(["<a href=\"it's.html\">x</a>"
                                    "<a href='say\"hi\".html'>y</a>"])})
    links = extract_links(ray.data.from_arrow(h), html_col="html",
                          id_col="doc_id").to_pandas()
    assert sorted(links.link) == ['it\'s.html', 'say"hi".html']
