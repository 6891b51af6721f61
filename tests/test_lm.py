"""Byte-trigram LM quality scoring (ops/lm.py): pure-python reference
parity, DuckDB replay on ASCII corpora (tolerance — ln() differs from
numpy by ~1 ulp), null/short-doc semantics, and the filter gate."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.lm import (filter_by_lm, score_char_lm,
                                   train_char_lm)

VOCAB = 1 << 24


def _ref_model(texts):
    counts = {}
    total = 0
    for t in texts:
        if t is None:
            continue
        b = t.encode()
        for i in range(len(b) - 2):
            g = b[i:i + 3]
            counts[g] = counts.get(g, 0) + 1
            total += 1
    return counts, total


def _ref_score(text, counts, total):
    b = text.encode() if text is not None else b""
    if len(b) < 3:
        return None
    vals = [np.log((counts.get(b[i:i + 3], 0) + 1) / (total + VOCAB))
            for i in range(len(b) - 2)]
    return float(np.mean(vals))


def _docs_table():
    texts = ["the quick brown fox", "the quick brown dog",
             "zzzz qqqq xxxx", None, "", "ab",
             "the the the the", "completely different content here"]
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())}), texts


def test_train_and_score_vs_python_reference(ray_session):
    import ray

    tbl, texts = _docs_table()
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds)
    counts, total = _ref_model(texts)
    assert model["total"] == total
    assert model["n_grams_distinct"] == len(counts)
    # dense logp spot check
    g = b"the"
    code = (g[0] << 16) | (g[1] << 8) | g[2]
    assert model["logp"][code] == pytest.approx(
        np.log((counts[g] + 1) / (total + VOCAB)), abs=0)

    out = score_char_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        want = _ref_score(t, counts, total)
        got = out.lm_logprob[i]
        if want is None:
            assert np.isnan(got) or got is None
        else:
            assert got == pytest.approx(want, rel=1e-12), (i, t)
    # in-corpus docs score higher than the gibberish one
    assert out.lm_logprob[0] > out.lm_logprob[2]


def test_score_vs_duckdb_ascii(ray_session):
    """ASCII corpus: byte == char trigrams, so DuckDB replays train +
    score exactly (tolerance 1e-9 for ln ulp drift). Trains on the
    doc_id %% 2 == 0 half, scores everything."""
    import ray

    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "web", "page", "text"]
    texts = [" ".join(rng.choice(words, rng.integers(0, 12)))
             for _ in range(60)]
    tbl = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds, sample_mod=2)
    got = score_char_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("docs", tbl)
    want = con.execute(f"""
        WITH ref AS (SELECT text FROM docs WHERE doc_id % 2 = 0),
        g AS (SELECT substr(text, i, 3) AS g FROM ref,
              unnest(range(1, length(text)-1)) t(i)
              WHERE length(text) >= 3),
        c AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM g GROUP BY g),
        tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM g),
        dg AS (SELECT d.doc_id, substr(d.text, i, 3) AS g FROM docs d,
               unnest(range(1, length(d.text)-1)) t(i)
               WHERE length(d.text) >= 3),
        s AS (SELECT doc_id,
                     avg(ln((coalesce(c.c, 0) + 1)/(tot.total + {VOCAB})))
                     AS lm FROM dg LEFT JOIN c USING(g) CROSS JOIN tot
              GROUP BY doc_id)
        SELECT d.doc_id, s.lm FROM docs d LEFT JOIN s USING(doc_id)
        ORDER BY d.doc_id""").fetchdf()
    gv, wv = got.lm_logprob.to_numpy(), want.lm.to_numpy()
    assert np.isnan(gv).tolist() == np.isnan(wv).tolist()
    m = ~np.isnan(gv)
    assert np.allclose(gv[m], wv[m], rtol=0, atol=1e-9)


def test_trailing_empty_doc_exact_sums(ray_session):
    """Regression: a zero-length (empty or null) doc that ENDS a
    batch's flat buffer must not steal/cut the preceding doc's last
    trigram (np.add.reduceat clamped the final segment start). With a
    uniform model, every scorable doc's mean is exactly the uniform
    logprob."""
    import ray

    for tail in ["", None]:
        texts = ["abcdef", tail]
        tbl = pa.table({"doc_id": pa.array(range(2), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        ds = ray.data.from_arrow(tbl)
        model = train_char_lm(ds)
        counts, total = _ref_model(texts)
        out = score_char_lm(ds, model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # 4 distinct trigrams, each count 1 → uniform mean
        want = _ref_score("abcdef", counts, total)
        assert out.lm_logprob[0] == pytest.approx(want, rel=1e-12)
        assert np.isnan(out.lm_logprob[1])


def test_filter_by_lm(ray_session):
    import ray

    tbl, texts = _docs_table()
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds)
    scored = score_char_lm(ds, model).to_pandas()
    thr = float(np.nanmedian(scored.lm_logprob))
    kept = filter_by_lm(ds, model, min_logprob=thr).to_pandas()
    want = scored[scored.lm_logprob >= thr].doc_id.tolist()
    assert sorted(kept.doc_id.tolist()) == sorted(want)
    # unscorable docs (null/empty/2-byte) are gone
    assert not set(kept.doc_id) & {3, 4, 5}


def test_utf8_multibyte_and_binary_column(ray_session):
    """Non-ASCII text: byte trigrams are well-defined over the utf-8
    encoding; scoring must not crash and must match the python
    reference on the bytes."""
    import ray

    texts = ["héllo wörld", "héllo wörld", "日本語のテキスト", "ascii only"]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds)
    counts, total = _ref_model(texts)
    assert model["total"] == total
    out = score_char_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        assert out.lm_logprob[i] == pytest.approx(
            _ref_score(t, counts, total), rel=1e-12)


def test_bucket_by_lm_thirds_and_langs(ray_session):
    """head/middle/tail assignment matches a pandas reimplementation
    of the same exact thresholds, globally and per language; null and
    <3-byte docs get a null bucket."""
    import ray

    from parquet_rs_ray.ops.lm import bucket_by_lm, score_char_lm

    rng = np.random.default_rng(31)
    vocab_en = ["the", "quick", "brown", "fox", "jumps", "over"]
    vocab_zz = ["zq", "xv", "wk", "jj", "qq", "zz"]
    rows = []
    for i in range(60):
        v = vocab_en if i % 2 == 0 else vocab_zz
        rows.append((" ".join(rng.choice(v, 12).tolist()),
                     "en" if i % 2 == 0 else "zz"))
    rows += [(None, "en"), ("ab", "zz")]
    tbl = pa.table({
        "doc_id": pa.array(range(len(rows)), pa.int64()),
        "text": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds)

    for lang_col in (None, "lang"):
        out = bucket_by_lm(ds, model, lang_col=lang_col).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        scored = score_char_lm(ds, model).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        # reimplement: per-group discrete quantile thresholds
        df = scored.dropna(subset=["lm_logprob"]).copy()
        df["g"] = df["lang"] if lang_col else 0
        for g, sub in df.groupby("g"):
            v = np.sort(sub.lm_logprob.to_numpy())
            cuts = [v[max(0, int(np.ceil(q * len(v))) - 1)]
                    for q in (1 / 3, 2 / 3)]
            for _, r in sub.iterrows():
                want = ("tail" if r.lm_logprob < cuts[0] else
                        "middle" if r.lm_logprob < cuts[1] else "head")
                got = out.loc[out.doc_id == r.doc_id, "lm_bucket"].iloc[0]
                assert got == want, (lang_col, r.doc_id, got, want)
        # unscorable docs: null bucket
        nulls = out[out.doc_id >= 60].lm_bucket
        assert nulls.isna().all()
        # every real bucket present
        assert set(out.lm_bucket.dropna()) == {"head", "middle", "tail"}


def test_bucket_by_lm_null_lang_gets_null_bucket(ray_session):
    import ray

    from parquet_rs_ray.ops.lm import bucket_by_lm

    texts = [f"plain english words number {i} flowing nicely" * 3
             for i in range(12)]
    langs = ["en"] * 10 + [None, None]
    tbl = pa.table({"doc_id": pa.array(range(12), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": pa.array(langs, pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_char_lm(ds)
    out = bucket_by_lm(ds, model, lang_col="lang").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.lm_bucket[:10].notna().all()
    assert out.lm_bucket[10:].isna().all()   # no group to rank in


# ---- hashed/pruned n-gram model (train_ngram_lm) ----

def _ref_ngram_model(texts, n, prune):
    counts = {}
    total = 0
    for t in texts:
        if t is None:
            continue
        b = t.encode()
        for i in range(len(b) - (n - 1)):
            g = b[i:i + n]
            counts[g] = counts.get(g, 0) + 1
            total += 1
    kept = {g: c for g, c in counts.items() if c >= prune}
    return kept, total


def _ref_ngram_score(text, kept, total, n):
    V = 256.0 ** n
    b = text.encode() if text is not None else b""
    if len(b) < n:
        return None
    vals = [np.log((kept.get(b[i:i + n], 0) + 1) / (total + V))
            for i in range(len(b) - (n - 1))]
    return float(np.mean(vals))


@pytest.mark.parametrize("n,prune", [(5, 1), (5, 2), (4, 2), (8, 1)])
def test_ngram_lm_vs_python_reference_multibyte(ray_session, n, prune):
    """Hashed n-gram model parity against an independent pure-python
    reference on MULTI-BYTE utf-8 text (umlauts, CJK, emoji cross the
    per-byte windows) — training counts, pruning, and per-doc scores."""
    import ray

    from parquet_rs_ray.ops.lm import train_ngram_lm

    texts = ["der schnelle braune Fuchs läuft über die Straße",
             "der schnelle braune Hund läuft über die Wiese",
             "敏捷的棕色狐狸跳过懒狗", "敏捷的棕色狐狸跳过懒猫",
             "🦊🦊 the fox émigré naïve 🦊", None, "", "ab",
             "aaaaaaaaaaaaaaaaaaaaaa"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_ngram_lm(ds, n=n, prune_min_count=prune)
    kept, total = _ref_ngram_model(texts, n, prune)
    assert model["total"] == total          # full pre-prune total
    assert model["n_grams_distinct"] == len(kept)
    got = score_char_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        want = _ref_ngram_score(t, kept, total, n)
        if want is None:
            assert np.isnan(got.lm_logprob[i])
        else:
            assert got.lm_logprob[i] == pytest.approx(want, rel=1e-12)


def test_ngram_pruning_only_demotes_dropped_grams(ray_session):
    """Kept grams score identically with and without pruning (the full
    pre-prune total feeds the smoothing), and the pruned table is
    strictly smaller."""
    import ray

    from parquet_rs_ray.ops.lm import train_ngram_lm

    texts = ["common common common phrase", "common common phrase",
             "one-off singleton line here"]
    tbl = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    m1 = train_ngram_lm(ds, n=5, prune_min_count=1)
    m2 = train_ngram_lm(ds, n=5, prune_min_count=2)
    assert m2["n_grams_distinct"] < m1["n_grams_distinct"]
    assert m1["total"] == m2["total"]
    # kept keys of m2 carry the same logp as in m1
    pos = np.searchsorted(m1["keys"], m2["keys"])
    assert (m1["keys"][pos] == m2["keys"]).all()
    assert np.array_equal(m1["logp"][pos], m2["logp"])
    assert m1["oov_logp"] == m2["oov_logp"]


def test_ngram_model_footprint_bounded(ray_session):
    """The 5-gram table is 16 B per kept gram — a corpus with ~10k
    distinct 5-grams must produce a model ~6 orders of magnitude below
    the dense 256^5 representation."""
    import ray

    from parquet_rs_ray.ops.lm import train_ngram_lm

    rng = np.random.default_rng(7)
    words = ["".join(rng.choice(list("abcdefgh "), 12)) for _ in range(400)]
    tbl = pa.table({"doc_id": pa.array(range(400), pa.int64()),
                    "text": pa.array(words, pa.string())})
    model = train_ngram_lm(ray.data.from_arrow(tbl), n=5,
                           prune_min_count=1)
    nbytes = model["keys"].nbytes + model["logp"].nbytes
    assert nbytes == 16 * model["n_grams_distinct"]
    assert nbytes < (1 << 20)               # vs 256^5*8 ≈ 8.8 TB dense
    assert model["keys"].dtype == np.uint64
    assert (np.diff(model["keys"].view(np.uint64)) > 0).all()  # sorted


def test_bucket_by_lm_works_with_hashed_model(ray_session):
    """bucket_by_lm is model-kind agnostic: head/middle/tail labels from
    a 5-gram hashed model follow the exact per-group score quantiles."""
    import ray

    from parquet_rs_ray.ops.lm import bucket_by_lm, train_ngram_lm

    texts = [f"repeated reference phrase number {i % 3}" for i in range(30)]
    texts += ["zq zq xv xv jj kk totally out of distribution %d" % i
              for i in range(6)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    model = train_ngram_lm(ds, n=5, prune_min_count=1)
    out = bucket_by_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert set(out.lm_bucket.dropna()) <= {"head", "middle", "tail"}
    # the OOD docs score lowest → all in the tail bucket
    assert (out.lm_bucket[30:] == "tail").all()
    # exact quantile replay
    s = out.lm_logprob.to_numpy()
    cuts = np.quantile(s, [1 / 3, 2 / 3], method="inverted_cdf")
    want = np.where(s < cuts[0], "tail",
                    np.where(s < cuts[1], "middle", "head"))
    assert (out.lm_bucket.to_numpy() == want).all()
