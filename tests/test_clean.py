"""Corpus-cleaning ops: PII redaction, repetition signals, word
chunking (ops/clean.py) — unit edges + DuckDB oracle parity."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops import clean

SF = "/root/testdata/sf0.001"

EDGE = pa.table({
    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    "text": pa.array(["a b a b c", "", "x  y x",
                      "mail a@b.co ip 10.0.0.1 tel +1 555-123 9999",
                      "solo"]),
})


def _docs_con(tbl):
    con = duckdb.connect()
    con.register("documents", tbl)
    return con


# ------------------------------------------------------------- redact

def test_redact_default_rules():
    out = clean.redact(EDGE)
    texts = out.column("text").to_pylist()
    assert texts[3] == "mail [EMAIL] ip [IP] tel [PHONE]"
    # untouched rows byte-identical
    assert texts[0] == "a b a b c" and texts[2] == "x  y x"
    # idempotent: replacements never re-match
    again = clean.redact(out).column("text").to_pylist()
    assert again == texts


def test_redact_out_col_and_custom_rules():
    out = clean.redact(EDGE, rules=((r"\ba\b", "[A]"),), out_col="red")
    assert out.column("text").to_pylist() == EDGE.column("text").to_pylist()
    assert out.column("red").to_pylist()[0] == "[A] b [A] b c"


def test_redact_duckdb_parity():
    tbl = EDGE
    out = clean.redact(tbl).column("text").to_pylist()
    con = _docs_con(tbl)
    sql = "text"
    for pat, repl in clean.PII_RULES:
        pat = pat.replace("'", "''")
        sql = f"regexp_replace({sql}, '{pat}', '{repl}', 'g')"
    exp = [r[0] for r in
           con.execute(f"SELECT {sql} FROM documents ORDER BY doc_id")
           .fetchall()]
    assert out == exp


# -------------------------------------------------- repetition_stats

REP_SQL = """
WITH base AS (SELECT doc_id, list_filter(string_split(text, ' '),
  x -> x <> '') AS w FROM documents),
words AS (SELECT doc_id, unnest(w) AS word FROM base),
wc AS (SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY doc_id, word),
tw AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
  CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
  CAST(MAX(c) AS BIGINT) AS top_word_count FROM wc GROUP BY doc_id),
bg AS (SELECT doc_id, list_transform(range(1, greatest(len(w), 1)),
  i -> w[i] || chr(1) || w[i+1]) AS bgs FROM base)
SELECT b.doc_id AS doc_id, COALESCE(tw.n_words, 0) AS n_words,
  COALESCE(tw.n_distinct_words, 0) AS n_distinct_words,
  COALESCE(tw.top_word_count, 0) AS top_word_count,
  CAST(len(bg.bgs) AS BIGINT) AS n_bigrams,
  CAST(len(list_distinct(bg.bgs)) AS BIGINT) AS n_distinct_bigrams
FROM base b LEFT JOIN tw ON b.doc_id = tw.doc_id
JOIN bg ON b.doc_id = bg.doc_id ORDER BY b.doc_id
"""


def _rep_parity(tbl):
    got = clean.repetition_stats(tbl).to_pandas().sort_values("doc_id")
    exp = _docs_con(tbl).execute(REP_SQL).fetchdf()
    got = got[exp.columns].reset_index(drop=True)
    assert got.equals(exp.astype(got.dtypes.to_dict())), (got, exp)


def test_repetition_stats_edges():
    out = clean.repetition_stats(EDGE).to_pandas().set_index("doc_id")
    assert out.loc[1].tolist() == [5, 3, 2, 4, 3]
    assert out.loc[2].tolist() == [0, 0, 0, 0, 0]   # empty doc
    assert out.loc[3].tolist() == [3, 2, 2, 2, 2]   # double space dropped
    assert out.loc[5].tolist() == [1, 1, 1, 0, 0]   # one word, no bigram
    _rep_parity(EDGE)


def test_repetition_stats_oracle_sf():
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    _rep_parity(tbl)


def test_repetition_stats_bigram_exactness():
    # adversarial: words whose concatenations collide without a
    # separator ('ab'+'c' vs 'a'+'bc') must count as distinct bigrams
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array(["ab c a bc ab c"])})
    out = clean.repetition_stats(tbl).to_pandas().iloc[0]
    # bigrams: ab|c, c|a, a|bc, bc|ab, ab|c  -> 5 total, 4 distinct
    assert out.n_bigrams == 5 and out.n_distinct_bigrams == 4
    _rep_parity(tbl)


# -------------------------------------------------------- chunk_words

def _chunk_sql(size):
    return f"""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id, CAST((i-1)//{size} AS BIGINT) AS chunk_id,
  array_to_string(w[i:i+{size - 1}], ' ') AS chunk_text,
  CAST(least(i+{size - 1}, len(w)) - i + 1 AS BIGINT) AS chunk_words
FROM base, unnest(range(1, len(w)+1, {size})) AS t(i)
ORDER BY doc_id, chunk_id
"""


@pytest.mark.parametrize("size", [1, 2, 7, 1000])
def test_chunk_words_oracle_and_lossless(size):
    got = clean.chunk_words(EDGE, size=size).to_pandas() \
        .sort_values(["doc_id", "chunk_id"])
    exp = _docs_con(EDGE).execute(_chunk_sql(size)).fetchdf()
    g = got[exp.columns].reset_index(drop=True)
    assert g.equals(exp.astype(g.dtypes.to_dict())), (size, g, exp)
    # byte-lossless: re-joining a doc's chunks restores the original
    orig = EDGE.to_pandas().set_index("doc_id")["text"]
    for did, sub in got.groupby("doc_id"):
        assert " ".join(sub.chunk_text) == orig.loc[did]
    # chunk_words sums to the split length
    lens = got.groupby("doc_id").chunk_words.sum()
    for did in orig.index:
        assert lens.loc[did] == len(orig.loc[did].split(" "))


def test_chunk_words_oracle_sf():
    import pyarrow.parquet as pq
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    got = clean.chunk_words(tbl, size=32).to_pandas() \
        .sort_values(["doc_id", "chunk_id"])
    exp = _docs_con(tbl).execute(_chunk_sql(32)).fetchdf()
    g = got[exp.columns].reset_index(drop=True)
    assert g.equals(exp.astype(g.dtypes.to_dict()))


def test_chunk_words_rejects_bad_size():
    with pytest.raises(ValueError):
        clean.chunk_words(EDGE, size=0)


# ---------------------------------------------------- pipeline level

def test_clean_ops_over_ray(ray_session):
    import ray
    ds = ray.data.read_parquet(f"{SF}/documents.parquet",
                               columns=["doc_id", "text"])
    rep = ds.map_batches(clean.repetition_stats, batch_format="pyarrow",
                         zero_copy_batch=True)
    n_docs = ds.count()
    assert rep.count() == n_docs
    ch = ds.map_batches(lambda b: clean.chunk_words(b, size=16),
                        batch_format="pyarrow", zero_copy_batch=True)
    df = ch.to_pandas()
    assert df.groupby("doc_id").ngroups == n_docs
    # chunks of every doc reconstruct to the stored text
    import pyarrow.parquet as pq
    orig = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas() \
        .set_index("doc_id")["text"]
    joined = df.sort_values(["doc_id", "chunk_id"]) \
        .groupby("doc_id").chunk_text.agg(" ".join)
    assert (joined == orig.loc[joined.index]).all()


def test_line_dedup_drops_cross_doc_boilerplate(ray_session):
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    docs = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "unique one\nSUBSCRIBE NOW\nmore text",
            "SUBSCRIBE NOW\nanother doc",
            "totally original",
            "repeat me\nrepeat me",        # within-doc repeat: count 2
            None,
            "",                            # one empty line, count 1
        ]),
    })
    out = line_dedup(ray.data.from_arrow(docs)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["text"]) == [
        "unique one\nmore text", "another doc", "totally original",
        "", None, ""]
    assert list(out["lines_dropped"])[:4] == [1, 1, 0, 2]
    assert out["lines_dropped"][4] != out["lines_dropped"][4]  # NaN
    assert out["lines_dropped"][5] == 0


def test_line_dedup_max_count_and_min_len(ray_session):
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    docs = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "ab\nlong boilerplate line",
            "ab\nlong boilerplate line",
            "ab\nlong boilerplate line",
            "ab\nkeep",
        ]),
    })
    # max_count=3: 'long boilerplate line' (count 3) survives, 'ab'
    # (count 4) is dropped
    out = line_dedup(ray.data.from_arrow(docs), max_count=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["text"]) == ["long boilerplate line"] * 3 + ["keep"]
    # min_len=3 exempts the short 'ab' even though it is frequent
    out = line_dedup(ray.data.from_arrow(docs), min_len=3) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["text"]) == ["ab"] * 3 + ["ab\nkeep"]


def test_line_dedup_duckdb_parity(ray_session):
    """Bit-exact vs the SQL oracle on planted multi-line docs."""
    import duckdb
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(40)]
    texts = []
    for i in range(60):
        lines = [" ".join(rng.choice(words, 5)) for _ in range(4)]
        if i % 2 == 0:
            lines.insert(1, "COOKIE BANNER")
        if i % 3 == 0:
            lines.append("ALL RIGHTS RESERVED")
        texts.append("\n".join(lines))
    docs = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                     "text": pa.array(texts)})
    out = line_dedup(ray.data.from_arrow(docs)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    odf = con.execute("""
        WITH lines AS (
          SELECT doc_id,
                 unnest(string_split(text, chr(10))) AS ln,
                 generate_subscripts(string_split(text, chr(10)), 1) AS ord
          FROM documents
        ), freq AS (
          SELECT ln FROM lines GROUP BY ln HAVING COUNT(*) > 1
        )
        SELECT d.doc_id,
               coalesce((SELECT string_agg(l.ln, chr(10) ORDER BY l.ord)
                         FROM lines l WHERE l.doc_id = d.doc_id
                           AND l.ln NOT IN (SELECT ln FROM freq)), '') AS text,
               CAST((SELECT COUNT(*) FROM lines l
                     WHERE l.doc_id = d.doc_id
                       AND l.ln IN (SELECT ln FROM freq)) AS BIGINT)
                   AS lines_dropped
        FROM documents d ORDER BY doc_id
    """).fetchdf().reset_index(drop=True)
    assert list(out["text"]) == list(odf["text"])
    assert list(out["lines_dropped"]) == list(odf["lines_dropped"])


def test_line_dedup_join_mode_matches_broadcast(ray_session):
    """mode="join" (no broadcast, three hash shuffles) must produce the
    exact broadcast-mode result on a randomized multi-line corpus with
    planted boilerplate, nulls, empty docs, and within-doc repeats."""
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    rng = np.random.default_rng(21)
    words = [f"w{i}" for i in range(30)]
    texts = []
    for i in range(80):
        lines = [" ".join(rng.choice(words, 4)) for _ in range(3)]
        if i % 2 == 0:
            lines.insert(0, "COOKIE BANNER")
        if i % 5 == 0:
            lines.append(lines[-1])          # within-doc repeat
        texts.append("\n".join(lines))
    texts[7] = None
    texts[13] = ""
    docs = pa.table({"doc_id": pa.array(range(80), pa.int64()),
                     "lang": pa.array(["en", "de"] * 40),
                     "text": pa.array(texts)})
    cols = ["doc_id", "lang", "text", "lines_dropped"]
    a = line_dedup(ray.data.from_arrow(docs), mode="broadcast") \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = line_dedup(ray.data.from_arrow(docs), mode="join",
                   id_col="doc_id") \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # min_len / max_count knobs agree across modes too
    a = line_dedup(ray.data.from_arrow(docs), mode="broadcast",
                   max_count=3, min_len=5) \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    b = line_dedup(ray.data.from_arrow(docs), mode="join",
                   max_count=3, min_len=5) \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_line_dedup_paragraph_sep(ray_session):
    """sep='\\n\\n' deduplicates at paragraph granularity across docs
    (same machinery, different separator), both modes agreeing."""
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    boiler = "Follow us on social media.\nCopyright 2024."
    docs = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array([
            f"para one\nstill para one\n\n{boiler}",
            f"{boiler}\n\nanother para",
            "standalone\n\nsecond para",
        ]),
    })
    cols = ["doc_id", "text", "lines_dropped"]
    a = line_dedup(ray.data.from_arrow(docs), sep="\n\n") \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert list(a["text"]) == ["para one\nstill para one",
                               "another para",
                               "standalone\n\nsecond para"]
    assert list(a["lines_dropped"]) == [1, 1, 0]
    b = line_dedup(ray.data.from_arrow(docs), sep="\n\n", mode="join") \
        .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_chunk_words_stride_sliding_windows():
    from parquet_rs_ray.ops.clean import chunk_words

    text = " ".join(f"w{i}" for i in range(10))
    tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "text": pa.array([text])})
    out = chunk_words(tbl, size=4, stride=2).to_pandas()
    # windows [0:4),[2:6),[4:8),[6:10) — advance by stride until the
    # doc is covered; no trailing window that would only repeat words
    assert list(out["chunk_id"]) == [0, 1, 2, 3]
    assert list(out["chunk_text"]) == [
        "w0 w1 w2 w3", "w2 w3 w4 w5", "w4 w5 w6 w7", "w6 w7 w8 w9"]
    assert list(out["chunk_words"]) == [4, 4, 4, 4]
    # stride == size reproduces the non-overlapping result exactly
    a = chunk_words(tbl, size=4).to_pandas()
    b = chunk_words(tbl, size=4, stride=4).to_pandas()
    assert a.equals(b)
    # consecutive windows overlap by size - stride words
    for i in range(3):
        tail = out["chunk_text"][i].split(" ")[2:]
        head = out["chunk_text"][i + 1].split(" ")[:2]
        assert tail == head
    # bad stride rejected
    with pytest.raises(ValueError):
        chunk_words(tbl, size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_words(tbl, size=4, stride=0)
    # empty / short docs: one window
    t2 = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                   "text": pa.array(["", "only three words"])})
    o2 = chunk_words(t2, size=8, stride=3).to_pandas()
    assert list(o2["chunk_text"]) == ["", "only three words"]


def test_chunk_words_null_text_emits_no_chunk():
    """Null text ⇒ ZERO chunk rows (SQL: unnest over string_split(NULL)
    emits nothing) — no fabricated ''-chunk, no null→'' laundering.
    Empty NON-null text still emits its single ''-chunk."""
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c", None, ""]),
    })
    got = clean.chunk_words(tbl, size=2).to_pandas() \
        .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    assert 2 not in set(got["doc_id"])
    assert list(got[got.doc_id == 3]["chunk_text"]) == [""]
    exp = _docs_con(tbl).execute(_chunk_sql(2)).fetchdf()
    g = got[exp.columns].reset_index(drop=True)
    assert g.equals(exp.astype(g.dtypes.to_dict())), (g, exp)
    # sliding-window variant honors the same null semantics
    got = clean.chunk_words(tbl, size=2, stride=1).to_pandas()
    assert 2 not in set(got["doc_id"])


def test_line_dedup_join_mode_string_ids(ray_session):
    """join mode with a STRING id column: empty hash partitions must
    emit string-typed __id (not the int64 fallback) so the rebuild
    concat and the final join see one schema."""
    import ray
    from parquet_rs_ray.ops.clean import line_dedup

    texts = [f"unique line {i}\nCOOKIE BANNER" for i in range(12)]
    texts[3] = None
    docs = pa.table({"url": pa.array([f"https://s/{i}" for i in range(12)]),
                     "text": pa.array(texts)})
    cols = ["url", "text", "lines_dropped"]
    a = line_dedup(ray.data.from_arrow(docs), mode="broadcast",
                   id_col="url") \
        .to_pandas()[cols].sort_values("url").reset_index(drop=True)
    b = line_dedup(ray.data.from_arrow(docs), mode="join", id_col="url",
                   num_partitions=8) \
        .to_pandas()[cols].sort_values("url").reset_index(drop=True)
    assert a.equals(b)
    assert all("COOKIE BANNER" not in (t or "") for t in b["text"])
