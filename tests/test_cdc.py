"""Content-defined chunking substring dedup (ops/cdc.py): anchor
kernel vs an independent scalar reference, alignment-robust detection,
stats exactness, and winner-keeps-one-copy removal semantics."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.cdc import (_anchors, chunk_batch, dedup_spans,
                                    duplicate_span_stats)

P = 0x9E3779B97F4A7C15
WIN = 16


def _ref_anchors(data: bytes, mask_bits: int) -> list[int]:
    """Independent scalar re-implementation of the anchor rule."""
    mask = (1 << mask_bits) - 1
    out = []
    for i in range(WIN - 1, len(data)):
        h = 0
        for j in range(WIN):
            h = (h + data[i - j] * pow(P, j, 1 << 64)) % (1 << 64)
        if (h & mask) == mask:
            b = i + 1
            # at most 3 continuation bytes can follow in valid utf-8
            for _ in range(3):
                if b < len(data) and (data[b] & 0xC0) == 0x80:
                    b += 1
            if b < len(data):
                out.append(b)
    return sorted(set(out))


def test_anchors_match_scalar_reference():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
    got = _anchors(np.frombuffer(data, np.uint8), 6,
                   np.array([0, len(data)], np.int64)).tolist()
    assert got == _ref_anchors(data, 6)
    assert len(got) > 10                       # rule actually fires


def test_anchors_never_split_utf8():
    text = ("日本語のテキスト و نص عربي и русский текст " * 200).encode()
    brk = _anchors(np.frombuffer(text, np.uint8), 5,
                   np.array([0, len(text)], np.int64))
    assert len(brk) > 5
    # every break lands on a utf-8 character start
    assert all((text[b] & 0xC0) != 0x80 for b in brk.tolist())
    # splitting there keeps every piece decodable
    pieces = np.split(np.frombuffer(text, np.uint8), brk)
    for p in pieces:
        p.tobytes().decode("utf-8")


def _mk_words(rng, n):
    return " ".join(rng.choice(
        ["alpha", "bravo", "charlie", "delta", "echo", "fox", "golf",
         "hotel", "india", "julia", "kilo", "lima"], n).tolist())


def test_duplicate_span_stats_alignment_robust(ray_session):
    """The same long span embedded at DIFFERENT offsets in two docs is
    detected (interior chunks coincide); a unique doc reports ~0."""
    import ray

    rng = np.random.default_rng(2)
    span = _mk_words(rng, 800)                 # ~4.5 KB shared span
    docs = [
        _mk_words(rng, 40) + " " + span + " " + _mk_words(rng, 7),
        _mk_words(rng, 3) + " " + span + " " + _mk_words(rng, 55),
        _mk_words(rng, 900),                   # unique
    ]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = duplicate_span_stats(
        ray.data.from_arrow(tbl), mask_bits=6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.total_bytes.tolist() == [len(d.encode()) for d in docs]
    # interior chunks of the span coincide despite different alignment
    assert out.dup_bytes[0] > 0.6 * len(span)
    assert out.dup_bytes[1] > 0.6 * len(span)
    assert out.dup_frac[2] < 0.1
    assert np.allclose(out.dup_frac,
                       out.dup_bytes / out.total_bytes)


def test_chunk_batch_counts_exact(ray_session):
    """chunk_batch's (occ, bytes, first_seq) vs a scalar recount of the
    same chunk bounds."""
    rng = np.random.default_rng(3)
    rep = _mk_words(rng, 30)
    texts = [rep + " " + rep + " " + rep, _mk_words(rng, 80), None, ""]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = chunk_batch(tbl, text_col="text", key_col="doc_id",
                      mask_bits=4).to_pandas()
    # rebuild expected per doc from the anchor rule
    for d, t in enumerate(texts):
        sub = out[out.doc_id == d]
        if not t:
            assert len(sub) == 0
            continue
        b = t.encode()
        brk = _ref_anchors(b, 4)
        bounds = [0] + brk + [len(b)]
        chunks = [b[bounds[i]:bounds[i + 1]] for i in range(len(bounds) - 1)
                  if bounds[i + 1] > bounds[i]]
        # occurrences per distinct content
        from collections import Counter
        want = Counter(chunks)
        assert sub.occ.sum() == len(chunks), d
        assert len(sub) == len(want), d
        assert sub.bytes.sum() == len(b), d


def test_dedup_spans_winner_keeps_one_copy(ray_session):
    import ray

    rng = np.random.default_rng(4)
    span = _mk_words(rng, 600)
    uniq0, uniq1 = _mk_words(rng, 50), _mk_words(rng, 60)
    docs = [uniq0 + " " + span, uniq1 + " " + span, None, ""]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    ds = ray.data.from_arrow(tbl)
    out = dedup_spans(ds, mask_bits=6).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # winner (doc 0) keeps everything
    assert out.text[0] == docs[0]
    # loser keeps its unique prefix, loses most of the span
    assert out.text[1].startswith(uniq1[:40])
    assert len(out.text[1]) < len(docs[1]) - 0.6 * len(span)
    # null/empty preserved
    assert out.text[2] is None or (isinstance(out.text[2], float)
                                   and np.isnan(out.text[2]))
    assert out.text[3] == ""
    # the removed bytes are exactly whole chunks: remaining text is the
    # concatenation of kept chunk ranges, so it must still be valid
    # utf-8 and a subsequence of the original
    out.text[1].encode().decode("utf-8")


def test_dedup_spans_out_col_and_corpus_volume(ray_session):
    """With out_col set the original column survives; total corpus
    bytes shrink by at least one span copy."""
    import ray

    rng = np.random.default_rng(5)
    span = _mk_words(rng, 500)
    docs = [f"{_mk_words(rng, 10 + i)} {span}" for i in range(4)]
    tbl = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    out = dedup_spans(ray.data.from_arrow(tbl), mask_bits=6,
                      out_col="clean").to_pandas()
    assert out.text.tolist() == docs
    before = sum(len(d.encode()) for d in docs)
    after = sum(len(c.encode()) for c in out.clean)
    assert after < before - 2.0 * len(span)    # ≥2 of 3 copies removed
    kept_span = [c for c in out.clean if span[100:400] in c]
    assert len(kept_span) == 1                 # exactly one full copy


def _span_corpus(rng, n_docs=12, *, string_keys=False):
    """Corpus with planted cross-doc spans, a null and an empty doc."""
    span_a, span_b = _mk_words(rng, 500), _mk_words(rng, 350)
    docs = []
    for i in range(n_docs):
        parts = [_mk_words(rng, 20 + i)]
        if i % 3 == 0:
            parts.append(span_a)
        if i % 4 == 0:
            parts.append(span_b)
        parts.append(_mk_words(rng, 5 + i))
        docs.append(" ".join(parts))
    docs[n_docs - 2] = None
    docs[n_docs - 1] = ""
    keys = ([f"doc-{i:04d}" for i in range(n_docs)] if string_keys
            else list(range(n_docs)))
    kt = pa.string() if string_keys else pa.int64()
    return pa.table({"doc_id": pa.array(keys, kt),
                     "text": pa.array(docs, pa.string())})


def _spans_pd(ds_out):
    return ds_out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_dedup_spans_join_matches_broadcast(ray_session):
    """Join regime ≡ broadcast regime on planted spans, including null
    and empty docs, int and string keys, and out_col."""
    import ray

    for string_keys in (False, True):
        tbl = _span_corpus(np.random.default_rng(7),
                           string_keys=string_keys)
        ds = ray.data.from_arrow(tbl).repartition(4)
        b = _spans_pd(dedup_spans(ds, mask_bits=6, mode="broadcast"))
        j = _spans_pd(dedup_spans(ds, mask_bits=6, mode="join",
                                  num_partitions=4))
        assert b.text.tolist() == j.text.tolist()
        assert list(b.columns) == list(j.columns)
    # out_col parity
    tbl = _span_corpus(np.random.default_rng(8))
    ds = ray.data.from_arrow(tbl).repartition(3)
    b = _spans_pd(dedup_spans(ds, mask_bits=6, out_col="clean"))
    j = _spans_pd(dedup_spans(ds, mask_bits=6, out_col="clean",
                              mode="join"))
    assert b.clean.tolist() == j.clean.tolist()
    assert b.text.tolist() == j.text.tolist()


def test_dedup_spans_auto_regimes(ray_session):
    """auto ≡ broadcast under the default budget; a 1-byte budget
    forces the join plan; unknown mode raises."""
    import ray

    tbl = _span_corpus(np.random.default_rng(9))
    ds = ray.data.from_arrow(tbl).repartition(4)
    want = _spans_pd(dedup_spans(ds, mask_bits=6))
    got = _spans_pd(dedup_spans(ds, mask_bits=6, mode="auto"))
    assert want.text.tolist() == got.text.tolist()
    forced = _spans_pd(dedup_spans(ds, mask_bits=6, mode="auto",
                                   broadcast_budget_bytes=1,
                                   num_partitions=4))
    assert want.text.tolist() == forced.text.tolist()
    with pytest.raises(ValueError, match="mode"):
        dedup_spans(ds, mode="bogus")


def test_dedup_spans_join_all_null_or_empty(ray_session):
    """Degenerate corpus (every text null/empty): join mode must not
    crash on the schema-less rebuilt side — nulls stay null, empties
    stay empty, matching broadcast."""
    import ray

    tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                    "text": pa.array([None, "", None], pa.string())})
    ds = ray.data.from_arrow(tbl).repartition(2)
    j = _spans_pd(dedup_spans(ds, mode="join", num_partitions=2))
    b = _spans_pd(dedup_spans(ds, mode="broadcast"))
    assert j.text.tolist() == b.text.tolist()
    assert j.text[1] == "" and j.text[0] is None or np.isnan(j.text[0])


def test_dedup_spans_multibyte_run_no_anchor(ray_session):
    """A long run of one multibyte codepoint yields no content anchors;
    the fixed-offset long-chunk splitter must still break on character
    boundaries so span removal keeps the text valid UTF-8."""
    import ray

    run = "—" * 10000                      # 3 bytes/char, anchorless
    tbl = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                    "text": pa.array([run, "prefix " + run], pa.string())})
    out = _spans_pd(dedup_spans(ray.data.from_arrow(tbl), mask_bits=6))
    for t in out.text:
        t.encode("utf-8").decode("utf-8")       # decodes = valid
    # ONE copy of the repeated chunk content survives corpus-wide
    # (the run is identical chunks, so even the winner keeps just its
    # first occurrence); the loser keeps its unique prefix
    assert 0 < len(out.text[0]) < len(run)
    assert out.text[1].startswith("prefix ")
    assert len(out.text[0]) + len(out.text[1]) < len(run) + 10
    assert set(out.text[0]) == {"—"}
