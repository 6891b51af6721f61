"""Byte-level BPE tokenizer (ops/bpe.py): merge-table parity vs an
independent naive recount-from-scratch trainer, greedy-apply ≡
replay-in-training-order, byte roundtrip through decode_token_bytes,
partition invariance, pruning/cap, and null/empty/unicode semantics."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.bpe import (EOW, decode_token_bytes,
                                    tokenize_bpe, train_bpe)


# ---------- independent reference (naive: full recount per merge) ----------

def _ref_word_freq(texts):
    freq = {}
    for t in texts:
        if t is None:
            continue
        for w in t.split(" "):
            if w:
                freq[w] = freq.get(w, 0) + 1
    return freq


def _ref_train(texts, num_merges):
    freq = _ref_word_freq(texts)
    words = {tuple(w.encode()) + (EOW,): c for w, c in freq.items()}
    merges = []
    for m in range(num_merges):
        pairs = {}
        for w, c in words.items():
            for p in zip(w, w[1:]):
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        best_count = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_count)
        nid = 257 + m
        merges.append(best)
        new_words = {}
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if (w[i] == best[0] and i + 1 < len(w)
                        and w[i + 1] == best[1]):
                    out.append(nid)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            nw = tuple(out)
            new_words[nw] = new_words.get(nw, 0) + c
        words = new_words
    return merges


def _ref_apply_in_training_order(word: bytes, merges):
    """Replay merges sequentially in training order (Sennrich apply)."""
    sym = list(word) + [EOW]
    for rank, (a, b) in enumerate(merges):
        nid = 257 + rank
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i:i + 2] = [nid]
            else:
                i += 1
    return sym


TEXTS = ["the quick brown fox jumps over the lazy dog",
         "the quick brown dog naps under the lazy fox",
         "low lower lowest newer newest wider widest",
         "low low low low lower lower newest newest",
         None, "", "  ", "a", "über café naïve — déjà vu",
         "aaaa aaaa aaaa bbbb bbbb cccc",
         "the the the quick quick brown"]


def _ds(ray_session, texts=TEXTS, blocks=1):
    import ray
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def test_train_matches_reference(ray_session):
    model = train_bpe(_ds(ray_session), num_merges=40)
    ref = _ref_train(TEXTS, 40)
    got = [tuple(int(x) for x in row) for row in model["merges"]]
    assert got == ref
    assert model["n_merges"] == len(ref)
    assert model["vocab_size"] == 257 + len(ref)
    assert model["total_words"] == sum(_ref_word_freq(TEXTS).values())
    assert model["n_words_distinct"] == len(_ref_word_freq(TEXTS))


def test_train_partition_invariant(ray_session):
    m1 = train_bpe(_ds(ray_session, blocks=1), num_merges=30)
    m5 = train_bpe(_ds(ray_session, blocks=5), num_merges=30)
    assert np.array_equal(m1["merges"], m5["merges"])


def test_merges_exhaust_gracefully(ray_session):
    # tiny corpus: asking for far more merges than pairs exist stops
    # at exhaustion instead of looping or erroring
    model = train_bpe(_ds(ray_session, texts=["ab ab", "ab"]),
                      num_merges=1000)
    assert 0 < model["n_merges"] < 1000
    # fully merged: the word "ab"+EOW collapses to one token
    by = decode_token_bytes(model)
    assert b"ab" in by


def test_greedy_apply_equals_training_order_replay(ray_session):
    model = train_bpe(_ds(ray_session), num_merges=40)
    merges = [tuple(int(x) for x in row) for row in model["merges"]]
    out = tokenize_bpe(_ds(ray_session), model, ids_col="ids") \
        .to_pandas().sort_values("doc_id")
    for t, ids in zip(TEXTS, out["ids"]):
        words = [w for w in (t or "").split(" ") if w]
        ref = []
        for w in words:
            ref.extend(_ref_apply_in_training_order(w.encode(), merges))
        assert list(ids) == ref


def test_token_bytes_roundtrip(ray_session):
    model = train_bpe(_ds(ray_session), num_merges=40)
    by = decode_token_bytes(model)
    out = tokenize_bpe(_ds(ray_session), model, ids_col="ids") \
        .to_pandas().sort_values("doc_id")
    for t, ids in zip(TEXTS, out["ids"]):
        joined = b"".join(by[i] for i in ids)
        expect = b"".join(w.encode() for w in (t or "").split(" ") if w)
        assert joined == expect


def test_counts_and_null_semantics(ray_session):
    model = train_bpe(_ds(ray_session), num_merges=40)
    out = tokenize_bpe(_ds(ray_session), model, ids_col="ids") \
        .to_pandas().sort_values("doc_id")
    counts = out["n_tokens_bpe"].to_numpy()
    for c, ids in zip(counts, out["ids"]):
        assert c == len(ids)
    # null / empty / whitespace-only docs count 0 (split yields no words)
    for i, t in enumerate(TEXTS):
        if not t or not t.strip(" "):
            assert counts[i] == 0


def test_zero_merges_is_bytes_plus_eow(ray_session):
    model = train_bpe(_ds(ray_session, texts=["hi there"]), num_merges=0)
    assert model["n_merges"] == 0
    out = tokenize_bpe(_ds(ray_session, texts=["hi there"]), model,
                       ids_col="ids").to_pandas()
    assert list(out["ids"][0]) == [104, 105, EOW, 116, 104, 101, 114,
                                   101, EOW]
    assert out["n_tokens_bpe"][0] == 9


def test_prune_and_cap(ray_session):
    texts = ["common common common common", "rare", "alsorare",
             "common rare"]
    full = train_bpe(_ds(ray_session, texts=texts), num_merges=10)
    pruned = train_bpe(_ds(ray_session, texts=texts), num_merges=10,
                       prune_min_count=2)
    capped = train_bpe(_ds(ray_session, texts=texts), num_merges=10,
                       max_words=1)
    # pruning drops the singleton words: only "common" (5) + "rare" (2)
    # survive, so pruned == training on those words alone
    ref = _ref_train(["common common common common common",
                      "rare rare"], 10)
    got = [tuple(int(x) for x in row) for row in pruned["merges"]]
    assert got == ref
    # cap keeps the single most frequent word
    ref_cap = _ref_train(["common"], 10)
    got_cap = [tuple(int(x) for x in row) for row in capped["merges"]]
    assert got_cap == ref_cap
    assert full["n_merges"] >= pruned["n_merges"] >= capped["n_merges"]


def test_unicode_words_tokenize_bytewise(ray_session):
    texts = ["über über café"]
    model = train_bpe(_ds(ray_session, texts=texts), num_merges=5)
    by = decode_token_bytes(model)
    out = tokenize_bpe(_ds(ray_session, texts=texts), model,
                       ids_col="ids").to_pandas()
    joined = b"".join(by[i] for i in out["ids"][0])
    assert joined == "überübercafé".encode()


def test_tokenize_batch_of_all_null(ray_session):
    import ray
    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array([None, None], pa.string())})
    model = train_bpe(_ds(ray_session), num_merges=10)
    out = tokenize_bpe(ray.data.from_arrow(tbl), model,
                       ids_col="ids").to_pandas()
    assert list(out["n_tokens_bpe"]) == [0, 0]
    assert all(len(v) == 0 for v in out["ids"])


def test_decremented_pair_can_still_win(ray_session):
    """Regression: a merge that destroys an adjacency of a still-live
    pair decrements its count; the lazy-deletion heap must re-enter the
    pair at the new count or it can never be selected again (found by
    review: word freqs {pqr:2, qr:8, spqt:7} — merging (q,r) first
    decrements (p,q) from 9 to 7, which must later beat (p,N))."""
    texts = ["pqr pqr"] + ["qr"] * 8 + ["spqt"] * 7
    model = train_bpe(_ds(ray_session, texts=texts), num_merges=6)
    ref = _ref_train(texts, 6)
    got = [tuple(int(x) for x in row) for row in model["merges"]]
    assert got == ref


def test_negative_merges_raises(ray_session):
    with pytest.raises(ValueError):
        train_bpe(_ds(ray_session), num_merges=-1)


def test_bpe_counts_feed_sequence_packing(ray_session):
    """Composition: tokenize_bpe's count column drives
    pack_sequences(tokens_col=...) — the real-token replacement for the
    regex estimate, end to end."""
    from parquet_rs_ray.ops.packing import pack_sequences

    model = train_bpe(_ds(ray_session), num_merges=40)
    tok = tokenize_bpe(_ds(ray_session), model)
    packed = pack_sequences(tok, tokens_col="n_tokens_bpe",
                            bin_tokens=64).to_pandas() \
        .sort_values("doc_id")
    tok_df = tok.to_pandas().sort_values("doc_id")
    # one row per document, n_tokens = the BPE count, bins respect the
    # budget (over-long docs get their own bin)
    assert list(packed["doc_id"]) == list(tok_df["doc_id"])
    assert list(packed["n_tokens"]) == list(tok_df["n_tokens_bpe"])
    by_bin = packed.groupby("bin_uid")["n_tokens"].sum()
    n_docs_per_bin = packed.groupby("bin_uid").size()
    assert all((t <= 64) | (n_docs_per_bin[b] == 1)
               for b, t in by_bin.items())


def test_concat_packed_sequences_end_to_end(ray_session):
    """tokenize_bpe(ids) → concat_packed_sequences: one row per bin,
    input_ids = member docs' ids concatenated in key order with EOS
    after each doc, budget respected including the EOS tokens."""
    from parquet_rs_ray.ops.packing import concat_packed_sequences

    model = train_bpe(_ds(ray_session), num_merges=40)
    tok = tokenize_bpe(_ds(ray_session), model, ids_col="ids")
    eos = model["vocab_size"]           # one past the trained vocab
    out = concat_packed_sequences(tok, ids_col="ids", bin_tokens=48,
                                  eos_id=eos).to_pandas()
    tok_df = tok.to_pandas().set_index("doc_id")
    seen = set()
    for _, row in out.iterrows():
        assert row["n_tokens"] <= 48 or row["n_docs"] == 1
        assert list(row["doc_ids"]) == sorted(row["doc_ids"])
        expect = []
        for d in row["doc_ids"]:
            assert d not in seen
            seen.add(d)
            expect.extend(tok_df.loc[d, "ids"])
            expect.append(eos)
        assert list(row["input_ids"]) == expect
        assert row["n_tokens"] == len(expect)
    assert seen == set(tok_df.index)    # every doc packed exactly once


def test_concat_packed_single_overlong_doc_intact(ray_session):
    """A doc whose ids+EOS alone exceed the budget is emitted INTACT in
    its own over-budget bin — never truncated or split silently."""
    from parquet_rs_ray.ops.packing import concat_packed_sequences

    texts = ["a " * 40, "b c"]          # doc 0 far exceeds bin_tokens=8
    model = train_bpe(_ds(ray_session, texts=texts), num_merges=0)
    tok = tokenize_bpe(_ds(ray_session, texts=texts), model,
                       ids_col="ids")
    out = concat_packed_sequences(tok, ids_col="ids", bin_tokens=8,
                                  eos_id=257).to_pandas()
    tok_df = tok.to_pandas().set_index("doc_id")
    big = out[out["n_tokens"] > 8]
    assert len(big) == 1 and big.iloc[0]["n_docs"] == 1
    assert list(big.iloc[0]["input_ids"]) == \
        list(tok_df.loc[big.iloc[0]["doc_ids"][0], "ids"]) + [257]


def test_concat_packed_without_eos(ray_session):
    from parquet_rs_ray.ops.packing import concat_packed_sequences

    model = train_bpe(_ds(ray_session), num_merges=20)
    tok = tokenize_bpe(_ds(ray_session), model, ids_col="ids")
    out = concat_packed_sequences(tok, ids_col="ids",
                                  bin_tokens=64).to_pandas()
    tok_df = tok.to_pandas()
    assert out["n_tokens"].sum() == tok_df["n_tokens_bpe"].sum()
    assert out["n_docs"].sum() == len(tok_df)


def test_curate_with_bpe_stage(ray_session):
    """curate_web_corpus(bpe_merges=...) appends n_tokens_bpe to the
    curated output."""
    from parquet_rs_ray.ops.curate import curate_web_corpus

    texts = ["the quick brown fox jumps over the lazy dog and runs on",
             "the quick brown dog naps under the lazy fox all the day",
             "completely different content here with many fine words in",
             "ze quick brown fox jumps over ze lazy dog and runs on"]
    import ray
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = curate_web_corpus(ray.data.from_arrow(tbl), keep_langs=None,
                            min_quality=0.0, near=False,
                            boilerplate_max_count=None,
                            bpe_merges=30).to_pandas()
    assert "n_tokens_bpe" in out.columns
    assert (out["n_tokens_bpe"] > 0).all()


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_bpe_property_random_corpora(ray_session, data):
    """Random small corpora (skewed alphabets force heavy pair-count
    churn in the heap): merge table must equal the naive recount-from-
    scratch reference, and tokenized ids must byte-roundtrip."""
    rng_words = data.draw(st.lists(
        st.text(alphabet="abcdeé ", min_size=0, max_size=24),
        min_size=1, max_size=12))
    n_merges = data.draw(st.integers(0, 25))
    model = train_bpe(_ds(ray_session, texts=rng_words, blocks=2),
                      num_merges=n_merges)
    ref = _ref_train(rng_words, n_merges)
    got = [tuple(int(x) for x in row) for row in model["merges"]]
    assert got == ref
    by = decode_token_bytes(model)
    out = tokenize_bpe(_ds(ray_session, texts=rng_words), model,
                       ids_col="ids").to_pandas().sort_values("doc_id")
    for t, ids in zip(rng_words, out["ids"]):
        joined = b"".join(by[i] for i in ids)
        assert joined == b"".join(
            w.encode() for w in (t or "").split(" ") if w)
