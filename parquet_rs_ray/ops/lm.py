"""Character (byte) n-gram language-model quality scoring, CCNet-style.

The classic web-curation quality gate scores each document with a small
language model trained on a trusted reference corpus and drops the
high-perplexity tail (CCNet does this with a KenLM 5-gram; the same
shape appears in most LLM-data pipelines). This module is that stage
with the model kept honest for this environment, in two sizes:

* `train_char_lm` — BYTE-TRIGRAM add-one-smoothed unigram-of-trigrams
  LM as a DENSE 2^24 float array (~128 MB) — deterministic, trainable
  inside the engine, vectorized end to end.
* `train_ngram_lm` — byte n-grams up to n=8 (default 5, the KenLM
  order CCNet uses) as a SORTED HASH TABLE with count pruning: 256^5
  can't sit dense, but the (uint64 key, float64 logp) pair table is
  bounded by the corpus's REALIZED pruned n-gram diversity at
  16 B/gram. Same training shuffle shape; scoring swaps the dense
  gather for one vectorized searchsorted membership probe.

Scale shape:

- `train_char_lm`: one map_batches pass emits per-batch (gram, count)
  partials — np.unique over packed uint32 window codes of the batch's
  FLAT text buffer, boundary-crossing windows masked — then ONE
  groupby-sum shuffle of those tiny pairs. The corpus text never
  shuffles; the reference sample is chosen by a deterministic key
  modulus so the oracle can replay it. The driver folds the bounded
  model table into a dense logprob array.
- `score_char_lm`: the model array rides `ray.put` (broadcast once, not
  per batch); each batch computes every window code of its flat buffer,
  one fancy-indexed logprob gather, zeroes the two boundary-crossing
  positions per document, and segment-sums with np.add.reduceat. No
  Python per row, no shuffle.
- `filter_by_lm`: threshold gate on the score (bits/byte-trigram).

Byte trigrams (not codepoints) keep the kernel one flat-buffer pass for
ANY utf-8 input; on ASCII corpora byte- and char-trigrams coincide,
which is what the DuckDB parity test replays (tolerance compare — ln()
differs from numpy by ~1 ulp, so this op registers rows-only rather
than hash-oracle-backed).

Reference anchor: no counterpart in parquet-rs (pure storage); this is
part of the training-data operator family (SURVEY §2 additions)
alongside lang-ID/quality in ops/textstats.py, which score with fixed
heuristics where this learns from a reference corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["train_char_lm", "train_ngram_lm", "score_char_lm",
           "filter_by_lm", "bucket_by_lm"]

_N = 3          # trigrams: codes pack into uint32, dense vocab 2^24


def _flat_utf8(arr) -> tuple[np.ndarray, np.ndarray]:
    """String/binary column → (byte offsets int64 [n+1], flat uint8
    data), null/empty rows zero-length. Tolerates large_* int64
    offsets (≥2 GiB batches)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif not (pa.types.is_binary(arr.type)
              or pa.types.is_large_binary(arr.type)):
        arr = arr.cast(pa.binary())
    if arr.null_count:          # null slots → zero-length spans (the
        arr = arr.fill_null(b"")  # spec allows garbage under nulls)
    large = pa.types.is_large_binary(arr.type)
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64 if large else np.int32,
        count=len(arr) + 1,
        offset=arr.offset * (8 if large else 4)).astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, np.uint8))
    start = offsets[0]
    offsets = offsets - start
    data = data[start:start + int(offsets[-1])]
    return offsets, data


def _window_codes(offsets: np.ndarray, data: np.ndarray,
                  n: int = _N) -> tuple[np.ndarray, np.ndarray]:
    """All byte n-gram window codes of the flat buffer + a validity
    mask that zeroes the windows crossing document boundaries. Code =
    big-endian pack of the window's n bytes (uint32 for trigrams —
    dense-indexable — uint64 up to n=8)."""
    total = len(data)
    n_win = total - (n - 1)
    dtype = np.uint32 if n <= 4 else np.uint64
    if n_win <= 0:
        return np.empty(0, dtype), np.empty(0, bool)
    codes = np.zeros(n_win, dtype)
    for j in range(n):
        codes |= data[j:j + n_win].astype(dtype) << (8 * (n - 1 - j))
    valid = np.ones(n_win, bool)
    # windows starting in a doc's last n-1 bytes belong to no doc
    ends = offsets[1:]
    for k in range(1, n):
        pos = ends - k
        pos = pos[(pos >= 0) & (pos < n_win)]
        valid[pos] = False
    return codes, valid


def _gram_partials(batch: pa.Table, text_col: str, key_col: str,
                   sample_mod: int, n: int = _N) -> pa.Table:
    if sample_mod > 1:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        if pa.types.is_integer(keys.type):
            kv = keys.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                % sample_mod
        else:
            # string keys (urls): deterministic FNV-hash sampling —
            # same partition-invariant property, SQL can replay the
            # integer form only
            from .dedup import _hash_strings
            kv = _hash_strings(keys.cast(pa.string())) \
                % np.uint64(sample_mod)
        batch = batch.filter(pa.array(kv == 0))
    offsets, data = _flat_utf8(batch.column(text_col))
    codes, valid = _window_codes(offsets, data, n)
    grams, counts = np.unique(codes[valid], return_counts=True)
    return pa.table({"gram": pa.array(grams.astype(np.int64)),
                     "cnt": pa.array(counts.astype(np.int64))})


def train_char_lm(ds, *, text_col: str = "text", key_col: str = "doc_id",
                  sample_mod: int = 1) -> dict:
    """Train the byte-trigram LM on `ds` (rows with
    ``key_col % sample_mod == 0`` when sampling; string keys sample by
    FNV hash mod instead — deterministic and partition-invariant, but
    only the integer form is SQL-replayable). Returns the model as
    a plain dict: dense float64 ``logp`` (2^24 entries, add-one
    smoothed log probabilities, OOV included), ``total`` grams and
    ``vocab`` size — ~128 MB dense, built once on the driver from the
    bounded (gram, count) table and broadcast by the scorer."""
    agg = ds.map_batches(
        lambda b: _gram_partials(b, text_col, key_col, sample_mod),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("gram").sum("cnt")
    tbl = agg.to_pandas()       # bounded: ≤ distinct byte-trigrams
    grams = tbl["gram"].to_numpy()
    counts = tbl["sum(cnt)"].to_numpy()
    total = int(counts.sum())
    vocab = 1 << 24
    logp = np.full(vocab, -np.log(total + vocab), np.float64)
    logp[grams] = np.log((counts + 1) / (total + vocab))
    return {"logp": logp, "total": total, "n_grams_distinct": len(grams)}


def train_ngram_lm(ds, *, n: int = 5, text_col: str = "text",
                   key_col: str = "doc_id", sample_mod: int = 1,
                   prune_min_count: int = 2) -> dict:
    """Train a byte n-gram LM (n up to 8) stored as a SORTED HASH TABLE
    with KenLM-style count pruning, instead of the dense array the
    trigram model uses — 256^5 can't sit dense, but web text's distinct
    5-grams with count ≥ ``prune_min_count`` fit a (uint64 key, float64
    logp) pair table at 16 B/gram, bounded by the alphabet's REALIZED
    n-gram diversity, not 256^n.

    Same distribution shape as `train_char_lm`: per-batch (gram, count)
    partials (np.unique over packed window codes of the flat buffer,
    boundary windows masked) → ONE groupby-sum shuffle of tiny pairs →
    the driver folds the bounded table, prunes, sorts. Smoothing is
    add-one over the nominal 256^n vocabulary computed from the FULL
    (pre-prune) total, so pruning only demotes the dropped grams to the
    OOV probability — kept grams score identically with or without
    pruning. Scoring plugs into the same `score_char_lm` /
    `filter_by_lm` / `bucket_by_lm` stages (the scorer dispatches on
    the model dict's ``keys`` field): lookups are one vectorized
    `np.searchsorted` membership probe per batch."""
    if not 2 <= n <= 8:
        raise ValueError("n must be in [2, 8] (codes pack into uint64)")
    agg = ds.map_batches(
        lambda b: _gram_partials(b, text_col, key_col, sample_mod, n),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("gram").sum("cnt").materialize()
    # full pre-prune total (smoothing ignores pruning) as a distributed
    # scalar, and the count-prune as a distributed filter — the driver
    # table is bounded by the PRUNED diversity (on web text count-1
    # grams dominate distinct grams, so collecting before pruning
    # would bound driver memory by the wrong, much larger set)
    total = int(agg.sum("sum(cnt)") or 0)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b.column("sum(cnt)"),
                                         prune_min_count))

    tbl = agg.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True).to_pandas()
    grams = tbl["gram"].to_numpy().astype(np.uint64)
    counts = tbl["sum(cnt)"].to_numpy().astype(np.int64)
    order = np.argsort(grams, kind="stable")
    grams, counts = grams[order], counts[order]
    vocab = float(256) ** n
    return {"n": n,
            "keys": np.ascontiguousarray(grams),
            "logp": np.log((counts + 1) / (total + vocab)),
            "oov_logp": float(-np.log(total + vocab)),
            "total": total, "n_grams_distinct": len(grams)}


def score_char_lm(ds, model: dict, *, text_col: str = "text",
                  out_col: str = "lm_logprob"):
    """Append ``out_col`` = mean log probability of the document's byte
    n-grams under `model` (≤ 0; higher = more reference-like; docs
    shorter than n bytes or null score null). Accepts BOTH model kinds:
    the dense trigram array (`train_char_lm`, ~128 MB, fancy-index
    gather) and the sorted-hash-table n-gram model (`train_ngram_lm`,
    searchsorted membership probe, misses score OOV). Model arrays ship
    to the object store ONCE (ray.put) and map read-only into every
    worker."""
    import ray

    hashed = "keys" in model
    n = int(model.get("n", _N))
    if hashed:
        kref = ray.put(model["keys"])
        vref = ray.put(model["logp"])
        oov = float(model["oov_logp"])
    else:
        ref = ray.put(model["logp"])

    class _Scorer:
        def __init__(self):
            if hashed:
                self.keys = ray.get(kref)
                self.vals = ray.get(vref)
            else:
                self.logp = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            offsets, data = _flat_utf8(batch.column(text_col))
            codes, valid = _window_codes(offsets, data, n)
            if hashed:
                if len(self.keys):
                    pos = np.searchsorted(self.keys, codes)
                    pos[pos == len(self.keys)] = 0
                    hit = self.keys[pos] == codes
                    vals = np.where(hit, self.vals[pos], oov)
                else:
                    vals = np.full(len(codes), oov)
            else:
                vals = self.logp[codes]
            vals = np.where(valid, vals, 0.0)
            n_win = np.maximum(np.diff(offsets) - (n - 1), 0)
            # exact segment sums via cumsum differences — unlike
            # reduceat this is correct when a zero-length (empty or
            # null-text) doc ends the flat buffer
            csum = np.concatenate(([0.0], np.cumsum(vals)))
            e = np.clip(offsets, 0, len(vals))
            sums = csum[e[1:]] - csum[e[:-1]]
            mean = np.where(n_win > 0, sums / np.maximum(n_win, 1),
                            np.nan)
            out = pa.array(mean, pa.float64(), from_pandas=True)
            return batch.append_column(out_col, out)  # NaN → null

    return ds.map_batches(_Scorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))


def filter_by_lm(ds, model: dict, *, min_logprob: float,
                 text_col: str = "text"):
    """Keep documents whose mean trigram log probability is at least
    ``min_logprob`` (the CCNet head+middle cut, expressed in
    log-space). Unscorable (<3 byte) docs drop."""
    import pyarrow.compute as pc

    scored = score_char_lm(ds, model, text_col=text_col,
                           out_col="__lm")

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.and_kleene(pc.is_valid(batch.column("__lm")),
                          pc.greater_equal(batch.column("__lm"),
                                           min_logprob))
        return batch.filter(pc.fill_null(m, False)).drop_columns("__lm")

    return scored.map_batches(keep, batch_format="pyarrow",
                              zero_copy_batch=True)


def bucket_by_lm(ds, model: dict, *, text_col: str = "text",
                 lang_col: str | None = None,
                 out_col: str = "lm_bucket", qs=(1 / 3, 2 / 3),
                 score_col: str = "lm_logprob"):
    """CCNet's head/middle/tail split: score every document under
    `model`, compute EXACT score quantile thresholds per language (or
    globally when ``lang_col`` is None), and label each doc — "tail"
    below qs[0], "head" at/above qs[-1], "middle" between (ascending
    score = ascending quality; CCNet orders by perplexity, which is
    −logprob, so its head = our top-score bucket). Unscorable docs
    (null / <3 bytes) get a null bucket.

    Distribution shape: the scoring map runs twice — once feeding the
    fully distributed grouped-quantile threshold aggregate (only
    (group, value, cnt) histogram partials shuffle —
    ops/relational.py) and once under the final labeling pass — which
    is the minimum without materializing a corpus-sized intermediate
    (scores can't be known before a full pass, and Ray re-executes
    lazy lineage per consumer; 2× map compute beats spilling the whole
    corpus through the object store). The tiny (n_langs × len(qs))
    threshold table broadcasts back into a vectorized searchsorted
    pass; the corpus itself never shuffles. Docs with a null score OR
    null ``lang_col`` get a null bucket (no group to rank in)."""
    import pyarrow.compute as pc
    import ray

    from .relational import grouped_quantiles

    scored = score_char_lm(ds, model, text_col=text_col,
                           out_col=score_col)
    gcol = lang_col or "__all"
    if lang_col:
        # null-lang rows have no group to rank in (they get a null
        # bucket below); the grouped aggregate is null-key-hostile
        def drop_null_lang(b: pa.Table) -> pa.Table:
            la = b.column(lang_col)
            if isinstance(la, pa.ChunkedArray):
                la = la.combine_chunks()
            return b.filter(pc.is_valid(la)) if la.null_count else b
        q_in = scored.map_batches(drop_null_lang,
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
    else:
        q_in = scored.map_batches(
            lambda b: b.append_column("__all", pa.array(
                np.zeros(len(b), np.int8))),
            batch_format="pyarrow", zero_copy_batch=True)
    th = grouped_quantiles(q_in, group_col=gcol, col=score_col,
                           qs=tuple(qs)).to_pandas()  # n_langs×len(qs)
    cuts = {g: np.sort(sub["value"].to_numpy())
            for g, sub in th.groupby(gcol)}
    labels = ["tail"] + ["middle"] * (len(tuple(qs)) - 1) + ["head"]
    ref = ray.put(cuts)

    class _Bucket:
        def __init__(self):
            self.cuts = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            s = batch.column(score_col)
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            sv = s.to_numpy(zero_copy_only=False)
            idx = np.zeros(len(batch), np.int64)
            if lang_col is None:
                cut = self.cuts.get(0, np.zeros(0))
                idx = np.searchsorted(cut, np.nan_to_num(sv, nan=0.0),
                                      side="right")
            else:
                # per DISTINCT lang, not per row: one vectorized
                # equal + searchsorted per group in the batch
                la = batch.column(lang_col)
                if isinstance(la, pa.ChunkedArray):
                    la = la.combine_chunks()
                codes = la.dictionary_encode()
                cv = codes.indices.to_numpy(zero_copy_only=False)
                for ci, g in enumerate(codes.dictionary.to_pylist()):
                    cut = self.cuts.get(g, np.zeros(0))
                    m = cv == ci
                    idx[m] = np.searchsorted(
                        cut, np.nan_to_num(sv[m], nan=0.0),
                        side="right")
            lab = pa.array(labels, pa.string()).take(
                pa.array(idx.astype(np.int32)))
            ok = pc.is_valid(s)
            if lang_col is not None:
                la2 = batch.column(lang_col)
                if isinstance(la2, pa.ChunkedArray):
                    la2 = la2.combine_chunks()
                ok = pc.and_(ok, pc.is_valid(la2))
            lab = pc.if_else(ok, lab, pa.scalar(None, pa.string()))
            return batch.append_column(out_col, lab)

    return scored.map_batches(_Bucket, batch_format="pyarrow",
                              zero_copy_batch=True, concurrency=(1, 8))
