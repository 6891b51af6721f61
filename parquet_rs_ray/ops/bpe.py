"""Distributed byte-level BPE tokenizer: train + count + encode.

Training-data pipelines budget, pack and sample by TOKENS, not bytes —
ops/textstats.py approximates token counts with a regex; this module is
the real thing: a byte-level Byte-Pair-Encoding tokenizer (Sennrich
2016; the GPT-2 tokenizer family) trained ON the corpus, then applied
to count or encode every document. Both halves are engine-shaped:

* `train_bpe` — classic BPE trains on the WORD-FREQUENCY table, never
  the raw corpus: one map_batches pass emits per-batch (word, count)
  partials (the batch's token explosion collapses to its distinct
  words before anything leaves the task), then ONE groupby-sum shuffle
  of those tiny pairs; the driver runs the merge loop over the bounded
  word-freq table with a lazy-deletion heap (O(log P) per count
  touch, no full rescan per merge). The corpus text never shuffles.
  `prune_min_count` / `max_words` bound the driver table on open-web
  vocabularies — standard BPE practice, but a true approximation:
  pair mass sums ACROSS words, so a pair spread over many pruned
  hapaxes loses that aggregate mass and the merge table can differ
  from unpruned training.
* `tokenize_bpe` — the merge table rides `ray.put` once; each actor
  folds it into a rank dict plus a word→ids cache that PERSISTS across
  batches (web text's distinct-word working set is tiny relative to
  its token count). Per batch the only Python loop is over the batch's
  UNIQUE UNCACHED words; every per-occurrence / per-document step is a
  vectorized gather (dictionary_encode indices, bincount segment sums,
  repeat/arange flat-slice gather for id lists). No shuffle.

Word split is the SQL-reproducible literal-space split shared with
ops/textstats.py (`_split_words`); within a word, symbols start as the
utf-8 BYTES plus an end-of-word sentinel (id 256), merges mint ids
257, 258, … in training order, so any byte string tokenizes with zero
OOV and `decode_token_bytes` inverts every id exactly.

Determinism (required for partition-invariant training and the pytest
parity oracle): merge selection is max pair count, ties broken by the
SMALLEST (left, right) id pair — a pure function of the word-frequency
table, which groupby-sum makes independent of batch boundaries.

Apply-side note: encoding merges the LOWEST-RANK adjacent pair first
(GPT-2 style); this is equivalent to replaying merges in training
order (the reference implementation in tests/test_bpe.py replays and
asserts equality).

Reference anchor: no counterpart in parquet-rs (pure storage); this is
the training-data operator family (SURVEY §2 additions) next to the
n-gram LM in ops/lm.py — same partials→groupby-sum→broadcast shape,
with the merge loop replacing the smoothing fold.
"""

from __future__ import annotations

import heapq
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["train_bpe", "tokenize_bpe", "decode_token_bytes"]

EOW = 256               # end-of-word sentinel symbol
_FIRST_MERGE_ID = 257   # merge m mints id _FIRST_MERGE_ID + m


def _word_count_partial(batch: pa.Table, text_col: str) -> pa.Table:
    """Per-batch (word, cnt) partial — the token explosion collapses
    to the batch's distinct words before leaving the task."""
    from .textstats import _split_words

    flat, _, _ = _split_words(batch.column(text_col))
    if len(flat) == 0:
        return pa.table({"word": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    vc = flat.value_counts()
    return pa.table({"word": vc.field("values"),
                     "cnt": vc.field("counts").cast(pa.int64())})


def _merge_word(w: tuple, a: int, b: int, nid: int) -> tuple:
    out = []
    i, n = 0, len(w)
    while i < n:
        if w[i] == a and i + 1 < n and w[i + 1] == b:
            out.append(nid)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return tuple(out)


def _bpe_merge_loop(words: list[tuple], freqs: np.ndarray,
                    num_merges: int) -> list[tuple[int, int]]:
    """Driver-side merge loop over the (bounded) word-frequency table.

    Lazy-deletion heap keyed (-count, pair): the pop order IS the
    selection rule — max count, ties to the smallest (left, right)
    pair — and stale entries (count changed since push) are skipped by
    comparing against the live count dict. Each merge touches only the
    words that contain the pair (pair→word index), so total work is
    proportional to actual rewrites, not merges × vocabulary."""
    pair_counts: dict[tuple[int, int], int] = defaultdict(int)
    pair_words: dict[tuple[int, int], set[int]] = defaultdict(set)
    for wi, w in enumerate(words):
        f = int(freqs[wi])
        for p in zip(w, w[1:]):
            pair_counts[p] += f
            pair_words[p].add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, int]] = []

    def _touch(p: tuple[int, int], delta: int, wi: int) -> None:
        c = pair_counts[p] + delta
        if c > 0:
            pair_counts[p] = c
            if delta > 0:
                pair_words[p].add(wi)
            # push on EVERY count change (stale entries are skipped at
            # pop by the exact-count check): a decrement-only pair must
            # re-enter the heap at its new count, or it could never be
            # selected again once its stale larger entry pops
            heapq.heappush(heap, (-c, p))
        else:
            pair_counts.pop(p, None)
            pair_words.pop(p, None)

    while len(merges) < num_merges:
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:
                best = p
                break
        if best is None:
            break                       # corpus exhausted: no pairs left
        a, b = best
        nid = _FIRST_MERGE_ID + len(merges)
        merges.append(best)
        touched = sorted(pair_words.pop(best, ()))
        pair_counts.pop(best, None)
        for wi in touched:
            old = words[wi]
            new = _merge_word(old, a, b, nid)
            if new == old:
                continue
            f = int(freqs[wi])
            for p in zip(old, old[1:]):
                if p != best:
                    _touch(p, -f, wi)
                elif pair_words.get(p) is not None:
                    pair_words[p].discard(wi)
            for p in zip(new, new[1:]):
                _touch(p, f, wi)
            words[wi] = new
    return merges


def train_bpe(ds, *, num_merges: int = 256, text_col: str = "text",
              prune_min_count: int = 1,
              max_words: int | None = None) -> dict:
    """Train byte-level BPE on `ds` and return the model as a plain
    dict: ``merges`` (num_merges × 2 int32 — the symbol pair merged at
    each rank), ``n_merges``, ``vocab_size`` (257 + merges: 256 bytes,
    EOW, one id per merge), ``n_words_distinct`` and ``total_words``
    (pre-prune, for reporting).

    Distribution shape: per-batch (word, count) partials → ONE
    groupby-sum of tiny pairs → bounded driver table → heap merge
    loop. ``prune_min_count``/``max_words`` cap the driver table on
    open-web long tails (count ties inside the cap break by word, so
    the cap is deterministic too)."""
    if num_merges < 0:
        raise ValueError("num_merges must be >= 0")
    agg = ds.map_batches(
        lambda b: _word_count_partial(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("word").sum("cnt")
    tbl = agg.to_pandas()       # bounded: ≤ distinct corpus words
    if "word" not in tbl.columns:   # zero-word corpus: the empty
        tbl = tbl.reindex(columns=["word", "sum(cnt)"])  # agg loses
        tbl = tbl.iloc[0:0]                              # its schema
    wtext = tbl["word"].to_numpy()
    counts = tbl["sum(cnt)"].to_numpy().astype(np.int64)
    n_distinct = len(wtext)
    total_words = int(counts.sum()) if n_distinct else 0
    if prune_min_count > 1:
        kept = counts >= prune_min_count
        wtext, counts = wtext[kept], counts[kept]
    if max_words is not None and len(wtext) > max_words:
        # top-k by count, ties by word — deterministic cap
        order = np.lexsort((wtext, -counts))[:max_words]
        wtext, counts = wtext[order], counts[order]
    # canonical order so the merge loop sees a partition-invariant
    # table regardless of groupby output order
    order = np.argsort(wtext, kind="stable")
    wtext, counts = wtext[order], counts[order]
    words = [tuple(str(w).encode("utf-8")) + (EOW,) for w in wtext]
    merges = _bpe_merge_loop(words, counts, num_merges)
    marr = (np.asarray(merges, np.int32).reshape(-1, 2)
            if merges else np.empty((0, 2), np.int32))
    return {"merges": marr, "n_merges": len(merges),
            "vocab_size": _FIRST_MERGE_ID + len(merges),
            "n_words_distinct": int(n_distinct),
            "total_words": total_words}


def decode_token_bytes(model: dict) -> list[bytes]:
    """token id → raw bytes (EOW expands to b"") for every id in the
    vocabulary; inverts tokenize_bpe exactly: joining a word's token
    bytes reproduces the word."""
    out = [bytes([i]) for i in range(256)] + [b""]
    for a, b in model["merges"]:
        out.append(out[int(a)] + out[int(b)])
    return out


def _encode_word(word: bytes, ranks: dict[tuple[int, int], int]) -> np.ndarray:
    """Greedy lowest-rank-first merge of one word (GPT-2 apply order —
    equivalent to replaying merges in training order)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [_FIRST_MERGE_ID + best_rank]
    return np.asarray(sym, np.int32)


def tokenize_bpe(ds, model: dict, *, text_col: str = "text",
                 count_col: str = "n_tokens_bpe",
                 ids_col: str | None = None):
    """Append ``count_col`` = BPE token count per document (null text
    counts 0, matching `_split_words`' empty-list semantics), and —
    when ``ids_col`` is given — the full token id sequence as
    ``list<int32>`` (per-word ids concatenated in document order).

    The merge table broadcasts once (`ray.put`); each actor builds the
    rank dict in ``__init__`` and keeps a word→ids cache across
    batches. Per batch: dictionary_encode the flat word list, encode
    only UNIQUE UNCACHED words in Python (words are short; the cache
    absorbs the working set), then vectorized gathers/segment-sums for
    per-occurrence lengths, per-doc counts and the flat id stream."""
    import ray

    from .textstats import _split_words

    mref = ray.put(model["merges"])

    class _Tokenizer:
        def __init__(self):
            merges = ray.get(mref)
            self.ranks = {(int(a), int(b)): r
                          for r, (a, b) in enumerate(merges)}
            self.cache: dict[bytes, np.ndarray] = {}

        def __call__(self, batch: pa.Table) -> pa.Table:
            n_docs = len(batch)
            flat, _, doc_idx = _split_words(batch.column(text_col))
            if len(flat) == 0:
                zero = pa.array(np.zeros(n_docs, np.int64))
                out = batch.append_column(count_col, zero)
                if ids_col is not None:
                    off = pa.array(np.zeros(n_docs + 1, np.int32))
                    out = out.append_column(ids_col, pa.ListArray.from_arrays(
                        off, pa.array([], pa.int32())))
                return out
            enc = flat.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            uwords = enc.dictionary
            idx = enc.indices.to_numpy(zero_copy_only=False)
            uids = []
            for w in uwords.to_pylist():
                wb = w.encode("utf-8")
                ids = self.cache.get(wb)
                if ids is None:
                    ids = _encode_word(wb, self.ranks)
                    self.cache[wb] = ids
                uids.append(ids)
            ulen = np.array([len(u) for u in uids], np.int64)
            occ_len = ulen[idx]
            n_tok = np.bincount(doc_idx, weights=occ_len,
                                minlength=n_docs).astype(np.int64)
            out = batch.append_column(count_col, pa.array(n_tok))
            if ids_col is not None:
                from .kernels import ragged_positions
                uflat = (np.concatenate(uids) if uids
                         else np.empty(0, np.int32))
                ustart = np.concatenate(([0], np.cumsum(ulen)))[:-1]
                # vectorized ragged gather: for each occurrence, the
                # slice uflat[ustart[idx] : ustart[idx]+ulen[idx]]
                pos = ragged_positions(ustart[idx], occ_len)
                flat_ids = (uflat[pos] if len(pos)
                            else np.empty(0, np.int32))
                offsets = np.concatenate(
                    ([0], np.cumsum(n_tok))).astype(np.int64)
                lst = pa.LargeListArray.from_arrays(
                    pa.array(offsets, pa.int64()),
                    pa.array(flat_ids, pa.int32()))
                out = out.append_column(ids_col, lst.cast(
                    pa.list_(pa.int32())))
            return out

    return ds.map_batches(_Tokenizer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))
