"""Text analysis operators (vectorized map_batches stages):

* token_count     — whitespace tokens + a BPE-ish word/punct regex count
* quality_score   — length / punctuation / stopword-ratio heuristics
* language_id     — character n-gram profile heuristic
* fingerprint     — rolling-hash document fingerprint (64-bit)
* top_terms       — top-k words per group (map-side combine)
* word_df_stats   — global word document-frequency → per-doc rarity
                    signals (two-pass aggregate-broadcast / join)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_BPE_RE = re.compile(r"\w+|[^\w\s]")

_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "a", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "une", "du"},
    "es": {"el", "la", "de", "y", "los", "en", "un", "una", "que", "del"},
}


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """whitespace-token and regex-token counts per document.

    The whitespace count is defined as count(' ') + 1 so a SQL oracle can
    reproduce it exactly (LENGTH(x) - LENGTH(REPLACE(x,' ','')) + 1)."""
    txt = batch.column(text_col)
    n_ws = pc.add(pc.count_substring(txt, " "), 1)
    n_bpe = pc.count_substring_regex(txt, r"\w+|[^\w\s]").cast(pa.int64())
    if isinstance(n_bpe, pa.ChunkedArray):
        n_bpe = n_bpe.combine_chunks()
    out = pa.table({
        "n_tokens_ws": n_ws.combine_chunks() if isinstance(n_ws, pa.ChunkedArray) else n_ws,
        "n_tokens_re": n_bpe,
    })
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name))
    return out


def _split_words(txt: pa.ChunkedArray | pa.Array):
    """Space-delimited word-split as a list array + flat helpers:
    (flat lowercase words, per-doc word counts, doc index per word)."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    # literal single-space split (not Unicode whitespace): SQL can
    # reproduce it exactly — list_filter(string_split(text, ' '), ...)
    words = pc.split_pattern(txt, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    # drop empties (str.split semantics: leading/trailing runs)
    nonempty = pc.not_equal(flat, "")
    doc_idx = np.repeat(np.arange(len(txt), dtype=np.int64), counts)
    ne = nonempty.to_numpy(zero_copy_only=False)
    if not ne.all():
        flat = flat.filter(nonempty)
        doc_idx = doc_idx[ne]
        counts = np.bincount(doc_idx, minlength=len(txt)).astype(np.int64)
    return flat, counts, doc_idx


class QualityScorer:
    """Stateful scorer: stopword value-set + Arrow kernels per actor.
    Fully vectorized — literal-space split_pattern (see _split_words:
    SQL-reproducible tokenization) / count_substring_regex /
    is_in + np.add.reduceat; no Python loop over documents. (re2's \\w
    is ASCII; equivalent to Python's on the ASCII web corpus.)"""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.all_stop = pa.array(
            sorted(set().union(*_STOPWORDS.values())), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        n = len(batch)
        length = pc.utf8_length(txt).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        flat, counts, doc_idx = _split_words(txt)
        n_words = counts.astype(np.float64)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sums = np.bincount(doc_idx, weights=wl, minlength=n)
        mean_wl = np.divide(sums, n_words, out=np.zeros(n),
                            where=n_words > 0)
        punct = pc.count_substring_regex(txt, r"[^\w\s]") \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        is_stop = pc.is_in(pc.utf8_lower(flat),
                           value_set=self.all_stop) \
            .to_numpy(zero_copy_only=False)
        stops = np.bincount(doc_idx, weights=is_stop.astype(np.float64),
                            minlength=n)
        stop_ratio = np.divide(stops, n_words, out=np.zeros(n),
                               where=n_words > 0)
        # heuristic quality in [0,1]: plausible word lengths, some
        # stopwords, not punctuation-dominated, not too short
        score = (np.clip(n_words / 50.0, 0, 1) * 0.3
                 + np.clip(1 - np.abs(mean_wl - 5.0) / 5.0, 0, 1) * 0.3
                 + np.clip(stop_ratio * 4, 0, 1) * 0.2
                 + np.clip(1 - punct / np.maximum(length, 1) * 5, 0, 1) * 0.2)
        # null text: the NaN from utf8_length must surface as a NULL
        # score (token_counts' convention), not poison downstream means
        out = pa.table({"quality_score": pa.array(
            np.round(score, 6), from_pandas=True)})
        for name in batch.column_names:
            if name != self.text_col:
                out = out.append_column(name, batch.column(name))
        return out


class LanguageId:
    """Character n-gram profile language guesser (tiny, deterministic).
    Profiles are built once per actor from stopword seeds — a stand-in for
    a real fasttext model (not in this container); the Ray-side plumbing
    (stateful actor stage, batch scoring) is the real thing."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {lang: pa.array(sorted(ws), pa.string())
                         for lang, ws in _STOPWORDS.items()}
        self.lang_names = list(self.profiles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .dedup import _hash_strings
        n = len(batch)
        flat, counts, doc_idx = _split_words(batch.column(self.text_col))
        # first ≤200 words per doc (profile window), lowercased
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts, out=starts[1:])
        within = np.arange(len(flat), dtype=np.int64) - starts[doc_idx]
        window = within < 200
        flat = flat.filter(pa.array(window))
        doc_idx = doc_idx[window]
        lower = pc.utf8_lower(flat)
        wh = _hash_strings(lower) if len(lower) else np.empty(0, np.uint64)
        hits = np.zeros((len(self.lang_names), n), dtype=np.int64)
        for li, lang in enumerate(self.lang_names):
            m = pc.is_in(lower, value_set=self.profiles[lang]) \
                .to_numpy(zero_copy_only=False)
            if not m.any():
                continue
            # DISTINCT matched words per doc (set-∩ semantics): unique
            # (doc, word-hash) pairs via lexsort
            d, h = doc_idx[m], wh[m]
            order = np.lexsort((h, d))
            d, h = d[order], h[order]
            first = np.concatenate(
                ([True], (d[1:] != d[:-1]) | (h[1:] != h[:-1])))
            hits[li] = np.bincount(d[first], minlength=n)
        best = np.argmax(hits, axis=0)        # ties → first lang, as before
        best_n = hits[best, np.arange(n)]
        langs = np.array(self.lang_names, dtype=object)[best]
        langs[best_n == 0] = "unknown"
        out = pa.table({"lang_pred": pa.array(langs, pa.string())})
        for name in batch.column_names:
            if name != self.text_col:
                out = out.append_column(name, batch.column(name))
        return out


def fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling-hash fingerprint per document (content-defined)."""
    from .dedup import _hash_strings
    h = _hash_strings(batch.column(text_col))
    out = pa.table({"fingerprint": pa.array(h.astype(np.int64))})
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name))
    return out


def top_terms(ds, *, text_col: str = "text", group_col: str = "lang",
              k: int = 10, num_partitions: int | None = None):
    """Top-k most frequent space-delimited words per group (≙ SQL unnest +
    GROUP BY + QUALIFY row_number).

    Scale shape: the word explosion never leaves the map task — each
    batch combines to (group, word, cnt) partials with Arrow's C++
    TableGroupBy, so the shuffle carries one row per distinct (group,
    word) per block, not one per token. Partials co-locate by hash of
    the WORD (the high-cardinality key; every (group, word) cell lands
    whole), merge with one vectorized group-by per partition, and the
    final per-group top-k reuses `relational.grouped_topk` (ties broken
    by word for determinism)."""
    from .relational import grouped_topk
    from .temporal import _default_partitions, _key_part
    P = num_partitions or _default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, doc_idx = _split_words(batch.column(text_col))
        grp = batch.column(group_col)
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        from .relational import _grouped_cnt
        return _grouped_cnt(
            pa.table({group_col: grp.take(pa.array(doc_idx)),
                      "word": flat}), [group_col, "word"], "count")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("word"), P))

    def merge(group: pa.Table) -> pa.Table:
        from .relational import _grouped_cnt
        return _grouped_cnt(group.drop_columns(["__part"]),
                            [group_col, "word"], "sum")

    merged = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True) \
        .groupby("__part").map_groups(merge, batch_format="pyarrow")
    return grouped_topk(merged, group_col=group_col, order_col="cnt",
                        k=k, tiebreak_col="word",
                        num_partitions=num_partitions)


def word_document_frequency(ds, *, text_col: str = "text",
                            num_partitions: int | None = None):
    """(word, df) over the corpus: df = number of documents containing
    the word at least once. Same scale shape as `top_terms`: per batch,
    DISTINCT words per doc (one dictionary_encode + lexsort) combine to
    (word, partial-doc-count) rows — the token explosion never leaves
    the map task — then one vectorized merge per word-hash partition."""
    from .temporal import _default_partitions, _key_part
    from .relational import _grouped_cnt
    P = num_partitions or _default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, doc_idx = _split_words(batch.column(text_col))
        if not len(flat):
            return pa.table({"word": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        codes = flat.dictionary_encode()
        c = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, doc_idx))
        d, cs = doc_idx[order], c[order]
        first = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (cs[1:] != cs[:-1])))
        distinct = flat.take(pa.array(order[first]))
        return _grouped_cnt(pa.table({"word": distinct}), ["word"],
                            "count")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("word"), P))

    def merge(group: pa.Table) -> pa.Table:
        out = _grouped_cnt(group.drop_columns(["__part"]), ["word"],
                           "sum")
        return out.rename_columns(
            [n if n != "cnt" else "df" for n in out.column_names])

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("__part").map_groups(merge, batch_format="pyarrow")


class _DfScorer:
    """Stateful stage: the broadcast (sorted words, df) table is read
    from the object store ONCE per actor in __init__, not per batch."""

    def __init__(self, df_ref, text_col: str):
        import ray
        self.text_col = text_col
        words, dfs = ray.get(df_ref)
        self.words = words          # sorted pa.StringArray
        self.dfs = dfs              # aligned np.int64

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        flat, counts, doc_idx = _split_words(batch.column(self.text_col))
        n_words = counts.astype(np.int64)
        sum_df = np.zeros(n, np.int64)
        min_df = np.zeros(n, np.int64)
        if len(flat):
            # vocabulary lookup: one searchsorted over the sorted
            # broadcast table (every corpus word is present by
            # construction — the table was built from this corpus)
            import pyarrow.compute as _pc
            pos = _pc.index_in(flat, value_set=self.words) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            w_df = self.dfs[pos]
            starts = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(n_words, out=starts[1:])
            nz = n_words > 0
            seg = starts[:-1][nz]
            sum_df[nz] = np.add.reduceat(w_df, seg)
            min_df[nz] = np.minimum.reduceat(w_df, seg)
        out = pa.table({
            "n_words": pa.array(n_words),
            "sum_df": pa.array(sum_df),
            "min_df": pa.array(min_df),
        })
        for name in batch.column_names:
            if name != self.text_col:
                out = out.append_column(name, batch.column(name))
        return out


def word_df_stats(ds, *, text_col: str = "text",
                  num_partitions: int | None = None, concurrency=2,
                  mode: str = "auto", id_col: str = "doc_id",
                  broadcast_budget_bytes: int | None = None):
    """Per-document rarity signals from global word document-frequency:
    ``n_words`` (with repeats), ``sum_df`` (Σ df of each word token)
    and ``min_df`` (the rarest word's df — the OOV/garbage detector;
    all exact int64, so the SQL oracle compares bit-identical).

    ``mode="auto"`` (default) probes the (word, df) vocabulary against
    the broadcast budget (ops/regime.py) and picks the regime; the
    probe materializes an aggregate both regimes consume, so it is
    ~free.

    ``mode="broadcast"``, the two-pass aggregate-broadcast-
    join shape: pass 1 is the distributed `word_document_frequency`
    (map-side combine, shuffles one row per distinct word per block);
    its (word, df) result — VOCABULARY-sized, not corpus-sized —
    broadcasts once via `ray.put` and pass 2 streams the corpus through
    a stateful lookup stage (no second shuffle). Right while the
    vocabulary fits worker heaps (web-scale ~10^8 words ≈ a few GB).

    ``mode="join"``: beyond-heap vocabularies — fully distributed
    (`_word_df_stats_join`); requires ``id_col`` to be a unique row
    key; output row order follows the joins.

    ``mode="auto"``: materialize the (word, df) vocabulary and pick
    broadcast iff it fits ``broadcast_budget_bytes`` (ops/regime.py).
    The probe is free when broadcast wins (the vocabulary is reused);
    when join wins the aggregation pass is discarded (join fuses its
    own df counting) — pass ``mode="join"`` directly for vocabularies
    you already know are beyond-heap."""
    import ray

    if mode == "join":
        return _word_df_stats_join(ds, text_col=text_col, id_col=id_col,
                                   num_partitions=num_partitions)
    if mode not in ("broadcast", "auto"):
        raise ValueError(f"unknown word_df_stats mode {mode!r}")

    df_tbl = word_document_frequency(
        ds, text_col=text_col, num_partitions=num_partitions)
    if mode == "auto":
        from .regime import pick_regime
        mode, df_tbl = pick_regime(df_tbl, broadcast_budget_bytes)
        if mode == "join":
            return _word_df_stats_join(ds, text_col=text_col,
                                       id_col=id_col,
                                       num_partitions=num_partitions)
    parts = []
    for b in df_tbl.iter_batches(batch_format="pyarrow"):
        parts.append(b)
    merged = pa.concat_tables(parts) if parts else \
        pa.table({"word": pa.array([], pa.string()),
                  "df": pa.array([], pa.int64())})
    words = merged.column("word").combine_chunks()
    dfs = merged.column("df").to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    ref = ray.put((words, dfs))
    return ds.map_batches(
        _DfScorer, fn_constructor_kwargs={"df_ref": ref,
                                          "text_col": text_col},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def _word_df_stats_join(ds, *, text_col: str, id_col: str,
                        num_partitions: int | None):
    """Join-mode `word_df_stats`: vocabulary beyond worker heaps (no
    broadcast, nothing on the driver). Same fused shape as
    `clean.line_dedup(mode="join")`:

      explode to DISTINCT (id, word, in-doc count) rows (one lexsort
      per batch — the token explosion never shuffles, the distinct
      rows do) → ONE groupby on the word hash computes df per word AND
      folds per-doc partials (Σ cnt·df, min df, Σ cnt) in the same
      vectorized pass → ONE groupby on the id hash merges partials →
      LEFT-join back onto the input (wordless docs fill 0, matching
      broadcast mode). All sums ride int64 `np.add.at` — bit-identical
      to the broadcast scorer at any scale."""
    from .dedup import _id_type, _join_partitions
    from .temporal import _key_part

    P = _join_partitions(num_partitions)
    id_type = _id_type(ds, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        flat, _, doc_idx = _split_words(batch.column(text_col))
        if not len(flat):
            return pa.table({
                "__id": batch.column(id_col).slice(0, 0),
                "word": pa.array([], pa.string()),
                "__cnt": pa.array([], pa.int64()),
                "__wpart": pa.array([], pa.int32())})
        codes = flat.dictionary_encode()
        c = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((c, doc_idx))
        d, cs = doc_idx[order], c[order]
        first = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (cs[1:] != cs[:-1])))
        starts = np.flatnonzero(first)
        run_len = np.diff(np.append(starts, len(d)))
        words = flat.take(pa.array(order[first]))
        out = pa.table({
            "__id": batch.column(id_col).take(pa.array(d[first])),
            "word": words,
            "__cnt": pa.array(run_len.astype(np.int64)),
        })
        return out.append_column("__wpart",
                                 _key_part(out.column("word"), P))

    def score_part(group: pa.Table) -> pa.Table:
        # one word-hash partition holds EVERY (id, word) row of its
        # words: df = rows per word; per-doc partials fold here so the
        # id shuffle moves one row per (doc, partition), not per token
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             "__sum": pa.array([], pa.int64()),
                             "__min": pa.array([], pa.int64()),
                             "__nw": pa.array([], pa.int64())})
        wcodes = group.column("word").combine_chunks().dictionary_encode()
        wc = wcodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        df = np.bincount(wc).astype(np.int64)
        cnt = group.column("__cnt").to_numpy(zero_copy_only=False)
        icodes = group.column("__id").combine_chunks().dictionary_encode()
        ic = icodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_ids = int(ic.max()) + 1
        s = np.zeros(n_ids, np.int64)
        np.add.at(s, ic, cnt * df[wc])
        mn = np.full(n_ids, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, ic, df[wc])
        nw = np.zeros(n_ids, np.int64)
        np.add.at(nw, ic, cnt)
        return pa.table({"__id": icodes.dictionary,
                         "__sum": pa.array(s), "__min": pa.array(mn),
                         "__nw": pa.array(nw)})

    def add_ipart(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("__id"), P))

    def merge_doc(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             "n_words": pa.array([], pa.int64()),
                             "sum_df": pa.array([], pa.int64()),
                             "min_df": pa.array([], pa.int64())})
        icodes = group.column("__id").combine_chunks().dictionary_encode()
        ic = icodes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n_ids = int(ic.max()) + 1
        s = np.zeros(n_ids, np.int64)
        np.add.at(s, ic, group.column("__sum").to_numpy(zero_copy_only=False))
        mn = np.full(n_ids, np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, ic, group.column("__min").to_numpy(zero_copy_only=False))
        nw = np.zeros(n_ids, np.int64)
        np.add.at(nw, ic, group.column("__nw").to_numpy(zero_copy_only=False))
        return pa.table({"__id": icodes.dictionary,
                         "n_words": pa.array(nw),
                         "sum_df": pa.array(s),
                         "min_df": pa.array(mn)})

    agg = ds.map_batches(explode, batch_format="pyarrow",
                         zero_copy_batch=True) \
        .groupby("__wpart").map_groups(score_part, batch_format="pyarrow") \
        .map_batches(add_ipart, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("__part").map_groups(merge_doc, batch_format="pyarrow")

    out = ds.join(agg, "left_outer", P, on=(id_col,), right_on=("__id",))

    def fill(batch: pa.Table) -> pa.Table:
        # wordless docs never exploded: 0 words, 0 sums (= broadcast)
        for name in ("n_words", "sum_df", "min_df"):
            col = pc.fill_null(batch.column(name), 0)
            batch = batch.set_column(
                batch.column_names.index(name), name, col)
        return batch

    return out.map_batches(fill, batch_format="pyarrow",
                           zero_copy_batch=True)


def corpus_report(ds, *, text_col: str = "text", lang_col: str = "lang",
                  source_col: str = "source", q: float = 0.5):
    """Per-language corpus profile — the numbers a data team checks
    before curating: document count, null-text count, distinct source
    count, the exact ``q``-quantile of document UTF-8 byte length, and
    total text bytes. SQL-expressible end to end; pytest pins DuckDB
    parity and the registry carries the same oracle.

    Distribution shape: three fully distributed aggregates over
    projected columns — (1) per-batch vectorized combine
    (dictionary_encode + bincount) → one tiny (lang, docs, nulls,
    bytes) groupby-sum; (2) map-side distinct (lang, source) pairs →
    one pair groupby → per-lang count; (3) exact byte-length quantile
    via `grouped_quantiles` (only histogram partials shuffle). The
    merged report is n_langs rows — bounded — so the final join runs
    driver-side."""
    import pandas as pd

    from .relational import grouped_quantiles

    # SQL GROUP BY lang emits a NULL-lang group; Ray/arrow groupby and
    # bincount machinery is null-key-hostile, so null langs ride a
    # sentinel ("\x00" cannot occur in a real lang code) and turn back
    # into null in the final report
    _NULL = "\x00"

    def _langs(batch: pa.Table) -> pa.Array:
        langs = batch.column(lang_col)
        if isinstance(langs, pa.ChunkedArray):
            langs = langs.combine_chunks()
        if langs.null_count:
            langs = langs.fill_null(_NULL)
        return langs

    def counts_partial(batch: pa.Table) -> pa.Table:
        langs = _langs(batch)
        txt = batch.column(text_col)
        blen = pc.binary_length(txt).cast(pa.int64())
        codes = langs.dictionary_encode()
        c = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(codes.dictionary)
        nulls = pc.is_null(txt).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        byts = blen.fill_null(0).to_numpy(zero_copy_only=False)
        return pa.table({
            lang_col: codes.dictionary,
            "n_docs": np.bincount(c, minlength=k).astype(np.int64),
            "n_null_text": np.bincount(c, weights=nulls,
                                       minlength=k).astype(np.int64),
            "total_bytes": np.bincount(c, weights=byts,
                                       minlength=k).astype(np.int64)})

    counts = ds.map_batches(counts_partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(lang_col).sum(["n_docs", "n_null_text", "total_bytes"]) \
        .map_batches(lambda b: b.rename_columns(
            [lang_col, "n_docs", "n_null_text", "total_bytes"]),
            batch_format="pyarrow").to_pandas()

    def pair_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({lang_col: _langs(batch),
                      source_col: batch.column(source_col)})
        # COUNT(DISTINCT source) excludes NULL sources
        src_col = t.column(source_col)
        if isinstance(src_col, pa.ChunkedArray):
            src_col = src_col.combine_chunks()
        if src_col.null_count:
            t = t.filter(pc.is_valid(src_col))
        return t.group_by([lang_col, source_col]).aggregate([])

    sources = ds.map_batches(pair_partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby(source_col).map_groups(
            lambda g: g.group_by([lang_col, source_col]).aggregate([]),
            batch_format="pyarrow") \
        .map_batches(lambda b: pa.table(
            {lang_col: b.column(lang_col),
             "n_sources": np.ones(len(b), np.int64)}),
            batch_format="pyarrow") \
        .groupby(lang_col).sum("n_sources") \
        .map_batches(lambda b: b.rename_columns([lang_col, "n_sources"]),
                     batch_format="pyarrow").to_pandas()

    def blen_col(batch: pa.Table) -> pa.Table:
        return pa.table({
            lang_col: _langs(batch),
            "__blen": pc.binary_length(
                batch.column(text_col)).cast(pa.int64())})

    quant = grouped_quantiles(
        ds.map_batches(blen_col, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_col=lang_col, col="__blen", qs=(q,)).to_pandas() \
        .rename(columns={"value": f"p{int(q * 100)}_bytes"}) \
        .drop(columns=["q"])

    rep = counts.merge(sources, on=lang_col, how="left") \
        .merge(quant, on=lang_col, how="left") \
        .sort_values(lang_col).reset_index(drop=True)
    rep["n_sources"] = rep["n_sources"].fillna(0).astype(np.int64)
    # .replace({x: None}) would trigger pandas' method-fill quirk
    rep[lang_col] = rep[lang_col].mask(rep[lang_col] == _NULL, None)
    return pa.Table.from_pandas(rep, preserve_index=False)
