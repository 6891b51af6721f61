"""Corpus-cleaning operators (vectorized map_batches stages):

* redact            — regex PII scrubbing (emails / IPs / phones or
                      caller rules) via RE2 `pc.replace_substring_regex`
* repetition_stats  — Gopher-style repetition signals per document
                      (distinct-word / top-word / duplicate-bigram
                      counts) for repetition-based quality filtering
* chunk_words       — split every document into fixed-size word windows
                      (context-length chunking for training pipelines)

All three are per-row/per-batch transforms: zero shuffle, stream at
full read bandwidth, and scale linearly with cluster size. Word
tokenization is the literal-single-space split shared with
``ops/textstats._split_words`` so every operator here is reproducible
by an ANSI-SQL oracle (``string_split(text, ' ')``); exactness is
pinned by the driver oracles and tests/test_clean.py.

Spec anchor: extensions beyond the reference engine's scope (the
reference has no text ops); the dedup/quality family in SURVEY.md §2
is the parity model.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .textstats import _split_words

#: default PII rules: (RE2 pattern, replacement). RE2 is the regex
#: engine on BOTH sides of the oracle (Arrow and DuckDB), so these
#: strings are portable verbatim into `regexp_replace(..., 'g')`.
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+?\b\d[\d -]{7,}\d\b", "[PHONE]"),
)


def redact(batch: pa.Table, text_col: str = "text",
           rules: tuple[tuple[str, str], ...] = PII_RULES,
           out_col: str | None = None) -> pa.Table:
    """Apply each (pattern, replacement) rule globally to ``text_col``.

    One RE2 pass over the batch per rule — no Python rows. RE2 compiles
    the pattern once per kernel invocation (per batch); with the usual
    ≥10k-row batches the compile is noise next to the scan, so this
    stays a plain function rather than an actor stage."""
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    for pat, repl in rules:
        txt = pc.replace_substring_regex(txt, pat, repl)
    name = out_col or text_col
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, txt)
    return batch.append_column(name, txt)


def repetition_stats(batch: pa.Table,
                     text_col: str = "text") -> pa.Table:
    """Per-document repetition signals (the Gopher repetition-filter
    family): word count, distinct-word count, most-frequent-word count
    and (distinct) word-bigram counts — all exact INTEGER counts so an
    SQL oracle compares bit-identical (fractions are one division away
    for the caller).

    Vectorized shape: one ``split_pattern`` pass, then
    ``dictionary_encode`` gives exact string identity as int codes (no
    hash-collision caveat), and every per-doc statistic falls out of a
    single lexsort over (doc, code) — run boundaries are distincts, run
    lengths feed ``np.maximum.at`` for the top word. Bigrams reuse the
    same machinery over packed 64-bit code pairs."""
    txt = batch.column(text_col)
    n = len(batch)
    flat, counts, doc_idx = _split_words(txt)
    n_words = counts.astype(np.int64)
    n_distinct = np.zeros(n, np.int64)
    top = np.zeros(n, np.int64)
    n_bigrams = np.zeros(n, np.int64)
    n_distinct_bg = np.zeros(n, np.int64)
    if len(flat):
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((codes, doc_idx))
        d, c = doc_idx[order], codes[order]
        newrun = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (c[1:] != c[:-1])))
        run_doc = d[newrun]
        n_distinct = np.bincount(run_doc, minlength=n).astype(np.int64)
        run_starts = np.flatnonzero(newrun)
        run_lens = np.diff(np.append(run_starts, len(d)))
        np.maximum.at(top, run_doc, run_lens)
        adj = doc_idx[:-1] == doc_idx[1:]
        if adj.any():
            bg = (codes[:-1][adj] << np.int64(32)) | codes[1:][adj]
            bgd = doc_idx[:-1][adj]
            n_bigrams = np.bincount(bgd, minlength=n).astype(np.int64)
            order2 = np.lexsort((bg, bgd))
            d2, b2 = bgd[order2], bg[order2]
            new2 = np.concatenate(
                ([True], (d2[1:] != d2[:-1]) | (b2[1:] != b2[:-1])))
            n_distinct_bg = np.bincount(
                d2[new2], minlength=n).astype(np.int64)
    out = pa.table({
        "n_words": pa.array(n_words),
        "n_distinct_words": pa.array(n_distinct),
        "top_word_count": pa.array(top),
        "n_bigrams": pa.array(n_bigrams),
        "n_distinct_bigrams": pa.array(n_distinct_bg),
    })
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name))
    return out


def chunk_words(batch: pa.Table, text_col: str = "text",
                size: int = 64, stride: int | None = None) -> pa.Table:
    """Explode every document into ``size``-word chunks (context-window
    chunking). Split keeps empty tokens so with the default
    non-overlapping stride ``' '.join(chunks)`` is byte-lossless w.r.t.
    the original text, and matches SQL ``string_split`` exactly.

    ``stride`` (default ``size``) sets the window step: ``stride <
    size`` yields overlapping sliding windows (the standard
    context-overlap chunking for training pipelines) — window k of a
    doc covers words ``[k·stride, k·stride+size)``, advancing until the
    doc is covered (the final window ends at the doc's last word; no
    trailing window that would only repeat already-covered words).

    Vectorized shape: chunk boundaries are offset arithmetic into the
    ONE flat word array. Non-overlapping chunks re-offset the split
    result zero-copy; overlapping windows gather their word ranges with
    one vectorized ``take`` (the output genuinely repeats words, so the
    copy is the payload, not overhead). Chunk text comes back from a
    single ``binary_join``. Output rows carry every non-text column
    (repeated per chunk), plus ``chunk_id``/``chunk_text``/``chunk_words``."""
    if size < 1:
        raise ValueError("size must be >= 1")
    if stride is None:
        stride = size
    if stride < 1 or stride > size:
        raise ValueError("stride must be in [1, size]")
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = len(batch)
    words = pc.split_pattern(txt, " ")          # keeps empties: lossless
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    if stride == size:
        n_chunks = np.maximum((counts + size - 1) // size, 1)
    else:
        n_chunks = np.maximum(
            (np.maximum(counts - size, 0) + stride - 1) // stride + 1, 1)
    # null text ⇒ ZERO chunks (matching SQL `unnest(string_split(NULL))`,
    # which emits no row) — without this mask the floor above would
    # fabricate one empty chunk and silently launder null into ''.
    # An empty NON-null text still yields one ''-chunk (split('', ' ')
    # is [''] on both sides), keeping the byte-lossless re-join property
    # for every non-null document.
    if txt.null_count:
        n_chunks[txt.is_null().to_numpy(zero_copy_only=False)] = 0
    total = int(n_chunks.sum())
    doc_of_chunk = np.repeat(np.arange(n, dtype=np.int64), n_chunks)
    first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_idx = np.arange(total, dtype=np.int64) - first[doc_of_chunk]
    doc_start = np.concatenate(([0], np.cumsum(counts)[:-1]))
    starts = doc_start[doc_of_chunk] + chunk_idx * stride
    doc_end = (doc_start + counts)[doc_of_chunk]
    if stride == size:
        offsets = np.append(starts, len(flat)).astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                           flat)
    else:
        ends = np.minimum(starts + size, doc_end)
        lens = ends - starts
        offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int64)
        # gather each window's word range: one vectorized take
        idx = (np.repeat(starts, lens)
               + (np.arange(int(lens.sum()), dtype=np.int64)
                  - np.repeat(offsets[:-1], lens)))
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat.take(pa.array(idx)))
    chunk_text = pc.binary_join(la, " ")
    out = pa.table({
        "chunk_id": pa.array(chunk_idx),
        "chunk_text": chunk_text,
        "chunk_words": pa.array(np.minimum(starts + size, doc_end)
                                - starts),
    })
    idx = pa.array(doc_of_chunk)
    for name in batch.column_names:
        if name != text_col:
            out = out.append_column(name, batch.column(name).take(idx))
    return out


def _split_lines(txt, sep: str = "\n"):
    """Separator split of a text column (default: lines): (flat
    segments, per-doc segment counts, doc index per segment). Null
    docs contribute zero segments."""
    if not sep:
        raise ValueError("sep must be a non-empty string")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    lines = pc.split_pattern(txt, sep)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    counts = pc.list_value_length(lines).fill_null(0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lines)
    doc_idx = np.repeat(np.arange(len(txt), dtype=np.int64), counts)
    return flat, counts, doc_idx


def line_frequency(ds, *, text_col: str = "text",
                   num_partitions: int | None = None,
                   sep: str = "\n"):
    """(line, cnt) occurrence counts over the corpus — the same
    map-side-combine → one groupby-sum shape as
    ``textstats.word_document_frequency``: each batch collapses to one
    row per DISTINCT line before anything shuffles."""
    from .relational import _grouped_cnt
    from .temporal import _default_partitions, _key_part
    P = num_partitions or _default_partitions()

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _split_lines(batch.column(text_col), sep)
        if not len(flat):
            return pa.table({"line": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return _grouped_cnt(pa.table({"line": flat}), ["line"], "count")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("line"), P))

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # schema-stable empty: Ray calls map_groups with an empty
            # table for empty hash partitions, and a schema-less result
            # breaks downstream joins on "line" (join-mode consumer)
            return pa.table({"line": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        return _grouped_cnt(group.drop_columns(["__part"]), ["line"],
                            "sum")

    return ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True) \
        .map_batches(add_part, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .groupby("__part").map_groups(merge, batch_format="pyarrow")


class _LineFilter:
    """Stateful pass-2 stage of ``line_dedup``: the broadcast
    frequent-line set is fetched from the object store ONCE per actor."""

    def __init__(self, drop_ref, text_col: str, sep: str = "\n"):
        import ray
        self.drop = ray.get(drop_ref)
        self.text_col = text_col
        self.sep = sep

    def __call__(self, batch: pa.Table) -> pa.Table:
        txt = batch.column(self.text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        flat, counts, doc_idx = _split_lines(txt, self.sep)
        n = len(txt)
        if len(self.drop) and len(flat):
            keep = pc.invert(
                pc.is_in(flat, value_set=self.drop)) \
                .to_numpy(zero_copy_only=False)
        else:
            keep = np.ones(len(flat), dtype=bool)
        if not keep.all():
            flat = flat.filter(pa.array(keep))
            kept_counts = np.bincount(
                doc_idx[keep], minlength=n).astype(np.int64)
        else:
            kept_counts = counts
        offsets = np.concatenate(([0], np.cumsum(kept_counts)))
        la = pa.LargeListArray.from_arrays(
            pa.array(offsets, pa.int64()), flat)
        clean = pc.binary_join(la, self.sep)
        dropped = pa.array(counts - kept_counts)
        nulls = pc.is_null(txt)
        if pc.any(nulls).as_py():
            clean = pc.if_else(nulls, pa.nulls(n, pa.string()), clean)
            dropped = pc.if_else(nulls, pa.nulls(n, pa.int64()), dropped)
        out_cols, out_names = [], []
        for name in batch.column_names:
            if name == self.text_col:
                out_cols.append(clean)
            else:
                out_cols.append(batch.column(name))
            out_names.append(name)
        out_cols.append(dropped)
        out_names.append("lines_dropped")
        return pa.table(dict(zip(out_names, out_cols)))


def _boilerplate_lines(ds, *, text_col: str, max_count: int,
                       min_len: int, num_partitions: int | None,
                       sep: str = "\n"):
    """Dataset of the frequent (boilerplate) lines — the would-be
    broadcast set of ``line_dedup``, threshold-bounded by
    ``max_count`` / ``min_len``."""
    freq = line_frequency(ds, text_col=text_col,
                          num_partitions=num_partitions, sep=sep)

    def over(batch: pa.Table) -> pa.Table:
        m = pc.greater(batch.column("cnt"), max_count)
        if min_len > 0:
            m = pc.and_(m, pc.greater_equal(
                pc.utf8_length(batch.column("line")), min_len))
        return batch.filter(m).select(["line"])

    return freq.map_batches(over, batch_format="pyarrow",
                            zero_copy_batch=True)


def _line_dedup_broadcast(ds, *, text_col: str, max_count: int,
                          min_len: int, num_partitions: int | None,
                          concurrency, sep: str = "\n", drop_ds=None):
    """Broadcast-mode pass 2 of ``line_dedup``: only the
    threshold-bounded frequent-line set — the boilerplate set — is
    collected and broadcast once via ``ray.put``; the corpus then
    streams through a stateful is_in + re-offset rebuild with no
    second shuffle. ``drop_ds`` reuses a set mode="auto" already
    materialized for its probe."""
    import ray

    if drop_ds is None:
        drop_ds = _boilerplate_lines(ds, text_col=text_col,
                                     max_count=max_count, min_len=min_len,
                                     num_partitions=num_partitions, sep=sep)
    parts = list(drop_ds.iter_batches(batch_format="pyarrow"))
    drop = pa.concat_tables(parts).column("line").combine_chunks() \
        if parts else pa.array([], pa.string())
    drop_ref = ray.put(drop)
    return ds.map_batches(
        _LineFilter, fn_constructor_kwargs={"drop_ref": drop_ref,
                                            "text_col": text_col,
                                            "sep": sep},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def _line_dedup_join(ds, *, text_col: str, id_col: str, max_count: int,
                     min_len: int, num_partitions: int | None,
                     sep: str = "\n"):
    """Join-mode pass of ``line_dedup``: no broadcast, no driver
    materialization — the regime for frequent-line sets past worker
    heaps (e.g. ``max_count=1`` over a heavily templated web corpus).

    Shape: explode docs to (id, ord, line, n_lines) rows; ONE groupby
    on the line hash both counts and marks every occurrence (fused —
    no separate frequent-table join; shuffle 1); hash-partition by
    ``id`` and rebuild every doc with ONE vectorized lexsort +
    re-offset + binary_join per partition (shuffle 2 — no per-doc
    dispatch); LEFT-join the rebuilt (id, text, lines_dropped) back
    onto the input to restore the other columns (shuffle 3). Docs
    whose text is null never explode and come back null."""
    import ray
    from .dedup import _id_type, _join_partitions
    from .temporal import _key_part

    P = _join_partitions(num_partitions)
    id_type = _id_type(ds, id_col)

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        flat, counts, doc_idx = _split_lines(txt, sep)
        ids = batch.column(id_col).take(pa.array(doc_idx))
        ords = (np.arange(len(flat), dtype=np.int64)
                - np.repeat(np.concatenate(([0], np.cumsum(counts)[:-1])),
                            counts))
        out = pa.table({
            "__id": ids, "__ord": pa.array(ords), "line": flat,
        })
        return out.append_column(
            "__lpart", _key_part(out.column("line"), P))

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    def mark(group: pa.Table) -> pa.Table:
        # one line-hash partition holds EVERY occurrence of its lines:
        # count + mark in a single pass (dictionary_encode + bincount)
        # instead of a separate frequent-table join — same semantics,
        # one less shuffle, and immune to Ray's schema-less empty
        # partition bundles that a Dataset.join on the frequent side
        # chokes on
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             "__ord": pa.array([], pa.int64()),
                             "line": pa.array([], pa.string()),
                             "__keep": pa.array([], pa.bool_())})
        codes = group.column("line").combine_chunks().dictionary_encode()
        c = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(c)
        freq_line = cnt > max_count
        if min_len > 0:
            short = pc.less(pc.utf8_length(codes.dictionary),
                            min_len).to_numpy(zero_copy_only=False)
            freq_line &= ~short
        return group.drop_columns(["__lpart"]).append_column(
            "__keep", pa.array(~freq_line[c]))

    tagged = exploded.groupby("__lpart").map_groups(
        mark, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("__id"), P))

    def rebuild(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             text_col: pa.array([], pa.string()),
                             "lines_dropped": pa.array([], pa.int64())})
        ids = group.column("__id")
        codes = ids.combine_chunks().dictionary_encode()
        gid = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ords = group.column("__ord").to_numpy(zero_copy_only=False)
        order = np.lexsort((ords, gid))
        gid = gid[order]
        keep = group.column("__keep") \
            .to_numpy(zero_copy_only=False)[order]
        lines = group.column("line").combine_chunks().take(pa.array(order))
        n_groups = int(gid.max()) + 1
        total = np.bincount(gid, minlength=n_groups)
        kept_n = np.bincount(gid[keep], minlength=n_groups)
        kept_lines = lines.filter(pa.array(keep))
        offsets = np.concatenate(([0], np.cumsum(kept_n))).astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                           kept_lines)
        clean = pc.binary_join(la, sep)
        first = np.concatenate(([True], gid[1:] != gid[:-1]))
        return pa.table({
            "__id": ids.combine_chunks().take(pa.array(order[first])),
            text_col: clean,
            "lines_dropped": pa.array((total - kept_n).astype(np.int64)),
        })

    rebuilt = tagged.map_batches(add_part, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("__part").map_groups(rebuild, batch_format="pyarrow")

    out = ds.drop_columns([text_col]).join(
        rebuilt, "left_outer", P, on=(id_col,), right_on=("__id",))
    return out


def line_dedup(ds, *, text_col: str = "text", max_count: int = 1,
               min_len: int = 0, num_partitions: int | None = None,
               concurrency=2, mode: str = "auto",
               id_col: str = "doc_id", sep: str = "\n",
               broadcast_budget_bytes: int | None = None):
    """Cross-document line deduplication (CCNet/RefinedWeb-style
    boilerplate removal): drop every line whose OCCURRENCE count across
    the corpus exceeds ``max_count`` (nav bars, cookie banners, footers
    repeat on every page of a site); ``min_len`` exempts lines shorter
    than that many characters (set >0 to keep blank-line structure).
    The text column is rewritten with surviving lines re-joined by
    ``\\n`` plus a ``lines_dropped`` count per doc; null text stays
    null. Exact string matching — SQL-oracle-reproducible, no hash
    collision caveat. Pass 1 in both modes is the distributed
    ``line_frequency`` (one row per distinct line per block shuffles,
    never the corpus).

    ``mode="auto"`` (default) probes the frequent-line set against the
    broadcast budget (ops/regime.py) and picks the regime; the probe
    materializes an aggregate both regimes consume, so it is ~free.

    ``mode="broadcast"``: the frequent set ships to every
    actor once via ``ray.put`` and the corpus streams — no second
    shuffle. Right while the set fits worker heaps (it is
    threshold-bounded, not corpus-bounded; raise ``max_count`` /
    ``min_len`` to shrink it). Row order and columns are preserved.

    ``mode="join"``: fully distributed for frequent sets past worker
    heaps — three hash shuffles (explode⋈frequent on line, rebuild
    partitioned by ``id_col``, reattach to the input on ``id_col``),
    vectorized per partition with no per-doc dispatch. Requires
    ``id_col`` to be a unique row key; output row order follows the
    joins (a relation, not a sequence).

    ``mode="auto"``: materialize the boilerplate set and pick
    broadcast iff it fits ``broadcast_budget_bytes`` (ops/regime.py).
    Free when broadcast wins (the set is reused); when join wins the
    counting pass is discarded (join fuses its own) — pass
    ``mode="join"`` directly for sets you know are beyond-heap."""
    if mode == "auto":
        from .regime import pick_regime
        drop_ds = _boilerplate_lines(ds, text_col=text_col,
                                     max_count=max_count, min_len=min_len,
                                     num_partitions=num_partitions, sep=sep)
        picked, drop_ds = pick_regime(drop_ds, broadcast_budget_bytes)
        if picked == "broadcast":
            return _line_dedup_broadcast(
                ds, text_col=text_col, max_count=max_count,
                min_len=min_len, num_partitions=num_partitions,
                concurrency=concurrency, sep=sep, drop_ds=drop_ds)
        mode = "join"
    if mode == "join":
        return _line_dedup_join(ds, text_col=text_col, id_col=id_col,
                                max_count=max_count, min_len=min_len,
                                num_partitions=num_partitions, sep=sep)
    if mode != "broadcast":
        raise ValueError(f"unknown line_dedup mode {mode!r}")
    return _line_dedup_broadcast(ds, text_col=text_col,
                                 max_count=max_count, min_len=min_len,
                                 num_partitions=num_partitions,
                                 concurrency=concurrency, sep=sep)
