"""Content-defined chunking (CDC) substring dedup — alignment-robust
duplicate-span detection and removal (the Lee-et-al-style "exact
substring dedup" family, done the way storage dedup systems make it
distributable: Rabin-style content anchors instead of suffix arrays).

Why not offsets or lines: fixed-stride windows miss duplicates that are
shifted by one byte, and line granularity (ops/clean.line_dedup) misses
duplicated spans embedded mid-line. A content-defined breakpoint moves
WITH the content — two documents sharing a long span produce the same
interior chunks regardless of where the span sits — so cross-doc
duplicated spans become equal chunk hashes, detectable with one tiny
shuffle.

Kernels (all flat-buffer numpy, no per-row Python):

- Rolling hash: h[i] = Σ_{j<w} b[i-j]·P^j mod 2^64 over the batch's
  flat text buffer — w fixed vector multiply-adds. Anchors where the
  low ``mask_bits`` bits are all ones (expected chunk ≈ 2^mask_bits
  bytes); document boundaries always break; chunks longer than
  ``max_len`` split at fixed offsets (stateless, so it stays
  vectorized — deliberately NOT the stateful min/max CDC variant).
- Anchors advance off UTF-8 continuation bytes (≤3 `np.where` rounds),
  so chunk removal can never split a multibyte character.
- Chunks tile the flat buffer contiguously → the chunk column is a
  ZERO-COPY Arrow binary array over the batch's own data buffer;
  hashing reuses `ops.dedup._hash_strings`.

Distribution shape: only (key, chunk_hash, occ, bytes) rows shuffle
(≈32 B per ~2^mask_bits input bytes); `duplicate_span_stats` is
join-only end to end (no broadcast, no driver materialization).
`dedup_spans` broadcasts the DUPLICATED-chunk table (hash, winner) —
bounded by duplicated-content volume, the quantity the op exists to
shrink; the docstring pins the budget and the stats op is the probe
that sizes it.

No parquet-rs counterpart (storage engine); SURVEY §2 training-data
family, sibling of line_dedup (line granularity) and near_dedup
(document granularity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _hash_strings
from .lm import _flat_utf8

__all__ = ["chunk_batch", "duplicate_span_stats", "dedup_spans"]

_P = np.uint64(0x9E3779B97F4A7C15)      # odd multiplier (splitmix64)
_WIN = 16


def _anchors(data: np.ndarray, mask_bits: int,
             offsets: np.ndarray) -> np.ndarray:
    """Positions AFTER which a chunk boundary falls (content-defined):
    i is an anchor iff the rolling hash of data[i-15..i] has its low
    ``mask_bits`` bits all ones AND the window lies entirely inside one
    document — chunking must depend ONLY on the document's own bytes,
    never on its batch neighbors, or the same content would chunk
    differently in different batches and dedup would silently miss.
    Returns sorted break positions. UTF-8 continuation bytes push a
    break forward (≤3 in valid utf-8) so chunks never split a
    character; a break pushed past its document's end drops (the doc
    bound is already a break)."""
    n = len(data)
    if n < _WIN:
        return np.empty(0, np.int64)
    h = np.zeros(n - _WIN + 1, np.uint64)
    powers = _P ** np.arange(_WIN, dtype=np.uint64)   # wraps mod 2^64
    with np.errstate(over="ignore"):
        for j in range(_WIN):
            h += data[_WIN - 1 - j:n - j].astype(np.uint64) * powers[j]
    mask = np.uint64((1 << mask_bits) - 1)
    pos = np.flatnonzero((h & mask) == mask) + _WIN - 1
    # doc-local windows only: window start i-(WIN-1) must be >= the
    # document's first byte
    doc = np.searchsorted(offsets, pos, side="right") - 1
    local = pos - (_WIN - 1) >= offsets[doc]
    pos, doc = pos[local], doc[local]
    brk = pos + 1                        # byte index the next chunk starts at
    # push breaks off utf-8 continuation bytes (0b10xxxxxx)
    for _ in range(3):
        inside = brk < n
        cont = np.zeros(len(brk), bool)
        cont[inside] = (data[brk[inside]] & 0xC0) == 0x80
        brk = brk + cont
    keep = (brk < n) & (brk < offsets[doc + 1])  # stay inside the doc
    return np.unique(brk[keep])


def _split_long(bounds: np.ndarray, max_len: int,
                data: np.ndarray) -> np.ndarray:
    """Insert extra breaks so no chunk exceeds ``max_len`` + 3 (fixed
    offsets from each chunk start — stateless, vectorized via the
    repeat/cumsum idiom). Like anchors, fixed breaks advance off UTF-8
    continuation bytes so they never split a character (a doc with no
    content anchors — e.g. a long run of one multibyte codepoint —
    would otherwise cut mid-character and the rebuilt text would not
    be valid UTF-8); bounds themselves are doc edges, already
    character-aligned."""
    lens = np.diff(bounds)
    n_extra = np.maximum((lens - 1) // max_len, 0)
    if not n_extra.any():
        return bounds
    starts = np.repeat(bounds[:-1], n_extra)
    k = np.arange(int(n_extra.sum())) - np.repeat(
        np.concatenate([[0], np.cumsum(n_extra)[:-1]]), n_extra)
    extra = starts + (k + 1) * max_len
    n = len(data)
    for _ in range(3):                   # ≤3 continuation bytes in utf-8
        inside = extra < n
        cont = np.zeros(len(extra), bool)
        cont[inside] = (data[extra[inside]] & 0xC0) == 0x80
        extra = extra + cont
    extra = extra[extra < n]             # pushed to the end: edge exists
    return np.unique(np.concatenate([bounds, extra]))


def _chunk_view(starts: np.ndarray, lens: np.ndarray,
                data: np.ndarray) -> pa.Array:
    """Zero-copy binary view: chunks tile the flat buffer, so the
    Arrow array borrows the batch's own data buffer (py_buffer wraps
    the numpy arrays via the buffer protocol — no copies; the Arrow
    array keeps them alive)."""
    end = starts[-1] + lens[-1]
    if end < 2**31:
        cb = np.concatenate([starts, [end]]).astype(np.int32)
        return pa.BinaryArray.from_buffers(
            pa.binary(), len(starts),
            [None, pa.py_buffer(cb), pa.py_buffer(data)])
    cb64 = np.concatenate([starts, [end]])      # >2 GiB flat buffer
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), len(starts),
        [None, pa.py_buffer(cb64), pa.py_buffer(data)])


def _doc_chunk_rows(batch: pa.Table, text_col: str, key_col: str,
                    mask_bits: int, max_len: int):
    """Chunk one batch. Returns ``(keys, offsets, data, starts, lens,
    doc_idx, seq, chunks)`` where ``chunks`` is the zero-copy binary
    view (None when every text is empty/null — ``starts`` then empty).
    ``seq`` is each chunk's index among its own document's chunks."""
    offsets, data = _flat_utf8(batch.column(text_col))
    keys = batch.column(key_col)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    brk = _anchors(data, mask_bits, offsets)
    bounds = _split_long(np.unique(np.concatenate([offsets, brk])),
                         max_len, data)
    lens = np.diff(bounds)
    nz = lens > 0                        # zero-length docs contribute none
    starts = bounds[:-1][nz]
    lens = lens[nz]
    if len(starts) == 0:
        e = np.empty(0, np.int64)
        return keys, offsets, data, starts, lens, e, e, None
    chunks = _chunk_view(starts, lens, data)
    doc_idx = np.searchsorted(offsets, starts, side="right") - 1
    seq = np.arange(len(starts)) - np.searchsorted(starts, offsets[:-1])[doc_idx]
    return keys, offsets, data, starts, lens, doc_idx, seq, chunks


def chunk_batch(batch: pa.Table, *, text_col: str, key_col: str,
                mask_bits: int = 8, max_len: int = 4096) -> pa.Table:
    """One batch → per-(doc, chunk_hash) rows: ``occ`` occurrences and
    ``bytes`` total bytes of that chunk content in that doc, plus
    ``first_seq`` (index of its first occurrence among the doc's
    chunks, for winner-side keep-first semantics)."""
    keys, offsets, data, starts, lens, doc_idx, seq, chunks = \
        _doc_chunk_rows(batch, text_col, key_col, mask_bits, max_len)
    if chunks is None:
        return pa.table({
            key_col: keys.slice(0, 0),
            "chunk_hash": pa.array([], pa.int64()),
            "occ": pa.array([], pa.int64()),
            "bytes": pa.array([], pa.int64()),
            "first_seq": pa.array([], pa.int64())})
    hashes = _hash_strings(chunks).view(np.int64)
    # distinct (doc, hash): occ count, byte sum, first seq
    order = np.lexsort((seq, hashes, doc_idx))
    d, hsh, ln, sq = doc_idx[order], hashes[order], lens[order], seq[order]
    new = np.ones(len(d), bool)
    new[1:] = (d[1:] != d[:-1]) | (hsh[1:] != hsh[:-1])
    grp = np.cumsum(new) - 1
    occ = np.bincount(grp)
    byt = np.bincount(grp, weights=ln).astype(np.int64)
    firsts = np.flatnonzero(new)
    return pa.table({
        key_col: keys.take(pa.array(d[firsts])),
        "chunk_hash": pa.array(hsh[firsts]),
        "occ": pa.array(occ.astype(np.int64)),
        "bytes": pa.array(byt),
        "first_seq": pa.array(sq[firsts].astype(np.int64))})


def _chunk_rows(ds, text_col, key_col, mask_bits, max_len):
    return ds.map_batches(
        lambda b: chunk_batch(b, text_col=text_col, key_col=key_col,
                              mask_bits=mask_bits, max_len=max_len),
        batch_format="pyarrow", zero_copy_batch=True)


def duplicate_span_stats(ds, *, text_col: str = "text",
                         key_col: str = "doc_id", mask_bits: int = 8,
                         max_len: int = 4096, num_partitions: int = 16):
    """Per-document duplicated-span report: ``total_bytes`` of chunked
    text, ``dup_bytes`` in chunks whose content occurs ≥2 times
    corpus-wide (across or within documents), and ``dup_frac``. Fully
    distributed: chunk summary rows → one groupby-sum on chunk_hash →
    one hash join back → per-doc groupby. Only ~32 B per expected
    2^mask_bits input bytes ever shuffles."""
    import pyarrow.compute as pc

    rows = _chunk_rows(ds, text_col, key_col, mask_bits, max_len)
    freq = rows.groupby("chunk_hash").sum("occ") \
        .map_batches(lambda b: b.rename_columns(["chunk_hash", "n_occ"]),
                     batch_format="pyarrow")
    joined = rows.join(freq, "inner", num_partitions, on=("chunk_hash",))

    def fold(batch: pa.Table) -> pa.Table:
        dup = pc.greater_equal(batch.column("n_occ"), 2)
        dupb = pc.if_else(dup, batch.column("bytes"), 0)
        return pa.table({
            key_col: batch.column(key_col),
            "total_bytes": batch.column("bytes"),
            "dup_bytes": dupb.cast(pa.int64())})

    agg = joined.map_batches(fold, batch_format="pyarrow") \
        .groupby(key_col).sum(["total_bytes", "dup_bytes"])

    def finish(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns([key_col, "total_bytes", "dup_bytes"])
        frac = pc.divide(
            pc.cast(batch.column("dup_bytes"), pa.float64()),
            pc.cast(batch.column("total_bytes"), pa.float64()))
        return batch.append_column("dup_frac", frac)

    return agg.map_batches(finish, batch_format="pyarrow")


def dedup_spans(ds, *, text_col: str = "text", key_col: str = "doc_id",
                mask_bits: int = 8, max_len: int = 4096,
                out_col: str | None = None, mode: str = "auto",
                num_partitions: int | None = None,
                broadcast_budget_bytes: int | None = None):
    """Remove duplicated spans, keeping ONE copy corpus-wide: for every
    chunk content occurring ≥2 times, the document with the smallest
    key keeps its first occurrence; every other occurrence is cut. The
    surviving bytes concatenate in document order (UTF-8 safe — anchors
    never split a character). Returns the dataset with ``text_col``
    (or ``out_col``) rewritten. Keys are assumed unique (they're
    document ids); duplicate keys would keep one copy per tied doc in
    broadcast mode but one corpus-wide in join mode.

    ``mode="auto"`` (default) probes the winners table against the
    broadcast budget (ops/regime.py) and picks the regime; the probe
    materializes an aggregate both regimes consume, so it is ~free.

    ``mode="broadcast"``: the (dup hash, winner key) table
    rides ray.put — its size is bounded by the corpus's
    duplicated-content volume / 2^mask_bits; run
    `duplicate_span_stats` first to size it.

    ``mode="join"``: fully distributed for duplicated-chunk tables
    past worker heaps (heavily templated web corpora at 100 TB).
    Chunk occurrences shuffle by chunk content (keep = first of each
    content run by (key, seq) — exactly the broadcast winner rule),
    docs rebuild per key partition with one lexsort + binary_join,
    and a left join restores the other columns. No broadcast, no
    driver materialization; the price is shuffling the text bytes.

    ``mode="auto"``: materialize the duplicated-chunk table (the
    aggregate broadcast needs anyway — free when broadcast wins) and
    pick against the worker-heap budget of ops/regime.py."""
    if mode == "auto":
        from .regime import pick_regime
        picked, mds = pick_regime(
            _dup_chunk_table(ds, text_col, key_col, mask_bits, max_len),
            broadcast_budget_bytes)
        if picked == "broadcast":
            return _dedup_spans_broadcast(
                ds, text_col=text_col, key_col=key_col,
                mask_bits=mask_bits, max_len=max_len, out_col=out_col,
                dup_tbl=mds)
        mode = "join"
    if mode == "join":
        return _dedup_spans_join(
            ds, text_col=text_col, key_col=key_col, mask_bits=mask_bits,
            max_len=max_len, out_col=out_col,
            num_partitions=num_partitions)
    if mode != "broadcast":
        raise ValueError(f"unknown dedup_spans mode {mode!r}")
    return _dedup_spans_broadcast(
        ds, text_col=text_col, key_col=key_col, mask_bits=mask_bits,
        max_len=max_len, out_col=out_col, dup_tbl=None)


def _dup_chunk_table(ds, text_col, key_col, mask_bits, max_len):
    """Lazy (chunk_hash, n_occ, winner) dataset of duplicated chunks:
    one groupby shuffle over the ~32 B/2^mask_bits summary rows."""
    import ray.data.aggregate as agg_mod

    rows = _chunk_rows(ds, text_col, key_col, mask_bits, max_len)
    freq = rows.groupby("chunk_hash").aggregate(
        agg_mod.Sum("occ", alias_name="n_occ"),
        agg_mod.Min(key_col, alias_name="winner"))
    return freq.filter(expr="n_occ >= 2")


def _dedup_spans_broadcast(ds, *, text_col, key_col, mask_bits, max_len,
                           out_col, dup_tbl):
    """Broadcast regime of ``dedup_spans`` (see there). ``dup_tbl``:
    pre-materialized duplicated-chunk dataset from mode="auto", or
    None to compute it here."""
    import ray

    if dup_tbl is None:
        dup_tbl = _dup_chunk_table(ds, text_col, key_col, mask_bits,
                                   max_len)
    dup_pd = dup_tbl.to_pandas()        # bounded: duplicated chunks only
    if len(dup_pd) == 0:                # no duplicated chunk anywhere —
        dh = np.empty(0, np.int64)      # a fully empty dataset loses its
        dwin = np.empty(0)              # columns, so don't index them
    else:
        dh = np.sort(dup_pd["chunk_hash"].to_numpy())
        dwin = dup_pd.sort_values("chunk_hash")["winner"].to_numpy()
    ref = ray.put((dh, dwin))
    out_name = out_col or text_col

    class _Rewrite:
        def __init__(self):
            self.dh, self.dwin = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys, offsets, data, starts, lens, doc_idx, _seq, chunks = \
                _doc_chunk_rows(batch, text_col, key_col, mask_bits,
                                max_len)
            knp = keys.to_numpy(zero_copy_only=False)
            n_docs = len(batch)
            if chunks is None:          # all texts empty/null
                out = pc_null_like(batch.column(text_col),
                                   pa.array([""] * n_docs, pa.string()))
                if out_col is None:
                    i = batch.schema.get_field_index(text_col)
                    return batch.set_column(i, out_name, out)
                return batch.append_column(out_name, out)
            hashes = _hash_strings(chunks).view(np.int64)
            pos = np.searchsorted(self.dh, hashes)
            pos = np.minimum(pos, max(len(self.dh) - 1, 0))
            is_dup = len(self.dh) > 0
            is_dup = (self.dh[pos] == hashes) if is_dup else \
                np.zeros(len(hashes), bool)
            keep = ~is_dup
            # winner keeps its FIRST occurrence of each dup chunk
            win_mask = is_dup & (knp[doc_idx] == (
                self.dwin[pos] if len(self.dh) else 0))
            if win_mask.any():
                idx = np.flatnonzero(win_mask)
                # first occurrence per (doc, hash) among winner rows
                order = np.lexsort((idx, hashes[idx], doc_idx[idx]))
                oi = idx[order]
                first = np.ones(len(oi), bool)
                first[1:] = (doc_idx[oi][1:] != doc_idx[oi][:-1]) | \
                    (hashes[oi][1:] != hashes[oi][:-1])
                keep[oi[first]] = True
            # rebuild per-doc text from kept ranges
            kstarts, klens, kdocs = starts[keep], lens[keep], doc_idx[keep]
            gather = np.repeat(kstarts, klens) + (
                np.arange(int(klens.sum()))
                - np.repeat(np.concatenate([[0], np.cumsum(klens)[:-1]]),
                            klens))
            new_data = data[gather]
            new_lens = np.bincount(kdocs, weights=klens,
                                   minlength=n_docs).astype(np.int64)
            new_off = np.concatenate([[0], np.cumsum(new_lens)])
            if new_off[-1] < 2**31:
                arr = pa.BinaryArray.from_buffers(
                    pa.binary(), n_docs,
                    [None,
                     pa.py_buffer(np.ascontiguousarray(
                         new_off.astype(np.int32))),
                     pa.py_buffer(np.ascontiguousarray(new_data))])
            else:
                arr = pa.LargeBinaryArray.from_buffers(
                    pa.large_binary(), n_docs,
                    [None,
                     pa.py_buffer(np.ascontiguousarray(new_off)),
                     pa.py_buffer(np.ascontiguousarray(new_data))])
            # large offsets cannot fit 32-bit string offsets: cast to
            # large_string in that branch (note: a >2 GiB single-batch
            # rebuild also changes the column type for that block)
            txt = arr.cast(pa.string() if new_off[-1] < 2**31
                           else pa.large_string())
            # null text stays null
            src = batch.column(text_col)
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            import pyarrow.compute as pc
            txt = pc.if_else(pc.is_valid(src), txt,
                             pa.scalar(None, pa.string()))
            if out_col is None:
                i = batch.schema.get_field_index(text_col)
                return batch.set_column(i, out_name, txt)
            return batch.append_column(out_name, txt)

    return ds.map_batches(_Rewrite, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=(1, 8))


def _dedup_spans_join(ds, *, text_col, key_col, mask_bits, max_len,
                      out_col, num_partitions):
    """Join regime of ``dedup_spans`` (see there): fully distributed,
    for duplicated-chunk tables past worker heaps.

    The broadcast keep rule — non-dup chunks keep their occurrence;
    dup chunks keep the min-key doc's first occurrence — collapses to
    ONE rule once every occurrence of a chunk content is co-located:
    keep iff first of the content run sorted by (key, seq). Shape:
    explode docs to (id, ord, chunk) occurrence rows partitioned by
    chunk content (shuffle 1); mark keepers with one sort_indices per
    partition; re-partition by id and rebuild each doc with one
    lexsort + binary_join (shuffle 2); LEFT-join the rebuilt text back
    onto the input to restore the other columns (shuffle 3). Null
    texts never explode and come back null; empty texts come back
    empty (the coalesce distinguishes the two)."""
    import pyarrow.compute as pc

    from .dedup import _id_type, _join_partitions
    from .temporal import _key_part

    P = _join_partitions(num_partitions)
    id_type = _id_type(ds, key_col)
    out_name = out_col or text_col

    def explode(batch: pa.Table) -> pa.Table:
        keys, _off, _data, _starts, _lens, doc_idx, seq, chunks = \
            _doc_chunk_rows(batch, text_col, key_col, mask_bits, max_len)
        if chunks is None:
            return pa.table({
                "__id": keys.slice(0, 0),
                "__ord": pa.array([], pa.int64()),
                "chunk": pa.array([], pa.binary()),
                "__cpart": pa.array([], pa.int32())})
        # batches are block-bounded, so int32 offsets always fit; pin
        # the type so every exploded block agrees on the shuffle schema
        out = pa.table({
            "__id": keys.take(pa.array(doc_idx)),
            "__ord": pa.array(seq.astype(np.int64)),
            "chunk": chunks.cast(pa.binary())})
        return out.append_column(
            "__cpart", _key_part(out.column("chunk"), P))

    exploded = ds.map_batches(explode, batch_format="pyarrow",
                              zero_copy_batch=True)

    def mark(group: pa.Table) -> pa.Table:
        # one content partition holds EVERY occurrence of its chunks:
        # keep = first of each content run by (key, seq) — identical
        # to broadcast's min-key-winner-first-occurrence semantics
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             "__ord": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.binary()),
                             "__keep": pa.array([], pa.bool_())})
        group = group.drop_columns(["__cpart"]).combine_chunks()
        order = pc.sort_indices(
            group, sort_keys=[("chunk", "ascending"),
                              ("__id", "ascending"),
                              ("__ord", "ascending")]) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        codes = group.column("chunk").combine_chunks().dictionary_encode()
        c = codes.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)[order]
        first = np.ones(len(c), bool)
        first[1:] = c[1:] != c[:-1]
        keep = np.zeros(len(c), bool)
        keep[order] = first
        return group.append_column("__keep", pa.array(keep))

    tagged = exploded.groupby("__cpart").map_groups(
        mark, batch_format="pyarrow")

    def add_part(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__part", _key_part(batch.column("__id"), P))

    def rebuild(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type),
                             "__new_text": pa.array([], pa.string())})
        ids = group.column("__id").combine_chunks()
        gid = ids.dictionary_encode().indices \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        ords = group.column("__ord").to_numpy(zero_copy_only=False)
        order = np.lexsort((ords, gid))
        gid = gid[order]
        keep = group.column("__keep") \
            .to_numpy(zero_copy_only=False)[order]
        chunks = group.column("chunk").combine_chunks() \
            .take(pa.array(order))
        n_groups = int(gid.max()) + 1
        kept_n = np.bincount(gid[keep], minlength=n_groups)
        kept = chunks.filter(pa.array(keep)).cast(pa.string())
        off = np.concatenate(([0], np.cumsum(kept_n))).astype(np.int64)
        la = pa.LargeListArray.from_arrays(pa.array(off, pa.int64()), kept)
        txt = pc.binary_join(la, "")
        firsts = np.concatenate(([True], gid[1:] != gid[:-1]))
        return pa.table({"__id": ids.take(pa.array(order[firsts])),
                         "__new_text": txt.cast(pa.string())})

    rebuilt = tagged.map_batches(add_part, batch_format="pyarrow",
                                 zero_copy_batch=True) \
        .groupby("__part").map_groups(rebuild, batch_format="pyarrow")

    # degenerate corpus (every text null/empty): zero occurrence rows
    # strip the rebuilt side's schema and the join cannot resolve
    # __id. The probe streams exploded until its FIRST row — one block
    # for any real corpus, a full (cheap, map-only) scan only in the
    # degenerate case — and then skips the join entirely.
    if exploded.limit(1).count() == 0:
        def degenerate(batch: pa.Table) -> pa.Table:
            src = batch.column(text_col)
            if isinstance(src, pa.ChunkedArray):
                src = src.combine_chunks()
            txt = pc.if_else(pc.is_valid(src),
                             pa.scalar("", pa.string()),
                             pa.scalar(None, pa.string()))
            if out_col is None:
                i = batch.schema.get_field_index(text_col)
                return batch.set_column(i, out_name, txt)
            return batch.append_column(out_name, txt)

        return ds.map_batches(degenerate, batch_format="pyarrow",
                              zero_copy_batch=True)

    out = ds.join(rebuilt, "left_outer", P,
                  on=(key_col,), right_on=("__id",))

    def finish(batch: pa.Table) -> pa.Table:
        new = batch.column("__new_text")
        if isinstance(new, pa.ChunkedArray):
            new = new.combine_chunks()
        src = batch.column(text_col)
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # empty/whitespace-free docs produced no chunk rows: non-null
        # source text coalesces to "", null stays null
        base = pc.if_else(pc.is_valid(src), pa.scalar("", pa.string()),
                          pa.scalar(None, pa.string()))
        txt = pc.if_else(pc.is_valid(new), new.cast(pa.string()), base)
        batch = batch.drop_columns(["__new_text"])
        if out_col is None:
            i = batch.schema.get_field_index(text_col)
            return batch.set_column(i, out_name, txt)
        return batch.append_column(out_name, txt)

    return out.map_batches(finish, batch_format="pyarrow")


def pc_null_like(src, new):
    import pyarrow.compute as pc
    if isinstance(src, pa.ChunkedArray):
        src = src.combine_chunks()
    return pc.if_else(pc.is_valid(src), new, pa.scalar(None, pa.string()))
