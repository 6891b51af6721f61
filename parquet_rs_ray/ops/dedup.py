"""Deduplication operators.

* exact_dedup       — hash-partition + per-group min-key winner
                      (combiner inside map_batches before the shuffle)
* minhash_lsh_dedup — shingle → minhash → band buckets → per-bucket
                      verify (the canonical near-dup pipeline)
* simhash           — 64-bit simhash fingerprints per document
* ngram_jaccard     — exact Jaccard over n-gram sets for candidate pairs

All operators are vectorized per batch (numpy hashing; no Python loop
over characters) and shuffle only compact intermediates (hashes, ids),
never full documents — at 10^12 docs the shuffle payload is the
bottleneck, so documents stay put and only fingerprints move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def splitmix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (the ONE shared copy — partitioning, bloom
    hashing and sketches must stay in sync): spreads entropy across all
    64 bits of a uint64 array."""
    with np.errstate(over="ignore"):
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))


def int_column_u64(arr: pa.Array) -> np.ndarray:
    """Integer/float Arrow column → uint64 bit view, null-safe and
    uint64-safe (cast-to-int64 raises on uint64 values past 2^63)."""
    if arr.null_count:
        arr = arr.fill_null(0)
    if arr.type == pa.uint64():
        return arr.to_numpy(zero_copy_only=False).astype(np.uint64)
    return arr.cast(pa.int64()).to_numpy(zero_copy_only=False) \
        .astype(np.uint64)


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit content hash of a string/binary column.

    Hashes via numpy over fixed-width chunks: fold each value's bytes
    into a uint64 with multiply-xor rounds (no Python per-char loop)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # 64-bit offset tolerance (VERDICT r2): large_string/large_binary
    # batches (>2 GiB of text — plausible html columns at 100 TB) keep
    # their int64 offsets instead of failing the int32 binary cast
    if pa.types.is_large_string(arr.type):
        barr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        barr = arr
    else:
        barr = arr.cast(pa.binary())
    large = pa.types.is_large_binary(barr.type)
    bufs = barr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=np.int64 if large else np.int32,
        count=len(barr) + 1,
        offset=barr.offset * (8 if large else 4)).astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    start = offsets[0]
    offsets = offsets - start
    total = int(offsets[-1])
    data = data[start:start + total]
    n = len(barr)
    lens = np.diff(offsets)
    out = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    max_words = int(np.ceil(lens.max() / 8)) if n and lens.max() > 0 else 0
    if max_words == 0:
        return out
    # 8-zero-padded buffer → unmasked (n, 8) gather per word, then mask
    # the tail bytes via a 9-entry table. Far less temporary memory than
    # a full (n, max_words*8) validity matrix (page-fault bound at ~1M
    # values per batch); hash values identical.
    padded = np.empty(total + 8, np.uint8)
    padded[:total] = data
    padded[total:] = 0
    base = offsets[:-1]
    col8 = np.arange(8, dtype=np.int64)
    masks = np.array([(1 << (8 * k)) - 1 for k in range(8)]
                     + [0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    with np.errstate(over="ignore"):
        for w in range(max_words):
            # clamp rows already exhausted at this word (their result is
            # masked to 0 below, so the clamped read is never used)
            row = np.minimum(base + 8 * w, total)
            words = padded[row[:, None] + col8].reshape(n, 8) \
                .copy().view("<u8").ravel()
            lj = np.clip(lens - 8 * w, 0, 8)
            words &= masks[lj]
            active = lj > 0
            out[active] = (out[active] ^ words[active]) * _FNV_PRIME
        out ^= np.uint64(0xFF51AFD7ED558CCD) * lens.astype(np.uint64)
    return out


def exact_dedup(ds, text_col: str, key_col: str, *, mode: str = "auto",
                num_partitions: int | None = None,
                broadcast_budget_bytes: int | None = None):
    """Keep the min-`key_col` row per distinct `text_col` value.

    Stage 1 (combiner, no shuffle): per-batch dedup → (hash, key) only.
    Stage 2 (shuffle): groupby(hash) over the compact pairs → winner key.
    Stage 3, two regimes:
      * ``mode="broadcast"`` — winner keys fit memory (≤ ~10^9): collect
        once, ``ray.put``, filter the original dataset per batch.
      * ``mode="join"`` — winner set itself is huge (near-unique corpus
        at 10^12 docs): distributed hash join of the tagged dataset
        against the winner (hash, key) pairs; nothing touches the driver.
      * ``mode="auto"`` — probe: materialize the winner set (both
        regimes consume it, so the probe costs nothing extra) and pick
        broadcast iff it fits ``broadcast_budget_bytes`` (see
        ops/regime.py for the default and its worker-heap rationale).
    """
    import ray

    def to_pairs(batch: pa.Table) -> pa.Table:
        h = _hash_strings(batch.column(text_col))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, h))
        hs, ks = h[order], keys[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        return pa.table({"h": hs[first].view(np.int64), "k": ks[first]})

    pairs = ds.map_batches(to_pairs, batch_format="pyarrow",
                           zero_copy_batch=True)

    def min_per_group(batch: pa.Table) -> pa.Table:
        h = batch.column("h").to_numpy(zero_copy_only=False)
        k = batch.column("k").to_numpy(zero_copy_only=False)
        order = np.lexsort((k, h))
        hs, ks = h[order], k[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        return pa.table({"h": hs[first], "k": ks[first]})

    winners = pairs.groupby("h").map_groups(min_per_group,
                                            batch_format="pyarrow")

    if mode == "auto":
        from .regime import pick_regime
        mode, winners = pick_regime(winners, broadcast_budget_bytes)

    if mode == "join":
        num_partitions = _join_partitions(num_partitions, n_joins=1)

        def tag(batch: pa.Table) -> pa.Table:
            h = _hash_strings(batch.column(text_col)).view(np.int64)
            return batch.append_column("__h", pa.array(h, pa.int64()))

        tagged = ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
        win = winners.rename_columns({"h": "__h", "k": "__k"})
        out = tagged.join(win, "inner", num_partitions,
                          on=("__h", key_col), right_on=("__h", "__k"))
        return out.drop_columns(["__h", "__k"]) if "__k" in (
            out.schema().names) else out.drop_columns(["__h"])

    if mode != "broadcast":
        raise ValueError(f"unknown exact_dedup mode {mode!r}")
    keep = np.sort(winners.select_columns(["k"]).to_pandas()["k"].to_numpy())
    keep_ref = ray.put(keep)  # broadcast once; read per task, not per batch

    def filter_winners(batch: pa.Table) -> pa.Table:
        keep_arr = ray.get(keep_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        # membership via searchsorted against the PRE-sorted broadcast
        # winners (np.isin would re-sort it every batch); same pattern
        # as decontam's sorted-blocklist probe
        pos = np.searchsorted(keep_arr, keys)
        pos[pos == len(keep_arr)] = 0
        mask = (keep_arr[pos] == keys) if len(keep_arr) else \
            np.zeros(len(keys), bool)
        return batch.filter(pa.array(mask))

    return ds.map_batches(filter_winners, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------- minhash


_SHINGLE_P = np.uint64(1099511628211)


def _window_fold(wh: np.ndarray, k: int) -> np.ndarray:
    """Polynomial fold of each length-k window of word hashes (wrapping
    uint64 arithmetic — deterministic, no per-shingle Python hashing)."""
    n_sh = len(wh) - k + 1
    out = np.zeros(n_sh, dtype=np.uint64)
    p = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(k):
            out += wh[j:j + n_sh] * p
            p = p * _SHINGLE_P
    return out


def _words(text: str) -> list[str]:
    """Space-delimited words, empties dropped — deliberately LITERAL
    single-space splitting, not str.split()'s Unicode whitespace, so a
    SQL oracle can reproduce tokenization exactly for ANY input:
    list_filter(string_split(text, ' '), x -> x <> ''). Identical to
    whitespace splitting on single-space corpora."""
    return [w for w in text.split(" ") if w]


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-gram (word-level) hashes of one document."""
    words = _words(text)
    if len(words) < k:
        words = words + [""] * (k - len(words))
    wh = _hash_strings(pa.array(words, pa.string()))
    return _window_fold(wh, k)


_EMPTY_WORD_HASH: np.uint64 | None = None


def _empty_word_hash() -> np.uint64:
    global _EMPTY_WORD_HASH
    if _EMPTY_WORD_HASH is None:
        _EMPTY_WORD_HASH = _hash_strings(pa.array([""], pa.string()))[0]
    return _EMPTY_WORD_HASH


def _word_hash_segments(txt) -> tuple[np.ndarray, np.ndarray]:
    """(flat word hashes, per-doc word counts) for a string column —
    ONE Arrow `split_pattern` + ONE `_hash_strings` pass, no per-doc
    Python split loop (the r2 hot-kernel fix; same vectorized pattern
    as `textstats._split_words`). Tokenization definition unchanged and
    SQL-oracle-pinned: literal single-space split, empties dropped (see
    `_words`). Null texts count as empty documents."""
    if isinstance(txt, list):
        txt = pa.array(txt, pa.string())
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    n = len(txt)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    words = pc.split_pattern(txt.fill_null(""), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    counts = pc.list_value_length(words) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    ne = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not ne.all():
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)[ne]
        flat = flat.filter(pa.array(ne))
        counts = np.bincount(doc_idx, minlength=n).astype(np.int64)
    return _hash_strings(flat), counts


def _batch_shingles(texts, k: int = 5):
    """All documents' shingle hashes in ONE vectorized pass.

    ``texts`` is a list[str] or an Arrow string column. Returns (flat
    shingle hashes, per-doc segment start offsets). Words of every doc
    are hashed in a single `_hash_strings` call; windows never cross
    doc boundaries; docs with < k words are padded with hash("") to
    exactly the per-doc padded-list semantics of `_shingle_hashes`."""
    wh0, counts0 = _word_hash_segments(texts)
    n = len(counts0)
    pad = np.maximum(k - counts0, 0)
    counts = counts0 + pad
    doc_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_starts[1:])
    if pad.any():
        # scatter real word hashes to their padded positions; the
        # remaining (suffix) slots keep hash("")
        starts0 = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(counts0, out=starts0[1:])
        wh = np.full(int(doc_starts[-1]), _empty_word_hash(),
                     dtype=np.uint64)
        doc_of_word = np.repeat(np.arange(n, dtype=np.int64), counts0)
        within = np.arange(len(wh0), dtype=np.int64) - starts0[doc_of_word]
        wh[doc_starts[doc_of_word] + within] = wh0
    else:
        wh = wh0
    n_sh = counts - k + 1
    flat = _window_fold(wh, k) if len(wh) >= k else np.zeros(0, np.uint64)
    # valid window starts: [doc_start, doc_start + n_sh) per doc
    seg_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_sh, out=seg_starts[1:])
    idx = np.repeat(doc_starts[:-1] - seg_starts[:-1], n_sh) + \
        np.arange(int(seg_starts[-1]), dtype=np.int64)
    return flat[idx], seg_starts


_MINHASH_A = None
_MINHASH_B = None


def _minhash_params(num_perm: int):
    global _MINHASH_A, _MINHASH_B
    if _MINHASH_A is None or len(_MINHASH_A) != num_perm:
        rng = np.random.default_rng(1234)
        _MINHASH_A = rng.integers(1, 2 ** 61 - 1, num_perm, dtype=np.uint64)
        _MINHASH_B = rng.integers(0, 2 ** 61 - 1, num_perm, dtype=np.uint64)
    return _MINHASH_A, _MINHASH_B


def minhash_signature(texts: list[str], num_perm: int = 64) -> np.ndarray:
    """(n, num_perm) minhash signatures.

    Fully batch-vectorized: one word-hash pass over all docs, wrapping
    multiply-add permutations h_j(x) = a_j*x + b_j (mod 2^64, implicit),
    per-doc mins via `np.minimum.reduceat` — one permutation at a time
    so peak memory stays at one flat shingle array."""
    A, B = _minhash_params(num_perm)
    flat, seg_starts = _batch_shingles(texts)
    n = len(texts)
    out = np.empty((n, num_perm), dtype=np.uint64)
    if len(flat) == 0:
        out[:] = np.uint64(0xFFFFFFFFFFFFFFFF)
        return out
    starts = seg_starts[:-1]
    empty = seg_starts[1:] == starts  # docs with zero shingles
    red_starts = np.minimum(starts, len(flat) - 1)
    with np.errstate(over="ignore"):
        for j in range(num_perm):
            v = flat * A[j] + B[j]
            mins = np.minimum.reduceat(v, red_starts)
            mins[empty] = np.uint64(0xFFFFFFFFFFFFFFFF)
            out[:, j] = mins
    return out


class MinHashActor:
    """Stateful stage: permutation parameters initialized once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16,
                 text_col: str = "text", key_col: str = "doc_id"):
        self.num_perm, self.bands = num_perm, bands
        self.rows_per_band = num_perm // bands
        self.text_col, self.key_col = text_col, key_col
        _minhash_params(num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)  # Arrow column straight in —
        # tokenization is Arrow-vectorized, no to_pylist materialization
        keys = np.asarray(
            batch.column(self.key_col).to_numpy(zero_copy_only=False))
        sig = minhash_signature(texts, self.num_perm)
        # band hashes: fold each band's rows into one uint64 bucket id
        n = len(texts)
        r = self.rows_per_band
        buckets = np.empty(self.bands * n, dtype=np.uint64)
        for b in range(self.bands):
            band = sig[:, b * r:(b + 1) * r]
            folded = np.full(n, np.uint64(1469598103934665603), dtype=np.uint64)
            for j in range(r):
                folded = (folded ^ band[:, j]) * np.uint64(1099511628211)
            buckets[b * n:(b + 1) * n] = folded
        return pa.table({
            "band": pa.array(np.repeat(np.arange(self.bands, dtype=np.int32),
                                       n)),
            "bucket": pa.array(buckets.view(np.int64)),
            "key": pa.array(np.tile(keys, self.bands)),
        })


def minhash_lsh_candidates(ds, *, text_col: str = "text",
                           key_col: str = "doc_id", num_perm: int = 64,
                           bands: int = 16, concurrency=4,
                           max_bucket: int = 512):
    """Candidate near-duplicate pairs via banded minhash LSH.

    map_batches(MinHashActor) → groupby(band, bucket) → pairs within
    buckets of size ≥ 2. Only (band, bucket, key) triples shuffle.

    ``max_bucket`` caps pair emission per bucket: a degenerate bucket
    (boilerplate-heavy corpora collapse many docs into one band value)
    would otherwise emit O(bucket²) pairs; the cap keeps the smallest
    ``max_bucket`` keys — real near-dup pairs still collide in the other
    bands, so recall loss is confined to pathological buckets."""
    buckets = ds.map_batches(
        MinHashActor,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "text_col": text_col, "key_col": key_col},
        batch_format="pyarrow", concurrency=concurrency)

    def emit_pairs(sub: pa.Table) -> pa.Table:
        return _bucket_pairs(
            sub.column("key").to_numpy(zero_copy_only=False), max_bucket)

    pairs = _coarse_grouped(buckets, ["band", "bucket"], emit_pairs)
    # distinct pairs (a pair can fire in several bands)
    return _distinct_pairs(pairs)


def _bucket_pairs(keys: np.ndarray, max_bucket: int) -> pa.Table:
    """All (a < b) pairs among a bucket's keys — sorted, truncated to the
    ``max_bucket`` SMALLEST keys (= the oracle's row_number()-capped
    form), vectorized triu emission. THE one pair-emission kernel
    (minhash LSH + prefix blocking)."""
    keys = np.sort(np.asarray(keys))[:max_bucket]
    n = len(keys)
    if n < 2:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    ii, jj = np.triu_indices(n, 1)
    return pa.table({"a": pa.array(keys[ii], pa.int64()),
                     "b": pa.array(keys[jj], pa.int64())})


def _coarse_grouped(rows, group_cols: list, kernel, *,
                    num_partitions: int | None = None):
    """Apply ``kernel(equal-group sub-table) → pa.Table`` to every
    equal-``group_cols`` run — via ~ncpu COARSE hash partitions and ONE
    vectorized sort + segment scan per partition. `groupby(cols)
    .map_groups` would pay one Python dispatch per DISTINCT group; at
    web scale LSH buckets / blocking prefixes are mostly singletons and
    dispatch would dominate, so singleton runs are skipped entirely and
    only multi-row runs reach the kernel.

    For COMPACT rows only (keys / fingerprints / band values): one task
    sorts a whole coarse partition (~rows/ncpu), so payload-carrying
    rows (e.g. embedding vectors) belong in a block-bounded
    ``groupby(...).map_groups`` instead — see embedding_near_dup_lsh."""
    from .temporal import _default_partitions, _new_key_mask
    P = num_partitions or _default_partitions()

    def add_part(batch: pa.Table) -> pa.Table:
        h = np.zeros(len(batch), np.uint64)
        for c in group_cols:
            arr = batch.column(c)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            if pa.types.is_integer(arr.type):
                v = splitmix64(int_column_u64(arr))
            else:
                # fill_null AFTER the cast — same convention as
                # temporal._key_part (null groups one partition)
                arr = arr.cast(pa.string())
                if arr.null_count:
                    arr = arr.fill_null("")
                v = _hash_strings(arr)
            with np.errstate(over="ignore"):
                h = splitmix64(h ^ v)
        return batch.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int32)))

    def per_part(group: pa.Table) -> pa.Table:
        g = group.drop_columns(["__part"]) \
            .sort_by([(c, "ascending") for c in group_cols])
        n = g.num_rows
        if n == 0:
            return kernel(g)
        new_seg = np.zeros(n, dtype=bool)
        for c in group_cols:
            new_seg |= _new_key_mask(g.column(c))
        seg_first = np.flatnonzero(new_seg)
        seg_len = np.diff(np.append(seg_first, n))
        multi = seg_len > 1
        outs = [kernel(g.slice(int(st), int(ln)))
                for st, ln in zip(seg_first[multi], seg_len[multi])]
        return pa.concat_tables(outs) if outs else kernel(g.slice(0, 0))

    return rows.map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby("__part").map_groups(per_part, batch_format="pyarrow")


def _distinct_pairs(pairs, *, num_partitions: int = 64, extra_cols=()):
    """Distinct (a, b) rows, distributed: partition by hash(a) so every
    copy of a pair lands in one partition, then per-partition numpy
    lexsort-unique. One map_groups call per PARTITION (not per key) —
    dispatch overhead stays O(num_partitions) however many pairs."""

    def add_part(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            part = ((a.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
                    >> np.uint64(52)).astype(np.int64) % num_partitions
        return batch.append_column("__part", pa.array(part))

    def uniq(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        sa, sb = a[order], b[order]
        first = np.concatenate(
            ([True], (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])))
        out = {"a": pa.array(sa[first], pa.int64()),
               "b": pa.array(sb[first], pa.int64())}
        for c in extra_cols:
            v = batch.column(c).to_numpy(zero_copy_only=False)[order]
            out[c] = pa.array(v[first])
        return pa.table(out)

    return pairs.map_batches(add_part, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("__part").map_groups(uniq, batch_format="pyarrow")


def simhash(texts: list[str], nbits: int = 64) -> np.ndarray:
    """64-bit simhash per document over word-level features.

    Fully batch-vectorized: ONE `_hash_strings` pass over every word of
    every document, per-document bit votes via `np.add.reduceat` (same
    segment trick as `_batch_shingles`), sign fold in numpy. No per-doc
    Python hashing."""
    hs, counts = _word_hash_segments(texts)
    n = len(counts)
    out = np.zeros(n, dtype=np.uint64)
    if n == 0 or len(hs) == 0:
        return out
    shifts = np.arange(nbits, dtype=np.uint64)
    bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # reduceat over NON-EMPTY docs only: an empty doc's start equals the
    # next doc's (or len(hs)) and naive clamping would truncate the
    # preceding doc's segment, corrupting its hash
    nonempty = counts > 0
    votes = np.zeros((n, nbits), dtype=np.int64)
    votes[nonempty] = np.add.reduceat(bits, starts[nonempty], axis=0)
    score = votes * 2 - counts[:, None]
    signs = (score > 0).astype(np.uint64)
    return np.bitwise_or.reduce(signs << shifts, axis=1)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64 (no per-value Python loop)."""
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & m1)
        x = (x & m2) + ((x >> np.uint64(2)) & m2)
        x = (x + (x >> np.uint64(4))) & m4
        return ((x * h01) >> np.uint64(56)).astype(np.int64)


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity of two documents."""
    sa = set(map(int, _shingle_hashes(a, k)))
    sb = set(map(int, _shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------------- near-dedup pipelines

def pair_jaccard(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Exact word-k-gram Jaccard per aligned (texts_a[i], texts_b[i])
    pair. All shingles of all pair texts are hashed in ONE
    `_batch_shingles` pass; per-pair set ops run on sorted numpy
    arrays. Identical definition to `ngram_jaccard` (padded < k-word
    docs, hash-set semantics)."""
    n = len(texts_a)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    if isinstance(texts_a, (pa.Array, pa.ChunkedArray)):
        # Arrow fast path: concat column-side — round-tripping through
        # to_pylist would materialize every candidate text as a Python
        # str and re-encode it (the verify stage's dominant memory
        # traffic on boilerplate-heavy corpora)
        ta = texts_a.combine_chunks() \
            if isinstance(texts_a, pa.ChunkedArray) else texts_a
        tb = texts_b.combine_chunks() \
            if isinstance(texts_b, pa.ChunkedArray) else texts_b
        both = pa.concat_arrays([ta.cast(pa.string()),
                                 tb.cast(pa.string())])
    else:
        both = list(texts_a) + list(texts_b)
    flat, seg = _batch_shingles(both, k)
    # ONE lexsort over (pair, side, hash) replaces per-pair
    # np.unique/intersect1d (the r2 boilerplate-heavy-corpora hotspot):
    # dedupe within each (pair, side) via adjacent-run boundaries, then
    # re-sort the unique triples by (pair, hash) — a hash on BOTH sides
    # becomes an adjacent equal run of length 2 ⇒ intersection counts
    # fall out of one bincount.
    doc_of = np.repeat(np.arange(2 * n, dtype=np.int64), np.diff(seg))
    pair = doc_of % n
    side = doc_of // n
    order = np.lexsort((flat, side, pair))
    ps, ss, hs = pair[order], side[order], flat[order]
    uniq = np.ones(len(ps), dtype=bool)
    uniq[1:] = (ps[1:] != ps[:-1]) | (ss[1:] != ss[:-1]) | (hs[1:] != hs[:-1])
    pu, su, hu = ps[uniq], ss[uniq], hs[uniq]
    a_sizes = np.bincount(pu[su == 0], minlength=n)
    b_sizes = np.bincount(pu[su == 1], minlength=n)
    order2 = np.lexsort((su, hu, pu))
    p2, h2 = pu[order2], hu[order2]
    both = (p2[1:] == p2[:-1]) & (h2[1:] == h2[:-1])
    inter = np.bincount(p2[1:][both], minlength=n)
    union = a_sizes + b_sizes - inter
    with np.errstate(invalid="ignore"):
        out = np.where(union == 0, 1.0, inter / np.maximum(union, 1))
    return out.astype(np.float64)


def jaccard_for_pairs(pairs, texts_by_key: dict, k: int = 5):
    """Exact Jaccard for (a, b) candidate pairs with the candidate texts
    broadcast once via ray.put — the SMALL-candidate-set regime only
    (near_dedup's default path keeps texts distributed instead)."""
    import ray
    texts_ref = ray.put(texts_by_key)

    def score(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        sims = pair_jaccard([texts[x] for x in a], [texts[y] for y in b], k)
        return batch.append_column("jaccard", pa.array(sims, pa.float64()))

    return pairs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)


def _id_type(ds, id_col: str) -> pa.DataType:
    """Arrow type of ``id_col`` resolved once at the driver. Join-mode
    ops build typed EMPTY tables for empty hash partitions; hard-coding
    int64 there schema-mismatches string-keyed corpora (the empty
    partition's ``__id`` must concat/join against real batches), so the
    type comes from the dataset's own schema."""
    sch = ds.schema()
    try:
        return dict(zip(sch.names, sch.types))[id_col]
    except KeyError:
        raise KeyError(f"id column {id_col!r} not in schema "
                       f"{list(sch.names)}") from None


def _join_partitions(requested: int | None, n_joins: int = 3) -> int:
    """Join partition count bounded by cluster CPUs: each hash-join
    partition is backed by an aggregator actor reserving a CPU, and a
    near-dedup pipeline runs up to THREE joins concurrently — sizing
    each at ncpu would triple-book the cluster (measured 6.5× wall at
    32 CPUs) or deadlock a small one. ncpu/(n_joins+1) leaves headroom
    for the map/sort stages; partitions beyond that just queue on
    aggregators anyway."""
    import ray
    ncpu = int(ray.cluster_resources().get("CPU", 32))
    cap = max(2, ncpu // (n_joins + 1))
    return cap if requested is None else max(2, min(requested, cap))


def near_dedup(ds, *, text_col: str = "text", key_col: str = "doc_id",
               jaccard_threshold: float = 0.8, k: int = 5,
               num_perm: int = 64, bands: int = 16, concurrency=4,
               num_partitions: int | None = None):
    """Full near-duplicate removal: MinHash-LSH candidates → exact
    n-gram-Jaccard verify → drop every doc with a verified duplicate of
    smaller key. Returns the surviving Dataset.

    Fully distributed — nothing is materialized on the driver:
    candidate texts are attached to the pairs dataset by two
    distributed hash joins (shuffling only candidate-pair rows, never
    the whole corpus), Jaccard runs as a map_batches stage, and the
    verified drop set is removed with a distributed left-anti join.
    Boilerplate-heavy web corpora where candidates ≈ corpus therefore
    cannot OOM the driver; shuffle payload stays (band, bucket, key)
    triples plus candidate texts only."""
    num_partitions = _join_partitions(num_partitions)
    # pairs are consumed twice (candidate-key derivation + text joins);
    # materialize once so the corpus-scanning LSH lineage doesn't
    # re-execute — pairs are 16-byte rows, object-store/spill friendly
    pairs = minhash_lsh_candidates(ds, text_col=text_col, key_col=key_col,
                                   num_perm=num_perm, bands=bands,
                                   concurrency=concurrency).materialize()
    if pairs.count() == 0:
        return ds  # no candidates anywhere (also: empty datasets would
        # strip the join-key schema from the empty cand_keys side)

    withtexts = _attach_pair_texts(pairs, ds, key_col=key_col,
                                   text_col=text_col,
                                   num_partitions=num_partitions)

    def score(batch: pa.Table) -> pa.Table:
        sims = pair_jaccard(batch.column("text_a"),
                            batch.column("text_b"), k)
        keep = sims >= jaccard_threshold
        # verified dupe = larger key of the pair
        drop = np.maximum(
            batch.column("a").to_numpy(zero_copy_only=False)[keep],
            batch.column("b").to_numpy(zero_copy_only=False)[keep])
        return pa.table({key_col: pa.array(np.unique(drop), pa.int64())})

    drops = withtexts.map_batches(score, batch_format="pyarrow")
    # the text joins above forward hit-less partitions as SCHEMA-LESS
    # empty blocks (same Ray quirk decontaminate_join heals); the
    # left_anti below would crash resolving key_col on such an empty
    # right partition. repartition rebuilds blocks from rows, dropping
    # the poisoned empties — cheap: one row per verified duplicate.
    drops = drops.repartition(num_partitions)
    return ds.join(drops, "left_anti", num_partitions, on=(key_col,))


def _attach_pair_texts(pairs, ds, *, key_col: str, text_col: str,
                       num_partitions: int):
    """Attach ``text_a`` / ``text_b`` to an (a, b) pair dataset with
    distributed hash joins — nothing touches the driver.

    Semi-join reduction: only CANDIDATE keys' texts are needed, so the
    corpus text shuffles once against the (small) distinct
    candidate-key set, then the resulting candidate-text table — itself
    small — joins onto the pairs twice. Corpus text bodies shuffle ONCE
    instead of twice."""
    def emit_keys(batch: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [batch.column("a").to_numpy(zero_copy_only=False),
             batch.column("b").to_numpy(zero_copy_only=False)]))
        part = (splitmix64(u.astype(np.uint64))
                % np.uint64(num_partitions)).astype(np.int64)
        return pa.table({"__ck": pa.array(u, pa.int64()),
                         "__part": pa.array(part)})

    def uniq_keys(batch: pa.Table) -> pa.Table:
        u = np.unique(batch.column("__ck").to_numpy(zero_copy_only=False))
        return pa.table({"__ck": pa.array(u, pa.int64())})

    cand_keys = pairs.map_batches(emit_keys, batch_format="pyarrow",
                                  zero_copy_batch=True) \
        .groupby("__part").map_groups(uniq_keys, batch_format="pyarrow")
    texts = ds.map_batches(lambda b: b.select([key_col, text_col]),
                           batch_format="pyarrow", zero_copy_batch=True)
    cand_texts = texts.join(cand_keys, "inner", num_partitions,
                            on=(key_col,), right_on=("__ck",)).materialize()
    ta = cand_texts.map_batches(
        lambda b: pa.table({"a": b.column(key_col),
                            "text_a": b.column(text_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    tb = cand_texts.map_batches(
        lambda b: pa.table({"b": b.column(key_col),
                            "text_b": b.column(text_col)}),
        batch_format="pyarrow", zero_copy_batch=True)
    return pairs.join(ta, "inner", num_partitions, on=("a",)) \
        .join(tb, "inner", num_partitions, on=("b",))


def prefix_block_pairs(ds, *, text_col: str = "text",
                       key_col: str = "doc_id", prefix_len: int = 50,
                       max_bucket: int = 4096):
    """Candidate pairs by PREFIX BLOCKING: two docs pair iff their first
    ``prefix_len`` characters are identical (the classic blocking-key
    candidate generator — template-derived near-dups share boilerplate
    heads). Deterministic and SQL-expressible, unlike the hash-defined
    LSH candidates, so the driver oracle can verify it exactly.

    Shuffle shape: only (prefix, key) rows move, hash-partitioned on
    the prefix into ~ncpu COARSE partitions (one Python call per
    partition, not per distinct prefix — at 10^8 mostly-singleton
    prefixes the per-group dispatch of `groupby(prefix).map_groups`
    would dominate); within a partition, equality is on the prefix
    STRING (no hash-collision false pairs) and only multi-doc prefix
    runs emit. Buckets above ``max_bucket`` are truncated to bound the
    O(n²) emission — at web scale a >4096-doc identical-prefix bucket
    is one template family and its pairs are redundant for dedup
    anyway."""
    def sig(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        if txt.null_count:
            # SQL semantics: NULL prefixes never match (grouping nulls
            # together would pair them)
            keep = pc.is_valid(txt)
            batch = batch.filter(keep)
            txt = txt.filter(keep)
        pfx = pc.utf8_slice_codeunits(txt, 0, prefix_len)
        return pa.table({"__pfx": pfx, "__k": batch.column(key_col)})

    def kern(sub: pa.Table) -> pa.Table:
        return _bucket_pairs(
            sub.column("__k").to_numpy(zero_copy_only=False), max_bucket)

    rows = ds.map_batches(sig, batch_format="pyarrow",
                          zero_copy_batch=True)
    return _distinct_pairs(_coarse_grouped(rows, ["__pfx"], kern))


def ngram_jaccard_pairs(pairs, ds, *, text_col: str = "text",
                        key_col: str = "doc_id", k: int = 5,
                        num_partitions: int | None = None):
    """Exact word-k-gram Jaccard for every (a, b) pair of ``pairs``,
    fully distributed: texts are attached via hash joins (semi-join
    reduced — see `_attach_pair_texts`), scoring is a vectorized
    map_batches stage. Returns (a, b, jaccard)."""
    import ray
    num_partitions = _join_partitions(num_partitions)
    # consumed twice (candidate-key derivation + the text joins)
    pairs = pairs.materialize()
    if pairs.count() == 0:
        # same guard as near_dedup: an empty pairs dataset strips the
        # join-key schema from the empty cand_keys side and the join errors
        return ray.data.from_arrow(pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}))

    def score(batch: pa.Table) -> pa.Table:
        sims = pair_jaccard(batch.column("text_a"),
                            batch.column("text_b"), k)
        return pa.table({"a": batch.column("a"), "b": batch.column("b"),
                         "jaccard": pa.array(sims, pa.float64())})

    withtexts = _attach_pair_texts(pairs, ds, key_col=key_col,
                                   text_col=text_col,
                                   num_partitions=num_partitions)
    return withtexts.map_batches(score, batch_format="pyarrow")


def simhash_candidates(ds, *, text_col: str = "text",
                       key_col: str = "doc_id", max_hamming: int = 3,
                       concurrency=4, max_bucket: int = 512):
    """Near-dup candidate pairs via banded SimHash.

    A 64-bit simhash split into 4 × 16-bit bands: any two hashes within
    Hamming distance 3 agree on at least one band (pigeonhole), so a
    groupby on (band, band_value) finds all such pairs; an exact popcount
    verify filters the bucket collisions. Same shuffle shape as MinHash
    LSH — only (band, value, key, simhash) quads move."""

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)  # Arrow column straight in
        keys = np.asarray(batch.column(key_col).to_numpy(zero_copy_only=False))
        sh = simhash(texts)
        n = len(texts)
        parts = []
        for b in range(4):
            band_val = ((sh >> np.uint64(16 * b)) &
                        np.uint64(0xFFFF)).astype(np.int32)
            parts.append(pa.table({
                "band": pa.array(np.full(n, b, dtype=np.int32)),
                "value": pa.array(band_val),
                "key": pa.array(keys),
                "simhash": pa.array(sh.view(np.int64)),
            }))
        return pa.concat_tables(parts)

    bucketed = ds.map_batches(sigs, batch_format="pyarrow",
                              concurrency=concurrency)

    def emit_pairs(batch: pa.Table) -> pa.Table:
        # vectorized: upper-triangle index pairs + SWAR popcount verify
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        hashes = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        order = np.argsort(keys)[:max_bucket]  # cap degenerate buckets
        keys, hashes = keys[order], hashes[order]
        n = len(keys)
        if n < 2:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "hamming": pa.array([], pa.int64())})
        ii, jj = np.triu_indices(n, 1)
        ham = _popcount64(hashes[ii] ^ hashes[jj])
        hit = ham <= max_hamming
        return pa.table({"a": pa.array(keys[ii[hit]], pa.int64()),
                         "b": pa.array(keys[jj[hit]], pa.int64()),
                         "hamming": pa.array(ham[hit], pa.int64())})

    pairs = _coarse_grouped(bucketed, ["band", "value"], emit_pairs)
    return _distinct_pairs(pairs, extra_cols=("hamming",))


class _HyperplaneBucketActor:
    """Stateful stage: hyperplane tables drawn once per actor from a
    fixed seed (identical across actors — deterministic bucketing)."""

    def __init__(self, dim: int, nbits: int, n_tables: int,
                 vec_col: str, key_col: str, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_tables, dim, nbits)) \
            .astype(np.float32)
        self.vec_col, self.key_col = vec_col, key_col
        self.n_tables, self.nbits = n_tables, nbits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import _normalize, _stack
        vecs = _normalize(_stack(batch.column(self.vec_col)))
        n = len(vecs)
        parts = []
        for t in range(self.n_tables):
            bits = (vecs @ self.planes[t]) > 0
            bucket = np.zeros(n, dtype=np.int64)
            for j in range(self.nbits):
                bucket |= bits[:, j].astype(np.int64) << j
            parts.append(pa.table({
                "table": pa.array(np.full(n, t, dtype=np.int32)),
                "bucket": pa.array(bucket),
                "key": batch.column(self.key_col),
                "vec": batch.column(self.vec_col),
            }))
        return pa.concat_tables(parts)


def embedding_near_dup_lsh(ds, *, threshold: float = 0.85,
                           vec_col: str = "embedding",
                           key_col: str = "vec_id", nbits: int = 4,
                           n_tables: int = 16, dtype=np.float64,
                           max_bucket: int = 4096, concurrency=4):
    """Embedding near-dup pairs, bucketed scale path (beyond the
    broadcast regime of `embedding_near_dup`): `n_tables` independent
    hyperplane-LSH tables bucket each vector; exact cosine verification
    runs per (table, bucket) group, so no all-pairs matmul and no
    driver-side matrix. Vectors shuffle grouped by bucket only; the
    result is exact on every CANDIDATE pair (approximate recall governed
    by n_tables × nbits — near-identical vectors collide in some table
    with probability ≈ 1 - (1 - c^nbits)^n_tables, c = 1 - θ/π).

    Returns distinct (id_a, id_b, score) with id_a < id_b, score ≥
    threshold."""
    bucketed = ds.map_batches(
        _HyperplaneBucketActor,
        fn_constructor_kwargs={
            "dim": _embedding_dim(ds, vec_col), "nbits": nbits,
            "n_tables": n_tables, "vec_col": vec_col, "key_col": key_col},
        batch_format="pyarrow", concurrency=concurrency)

    def verify(group: pa.Table) -> pa.Table:
        from .similarity import _normalize, _stack
        keys = group.column("key").to_numpy(zero_copy_only=False)
        order = np.argsort(keys)[:max_bucket]  # cap degenerate buckets
        n = len(order)
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "score": pa.array([], pa.float64())})
        if n < 2:
            return empty
        keys = keys[order]
        vecs = _normalize(_stack(group.column("vec").take(pa.array(order)),
                                 dtype=dtype))
        scores = vecs @ vecs.T
        ii, jj = np.triu_indices(n, 1)
        hit = scores[ii, jj] >= threshold
        if not hit.any():
            return empty
        return pa.table({
            "a": pa.array(keys[ii[hit]], pa.int64()),
            "b": pa.array(keys[jj[hit]], pa.int64()),
            "score": pa.array(np.round(scores[ii[hit], jj[hit]], 6),
                              pa.float64()),
        })

    # NOT _coarse_grouped: these rows carry full vectors, and a coarse
    # partition would hold n_tables × corpus/ncpu of them in ONE task's
    # sort. groupby keeps per-task memory block-bounded, and the group
    # count is bounded by CONSTRUCTION (≤ 2^nbits × n_tables occupied
    # buckets), so per-group dispatch never explodes here.
    pairs = bucketed.groupby(["table", "bucket"]).map_groups(
        verify, batch_format="pyarrow")
    out = _distinct_pairs(pairs, extra_cols=("score",))
    return out.map_batches(
        lambda b: pa.table({"id_a": b.column("a"), "id_b": b.column("b"),
                            "score": b.column("score")}),
        batch_format="pyarrow", zero_copy_batch=True)


def _embedding_dim(ds, vec_col: str) -> int:
    """Vector dimensionality from the first row (schema-level metadata
    read — fixed-size lists would carry it; ragged lists need one row).
    Empty dataset → 1 (the pipeline then runs on zero rows and returns
    an empty pairs dataset instead of crashing at build time)."""
    first = ds.select_columns([vec_col]).limit(1).take(1)
    if not first:
        return 1
    return len(first[0][vec_col])


def embedding_near_dup(ds, *, threshold: float = 0.4,
                       vec_col: str = "embedding", key_col: str = "vec_id",
                       dtype=np.float64):
    """Embedding-cosine near-duplicate pairs: all (a < b) with
    cosine(a, b) ≥ threshold.

    The full normalized matrix is collected once on the driver and
    broadcast via ray.put; each batch then does one matmul against it —
    exact, no shuffle. This is the small-side-broadcast regime (matrix ≤
    a few GB); beyond that use `lsh_topk`-style bucketing from
    ops/similarity.py as the approximate scale path."""
    import ray
    from parquet_rs_ray.ops.similarity import _normalize, _stack

    side = pa.concat_tables(
        ds.select_columns([key_col, vec_col]).iter_batches(
            batch_format="pyarrow"))
    all_keys = side.column(key_col).to_numpy(zero_copy_only=False)
    order = np.argsort(all_keys)
    all_keys = all_keys[order]
    mat = _normalize(_stack(side.column(vec_col), dtype=dtype))[order]
    bcast = ray.put((all_keys, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        keys_all, m_all = ray.get(bcast)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        vecs = _normalize(_stack(batch.column(vec_col), dtype=dtype))
        scores = vecs @ m_all.T  # (n, N)
        hit = (scores >= threshold) & (keys[:, None] < keys_all[None, :])
        ii, jj = np.nonzero(hit)
        return pa.table({
            "id_a": pa.array(keys[ii], pa.int64()),
            "id_b": pa.array(keys_all[jj], pa.int64()),
            "score": pa.array(np.round(scores[ii, jj], 6), pa.float64()),
        })

    return ds.map_batches(pairs, batch_format="pyarrow",
                          zero_copy_batch=True)


def dedup_against_index(ds, index_dir: str, *, text_col: str = "text",
                        mode: str = "auto",
                        num_partitions: int | None = None,
                        broadcast_budget_bytes: int | None = None):
    """Incremental ingestion dedup: drop rows whose ``text_col`` content
    hash already exists in a committed corpus's hash index
    (``job.hash_index_job``). The corpus itself is never re-read or
    shuffled — only its 8-byte-per-doc index moves.

    * ``mode="broadcast"`` — index fits worker heaps: load + sort once,
      ``ray.put``, searchsorted membership per batch (same probe as
      exact_dedup/decontam).
    * ``mode="join"`` — beyond-heap index (10^10+ docs): the index
      parquets stream as a Dataset and a distributed ``left_anti``
      hash join drops seen rows; nothing touches the driver.
    * ``mode="auto"`` — METADATA-ONLY probe: the summed size of the
      index parquet files (a stat call per file, no reads) stands in
      for the broadcast footprint, compared against the ops/regime.py
      worker-heap budget. Unlike the other auto ops, no aggregate needs
      materializing, so the probe is free in BOTH regimes.
    """
    import os

    import ray

    if mode == "auto":
        from .regime import DEFAULT_BROADCAST_BUDGET
        budget = broadcast_budget_bytes or DEFAULT_BROADCAST_BUDGET
        total = 0
        for root, _dirs, names in os.walk(index_dir):
            total += sum(os.path.getsize(os.path.join(root, f))
                         for f in names if f.endswith(".parquet"))
        # parquet hash files carry ≥8 bytes/row (near-random int64s
        # barely compress), so file bytes ≈ the in-memory array bound
        mode = "broadcast" if total <= budget else "join"

    if mode == "join":
        num_partitions = _join_partitions(num_partitions, n_joins=1)

        def tag(batch: pa.Table) -> pa.Table:
            h = _hash_strings(batch.column(text_col)).view(np.int64)
            return batch.append_column("__h", pa.array(h, pa.int64()))

        tagged = ds.map_batches(tag, batch_format="pyarrow",
                                zero_copy_batch=True)
        idx = ray.data.read_parquet(index_dir) \
            .rename_columns({"h": "__h"})
        return tagged.join(idx, "left_anti", num_partitions,
                           on=("__h",)).drop_columns(["__h"])

    if mode != "broadcast":
        raise ValueError(f"unknown dedup_against_index mode {mode!r}")
    import pyarrow.dataset as pads
    arr = pads.dataset(index_dir).to_table(columns=["h"]) \
        .column("h").to_numpy(zero_copy_only=False)
    seen_ref = ray.put(np.unique(arr))      # sorted + deduped once

    def drop_seen(batch: pa.Table) -> pa.Table:
        seen = ray.get(seen_ref)
        h = _hash_strings(batch.column(text_col)).view(np.int64)
        pos = np.searchsorted(seen, h)
        pos[pos == len(seen)] = 0
        hit = (seen[pos] == h) if len(seen) else np.zeros(len(h), bool)
        return batch.filter(pa.array(~hit))

    return ds.map_batches(drop_seen, batch_format="pyarrow",
                          zero_copy_batch=True)
