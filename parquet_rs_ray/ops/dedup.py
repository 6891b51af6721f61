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


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit content hash of a string/binary column.

    Hashes via numpy over fixed-width chunks: fold each value's bytes
    into a uint64 with multiply-xor rounds (no Python per-char loop)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    barr = arr.cast(pa.binary()) if not pa.types.is_binary(arr.type) else arr
    bufs = barr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int32, count=len(barr) + 1,
                            offset=barr.offset * 4).astype(np.int64)
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


def exact_dedup(ds, text_col: str, key_col: str, *, mode: str = "broadcast",
                num_partitions: int = 32):
    """Keep the min-`key_col` row per distinct `text_col` value.

    Stage 1 (combiner, no shuffle): per-batch dedup → (hash, key) only.
    Stage 2 (shuffle): groupby(hash) over the compact pairs → winner key.
    Stage 3, two regimes:
      * ``mode="broadcast"`` — winner keys fit memory (≤ ~10^9): collect
        once, ``ray.put``, filter the original dataset per batch.
      * ``mode="join"`` — winner set itself is huge (near-unique corpus
        at 10^12 docs): distributed hash join of the tagged dataset
        against the winner (hash, key) pairs; nothing touches the driver.
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

    if mode == "join":
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

    keep = np.sort(winners.select_columns(["k"]).to_pandas()["k"].to_numpy())
    keep_ref = ray.put(keep)  # broadcast once; read per task, not per batch

    def filter_winners(batch: pa.Table) -> pa.Table:
        keep_arr = ray.get(keep_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        mask = np.isin(keys, keep_arr, assume_unique=False)
        return batch.filter(pa.array(mask))

    return ds.map_batches(filter_winners, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------- minhash

from hashlib import blake2b


def _h64(s: str) -> int:
    """Deterministic 64-bit hash (built-in hash() is salted per process —
    it would break cross-worker LSH bucketing)."""
    return int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little")


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


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-gram (word-level) hashes of one document."""
    words = text.split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    wh = _hash_strings(pa.array(words, pa.string()))
    return _window_fold(wh, k)


def _batch_shingles(texts: list[str], k: int = 5):
    """All documents' shingle hashes in ONE vectorized pass.

    Returns (flat shingle hashes, per-doc segment start offsets). Words
    of every doc are hashed in a single `_hash_strings` call; windows
    never cross doc boundaries."""
    all_words: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        w = t.split()
        if len(w) < k:
            w = w + [""] * (k - len(w))
        all_words.extend(w)
        counts[i] = len(w)
    wh = _hash_strings(pa.array(all_words, pa.string()))
    doc_starts = np.zeros(len(texts) + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_starts[1:])
    n_sh = counts - k + 1
    flat = _window_fold(wh, k) if len(wh) >= k else np.zeros(0, np.uint64)
    # valid window starts: [doc_start, doc_start + n_sh) per doc
    seg_starts = np.zeros(len(texts) + 1, dtype=np.int64)
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
        texts = batch.column(self.text_col).to_pylist()
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

    def emit_pairs(batch: pa.Table) -> pa.Table:
        keys = sorted(batch.column("key").to_pylist())[:max_bucket]
        out = []
        if len(keys) >= 2:
            for i in range(len(keys)):
                for j in range(i + 1, len(keys)):
                    out.append({"a": keys[i], "b": keys[j]})
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64())]))

    pairs = buckets.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pyarrow")
    # distinct pairs (a pair can fire in several bands)
    def dedup_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)
    return pairs.groupby("a").map_groups(dedup_batch, batch_format="pyarrow")


def simhash(texts: list[str], nbits: int = 64) -> np.ndarray:
    """64-bit simhash per document over word-level features (vectorized:
    one `_hash_strings` pass per doc, bit votes and sign fold in numpy)."""
    out = np.zeros(len(texts), dtype=np.uint64)
    shifts = np.arange(nbits, dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        hs = _hash_strings(pa.array(words, pa.string()))
        bits = (hs[:, None] >> shifts) & np.uint64(1)
        score = bits.sum(axis=0).astype(np.int64) * 2 - len(words)
        signs = (score > 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(signs << shifts)
    return out


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity of two documents."""
    sa = set(map(int, _shingle_hashes(a, k)))
    sb = set(map(int, _shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


# ------------------------------------------------- near-dedup pipelines

def jaccard_for_pairs(pairs, texts_by_key: dict, k: int = 5):
    """Exact word-k-gram Jaccard for each (a, b) candidate pair, run as a
    map_batches stage over the pairs dataset with the candidate texts
    broadcast once via ray.put (candidates ≪ corpus, so the broadcast
    side is tiny even when the corpus is 10^12 docs)."""
    import ray
    texts_ref = ray.put(texts_by_key)

    def score(batch: pa.Table) -> pa.Table:
        texts = ray.get(texts_ref)
        a = batch.column("a").to_pylist()
        b = batch.column("b").to_pylist()
        sims = [ngram_jaccard(texts[x], texts[y], k) for x, y in zip(a, b)]
        return batch.append_column("jaccard", pa.array(sims, pa.float64()))

    return pairs.map_batches(score, batch_format="pyarrow",
                             zero_copy_batch=True)


def near_dedup(ds, *, text_col: str = "text", key_col: str = "doc_id",
               jaccard_threshold: float = 0.8, k: int = 5,
               num_perm: int = 64, bands: int = 16, concurrency=4):
    """Full near-duplicate removal: MinHash-LSH candidates → exact
    n-gram-Jaccard verify → drop every doc with a verified duplicate of
    smaller key. Returns the surviving Dataset.

    Shuffle payload is (band, bucket, key) triples only; texts are
    re-read for just the candidate keys with a pushed-down filter, so
    the wide steps never move document bodies."""
    import ray
    pairs = minhash_lsh_candidates(ds, text_col=text_col, key_col=key_col,
                                   num_perm=num_perm, bands=bands,
                                   concurrency=concurrency)
    pair_tbl = pa.concat_tables(pairs.iter_batches(batch_format="pyarrow"))
    if pair_tbl.num_rows == 0:
        return ds
    cand_keys = np.unique(np.concatenate([
        pair_tbl.column("a").to_numpy(zero_copy_only=False),
        pair_tbl.column("b").to_numpy(zero_copy_only=False)]))

    def gather_cand(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.select([key_col, text_col]).filter(
            pa.array(np.isin(keys, cand_keys)))

    cand_tbl = pa.concat_tables(
        ds.map_batches(gather_cand, batch_format="pyarrow",
                       zero_copy_batch=True).iter_batches(
                           batch_format="pyarrow"))
    texts_by_key = dict(zip(cand_tbl.column(key_col).to_pylist(),
                            cand_tbl.column(text_col).to_pylist()))
    scored = jaccard_for_pairs(ray.data.from_arrow(pair_tbl), texts_by_key,
                               k=k)
    verified = pa.concat_tables(scored.iter_batches(batch_format="pyarrow"))
    jac = verified.column("jaccard").to_numpy(zero_copy_only=False)
    dupes = np.unique(np.maximum(
        verified.column("a").to_numpy(zero_copy_only=False),
        verified.column("b").to_numpy(zero_copy_only=False))
        [jac >= jaccard_threshold])
    dupes_ref = ray.put(dupes)

    def drop_dupes(batch: pa.Table) -> pa.Table:
        drop = ray.get(dupes_ref)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(~np.isin(keys, drop)))

    return ds.map_batches(drop_dupes, batch_format="pyarrow",
                          zero_copy_batch=True)


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
        texts = batch.column(text_col).to_pylist()
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
        keys = batch.column("key").to_numpy(zero_copy_only=False)
        hashes = batch.column("simhash").to_numpy(zero_copy_only=False) \
            .view(np.uint64)
        order = np.argsort(keys)[:max_bucket]  # cap degenerate buckets
        keys, hashes = keys[order], hashes[order]
        out = {"a": [], "b": [], "hamming": []}
        for i in range(len(keys)):
            x = hashes[i] ^ hashes[i + 1:]
            ham = np.zeros(len(x), dtype=np.int64)
            while x.any():
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            hit = np.nonzero(ham <= max_hamming)[0]
            for j in hit:
                out["a"].append(int(keys[i]))
                out["b"].append(int(keys[i + 1 + j]))
                out["hamming"].append(int(ham[j]))
        return pa.table({"a": pa.array(out["a"], pa.int64()),
                         "b": pa.array(out["b"], pa.int64()),
                         "hamming": pa.array(out["hamming"], pa.int64())})

    pairs = bucketed.groupby(["band", "value"]).map_groups(
        emit_pairs, batch_format="pyarrow")

    def dedup_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates(subset=["a", "b"])
        return pa.Table.from_pandas(df, preserve_index=False)

    return pairs.groupby("a").map_groups(dedup_batch, batch_format="pyarrow")


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
