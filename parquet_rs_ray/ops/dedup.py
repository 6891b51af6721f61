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
    # pad data to matrix of 8-byte words per value, fold word by word
    max_words = int(np.ceil(lens.max() / 8)) if n and lens.max() > 0 else 0
    if max_words == 0:
        return out
    # gather into (n, max_words*8) padded byte matrix — bounded by chunk
    # size (pages/batches are capped), fine for batch-level vectorization
    idx = offsets[:-1, None] + np.arange(max_words * 8)[None, :]
    valid = idx < offsets[1:, None]
    gathered = np.where(valid, data[np.minimum(idx, total - 1)], 0).astype(np.uint8)
    words = gathered.reshape(n, max_words, 8).copy().view("<u8").reshape(n, max_words)
    for w in range(max_words):
        col = words[:, w]
        active = (w * 8) < lens
        out[active] = (out[active] ^ col[active]) * _FNV_PRIME
    out ^= np.uint64(0xFF51AFD7ED558CCD) * lens.astype(np.uint64)
    return out


def exact_dedup(ds, text_col: str, key_col: str):
    """Keep the min-`key_col` row per distinct `text_col` value.

    Stage 1 (combiner, no shuffle): per-batch dedup → (hash, key) only.
    Stage 2 (shuffle): groupby(hash) over the compact pairs → winner key.
    Stage 3 (broadcast-join-free): semi-join winners back by key via a
    second pass filter on the original dataset.
    """
    import ray

    def to_pairs(batch: pa.Table) -> pa.Table:
        h = _hash_strings(batch.column(text_col))
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((keys, h))
        hs, ks = h[order], keys[order]
        first = np.concatenate(([True], hs[1:] != hs[:-1]))
        return pa.table({"h": hs[first], "k": ks[first]})

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


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rolling k-gram (word-level) hashes of one document."""
    words = text.split()
    if len(words) < k:
        words = words + [""] * (k - len(words))
    joined = [" ".join(words[i:i + k]) for i in range(max(1, len(words) - k + 1))]
    return np.array([_h64(s) for s in joined], dtype=np.uint64)


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
    """(n, num_perm) minhash signatures; universal-hash permutations."""
    A, B = _minhash_params(num_perm)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    M = np.uint64((1 << 61) - 1)
    for i, t in enumerate(texts):
        sh = _shingle_hashes(t)
        # h_j(x) = (a_j * x + b_j) mod M, min over shingles — vectorized
        v = (sh[:, None] * A[None, :] + B[None, :]) % M
        out[i] = v.min(axis=0)
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
                           bands: int = 16, concurrency=4):
    """Candidate near-duplicate pairs via banded minhash LSH.

    map_batches(MinHashActor) → groupby(band, bucket) → pairs within
    buckets of size ≥ 2. Only (band, bucket, key) triples shuffle."""
    buckets = ds.map_batches(
        MinHashActor,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands,
                               "text_col": text_col, "key_col": key_col},
        batch_format="pyarrow", concurrency=concurrency)

    def emit_pairs(batch: pa.Table) -> pa.Table:
        keys = sorted(batch.column("key").to_pylist())
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
    """64-bit simhash per document over word-level features."""
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.split()
        if not words:
            continue
        hs = np.array([_h64(w) for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(nbits, dtype=np.uint64)) & np.uint64(1))
        score = bits.sum(axis=0) * 2 - len(words)
        out[i] = np.uint64(int("".join(
            "1" if s > 0 else "0" for s in score[::-1]), 2))
    return out


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact word-k-gram Jaccard similarity of two documents."""
    sa = set(map(int, _shingle_hashes(a, k)))
    sb = set(map(int, _shingle_hashes(b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
