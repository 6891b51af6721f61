"""Test-set decontamination: drop corpus docs sharing any word k-gram
with a reference (evaluation/benchmark) set.

The standard LLM-training hygiene pass: before training, every corpus
document that shares even one word-k-gram with an eval set is removed
so benchmark numbers measure generalization, not memorization.

Regime: the reference side is SMALL (eval sets are 10^3–10^6 grams)
while the corpus is the 100 TB side — so this is a broadcast filter,
not a join: the reference's distinct shingle hashes are collected once,
sorted, `ray.put` into the object store, and every corpus task does a
vectorized `searchsorted` membership test against the shared read-only
array (zero-copy numpy view per worker). The corpus streams through one
map_batches filter — no shuffle, no driver materialization of corpus
data. If the reference side ever outgrew worker memory, the shape to
switch to is a hash-partitioned anti-join on gram hashes (the
`near_dedup` join machinery); documented, not needed for eval sets.

Gram definition is the repo-wide SQL-pinned tokenization (literal
single-space split, empties dropped, docs padded to k words — see
`dedup._words` / `_batch_shingles`), so the driver oracle replays the
filter exactly with DuckDB list ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _batch_shingles


def contamination_ngrams(ref_ds, *, text_col: str = "text",
                         k: int = 5) -> np.ndarray:
    """Distinct word-k-gram hashes of the (small) reference Dataset,
    sorted — the broadcast blocklist for `decontaminate`. Collected on
    the driver: the SMALL-side regime, like `asof_join_broadcast`."""
    parts = [np.zeros(0, np.uint64)]
    for batch in ref_ds.iter_batches(batch_format="pyarrow"):
        sh, _ = _batch_shingles(batch.column(text_col), k)
        parts.append(np.unique(sh))
    return np.unique(np.concatenate(parts))


def decontaminate(ds, ref_ds=None, *, blocklist: np.ndarray | None = None,
                  text_col: str = "text", k: int = 5, invert: bool = False,
                  mode: str = "auto", ref_text_col: str | None = None,
                  id_col: str = "doc_id",
                  num_partitions: int | None = None,
                  broadcast_budget_bytes: int | None = None):
    """Remove every document of ``ds`` whose word-k-gram set intersects
    the reference set's. Pass either ``ref_ds`` (a Dataset of reference
    texts, shingled here) or a precomputed sorted ``blocklist`` from
    `contamination_ngrams`. ``invert=True`` returns the CONTAMINATED
    docs instead (audit mode).

    ``mode="auto"`` (needs ``ref_ds``): shingle the reference
    DISTRIBUTED (never on the driver), materialize its distinct grams
    and pick this broadcast regime iff they fit
    ``broadcast_budget_bytes`` (ops/regime.py) — the materialized
    grams are reused as the blocklist, so the probe is free; past the
    budget it dispatches to `decontaminate_join` (which then needs
    ``id_col`` to be a unique row key of ``ds``)."""
    import ray

    if mode == "auto" and ref_ds is None and blocklist is not None:
        # a precomputed blocklist is already a driver-side array — the
        # caller paid its memory, broadcast is the only regime left
        mode = "broadcast"
    if mode == "auto":
        if ref_ds is None:
            raise ValueError("mode='auto' needs ref_ds or blocklist")
        from .regime import pick_regime
        rtc = ref_text_col or text_col

        def ref_grams(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"gram": pa.array([], pa.int64())})
            sh, _ = _batch_shingles(batch.column(rtc), k)
            return pa.table(
                {"gram": pa.array(np.unique(sh).view(np.int64))})

        grams = ref_ds.map_batches(ref_grams, batch_format="pyarrow",
                                   zero_copy_batch=True)
        picked, grams = pick_regime(grams, broadcast_budget_bytes)
        if picked == "join":
            return decontaminate_join(
                ds, ref_ds, text_col=text_col, ref_text_col=rtc, k=k,
                id_col=id_col, invert=invert,
                num_partitions=num_partitions)
        # bounded by the budget the probe just verified
        parts = [b.column("gram").to_numpy(zero_copy_only=False)
                 for b in grams.iter_batches(batch_format="pyarrow")]
        blocklist = np.unique(  # unique sorts (uint64 order = hash order)
            np.concatenate(parts or [np.zeros(0, np.int64)])
            .view(np.uint64))
    elif mode != "broadcast":
        raise ValueError(f"unknown decontaminate mode {mode!r}")

    if blocklist is None:
        if ref_ds is None:
            raise ValueError("need ref_ds or blocklist")
        blocklist = contamination_ngrams(
            ref_ds, text_col=ref_text_col or text_col, k=k)
    bl_ref = ray.put(np.ascontiguousarray(blocklist, dtype=np.uint64))

    def keep(batch: pa.Table) -> pa.Table:
        bl = ray.get(bl_ref)
        n = len(batch)
        if n == 0 or len(bl) == 0:
            return batch if not invert else batch.slice(0, 0)
        sh, seg = _batch_shingles(batch.column(text_col), k)
        pos = np.searchsorted(bl, sh)
        pos[pos == len(bl)] = len(bl) - 1
        hit = bl[pos] == sh
        doc_hit = np.zeros(n, dtype=bool)
        if hit.any():
            # every doc has >= 1 shingle (padded), so diff(seg) > 0
            doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                                np.diff(seg))
            doc_hit[doc_idx[hit]] = True
        return batch.filter(pa.array(doc_hit if invert else ~doc_hit))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def decontaminate_join(ds, ref_ds, *, text_col: str = "text",
                       ref_text_col: str = "text", k: int = 5,
                       id_col: str = "doc_id", invert: bool = False,
                       num_partitions: int | None = None):
    """Cross-corpus decontamination — BOTH sides big (e.g. "drop every
    doc sharing a 5-gram with corpus B"), where the broadcast blocklist
    of `decontaminate` would outgrow worker heaps.

    Fully distributed, no driver materialization: each side explodes to
    its DISTINCT gram hashes (corpus: distinct per doc via one lexsort,
    so a doc contributes each gram once; reference: distinct per
    block), a hash-partitioned LEFT-SEMI join on gram finds the
    contaminated (id, gram) rows, a groupby collapses them to one row
    per contaminated id, and a LEFT-ANTI (or INNER, ``invert=True``)
    join filters the corpus. Three shuffles of 16-byte gram rows +
    one id-join of the corpus — text never shuffles. Gram semantics are
    identical to `decontaminate` (same `_batch_shingles`, same padding),
    pinned by the parity test."""
    from .dedup import _id_type, _join_partitions
    from .temporal import _key_part

    P = _join_partitions(num_partitions)
    id_type = _id_type(ds, id_col)

    def corpus_grams(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"__id": batch.column(id_col),
                             "gram": pa.array([], pa.int64())})
        sh, seg = _batch_shingles(batch.column(text_col), k)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.diff(seg))
        order = np.lexsort((sh, doc_idx))
        d, s = doc_idx[order], sh[order]
        first = np.concatenate(
            ([True], (d[1:] != d[:-1]) | (s[1:] != s[:-1])))
        ids = batch.column(id_col).take(pa.array(d[first]))
        return pa.table({"__id": ids,
                         "gram": pa.array(s[first].view(np.int64))})

    def ref_grams(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({"gram": pa.array([], pa.int64())})
        sh, _ = _batch_shingles(batch.column(ref_text_col), k)
        return pa.table({"gram": pa.array(np.unique(sh).view(np.int64))})

    cg = ds.map_batches(corpus_grams, batch_format="pyarrow",
                        zero_copy_batch=True)
    rg = ref_ds.map_batches(ref_grams, batch_format="pyarrow",
                            zero_copy_batch=True)
    hits = cg.join(rg, "left_semi", P, on=("gram",))

    # collapse (id, gram) hits to ONE row per contaminated id with a
    # schema-stable map_groups (a bare groupby().count() emits
    # SCHEMA-LESS empty blocks for hash partitions holding zero
    # contaminated ids — the common case at scale — which crash the
    # final id join); per-batch distinct first so only distinct
    # (id, partition) rows shuffle
    def distinct_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column("__id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out = pa.table({"__id": ids.unique()})
        return out.append_column(
            "__ipart", _key_part(out.column("__id"), P))

    def fold_ids(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"__id": pa.array([], id_type)})
        ids = group.column("__id").combine_chunks()
        return pa.table({"__id": ids.unique()})

    contaminated = hits.map_batches(distinct_ids, batch_format="pyarrow",
                                    zero_copy_batch=True) \
        .groupby("__ipart").map_groups(fold_ids, batch_format="pyarrow")
    # Ray's sort-based groupby FORWARDS empty upstream blocks (the gram
    # join emits one per hit-less partition) as SCHEMA-LESS empties
    # without calling fold_ids, and map_batches skips them too — the
    # final id join then crashes resolving __id on an empty right
    # partition. repartition rebuilds blocks from rows, dropping the
    # poisoned empties; cheap here — one row per contaminated id, the
    # small side by construction.
    contaminated = contaminated.repartition(P)
    jt = "inner" if invert else "left_anti"
    return ds.join(contaminated, jt, P, on=(id_col,), right_on=("__id",))
