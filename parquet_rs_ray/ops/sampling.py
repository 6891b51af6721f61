"""Deterministic sampling and dataset splitting (training-data ops).

Web-scale training pipelines need REPRODUCIBLE row selection: a re-run
must pick the same sample / split on any cluster shape and any
partition order, and a downstream job must be able to recompute
membership from the row alone. `ds.random_sample` can't promise that,
so both operators here key on a non-negative integer id column with a
fixed multiplicative hash (Knuth's 2654435761 mod 2^32):

    bucket(key) = ((key mod 2^32) * 2654435761) mod 2^32

Selection is then a pure row property — embarrassingly parallel
map_batches, NO shuffle, no driver state — and the arithmetic is
SQL-expressible exactly (HUGEINT in DuckDB), so the driver oracle
checks both operators bit-for-bit.

Scale shape: at 10^12 rows both ops are a single streaming filter /
append pass; sampling feeds directly into `write_parquet` without ever
materializing, and split labels compose with any downstream groupby
(the label is deterministic, so a failed run resumes by recomputing).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def _hash_bucket(keys: np.ndarray) -> np.ndarray:
    """((key mod 2^32) * 2654435761) mod 2^32, exact in uint64 (the
    product of two <2^32 values never overflows 64 bits)."""
    k = keys.astype(np.uint64) % _M32
    with np.errstate(over="ignore"):
        return (k * _KNUTH) % _M32


def _key_buckets(batch: pa.Table, key_col: str):
    """(bucket array, validity mask) for a batch's key column. Null
    keys get no bucket — excluded from samples, last split label —
    mirroring SQL's NULL comparison semantics in the oracle."""
    col = batch.column(key_col)
    valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
    keys = col.cast(pa.int64()).fill_null(0) \
        .to_numpy(zero_copy_only=False)
    if (keys < 0).any():
        raise ValueError(f"hash sampling requires non-negative "
                         f"{key_col!r} values (SQL %% differs on "
                         f"negatives)")
    return _hash_bucket(keys), valid


def sample_rate_threshold(rate_ppm: int) -> int:
    """The bucket threshold for a parts-per-million rate — exposed so
    the SQL oracle can embed the identical constant."""
    if not 0 <= rate_ppm <= 1_000_000:
        raise ValueError("rate_ppm must be in [0, 1e6]")
    return rate_ppm * (1 << 32) // 1_000_000


def hash_sample(ds, *, key_col: str, rate_ppm: int):
    """Deterministic ~``rate_ppm``/10^6 sample: keep rows whose hash
    bucket falls below the rate's share of the 2^32 bucket space.
    Membership depends only on the key value — stable across runs,
    partitionings and cluster sizes."""
    thresh = np.uint64(sample_rate_threshold(rate_ppm))

    def keep(batch: pa.Table) -> pa.Table:
        b, valid = _key_buckets(batch, key_col)
        return batch.filter(pa.array((b < thresh) & valid))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def split_cut_points(weights) -> list[tuple[str, int]]:
    """[(label, upper_bucket_bound)] with exact integer bounds
    floor(cum_weight/total * 2^32) — exposed for the SQL oracle. The
    last label's bound is forced to 2^32 so every bucket gets exactly
    one label."""
    items = list(weights.items()) if isinstance(weights, dict) \
        else list(weights)
    if len(items) < 2:
        raise ValueError("need at least two splits")
    total = sum(w for _, w in items)
    if total <= 0:
        raise ValueError("split weights must sum > 0")
    if any(w < 0 for _name, w in items):
        # validate EVERY weight incl. the last: a negative tail weight
        # would yield non-monotone bounds and silently mislabel every
        # row instead of erroring
        raise ValueError("negative split weight")
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name, w in items[:-1]:
        cum += w
        out.append((name, int(cum / total * (1 << 32))))
    out.append((items[-1][0], 1 << 32))
    return out


def hash_split(ds, *, key_col: str, weights, split_col: str = "split"):
    """Deterministic train/val/test (any number of named fractions)
    split: appends ``split_col`` with each row's label, assigned by
    contiguous hash-bucket ranges so the split is exhaustive and
    disjoint. ``weights`` = ordered (label, fraction) pairs or dict.
    Null keys get the LAST label (SQL CASE ELSE parity)."""
    cuts = split_cut_points(weights)
    bounds = np.array([b for _, b in cuts], dtype=np.uint64)
    labels = pa.array([n for n, _ in cuts], pa.string())

    def lab(batch: pa.Table) -> pa.Table:
        b, valid = _key_buckets(batch, key_col)
        idx = np.searchsorted(bounds, b, side="right")
        idx[~valid] = len(cuts) - 1
        return batch.append_column(
            split_col, labels.take(pa.array(idx.astype(np.int64))))

    return ds.map_batches(lab, batch_format="pyarrow",
                          zero_copy_batch=True)


def stratified_hash_sample(ds, *, key_col: str, group_col: str,
                           rates_ppm: dict, default_ppm: int = 0):
    """Per-group deterministic sampling — the training-mixture staple
    ("keep 100% of en-wiki, 3% of common-crawl"): each row's keep
    threshold comes from its ``group_col`` value's entry in
    ``rates_ppm`` (parts-per-million; groups absent from the dict and
    null groups use ``default_ppm``). Membership stays a pure row
    property (same multiplicative hash as `hash_sample`), so the sample
    is reproducible on any cluster shape with NO shuffle — one
    streaming map_batches filter. The group→threshold map rides inside
    the task closure (a few dozen entries), never per-batch shipping."""
    groups = list(rates_ppm.keys())
    thresholds = np.array(
        [sample_rate_threshold(rates_ppm[g]) for g in groups] +
        [sample_rate_threshold(default_ppm)], dtype=np.uint64)
    group_arr = pa.array(groups)

    def keep(batch: pa.Table) -> pa.Table:
        b, valid = _key_buckets(batch, key_col)
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        idx = pc.index_in(g, value_set=group_arr) \
            .fill_null(len(groups)) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array((b < thresholds[idx]) & valid))

    return ds.map_batches(keep, batch_format="pyarrow",
                          zero_copy_batch=True)


def sample_to_token_budget(ds, *, key_col: str, group_col: str,
                           budgets_tokens: dict, text_col: str = "text"):
    """Down-sample each group to an expected TOKEN budget — the data-
    mixing staple stated the way mixtures are actually specified
    ("20 M tokens of en, 5 M of de"), instead of hand-derived rates.

    Pass 1 computes exact per-group word totals with a map-side combine
    (each batch emits one (group, tokens) row per distinct group; only
    those tiny partials shuffle). Each budgeted group's rate is then
    ``min(1, budget/total)`` in exact integer ppm arithmetic, and pass
    2 is the deterministic `stratified_hash_sample` filter — a pure row
    property, NO shuffle, reproducible on any cluster shape, and
    SQL-expressible end to end (the oracle recomputes totals, rates and
    the hash threshold bit-for-bit). Groups without a budget are
    DROPPED (rate 0). Sampling stays document-level, so the realized
    token count CONCENTRATES on the budget rather than hitting it
    exactly (relative error ~ doc-length spread / sqrt(expected docs));
    an exact-count cut would need a global sort by hash — one
    all-to-all this op deliberately avoids.

    Returns ``(sampled_ds, plan)`` where ``plan[group] =
    {"total_tokens", "rate_ppm"}`` for every budgeted group."""
    from .textstats import _split_words

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        _flat, counts, _idx = _split_words(batch.column(text_col))
        enc = g.dictionary_encode()
        idx = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
        keep = idx >= 0                    # null groups have no budget
        sums = np.bincount(idx[keep], weights=counts[keep],
                           minlength=len(enc.dictionary))
        return pa.table({group_col: enc.dictionary,
                         "tokens": pa.array(sums.astype(np.int64))})

    totals = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True) \
        .groupby(group_col).sum("tokens").to_pandas()
    total_by_group = dict(zip(totals[group_col], totals["sum(tokens)"]))
    rates: dict = {}
    plan: dict = {}
    for g, budget in budgets_tokens.items():
        total = int(total_by_group.get(g, 0))
        ppm = min(1_000_000, budget * 1_000_000 // total) if total else 0
        rates[g] = ppm
        plan[g] = {"total_tokens": total, "rate_ppm": ppm}
    out = stratified_hash_sample(ds, key_col=key_col, group_col=group_col,
                                 rates_ppm=rates, default_ppm=0)
    return out, plan
