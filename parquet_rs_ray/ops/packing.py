"""Sequence packing for LLM training batches: assign documents to
fixed-token-budget bins (context windows) with first-fit-decreasing,
one map_batches pass.

Scale shape: packing is embarrassingly parallel per partition — each
batch packs its own documents into bins and emits (bin_uid, doc_id,
n_tokens, bin_total, bin_fill). Bins never span batches (a bin is a
training sequence; locality inside one worker is the point — no
shuffle). Waste is bounded by the per-batch tail: FFD fills ≥ ~11/9 OPT
asymptotically, and the per-bin fill ratio is emitted so a pipeline can
monitor packing efficiency at 10^12 docs.

Token counts use the whitespace definition from ops/textstats.py
(count(' ')+1) so the same numbers are SQL-reproducible; swap in a real
tokenizer count column when available (`tokens_col`).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _ffd(toks: np.ndarray, bin_tokens: int):
    """First-fit-decreasing bin assignment; a single over-budget doc
    gets its own bin. Returns (bin index per doc, per-bin totals).
    O(n·bins) worst case but bins with any headroom are tracked in a
    simple open list — per-DOC control flow only (never per
    token/byte), fine off the hot byte path."""
    n = len(toks)
    order = np.argsort(-toks, kind="stable")       # decreasing
    bin_of = np.empty(n, dtype=np.int64)
    bin_totals: list[int] = []
    open_bins: list[int] = []                      # indices into bin_totals
    for i in order:
        t = int(toks[i])
        placed = -1
        for oi, b in enumerate(open_bins):
            if bin_totals[b] + t <= bin_tokens:
                placed = b
                bin_totals[b] += t
                if bin_tokens - bin_totals[b] < 1:
                    open_bins.pop(oi)
                break
        if placed < 0:
            placed = len(bin_totals)
            bin_totals.append(t)
            if t < bin_tokens:
                open_bins.append(placed)
        bin_of[i] = placed
    return bin_of, bin_totals


def pack_sequences(ds, *, key_col: str = "doc_id", text_col: str = "text",
                   tokens_col: str | None = None, bin_tokens: int = 4096):
    """Assign each document to a packing bin ≤ ``bin_tokens`` tokens
    (first-fit-decreasing per batch; a single over-long doc gets its own
    bin). Returns one row per document: (key, n_tokens, bin_uid,
    bin_total, bin_fill)."""

    def pack(batch: pa.Table) -> pa.Table:
        import uuid
        # null text / null token counts pack as 0-token docs — the
        # NaN from a null would astype to INT64_MIN and silently
        # corrupt every bin total
        if tokens_col is not None:
            tc = batch.column(tokens_col)
            if isinstance(tc, pa.ChunkedArray):
                tc = tc.combine_chunks()
            toks = tc.fill_null(0).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        else:
            toks = pc.add(pc.count_substring(batch.column(text_col), " "),
                          1).fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
        bin_of, bin_totals = _ffd(toks, bin_tokens)
        run = uuid.uuid4().hex[:12]                # bins never span batches
        totals = np.asarray(bin_totals, dtype=np.int64)[bin_of]
        return pa.table({
            key_col: batch.column(key_col),
            "n_tokens": pa.array(toks),
            "bin_uid": pa.array([f"{run}-{b}" for b in bin_of], pa.string()),
            "bin_total": pa.array(totals),
            "bin_fill": pa.array(
                np.round(totals / float(bin_tokens), 6), pa.float64()),
        })

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)


def concat_packed_sequences(ds, *, key_col: str = "doc_id",
                            ids_col: str = "ids",
                            bin_tokens: int = 4096,
                            eos_id: int | None = None):
    """Materialize actual training sequences: pack each batch's
    documents with FFD and emit ONE ROW PER BIN — ``input_ids``
    (members' token ids concatenated in ascending ``key_col`` order,
    each doc followed by ``eos_id`` when given), ``n_tokens``,
    ``n_docs`` and ``doc_ids``. The per-doc EOS counts against the
    ``bin_tokens`` budget; no MULTI-doc sequence exceeds it, but a
    single document whose ids (+EOS) alone exceed the budget is
    emitted INTACT in its own over-budget bin (``n_docs == 1``,
    ``n_tokens > bin_tokens``) — truncating or splitting a document is
    a training-policy decision this op refuses to make silently, and
    the oversize rows are identifiable for the caller to handle.

    Same scale shape as `pack_sequences`: bins never span batches, so
    the whole op is one map_batches pass — the flat id buffer is
    gathered into bin order with a vectorized ragged-slice gather
    (ops/kernels.py), no Python loop over documents or tokens, no
    shuffle."""
    from .kernels import ragged_positions

    def pack(batch: pa.Table) -> pa.Table:
        import uuid
        ids = batch.column(ids_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if ids.null_count:
            ids = ids.fill_null([])
        offs = ids.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        in_start, lens = offs[:-1], np.diff(offs)
        flat_in = ids.values.to_numpy(zero_copy_only=False)
        eff = lens + (1 if eos_id is not None else 0)
        bin_of, bin_totals = _ffd(eff, bin_tokens)
        n_bins = len(bin_totals)
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        kv = keys.to_numpy(zero_copy_only=False)
        order = np.lexsort((kv, bin_of))           # bin, then key
        olens = eff[order]
        out_total = int(olens.sum())
        tok_lens = lens[order]
        # output slots: per doc, tok_lens tokens then (optionally) EOS;
        # pre-fill with EOS and scatter the gathered tokens over it
        out = np.full(out_total, eos_id if eos_id is not None else 0,
                      flat_in.dtype if out_total else np.int32)
        starts_out = np.cumsum(olens) - olens
        out_slots = ragged_positions(starts_out, tok_lens)
        src = ragged_positions(in_start[order], tok_lens)
        out[out_slots] = flat_in[src]
        # per-bin boundaries (order is bin-sorted, bins 0..n_bins-1 all
        # non-empty by construction)
        bin_doc_counts = np.bincount(bin_of, minlength=n_bins)
        bin_tok_counts = np.bincount(bin_of, weights=eff,
                                     minlength=n_bins).astype(np.int64)
        seq_offs = np.concatenate(([0], np.cumsum(bin_tok_counts)))
        doc_offs = np.concatenate(([0], np.cumsum(bin_doc_counts)))
        run = uuid.uuid4().hex[:12]
        seqs = pa.LargeListArray.from_arrays(
            pa.array(seq_offs, pa.int64()),
            pa.array(out, pa.int32())).cast(pa.list_(pa.int32()))
        dids = pa.LargeListArray.from_arrays(
            pa.array(doc_offs, pa.int64()),
            keys.take(pa.array(order))).cast(pa.list_(keys.type))
        return pa.table({
            "bin_uid": pa.array([f"{run}-{b}" for b in range(n_bins)],
                                pa.string()),
            "input_ids": seqs,
            "n_tokens": pa.array(bin_tok_counts),
            "n_docs": pa.array(bin_doc_counts.astype(np.int64)),
            "doc_ids": dids,
        })

    return ds.map_batches(pack, batch_format="pyarrow", zero_copy_batch=True)
