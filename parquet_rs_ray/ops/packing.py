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
        n = len(toks)
        order = np.argsort(-toks, kind="stable")   # decreasing
        bin_of = np.empty(n, dtype=np.int64)
        bin_totals: list[int] = []
        # first-fit-decreasing; O(n·bins) worst case but bins with any
        # headroom are tracked in a simple open list — per-DOC control
        # flow only (never per token/byte), fine off the hot byte path
        open_bins: list[int] = []                  # indices into bin_totals
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
