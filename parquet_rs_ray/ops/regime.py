"""Automatic broadcast ↔ join regime selection.

Six ops have two correct execution regimes whose tradeoff depends on
the size of a "small side" only known at run time:

  * ``exact_dedup``          — the winner (hash, key) set
  * ``line_dedup``           — the frequent-line (boilerplate) set
  * ``word_df_stats``        — the (word, df) vocabulary
  * ``decontaminate``        — the reference gram blocklist
  * ``dedup_against_index``  — the committed-corpus hash index (its
    auto probe is metadata-only: summed index file sizes, no
    materialization — see that op)
  * ``dedup_spans``          — the (dup chunk hash, winner) table

Broadcast is cheaper (no extra shuffles) but copies the set to every
node's object store and probes it per batch — wrong past worker heaps.
Join is fully distributed but pays 1–3 hash shuffles. Picking wrong at
100 TB either OOMs a worker or wastes shuffles; ``mode="auto"`` closes
that human-in-the-loop hazard: the op MATERIALIZES the would-be
broadcast side (an aggregate its broadcast plan computes anyway — the
probe is free when broadcast wins) and compares its object-store size
against a per-worker budget.

Budget default: 256 MiB. Rationale: `ray.put` broadcasts are read
zero-copy from each node's plasma store, but every probing kernel
(`pc.is_in` hash sets, searchsorted working sets) materializes
per-actor state proportional to the set, and a 1-CPU Ray worker's heap
share on a standard 4 GB/CPU node leaves low single-digit GiB — 256 MiB
keeps the set plus its per-actor probe structures comfortably inside
that with room for the streaming batch. Override per call via
``broadcast_budget_bytes`` when the cluster's nodes are bigger.

When auto flips to join, the materialized aggregate is discarded for
the ops whose join plan fuses its own counting (`line_dedup`,
`word_df_stats`) — one wasted aggregation pass, the price of not
knowing; callers who KNOW the side is beyond-heap should pass
``mode="join"`` explicitly.
"""

from __future__ import annotations

DEFAULT_BROADCAST_BUDGET: int = 256 << 20


def pick_regime(small_side_ds, budget_bytes: int | None = None):
    """Materialize the would-be broadcast side and pick the regime.

    Returns ``(mode, materialized_ds)`` with mode ``"broadcast"`` when
    the materialized object-store footprint fits the budget, else
    ``"join"``. The materialized dataset is returned so a broadcast
    consumer reuses it without recomputation (the probe is then free)."""
    budget = budget_bytes or DEFAULT_BROADCAST_BUDGET
    mds = small_side_ds.materialize()
    size = mds.size_bytes() or 0
    return ("broadcast" if size <= budget else "join"), mds
