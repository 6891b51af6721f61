"""Distributed connected components + duplicate-cluster assignment.

Near-dedup (`ops/dedup.py::near_dedup`) DROPS the larger key of every
verified duplicate pair, which is the right call for corpus pruning but
loses the cluster structure training pipelines increasingly want
(pick-best-per-cluster, cluster-aware mixing, dup-count features).
`dup_clusters` keeps it: every document is labelled with the smallest
doc key reachable through verified-duplicate edges — the canonical
connected-components formulation of duplicate clustering.

The component labelling is BSP min-label propagation expressed in Ray
Data primitives (no graph library, no driver adjacency): per round,
every vertex's current label flows across its edges (one distributed
hash join), vertices take the min of what arrived (one groupby-min),
and the round's change count is a scalar aggregate — the only thing
the driver ever sees. Rounds needed = graph diameter; duplicate graphs
are boilerplate families (near-cliques), so diameter stays small —
`max_iters` guards the pathological chain case.

Scale shape per round: edges shuffle once (16-byte (src,dst) rows,
hash-partitioned), labels shuffle once; nothing is proportional to
text size, and each round's label state is materialized so lineage
does not stack across rounds. Matches the reference's engine scope as
an EXTENSION (reference has no graph ops; spec anchor is the dedup
family in SURVEY.md §2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import (_join_partitions, ngram_jaccard_pairs,
                    prefix_block_pairs)


def connected_components(edges, *, nodes=None, key_col: str = "node",
                         num_partitions: int | None = None,
                         max_iters: int = 64):
    """Label every vertex with the MIN vertex id of its connected
    component. ``edges`` is a Dataset with int64 columns ``a``/``b``
    (undirected, duplicates fine); ``nodes`` optionally supplies the
    full vertex universe as column ``key_col`` (vertices with no edges
    come back as singleton clusters). Returns (key_col, cluster_id).

    Raises if the graph has not converged after ``max_iters`` rounds
    (diameter > max_iters) rather than returning a wrong labelling.
    """
    import ray

    num_partitions = _join_partitions(num_partitions, n_joins=2)

    def symmetrize(batch: pa.Table) -> pa.Table:
        a = batch.column("a").cast(pa.int64()).combine_chunks()
        b = batch.column("b").cast(pa.int64()).combine_chunks()
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    # edges flow through every round — materialize the symmetric form
    # once; 16-byte rows, object-store friendly
    sym = edges.map_batches(symmetrize, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    n_edges = sym.count()

    if nodes is not None:
        def init_nodes(batch: pa.Table) -> pa.Table:
            k = batch.column(key_col).cast(pa.int64())
            return pa.table({"node": k, "label": k})
        labels = nodes.map_batches(init_nodes, batch_format="pyarrow",
                                   zero_copy_batch=True)
    else:
        def init_edge_nodes(batch: pa.Table) -> pa.Table:
            u = np.unique(batch.column("src").to_numpy(
                zero_copy_only=False))
            arr = pa.array(u, pa.int64())
            return pa.table({"node": arr, "label": arr})
        # distinct-ify: batch-local unique then a groupby-min collapses
        # cross-batch duplicates in the first round for free
        labels = sym.map_batches(init_edge_nodes, batch_format="pyarrow",
                                 zero_copy_batch=True)
    labels = labels.materialize()

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({key_col: batch.column("node"),
                         "cluster_id": batch.column("label")})

    if n_edges == 0:
        # no edges: every vertex is its own cluster (still dedup labels
        # in case the caller passed a non-distinct node list)
        out = labels.groupby("node").min("label")
        return out.map_batches(
            lambda b: pa.table({key_col: b.column("node"),
                                "cluster_id": b.column("min(label)")}),
            batch_format="pyarrow", zero_copy_batch=True)

    # Change detection rides inside the round's aggregate: old-label
    # rows carry their label again in an `old` column, propagated rows
    # carry an int64-max sentinel there, and groupby-min of BOTH columns
    # yields each node's new label alongside its previous one — no extra
    # comparison join per round. (Every edge endpoint is in the node
    # universe under both init paths; a sentinel surviving min(old)
    # would mean a node with no prior label, correctly counted as a
    # change.)
    sentinel = np.iinfo(np.int64).max

    def tag_old(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "label": b.column("label"),
                         "old": b.column("label")})

    def tag_moved(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("dst"),
                         "label": b.column("label"),
                         "old": pa.array(np.full(b.num_rows, sentinel,
                                                 np.int64))})

    def untag(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "label": b.column("min(label)"),
                         "old": b.column("min(old)")})

    def only_changed(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.less(b.column("label"), b.column("old")))

    for _ in range(max_iters):
        # one round: labels cross edges, vertices take the min
        prop = sym.join(labels, "inner", num_partitions,
                        on=("src",), right_on=("node",))
        moved = prop.map_batches(tag_moved, batch_format="pyarrow",
                                 zero_copy_batch=True)
        tagged = labels.map_batches(tag_old, batch_format="pyarrow",
                                    zero_copy_batch=True)
        new_labels = tagged.union(moved).groupby("node") \
            .min(["label", "old"]) \
            .map_batches(untag, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()
        # labels only ever decrease; a round with zero decreases is the
        # fixpoint. This scan runs over the just-materialized label
        # blocks — no join, one scalar to the driver.
        changed = new_labels.map_batches(
            only_changed, batch_format="pyarrow",
            zero_copy_batch=True).count()
        labels = new_labels
        if changed == 0:
            return labels.map_batches(finish, batch_format="pyarrow",
                                      zero_copy_batch=True)
    raise RuntimeError(
        f"connected_components: no fixpoint after {max_iters} rounds "
        f"(graph diameter exceeds max_iters; raise max_iters)")


def dup_clusters(ds, *, text_col: str = "text", key_col: str = "doc_id",
                 jaccard_threshold: float = 0.9, k: int = 5,
                 prefix_len: int = 50, method: str = "prefix",
                 num_perm: int = 64, bands: int = 16, concurrency=4,
                 num_partitions: int | None = None,
                 max_iters: int = 64):
    """Duplicate-cluster labelling over a document Dataset: candidate
    pairs (``method="prefix"`` = deterministic prefix blocking,
    SQL-replayable — the driver-oracle path; ``method="minhash"`` =
    MinHash-LSH candidates, the recall-robust path when dups don't
    share heads), exact word-``k``-gram Jaccard verification, then
    connected components over the verified edges. Every document gets
    (key_col, cluster_id) with cluster_id = the smallest doc key in its
    duplicate family; non-duplicated docs are singleton clusters of
    themselves."""
    if method == "prefix":
        cand = prefix_block_pairs(ds, text_col=text_col, key_col=key_col,
                                  prefix_len=prefix_len)
    elif method == "minhash":
        from .dedup import minhash_lsh_candidates
        cand = minhash_lsh_candidates(ds, text_col=text_col,
                                      key_col=key_col, num_perm=num_perm,
                                      bands=bands,
                                      concurrency=concurrency)
    else:
        raise ValueError(f"unknown method {method!r}")
    pairs = ngram_jaccard_pairs(
        cand, ds, text_col=text_col, key_col=key_col, k=k,
        num_partitions=num_partitions)
    thr = float(jaccard_threshold)

    def verified(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return b.filter(pc.greater_equal(b.column("jaccard"), thr)) \
            .select(["a", "b"])

    edges = pairs.map_batches(verified, batch_format="pyarrow",
                              zero_copy_batch=True)
    keys = ds.map_batches(lambda b: b.select([key_col]),
                          batch_format="pyarrow", zero_copy_batch=True)
    return connected_components(edges, nodes=keys, key_col=key_col,
                                num_partitions=num_partitions,
                                max_iters=max_iters)
