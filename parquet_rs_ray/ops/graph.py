"""Distributed link-graph ops: connected components, duplicate
clusters, and host-level PageRank.

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


_PR_SCALE = 10 ** 15        # fixed-point rank unit (fits float64 exactly)


def _pr_node_degrees(edges, src_col: str, dst_col: str):
    """ONE shuffle builds the node universe AND out-degrees: per-batch
    partials emit (node, out=count) for distinct srcs and (node, 0)
    for distinct dsts, then groupby-sum."""
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        sv = b.column(src_col).combine_chunks().value_counts()
        du = pc.unique(b.column(dst_col))
        return pa.table({
            "node": pa.concat_arrays([sv.field("values"), du]),
            "out": pa.concat_arrays([
                sv.field("counts").cast(pa.int64()),
                pa.array(np.zeros(len(du), np.int64))])})

    return edges.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
        .groupby("node").sum("out")


def pagerank(edges, *, src_col: str = "src", dst_col: str = "dst",
             damping: float = 0.85, num_iters: int = 20,
             mode: str = "auto", broadcast_budget_bytes: int | None = None,
             num_partitions: int | None = None):
    """PageRank over a directed edge Dataset (``src_col`` → ``dst_col``,
    any key type; parallel edges count once per occurrence). Returns a
    Dataset ``(node, pagerank)`` over every node appearing as a source
    or destination. Dangling (zero-out-degree) mass redistributes
    uniformly; ``num_iters`` fixed power iterations (the web-graph
    standard; convergence tests belong to the caller's tolerance).

    DETERMINISM: all arithmetic is fixed-point int64 (rank unit
    ``1e-15``, damping as the rational round(damping·1000)/1000, per-
    edge round-half-up division) — grouped sums become associative, so
    the result is bit-identical across regimes, partitionings and
    runs, and the pytest oracle replays it exactly in dense numpy.

    Regimes (``ops/regime.py``; probe = the (node, out_degree)
    aggregate both plans need): **broadcast** holds the rank vector on
    the driver, each iteration is one map_batches over the (once-
    materialized) edges emitting (dst, contrib) partials + one tiny
    groupby-sum; **join** keeps ranks as a Dataset — per iteration one
    hash join (edges ⋈ ranks on src), one groupby-sum union'd with the
    node universe (so no-inbound nodes keep a row; no outer join), and
    one scalar dangling aggregate. K iterations ⇒ K small shuffles
    either way; the edge set shuffles only in join mode.

    Reference anchor: extension beyond parquet-rs (SURVEY §2 training-
    data family) — the Common-Crawl-style host-rank signal used for
    corpus quality weighting."""
    import pyarrow.compute as pc
    import ray

    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if num_iters < 0:
        raise ValueError("num_iters must be >= 0")
    d_num = int(round(damping * 1000))
    d_den = 1000

    from .regime import pick_regime
    node_deg = _pr_node_degrees(edges, src_col, dst_col)
    if mode == "auto":
        mode, node_deg = pick_regime(node_deg, broadcast_budget_bytes)
    elif mode in ("broadcast", "join"):
        node_deg = node_deg.materialize()
    else:
        raise ValueError(f"unknown mode {mode!r}")

    if mode == "broadcast":
        nd = pa.concat_tables(list(node_deg.iter_batches(
            batch_format="pyarrow", batch_size=None))).combine_chunks()
        order = pc.sort_indices(nd.column("node"))
        nodes = nd.column("node").take(order).combine_chunks()
        deg = nd.column("sum(out)").take(order).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(nodes)
        if n == 0:
            return ray.data.from_arrow(pa.table(
                {"node": pa.array([], pa.string()),
                 "pagerank": pa.array([], pa.float64())}))
        if n > (1 << 31):
            raise ValueError(
                "broadcast regime packs (src, dst) into src*n + dst "
                "int64 keys — beyond 2^31 nodes use mode='join'")
        rank = np.full(n, _PR_SCALE // n, np.int64)
        base = ((d_den - d_num) * _PR_SCALE) // (d_den * n)
        nodes_ref = ray.put(nodes)       # broadcast once, read per actor
        deg_ref = ray.put(deg)           # immutable: put once, not per iter

        # one-time edge indexing: hash the string keys against the node
        # table ONCE and collapse each block's parallel edges into
        # (src_idx, dst_idx, multiplicity) — iterations then run pure
        # integer kernels over compact blocks with no re-hashing (the
        # per-edge contrib is identical for parallel edges, so ×m keeps
        # the arithmetic bit-identical to the unrolled form)
        def to_idx(b: pa.Table) -> pa.Table:
            nodes_l = ray.get(nodes_ref)
            si = pc.index_in(b.column(src_col), value_set=nodes_l) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            di = pc.index_in(b.column(dst_col), value_set=nodes_l) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            key = si * n + di           # n < 2^31 in broadcast regime
            u, m = np.unique(key, return_counts=True)
            return pa.table({"s": pa.array(u // n), "d": pa.array(u % n),
                             "m": pa.array(m.astype(np.int64))})

        idx_edges = edges.map_batches(to_idx, batch_format="pyarrow",
                                      zero_copy_batch=True).materialize()
        for _ in range(num_iters):
            rank_ref = ray.put(rank)

            def contrib_partial(b: pa.Table, _r=rank_ref,
                                _g=deg_ref) -> pa.Table:
                r, dgv = ray.get(_r), ray.get(_g)
                s = b.column("s").to_numpy(zero_copy_only=False)
                d = b.column("d").to_numpy(zero_copy_only=False)
                m = b.column("m").to_numpy(zero_copy_only=False)
                dg = dgv[s]             # >0: s is a source by def.
                c = ((r[s] + dg // 2) // dg) * m
                u, inv = np.unique(d, return_inverse=True)
                sums = np.bincount(inv, weights=c.astype(np.float64))
                return pa.table({"i": pa.array(u),
                                 "c": pa.array(sums.astype(np.int64))})

            # partials are ≤ per-block-distinct-dst rows; the driver
            # folds them BATCH BY BATCH (no per-iteration shuffle
            # stage, and no concatenated partial table — driver
            # residency stays O(n) + one streaming batch even when the
            # aggregate partial count is edge-bound)
            contrib = np.zeros(n, np.int64)
            stream = idx_edges.map_batches(
                contrib_partial, batch_format="pyarrow",
                zero_copy_batch=True)
            for part in stream.iter_batches(batch_format="pyarrow",
                                            batch_size=None):
                np.add.at(contrib,
                          part.column("i").to_numpy(zero_copy_only=False),
                          part.column("c").to_numpy(zero_copy_only=False))
            share = int(rank[deg == 0].sum()) // n
            rank = base + (d_num * (contrib + share)) // d_den
        return ray.data.from_arrow(pa.table(
            {"node": nodes,
             "pagerank": pa.array(rank / _PR_SCALE, pa.float64())}))

    # ---- join regime: ranks stay a Dataset ----
    from .dedup import _join_partitions
    num_partitions = _join_partitions(num_partitions, n_joins=1)
    n = node_deg.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.string()),
             "pagerank": pa.array([], pa.float64())}))
    base = ((d_den - d_num) * _PR_SCALE) // (d_den * n)
    init = _PR_SCALE // n

    def init_ranks(b: pa.Table) -> pa.Table:
        return pa.table({"node": b.column("node"),
                         "out": b.column("sum(out)"),
                         "r": pa.array(np.full(len(b), init, np.int64))})

    ranks = node_deg.map_batches(init_ranks, batch_format="pyarrow",
                                 zero_copy_batch=True).materialize()

    def dangling_partial(b: pa.Table) -> pa.Table:
        m = pc.equal(b.column("out"), 0)
        s = pc.sum(pc.if_else(m, b.column("r"), pa.scalar(0, pa.int64())))
        return pa.table({"d": pa.array(
            [s.as_py() or 0], pa.int64())})

    def contrib_edge(b: pa.Table) -> pa.Table:
        r = b.column("r").to_numpy(zero_copy_only=False)
        o = b.column("out").to_numpy(zero_copy_only=False)
        return pa.table({"node": b.column(dst_col),
                         "c": pa.array((r + o // 2) // o),
                         "out": pa.array(np.zeros(len(b), np.int64))})

    # the union trick (cf. connected_components' change detection):
    # contrib rows carry out=0, universe rows carry c=0 and the true
    # out-degree — ONE groupby-sum re-derives both the inbound sum and
    # each node's out-degree, so no-inbound nodes keep a row without an
    # outer join and `out` survives into the next iteration for free
    zero_rows = node_deg.map_batches(
        lambda b: pa.table({"node": b.column("node"),
                            "c": pa.array(np.zeros(len(b), np.int64)),
                            "out": b.column("sum(out)")}),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    for _ in range(num_iters):
        share = ranks.map_batches(
            dangling_partial, batch_format="pyarrow",
            zero_copy_batch=True).sum("d") // n
        joined = edges.join(ranks, "inner", num_partitions,
                            on=(src_col,), right_on=("node",))
        contribs = joined.map_batches(contrib_edge,
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)

        def fold(b: pa.Table, _s=share) -> pa.Table:
            s = b.column("sum(c)").to_numpy(zero_copy_only=False)
            return pa.table({
                "node": b.column("node"),
                "out": b.column("sum(out)"),
                "r": pa.array(base + (d_num * (s + _s)) // d_den)})

        ranks = contribs.union(zero_rows).groupby("node") \
            .sum(["c", "out"]) \
            .map_batches(fold, batch_format="pyarrow",
                         zero_copy_batch=True).materialize()

    return ranks.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "pagerank": pa.array(
                b.column("r").to_numpy(zero_copy_only=False)
                / _PR_SCALE, pa.float64())}),
        batch_format="pyarrow", zero_copy_batch=True)


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
