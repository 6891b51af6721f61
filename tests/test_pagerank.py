"""PageRank (ops/graph.py::pagerank): exact fixed-point parity vs a
dense numpy replica, broadcast ≡ join regime bit-identity, partition
invariance, dangling handling, and degenerate shapes."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.graph import _PR_SCALE, pagerank

D_NUM, D_DEN = 850, 1000


def _ref_pagerank(edges, num_iters=20, damping=0.85):
    """Dense replica of the op's documented integer arithmetic."""
    d_num, d_den = int(round(damping * 1000)), 1000
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n, np.int64)
    for s, _ in edges:
        deg[idx[s]] += 1
    rank = np.full(n, _PR_SCALE // n, np.int64)
    base = ((d_den - d_num) * _PR_SCALE) // (d_den * n)
    for _ in range(num_iters):
        contrib = np.zeros(n, np.int64)
        for s, d in edges:
            si = idx[s]
            contrib[idx[d]] += (rank[si] + deg[si] // 2) // deg[si]
        share = int(rank[deg == 0].sum()) // n
        rank = base + (d_num * (contrib + share)) // d_den
    return {v: rank[idx[v]] / _PR_SCALE for v in nodes}


EDGES = [("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com"),
         ("c.com", "a.com"), ("d.com", "c.com"), ("d.com", "a.com"),
         ("e.com", "a.com"), ("a.com", "b.com"),  # parallel edge
         ("f.com", "g.com")]                      # g dangles


def _edges_ds(ray_session, edges=EDGES, blocks=1):
    import ray
    tbl = pa.table({"src": pa.array([s for s, _ in edges]),
                    "dst": pa.array([d for _, d in edges])})
    ds = ray.data.from_arrow(tbl)
    return ds.repartition(blocks) if blocks > 1 else ds


def _got(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["pagerank"]))


def test_pagerank_matches_dense_reference(ray_session):
    got = _got(pagerank(_edges_ds(ray_session), mode="broadcast"))
    ref = _ref_pagerank(EDGES)
    assert got == ref            # fixed-point: EXACT, not approx


def test_pagerank_join_regime_bit_identical(ray_session):
    b = _got(pagerank(_edges_ds(ray_session), mode="broadcast",
                      num_iters=7))
    j = _got(pagerank(_edges_ds(ray_session), mode="join", num_iters=7))
    assert b == j


def test_pagerank_partition_invariant(ray_session):
    one = _got(pagerank(_edges_ds(ray_session, blocks=1), num_iters=5))
    five = _got(pagerank(_edges_ds(ray_session, blocks=5), num_iters=5))
    assert one == five


def test_pagerank_auto_picks_broadcast_on_tiny_graph(ray_session):
    got = _got(pagerank(_edges_ds(ray_session), mode="auto"))
    assert got == _ref_pagerank(EDGES)


def test_pagerank_star_center_dominates(ray_session):
    edges = [(f"leaf{i}.com", "hub.com") for i in range(8)] \
        + [("hub.com", "leaf0.com")]
    got = _got(pagerank(_edges_ds(ray_session, edges=edges)))
    assert got == _ref_pagerank(edges)
    assert got["hub.com"] == max(got.values())
    # total mass stays ~1 (fixed-point floor drift only)
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_redistributes(ray_session):
    # b has no outlinks: its rank must flow back, not vanish
    edges = [("a", "b")]
    got = _got(pagerank(_edges_ds(ray_session, edges=edges),
                        num_iters=30))
    assert got == _ref_pagerank(edges, num_iters=30)
    assert got["b"] > got["a"] > 0


def test_pagerank_zero_iters_is_uniform(ray_session):
    got = _got(pagerank(_edges_ds(ray_session), num_iters=0))
    n = len({s for s, _ in EDGES} | {d for _, d in EDGES})
    assert set(got.values()) == {(_PR_SCALE // n) / _PR_SCALE}


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(st.data())
def test_pagerank_property_random_graphs(ray_session, data):
    """Random directed multigraphs (self-loops, parallel edges,
    dangling sinks): broadcast result must EXACTLY equal the dense
    integer-arithmetic reference."""
    n_nodes = data.draw(st.integers(2, 9))
    edges = data.draw(st.lists(
        st.tuples(st.integers(0, n_nodes - 1),
                  st.integers(0, n_nodes - 1)),
        min_size=1, max_size=25))
    edges = [(f"n{a}", f"n{b}") for a, b in edges]
    iters = data.draw(st.integers(0, 8))
    got = _got(pagerank(_edges_ds(ray_session, edges=edges, blocks=2),
                        num_iters=iters, mode="broadcast"))
    assert got == _ref_pagerank(edges, num_iters=iters)


def test_pagerank_int_keys_and_validation(ray_session):
    import ray
    tbl = pa.table({"src": pa.array([1, 2, 3], pa.int64()),
                    "dst": pa.array([2, 3, 1], pa.int64())})
    got = _got(pagerank(ray.data.from_arrow(tbl)))
    ref = _ref_pagerank([(1, 2), (2, 3), (3, 1)])
    assert got == ref
    with pytest.raises(ValueError):
        pagerank(_edges_ds(ray_session), damping=1.0)
    with pytest.raises(ValueError):
        pagerank(_edges_ds(ray_session), num_iters=-1)
    with pytest.raises(ValueError):
        pagerank(_edges_ds(ray_session), mode="nope")
