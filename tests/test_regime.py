"""mode="auto" broadcast↔join regime selection (ops/regime.py).

Parity: auto must equal BOTH forced modes bit-exactly on the same
input, whichever regime the probe picks. Selection: a tiny
``broadcast_budget_bytes`` must force the join regime, a huge one the
broadcast regime — asserted through output equality with the forced
modes plus a direct probe unit test.
"""

import numpy as np
import pyarrow as pa
import pytest

HUGE = 1 << 40
TINY = 1


@pytest.fixture()
def docs():
    texts = [f"unique line {i}\nCOOKIE BANNER common words here"
             for i in range(30)]
    texts[7] = None
    texts[11] = texts[3]  # exact duplicate pair
    return pa.table({
        "doc_id": pa.array(range(30), pa.int64()),
        "text": pa.array(texts),
    })


def _df(ds, cols, key="doc_id"):
    return ds.to_pandas()[cols].sort_values(key).reset_index(drop=True)


def test_pick_regime_probe(ray_session):
    import ray
    from parquet_rs_ray.ops.regime import pick_regime
    ds = ray.data.from_arrow(pa.table({"x": list(range(1000))}))
    mode, mds = pick_regime(ds, HUGE)
    assert mode == "broadcast"
    assert mds.count() == 1000  # materialized side is reusable
    mode, _ = pick_regime(ds, TINY)
    assert mode == "join"


def test_exact_dedup_auto_matches_both_modes(ray_session, docs):
    import ray
    from parquet_rs_ray.ops.dedup import exact_dedup
    cols = ["doc_id", "text"]
    outs = {}
    for tag, kw in [("b", dict(mode="broadcast")),
                    ("j", dict(mode="join", num_partitions=4)),
                    ("auto_b", dict(mode="auto",
                                    broadcast_budget_bytes=HUGE)),
                    ("auto_j", dict(mode="auto",
                                    broadcast_budget_bytes=TINY,
                                    num_partitions=4))]:
        ds = ray.data.from_arrow(docs).filter(
            lambda r: r["text"] is not None)
        outs[tag] = _df(exact_dedup(ds, "text", "doc_id", **kw), cols)
    assert outs["auto_b"].equals(outs["b"])
    assert outs["auto_j"].equals(outs["j"])
    assert outs["b"].equals(outs["j"])
    assert 11 not in set(outs["b"]["doc_id"])  # dup loses to min key


def test_line_dedup_auto_matches_both_modes(ray_session, docs):
    import ray
    from parquet_rs_ray.ops.clean import line_dedup
    cols = ["doc_id", "text", "lines_dropped"]
    b = _df(line_dedup(ray.data.from_arrow(docs), mode="broadcast"), cols)
    j = _df(line_dedup(ray.data.from_arrow(docs), mode="join",
                       num_partitions=4), cols)
    ab = _df(line_dedup(ray.data.from_arrow(docs), mode="auto",
                        broadcast_budget_bytes=HUGE), cols)
    aj = _df(line_dedup(ray.data.from_arrow(docs), mode="auto",
                        broadcast_budget_bytes=TINY,
                        num_partitions=4), cols)
    assert ab.equals(b) and aj.equals(j) and b.equals(j)
    assert all("COOKIE BANNER" not in (t or "") for t in b["text"])


def test_word_df_stats_auto_matches_both_modes(ray_session, docs):
    import ray
    from parquet_rs_ray.ops.textstats import word_df_stats
    cols = ["doc_id", "n_words", "sum_df", "min_df"]
    b = _df(word_df_stats(ray.data.from_arrow(docs)), cols)
    j = _df(word_df_stats(ray.data.from_arrow(docs), mode="join",
                          num_partitions=4), cols)
    ab = _df(word_df_stats(ray.data.from_arrow(docs), mode="auto",
                           broadcast_budget_bytes=HUGE), cols)
    aj = _df(word_df_stats(ray.data.from_arrow(docs), mode="auto",
                           broadcast_budget_bytes=TINY,
                           num_partitions=4), cols)
    assert ab.equals(b) and aj.equals(j) and b.equals(j)


def test_decontaminate_auto_matches_both_modes(ray_session, docs):
    import ray
    from parquet_rs_ray.ops.decontam import decontaminate, decontaminate_join
    # words are literal single-space split, so "3\nCOOKIE" is ONE word:
    # the ref's tail 5-gram (3\nCOOKIE BANNER common words here)
    # matches doc 3 (and its duplicate 11) only
    ref = pa.table({"text": pa.array(
        ["zzz 3\nCOOKIE BANNER common words here",
         "totally unrelated reference text"])})
    cols = ["doc_id", "text"]

    def corpus():
        return ray.data.from_arrow(docs).filter(
            lambda r: r["text"] is not None)

    b = _df(decontaminate(corpus(), ray.data.from_arrow(ref)), cols)
    j = _df(decontaminate_join(corpus(), ray.data.from_arrow(ref),
                               num_partitions=4), cols)
    ab = _df(decontaminate(corpus(), ray.data.from_arrow(ref),
                           mode="auto", broadcast_budget_bytes=HUGE), cols)
    aj = _df(decontaminate(corpus(), ray.data.from_arrow(ref),
                           mode="auto", broadcast_budget_bytes=TINY,
                           num_partitions=4), cols)
    assert ab.equals(b) and aj.equals(j) and b.equals(j)
    # doc 3 (and its duplicate 11) share a 5-gram with the eval set
    assert 3 not in set(b["doc_id"])


def test_unknown_modes_raise(ray_session, docs):
    import ray
    from parquet_rs_ray.ops.clean import line_dedup
    from parquet_rs_ray.ops.dedup import exact_dedup
    from parquet_rs_ray.ops.decontam import decontaminate
    from parquet_rs_ray.ops.textstats import word_df_stats
    ds = ray.data.from_arrow(docs)
    with pytest.raises(ValueError):
        line_dedup(ds, mode="nope").count()
    with pytest.raises(ValueError):
        word_df_stats(ds, mode="nope").count()
    with pytest.raises(ValueError):
        exact_dedup(ds, "text", "doc_id", mode="nope").count()
    with pytest.raises(ValueError):
        decontaminate(ds, ds, mode="nope").count()
    with pytest.raises(ValueError):
        decontaminate(ds, mode="auto")  # auto needs ref_ds
