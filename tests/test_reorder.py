"""Intra-block RLE-friendly row reordering (reorder.py; SIGMOD 2020
"Column Partition and Permutation for RLE" from PAPERS.md)."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from parquet_rs_ray.reorder import (PERM_COL, choose_sort_keys,
                                    maybe_reorder, reorder_block,
                                    restore_order)
from parquet_rs_ray.selector import CodecSelector

RNG = np.random.default_rng(7)


def _rng():
    return np.random.default_rng(7)


def _table_bytes(tbl: pa.Table, mode) -> tuple[int, bool]:
    """(encoded bytes, perm column present) for one block, no Ray."""
    from parquet_rs_ray.page import encode_column_chunk
    sel = CodecSelector()
    out = maybe_reorder(tbl, mode, sel)
    total = 0
    for idx, name in enumerate(out.column_names):
        rows = encode_column_chunk(name, idx, out.column(name),
                                   selector=sel, path="", block_id="b",
                                   block_rows=out.num_rows,
                                   n_cols=out.num_columns)
        total += sum(r["encoded_size"] for r in rows)
    return total, PERM_COL in out.column_names


def _correlated_table(n=4096) -> pa.Table:
    """Four perfectly-correlated 256-distinct columns: one ordering
    collapses all four, so preserve-mode's measured gate must accept
    (saves ~4x8 bits/row vs a ~12 bit/row permutation)."""
    rng = _rng()
    z = rng.integers(0, 256, n)
    return pa.table({
        "k1": z.astype(np.int32),
        "k2": ((z * 7 + 3) % 256).astype(np.int32),
        "k3": ((z * 31 + 11) % 256).astype(np.int32),
        "k4": ((z * 13 + 5) % 256).astype(np.int32),
        "payload": rng.random(n),
    })


def _uncorrelated_table(n=4096) -> pa.Table:
    """One low-cardinality column among high-cardinality ones: the sort
    can save at most ~8 bits/row while the permutation costs ~12 —
    preserve-mode's gate must reject (zero overhead vs off)."""
    rng = _rng()
    return pa.table({
        "k1": rng.integers(0, 256, n).astype(np.int32),
        "x": rng.random(n),
        "y": rng.integers(0, 1 << 60, n),
    })


def test_choose_sort_keys_ascending_cardinality():
    n = 4000
    tbl = pa.table({
        "hi": RNG.integers(0, 1 << 40, n),          # too distinct
        "three": RNG.integers(0, 3, n).astype(np.int32),
        "forty": RNG.integers(0, 40, n).astype(np.int32),
        "two": RNG.integers(0, 2, n).astype(np.int32),
        "f": RNG.random(n),                          # float: ineligible
    })
    assert choose_sort_keys(tbl) == ["two", "three", "forty"]
    assert choose_sort_keys(tbl.slice(0, 1)) == []


def test_reorder_block_multiset_and_preserve():
    tbl = _correlated_table()
    keys = choose_sort_keys(tbl)
    s = reorder_block(tbl, keys)
    assert s.num_rows == tbl.num_rows and PERM_COL not in s.column_names
    k1 = s.column("k1").to_numpy()
    assert (np.diff(k1) >= 0).all()          # actually sorted
    p = reorder_block(tbl, keys, preserve=True)
    assert restore_order(p).equals(tbl)      # exact order restored
    with pytest.raises(ValueError):
        reorder_block(p, keys, preserve=True)  # marker collision


def test_auto_mode_shrinks_low_cardinality_columns():
    tbl = _correlated_table()
    off, _ = _table_bytes(tbl, "off")
    auto, has_perm = _table_bytes(tbl, "auto")
    assert not has_perm
    assert auto < 0.8 * off


def test_preserve_gate_accepts_on_correlated_and_rejects_on_random():
    win, has_perm = _table_bytes(_correlated_table(), "preserve")
    off, _ = _table_bytes(_correlated_table(), "off")
    assert has_perm and win < off
    lose, has_perm = _table_bytes(_uncorrelated_table(), "preserve")
    off2, _ = _table_bytes(_uncorrelated_table(), "off")
    assert not has_perm and lose == off2     # rejected: zero overhead


def test_roundtrip_multiset_auto_and_exact_preserve(ray_session):
    import ray
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    tbl = _correlated_table(2000)
    allkeys = [(n, "ascending") for n in tbl.column_names]
    for mode, exact in (("auto", False), ("preserve", True)):
        dec = decode_dataset(encode_dataset(
            ray.data.from_arrow(tbl), reorder=mode))
        got = pa.concat_tables(
            list(dec.iter_batches(batch_format="pyarrow")))
        assert PERM_COL not in got.column_names
        if exact:
            assert got.equals(tbl)            # original order restored
        else:
            assert got.sort_by(allkeys).equals(tbl.sort_by(allkeys))


def test_preserve_restores_order_under_projection(ray_session):
    import ray
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    tbl = _correlated_table(2000)
    enc = encode_dataset(ray.data.from_arrow(tbl), reorder="preserve")
    dec = decode_dataset(enc, columns=["k2", "payload"])
    got = pa.concat_tables(list(dec.iter_batches(batch_format="pyarrow")))
    assert sorted(got.column_names) == ["k2", "payload"]
    assert got.column("payload").equals(tbl.column("payload"))
    assert got.column("k2").equals(tbl.column("k2"))


def test_lineitem_auto_multiset_equal_and_smaller(ray_session):
    import pyarrow.parquet as pq
    tbl = pq.read_table("/root/testdata/sf0.001/lineitem.parquet")
    off, _ = _table_bytes(tbl, "off")
    auto, _ = _table_bytes(tbl, "auto")
    assert auto < off
    sel = CodecSelector()
    out = maybe_reorder(tbl, "auto", sel)
    allkeys = [(n, "ascending") for n in tbl.column_names]
    assert out.sort_by(allkeys).equals(tbl.sort_by(allkeys))


def test_reorder_deterministic_under_ties():
    """Stable tie handling: two encodes of the same block produce the
    same row order (deterministic output bytes)."""
    tbl = _correlated_table()
    sel = CodecSelector()
    a = maybe_reorder(tbl, "auto", sel)
    b = maybe_reorder(tbl, "auto", sel)
    assert a.equals(b)


def test_reorder_with_nulls_roundtrips(ray_session):
    """Null-heavy sort keys: nulls order at_end, preserve mode restores
    exact order, auto mode keeps the multiset (nulls included)."""
    import ray
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    rng = np.random.default_rng(5)
    n = 1500
    k = rng.integers(0, 16, n).astype(np.int32)
    kmask = rng.random(n) < 0.3
    tbl = pa.table({
        "k": pa.array(np.where(kmask, None, k).tolist(), pa.int32()),
        "s": pa.array(np.where(rng.random(n) < 0.2, None,
                               np.char.add("v", k.astype(str))).tolist(),
                      pa.string()),
        "payload": rng.random(n),
    })
    dec = decode_dataset(encode_dataset(
        ray.data.from_arrow(tbl), reorder="preserve"))
    got = pa.concat_tables(list(dec.iter_batches(batch_format="pyarrow")))
    if PERM_COL in got.column_names:          # gate may accept or reject
        raise AssertionError("perm column must be dropped by decode")
    # preserve mode: either the gate rejected (original order trivially
    # kept) or it accepted and order was restored — both mean equality
    assert got.equals(tbl)
    dec = decode_dataset(encode_dataset(
        ray.data.from_arrow(tbl), reorder="auto"))
    got = pa.concat_tables(list(dec.iter_batches(batch_format="pyarrow")))
    import pandas as pd
    a = got.to_pandas().sort_values(
        ["k", "s", "payload"], na_position="last").reset_index(drop=True)
    b = tbl.to_pandas().sort_values(
        ["k", "s", "payload"], na_position="last").reset_index(drop=True)
    assert a.equals(b)
