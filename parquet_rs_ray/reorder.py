"""Intra-block row reordering for run-length-friendly encoding.

Grounded in "Column Partition and Permutation for Run Length Encoding
in Columnar Databases" (SIGMOD 2020, PAPERS.md): a relation's rows
carry no semantic order, so a block may be re-sorted by its
low-cardinality columns before encoding — the dict/RLE index streams
of those columns collapse from O(rows) runs to O(distinct) runs, and
correlated neighbours (e.g. lang → host) collapse with them. Sorting
also narrows per-page min/max stats on the sort keys, which sharpens
block pruning (`pipeline.prune_pages`) for free.

Two modes, chosen by the information theory of the trade:

* ``"auto"`` (multiset): sort, store nothing. Decode returns a
  row-equivalent multiset — the relational contract, and Ray Data
  already gives no cross-block order guarantee on unsorted pipelines.
  This is the mode the paper operates in (their DBMS reorders at load
  time and never restores).
* ``"preserve"``: additionally store each row's original position as a
  ``__row_perm__`` int64 column, encoded by the ordinary selector
  (FoR bit-pack ⇒ ~ceil(log2 n) bits/row), and restored+dropped by
  ``decode_batch``. Storing a permutation of n rows costs ≥ log2(n!)
  bits ≈ the entropy the sort removed from the key columns, so on
  uncorrelated data this LOSES by construction; it wins only when
  several correlated columns ride one ordering. The actor therefore
  trial-encodes (key columns, both orders) + (perm column) per block
  and keeps the permutation only on a measured net win — otherwise
  the block is encoded in its original order with zero overhead.

The reference has no counterpart (row order is sacred in Parquet
proper); the closest analogue is its dict-fallback trial logic
(`src/column/writer.rs:397-420`) — measure, then choose.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

PERM_COL = "__row_perm__"

# A column qualifies as a sort key when its value space is small enough
# that sorting can collapse it to few runs: distinct <= max(16, n/8).
_MAX_KEYS = 4


def _key_eligible(typ: pa.DataType) -> bool:
    return (pa.types.is_integer(typ) or pa.types.is_boolean(typ)
            or pa.types.is_string(typ) or pa.types.is_large_string(typ)
            or pa.types.is_date(typ) or pa.types.is_timestamp(typ)
            or pa.types.is_dictionary(typ))


def choose_sort_keys(tbl: pa.Table, max_keys: int = _MAX_KEYS) -> list[str]:
    """Low-cardinality columns, ascending distinct count (the paper's
    frequency-first ordering: the fewest-valued column gets the longest
    runs, each further key refines within the previous one's groups)."""
    n = tbl.num_rows
    if n < 2:
        return []
    cutoff = max(16, n // 8)
    cand = []
    for name in tbl.column_names:
        if name == PERM_COL:
            continue
        col = tbl.column(name)
        if not _key_eligible(col.type):
            continue
        d = pc.count_distinct(col).as_py()
        if 1 < d <= cutoff:
            cand.append((d, name))
    cand.sort()
    return [name for _, name in cand[:max_keys]]


def reorder_block(tbl: pa.Table, keys: list[str], *,
                  preserve: bool = False) -> pa.Table:
    """Sort the block by ``keys``; with ``preserve`` append the original
    row positions as ``__row_perm__`` so decode can restore order."""
    if not keys:
        return tbl
    idx = pc.sort_indices(
        tbl, sort_keys=[(k, "ascending") for k in keys],
        null_placement="at_end")
    out = tbl.take(idx)
    if preserve:
        if PERM_COL in tbl.column_names:
            raise ValueError(f"input already has a {PERM_COL!r} column")
        out = out.append_column(
            PERM_COL, pa.array(idx.to_numpy(zero_copy_only=False)
                               .astype(np.int64)))
    return out


def _trial_bytes(selector, column: str, arr: pa.Array) -> int:
    """Selector-encoded size of one column as a single trial page."""
    from .codecs.base import physical_of_arrow, values_from_arrow
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    phys = physical_of_arrow(arr.type)
    tl = arr.type.byte_width if phys.value == "FIXED_LEN_BYTE_ARRAY" else 0
    _, values = values_from_arrow(arr)
    enc = selector.select_and_encode(phys, values, column=column,
                                     type_length=tl)
    return enc.total


def maybe_reorder(tbl: pa.Table, mode, selector=None) -> pa.Table:
    """Apply the configured reorder mode to one block.

    ``mode``: ``"off"`` | ``"auto"`` (multiset, always sorts when keys
    exist) | ``"preserve"`` (sort + perm column, only on measured win) |
    an explicit list of key column names (multiset).
    """
    if mode in (None, "off"):
        return tbl
    if isinstance(mode, (list, tuple)):
        return reorder_block(tbl, list(mode))
    if mode == "auto":
        return reorder_block(tbl, choose_sort_keys(tbl))
    if mode != "preserve":
        raise ValueError(f"unknown reorder mode {mode!r}")
    keys = choose_sort_keys(tbl)
    if not keys or selector is None:
        return tbl
    sorted_tbl = reorder_block(tbl, keys, preserve=True)
    before = sum(_trial_bytes(selector, k, tbl.column(k)) for k in keys)
    after = sum(_trial_bytes(selector, k, sorted_tbl.column(k))
                for k in keys)
    after += _trial_bytes(selector, PERM_COL, sorted_tbl.column(PERM_COL))
    return sorted_tbl if after < before else tbl


def restore_order(tbl: pa.Table) -> pa.Table:
    """Inverse of ``preserve`` mode: put rows back in original order by
    the stored positions and drop the marker column."""
    if PERM_COL not in tbl.column_names:
        return tbl
    perm = tbl.column(PERM_COL).to_numpy(zero_copy_only=False)
    inv = np.argsort(perm, kind="stable")
    return tbl.take(pa.array(inv)).drop_columns([PERM_COL])
