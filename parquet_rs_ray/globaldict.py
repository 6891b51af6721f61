"""Global dictionary construction (the engine's only shuffle).

North-star requirement (SURVEY §2.10/§7.3): build a corpus-wide
dictionary for a low-cardinality skewed column (`lang`: Zipf long tail)
with an explicit salted groupby-aggregate, then broadcast the merged
dictionary via `ray.put` so encode actors read it without reshipping per
batch.

Two-stage shuffle with skew handling:
  1. map_batches: per-block distinct values (combiner — collapses each
     block to ≤ cardinality rows *before* any shuffle);
  2. groupby(salt): salt = hash(value) % num_salts spreads hot keys
     (en ≈ 60%) across partitions; per-salt dedup in map_groups;
  3. driver merge of the per-salt distinct sets (tiny), sorted for
     determinism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _block_distinct(num_salts: int, column: str):
    def fn(batch: pa.Table) -> pa.Table:
        vals = pc.drop_null(batch.column(column)).unique()
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        # the repo's ONE salt/partition kernel (null- and type-safe,
        # integer columns via splitmix64) — a second hash→salt
        # implementation here could silently drift from it
        from .ops.temporal import _key_part
        return pa.table({"value": vals,
                         "salt": _key_part(vals, num_salts)})
    return fn


def _dedup_group(batch: pa.Table) -> pa.Table:
    return pa.table({"value": batch.column("value").unique()})


def build_global_dictionary(ds, column: str, *, num_salts: int = 16) -> list:
    """Distinct values of `column` across the dataset, deterministic order.

    combiner → salted groupby → driver merge. The result is small by
    assumption (dictionary column); the shuffle moves only per-block
    distinct sets, never raw rows.
    """
    per_block = ds.select_columns([column]).map_batches(
        _block_distinct(num_salts, column), batch_format="pyarrow")
    per_salt = per_block.groupby("salt").map_groups(
        _dedup_group, batch_format="pyarrow")
    values = sorted(set(per_salt.to_pandas()["value"].tolist()))
    return values


def broadcast_dictionary(values: list):
    """ray.put once; encode actors resolve the ObjectRef in __init__."""
    import ray
    return ray.put(values)
