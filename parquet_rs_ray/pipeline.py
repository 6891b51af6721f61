"""Ray Data encode/decode pipelines.

Shape (SURVEY §3.1): `ray.data.read_parquet(shards)` →
`map_batches(EncodeActor, batch_format="pyarrow", zero_copy_batch=True,
concurrency=...)` (actor pool holding reusable dict builders / FSST
symbol tables) → encoded-page dataset → optional per-shard writer with a
checkpoint manifest. Decode is a second `map_batches` pass
(`DecodeActor`) that must round-trip every column byte-identical.

One input block ≙ one reference row group; page rows for a block always
stay within one output batch (map_batches emits one output table per
input block, and we never repartition between encode and decode).
"""

from __future__ import annotations

import re as _re
import uuid
from collections import defaultdict

import numpy as np
import pyarrow as pa

from .page import PAGE_SCHEMA, decode_page_row, encode_column_chunk
from .selector import CodecSelector

META_COLUMNS = ("path",)


def _pin_arrow_threads() -> None:
    """Cap Arrow's intra-op thread pools inside Ray workers. Each worker
    is scheduled as 1 CPU; Arrow's default pool is cpu_count threads, so
    a 31-actor pool would run 31×32 threads and thrash the node once the
    pool covers most cores (measured: per-actor throughput halves)."""
    if pa.cpu_count() > 2:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)


class EncodeActor:
    """Stateful encode stage: one selector (with reusable FSST tables /
    dictionary scratch) per actor, set up once in __init__ (not per batch)."""

    def __init__(self, block_codec: str | None = None,
                 enable_fsst: bool = True, force_codec: str | None = None,
                 reorder="off"):
        _pin_arrow_threads()
        self.selector = CodecSelector(enable_fsst=enable_fsst,
                                      force_codec=force_codec,
                                      block_codec=block_codec)
        self.reorder = reorder

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        # group by source path when present (read_parquet include_paths)
        if "path" in batch.column_names:
            paths = batch.column("path")
            data_tbl = batch.drop_columns(["path"])
            uniq = paths.unique().to_pylist()
            if len(uniq) == 1:
                groups = [(uniq[0], data_tbl)]
            else:
                import pyarrow.compute as pc
                groups = [(p, data_tbl.filter(pc.equal(paths, p))) for p in uniq]
        else:
            groups = [("", batch)]
        for path, tbl in groups:
            if self.reorder not in (None, "off"):
                from .reorder import maybe_reorder
                tbl = maybe_reorder(tbl, self.reorder, self.selector)
            block_id = uuid.uuid4().hex[:16]
            n_cols = tbl.num_columns
            for idx, name in enumerate(tbl.column_names):
                col = tbl.column(name)
                rows.extend(encode_column_chunk(
                    name, idx, col, selector=self.selector, path=path,
                    block_id=block_id, block_rows=tbl.num_rows, n_cols=n_cols))
        return pa.Table.from_pylist(rows, schema=PAGE_SCHEMA)


def _binary_views(arr) -> list[memoryview]:
    """Zero-copy memoryview per value of a non-null binary column (page
    payloads are never null): offsets + one buffer slice each, instead
    of `to_pylist()` copying every page's bytes into Python objects."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], np.int32, len(arr) + 1,
                        offset=arr.offset * 4)
    mv = memoryview(bufs[2]) if bufs[2] is not None else memoryview(b"")
    return [mv[off[i]:off[i + 1]] for i in range(len(arr))]


def decode_batch(batch: pa.Table) -> pa.Table:
    """Decode stage: page rows → original-schema table(s). Stateless —
    runs as Ray tasks; per-worker module caches (pa.Codec objects, FSST
    tables, Arrow types) persist across tasks in the worker process."""
    _pin_arrow_threads()
    if batch.num_rows == 0:
        return pa.table({})
    cols = {}
    for name in batch.column_names:
        c = batch.column(name)
        if name in ("data", "dict", "levels"):
            cols[name] = _binary_views(c)  # zero-copy payload views
        else:
            cols[name] = c.to_pylist()
    names = batch.column_names
    rows = [dict(zip(names, vals))
            for vals in zip(*(cols[n] for n in names))]
    blocks: dict[tuple, list[dict]] = defaultdict(list)
    for r in rows:
        blocks[(r["path"], r["block_id"])].append(r)
    out_tables = []
    for (_path, _bid), rs in blocks.items():
        by_col: dict[int, list[dict]] = defaultdict(list)
        for r in rs:
            by_col[r["col_idx"]].append(r)
        arrays, names = [], []
        for cidx in sorted(by_col):
            pages = sorted(by_col[cidx], key=lambda r: r["page_id"])
            if len(pages) != pages[0]["n_pages"]:
                from .errors import DecodeError
                raise DecodeError(
                    f"block {_bid!r} column {pages[0]['column']!r}: "
                    f"{len(pages)} pages, expected {pages[0]['n_pages']} "
                    "(block split across decode batches, or corrupt "
                    "page metadata)")
            parts = [decode_page_row(r) for r in pages]
            arr = pa.concat_arrays(parts) if len(parts) > 1 else parts[0]
            if len(arr) != pages[0]["block_rows"]:
                from .errors import DecodeError
                raise DecodeError(
                    f"block {_bid!r} column {pages[0]['column']!r}: "
                    f"decoded {len(arr)} rows, expected "
                    f"{pages[0]['block_rows']}")
            arrays.append(arr)
            names.append(pages[0]["column"])
        btbl = pa.table(dict(zip(names, arrays)))
        from .reorder import PERM_COL, restore_order
        if PERM_COL in names:
            btbl = restore_order(btbl)
        out_tables.append(btbl)
    if len(out_tables) == 1:
        return out_tables[0]
    return pa.concat_tables(out_tables, promote_options="default")


def encode_dataset(ds, *, concurrency=(1, 8), block_codec: str | None = None,
                   enable_fsst: bool = True, force_codec: str | None = None,
                   reorder="off"):
    """Dataset of original rows → Dataset of encoded page rows (streaming)."""
    return ds.map_batches(
        EncodeActor,
        fn_constructor_kwargs={"block_codec": block_codec,
                               "enable_fsst": enable_fsst,
                               "force_codec": force_codec,
                               "reorder": reorder},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        concurrency=concurrency)


def _normalize_predicates(predicate):
    """One ``(col, op, val)`` or a list of them (AND semantics)."""
    if not predicate:
        return []
    if isinstance(predicate, tuple):
        return [predicate]
    return list(predicate)


_DATE_RE = _re.compile(r"\d{4}-\d{2}-\d{2}")
_TIME_RE = _re.compile(r"\d{2}:\d{2}:\d{2}(?:\.\d+)?")


def _temporal_shape(s: str):
    """'2024-01-10' → 'date', '12:30:00[.ffffff]' → 'time',
    '2024-01-10 12:30:00[.ffffff]' → 'ts', trailing utc-offset →
    'tzts', anything else (plain strings: urls, text) → None. Strings
    that aren't temporal renderings keep raw min/max pruning."""
    if _DATE_RE.fullmatch(s):
        return "date"
    if _TIME_RE.fullmatch(s):
        return "time"
    d, sep, t = s.partition(" ")
    if sep and _DATE_RE.fullmatch(d):
        m = _TIME_RE.match(t)
        if m:
            return "ts" if m.end() == len(t) else "tzts"
    return None


_PRED_OPS = {
    "==": lambda mn, mx, v: mn <= v <= mx,
    ">": lambda mn, mx, v: mx > v,
    ">=": lambda mn, mx, v: mx >= v,
    "<": lambda mn, mx, v: mn < v,
    "<=": lambda mn, mx, v: mn <= v,
}


def _stats_can_match(st: dict, op: str, val) -> bool:
    """Sound typed min/max check: True unless the page's stats PROVE no
    row can satisfy ``col op val``. Typed comparisons mirror the
    reference's per-type sort orders (`src/basic.rs:284-341`): ints
    compare exactly (Python int/float cross-compare is exact, no float64
    rounding), bytes compare as order-preserving hex, decimals as exact
    Decimals. Any type mismatch or truncated max ⇒ conservatively True."""
    import datetime
    from decimal import Decimal, InvalidOperation

    mn, mx = st.get("min"), st.get("max")
    if mn is None or mx is None:
        return True
    check = _PRED_OPS[op]
    kind = st.get("kind")
    if st.get("trunc") and op in (">", ">=", "=="):
        return True  # truncated max under-reports the upper bound
    if kind == "bytes":
        if not isinstance(val, bytes):
            return True
        return check(mn, mx, val.hex())
    if kind == "str":
        # Mixed temporal granularity: a date predicate renders
        # '2024-01-10' while a timestamp bound renders
        # '2024-01-10 00:00:00' — a strict-prefix compare would
        # "prove" no-match for a midnight row and unsoundly prune.
        # Normalize to the bounds' rendering, mirroring the exact
        # post-decode filter's semantics (Arrow casts date→midnight
        # timestamp; pa.scalar truncates datetime→date). The shape
        # rule applies ONLY when both bounds actually parse as
        # temporal renderings — ordinary string columns (urls, text)
        # whose bounds merely contain hyphens/spaces keep raw min/max
        # compares, so pruning effectiveness is not lost on them:
        bshape = _temporal_shape(mn)
        if bshape is None or _temporal_shape(mx) != bshape:
            # plain string bounds (or mixed/unparsable): raw compare
            # is sound for string predicates; anything else keeps
            if bshape is None and _temporal_shape(mx) is None \
                    and isinstance(val, str):
                return check(mn, mx, val)
            return True
        if bshape == "tzts":
            return True  # tz-aware bound: no sound order
        if isinstance(val, (datetime.datetime, datetime.date,
                            datetime.time)):
            if getattr(val, "tzinfo", None) is not None:
                return True  # tz-aware strings don't order vs naive
            if isinstance(val, datetime.datetime):
                sval = str(val) if bshape == "ts" else (
                    str(val.date()) if bshape == "date" else None)
            elif isinstance(val, datetime.date):
                sval = str(val) if bshape == "date" else (
                    str(val) + " 00:00:00" if bshape == "ts" else None)
            else:  # datetime.time
                sval = str(val) if bshape == "time" else None
            if sval is None or _temporal_shape(sval) != bshape:
                return True
            val = sval
        if not isinstance(val, str):
            return True
        # kind "str" also covers timestamp/date columns rendered to
        # strings: a predicate string in a DIFFERENT rendering (ISO
        # 'T' separator vs the bounds' space form) does not order
        # against the bounds — a raw compare would unsoundly prune the
        # block holding the exact row, while the post-decode filter
        # parses both forms. Same-shape strings compare raw as before.
        if _temporal_shape(val) != bshape:
            return True
        return check(mn, mx, val)
    if kind == "dec":
        try:
            v = Decimal(val) if isinstance(val, (int, Decimal)) \
                else Decimal(str(val))
        except (InvalidOperation, TypeError, ValueError):
            return True
        return check(Decimal(mn), Decimal(mx), v)
    if kind in ("int", "float", "bool"):
        if not isinstance(val, (bool, int, float)):
            return True
        return check(mn, mx, val)
    return True


def provably_unmatched_blocks(batch: pa.Table, preds) -> set:
    """Block ids whose per-page min/max stats PROVE no row can match the
    AND of ``preds`` — conservative (CRC-guarded, bloom-assisted): any
    corrupt / unparsable / missing stat keeps the block. Only needs the
    metadata columns (block_id, column, stats_json[, stats_crc32]), so
    callers may feed a payload-free projected read of the page rows."""
    import json as _json

    from .page import stats_crc
    cols = {name: batch.column(name).to_pylist()
            for name in ("block_id", "column", "stats_json")}
    scrc = batch.column("stats_crc32").to_pylist() \
        if "stats_crc32" in batch.column_names \
        else [None] * batch.num_rows

    drop_blocks: set = set()
    for col, op, val in preds:  # AND semantics: any pred can drop
        can_match: dict = {}
        for i, (bid, c) in enumerate(zip(cols["block_id"],
                                         cols["column"])):
            if c != col:
                continue
            sj = cols["stats_json"][i]
            # stats integrity: a flipped min/max/bloom must disable
            # pruning (conservative keep + exact post-filter), never
            # silently drop matching blocks
            if scrc[i] is not None and stats_crc(sj) != scrc[i]:
                can_match[bid] = True
                continue
            try:
                st = _json.loads(sj)
            except ValueError:
                can_match[bid] = True
                continue
            if op == "==" and st.get("bloom") and isinstance(
                    val, (str, bytes, int)) and not isinstance(val, bool):
                from .page import bloom_might_contain
                page_ok = bloom_might_contain(st["bloom"], val) \
                    and _stats_can_match(st, op, val)
            else:
                page_ok = _stats_can_match(st, op, val)
            can_match[bid] = can_match.get(bid, False) or page_ok
        drop_blocks |= {bid for bid, ok in can_match.items() if not ok}
    return drop_blocks


def make_page_pruner(columns=None, predicate=None):
    """Per-batch page-row pruner: projection + block-level stats pruning
    (see prune_pages). Returns ``None`` when there is nothing to push."""
    preds = _normalize_predicates(predicate)
    pred_cols = {p[0] for p in preds}
    # preserve-mode reorder marker rides along under projection — its
    # pages are ~log2(n) bits/row and decode needs them to restore order
    from .reorder import PERM_COL
    keep_cols = (set(columns) | pred_cols | {PERM_COL}) if columns else None
    if not preds and keep_cols is None:
        return None

    def prune(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if not preds and keep_cols is not None:
            # projection-only pushdown: no stats deserialization needed
            colnames = batch.column("column").to_pylist()
            return batch.filter(
                pa.array([c in keep_cols for c in colnames]))
        drop_blocks = provably_unmatched_blocks(batch, preds)
        mask = []
        for bid, c in zip(batch.column("block_id").to_pylist(),
                          batch.column("column").to_pylist()):
            ok = bid not in drop_blocks
            if ok and keep_cols is not None:
                ok = c in keep_cols
            mask.append(ok)
        return batch.filter(pa.array(mask))

    return prune


def prune_pages(encoded_ds, *, columns=None, predicate=None):
    """Projection + predicate pushdown over the encoded page dataset
    (the feature the reference leaves unchecked, `README.md:67-81`):

    * ``columns`` — keep only these columns' pages (others are never
      decompressed or decoded);
    * ``predicate`` — ``(column, op, value)`` with op ∈ ==,<,<=,>,>= :
      drop whole BLOCKS whose per-page min/max stats prove no row can
      match (conservative — exact filtering still happens after decode).
    """
    prune = make_page_pruner(columns, predicate)
    if prune is None:
        return encoded_ds
    return encoded_ds.map_batches(prune, batch_format="pyarrow",
                                  zero_copy_batch=True, batch_size=None)


def make_exact_filter(columns=None, predicate=None):
    """Per-batch exact post-decode filter + projection. ``None`` when a
    plain pass-through would do."""
    preds = _normalize_predicates(predicate)
    if not preds and not columns:
        return None
    import pyarrow.compute as _pc
    kernels = {"==": _pc.equal, ">": _pc.greater,
               ">=": _pc.greater_equal, "<": _pc.less,
               "<=": _pc.less_equal}

    def exact(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and not batch.column_names:
            return batch  # schema-less empty: nothing to filter/select
        for col, op, val in preds:
            arr = batch.column(col)
            try:  # typed scalar: plain ints above int64 range (uint64
                # columns) fail pyarrow's scalar inference
                sval = pa.scalar(val, type=arr.type)
            except (pa.ArrowInvalid, pa.ArrowTypeError, OverflowError):
                if isinstance(val, str) and (
                        pa.types.is_timestamp(arr.type)
                        or pa.types.is_date(arr.type)
                        or pa.types.is_time(arr.type)):
                    # ISO-8601 strings ('T' or space separator) against
                    # temporal columns: pa.scalar(str, type=) converts
                    # strictly and raises; the string→temporal CAST
                    # parses (unparseable predicate strings raise a
                    # typed ArrowInvalid to the caller)
                    batch = batch.filter(kernels[op](
                        arr, _pc.cast(pa.scalar(val), arr.type)))
                    continue
                if isinstance(val, int) and pa.types.is_floating(
                        arr.type):
                    # value beyond the float type's range: a pure fold
                    # would be WRONG for ±inf/NaN cells (inf < 2**1100
                    # is True but inf < +any-finite-fold is not; NaN
                    # compares false everywhere). Substitute an exact
                    # equivalent comparison against ±inf instead:
                    #   x <  B (B>max) ⟺ x < +inf   x > B ⟺ x == +inf
                    #   x <= B        ⟺ x < +inf   x >= B ⟺ x == +inf
                    # (mirrored for B < −max); == folds to never.
                    if op == "==":
                        batch = batch.slice(0, 0)
                        continue
                    inf = pa.scalar(float("inf") if val > 0
                                    else float("-inf"), arr.type)
                    if (val > 0) == (op in ("<", "<=")):
                        batch = batch.filter(
                            kernels["<" if val > 0 else ">"](arr, inf))
                    else:
                        batch = batch.filter(_pc.equal(arr, inf))
                    continue
                if isinstance(val, int) and (
                        pa.types.is_integer(arr.type)
                        or pa.types.is_decimal(arr.type)):
                    # value outside the column type's domain: int and
                    # decimal types hold no ±inf/NaN, so the comparison
                    # constant-folds exactly (x==v: never; x<v with
                    # huge v: always; …) — passing the raw int to the
                    # kernel would TypeError. Non-numeric columns
                    # re-raise: an int predicate against a string
                    # column is a caller type error, not a fold
                    big = val > 0
                    always = {"==": False, ">": not big, ">=": not big,
                              "<": big, "<=": big}[op]
                    if always:
                        continue
                    batch = batch.slice(0, 0)
                    continue
                sval = val
            batch = batch.filter(kernels[op](arr, sval))
        return batch.select(columns) if columns else batch

    return exact


def decode_dataset(encoded_ds, *, columns=None, predicate=None):
    """Dataset of page rows → Dataset with the original schema
    (streaming). ``columns`` / ``predicate`` push projection and
    block-level stats pruning below the decode; the predicate is then
    applied exactly on the decoded rows."""
    if columns or predicate:
        encoded_ds = prune_pages(encoded_ds, columns=columns,
                                 predicate=predicate)
    out = encoded_ds.map_batches(
        decode_batch, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=None)
    exact = make_exact_filter(columns, predicate)
    if exact is not None:
        out = out.map_batches(exact, batch_format="pyarrow",
                              zero_copy_batch=True)
    return out


def roundtrip(ds, **kwargs):
    """encode → decode in one lazy pipeline (flagship correctness path)."""
    return decode_dataset(encode_dataset(ds, **kwargs))
