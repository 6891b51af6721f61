"""Encoded-page representation + codec dispatch + per-page statistics.

≙ the reference page/column-chunk model (`/root/reference/src/column/page.rs:30-56`,
metadata `src/file/metadata.rs:294-309`, statistics `src/file/statistics.rs`):
one *page row* in the encoded dataset corresponds to one data page; a
column chunk is the ordered set of page rows sharing (path, block, column).

A page row carries the encoded values (`data`), the optional PLAIN dict
page (`dict`), the RLE'd def-levels/null bitmap (`levels`,
≙ `src/encodings/levels.rs` v1 layout), typed stats, and lineage sizes.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import DecodeError, FormatError
from .codecs import (ByteArrayVals, PhysicalType, alp, bss, dictionary,
                     delta, delta_bytes, forpack, fsst, levels, plain,
                     rlebool, physical_of_arrow, values_from_arrow,
                     values_to_arrow)

# Defaults mirroring the reference writer properties
# (`/root/reference/src/file/properties.rs:56-64`).
DATA_PAGE_SIZE = 1 << 20        # 1 MiB
DICT_PAGE_SIZE_LIMIT = 1 << 20  # 1 MiB


PAGE_SCHEMA = pa.schema([
    ("path", pa.string()),
    ("block_id", pa.string()),
    ("block_rows", pa.int64()),
    ("n_cols", pa.int32()),
    ("col_idx", pa.int32()),
    ("column", pa.string()),
    ("page_id", pa.int32()),
    ("n_pages", pa.int32()),
    ("phys", pa.string()),
    ("arrow_type", pa.binary()),
    ("codec", pa.string()),
    ("num_values", pa.int64()),
    ("null_count", pa.int64()),
    ("levels", pa.binary()),
    ("data", pa.binary()),
    ("dict", pa.binary()),
    ("num_entries", pa.int64()),
    ("type_length", pa.int32()),
    ("plain_size", pa.int64()),
    ("encoded_size", pa.int64()),
    ("block_codec", pa.string()),
    ("data_raw_len", pa.int64()),
    ("dict_raw_len", pa.int64()),
    ("stats_json", pa.string()),
    ("crc32", pa.int64()),
    ("stats_crc32", pa.int64()),
])


def _page_crc(data, dict_page, level_bytes, column: str, codec: str,
              phys: str, num_values: int, null_count: int, page_id: int,
              num_entries: int, type_length: int, block_codec: str,
              arrow_type: bytes = b"") -> int:
    """CRC32 over the page payloads AND every cell the DECODER depends
    on — including the serialized Arrow type (a flipped timestamp-unit
    bit would silently reinterpret values). ≙ Parquet's optional page
    CRC. Any such bit flip fails decode with a typed error instead of
    silently wrong rows (fuzz contract, tests/test_corrupt.py). Stats
    carry their own `stats_crc32` (see `stats_crc`): a stats-only flip
    must degrade to exact filtering, not brick an otherwise-healthy
    page."""
    import zlib
    meta = f"{column}|{codec}|{phys}|{num_values}|{null_count}|" \
           f"{page_id}|{num_entries}|{type_length}|{block_codec}".encode()
    c = zlib.crc32(meta)
    c = zlib.crc32(arrow_type, c)
    c = zlib.crc32(data, c)
    if dict_page:
        c = zlib.crc32(dict_page, c)
    if level_bytes:
        c = zlib.crc32(level_bytes, c)
    return c


def page_row_crc(row: dict) -> int:
    """Decode-side CRC of a page row as stored."""
    return _page_crc(row["data"], row["dict"], row["levels"],
                     row["column"], row["codec"], row["phys"],
                     row["num_values"], row["null_count"], row["page_id"],
                     row["num_entries"], row["type_length"],
                     row["block_codec"], row["arrow_type"])


def stats_crc(stats_json: str) -> int:
    """Integrity tag for the stats cell alone: prune verifies it WITHOUT
    reading page payloads; a corrupted min/max/bloom conservatively
    disables pruning for that page (exact post-decode filtering still
    yields correct rows)."""
    import zlib
    return zlib.crc32(stats_json.encode())


def type_to_bytes(t: pa.DataType) -> bytes:
    """Arrow type → IPC-serialized single-field schema bytes. The on-disk
    `arrow_type` cell must never be pickled: CLI decode/read/inspect accept
    arbitrary paths, and unpickling attacker-controlled bytes executes code.
    Arrow IPC schema parsing is data-only (≙ the reference's thrift
    metadata, which has no such hazard)."""
    return pa.schema([pa.field("c", t)]).serialize().to_pybytes()


_TYPE_CACHE: dict[bytes, pa.DataType] = {}


def type_from_bytes(b: bytes) -> pa.DataType:
    """Inverse of type_to_bytes, with a cache (every page of a column
    chunk carries the same serialized type)."""
    t = _TYPE_CACHE.get(b)
    if t is None:
        try:
            t = pa.ipc.read_schema(pa.BufferReader(b)).field(0).type
        except pa.ArrowInvalid as exc:
            raise DecodeError(f"bad arrow_type cell: {exc}") from exc
        if len(_TYPE_CACHE) > 4096:
            _TYPE_CACHE.clear()
        _TYPE_CACHE[b] = t
    return t


def plain_size_of(phys: PhysicalType, values, type_length: int = 0) -> int:
    """Exact PLAIN-encoded size without materializing it."""
    if phys == PhysicalType.BOOLEAN:
        return -(-len(values) // 8)
    if phys == PhysicalType.BYTE_ARRAY:
        return int(values.offsets[-1]) + 4 * len(values)
    if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY:
        return int(values.offsets[-1])
    return len(values) * np.dtype({PhysicalType.INT32: "i4", PhysicalType.INT64: "i8",
                                   PhysicalType.FLOAT: "f4", PhysicalType.DOUBLE: "f8"}[phys]).itemsize


def encode_with(codec: str, phys: PhysicalType, values, type_length: int = 0,
                fsst_table=None) -> tuple[bytes, bytes, int]:
    """Dispatch: encode canonical values → (data, dict_page, num_entries)."""
    if codec == "PLAIN":
        return plain.encode(phys, values), b"", 0
    if codec == "RLE":
        return rlebool.encode(values), b"", 0
    if codec == "RLE_DICTIONARY":
        data, page, n = dictionary.encode(phys, values)
        return data, page, n
    if codec == "DELTA_BINARY_PACKED":
        return delta.encode(values, phys == PhysicalType.INT32), b"", 0
    if codec == "FOR":
        return forpack.encode(values, phys == PhysicalType.INT32), b"", 0
    if codec == "DELTA_LENGTH_BYTE_ARRAY":
        return delta_bytes.encode_delta_length(values), b"", 0
    if codec == "DELTA_BYTE_ARRAY":
        return delta_bytes.encode_delta_byte_array(values), b"", 0
    if codec == "FSST":
        return fsst.encode(values, fsst_table), b"", 0
    if codec == "BYTE_STREAM_SPLIT":
        return bss.encode(values, phys), b"", 0
    if codec == "ALP":
        return alp.encode(values, phys), b"", 0
    if codec == "ALP_RD":
        return alp.encode_rd(values, phys), b"", 0
    raise FormatError(f"unknown codec {codec}")


def decode_with(codec: str, phys: PhysicalType, data: bytes, dict_page: bytes,
                num_entries: int, num_values: int, type_length: int = 0):
    """Dispatch: encoded bytes → canonical values.

    ≙ the reference per-chunk decoder cache dispatch
    (`/root/reference/src/column/reader.rs:383-413`)."""
    if codec == "PLAIN":
        return plain.decode(phys, data, num_values, type_length)
    if codec == "RLE":
        return rlebool.decode(data, num_values)
    if codec == "RLE_DICTIONARY":
        return dictionary.decode(phys, data, dict_page, num_entries,
                                 num_values, type_length)
    if codec == "DELTA_BINARY_PACKED":
        return delta.decode(data, phys == PhysicalType.INT32)
    if codec == "FOR":
        return forpack.decode(data, phys == PhysicalType.INT32)
    if codec == "DELTA_LENGTH_BYTE_ARRAY":
        return delta_bytes.decode_delta_length(data, num_values)
    if codec == "DELTA_BYTE_ARRAY":
        return delta_bytes.decode_delta_byte_array(data, num_values)
    if codec == "FSST":
        return fsst.decode(data)
    if codec == "BYTE_STREAM_SPLIT":
        return bss.decode(data, num_values, phys)
    if codec == "ALP":
        return alp.decode(data, num_values, phys)
    if codec == "ALP_RD":
        return alp.decode_rd(data, num_values, phys)
    raise FormatError(f"unknown codec {codec}")


def page_slices(arr: pa.Array, budget: int = DATA_PAGE_SIZE) -> list[tuple[int, int]]:
    """Split a column chunk into page ranges ≤ ~budget plain bytes
    (≙ the page-cut rule, `/root/reference/src/column/writer.rs:406-410`;
    like the reference, a single giant row still becomes its own page)."""
    n = len(arr)
    if n == 0:
        return []
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t) or pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        sizes = pc.binary_length(arr).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64) + 4
    elif pa.types.is_boolean(t):
        sizes = None
        rows_per_page = budget * 8
    elif pa.types.is_fixed_size_binary(t) or pa.types.is_decimal(t):
        sizes = None
        rows_per_page = max(1, budget // max(1, t.byte_width))
    else:
        sizes = None
        rows_per_page = max(1, budget // max(1, t.bit_width // 8))
    if sizes is None:
        return [(i, min(i + rows_per_page, n)) for i in range(0, n, rows_per_page)]
    cum = np.cumsum(sizes)
    cuts = [0]
    start_bytes = 0
    while cuts[-1] < n:
        nxt = int(np.searchsorted(cum, start_bytes + budget, side="left")) + 1
        nxt = max(nxt, cuts[-1] + 1)
        nxt = min(nxt, n)
        cuts.append(nxt)
        start_bytes = int(cum[nxt - 1])
    return list(zip(cuts[:-1], cuts[1:]))


BLOOM_MIN_BITS = 1024   # 128 B floor
BLOOM_MAX_BITS = 1 << 16  # 8 KiB cap (~1% of a 1 MiB page as hex)


def _bloom_hashes(arr: pa.Array, phys: PhysicalType):
    """uint64 content hashes for bloom membership (None = unsupported)."""
    if arr.null_count:
        arr = arr.drop_null()
    if len(arr) == 0:
        return None
    if phys == PhysicalType.BYTE_ARRAY:
        if len(arr) and arr.nbytes / len(arr) > 256:
            return None  # giant blobs: equality lookup is not a use case
        from .ops.dedup import _hash_strings
        return _hash_strings(arr)
    if (phys in (PhysicalType.INT32, PhysicalType.INT64)
            and pa.types.is_integer(arr.type)
            and arr.type not in (pa.uint64(),)):
        from .ops.dedup import splitmix64
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False) \
            .astype(np.uint64)
        return splitmix64(v)
    return None


def bloom_from_hashes(h: np.ndarray) -> str:
    """Hashes → hex bloom, 2 probes per value; sized ~8 bits per value
    (power of two within [1 KiB, 8 KiB] worth of bits) so the filter
    never saturates on big pages."""
    nbits = BLOOM_MIN_BITS
    while nbits < 8 * len(h) and nbits < BLOOM_MAX_BITS:
        nbits <<= 1
    bits = np.zeros(nbits // 8, dtype=np.uint8)
    for shift in (0, 32):
        idx = ((h >> np.uint64(shift)) & np.uint64(nbits - 1)) \
            .astype(np.int64)
        np.bitwise_or.at(bits, idx >> 3, (1 << (idx & 7)).astype(np.uint8))
    return bits.tobytes().hex()


def bloom_might_contain(bloom_hex: str, value) -> bool:
    """Membership probe for a scalar (str/bytes/int) against a page
    bloom; filter size is implicit in the hex length."""
    if isinstance(value, str):
        value = value.encode()
    if isinstance(value, bytes):
        from .ops.dedup import _hash_strings
        h = int(_hash_strings(pa.array([value], pa.binary()))[0])
    else:
        v = int(value)
        if not -2**63 <= v < 2**63:
            # blooms are only built for integer columns that fit int64
            # (uint64 is excluded at build time), so an out-of-range
            # probe value provably isn't in the column — and
            # np.int64(v) would raise OverflowError
            return False
        from .ops.dedup import splitmix64
        h = int(splitmix64(
            np.array([np.int64(v)], dtype=np.int64)
            .view(np.uint64))[0])
    bits = bytes.fromhex(bloom_hex)
    nbits = len(bits) * 8
    for shift in (0, 32):
        idx = (h >> shift) & (nbits - 1)
        if not (bits[idx >> 3] >> (idx & 7)) & 1:
            return False
    return True


def _stats_json(arr: pa.Array, phys: PhysicalType, distinct: int | None) -> str:
    """Per-page typed stats ≙ `src/file/statistics.rs:244-322` (min/max/
    null_count/distinct_count), computed with Arrow kernels (SURVEY §2.9).

    min/max are stored TYPED with a `kind` tag (≙ the reference's typed
    statistics + per-logical-type sort orders, `src/basic.rs:284-341`):
    ints as exact JSON integers (no float64 precision loss past 2^53),
    floats as floats, decimals as exact decimal strings, bytes as hex
    (order-preserving), strings/timestamps as strings. `trunc` marks a
    truncated MAX, which under-reports the upper bound and must disable
    pruning (a truncated *min* only widens the range — always safe).
    min/max are skipped for huge-blob pages (an extra full memory pass
    for stats nobody range-prunes on)."""
    import datetime
    from decimal import Decimal

    out: dict = {"null_count": arr.null_count}
    if distinct is not None:
        out["distinct_count"] = distinct
    bh = _bloom_hashes(arr, phys)
    if bh is not None:
        out["bloom"] = bloom_from_hashes(bh)
    if (phys in (PhysicalType.BYTE_ARRAY, PhysicalType.FIXED_LEN_BYTE_ARRAY)
            and len(arr) and arr.nbytes / len(arr) > 256):
        return json.dumps(out, ensure_ascii=True)
    try:
        if len(arr) - arr.null_count > 0:
            mm = pc.min_max(arr)
            mn, mx = mm["min"].as_py(), mm["max"].as_py()
            kind = None
            trunc = False
            if isinstance(mn, bytes):
                kind = "bytes"
                trunc = len(mx) > 64
                mn, mx = mn[:64].hex(), mx[:64].hex()
            elif isinstance(mn, str):
                kind = "str"
                trunc = len(mx) > 64
                mn, mx = mn[:64], mx[:64]
            elif isinstance(mn, bool):
                kind = "bool"
            elif isinstance(mn, int):
                kind = "int"
            elif isinstance(mn, float):
                kind = "float"
                if mn != mn or mx != mx:  # NaN bound: no sound pruning
                    kind = None
            elif isinstance(mn, Decimal):
                kind = "dec"
                mn, mx = str(mn), str(mx)
            elif isinstance(mn, (datetime.datetime, datetime.date,
                                 datetime.time)):
                # str() of datetimes is lexicographically order-consistent
                # (fractional seconds only append to the string)
                kind = "str"
                mn, mx = str(mn), str(mx)
            if kind is not None:
                out["min"], out["max"], out["kind"] = mn, mx, kind
                if trunc:
                    out["trunc"] = True
    except pa.ArrowNotImplementedError:
        pass
    return json.dumps(out, ensure_ascii=True)


def merge_stats_zones(stats: list[dict]) -> dict:
    """Fold per-page stats dicts into ONE conservative zone for manifest-
    level partition elimination (≙ "Global Range Encoding for Efficient
    Partition Elimination", EDBT 2018, PAPERS.md): min of mins / max of
    maxes, same `kind` only. Any contributing page without sound bounds
    (huge-blob skip, NaN bound, kind mismatch) drops the bounds entirely
    — a zone must cover EVERY row it stands for or pruning is unsound.
    Callers must pre-filter pages with zero non-null values (an all-null
    page constrains nothing and must not poison the merge). Blooms are
    deliberately not merged: OR-folding page blooms over a whole
    container saturates them into always-True."""
    from decimal import Decimal, InvalidOperation

    if not stats:
        return {}
    kinds = {s.get("kind") for s in stats}
    if len(kinds) != 1 or None in kinds:
        return {}
    if any("min" not in s or "max" not in s for s in stats):
        return {}
    kind = kinds.pop()
    mns = [s["min"] for s in stats]
    mxs = [s["max"] for s in stats]
    try:
        if kind == "dec":
            mn = min(mns, key=Decimal)
            mx = max(mxs, key=Decimal)
        else:
            mn, mx = min(mns), max(mxs)
    except (InvalidOperation, TypeError, ValueError):
        return {}
    zone = {"min": mn, "max": mx, "kind": kind}
    if any(s.get("trunc") for s in stats):
        zone["trunc"] = True
    return zone


def merge_zone_dicts(a: dict, b: dict) -> dict:
    """Column→zone maps of two block sets landing in one container:
    keep only columns bounded in BOTH (a column unbounded on either
    side is unbounded for the union), zones merged conservatively."""
    out = {}
    for col in a.keys() & b.keys():
        z = merge_stats_zones([a[col], b[col]])
        if z:
            out[col] = z
    return out


def encode_column_chunk(column: str, col_idx: int, arr: pa.Array, *,
                        selector, path: str, block_id: str, block_rows: int,
                        n_cols: int) -> list[dict]:
    """Encode one column of one block into page rows."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        # dictionary-typed Arrow input (e.g. read_parquet with
        # read_dictionary): decode to values — the selector re-derives
        # its own dictionary encoding when it wins on bytes
        arr = arr.dictionary_decode()
    from .codecs import listcodec as _nested
    if _nested.is_nested(arr.type):
        return _encode_list_chunk(column, col_idx, arr, selector=selector,
                                  path=path, block_id=block_id,
                                  block_rows=block_rows, n_cols=n_cols)
    phys = physical_of_arrow(arr.type)
    type_length = arr.type.byte_width if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY else 0
    atype = type_to_bytes(arr.type)
    ranges = page_slices(arr) or [(0, 0)]
    rows = []
    n_pages = len(ranges)
    for pid, (s, e) in enumerate(ranges):
        page_arr = arr.slice(s, e - s)
        null_count = page_arr.null_count
        if null_count:
            valid = np.asarray(page_arr.is_valid().to_numpy(zero_copy_only=False))
            level_bytes = levels.encode_validity(valid)
        else:
            level_bytes = b""
        _, values = values_from_arrow(page_arr)
        enc = selector.select_and_encode(phys, values, column=column,
                                         type_length=type_length)
        psize = plain_size_of(phys, values, type_length)
        stats = _stats_json(page_arr, phys, enc.distinct)
        rows.append({
            "path": path, "block_id": block_id, "block_rows": block_rows,
            "n_cols": n_cols, "col_idx": col_idx, "column": column,
            "page_id": pid, "n_pages": n_pages, "phys": phys.value,
            "arrow_type": atype, "codec": enc.codec,
            "num_values": len(page_arr), "null_count": null_count,
            "levels": level_bytes, "data": enc.data, "dict": enc.dict_page,
            "num_entries": enc.num_entries, "type_length": type_length,
            "plain_size": psize,
            "encoded_size": enc.total + len(level_bytes),
            "block_codec": enc.block_codec,
            "data_raw_len": enc.data_raw_len,
            "dict_raw_len": enc.dict_raw_len,
            "stats_json": stats,
            "crc32": _page_crc(enc.data, enc.dict_page, level_bytes,
                               column, enc.codec, phys.value,
                               len(page_arr), null_count, pid,
                               enc.num_entries, type_length,
                               enc.block_codec, atype),
            "stats_crc32": stats_crc(stats),
        })
    return rows


def _encode_list_chunk(column: str, col_idx: int, arr: pa.Array, *,
                       selector, path: str, block_id: str, block_rows: int,
                       n_cols: int) -> list[dict]:
    """Nested columns — list<T>, struct<...>, arbitrary depth (≙ Dremel
    REPEATED/GROUP): validity + offsets + recursively-encoded children
    via `codecs/listcodec.py`; pages cut on estimated underlying bytes."""
    from .codecs import listcodec
    # capture the ORIGINAL type first: large_list roundtrips as
    # large_list (listcodec.decode casts to the target type); the
    # downcast below is only the encode-side canonical form
    atype = type_to_bytes(arr.type)
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_type))
    # page cut on underlying bytes
    n = len(arr)
    if pa.types.is_list(arr.type):
        lens = pc.list_value_length(arr).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        vt = arr.type.value_type
        try:
            item_w = max(1, vt.bit_width // 8)
        except ValueError:  # variable-width or nested child
            item_w = max(8, arr.nbytes // max(1, int(lens.sum())))
    else:  # struct: flat per-row estimate from total buffer bytes
        lens = np.ones(n, dtype=np.int64)
        item_w = max(8, arr.nbytes // max(1, n))
    cum = np.cumsum(lens * item_w + 8)
    cuts = [0]
    while cuts[-1] < n:
        nxt = int(np.searchsorted(cum, (cum[cuts[-1] - 1] if cuts[-1] else 0) + DATA_PAGE_SIZE)) + 1
        cuts.append(min(max(nxt, cuts[-1] + 1), n))
    ranges = list(zip(cuts[:-1], cuts[1:]))
    rows = []
    for pid, (s, e) in enumerate(ranges):
        page_arr = arr.slice(s, e - s)
        null_count = page_arr.null_count
        # top-level validity travels INSIDE the nested blob (every
        # nesting level carries its own), so no page-level level bytes
        level_bytes = b""
        data = listcodec.encode(page_arr, selector, column)
        psize = int(lens[s:e].sum()) * item_w + 4 * (e - s)
        rows.append({
            "path": path, "block_id": block_id, "block_rows": block_rows,
            "n_cols": n_cols, "col_idx": col_idx, "column": column,
            "page_id": pid, "n_pages": len(ranges), "phys": "LIST",
            "arrow_type": atype, "codec": "LIST",
            "num_values": len(page_arr), "null_count": null_count,
            "levels": level_bytes, "data": data, "dict": b"",
            "num_entries": 0, "type_length": 0,
            "plain_size": psize,
            "encoded_size": len(data) + len(level_bytes),
            "block_codec": "", "data_raw_len": len(data), "dict_raw_len": 0,
            "stats_json": json.dumps({"null_count": null_count}),
            "crc32": _page_crc(data, b"", b"", column, "LIST", "LIST",
                               len(page_arr), null_count, pid, 0, 0, "",
                               atype),
            "stats_crc32": stats_crc(
                json.dumps({"null_count": null_count})),
        })
    return rows


_CODEC_CACHE: dict[str, pa.Codec] = {}


def _block_codec(name: str) -> pa.Codec:
    """Per-process pa.Codec cache — decode is stateless Ray tasks, but
    worker processes persist, so codec objects are built once per worker
    instead of once per page (≙ the reference decoder state reuse,
    `src/column/reader.rs:119-121,400-408`)."""
    c = _CODEC_CACHE.get(name)
    if c is None:
        c = _CODEC_CACHE[name] = pa.Codec(name)
    return c


def decode_page_row(row: dict) -> pa.Array:
    """Decode one page row → Arrow array with nulls restored.

    Corrupt input (truncated buffers, bad lengths, garbage compressed
    bytes) raises DecodeError naming the page (≙ reference corrupt-file
    tests, `src/file/reader.rs:532-592`)."""
    try:
        return _decode_page_row(row)
    except (FormatError, DecodeError):
        raise
    except Exception as exc:
        raise DecodeError(
            f"page decode failed: column={row.get('column')!r} "
            f"codec={row.get('codec')!r} page={row.get('page_id')} "
            f"block={row.get('block_id')!r}: {exc}") from exc


def _decode_page_row(row: dict) -> pa.Array:
    if row.get("crc32") is not None:
        if page_row_crc(row) != row["crc32"]:
            raise DecodeError(
                f"page checksum mismatch: column={row['column']!r} "
                f"page={row['page_id']} block={row.get('block_id')!r}")
    if row["phys"] == "LIST":
        from .codecs import listcodec
        target = type_from_bytes(row["arrow_type"])
        # validity at every nesting level is inside the blob
        arr = listcodec.decode(row["data"], target)
        if arr.type != target:
            arr = arr.cast(target)
        return arr
    phys = PhysicalType(row["phys"])
    target = type_from_bytes(row["arrow_type"])
    n = row["num_values"]
    data, dict_page = row["data"], row["dict"]
    if row.get("block_codec"):
        codec_obj = _block_codec(row["block_codec"])
        if len(data):
            data = codec_obj.decompress(data, row["data_raw_len"]).to_pybytes()
        if len(dict_page):
            dict_page = codec_obj.decompress(dict_page, row["dict_raw_len"]).to_pybytes()
    n_nonnull = n - row["null_count"]
    values = decode_with(row["codec"], phys, data, dict_page,
                         row["num_entries"], n_nonnull, row["type_length"])
    arr = values_to_arrow(phys, values, target)
    if row["null_count"]:
        if n_nonnull == 0:
            return pa.nulls(n, target)
        valid = levels.decode_validity(row["levels"], n)
        # scatter non-null values into a nullable array
        take_idx = np.full(n, -1, dtype=np.int64)
        take_idx[valid] = np.arange(n_nonnull)
        mask = pa.array(valid)
        taken = arr.take(pa.array(np.maximum(take_idx, 0)))
        arr = pc.if_else(mask, taken, pa.scalar(None, type=taken.type))
        if arr.type != target:
            arr = arr.cast(target)
    return arr
