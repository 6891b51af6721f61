"""Nested column encoding (Dremel nesting, flattened).

The reference encodes nesting with repetition/definition levels computed
per leaf during a schema-tree walk (`/root/reference/src/record/reader.rs:109-121`,
`src/schema/types.rs:546-564`). For Arrow nested arrays we store the
equivalent information structurally, one self-describing blob per page:

* LIST   — validity bitmap (RLE, ≙ def levels at this depth) + offsets
           (delta-binary-packed; deltas are list lengths ≙ rep levels) +
           recursively-encoded child values.
* STRUCT — validity bitmap + each field recursively encoded (≙ GroupType
           with its leaf columns DFS-flattened, `types.rs:652-695`).
* MAP    — validity bitmap + offsets + keys and values recursively
           encoded (≙ MAP/MAP_KEY_VALUE, `src/basic.rs:56-146`).
* PRIM   — validity bitmap + non-null values through the codec
           auto-selector (the leaf column case).

Arbitrary nesting depth (list<struct<list<...>>>) is supported by
recursion; every level carries its own validity, exactly the information
max_def_level/max_rep_level encode in the reference.

Blob grammar (all lengths VLQ):
    kind:u8  vlq(n)  vlq(len(validity)) validity
    LIST:   vlq(len(offsets_block)) offsets_block  child_blob
    MAP:    vlq(len(offsets_block)) offsets_block
            vlq(len(keys_blob)) keys_blob  items_blob
    STRUCT: vlq(num_fields) { vlq(len(name)) name vlq(len(blob)) blob }*
    PRIM:   vlq(len(codec)) codec vlq(len(meta_json)) meta_json dict data

Decode rebuilds each level with `Array.from_buffers` against the exact
target type, so field names and non-nullable child fields survive.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..bitio import decode_vlq, encode_vlq
from . import delta, levels
from .base import PhysicalType, physical_of_arrow, values_from_arrow, values_to_arrow

CODEC_ID = "LIST"

KIND_PRIM, KIND_LIST, KIND_STRUCT, KIND_MAP = 0, 1, 2, 3


def is_nested(typ: pa.DataType) -> bool:
    return (pa.types.is_list(typ) or pa.types.is_large_list(typ)
            or pa.types.is_struct(typ) or pa.types.is_map(typ))


def _validity_block(arr: pa.Array) -> bytes:
    if arr.null_count == 0:
        return b""
    valid = np.asarray(arr.is_valid().to_numpy(zero_copy_only=False))
    return levels.encode_validity(valid)


def encode(arr: pa.Array, selector, column: str) -> bytes:
    """Any Arrow array (arbitrarily nested) → self-describing blob."""
    t = arr.type
    out = bytearray()
    if pa.types.is_large_list(t):
        arr = arr.cast(pa.list_(t.value_type))
        t = arr.type
    if pa.types.is_list(t):
        out += bytes([KIND_LIST])
        out += encode_vlq(len(arr))
        vb = _validity_block(arr)
        out += encode_vlq(len(vb))
        out += vb
        if arr.null_count:
            arr = arr.fill_null([])
        offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int32)
        values = arr.values.slice(offsets[0], int(offsets[-1] - offsets[0]))
        if offsets[0] != 0:
            offsets = offsets - offsets[0]
        off_block = delta.encode(offsets, is_int32=True)
        out += encode_vlq(len(off_block))
        out += off_block
        out += encode(values, selector, column + ".element")
        return bytes(out)
    if pa.types.is_map(t):
        # MAP ≙ LIST of (key, value) entries (Dremel MAP_KEY_VALUE,
        # `src/basic.rs:56-146`); keys are non-null by construction
        out += bytes([KIND_MAP])
        out += encode_vlq(len(arr))
        vb = _validity_block(arr)
        out += encode_vlq(len(vb))
        out += vb
        offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                             dtype=np.int32)
        keys = arr.keys.slice(offsets[0], int(offsets[-1] - offsets[0]))
        items = arr.items.slice(offsets[0], int(offsets[-1] - offsets[0]))
        if offsets[0] != 0:
            offsets = offsets - offsets[0]
        off_block = delta.encode(offsets, is_int32=True)
        out += encode_vlq(len(off_block))
        out += off_block
        kb = encode(keys, selector, column + ".key")
        out += encode_vlq(len(kb))
        out += kb
        out += encode(items, selector, column + ".value")
        return bytes(out)
    if pa.types.is_struct(t):
        out += bytes([KIND_STRUCT])
        out += encode_vlq(len(arr))
        vb = _validity_block(arr)
        out += encode_vlq(len(vb))
        out += vb
        out += encode_vlq(t.num_fields)
        for i in range(t.num_fields):
            name = t.field(i).name.encode()
            out += encode_vlq(len(name))
            out += name
            blob = encode(arr.field(i), selector, f"{column}.{t.field(i).name}")
            out += encode_vlq(len(blob))
            out += blob
        return bytes(out)
    # ---- PRIM leaf
    out += bytes([KIND_PRIM])
    out += encode_vlq(len(arr))
    vb = _validity_block(arr)
    out += encode_vlq(len(vb))
    out += vb
    phys = physical_of_arrow(t)
    _, vals = values_from_arrow(arr)  # drops nulls; validity restores them
    type_length = t.byte_width if phys == PhysicalType.FIXED_LEN_BYTE_ARRAY else 0
    enc = selector.select_and_encode(phys, vals, column=column,
                                     type_length=type_length)
    meta = json.dumps({
        "phys": phys.value,
        "n": len(vals),
        "type_length": type_length,
        "block_codec": enc.block_codec,
        "data_raw_len": enc.data_raw_len,
        "dict_raw_len": enc.dict_raw_len,
        "num_entries": enc.num_entries,
        "dict_len": len(enc.dict_page),
    }).encode()
    cc = enc.codec.encode()
    out += encode_vlq(len(cc))
    out += cc
    out += encode_vlq(len(meta))
    out += meta
    out += enc.dict_page
    out += enc.data
    return bytes(out)


def decode(data: bytes, target_type: pa.DataType) -> pa.Array:
    from ..page import decode_with  # local import to avoid cycle
    buf = memoryview(data)
    arr, _ = _decode_at(buf, 0, target_type, decode_with)
    return arr


def _validity_buffers(vblock: bytes, n: int):
    """(validity buffer | None, null_count) from an RLE validity block."""
    if not vblock:
        return None, 0
    valid = levels.decode_validity(vblock, n)
    buf = pa.py_buffer(np.packbits(valid, bitorder="little").tobytes())
    return buf, int(n - valid.sum())


def _decode_at(buf: memoryview, pos: int, target_type: pa.DataType,
               decode_with) -> tuple[pa.Array, int]:
    # nested levels are rebuilt with Array.from_buffers against the
    # exact target type — field names and non-nullable child fields
    # survive (a cast-based rebuild cannot add non-nullability back)
    kind = buf[pos]
    pos += 1
    n, pos = decode_vlq(buf, pos)
    vlen, pos = decode_vlq(buf, pos)
    vblock = bytes(buf[pos:pos + vlen])
    pos += vlen
    if kind == KIND_LIST:
        want_large = pa.types.is_large_list(target_type)
        lt = pa.list_(target_type.value_field) if want_large else target_type
        off_len, pos = decode_vlq(buf, pos)
        offsets = delta.decode(bytes(buf[pos:pos + off_len]), is_int32=True)
        pos += off_len
        values, pos = _decode_at(buf, pos, lt.value_type, decode_with)
        vbuf, nulls = _validity_buffers(vblock, n)
        off_buf = pa.py_buffer(offsets.astype(np.int32).tobytes())
        arr = pa.Array.from_buffers(lt, n, [vbuf, off_buf],
                                    null_count=nulls, children=[values])
        if want_large:
            arr = arr.cast(target_type)
        return arr, pos
    if kind == KIND_MAP:
        off_len, pos = decode_vlq(buf, pos)
        offsets = delta.decode(bytes(buf[pos:pos + off_len]), is_int32=True)
        pos += off_len
        kb_len, pos = decode_vlq(buf, pos)
        keys, _ = _decode_at(buf[pos:pos + kb_len], 0, target_type.key_type,
                             decode_with)
        pos += kb_len
        items, pos = _decode_at(buf, pos, target_type.item_type, decode_with)
        entries_type = pa.struct([target_type.key_field,
                                  target_type.item_field])
        entries = pa.Array.from_buffers(entries_type, len(keys), [None],
                                        null_count=0,
                                        children=[keys, items])
        vbuf, nulls = _validity_buffers(vblock, n)
        off_buf = pa.py_buffer(offsets.astype(np.int32).tobytes())
        arr = pa.Array.from_buffers(target_type, n, [vbuf, off_buf],
                                    null_count=nulls, children=[entries])
        return arr, pos
    if kind == KIND_STRUCT:
        nf, pos = decode_vlq(buf, pos)
        children = []
        for _ in range(nf):
            nl, pos = decode_vlq(buf, pos)
            name = bytes(buf[pos:pos + nl]).decode()
            pos += nl
            bl, pos = decode_vlq(buf, pos)
            # slice: a PRIM child consumes to the end of the buffer it is
            # handed, so each field decodes from its own delimited view
            child, _ = _decode_at(buf[pos:pos + bl], 0,
                                  target_type.field(name).type, decode_with)
            pos += bl
            children.append(child)
        vbuf, nulls = _validity_buffers(vblock, n)
        arr = pa.Array.from_buffers(target_type, n, [vbuf],
                                    null_count=nulls, children=children)
        return arr, pos
    # ---- PRIM leaf
    cc_len, pos = decode_vlq(buf, pos)
    codec = bytes(buf[pos:pos + cc_len]).decode()
    pos += cc_len
    cm_len, pos = decode_vlq(buf, pos)
    meta = json.loads(bytes(buf[pos:pos + cm_len]).decode())
    pos += cm_len
    dict_page = bytes(buf[pos:pos + meta["dict_len"]])
    pos += meta["dict_len"]
    # a PRIM's data runs to the end of its delimited blob (the caller
    # hands a sliced view: STRUCT fields via vlq length, LIST child and
    # the top level as the buffer tail)
    payload = bytes(buf[pos:])
    if meta["block_codec"]:
        codec_obj = pa.Codec(meta["block_codec"])
        if payload:
            payload = codec_obj.decompress(
                payload, meta["data_raw_len"]).to_pybytes()
        if dict_page:
            dict_page = codec_obj.decompress(
                dict_page, meta["dict_raw_len"]).to_pybytes()
    phys = PhysicalType(meta["phys"])
    vals = decode_with(codec, phys, payload, dict_page, meta["num_entries"],
                       meta["n"], meta["type_length"])
    arr = values_to_arrow(phys, vals, target_type)
    if vblock:
        if meta["n"] == 0:
            return pa.nulls(n, target_type), len(buf)
        valid = levels.decode_validity(vblock, n)
        take_idx = np.full(n, -1, dtype=np.int64)
        take_idx[valid] = np.arange(int(valid.sum()))
        idx = pa.array(np.maximum(take_idx, 0), mask=~valid)
        arr = arr.take(idx)
    if arr.type != target_type:
        arr = arr.cast(target_type)
    return arr, len(buf)
