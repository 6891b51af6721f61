"""LIST column encoding (Dremel nesting, flattened).

The reference encodes nesting with repetition/definition levels
(`/root/reference/src/record/reader.rs:109-121`, levels computed per
leaf). For Arrow `list<T>` we store the equivalent information as the
offsets array (delta-binary-packed — offsets are sorted so deltas are
list lengths) plus the child values encoded with their own codec chosen
by the selector. Reconstruction is `ListArray.from_arrays(offsets,
values)` — identical information content to (rep, def) levels for one
nesting depth.

Layout:
    vlq(num_lists) vlq(len(offsets_block)) offsets_block(DELTA_BINARY_PACKED i32)
    vlq(len(child_codec)) child_codec_utf8
    vlq(len(child_meta_json)) child_meta_json
    child data bytes
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..bitio import decode_vlq, encode_vlq
from . import delta
from .base import PhysicalType, physical_of_arrow, values_from_arrow, values_to_arrow

CODEC_ID = "LIST"


def encode(arr: pa.ListArray, selector, column: str) -> bytes:
    if arr.null_count:
        # null lists encode as empty; validity travels in the page's levels
        arr = arr.fill_null([])
    offsets = np.asarray(arr.offsets.to_numpy(zero_copy_only=False),
                         dtype=np.int32)
    values = arr.values.slice(offsets[0], offsets[-1] - offsets[0])
    if offsets[0] != 0:
        offsets = offsets - offsets[0]
    phys = physical_of_arrow(values.type)
    _, vals = values_from_arrow(values)
    enc = selector.select_and_encode(phys, vals, column=column + ".element")
    off_block = delta.encode(offsets, is_int32=True)
    child_meta = json.dumps({
        "phys": phys.value,
        "type": str(values.type),
        "n": len(values),
        "block_codec": enc.block_codec,
        "data_raw_len": enc.data_raw_len,
        "dict_raw_len": enc.dict_raw_len,
        "num_entries": enc.num_entries,
        "dict_len": len(enc.dict_page),
    })
    out = bytearray()
    out += encode_vlq(len(arr))
    out += encode_vlq(len(off_block))
    out += off_block
    cc = enc.codec.encode()
    out += encode_vlq(len(cc))
    out += cc
    cm = child_meta.encode()
    out += encode_vlq(len(cm))
    out += cm
    out += enc.dict_page
    out += enc.data
    return bytes(out)


def decode(data: bytes, target_type: pa.DataType) -> pa.ListArray:
    from ..page import decode_with  # local import to avoid cycle
    buf = memoryview(data)
    n, pos = decode_vlq(buf, 0)
    off_len, pos = decode_vlq(buf, pos)
    offsets = delta.decode(bytes(buf[pos:pos + off_len]), is_int32=True)
    pos += off_len
    cc_len, pos = decode_vlq(buf, pos)
    codec = bytes(buf[pos:pos + cc_len]).decode()
    pos += cc_len
    cm_len, pos = decode_vlq(buf, pos)
    meta = json.loads(bytes(buf[pos:pos + cm_len]).decode())
    pos += cm_len
    dict_page = bytes(buf[pos:pos + meta["dict_len"]])
    pos += meta["dict_len"]
    payload = bytes(buf[pos:])
    if meta["block_codec"]:
        codec_obj = pa.Codec(meta["block_codec"])
        if payload:
            payload = codec_obj.decompress(payload, meta["data_raw_len"]).to_pybytes()
        if dict_page:
            dict_page = codec_obj.decompress(dict_page, meta["dict_raw_len"]).to_pybytes()
    phys = PhysicalType(meta["phys"])
    vals = decode_with(codec, phys, payload, dict_page,
                       meta["num_entries"], meta["n"])
    child_type = target_type.value_type
    values = values_to_arrow(phys, vals, child_type)
    return pa.ListArray.from_arrays(pa.array(offsets.astype(np.int32),
                                             pa.int32()), values)
