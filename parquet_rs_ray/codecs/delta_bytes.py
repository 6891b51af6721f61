"""DELTA_LENGTH_BYTE_ARRAY and DELTA_BYTE_ARRAY ≙
`/root/reference/src/encodings/encoding.rs:796-952`
(decoders `decoding.rs:629-835`).

* DELTA_LENGTH_BYTE_ARRAY: lengths DELTA_BINARY_PACKED(i32), then the
  concatenated raw bytes — zero-copy from Arrow offsets/data buffers.
* DELTA_BYTE_ARRAY: per-value shared-prefix length vs the previous value
  (delta-packed), then suffixes as DELTA_LENGTH_BYTE_ARRAY. The prefix
  scan is vectorized via a capped byte-matrix compare; decode is a
  sequential reconstruction (pages are size-capped so the loop is small).
"""

from __future__ import annotations

import numpy as np

from . import delta
from .base import ByteArrayVals

LENGTH_CODEC_ID = "DELTA_LENGTH_BYTE_ARRAY"
CODEC_ID = "DELTA_BYTE_ARRAY"

_PREFIX_CAP = 64  # vectorized common-prefix window; longer handled per-row


def encode_delta_length(v: ByteArrayVals) -> bytes:
    lengths = v.lengths.astype(np.int32)
    return delta.encode(lengths, is_int32=True) + v.data.tobytes()


def decode_delta_length(data: bytes, num_values: int) -> ByteArrayVals:
    lengths, consumed = _decode_lengths(data, num_values)
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    raw = np.frombuffer(data, dtype=np.uint8,
                        count=int(offsets[-1]), offset=consumed)
    return ByteArrayVals(offsets, raw)


def _decode_lengths(data: bytes, num_values: int) -> tuple[np.ndarray, int]:
    """Decode the leading DELTA_BINARY_PACKED i32 stream and report how many
    bytes it occupied (≙ `DeltaBitPackDecoder::get_offset`,
    `decoding.rs:441-444`)."""
    vals, consumed = delta.decode_with_consumed(data, is_int32=True)
    assert len(vals) == num_values, (len(vals), num_values)
    return vals.astype(np.int64), consumed


def common_prefix_lengths(v: ByteArrayVals) -> np.ndarray:
    """prefix_len[i] = shared prefix of value i vs value i-1 (0 for i=0)."""
    n = len(v)
    out = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return out
    lens = v.lengths
    minlen = np.minimum(lens[1:], lens[:-1])
    cap = min(_PREFIX_CAP, int(minlen.max()) if len(minlen) else 0)
    if cap > 0:
        k = np.arange(cap, dtype=np.int64)
        idx_cur = v.offsets[1:-1][:, None] + k
        idx_prev = v.offsets[:-2][:, None] + k
        # mask positions beyond min length as mismatches
        valid = k[None, :] < minlen[:, None]
        data = v.data
        eq = np.zeros((n - 1, cap), dtype=bool)
        np.equal(data[np.minimum(idx_cur, len(data) - 1)],
                 data[np.minimum(idx_prev, len(data) - 1)], out=eq)
        eq &= valid
        # match length = index of first False
        first_false = np.argmin(eq, axis=1)
        all_true = eq.all(axis=1)
        match = np.where(all_true, np.minimum(minlen, cap), first_false)
        out[1:] = match
        # rows that matched the full cap but could share more: finish per-row
        need_more = all_true & (minlen > cap)
        for i in np.flatnonzero(need_more):
            a = v.data[v.offsets[i]:v.offsets[i + 1]].tobytes()
            b = v.data[v.offsets[i + 1]:v.offsets[i + 2]].tobytes()
            m = cap
            top = min(len(a), len(b))
            while m < top and a[m] == b[m]:
                m += 1
            out[i + 1] = m
    return out


def encode_delta_byte_array(v: ByteArrayVals) -> bytes:
    prefix = common_prefix_lengths(v)
    lens = v.lengths
    suf_lens = lens - prefix
    suf_offsets = np.zeros(len(v) + 1, dtype=np.int64)
    np.cumsum(suf_lens, out=suf_offsets[1:])
    total = int(suf_offsets[-1])
    suf = np.empty(total, dtype=np.uint8)
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(suf_offsets[:-1], suf_lens)
        src = np.repeat(v.offsets[:-1] + prefix, suf_lens) + within
        suf[:] = v.data[src]
    suffixes = ByteArrayVals(suf_offsets, suf)
    return (delta.encode(prefix.astype(np.int32), is_int32=True)
            + encode_delta_length(suffixes))


def decode_delta_byte_array(data: bytes, num_values: int) -> ByteArrayVals:
    prefix, consumed = delta.decode_with_consumed(data, is_int32=True)
    suffixes = decode_delta_length(data[consumed:], num_values)
    prefix = prefix.astype(np.int64)
    out_lens = prefix + suffixes.lengths
    offsets = np.zeros(num_values + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offsets[1:])
    out = np.empty(int(offsets[-1]), dtype=np.uint8)
    sdata = suffixes.data
    soff = suffixes.offsets
    prev_start = 0
    for i in range(num_values):
        start = offsets[i]
        p = prefix[i]
        if p:
            out[start:start + p] = out[prev_start:prev_start + p]
        sl = soff[i + 1] - soff[i]
        if sl:
            out[start + p:start + p + sl] = sdata[soff[i]:soff[i + 1]]
        prev_start = start
    return ByteArrayVals(offsets, out)
