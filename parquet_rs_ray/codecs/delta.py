"""DELTA_BINARY_PACKED ≙ `/root/reference/src/encodings/encoding.rs:506-788`
(decoder `decoding.rs:392-619`).

Layout (block_size=128, num_mini_blocks=4, mini_block=32):

    header := vlq(block_size) vlq(num_mini_blocks) vlq(total_count)
              zigzag_vlq(first_value)
    block  := zigzag_vlq(min_delta) [4 width bytes] miniblock*
    miniblock := 32 values of (delta - min_delta) bit-packed at its width,
                 the last non-empty miniblock zero-padded to 32
                 (`encoding.rs:638-641`); empty trailing miniblocks emit a
                 0 width byte and no data (`encoding.rs:616-619`).

Arithmetic wraps in the physical width: INT32 deltas wrap in 32-bit then
zero-extend (`encoding.rs:764-768`), INT64 in 64-bit — numpy's modular
int arithmetic gives this for free.
"""

from __future__ import annotations

import numpy as np

from ..bitio import (decode_vlq, decode_zigzag_vlq, encode_vlq,
                     encode_zigzag_vlq, num_required_bits, pack_bits,
                     unpack_bits)

CODEC_ID = "DELTA_BINARY_PACKED"
BLOCK_SIZE = 128
NUM_MINI_BLOCKS = 4
MINI_BLOCK = BLOCK_SIZE // NUM_MINI_BLOCKS


def _widths_for(maxes: np.ndarray) -> np.ndarray:
    """Vectorized num_required_bits over a uint64 array."""
    out = np.zeros(len(maxes), dtype=np.int64)
    nz = maxes > 0
    # bit_length via log2 on float is unsafe for >2**53; use frexp on uint64
    m = maxes[nz]
    bl = np.zeros(len(m), dtype=np.int64)
    v = m.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        v[big] >>= np.uint64(shift)
    out[nz] = bl + 1
    return out


def encode(values: np.ndarray, is_int32: bool) -> bytes:
    dtype = np.int32 if is_int32 else np.int64
    udtype = np.uint32 if is_int32 else np.uint64
    v = np.ascontiguousarray(values, dtype=dtype)
    n = len(v)
    header = (encode_vlq(BLOCK_SIZE) + encode_vlq(NUM_MINI_BLOCKS)
              + encode_vlq(n)
              + encode_zigzag_vlq(int(v[0]) if n else 0))
    if n <= 1:
        return header
    deltas = np.diff(v)  # wrapping in dtype
    parts: list[bytes] = [header]
    nfull = (len(deltas)) // BLOCK_SIZE
    # ---- full blocks, vectorized across blocks ----
    if nfull:
        blocks = deltas[:nfull * BLOCK_SIZE].reshape(nfull, NUM_MINI_BLOCKS, MINI_BLOCK)
        mins = blocks.reshape(nfull, -1).min(axis=1)
        adj = (blocks - mins[:, None, None]).astype(udtype).astype(np.uint64)
        maxes = adj.max(axis=2).reshape(-1)  # (nfull*4,)
        widths = _widths_for(maxes).reshape(nfull, NUM_MINI_BLOCKS)
        # pack per distinct width in bulk
        packed: dict[tuple[int, int], bytes] = {}
        flat_adj = adj.reshape(nfull * NUM_MINI_BLOCKS, MINI_BLOCK)
        flat_w = widths.reshape(-1)
        mb_bytes: list[bytes | None] = [None] * (nfull * NUM_MINI_BLOCKS)
        for w in np.unique(flat_w):
            w = int(w)
            idx = np.flatnonzero(flat_w == w)
            if w == 0:
                for i in idx:
                    mb_bytes[i] = b""
                continue
            sel = flat_adj[idx]  # (k, 32)
            blob = pack_bits(sel.reshape(-1), w)
            per = MINI_BLOCK * w // 8  # 32*w bits = 4*w bytes
            for j, i in enumerate(idx):
                mb_bytes[i] = blob[j * per:(j + 1) * per]
        for b in range(nfull):
            parts.append(encode_zigzag_vlq(int(mins[b])))
            parts.append(bytes(int(x) for x in widths[b]))
            for m in range(NUM_MINI_BLOCKS):
                parts.append(mb_bytes[b * NUM_MINI_BLOCKS + m])
    # ---- final partial block ----
    rest = deltas[nfull * BLOCK_SIZE:]
    if len(rest):
        mn = rest.min()
        adj = (rest - mn).astype(udtype).astype(np.uint64)
        parts.append(encode_zigzag_vlq(int(mn)))
        width_bytes = bytearray(NUM_MINI_BLOCKS)
        body = bytearray()
        rem = len(adj)
        for m in range(NUM_MINI_BLOCKS):
            take = min(MINI_BLOCK, rem)
            if take == 0:
                break
            chunk = adj[m * MINI_BLOCK:m * MINI_BLOCK + take]
            w = num_required_bits(int(chunk.max()))
            width_bytes[m] = w
            if w:
                padded = np.zeros(MINI_BLOCK, dtype=np.uint64)
                padded[:take] = chunk
                body += pack_bits(padded, w)
            rem -= take
        parts.append(bytes(width_bytes))
        parts.append(bytes(body))
    return b"".join(parts)


def decode(data: bytes, is_int32: bool) -> np.ndarray:
    return decode_with_consumed(data, is_int32)[0]


def decode_with_consumed(data: bytes, is_int32: bool) -> tuple[np.ndarray, int]:
    """Decode and also return bytes consumed (≙ `get_offset()`,
    `/root/reference/src/encodings/decoding.rs:441-444`) so composite
    codecs (delta-length/delta-byte-array) can find their data section."""
    dtype = np.int32 if is_int32 else np.int64
    buf = memoryview(data)
    block_size, pos = decode_vlq(buf, 0)
    num_mini, pos = decode_vlq(buf, pos)
    total, pos = decode_vlq(buf, pos)
    first, pos = decode_zigzag_vlq(buf, pos)
    mini = block_size // num_mini
    out = np.empty(total, dtype=dtype)
    if total == 0:
        return out, pos
    out[0] = first
    remaining = total - 1
    mask = 0xFFFFFFFF if is_int32 else 0xFFFFFFFFFFFFFFFF
    udtype = np.uint32 if is_int32 else np.uint64
    # Pass 1: walk block headers, record miniblock (width, pos, take, min).
    entries: list[tuple[int, int, int, int]] = []
    while remaining > 0:
        min_delta, pos = decode_zigzag_vlq(buf, pos)
        widths = bytes(buf[pos:pos + num_mini])
        pos += num_mini
        block_n = min(block_size, remaining)
        got = 0
        for m in range(num_mini):
            if got >= block_n:
                break
            w = widths[m]
            take = min(mini, block_n - got)
            entries.append((w, pos, take, min_delta))
            pos += mini * w // 8
            got += take
        remaining -= block_n
    # Pass 2: bulk-unpack all miniblocks sharing a width in one call.
    parts: list[np.ndarray | None] = [None] * len(entries)
    by_width: dict[int, list[int]] = {}
    for i, e in enumerate(entries):
        by_width.setdefault(e[0], []).append(i)
    raw = np.frombuffer(buf, dtype=np.uint8)
    for w, idxs in by_width.items():
        if w == 0:
            for i in idxs:
                parts[i] = np.zeros(entries[i][2], dtype=np.uint64)
            continue
        per = mini * w // 8
        blob = np.concatenate([raw[entries[i][1]:entries[i][1] + per] for i in idxs])
        vals = unpack_bits(blob, w, mini * len(idxs)).reshape(len(idxs), mini)
        for j, i in enumerate(idxs):
            parts[i] = vals[j, :entries[i][2]]
    if not parts:
        return out, pos
    adj = np.concatenate(parts).astype(udtype)
    mins = np.repeat(
        np.array([(e[3] & mask) for e in entries], dtype=udtype),
        np.array([e[2] for e in entries], dtype=np.int64))
    out[1:] = (adj + mins).view(dtype)
    np.cumsum(out, out=out)  # wrapping cumsum in dtype
    return out, pos
