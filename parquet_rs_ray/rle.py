"""RLE / bit-packed hybrid encoding (Parquet hybrid grammar).

Byte-exact re-creation of the reference encoder's output
(`/root/reference/src/encodings/rle.rs:55-317`), which follows the
parquet-format grammar:

    run            := <bit-packed-run> | <rle-run>
    bit-packed-run := varint((groups << 1) | 1)  groups*8 values packed
    rle-run        := varint(count << 1)         value in ceil(bw/8) LE bytes

The reference is a per-value state machine (8-value buffer, trailing
repeat counter, back-patched indicator byte).  Its output is fully
determined by the maximal-run decomposition of the input, which lets us
re-express it run-based and vectorize the packing:

* values are grouped 8 at a time; an RLE run only begins when a maximal
  run of ≥8 equal values starts exactly at a group boundary (the trailing
  repeat counter is reset at every literal group flush — `rle.rs:314`), so a
  run entering mid-group first commits `8-p` values to the literal group;
* an RLE run flush resets group alignment (`rle.rs:257`);
* bit-packed runs are finalized at 63 groups (`rle.rs:307`:
  `num_groups + 1 >= 64`);
* at end-of-stream, a final partial group that is all one value and has no
  open bit-packed run becomes a short RLE run (`rle.rs:224-228`
  `all_repeat`), otherwise it is zero-padded to 8 values.

`RleStateMachine` below is a faithful transcription of the state machine
and is used in tests to fuzz the vectorized encoder against it.
"""

from __future__ import annotations

import numpy as np

from .bitio import (ceil_div, decode_vlq, encode_vlq, pack_bits, unpack_bits)

MAX_GROUPS_PER_RUN = 63  # finalize at 63 groups, see module docstring


def _runs(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Maximal-run decomposition → (start_indices, lengths)."""
    n = len(values)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    change = np.flatnonzero(values[1:] != values[:-1]) + 1
    starts = np.concatenate(([0], change))
    lengths = np.diff(np.concatenate((starts, [n])))
    return starts, lengths


def rle_encode(values: np.ndarray, bit_width: int) -> bytes:
    """Encode uint values (< 2**bit_width) to hybrid RLE bytes."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    out = bytearray()
    if n == 0:
        return bytes(out)
    value_nbytes = ceil_div(bit_width, 8)

    starts, lengths = _runs(v)

    if int(lengths.max()) < 8:
        # Fast path: no run can ever reach the RLE threshold, so the whole
        # stream is one literal stretch (except a possible trailing short
        # RLE run when the final partial group is one value and lands just
        # after a 63-group finalization) — identical bytes, no Python loop.
        merged = [("L", 0, n)]
        return bytes(_emit(out, v, merged, value_nbytes, bit_width))

    # Phase 1: split the stream into events: literal ranges + rle runs.
    # ('L', start, end) / ('R', count, value_index)
    events: list[tuple[str, int, int]] = []
    p = 0  # group-buffer fill 0..7
    for s, L in zip(starts.tolist(), lengths.tolist()):
        if p > 0:
            take = L if L < 8 - p else 8 - p
            events.append(("L", s, s + take))
            p += take
            if p == 8:
                p = 0
            s += take
            L -= take
            if L == 0:
                continue
        # here p == 0
        if L >= 8:
            events.append(("R", L, s))
        else:
            events.append(("L", s, s + L))
            p = L

    # Coalesce adjacent literal events into stretches.
    merged: list[tuple[str, int, int]] = []
    for ev in events:
        if ev[0] == "L" and merged and merged[-1][0] == "L" and merged[-1][2] == ev[1]:
            merged[-1] = ("L", merged[-1][1], ev[2])
        else:
            merged.append(ev)

    return bytes(_emit(out, v, merged, value_nbytes, bit_width))


def _emit(out: bytearray, v: np.ndarray, merged: list, value_nbytes: int,
          bit_width: int) -> bytearray:
    # Phase 2: emit bytes.
    for i, ev in enumerate(merged):
        if ev[0] == "R":
            _, count, s = ev
            out += encode_vlq(count << 1)
            out += int(v[s]).to_bytes(value_nbytes, "little")
            continue
        _, s, e = ev
        stretch = e - s
        is_last = i == len(merged) - 1
        full_groups, rem = divmod(stretch, 8)
        # rem > 0 can only happen on the final stretch of the stream.
        trailing_rle = False
        if is_last and rem > 0:
            open_groups = full_groups % MAX_GROUPS_PER_RUN
            tail = v[e - rem:e]
            if open_groups == 0 and bool(np.all(tail == tail[0])):
                trailing_rle = True
        lit_end = e - rem if trailing_rle else e
        lit_n = lit_end - s
        if lit_n > 0:
            groups = ceil_div(lit_n, 8)
            pad = groups * 8 - lit_n
            if pad:
                lit_vals = np.concatenate([v[s:lit_end], np.zeros(pad, np.uint64)])
            else:
                lit_vals = v[s:lit_end]
            packed = pack_bits(lit_vals, bit_width)
            bytes_per_group = bit_width  # 8 values * bw bits = bw bytes
            g0 = 0
            while g0 < groups:
                g = min(MAX_GROUPS_PER_RUN, groups - g0)
                out += encode_vlq((g << 1) | 1)
                out += packed[g0 * bytes_per_group:(g0 + g) * bytes_per_group]
                g0 += g
        if trailing_rle:
            out += encode_vlq(rem << 1)
            out += int(v[e - 1]).to_bytes(value_nbytes, "little")
    return out


def rle_decode(data, bit_width: int, num_values: int) -> np.ndarray:
    """Decode hybrid RLE bytes → uint64 array of `num_values`.

    ≙ `RleDecoder::get_batch` (`rle.rs:398-434`), vectorized per run.
    """
    out = np.empty(num_values, dtype=np.uint64)
    if num_values == 0:
        return out
    buf = memoryview(bytes(data)) if not isinstance(data, (bytes, bytearray, memoryview)) else memoryview(data)
    value_nbytes = ceil_div(bit_width, 8)
    pos = 0
    filled = 0
    while filled < num_values:
        indicator, pos = decode_vlq(buf, pos)
        if indicator & 1:
            groups = indicator >> 1
            count = groups * 8
            nbytes = groups * bit_width
            vals = unpack_bits(buf[pos:pos + nbytes], bit_width, count)
            pos += nbytes
            take = min(count, num_values - filled)
            out[filled:filled + take] = vals[:take]
            filled += take
        else:
            count = indicator >> 1
            raw = bytes(buf[pos:pos + value_nbytes])
            value = int.from_bytes(raw, "little") if value_nbytes else 0
            pos += value_nbytes
            take = min(count, num_values - filled)
            out[filled:filled + take] = value
            filled += take
    return out


class RleStateMachine:
    """Faithful transcription of the reference state machine
    (`/root/reference/src/encodings/rle.rs:152-316`), used as the fuzz
    oracle for :func:`rle_encode`. Per-value Python; not for hot paths.
    """

    def __init__(self, bit_width: int):
        self.bit_width = bit_width
        self.out = bytearray()
        self.bitbuf = 0          # pending bits (LSB-first)
        self.bitcount = 0
        self.buffered: list[int] = []
        self.current_value = 0
        self.repeat_count = 0
        self.bit_packed_count = 0
        self.indicator_pos = -1

    # -- BitWriter-ish helpers -------------------------------------------
    def _put_bits(self, value: int, width: int) -> None:
        self.bitbuf |= (value & ((1 << width) - 1)) << self.bitcount
        self.bitcount += width
        while self.bitcount >= 8:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf >>= 8
            self.bitcount -= 8

    def _flush_bits(self) -> None:
        if self.bitcount > 0:
            self.out.append(self.bitbuf & 0xFF)
            self.bitbuf = 0
            self.bitcount = 0

    # -- state machine ----------------------------------------------------
    def put(self, value: int) -> None:
        if self.current_value == value:
            self.repeat_count += 1
            if self.repeat_count > 8:
                return
        else:
            if self.repeat_count >= 8:
                assert self.bit_packed_count == 0
                self._flush_rle_run()
            self.repeat_count = 1
            self.current_value = value
        self.buffered.append(value)
        if len(self.buffered) == 8:
            self._flush_buffered_values()

    def _flush_rle_run(self) -> None:
        assert self.repeat_count > 0
        self._flush_bits()
        self.out += encode_vlq(self.repeat_count << 1)
        self.out += int(self.current_value).to_bytes(ceil_div(self.bit_width, 8), "little")
        self.buffered.clear()
        self.repeat_count = 0

    def _flush_bit_packed_run(self, update_indicator: bool) -> None:
        if self.indicator_pos < 0:
            self._flush_bits()
            self.indicator_pos = len(self.out)
            self.out.append(0)
        for b in self.buffered:
            self._put_bits(b, self.bit_width)
        self.buffered.clear()
        if update_indicator:
            self._flush_bits()
            groups = self.bit_packed_count // 8
            self.out[self.indicator_pos] = (groups << 1) | 1
            self.indicator_pos = -1
            self.bit_packed_count = 0

    def _flush_buffered_values(self) -> None:
        if self.repeat_count >= 8:
            self.buffered.clear()
            if self.bit_packed_count > 0:
                assert self.bit_packed_count % 8 == 0
                self._flush_bit_packed_run(True)
            return
        self.bit_packed_count += len(self.buffered)
        groups = self.bit_packed_count // 8
        if groups + 1 >= 64:
            self._flush_bit_packed_run(True)
        else:
            self._flush_bit_packed_run(False)
        self.repeat_count = 0

    def flush(self) -> None:
        if self.bit_packed_count > 0 or self.repeat_count > 0 or self.buffered:
            all_repeat = self.bit_packed_count == 0 and (
                self.repeat_count == len(self.buffered) or not self.buffered)
            if self.repeat_count > 0 and all_repeat:
                self._flush_rle_run()
            else:
                while self.buffered and len(self.buffered) < 8:
                    self.buffered.append(0)
                self.bit_packed_count += len(self.buffered)
                self._flush_bit_packed_run(True)
                self.repeat_count = 0
        self._flush_bits()

    def consume(self) -> bytes:
        self.flush()
        return bytes(self.out)


def rle_encode_reference(values, bit_width: int) -> bytes:
    """Encode via the faithful state machine (test oracle)."""
    sm = RleStateMachine(bit_width)
    for x in np.asarray(values, dtype=np.uint64).tolist():
        sm.put(int(x))
    return sm.consume()
