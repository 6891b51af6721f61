"""FSST: Fast Static Symbol Table string compression.

North-star codec (BASELINE.json; "FSST: Fast Random Access String
Compression", VLDB 2020 — PAPERS.md). Not present in the reference repo;
built from the published algorithm:

* a table of ≤255 symbols, each 1..8 bytes; code 255 is the escape code
  (followed by one literal byte);
* encoding is greedy longest-match at each position;
* the table is trained iteratively on a sample: parse with the current
  table, count single symbols and concatenations of adjacent matches,
  keep the highest-gain (count × length) candidates.

Implementation notes (pure Python + numpy, no native code): greedy
longest-match is expressed as a compiled `re` alternation ordered by
descending symbol length with a final single-byte catch-all — the regex
engine gives C-speed scanning, and escapes fall out of the catch-all.
Decoding is a vectorized gather through a (n_symbols, 8) byte matrix.

Serialized layout:
    vlq(n_symbols) then per symbol vlq(len) + bytes   (symbol table)
    vlq(n_values) vlq(total_code_bytes)
    per-value code lengths DELTA_BINARY_PACKED(i32)
    code bytes back to back
Random access per value is preserved (lengths index the code stream).
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

from ..bitio import decode_vlq, encode_vlq
from . import delta
from .base import ByteArrayVals

CODEC_ID = "FSST"
ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYMBOL_LEN = 8
TRAIN_ITERS = 4
# 16 KiB training sample: half the train cost of 32 KiB for ~1% ratio
# (the outer zstd layer attenuates the difference further)
SAMPLE_BYTES = 1 << 14


class SymbolTable:
    """Trained FSST symbol table + compiled matcher (reusable across
    chunks; held by encode actors, see SURVEY.md §2.11 decoder cache)."""

    def __init__(self, symbols: list[bytes]):
        assert len(symbols) <= MAX_SYMBOLS
        self.symbols = symbols
        self.code_of = {s: i for i, s in enumerate(symbols)}
        # encode-side state (matcher regex, token→code map) is built
        # LAZILY: a decode-only table (deserialized per page) must not
        # pay the 255-alternation regex compile (≙ the reference's
        # per-chunk decoder state reuse, src/column/reader.rs:383-413)
        self._re_lazy = None
        self._enc_map: dict[bytes, bytes] | None = None
        self._dec_mat = None  # (mat, lens) decode matrices, built once

    @property
    def _re(self):
        if self._re_lazy is None:
            # Trie-shaped pattern: group symbols by first byte, suffixes
            # ordered longest-first — same greedy-longest-match semantics
            # as a flat length-ordered alternation (symbols with
            # different first bytes never compete at one position), but
            # far less regex backtracking.
            groups: dict[bytes, list[bytes]] = {}
            for s in self.symbols:
                groups.setdefault(s[:1], []).append(s[1:])
            alts = []
            for first, sufs in sorted(groups.items()):
                sufs = sorted(sufs, key=len, reverse=True)
                non_empty = [re.escape(x) for x in sufs if x]
                has_empty = any(not x for x in sufs)
                if non_empty:
                    alt = re.escape(first) + b"(?:" + b"|".join(non_empty) + b")"
                    if has_empty:
                        alt += b"?"
                else:
                    alt = re.escape(first)
                alts.append(alt)
            alts.append(b"[\\s\\S]")  # catch-all single byte -> escape
            self._re_lazy = re.compile(b"|".join(alts), re.DOTALL)
            # token -> code bytes (escape tokens added lazily; ≤256)
            self._enc_map = {
                s: bytes([i]) for i, s in enumerate(self.symbols)}
        return self._re_lazy

    # -- encode ----------------------------------------------------------
    def encode_blob(self, blob: bytes) -> bytes:
        """Encode a byte blob to a code stream (greedy longest match via
        the compiled alternation; token→code via one C-level join)."""
        toks = self._re.findall(blob)
        m = self._enc_map
        try:
            return b"".join(map(m.__getitem__, toks))
        except KeyError:
            for t in toks:
                if t not in m:
                    m[t] = bytes([ESCAPE, t[0]])
            return b"".join(map(m.__getitem__, toks))

    def parse_codes(self, blob: bytes) -> list[bytes]:
        """Symbol sequence of a greedy parse (used by training)."""
        return self._re.findall(blob)

    # -- decode ----------------------------------------------------------
    def decode_stream(self, codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """codes (uint8 incl. escapes+literals) → (bytes, out_len_per_code).

        Returns the decoded byte array and, aligned with `codes`, the
        number of output bytes contributed by each code byte (escape
        literal bytes contribute at position of the literal)."""
        if self._dec_mat is None:
            mat = np.zeros((257, MAX_SYMBOL_LEN), dtype=np.uint8)
            lens = np.zeros(257, dtype=np.int64)
            for i, s in enumerate(self.symbols):
                mat[i, :len(s)] = np.frombuffer(s, dtype=np.uint8)
                lens[i] = len(s)
            self._dec_mat = (mat, lens)
        mat, lens = self._dec_mat
        # escape: the code byte itself contributes 0; the following literal
        # byte contributes itself. We transform the stream first.
        codes = np.asarray(codes, dtype=np.uint8)
        n = len(codes)
        is_escape = np.zeros(n, dtype=bool)
        literal_pos = np.zeros(n, dtype=bool)
        cand = np.flatnonzero(codes == ESCAPE)
        if len(cand):
            # A 0xFF code is a real escape unless it is the literal of the
            # preceding escape. Only runs of consecutive 0xFF are ambiguous:
            # within each maximal run, even offsets are real escapes, odd
            # offsets their literals; an odd-length run escapes the byte
            # after the run.
            run_breaks = np.flatnonzero(np.diff(cand) > 1) + 1
            run_starts = np.concatenate(([0], run_breaks))
            run_ends = np.concatenate((run_breaks, [len(cand)]))
            for rs, re_ in zip(run_starts.tolist(), run_ends.tolist()):
                idxs = cand[rs:re_]
                k = len(idxs)
                is_escape[idxs[0::2]] = True
                literal_pos[idxs[1::2]] = True
                if k % 2 == 1 and idxs[-1] + 1 < n:
                    literal_pos[idxs[-1] + 1] = True
        out_lens = np.where(literal_pos, 1,
                            np.where(is_escape, 0, lens[codes]))
        total = int(out_lens.sum())
        out = np.empty(total, dtype=np.uint8)
        # literals
        dest = np.zeros(len(codes), dtype=np.int64)
        np.cumsum(out_lens, out=dest)
        starts = dest - out_lens
        lit_idx = np.flatnonzero(literal_pos)
        out[starts[lit_idx]] = codes[lit_idx]
        # symbols
        sym_idx = np.flatnonzero(~literal_pos & ~is_escape)
        if len(sym_idx):
            sl = out_lens[sym_idx]
            within = np.arange(int(sl.sum()), dtype=np.int64) - np.repeat(
                np.cumsum(sl) - sl, sl)
            dst = np.repeat(starts[sym_idx], sl) + within
            src = mat[codes[sym_idx]]
            flat = src.reshape(-1)
            pick = np.repeat(np.arange(len(sym_idx), dtype=np.int64) * MAX_SYMBOL_LEN, sl) + within
            out[dst] = flat[pick]
        return out, out_lens

    def serialize(self) -> bytes:
        out = bytearray(encode_vlq(len(self.symbols)))
        for s in self.symbols:
            out += encode_vlq(len(s))
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, buf, pos: int = 0) -> tuple["SymbolTable", int]:
        n, pos = decode_vlq(buf, pos)
        syms = []
        for _ in range(n):
            ln, pos = decode_vlq(buf, pos)
            syms.append(bytes(buf[pos:pos + ln]))
            pos += ln
        return cls(syms), pos


def train(sample: bytes, iters: int = TRAIN_ITERS,
          max_symbols: int = MAX_SYMBOLS) -> SymbolTable:
    """Iterative symbol-table construction per the FSST paper (§3.3)."""
    sample = sample[:SAMPLE_BYTES]
    table = SymbolTable([])
    for _ in range(iters):
        parsed = table.parse_codes(sample)
        # count distinct tokens / adjacent pairs at C speed, then score
        # only the distinct ones (total tokens >> distinct tokens)
        tok_counts = Counter(parsed)
        pair_counts = Counter(zip(parsed, parsed[1:]))
        gains: Counter[bytes] = Counter()
        for s, c in tok_counts.items():
            if c > 1:
                gains[s] += c * len(s)
        for (a, b), c in pair_counts.items():
            # single-occurrence pairs can never clear the gain > len(s)
            # bar next round; dropping them shrinks the candidate set ~10x
            if c > 1:
                la = len(a) + len(b)
                if la <= MAX_SYMBOL_LEN:
                    gains[a + b] += c * la
        # keep best by gain; prefer longer symbols on ties for determinism
        best = sorted(gains.items(), key=lambda kv: (-kv[1], -len(kv[0]), kv[0]))
        symbols = [s for s, g in best[:max_symbols] if g > len(s)]
        if not symbols:
            break
        table = SymbolTable(symbols)
    return table


def encode(v: ByteArrayVals, table: SymbolTable | None = None) -> bytes:
    """Encode a ByteArrayVals column chunk. Trains a table on a sample of
    the chunk when none is supplied."""
    blob = v.data.tobytes()
    if table is None:
        table = train(blob)
    # Encode per value (random access requires per-value code boundaries).
    # We encode the full blob per value via slicing; regex runs at C speed.
    offs = v.offsets
    code_parts: list[bytes] = []
    code_lens = np.zeros(len(v), dtype=np.int32)
    for i in range(len(v)):
        c = table.encode_blob(blob[offs[i]:offs[i + 1]])
        code_parts.append(c)
        code_lens[i] = len(c)
    codes = b"".join(code_parts)
    out = bytearray(table.serialize())
    out += encode_vlq(len(v))
    out += encode_vlq(len(codes))
    out += delta.encode(code_lens, is_int32=True)
    out += codes
    return bytes(out)


_TABLE_CACHE: dict[bytes, "SymbolTable"] = {}


def _table_span(buf, pos: int = 0) -> int:
    """End offset of the serialized symbol table — a pure vlq/length
    walk, no symbol materialization (cache-hit fast path)."""
    n, pos = decode_vlq(buf, pos)
    for _ in range(n):
        ln, pos = decode_vlq(buf, pos)
        pos += ln
    return pos


def decode(data: bytes) -> ByteArrayVals:
    buf = memoryview(data)
    # per-process table cache: every page of a column chunk embeds the
    # same serialized table; a hit skips table construction entirely and
    # reuses its built decode matrices (Ray worker processes persist
    # across tasks, so this is a per-worker decoder cache
    # ≙ src/column/reader.rs:119-121)
    pos = _table_span(buf, 0)
    key = bytes(buf[:pos])
    table = _TABLE_CACHE.get(key)
    if table is None:
        table, end = SymbolTable.deserialize(buf, 0)
        assert end == pos
        if len(_TABLE_CACHE) > 512:
            _TABLE_CACHE.clear()
        _TABLE_CACHE[key] = table
    n, pos = decode_vlq(buf, pos)
    total_codes, pos = decode_vlq(buf, pos)
    code_lens, consumed = delta.decode_with_consumed(bytes(buf[pos:]), is_int32=True)
    pos += consumed
    codes = np.frombuffer(buf, dtype=np.uint8, count=total_codes, offset=pos)
    decoded, out_lens = table.decode_stream(codes)
    # map per-code output lengths back to per-value byte offsets
    code_offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(code_lens.astype(np.int64), out=code_offs[1:])
    cum_out = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=cum_out[1:])
    offsets = cum_out[code_offs]
    return ByteArrayVals(offsets.astype(np.int64), decoded)
