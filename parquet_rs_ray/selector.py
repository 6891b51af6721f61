"""Per-chunk codec auto-selection.

Upgrade of the reference's static policy (dict until the 1 MiB dict-page
limit, then the per-type fallback — `/root/reference/src/column/writer.rs:397-420,731-792`):
we trial-encode candidate codecs per Arrow column chunk and keep the one
minimizing encoded bytes. The reference's choices (dict / plain) are
always in the candidate set, so our pick is ≤ the reference's size by
construction (BASELINE.json north_rule floor).

Cheap candidates are fully encoded (their kernels are vectorized and the
bytes are reused when they win); expensive ones (FSST) are estimated on a
contiguous sample first and only fully encoded when they win the
estimate round. The final winner is compared against the analytic PLAIN
size as a hard floor.

The selector is *stateful per actor* (SURVEY §2.11): it keeps the last
trained FSST symbol table per column and reuses it when it still
compresses well, mirroring the reference's per-chunk decoder/encoder
reuse — this is the "actor pools holding reusable symbol tables and
dictionary builders" requirement of the north star.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

from .codecs import ByteArrayVals, PhysicalType, dictionary, fsst
from . import page as page_mod
from .codecs import delta as delta_codec
from .codecs import delta_bytes, forpack, plain, rlebool
from .codecs import alp as alp_codec
from .codecs import bss as bss_codec

SAMPLE_VALUES = 2048
PROBE_BYTES = 96 * 1024
FSST_MIN_AVG_LEN = 4.0
FSST_REUSE_TOLERANCE = 1.15
AUTO_BLOCK_CODEC = "zstd"  # tried on top of the winner when mode="auto"
# zstd-2: ~6% smaller than level 1 on web text at the same encoder
# speed (measured; level 3 costs 18% throughput for 3% more ratio)
ZSTD_LEVEL = 2


@dataclass
class PageEncoding:
    codec: str
    data: bytes
    dict_page: bytes = b""
    num_entries: int = 0
    distinct: int | None = None
    block_codec: str = ""           # outer general-purpose codec, "" = none
    data_raw_len: int = 0           # pre-block-codec sizes (for decompress)
    dict_raw_len: int = 0

    @property
    def total(self) -> int:
        return len(self.data) + len(self.dict_page)


def _slice_values(values, k: int):
    """First k values of a canonical value container."""
    if isinstance(values, ByteArrayVals):
        end = int(values.offsets[k])
        return ByteArrayVals(values.offsets[:k + 1].copy(), values.data[:end])
    return values[:k]


class CodecSelector:
    def __init__(self, dict_page_limit: int = page_mod.DICT_PAGE_SIZE_LIMIT,
                 enable_fsst: bool = True, force_codec: str | None = None,
                 block_codec: str | None = None):
        """block_codec: None = uncompressed pages (reference default,
        `properties.rs:59`); "auto" = try zstd on the winner and keep it if
        smaller (reference §2.3 page compression, auto-gated); any codec
        name = always compress with it."""
        self.dict_page_limit = dict_page_limit
        self.enable_fsst = enable_fsst
        self.force_codec = force_codec
        self.block_codec = block_codec
        self._fsst_tables: dict[str, tuple[fsst.SymbolTable, float]] = {}
        # negative cache: after FSST loses a page's ranking, skip the
        # probe (train + trial encode) for the next pages of that column
        self._fsst_skip: dict[str, int] = {}
        self._fsst_backoff: dict[str, int] = {}
        # per-actor block-codec cache: pa.Codec construction per PAGE
        # adds up at 32 actors x thousands of pages (decode side
        # already caches, page.py::_block_codec)
        self._codecs: dict[str, object] = {}

    def _codec(self, name: str):
        c = self._codecs.get(name)
        if c is None:
            c = pa.Codec(name, compression_level=ZSTD_LEVEL) \
                if name == "zstd" else pa.Codec(name)
            self._codecs[name] = c
        return c

    # ------------------------------------------------------------------
    def _finish(self, codec: str, data: bytes, dict_page: bytes,
                entries: int, distinct) -> PageEncoding:
        enc = PageEncoding(codec, data, dict_page, entries, distinct,
                           data_raw_len=len(data), dict_raw_len=len(dict_page))
        mode = self.block_codec
        if not mode:
            return enc
        name = AUTO_BLOCK_CODEC if mode == "auto" else mode
        c = self._codec(name)
        cdata = c.compress(data).to_pybytes() if len(data) else data
        cdict = c.compress(dict_page).to_pybytes() if len(dict_page) else dict_page
        if mode != "auto" or len(cdata) + len(cdict) < enc.total * 0.98:
            enc.data, enc.dict_page, enc.block_codec = cdata, cdict, name
        return enc

    def select_and_encode(self, phys: PhysicalType, values, *, column: str,
                          type_length: int = 0) -> PageEncoding:
        n = len(values)
        plain_size = page_mod.plain_size_of(phys, values, type_length)
        if self.force_codec:
            data, dpage, entries = page_mod.encode_with(
                self.force_codec, phys, values, type_length)
            return self._finish(self.force_codec, data, dpage, entries, None)

        candidates: list[tuple[int, str, tuple]] = []  # (size, codec, payload)
        distinct = None
        if n == 0:
            return self._finish("PLAIN", plain.encode(phys, values), b"", 0, 0)

        if phys == PhysicalType.BOOLEAN:
            data = rlebool.encode(values)
            candidates.append((len(data), "RLE", (data, b"", 0)))
        elif phys in (PhysicalType.INT32, PhysicalType.INT64):
            is32 = phys == PhysicalType.INT32
            d = delta_codec.encode(values, is32)
            candidates.append((len(d), "DELTA_BINARY_PACKED", (d, b"", 0)))
            f = forpack.encode(values, is32)
            candidates.append((len(f), "FOR", (f, b"", 0)))
            distinct = self._try_dict(phys, values, candidates)
        elif phys in (PhysicalType.FLOAT, PhysicalType.DOUBLE):
            distinct = self._try_dict(phys, values, candidates)
            # ALP: decimal floats (prices, scores) as FoR-packed
            # integers — a RAW-size win, so offered unconditionally;
            # the sample probe returns None on true mantissa noise
            a = alp_codec.encode_or_none(values, phys)
            if a is not None:
                candidates.append((len(a), "ALP", (a, b"", 0)))
            if a is None or len(a) > 0.7 * plain_size:
                # decimal model absent or weak → try the real-doubles
                # split (left-bits dictionary + verbatim right
                # mantissa): raw-size win on noise floats (embeddings),
                # where under "auto" it competes with BSS
                # post-compression
                ard = alp_codec.encode_rd_or_none(values, phys)
                if ard is not None:
                    candidates.append((len(ard), "ALP_RD",
                                       (ard, b"", 0)))
            if self.block_codec == "auto":
                # BYTE_STREAM_SPLIT is a pure permutation (raw size ==
                # PLAIN); it only pays off through the outer block codec,
                # so offer it exactly where _pick_auto ranks candidates
                # on POST-compression size
                b = bss_codec.encode(values, phys)
                candidates.append((len(b), "BYTE_STREAM_SPLIT",
                                   (b, b"", 0)))
        elif phys == PhysicalType.BYTE_ARRAY and n >= 64:
            return self._select_bytes_probed(phys, values, column,
                                             type_length, plain_size)
        else:  # FLBA / tiny BYTE_ARRAY chunks
            avg_len = int(values.offsets[-1]) / n
            distinct = self._try_dict(phys, values, candidates, type_length)
            if phys == PhysicalType.BYTE_ARRAY:
                dl = delta_bytes.encode_delta_length(values)
                candidates.append((len(dl), "DELTA_LENGTH_BYTE_ARRAY", (dl, b"", 0)))
                if avg_len <= 256:
                    dba = delta_bytes.encode_delta_byte_array(values)
                    candidates.append((len(dba), "DELTA_BYTE_ARRAY", (dba, b"", 0)))
                dict_dominates = distinct is not None and distinct * 16 <= n
                if self.enable_fsst and not dict_dominates:
                    self._try_fsst(column, values, plain_size, candidates)

        candidates.append((plain_size, "PLAIN", None))
        candidates.sort(key=lambda c: (c[0], c[1]))
        if self.block_codec == "auto":
            return self._pick_auto(phys, values, type_length, candidates, distinct)
        size, codec, payload = candidates[0]
        if payload is None:
            data, dpage, entries = page_mod.encode_with(codec, phys, values, type_length)
        else:
            data, dpage, entries = payload
        # hard floor: never worse than PLAIN
        if len(data) + len(dpage) > plain_size and codec != "PLAIN":
            codec, (data, dpage, entries) = "PLAIN", (plain.encode(phys, values), b"", 0)
        return self._finish(codec, data, dpage, entries, distinct)

    # ------------------------------------------------------------------
    def _select_bytes_probed(self, phys, values, column, type_length,
                             plain_size) -> PageEncoding:
        """BYTE_ARRAY chunks: rank candidates on a contiguous probe (one
        probe-sized encode + optional probe zstd per candidate), then
        materialize ONLY the winner. Memory traffic per page drops from
        ~4 full passes to ~1 encode + 1 compress — the difference between
        bandwidth-bound and CPU-bound at 32 cores on one socket."""
        n = len(values)
        total_bytes = int(values.offsets[-1])
        avg_len = total_bytes / n
        # probe cap: 512 values AND ~96 KiB of payload — long values (html
        # blobs) would otherwise make the probe as big as the page itself
        k = min(n, 512)
        if int(values.offsets[k] - values.offsets[0]) > PROBE_BYTES:
            k = max(16, int(np.searchsorted(
                values.offsets, values.offsets[0] + PROBE_BYTES)))
        head = _slice_values(values, k)
        head_bytes = int(head.offsets[-1])
        auto = self.block_codec == "auto"
        z = self._codec(AUTO_BLOCK_CODEC) if auto else None

        def stacked(raw: bytes) -> int:
            return len(z.compress(raw).to_pybytes()) if auto and len(raw) else len(raw)

        scale = (total_bytes + 4 * n) / max(1, head_bytes + 4 * k)
        ests: list[tuple[float, str]] = []
        head_plain = page_mod.plain_size_of(phys, head, type_length)
        ests.append((stacked(plain.encode(phys, head)) * scale if auto
                     else head_plain * scale, "PLAIN"))
        dl_head = delta_bytes.encode_delta_length(head)
        ests.append((stacked(dl_head) * scale, "DELTA_LENGTH_BYTE_ARRAY"))
        if avg_len <= 256:
            dba_head = delta_bytes.encode_delta_byte_array(head)
            ests.append((stacked(dba_head) * scale, "DELTA_BYTE_ARRAY"))
        # dictionary: sample-distinct gate, then exact encode (C-fast, only
        # in the low-cardinality case where it can win)
        dict_payload = None
        distinct = None
        try:
            _, _, sample_entries = dictionary.encode(phys, head)
        except Exception:
            sample_entries = k
        if sample_entries * 5 <= k * 4:
            data, dpage, entries = dictionary.encode(phys, values)
            distinct = entries
            if len(dpage) < self.dict_page_limit:
                dict_payload = (data, dpage, entries)
                ests.append((float(stacked(data) + stacked(dpage)) if auto
                             else float(len(data) + len(dpage)), "RLE_DICTIONARY"))
        fsst_probed = False
        if (self.enable_fsst and avg_len >= FSST_MIN_AVG_LEN
                and (distinct is None or distinct * 16 > n)):
            skip = self._fsst_skip.get(column, 0)
            if skip > 0:
                self._fsst_skip[column] = skip - 1
            else:
                fsst_probed = True
                fs = self._fsst_estimate(column, values, head)
                if fs is not None:
                    est_codes, table, probe_len = fs
                    # account for the serialized symbol table and the
                    # ~2 B/value delta-packed code-length stream that
                    # the real payload carries (_try_fsst books the
                    # same terms) — code bytes alone bias short-string
                    # pages toward FSST by tens of percent
                    ests.append((stacked(est_codes)
                                 * (total_bytes / probe_len)
                                 + len(table.serialize()) + 2 * n,
                                 "FSST"))
        # rank with cost hysteresis: a codec that is cheaper to run wins
        # unless the expensive one is smaller by ~5% per cost tier
        cost_rank = {"PLAIN": 0, "DELTA_LENGTH_BYTE_ARRAY": 0,
                     "RLE_DICTIONARY": 1, "DELTA_BYTE_ARRAY": 1, "FSST": 3}
        ests.sort(key=lambda e: e[0])
        best_est, best_codec = ests[0]
        for est, codec in ests:
            margin = 1.05 ** (cost_rank[best_codec] - cost_rank[codec])
            if cost_rank[codec] < cost_rank[best_codec] and est <= best_est * margin:
                best_est, best_codec = est, codec
        if fsst_probed:
            # losing probe → exponential backoff (7 → 14 → … → 64 pages);
            # winning probe → reset and keep probing every page
            if best_codec == "FSST":
                self._fsst_skip[column] = 0
                self._fsst_backoff[column] = 7
            else:
                b = self._fsst_backoff.get(column, 7)
                self._fsst_skip[column] = b
                self._fsst_backoff[column] = min(64, b * 2)
        # materialize the winner
        if best_codec == "RLE_DICTIONARY" and dict_payload is not None:
            data, dpage, entries = dict_payload
        elif best_codec == "FSST":
            data, dpage, entries = fsst.encode(values, table), b"", 0
        else:
            data, dpage, entries = page_mod.encode_with(
                best_codec, phys, values, type_length)
        if len(data) + len(dpage) > plain_size and best_codec != "PLAIN":
            best_codec, (data, dpage, entries) = \
                "PLAIN", (plain.encode(phys, values), b"", 0)
        return self._finish(best_codec, data, dpage, entries, distinct)

    def _fsst_estimate(self, column: str, values, head):
        """Probe-level FSST: returns (probe_code_bytes, table) or None."""
        blob = head.data.tobytes()
        probe = blob[:1 << 14]
        if not probe:
            return None
        if self.block_codec == "auto":
            # when the outer zstd already crushes plain bytes, training an
            # FSST table cannot pay for itself
            z = self._codec(AUTO_BLOCK_CODEC)
            if len(z.compress(probe).to_pybytes()) < len(probe) * 0.15:
                return None
        cached = self._fsst_tables.get(column)
        if cached is not None:
            tbl, ratio_at_train = cached
            codes = tbl.encode_blob(probe)
            if len(codes) / len(probe) <= ratio_at_train * FSST_REUSE_TOLERANCE:
                return codes, tbl, len(probe)
        table = fsst.train(blob)
        codes = table.encode_blob(probe)
        self._fsst_tables[column] = (table, len(codes) / len(probe))
        return codes, table, len(probe)

    def _pick_auto(self, phys, values, type_length, candidates, distinct) -> PageEncoding:
        """auto mode: the outer zstd layer can reorder the ranking (zstd on
        PLAIN often beats zstd on FSST), so compare the top raw candidates
        plus PLAIN on *post-compression* size and keep the best stack."""
        compare = candidates[:2]
        # make sure a cheap zstd-friendly baseline is in the running:
        # DELTA_LENGTH (zero-copy data + delta'd lengths) when available,
        # else PLAIN (avoids materializing the prefixed PLAIN stream)
        baseline = next((c for c in candidates if c[1] == "DELTA_LENGTH_BYTE_ARRAY"),
                        None) or next(c for c in candidates if c[1] == "PLAIN")
        if baseline[1] not in [c[1] for c in compare]:
            compare.append(baseline)
        # cheap decode/encode codecs first; an expensive stack must win by a
        # real margin (>3%) to displace a cheaper one
        cost_rank = {"PLAIN": 0, "FOR": 1, "DELTA_BINARY_PACKED": 1,
                     "DELTA_LENGTH_BYTE_ARRAY": 1, "RLE": 1,
                     "BYTE_STREAM_SPLIT": 1,
                     "RLE_DICTIONARY": 2, "DELTA_BYTE_ARRAY": 2, "FSST": 3}
        compare.sort(key=lambda c: cost_rank.get(c[1], 2))
        c = self._codec(AUTO_BLOCK_CODEC)
        best = None
        best_cost = 0
        for _, codec, payload in compare:
            if payload is None:
                payload = page_mod.encode_with(codec, phys, values, type_length)
            data, dpage, entries = payload
            cdata = c.compress(data).to_pybytes() if len(data) else data
            cdict = c.compress(dpage).to_pybytes() if len(dpage) else dpage
            if len(cdata) + len(cdict) < len(data) + len(dpage):
                enc = PageEncoding(codec, cdata, cdict, entries, distinct,
                                   block_codec=AUTO_BLOCK_CODEC,
                                   data_raw_len=len(data), dict_raw_len=len(dpage))
            else:
                enc = PageEncoding(codec, data, dpage, entries, distinct,
                                   data_raw_len=len(data), dict_raw_len=len(dpage))
            cost = cost_rank.get(codec, 2)
            margin = 0.97 if cost > best_cost else 1.0
            if best is None or enc.total < best.total * margin:
                best, best_cost = enc, cost
        return best

    def _try_dict(self, phys, values, candidates, type_length: int = 0):
        """Dictionary candidate with the reference's dict-page gate
        (`writer.rs:397-420`): dict page beyond 1 MiB → fall back. A cheap
        sample-distinct pre-check skips hashing near-unique chunks."""
        n = len(values)
        if n >= 64:
            k = min(n, 256)
            head = _slice_values(values, k)
            try:
                _, _, sample_entries = dictionary.encode(phys, head)
            except Exception:
                return None
            if sample_entries * 5 > k * 4:
                return None  # near-unique sample → dict can't win
        try:
            data, dpage, entries = dictionary.encode(phys, values)
        except Exception:
            return None
        if len(dpage) < self.dict_page_limit:
            candidates.append((len(data) + len(dpage), "RLE_DICTIONARY",
                               (data, dpage, entries)))
        return entries

    def _try_fsst(self, column: str, values: ByteArrayVals,
                  plain_size: int, candidates) -> None:
        n = len(values)
        total = int(values.offsets[-1])
        if total == 0 or total / n < FSST_MIN_AVG_LEN:
            return
        # contiguous sample (preserves local redundancy)
        sample_n = min(n, SAMPLE_VALUES)
        blob = values.data[:values.offsets[sample_n]].tobytes()
        probe = blob[:1 << 14]
        if not probe:
            return
        if self.block_codec == "auto":
            # pre-check before paying for training: when the outer zstd
            # already crushes the plain bytes, FSST cannot add enough
            z = self._codec(AUTO_BLOCK_CODEC)
            z_plain = len(z.compress(probe).to_pybytes())
            if z_plain < len(probe) * 0.15:
                return
        # Reuse the actor-held table while it still compresses like it did
        # at training time; retrain only on drift (per-actor statefulness).
        cached = self._fsst_tables.get(column)
        table = None
        if cached is not None:
            tbl, ratio_at_train = cached
            ratio_now = len(tbl.encode_blob(probe)) / len(probe)
            if ratio_now <= ratio_at_train * FSST_REUSE_TOLERANCE:
                table, est_ratio = tbl, ratio_now
        if table is None:
            table = fsst.train(blob)
            est_ratio = len(table.encode_blob(probe)) / len(probe)
            self._fsst_tables[column] = (table, est_ratio)
        if self.block_codec == "auto":
            # stacked comparison on the probe: FSST must beat plain under
            # the outer zstd by a real margin to justify its CPU cost
            z_fsst = len(z.compress(table.encode_blob(probe)).to_pybytes())
            if z_fsst >= z_plain * 0.9:
                return
        est_total = int(est_ratio * total) + len(table.serialize()) + n * 2
        if est_total < plain_size * 0.95 and (not candidates or est_total < min(c[0] for c in candidates) * 1.25):
            data = fsst.encode(values, table)
            candidates.append((len(data), "FSST", (data, b"", 0)))
