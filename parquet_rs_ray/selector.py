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

import numpy as np

from .codecs import ByteArrayVals, PhysicalType, dictionary, fsst
from . import page as page_mod
from .codecs import delta as delta_codec
from .codecs import delta_bytes, forpack, plain, rlebool

SAMPLE_VALUES = 2048
FSST_MIN_AVG_LEN = 4.0
FSST_REUSE_TOLERANCE = 1.05


class CodecSelector:
    def __init__(self, dict_page_limit: int = page_mod.DICT_PAGE_SIZE_LIMIT,
                 enable_fsst: bool = True, force_codec: str | None = None):
        self.dict_page_limit = dict_page_limit
        self.enable_fsst = enable_fsst
        self.force_codec = force_codec
        self._fsst_tables: dict[str, tuple[fsst.SymbolTable, float]] = {}

    # ------------------------------------------------------------------
    def select_and_encode(self, phys: PhysicalType, values, *, column: str,
                          type_length: int = 0):
        """Returns (codec, data, dict_page, num_entries, distinct_count)."""
        n = len(values)
        plain_size = page_mod.plain_size_of(phys, values, type_length)
        if self.force_codec:
            data, dpage, entries = page_mod.encode_with(
                self.force_codec, phys, values, type_length)
            return self.force_codec, data, dpage, entries, None

        candidates: list[tuple[int, str, tuple]] = []  # (size, codec, payload)
        distinct = None
        if n == 0:
            return "PLAIN", plain.encode(phys, values), b"", 0, 0

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
        else:  # BYTE_ARRAY / FLBA
            distinct = self._try_dict(phys, values, candidates, type_length)
            if phys == PhysicalType.BYTE_ARRAY:
                dl = delta_bytes.encode_delta_length(values)
                candidates.append((len(dl), "DELTA_LENGTH_BYTE_ARRAY", (dl, b"", 0)))
                dba = delta_bytes.encode_delta_byte_array(values)
                candidates.append((len(dba), "DELTA_BYTE_ARRAY", (dba, b"", 0)))
                # skip FSST when the dictionary already collapses the chunk
                # (low distinct ratio → dict+RLE dominates any string codec)
                dict_dominates = distinct is not None and distinct * 16 <= n
                if self.enable_fsst and not dict_dominates:
                    self._try_fsst(column, values, plain_size, candidates)

        candidates.append((plain_size, "PLAIN", None))
        candidates.sort(key=lambda c: (c[0], c[1]))
        size, codec, payload = candidates[0]
        if payload is None:
            data, dpage, entries = page_mod.encode_with(codec, phys, values, type_length)
        else:
            data, dpage, entries = payload
        # hard floor: never worse than PLAIN
        if len(data) + len(dpage) > plain_size and codec != "PLAIN":
            return "PLAIN", plain.encode(phys, values), b"", 0, distinct
        return codec, data, dpage, entries, distinct

    # ------------------------------------------------------------------
    def _try_dict(self, phys, values, candidates, type_length: int = 0):
        """Dictionary candidate with the reference's dict-page gate
        (`writer.rs:397-420`): dict page beyond 1 MiB → fall back."""
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
        est_total = int(est_ratio * total) + len(table.serialize()) + n * 2
        if est_total < plain_size * 0.95 and (not candidates or est_total < min(c[0] for c in candidates) * 1.25):
            data = fsst.encode(values, table)
            candidates.append((len(data), "FSST", (data, b"", 0)))
