"""Resumable encode job: read shards → encode (actor pool) → write
per-block encoded parquet + commit per-shard lineage to the manifest.

Flow (streaming end to end, SURVEY §3.1/§4.2):

  paths ──manifest filter──▶ read_parquet(include_paths=True)
        ──map_batches(EncodeWriteActor)──▶ tiny lineage rows
        ──driver streams lineage, commits manifest entry when a shard's
          row count completes──▶ resumable output

Output layout: {out_dir}/data/{container}.parquet — ONE container file
per input shard holding one parquet ROW GROUP per (encoded block,
source column) by default (layout="column"; legacy layout="block"
packs a whole block per row group ≙ the reference's single-file
row-group packing, `src/file/writer.rs:119-249`): partitioned output
whose file count is bounded by shard count, not block count, with
per-block AND per-column random access via row-group footers (see
reader.py — the footer statistics double as the column index, ≙ the
reference's per-column chunk byte ranges, `src/file/reader.rs:295-330`).
Manifest at {out_dir}/manifest/. A killed run restarts by skipping
committed shards; containers are written to a .tmp name and atomically
renamed only when the shard completes, so orphans from uncommitted
shards are never referenced by decode.
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from . import manifest
from .page import PAGE_SCHEMA, merge_stats_zones, merge_zone_dicts
from .pipeline import EncodeActor, decode_batch

LINEAGE_SCHEMA = pa.schema([
    ("path", pa.string()),
    ("block_file", pa.string()),
    ("rows", pa.int64()),
    # blocks this shard produced in total — lets the driver commit a
    # shard as soon as all its lineage rows arrive without any serial
    # footer prefetch of expected row counts before the pipeline starts
    ("n_blocks", pa.int64()),
    ("plain_bytes", pa.int64()),
    ("encoded_bytes", pa.int64()),
    ("codecs_json", pa.string()),
    ("checksum", pa.string()),
    # column→{kind,min,max} zone map of this block, folded from its page
    # stats (EDBT 2018 partition elimination; see page.merge_stats_zones)
    ("zones_json", pa.string()),
])


class _BlockContainer:
    """One output parquet file holding MANY encoded blocks, one parquet
    row group per block (≙ the reference's single-file row-group packing,
    `/root/reference/src/file/writer.rs:119-249`). At 100 TB, one file
    per block would mean ~10^8 files — a filesystem-metadata scale
    hazard; a container per input shard bounds file count at one per
    shard while parquet row-group footers keep per-block random access."""

    def __init__(self, data_dir: str, own_rg_min_bytes: int | None = None):
        self.final = os.path.join(data_dir, f"{uuid.uuid4().hex[:16]}.parquet")
        self.tmp = self.final + ".tmp"
        self.writer: pq.ParquetWriter | None = None
        self.own_rg_min_bytes = (self._OWN_RG_MIN_BYTES
                                 if own_rg_min_bytes is None
                                 else own_rg_min_bytes)

    # the reader's footer index needs statistics for exactly two fields
    # (reader.plan_container); computing min/max + dictionary trials over
    # the big binary payload columns was measured 4-5x writer wall —
    # restrict both to the small repeated-string metadata fields
    _STATS_COLS = ["block_id", "column"]
    _DICT_COLS = ["path", "block_id", "column", "phys", "codec",
                  "block_codec"]
    # encoded bytes a column needs within a block to earn its own row
    # group under layout="column" (else it shares the block's small-
    # column group); 256 KiB ⇒ skipping it saves real IO while the
    # per-row-group overhead stays amortized
    _OWN_RG_MIN_BYTES = 256 << 10

    def append_block(self, block: pa.Table, layout: str = "block") -> str:
        if self.writer is None:
            # page payloads are already compressed — don't recompress
            self.writer = pq.ParquetWriter(
                self.tmp, block.schema, compression="none",
                write_statistics=self._STATS_COLS,
                use_dictionary=[c for c in self._DICT_COLS
                                if c in block.schema.names])
        if layout == "column":
            # one row group per (block, BIG source column), small
            # columns sharing one: the footer's per-row-group
            # block_id/column statistics become a free column index
            # (see reader.plan_container), so a projected decode reads
            # only the selected columns' bytes — ≙ the reference's
            # per-column chunk byte ranges (`src/file/reader.rs:295-330`).
            # The IO win of projection comes entirely from SKIPPING the
            # big payload columns; giving every tiny column its own row
            # group just multiplies footer entries and per-group
            # write/read overhead (measured ~25% encode wall on the web
            # corpus), so columns under _OWN_RG_MIN_BYTES share one
            # group — a projected read of one of them drags only its
            # small co-tenants along, and the range-based planner stays
            # conservative for the shared group. Page rows arrive
            # grouped by col_idx (encode emits column by column);
            # slice the runs rather than filtering per column.
            import numpy as np
            ci = block.column("col_idx").to_numpy(zero_copy_only=False)
            enc = block.column("encoded_size").to_numpy(
                zero_copy_only=False)
            cuts = np.flatnonzero(np.diff(ci)) + 1
            starts = [0, *cuts.tolist()]
            ends = [*cuts.tolist(), len(ci)]
            shared = []
            for s, e in zip(starts, ends):
                if enc[s:e].sum() >= self.own_rg_min_bytes:
                    self.writer.write_table(block.slice(s, e - s))
                else:
                    shared.append(block.slice(s, e - s))
            if shared:
                self.writer.write_table(
                    shared[0] if len(shared) == 1
                    else pa.concat_tables(shared))
        else:
            self.writer.write_table(block)  # one row group per block
        return self.final

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()
            os.replace(self.tmp, self.final)  # commit atomically
            self.writer = None


class EncodeWriteActor(EncodeActor):
    """Encode a block and persist its page rows; emit one lineage row per
    (path, block). Writing happens inside the task so the pipeline stays
    streaming (no driver materialization of encoded data)."""

    def __init__(self, out_dir: str, layout: str = "column",
                 own_rg_min_bytes: int | None = None, **kwargs):
        super().__init__(**kwargs)
        self.layout = layout
        self.own_rg_min_bytes = own_rg_min_bytes
        self.data_dir = os.path.join(out_dir, "data")
        os.makedirs(self.data_dir, exist_ok=True)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pages = super().__call__(batch)
        container = _BlockContainer(self.data_dir, self.own_rg_min_bytes)
        lineage = self._write_blocks(pages, container)
        container.close()
        return lineage

    def _write_blocks(self, pages: pa.Table,
                      container: _BlockContainer) -> pa.Table:
        out_rows = []
        import pyarrow.compute as pc
        blocks_per_path: dict[str, set] = defaultdict(set)
        for p, bid in zip(pages.column("path").to_pylist(),
                          pages.column("block_id").to_pylist()):
            blocks_per_path[p].add(bid)
        for block_id in pages.column("block_id").unique().to_pylist():
            block = pages.filter(pc.equal(pages.column("block_id"), block_id))
            fname = container.append_block(
                block, layout=getattr(self, "layout", "block"))
            h = hashlib.sha256()
            for buf in block.column("data").to_pylist():
                h.update(hashlib.sha256(buf).digest())
            codecs = Counter(zip(block.column("column").to_pylist(),
                                 block.column("codec").to_pylist()))
            by_col: dict[str, list[dict]] = defaultdict(list)
            for cname, sj, nv, nc in zip(
                    block.column("column").to_pylist(),
                    block.column("stats_json").to_pylist(),
                    block.column("num_values").to_pylist(),
                    block.column("null_count").to_pylist()):
                if nv - nc <= 0:
                    continue  # valueless page constrains nothing
                try:
                    by_col[cname].append(json.loads(sj))
                except ValueError:
                    by_col[cname].append({})  # poisons the column's zone
            zones = {}
            for cname, sts in by_col.items():
                z = merge_stats_zones(sts)
                if z:
                    zones[cname] = z
            bpath = block.column("path")[0].as_py()
            out_rows.append({
                "path": bpath,
                "n_blocks": len(blocks_per_path[bpath]),
                "block_file": fname,
                "rows": int(block.column("block_rows")[0].as_py()),
                "plain_bytes": int(sum(block.column("plain_size").to_pylist())),
                "encoded_bytes": int(sum(block.column("encoded_size").to_pylist())),
                "codecs_json": json.dumps({f"{c}:{k}": v for (c, k), v in codecs.items()}),
                "checksum": h.hexdigest(),
                "zones_json": json.dumps(zones),
            })
        return pa.Table.from_pylist(out_rows, schema=LINEAGE_SCHEMA)


def iter_jsonl_tables(path: str, target_bytes: int = 64 << 20):
    """Stream a JSONL/NDJSON shard (optionally gzipped) as bounded
    Arrow tables: the file is read in ~``target_bytes`` slices cut at
    the last newline (a line longer than the slice just accumulates),
    each slice parsed with pyarrow.json. The FIRST parsed block fixes
    the schema; later blocks are aligned and safe-cast to it, so a
    mid-file type drift fails with a typed ArrowInvalid instead of
    producing blocks that cannot concatenate at decode."""
    import gzip
    import io

    import pyarrow.json as pj

    opener = gzip.open if path.endswith(".gz") else open
    schema = None

    def parse(raw: bytes) -> pa.Table:
        nonlocal schema
        # block_size must cover the longest line: pyarrow's default
        # 1 MiB block raises "straddling object" on multi-MB documents,
        # which the slice accumulator exists to support
        tbl = pj.read_json(io.BytesIO(raw), read_options=pj.ReadOptions(
            block_size=len(raw) + 1))
        if schema is None:
            schema = tbl.schema
            return tbl
        # sparse optional fields: a slice whose rows all omit a field
        # still aligns (nulls); a field the FIRST block never saw is a
        # typed error, not silent data loss
        extra = [c for c in tbl.column_names if c not in schema.names]
        if extra:
            raise ValueError(
                f"JSONL fields {extra} appear mid-file but not in the "
                f"first block; schema is pinned by the first "
                f"{target_bytes}-byte slice — reorder the file or raise "
                f"target_bytes past the first occurrence")
        for name in schema.names:
            if name not in tbl.column_names:
                tbl = tbl.append_column(
                    name, pa.nulls(len(tbl), schema.field(name).type))
        return tbl.select(schema.names).cast(schema)

    with opener(path, "rb") as f:
        buf = b""
        while True:
            chunk = f.read(target_bytes)
            if not chunk:
                break
            buf += chunk
            cut = buf.rfind(b"\n")
            if cut < 0:
                continue                 # giant line: keep accumulating
            part, buf = buf[:cut + 1], buf[cut + 1:]
            yield parse(part)
        if buf.strip():                  # unterminated last line
            yield parse(buf)


class EncodeShardActor(EncodeWriteActor):
    """Fused read→encode→write stage: the actor receives shard *paths*
    and reads the parquet itself. This keeps every pool CPU doing
    read+encode+write instead of splitting the node between a read stage
    and an encode stage (a separate read stage starves once the actor
    pool owns nearly all CPUs), and moves no row data through the object
    store — only paths in, lineage rows out."""

    _WARC_EXT = (".warc", ".warc.gz", ".wet", ".wet.gz")
    _JSONL_EXT = (".jsonl", ".jsonl.gz", ".ndjson", ".ndjson.gz")

    def _iter_tables(self, path: str):
        """Stream one input shard as bounded Arrow tables (one table =
        one encoded block). Parquet shards stream row-group-wise; WARC
        crawl files stream record batches through the ISO-28500 parser
        with HTTP stripped and html→text extracted in-actor; JSONL
        shards (the other common corpus interchange format) stream
        newline-aligned slices through pyarrow.json — all in the SAME
        fused resumable pass, no staging copy of the corpus."""
        if path.endswith(self._JSONL_EXT):
            yield from iter_jsonl_tables(path)
            return
        if path.endswith(self._WARC_EXT):
            from .ops.html import extract_text_array
            from .warc import iter_warc_tables

            # extension check, not substring: a .warc file whose NAME
            # contains ".wet" must not silently parse as a WET extract
            # (conversion-only filtering would commit it as empty)
            wet = path.endswith((".wet", ".wet.gz"))
            with open(path, "rb") as f:
                for tbl in iter_warc_tables(
                        f, record_types=("conversion",) if wet
                        else ("response",), strip_http=not wet,
                        payload_as_text=wet):
                    if wet:
                        yield tbl.select(["url", "warc_ts", "text"])
                    else:
                        html = tbl.column("payload")
                        yield pa.table({
                            "url": tbl.column("url"),
                            "warc_ts": tbl.column("warc_ts"),
                            "html": html,
                            "text": extract_text_array(html)})
            return
        pf = pq.ParquetFile(path)
        for rg in range(pf.metadata.num_row_groups):
            yield pf.read_row_group(rg)

    def __call__(self, batch) -> pa.Table:
        paths = (batch["path"].to_pylist() if isinstance(batch, pa.Table)
                 else list(batch["path"]))
        lineage = []
        for path in paths:
            # streaming read: a shard is never fully held in actor
            # memory (giant shards at 100 TB scale), and each block is
            # appended to the shard's container file the moment it is
            # encoded (parquet: one row group per block; WARC: one
            # parser batch per block)
            container = _BlockContainer(self.data_dir, self.own_rg_min_bytes)
            rows_out = []
            for tbl in self._iter_tables(path):
                tbl = tbl.append_column(
                    "path", pa.array([path] * tbl.num_rows))
                pages = EncodeActor.__call__(self, tbl)
                rows_out.append(self._write_blocks(pages, container))
            container.close()
            per_path = (pa.concat_tables(rows_out) if len(rows_out) != 1
                        else rows_out[0]) if rows_out else None
            if per_path is None or per_path.num_rows == 0:
                # empty shard (zero row groups, OR row groups with zero
                # rows — pq.write_table(empty) produces one 0-row group
                # whose lineage table is empty): emit one sentinel
                # lineage row so the shard still COMMITS (block_file=""
                # is skipped by committed_blocks; without it resume
                # would re-run the empty shard forever)
                per_path = pa.Table.from_pylist([{
                    "path": path, "block_file": "", "rows": 0,
                    "n_blocks": 1, "plain_bytes": 0, "encoded_bytes": 0,
                    "codecs_json": "{}", "checksum": "",
                    "zones_json": "{}"}],
                    schema=LINEAGE_SCHEMA)
            # n_blocks was computed per row group; fix up to the shard
            # total so the driver commits only when the whole shard landed
            total = per_path.num_rows
            per_path = per_path.set_column(
                per_path.column_names.index("n_blocks"), "n_blocks",
                pa.array([total] * total, pa.int64()))
            lineage.append(per_path)
        return pa.concat_tables(lineage) if len(lineage) > 1 else lineage[0]


def encode_job(paths: list[str], out_dir: str, *, concurrency=(1, 8),
               block_codec: str | None = None, enable_fsst: bool = True,
               override_num_blocks: int | None = None,
               reorder="off", layout: str = "column",
               own_rg_min_bytes: int | None = None) -> dict:
    """Run (or resume) the encode job. Returns summary stats.

    ``layout="column"`` (default) writes one container row group per
    (block, source column) so projected decodes read only the selected
    columns' bytes (see reader.py); ``layout="block"`` is the legacy
    one-row-group-per-block packing — both remain readable forever."""
    import ray

    manifest_dir = os.path.join(out_dir, "manifest")
    todo = manifest.pending(manifest_dir, paths)
    already = len(paths) - len(todo)
    summary = {"shards_total": len(paths), "shards_skipped": already,
               "shards_encoded": 0, "rows": 0, "plain_bytes": 0,
               "encoded_bytes": 0}
    if not todo:
        return summary

    # fused read→encode→write: ship shard paths, not row data (see
    # EncodeShardActor); several shards per actor call — per-task
    # dispatch overhead at 1 task/shard costs ~30% wall at ~90ms shards
    ncpu = int(ray.cluster_resources().get("CPU", 32))
    nblocks = min(len(todo), max(4 * ncpu, 32))
    ds = ray.data.from_items([{"path": p} for p in todo],
                             override_num_blocks=nblocks)
    lineage = ds.map_batches(
        EncodeShardActor,
        fn_constructor_kwargs={"out_dir": out_dir,
                               "block_codec": block_codec,
                               "enable_fsst": enable_fsst,
                               "reorder": reorder,
                               "layout": layout,
                               "own_rg_min_bytes": own_rg_min_bytes},
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None,
        concurrency=concurrency)

    # stream lineage rows; commit a shard once all its block rows arrived
    # (each lineage row carries the shard's total block count, so no
    # serial metadata prefetch happens before the pipeline starts)
    acc: dict[str, list[dict]] = defaultdict(list)
    got_rows: Counter = Counter()
    for row in lineage.iter_rows():
        p = row["path"]
        acc[p].append(row)
        got_rows[p] += row["rows"]
        if len(acc[p]) >= row["n_blocks"]:
            blocks = acc.pop(p)
            plain_b = sum(b["plain_bytes"] for b in blocks)
            enc_b = sum(b["encoded_bytes"] for b in blocks)
            codecs: Counter = Counter()
            zmap: dict[str, dict] = {}
            for b in blocks:
                codecs.update(json.loads(b["codecs_json"]))
                if b["block_file"]:
                    z = json.loads(b.get("zones_json") or "{}")
                    zmap[b["block_file"]] = (
                        merge_zone_dicts(zmap[b["block_file"]], z)
                        if b["block_file"] in zmap else z)
            manifest.record(
                manifest_dir, p,
                output_path=json.dumps(sorted(b["block_file"] for b in blocks)),
                rows=got_rows[p], plain_bytes=plain_b, encoded_bytes=enc_b,
                codecs=dict(codecs),
                checksum=hashlib.sha256(
                    "".join(sorted(b["checksum"] for b in blocks)).encode()).hexdigest(),
                zones=zmap)
            summary["shards_encoded"] += 1
            summary["rows"] += got_rows[p]
            summary["plain_bytes"] += plain_b
            summary["encoded_bytes"] += enc_b
    return summary


def committed_block_files(out_dir: str) -> list[str]:
    files, _ = committed_blocks(out_dir)
    return files


def committed_block_counts(out_dir: str) -> Counter:
    """container file → committed block count, straight from the
    manifest's per-block output entries (NO metadata reads)."""
    entries = manifest.load(os.path.join(out_dir, "manifest"))
    counts: Counter = Counter()
    for e in entries.values():
        # "" = committed empty-shard sentinel, no data; one entry PER
        # BLOCK, so many blocks of a shard share one container file
        counts.update(f for f in json.loads(e["output"]) if f)
    return counts


def committed_blocks(out_dir: str) -> tuple[list[str], int]:
    """(sorted container files, total block count) from the manifest."""
    counts = committed_block_counts(out_dir)
    return sorted(counts), sum(counts.values())


def committed_zones(out_dir: str) -> dict[str, dict | None]:
    """container file → merged column zone map across every shard whose
    blocks share the file; ``None`` marks a file some referencing entry
    gives no zones for (pre-zones encode run) — never eliminate it."""
    entries = manifest.load(os.path.join(out_dir, "manifest"))
    zones: dict[str, dict | None] = {}
    for e in entries.values():
        ez = e.get("zones")
        for f in json.loads(e["output"]):
            if not f:
                continue
            if ez is None or f not in ez:
                zones[f] = None
            elif f not in zones:
                zones[f] = ez[f]
            elif zones[f] is not None:
                zones[f] = merge_zone_dicts(zones[f], ez[f])
    return zones


def eliminate_files(files: list[str], zones: dict[str, dict | None],
                    predicate) -> list[str]:
    """Manifest-level partition elimination (EDBT 2018): drop container
    files whose merged zones PROVE no row satisfies the predicate —
    before a single byte of them is read. Sound: a file without zones
    (or without bounds for a predicate column) is always kept, and
    page-level pruning + the exact post-decode filter still run."""
    from .pipeline import _normalize_predicates, _stats_can_match
    preds = _normalize_predicates(predicate)
    if not preds:
        return files
    keep = []
    for f in files:
        z = zones.get(f)
        if z is None:
            keep.append(f)
            continue
        ok = True
        for col, op, val in preds:
            st = z.get(col)
            if st and not _stats_can_match(st, op, val):
                ok = False
                break
        if ok:
            keep.append(f)
    return keep


def decode_job(out_dir: str, *, columns=None, predicate=None):
    """Dataset over the committed encoded blocks, decoded to the
    original schema (streaming). Pushdown happens at THREE levels, each
    sound on its own (exact filtering still runs after decode):

    1. manifest zones eliminate whole container files driver-side (no
       IO per eliminated file);
    2. inside each surviving file, the parquet footer plans which row
       groups to read (reader.plan_read): ``columns`` restricts IO to
       the selected source columns' row groups, and ``predicate`` runs
       a payload-free metadata probe that skips whole blocks' bytes;
    3. the page-level pruner + exact post-decode filter (pipeline.py).

    Read+decode are FUSED in one task (paths in, decoded rows out — no
    encoded pages through the object store). Parallelism targets block
    count from the manifest: many files group several per task; few
    big files split at block granularity via deterministic ``(i, k)``
    block slots, so 4 giant shards still fan out across a cluster."""
    import ray
    counts = committed_block_counts(out_dir)
    files = sorted(counts)
    if not files:
        raise FileNotFoundError(f"no committed blocks under {out_dir}")
    if predicate:
        # manifest-level partition elimination: skip whole container
        # files before any read (zones live in the manifest, so this is
        # a driver-side dict scan — no IO per eliminated file)
        kept = eliminate_files(files, committed_zones(out_dir), predicate)
        # keep one file when everything is eliminable so the decoded
        # dataset still carries the original schema (0 rows after the
        # exact filter)
        files = kept or files[:1]
    ncpu = int(ray.cluster_resources().get("CPU", 32))
    target = max(4 * ncpu, 32)
    descriptors = []
    if len(files) >= target:
        descriptors = [{"file": f, "part_i": 0, "part_k": 1}
                       for f in files]
    else:
        # few files: split each file's blocks across ~target tasks,
        # proportionally to its manifest block count (no footer reads
        # on the driver — tasks resolve their block slots themselves)
        total = sum(counts[f] for f in files) or 1
        for f in files:
            k = max(1, min(counts.get(f, 1) or 1,
                           round(counts.get(f, 1) * target / total)))
            descriptors.extend(
                {"file": f, "part_i": i, "part_k": k} for i in range(k))
    from .reader import make_container_decoder
    ds = ray.data.from_items(
        descriptors,
        override_num_blocks=min(len(descriptors), target))
    return ds.map_batches(
        make_container_decoder(columns=columns, predicate=predicate),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=None)


class _CompactActor:
    """Merge several shards' container files into one container per bin —
    row groups (= encoded blocks) copied verbatim, so block checksums,
    page payloads and the block=row-group invariant are all preserved."""

    def __init__(self, data_dir: str):
        self.data_dir = data_dir

    def __call__(self, batch: pa.Table) -> pa.Table:
        # reported per (shard, src_file): a shard's blocks may span
        # several containers (EncodeWriteActor opens one per batch), so
        # the driver must be able to rewrite a shard's entry file-by-
        # file — a per-shard total here would be a partial count
        # whenever the shard's other containers sit in another bin or
        # above the size threshold (ADVICE r2)
        out = []
        for bin_json in batch.column("bin_json").to_pylist():
            files = json.loads(bin_json)
            container = _BlockContainer(self.data_dir)
            per: dict[tuple, set] = defaultdict(set)
            for src in files:
                pf = pq.ParquetFile(src)
                for rg in range(pf.metadata.num_row_groups):
                    block = pf.read_row_group(rg)
                    # layout="block" here COPIES the source row group
                    # as one row group, whatever layout produced it —
                    # a column-layout (block, column) group stays one
                    # group with its footer identity intact
                    container.append_block(block)
                    # count DISTINCT blocks: under layout="column" a
                    # block spans several row groups, and the manifest
                    # validation below compares per-BLOCK refs
                    per[(block.column("path")[0].as_py(), src)].update(
                        block.column("block_id").unique().to_pylist())
            container.close()
            out.extend({"shard": s, "src_file": f,
                        "new_file": container.final, "n_blocks": len(bids)}
                       for (s, f), bids in per.items())
        return pa.Table.from_pylist(out, schema=pa.schema(
            [("shard", pa.string()), ("src_file", pa.string()),
             ("new_file", pa.string()), ("n_blocks", pa.int64())]))


def compact_job(out_dir: str, *, target_file_bytes: int = 256 << 20,
                concurrency=(1, 8)) -> dict:
    """Merge small container files into ~``target_file_bytes`` ones —
    the maintenance pass a long-lived 100 TB layout needs (many small
    shards → many small containers → filesystem-metadata pressure and
    tiny reads). Row groups are copied verbatim (block payloads,
    checksums and the one-row-group-per-block invariant unchanged).

    Crash safety (every reader sees ONE consistent state at all times):
      phase 1  write merged containers (.tmp → atomic rename); a crash
               here leaves unreferenced files, GC'd by the next run
      phase 2  commit ALL affected manifest entries in one atomic
               journal rename (`manifest.write_journal`) — readers
               overlay a pending journal, so the switch from old to new
               containers is a single atomic event across shards
      phase 3  fold the journal into the per-shard entry files, then
               clear it
      phase 4  GC every data file no manifest entry references (old
               sources AND orphans of earlier crashed runs)
    Idempotent; re-running finds nothing left to merge. Run it as the
    SINGLE maintainer — phase-4 GC would delete containers an encode
    job running concurrently has written but not yet committed."""
    import ray

    manifest_dir = os.path.join(out_dir, "manifest")
    data_dir = os.path.join(out_dir, "data")
    entries = manifest.load(manifest_dir)  # overlays any pending journal
    if manifest.pending_journal(manifest_dir):
        # finish a crashed run's phase 3 before planning anything new
        for shard, e in manifest.pending_journal(manifest_dir).items():
            manifest.record(
                manifest_dir, shard, output_path=e["output"],
                rows=e["rows"], plain_bytes=e["plain_bytes"],
                encoded_bytes=e["encoded_bytes"], codecs=e["codecs"],
                checksum=e["checksum"], zones=e.get("zones"))
        manifest.clear_journal(manifest_dir)
    # group shards by container file; a missing file (external cleanup)
    # is skipped — it cannot be merged, only reported
    file_shards: dict[str, list[str]] = defaultdict(list)
    file_bytes: dict[str, int] = {}
    for shard, e in entries.items():
        for f in sorted({x for x in json.loads(e["output"]) if x}):
            file_shards[f].append(shard)
            if f not in file_bytes and os.path.exists(f):
                file_bytes[f] = os.path.getsize(f)
    # greedy size bins over files smaller than the target
    small = sorted(f for f, b in file_bytes.items()
                   if b < target_file_bytes)
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_b = 0
    for f in small:
        if cur and cur_b + file_bytes[f] > target_file_bytes:
            bins.append(cur)
            cur, cur_b = [], 0
        cur.append(f)
        cur_b += file_bytes[f]
    if cur:
        bins.append(cur)
    bins = [b for b in bins if len(b) > 1]  # singletons: nothing to gain
    summary = {"bins": len(bins),
               "files_before": len(file_bytes), "files_merged": 0,
               "orphans_deleted": 0}
    if bins:
        ds = ray.data.from_items(
            [{"bin_json": json.dumps(b)} for b in bins],
            override_num_blocks=len(bins))
        moved = ds.map_batches(
            _CompactActor,
            fn_constructor_kwargs={"data_dir": data_dir},
            batch_format="pyarrow", batch_size=None,
            concurrency=concurrency)

        # validate and stage ALL entry rewrites, then commit atomically.
        # Aggregated per (shard, src_file): a shard's untouched
        # containers keep their entries verbatim, and a shard whose
        # containers landed in different bins gets every mapping applied
        # (not last-bin-wins)
        remap: dict[str, dict[str, str]] = defaultdict(dict)
        moved_n: Counter = Counter()
        for row in moved.iter_rows():
            remap[row["shard"]][row["src_file"]] = row["new_file"]
            moved_n[(row["shard"], row["src_file"])] += row["n_blocks"]
        updates: dict[str, dict] = {}
        for shard, mapping in remap.items():
            e = entries[shard]
            old = json.loads(e["output"])
            for src, _new in mapping.items():
                n_refs = sum(1 for f in old if f == src)
                if n_refs != moved_n[(shard, src)]:
                    raise RuntimeError(
                        f"compaction block count changed for {shard} in "
                        f"{src}: {n_refs} -> {moved_n[(shard, src)]}"
                    )  # pre-commit abort
            upd = dict(
                e, output=json.dumps(
                    [mapping.get(f, f) if f else f for f in old]))
            if e.get("zones") is not None:
                # zones follow their blocks: rename keys through the
                # mapping; two source files of THIS shard landing in one
                # container merge conservatively
                nz: dict[str, dict] = {}
                for f, z in e["zones"].items():
                    nf = mapping.get(f, f)
                    nz[nf] = merge_zone_dicts(nz[nf], z) if nf in nz else z
                upd["zones"] = nz
            updates[shard] = upd
        manifest.write_journal(manifest_dir, updates)    # phase 2
        for shard, e in updates.items():                 # phase 3
            manifest.record(
                manifest_dir, shard, output_path=e["output"],
                rows=e["rows"], plain_bytes=e["plain_bytes"],
                encoded_bytes=e["encoded_bytes"], codecs=e["codecs"],
                checksum=e["checksum"], zones=e.get("zones"))
        manifest.clear_journal(manifest_dir)
        summary["files_merged"] = sum(len(b) for b in bins)

    # phase 4: GC every data file the manifest no longer references
    # (merged sources + committed-but-never-referenced containers from
    # crashed runs); .tmp files are in-flight writes, left alone
    still_used = set()
    for e in manifest.load(manifest_dir).values():
        still_used.update(f for f in json.loads(e["output"]) if f)
    if os.path.isdir(data_dir):
        for name in os.listdir(data_dir):
            f = os.path.join(data_dir, name)
            if name.endswith(".tmp") or f in still_used:
                continue
            os.remove(f)
            summary["orphans_deleted"] += 1
    # phase 5: fold the manifest into one snapshot file (compact_job is
    # already the single maintainer, the precondition manifest.snapshot
    # shares) — a long-lived corpus keeps one snapshot + recent deltas
    # instead of a file-per-shard directory
    summary["manifest_folded"] = manifest.snapshot(manifest_dir)
    summary["files_after"] = len(committed_block_files(out_dir))
    return summary


def stats_job(out_dir: str, *, columns=None):
    """Global per-column statistics of the ENCODED corpus without
    touching a single payload byte: reads ONLY the metadata columns of
    the committed containers (parquet column projection skips the
    `data`/`dict`/`levels` payloads on disk — at 100 TB the scan is the
    page-stats sidecar, ~0.1 % of the data), folds per-page typed stats
    with the same conservative merge the zone maps use, and returns one
    row per column: rows, null_count, min, max (rendered as strings;
    empty when no sound bound exists, e.g. huge-blob columns whose
    pages skip min/max by design). ≙ SURVEY §2.9 — the reference only
    round-trips stats; this computes corpus-level ones from page stats
    alone."""
    import json as _json

    import ray

    files, n_blocks = committed_blocks(out_dir)
    if not files:
        raise FileNotFoundError(f"no committed blocks under {out_dir}")
    ncpu = int(ray.cluster_resources().get("CPU", 32))
    eds = ray.data.read_parquet(
        files, columns=["column", "stats_json", "num_values",
                        "null_count", "page_id"],
        override_num_blocks=max(min(n_blocks, 4 * ncpu), 1))
    if columns:
        want = pa.array(sorted(set(columns)))
        eds = eds.map_batches(
            lambda b: b.filter(
                pa.compute.is_in(b.column("column"), value_set=want)),
            batch_format="pyarrow", zero_copy_batch=True)

    def partial(batch: pa.Table) -> pa.Table:
        per: dict[str, dict] = {}
        for cname, sj, nv, nc in zip(
                batch.column("column").to_pylist(),
                batch.column("stats_json").to_pylist(),
                batch.column("num_values").to_pylist(),
                batch.column("null_count").to_pylist()):
            st = per.setdefault(cname, {"rows": 0, "nulls": 0,
                                        "stats": [], "unsound": False})
            st["rows"] += nv
            st["nulls"] += nc
            if nv - nc <= 0:
                continue               # valueless page bounds nothing
            try:
                st["stats"].append(_json.loads(sj))
            except ValueError:
                st["unsound"] = True
        rows = []
        for cname, st in per.items():
            z = {} if st["unsound"] else merge_stats_zones(st["stats"])
            # `unsound` ⇔ VALUE-BEARING pages exist whose bounds are
            # unusable (unparsable stats, or a merge with no sound
            # min/max, e.g. huge-blob pages skipping stats by design).
            # A task whose pages for a column are ALL null has empty
            # stats but is perfectly sound: it constrains nothing and
            # must not blank the corpus bounds (an all-null shard next
            # to a valued shard still has an exact MIN/MAX).
            unsound = st["unsound"] or (bool(st["stats"]) and not z)
            rows.append({"column": cname, "rows": st["rows"],
                         "null_count": st["nulls"],
                         "zone_json": _json.dumps(z),
                         "unsound": unsound})
        return pa.Table.from_pylist(rows, schema=pa.schema(
            [("column", pa.string()), ("rows", pa.int64()),
             ("null_count", pa.int64()), ("zone_json", pa.string()),
             ("unsound", pa.bool_())]))

    # partials are one row per (column, read task): the driver folds
    # O(columns x tasks) summaries, never page rows
    acc: dict[str, dict] = {}
    for b in eds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True) \
            .iter_batches(batch_format="pyarrow"):
        for cname, r, nc, zj, uns in zip(
                b.column("column").to_pylist(),
                b.column("rows").to_pylist(),
                b.column("null_count").to_pylist(),
                b.column("zone_json").to_pylist(),
                b.column("unsound").to_pylist()):
            st = acc.setdefault(cname, {"rows": 0, "nulls": 0,
                                        "zones": [], "unsound": False})
            st["rows"] += r
            st["nulls"] += nc
            z = json.loads(zj)
            if uns:
                st["unsound"] = True
            elif z:
                st["zones"].append(z)
            # else: all-null partial — sound, bounds nothing
    out = []
    for cname in sorted(acc):
        st = acc[cname]
        z = {} if st["unsound"] else merge_stats_zones(st["zones"])
        out.append({"column": cname, "rows": st["rows"],
                    "null_count": st["nulls"],
                    "min": "" if "min" not in z else str(z["min"]),
                    "max": "" if "max" not in z else str(z["max"])})
    return pa.Table.from_pylist(out, schema=pa.schema(
        [("column", pa.string()), ("rows", pa.int64()),
         ("null_count", pa.int64()), ("min", pa.string()),
         ("max", pa.string())]))


def hash_index_job(out_dir: str, column: str, *,
                   index_dir: str | None = None) -> dict:
    """Content-hash index of one DECODED column of the committed corpus
    — the "what do we already have" side of incremental ingestion
    (``ops.dedup.dedup_against_index`` anti-joins new shards against
    it, never re-reading the corpus text).

    Reads ONLY the column's payload bytes (the column-group layout's
    projection IO — at 100 TB the scan is that column, not the corpus),
    hashes each batch with the same vectorized kernel ``exact_dedup``
    uses, per-batch distinct + sort, and writes small hash parquets
    under ``{out_dir}/index/{column}/``. 8 bytes per distinct document
    text: the index of a 10^10-doc corpus is ~80 GB of parquet —
    streamed here, never driver-materialized; its consumers pick
    broadcast vs join per ops/regime.py."""
    import numpy as np
    index_dir = index_dir or os.path.join(out_dir, "index", column)
    from .ops.dedup import _hash_strings

    def to_hashes(batch: pa.Table) -> pa.Table:
        h = np.unique(_hash_strings(batch.column(column)))
        return pa.table({"h": pa.array(h.view(np.int64), pa.int64())})

    decode_job(out_dir, columns=[column]) \
        .map_batches(to_hashes, batch_format="pyarrow",
                     zero_copy_batch=True) \
        .write_parquet(index_dir)
    import pyarrow.dataset as pads
    rows = pads.dataset(index_dir).count_rows()  # metadata-only
    return {"index_dir": index_dir, "column": column, "hashes": rows}
