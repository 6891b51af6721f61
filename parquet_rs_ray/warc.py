"""WARC / WET ingestion: the raw-crawl edge of the web pipeline.

The engine's north-star corpus is "Common-Crawl-style web pages"
(BASELINE.json). Common Crawl's raw distribution format is WARC
(ISO 28500: `WARC/1.0` header block, CRLF-separated named headers, a
blank line, `Content-Length` payload bytes, a blank-line terminator),
conventionally gzip-compressed with ONE GZIP MEMBER PER RECORD so
readers can resynchronize; WET text extracts are the same container
with `conversion` records carrying plain text. This module turns those
byte streams into the engine's `(url, warc_ts, payload, ...)` Arrow
rows as a streaming Ray Data source:

- `WarcDatasource` / `read_warc`: a `FileBasedDatasource` whose
  `_read_stream` incrementally parses one file — bounded buffer, one
  record resident at a time, batches of rows yielded as Arrow tables.
  One crawl file is one read task by default (the CC shard, ~1 GiB
  gzipped, is the natural parallelism grain; a 100 TB crawl is ~100 k
  files, far more tasks than any cluster has slots). For PATHOLOGICAL
  inputs — a few 100 GB files that would serialize the read —
  `read_warc(split_target_bytes=...)` fans each file out to byte-range
  tasks: the CC one-member-per-record gzip layout lets any offset
  resync to the next member boundary (magic scan + decompress-probe
  validation, the Hadoop-split idea), so no stored index and no first
  pass are needed; each slot decodes exactly the members STARTING in
  its range.
- `read_wet`: the WET convenience — `conversion` records only, payload
  decoded to a `text` column.
- `write_warc`: a spec-compliant writer used by tests/fixtures (and by
  anyone round-tripping corpora back into crawl format).

HTTP `response` records carry the full HTTP response; with
`strip_http=True` (default) the payload column is the HTTP BODY and
`content_type` is taken from the HTTP headers — i.e. the html bytes a
downstream `ops/html.extract_text` stage wants. Headers the schema
doesn't carry are dropped, not buffered.

Reference anchor: parquet-rs starts at already-columnar files
(`src/file/reader.rs`); this module is the up-stream edge its corpus
implies but never ships — the crawl-to-columnar ingestion step that
feeds `job.encode_job`.
"""

from __future__ import annotations

import io
import uuid
import zlib
from typing import Iterator

import pyarrow as pa
import pyarrow.compute as pc

from .errors import ParquetRsRayError

_CRLF2 = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"
# records per emitted Arrow batch; html payloads make rows fat, so the
# byte bound below usually triggers first on real crawls
_BATCH_ROWS = 256
_BATCH_BYTES = 16 << 20


class WarcError(ParquetRsRayError):
    """Malformed or truncated WARC input."""


def _gzip_chunks(f, chunk_size: int = 1 << 20, *, fed_base: int = 0,
                 stop_at: int | None = None) -> Iterator[bytes]:
    """Decompressed chunks of a (possibly multi-member) gzip stream.
    zlib with wbits=31 stops at each member boundary; `unused_data`
    carries the next member's bytes — the CC one-member-per-record
    convention decodes in one pass with no per-member reopen.

    ``stop_at`` (with ``fed_base`` = the absolute offset of the first
    byte ``f`` will yield) ends the walk before any member whose
    compressed start offset is ≥ stop_at — the intra-file range-split
    grain (`_member_chunks_range`) rides this same loop instead of a
    second copy of the member-splicing logic."""
    d = zlib.decompressobj(wbits=31)
    fed_end = fed_base              # abs offset just past bytes fed
    while True:
        raw = f.read(chunk_size)
        if not raw:
            break
        fed_end += len(raw)
        while raw:
            try:
                out = d.decompress(raw)
            except zlib.error as e:   # bit rot / bad transfer: typed,
                raise WarcError(      # so callers can quarantine
                    f"corrupt gzip member in WARC stream: {e}") from e
            if out:
                yield out
            if d.eof:
                nxt = fed_end - len(d.unused_data)  # next member's abs
                if stop_at is not None and nxt >= stop_at:
                    return             # next slot's member: stop here
                raw = d.unused_data
                d = zlib.decompressobj(wbits=31)
            else:
                raw = b""
    tail = d.flush()
    if tail:
        yield tail


def _raw_chunks(f, chunk_size: int = 1 << 20) -> Iterator[bytes]:
    while True:
        raw = f.read(chunk_size)
        if not raw:
            return
        yield raw


def iter_warc_records(f) -> Iterator[tuple[dict, bytes]]:
    """Incremental record iterator over a WARC byte stream (gzipped or
    plain, auto-detected from the magic). Yields `(headers, payload)`
    with header names lowercased. Buffer holds at most one record plus
    one read chunk. Truncation raises WarcError (typed, never a silent
    partial record)."""
    head = f.read(2)
    chunks = _gzip_chunks if head[:2] == _GZIP_MAGIC else _raw_chunks

    class _Prefixed:
        def __init__(self):
            self._first = head

        def read(self, n):
            if self._first:
                out, self._first = self._first, b""
                return out
            return f.read(n)

    it = chunks(_Prefixed())
    buf = bytearray()

    def fill() -> bool:
        try:
            buf.extend(next(it))
            return True
        except StopIteration:
            return False

    while True:
        # skip inter-record padding
        while len(buf) < 4:
            if not fill():
                if buf.strip(b"\r\n"):
                    raise WarcError("truncated WARC header block")
                return
        while buf[:2] == b"\r\n":
            del buf[:2]
        if not buf:
            continue
        # header block ends at the first CRLFCRLF
        while (end := buf.find(_CRLF2)) < 0:
            if not fill():
                raise WarcError("truncated WARC header block")
        block = bytes(buf[:end]).decode("utf-8", errors="replace")
        del buf[:end + 4]
        lines = block.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise WarcError(f"bad WARC version line: {lines[0]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(":")
            if sep:
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcError("record missing valid Content-Length") from None
        while len(buf) < length:
            if not fill():
                raise WarcError(
                    f"truncated payload: need {length}, have {len(buf)}")
        payload = bytes(buf[:length])
        del buf[:length]
        yield headers, payload


_GZ_MEMBER_MAGIC = b"\x1f\x8b\x08"   # magic + CM=deflate


def _member_probe_ok(data: bytes) -> bool:
    """Does ``data`` begin a real record-carrying gzip member? The
    deflate stream must start cleanly AND its first decompressed bytes
    must be the WARC version line — a payload byte run that merely
    mimics the 3-byte magic fails one of the two. (Heuristic resync has
    the same residual limit as Hadoop text splits / warcio indexing: a
    payload embedding a complete well-formed gzipped WARC record
    through a STORED-block member could validate; top-level members are
    the format's contract.)"""
    if data[:3] != _GZ_MEMBER_MAGIC:
        return False
    d = zlib.decompressobj(wbits=31)
    try:
        out = d.decompress(data, 8)
    except zlib.error:
        return False
    return out[:5] == b"WARC/"


def _resync_member(f, start: int, end: int,
                   chunk_size: int = 1 << 20) -> int | None:
    """Absolute offset of the first gzip member starting in
    ``[start, end)``, or None. Offset 0 is a boundary by definition;
    interior candidates are found by scanning the COMPRESSED bytes for
    the member magic and validated by `_member_probe_ok` (decompress a
    probe, require the WARC version prefix)."""
    if chunk_size < 3:
        # the slide keeps len(magic)-1 = 2 bytes for a straddling
        # match; a window smaller than that cannot advance and would
        # silently scan nothing (review repro: chunk_size=1 dropped
        # every interior-slot record)
        raise ValueError("chunk_size must be >= 3")
    if start == 0:
        return 0
    # probe window past `end`: a candidate near the range end still
    # needs compressed bytes to validate against
    probe = 1 << 16
    f.seek(start)
    buf = b""
    base = start                       # abs offset of buf[0]
    eof = False
    pos = 0                            # scan cursor within buf
    while base + pos < end:            # candidates must START before end
        # keep ~one chunk of scannable bytes plus a probe window; the
        # window SLIDES on every advance (bounded memory on member-less
        # AND on spoof-dense gigabyte ranges)
        while not eof and len(buf) < pos + chunk_size + probe:
            raw = f.read(chunk_size)
            if not raw:
                eof = True
                break
            buf += raw
        limit = min(len(buf), pos + chunk_size)     # this window's span
        idx = buf.find(_GZ_MEMBER_MAGIC, pos,
                       limit + len(_GZ_MEMBER_MAGIC) - 1)
        if idx < 0:
            if eof and limit >= len(buf):
                return None            # scanned to end of file
            # advance the SCAN CURSOR only to what was actually
            # scanned (keep 2 bytes for a straddling magic) — never
            # declare the range exhausted on buffer coverage alone
            new_pos = max(limit - 2, pos)
            if new_pos == pos and eof:
                return None
            base += new_pos
            buf = buf[new_pos:]
            pos = 0
            continue
        if base + idx >= end:
            return None                # first candidate is past end
        if _member_probe_ok(buf[idx:idx + probe]):
            return base + idx
        pos = idx + 1
        if pos > chunk_size:           # trim after failed probes too
            base += pos
            buf = buf[pos:]
            pos = 0
    return None


def _member_chunks_range(f, start: int, end: int,
                         chunk_size: int = 1 << 20) -> Iterator[bytes]:
    """Decompressed chunks of every gzip member whose compressed START
    offset lies in ``[start, end)`` — a member straddling ``end`` is
    finished by the slot that started it, so slots tile the file with
    no member read twice and none skipped (the intra-file split grain;
    cf. job.decode_job's (file, slot) pattern for containers)."""
    pos = _resync_member(f, start, end, chunk_size)
    if pos is None:
        return
    f.seek(pos)
    yield from _gzip_chunks(f, chunk_size, fed_base=pos, stop_at=end)


class _ChunkStream:
    """`.read(n)` facade over an iterator of byte chunks (feeds the
    plain-stream record parser with pre-decompressed member ranges)."""

    def __init__(self, gen: Iterator[bytes]):
        self._gen = gen
        self._buf = bytearray()

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            try:
                self._buf.extend(next(self._gen))
            except StopIteration:
                break
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out


def iter_warc_tables_range(f, start: int, end: int, *,
                           record_types: tuple[str, ...] | None,
                           strip_http: bool,
                           payload_as_text: bool) -> Iterator[pa.Table]:
    """`iter_warc_tables` over one compressed byte range of a
    one-member-per-record (Common Crawl layout) ``.warc.gz``: only the
    members starting in ``[start, end)`` are decompressed and parsed.
    Member boundaries must align with record boundaries (the CC
    convention); a misaligned member makes the parser raise a typed
    WarcError rather than emit a torn record."""
    stream = _ChunkStream(_member_chunks_range(f, start, end))
    yield from iter_warc_tables(stream, record_types=record_types,
                                strip_http=strip_http,
                                payload_as_text=payload_as_text)


def split_http_payload(payload: bytes) -> tuple[str | None, bytes]:
    """(HTTP Content-Type, body) of an application/http payload; a
    payload with no header/body split returns (None, payload)."""
    cut = payload.find(_CRLF2)
    if cut < 0 or not payload[:5].isupper():
        return None, payload
    ctype = None
    for ln in payload[:cut].split(b"\r\n")[1:]:
        k, sep, v = ln.partition(b":")
        if sep and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", errors="replace")
    return ctype, payload[cut + 4:]


def _records_to_table(rows: list[tuple], payload_as_text: bool) -> pa.Table:
    urls, types, dates, ctypes, payloads = map(list, zip(*rows))
    # WARC-Date is ISO-8601 UTC; fractional seconds (rare) truncate
    date_arr = pa.array(dates, pa.string())
    date_arr = pc.replace_substring_regex(date_arr, pattern=r"\.\d+Z$",
                                          replacement="Z")
    ts = pc.strptime(date_arr, format="%Y-%m-%dT%H:%M:%SZ", unit="us",
                     error_is_null=True)
    if payload_as_text:
        pay = pa.array(
            [None if p is None else p.decode("utf-8", errors="replace")
             for p in payloads], pa.string())
        pay_name = "text"
    else:
        pay = pa.array(payloads, pa.binary())
        pay_name = "payload"
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": ts,
        "warc_type": pa.array(types, pa.string()),
        "content_type": pa.array(ctypes, pa.string()),
        pay_name: pay,
    })


def iter_warc_tables(f, *, record_types: tuple[str, ...] | None,
                     strip_http: bool,
                     payload_as_text: bool) -> Iterator[pa.Table]:
    rows: list[tuple] = []
    nbytes = 0
    for headers, payload in iter_warc_records(f):
        rtype = headers.get("warc-type", "")
        if record_types is not None and rtype not in record_types:
            continue
        ctype = headers.get("content-type")
        if strip_http and ctype and ctype.startswith("application/http"):
            http_ctype, payload = split_http_payload(payload)
            if http_ctype is not None:
                ctype = http_ctype
        rows.append((headers.get("warc-target-uri"), rtype,
                     headers.get("warc-date", ""), ctype, payload))
        nbytes += len(payload)
        if len(rows) >= _BATCH_ROWS or nbytes >= _BATCH_BYTES:
            yield _records_to_table(rows, payload_as_text)
            rows, nbytes = [], 0
    if rows:
        yield _records_to_table(rows, payload_as_text)


try:  # the datasource needs Ray; the parser above stays importable alone
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        """Streaming WARC/WET file source. One file = one read task =
        one gzip stream decoded sequentially (gzip members can't be
        split); Ray's streaming executor pipelines files across tasks."""

        _FILE_EXTENSIONS = ["warc", "warc.gz", "wet", "wet.gz"]

        def __init__(self, paths, *, record_types=None, strip_http=True,
                     payload_as_text=False, **kwargs):
            kwargs.setdefault("file_extensions", None)
            super().__init__(paths, **kwargs)
            self._record_types = (tuple(record_types)
                                  if record_types is not None else None)
            self._strip_http = strip_http
            self._payload_as_text = payload_as_text

        def _read_stream(self, f, path: str):
            yield from iter_warc_tables(
                f, record_types=self._record_types,
                strip_http=self._strip_http,
                payload_as_text=self._payload_as_text)

except ImportError:  # pragma: no cover
    WarcDatasource = None


def _empty_warc_table(payload_as_text: bool) -> pa.Table:
    return pa.table({
        "url": pa.array([], pa.string()),
        "warc_ts": pa.array([], pa.timestamp("us")),
        "warc_type": pa.array([], pa.string()),
        "content_type": pa.array([], pa.string()),
        ("text" if payload_as_text else "payload"):
            pa.array([], pa.string() if payload_as_text else pa.binary()),
    })


def make_warc_range_reader(*, record_types, strip_http, payload_as_text):
    """Batch fn over `{path, start, end}` descriptors → record tables
    from the gzip members starting in each compressed byte range (the
    giant-file fan-out grain). A plain (uncompressed) WARC can't resync
    safely, so slot 0 parses it whole and the other slots yield nothing
    — correct, just unsplit."""

    def read_ranges(batch: pa.Table):
        got_any = False
        for p, s, e in zip(batch.column("path").to_pylist(),
                           batch.column("start").to_pylist(),
                           batch.column("end").to_pylist()):
            with open(p, "rb") as f:
                magic = f.read(2)
                f.seek(0)
                if magic == _GZIP_MAGIC:
                    tables = iter_warc_tables_range(
                        f, s, e, record_types=record_types,
                        strip_http=strip_http,
                        payload_as_text=payload_as_text)
                elif s == 0:
                    tables = iter_warc_tables(
                        f, record_types=record_types,
                        strip_http=strip_http,
                        payload_as_text=payload_as_text)
                else:
                    continue
                for tbl in tables:
                    got_any = True
                    yield tbl
        if not got_any:
            yield _empty_warc_table(payload_as_text)

    return read_ranges


def _read_warc_split(paths, *, split_target_bytes: int, record_types,
                     strip_http: bool, payload_as_text: bool):
    """Descriptor-based WARC read: each file fans out to
    ``ceil(size / split_target_bytes)`` byte-range tasks, so ONE
    pathological 100 GB crawl file spreads across a cluster the way
    container decodes do (job.decode_job's (file, slot) pattern) —
    the CC one-member-per-record gzip layout makes any byte offset
    resync-able without a stored index or a first pass. LOCAL paths
    only (descriptors are sized with os.path.getsize and opened with
    open(); the engine's whole IO layer shares this constraint)."""
    import os

    import ray

    if isinstance(paths, (str, bytes)):
        paths = [paths]
    descs = []
    for p in paths:
        size = os.path.getsize(p)
        k = max(1, -(-size // split_target_bytes))
        bounds = [size * i // k for i in range(k + 1)]
        descs.extend({"path": p, "start": bounds[i], "end": bounds[i + 1]}
                     for i in range(k))
    ds = ray.data.from_items(descs, override_num_blocks=len(descs))
    return ds.map_batches(
        make_warc_range_reader(record_types=record_types,
                               strip_http=strip_http,
                               payload_as_text=payload_as_text),
        batch_format="pyarrow", batch_size=None)


def read_warc(paths, *, record_types: tuple[str, ...] | None = ("response",),
              strip_http: bool = True,
              split_target_bytes: int | None = None, **read_args):
    """Crawl WARC files → Dataset of `(url, warc_ts, warc_type,
    content_type, payload)`. Defaults keep only `response` records with
    HTTP headers stripped — the html-bytes view `encode_job` and
    `ops/html.extract_text` consume.

    ``split_target_bytes`` turns on intra-file parallelism: each file
    splits into ~that many compressed bytes per task via gzip-member
    resync (leave None for normal ~1 GiB CC shards, where 1 file = 1
    task is the right grain; set it when a few giant files would
    otherwise serialize the read). The split path takes LOCAL file
    paths and no datasource read_args — both raise loudly rather than
    being silently ignored."""
    import ray

    if split_target_bytes:
        if read_args:
            raise TypeError(
                "split_target_bytes reads via byte-range descriptors, "
                f"not a datasource; read_args {sorted(read_args)} "
                "would be silently ignored — drop them or drop the split")
        return _read_warc_split(paths,
                                split_target_bytes=split_target_bytes,
                                record_types=record_types,
                                strip_http=strip_http,
                                payload_as_text=False)
    return ray.data.read_datasource(
        WarcDatasource(paths, record_types=record_types,
                       strip_http=strip_http), **read_args)


def read_wet(paths, *, split_target_bytes: int | None = None, **read_args):
    """WET text extracts → Dataset of `(url, warc_ts, warc_type,
    content_type, text)` from `conversion` records. See `read_warc`
    for ``split_target_bytes``."""
    import ray

    if split_target_bytes:
        if read_args:
            raise TypeError(
                "split_target_bytes reads via byte-range descriptors, "
                f"not a datasource; read_args {sorted(read_args)} "
                "would be silently ignored — drop them or drop the split")
        return _read_warc_split(paths,
                                split_target_bytes=split_target_bytes,
                                record_types=("conversion",),
                                strip_http=False, payload_as_text=True)
    return ray.data.read_datasource(
        WarcDatasource(paths, record_types=("conversion",),
                       strip_http=False, payload_as_text=True),
        **read_args)


def write_warc(path: str, records: list[dict], *,
               gzip_per_record: bool = False,
               gzip_level: int = 6) -> None:
    """Spec-compliant WARC writer (tests, fixtures, corpus export).
    Each record dict: `warc_type`, `payload` (bytes), optional `url`,
    `date` (ISO-8601 Z), `content_type`, `record_id`. With
    `gzip_per_record=True` every record is its own gzip member (the CC
    convention this module's reader resynchronizes on); ``gzip_level=0``
    emits stored deflate blocks (payload bytes appear literally in the
    compressed stream — the resync spoof-resistance fixture)."""
    out = io.BytesIO()
    for rec in records:
        payload = rec["payload"]
        headers = [("WARC-Type", rec["warc_type"])]
        if rec.get("url") is not None:
            headers.append(("WARC-Target-URI", rec["url"]))
        headers.append(("WARC-Date",
                        rec.get("date", "2020-01-01T00:00:00Z")))
        headers.append(("WARC-Record-ID",
                        rec.get("record_id",
                                f"<urn:uuid:{uuid.uuid4()}>")))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        headers.append(("Content-Length", str(len(payload))))
        blob = (b"WARC/1.0\r\n"
                + b"".join(f"{k}: {v}\r\n".encode() for k, v in headers)
                + b"\r\n" + payload + _CRLF2)
        if gzip_per_record:
            co = zlib.compressobj(gzip_level, zlib.DEFLATED, 31)
            blob = co.compress(blob) + co.flush()
        out.write(blob)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())


def http_response(body: bytes, *, content_type: str = "text/html",
                  status: str = "200 OK") -> bytes:
    """Wrap body bytes as the HTTP response payload a crawl `response`
    record carries (test/fixture helper)."""
    return (f"HTTP/1.1 {status}\r\nContent-Type: {content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n").encode() + body
