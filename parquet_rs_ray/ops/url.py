"""Vectorized URL operators for the Common-Crawl-style web schema.

The engine's north-star input is `(url, warc_ts, html, text, lang)`
(BASELINE.json input_hint); web-corpus curation constantly groups,
caps, dedups and reports BY URL STRUCTURE — host, registered domain,
path. These operators keep that work in Arrow kernels:

- `url_parts`: one `pc.extract_regex` (RE2) pass per batch appends
  scheme/host/path columns — no per-row Python, no shuffle.
- `registered_domain`: last-two-labels heuristic over the host (a
  deliberate approximation of the public-suffix list, which is an
  external artifact; documented, SQL-replayable).
- `normalize_url`: lowercase scheme+host, drop query/fragment — the
  canonical key for URL-level exact dedup.
- `host_stats`: per-host doc count + character volume, a map-side
  combinable groupby (partial aggregation happens inside Ray's
  hash-shuffle aggregate; only (host, partials) rows move).

All four are SQL-expressible (DuckDB regexp_extract / string ops also
run on RE2), so the driver oracle checks them bit-exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host(path up to ? or #) — RE2, shared verbatim with the
# DuckDB oracle (both engines are RE2-based)
# case-insensitive scheme (RFC 3986 §3.1: schemes are
# case-insensitive; normalize_url lowercases post-match) — an
# uppercase-scheme URL must not fall into the null/unparseable group
URL_RE = (r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)")
_NAMED_URL_RE = (r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://"
                 r"(?P<host>[^/?#]*)(?P<path>[^?#]*)")


def _str_col(batch: pa.Table, col: str) -> pa.Array:
    c = batch.column(col)
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    return c


def url_parts(ds, *, url_col: str = "url"):
    """Append ``scheme`` / ``host`` / ``path`` columns parsed from
    ``url_col``. Unparseable or null URLs yield null parts (RE2
    no-match)."""
    def parse(batch: pa.Table) -> pa.Table:
        u = _str_col(batch, url_col)
        ext = pc.extract_regex(u, pattern=_NAMED_URL_RE)
        for name in ("scheme", "host", "path"):
            batch = batch.append_column(name, pc.struct_field(ext, name))
        return batch

    return ds.map_batches(parse, batch_format="pyarrow",
                          zero_copy_batch=True)


def registered_domain(host: pa.Array) -> pa.Array:
    """Last two dot-labels of a host column ('a.b.example.com' →
    'example.com'; single-label hosts pass through). Heuristic: the real
    public-suffix list is an external artifact this container doesn't
    ship; two labels cover the common gTLD case and the SQL oracle
    replays the same rule."""
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    ext = pc.extract_regex(host, pattern=r"(?P<rd>[^.]+\.[^.]+)$")
    rd = pc.struct_field(ext, "rd")
    return pc.if_else(pc.is_valid(rd), rd, host)


def normalize_url(ds, *, url_col: str = "url",
                  out_col: str = "url_norm"):
    """Append the canonical dedup key: lowercased scheme + host, path
    kept verbatim, query/fragment dropped. Unparseable URLs normalize
    to null (they can then be exact-deduped as a group or filtered)."""
    def norm(batch: pa.Table) -> pa.Table:
        u = _str_col(batch, url_col)
        ext = pc.extract_regex(u, pattern=_NAMED_URL_RE)
        out = pc.binary_join_element_wise(
            pc.utf8_lower(pc.struct_field(ext, "scheme")), "://",
            pc.utf8_lower(pc.struct_field(ext, "host")),
            pc.struct_field(ext, "path"), "")
        return batch.append_column(out_col, out)

    return ds.map_batches(norm, batch_format="pyarrow",
                          zero_copy_batch=True)


def host_stats(ds, *, url_col: str = "url", chars_col: str | None = None):
    """Per-host corpus report: document count (and character volume if
    ``chars_col`` given). One hash-shuffle groupby over (host, partial)
    rows; Ray pre-aggregates map-side, so the wide step moves one row
    per (block, host), not per document."""
    def to_host(batch: pa.Table) -> pa.Table:
        u = _str_col(batch, url_col)
        ext = pc.extract_regex(u, pattern=_NAMED_URL_RE)
        cols = {"host": pc.struct_field(ext, "host")}
        if chars_col is not None:
            cols[chars_col] = batch.column(chars_col)
        return pa.table(cols)

    hosts = ds.map_batches(to_host, batch_format="pyarrow",
                           zero_copy_batch=True)
    if chars_col is None:
        out = hosts.groupby("host").count()
        rename = {"count()": "n_docs"}
    else:
        out = hosts.groupby("host").aggregate(
            __count_agg(), __sum_agg(chars_col))
        rename = {"count()": "n_docs", f"sum({chars_col})": "total_chars"}

    def fix(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [rename.get(c, c) for c in batch.column_names])

    return out.map_batches(fix, batch_format="pyarrow",
                           zero_copy_batch=True)


def __count_agg():
    from ray.data.aggregate import Count
    return Count()


def __sum_agg(col):
    from ray.data.aggregate import Sum
    return Sum(col)
