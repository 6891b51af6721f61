r"""Vectorized HTML operators for the Common-Crawl-style web schema.

The engine's north-star input row is `(url, warc_ts, html, text, lang)`
(BASELINE.json input_hint): the `text` column IS extracted html, and the
per-row invariant the whole engine is graded on is byte-identical
extracted text per url. These operators make the html→text edge a real,
distributed pipeline stage instead of an assumed preprocessing step:

- `extract_text`: tag/script/style/comment stripping + named-entity
  decoding + whitespace normalization, as a fixed chain of RE2 passes
  (`pc.replace_substring_regex`) over the whole batch — no per-row
  Python. DuckDB's regexp functions run on RE2 too, so the exact same
  pattern chain replays in SQL and the driver oracle checks the op
  bit-exactly.
- `extract_links`: all quoted `href` values per document as exploded
  `(id, link)` rows — the outlink edge list a web-graph build starts
  from. One vectorized split per batch; the SQL twin is
  `unnest(regexp_extract_all(...))`.

Extraction semantics (deliberately simple, deterministic, and
SQL-replayable — this is a curation-grade extractor, not a browser):

1. `<script>…</script>` and `<style>…</style>` blocks (case-insensitive,
   dotall, non-greedy) are dropped; RE2 has no backreferences so the two
   tags are separate passes.
2. `<!-- … -->` comments are dropped.
3. Every remaining tag `<[^>]*>` becomes a single space. An unclosed
   `<` with no closing `>` is NOT a tag and survives as text (RE2
   no-match), same as DuckDB.
4. The named entities `&lt; &gt; &quot; &apos; &#39; &nbsp; &amp;` are
   decoded, `&amp;` LAST so double-escaped text stays escaped exactly
   once (`&amp;lt;` → `&lt;`, the HTML-correct reading). Numeric
   entities other than `&#39;` are left verbatim (documented seam: a
   general `&#\d+;` decode needs a computed replacement, which neither
   RE2 replace nor SQL regexp_replace can express).
5. Whitespace collapses to single spaces and the result is trimmed.

Reference anchor: parquet-rs has no html layer (its corpus is already
columnar); this module exists because the north rule's corpus is raw web
pages. The text it produces feeds the same downstream ops the reference's
decoded columns do (dedup/minhash tokenizers in ops/dedup.py, quality
scores in ops/textstats.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# The pattern chain, shared verbatim with the SQL oracle (both engines
# are RE2). Order matters and is part of the contract.
_TAG_PASSES: tuple[tuple[str, str], ...] = (
    (r"(?is)<script\b.*?</script\s*>", " "),
    (r"(?is)<style\b.*?</style\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
)
# Plain-substring entity decodes; &amp; must stay last (see module doc).
_ENTITIES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),
)
_WS = r"\s+"


def html_to_text_sql(col: str) -> str:
    """The DuckDB expression computing exactly `extract_text`'s result
    for a string column — built from the same pattern tables so the two
    sides cannot drift. Used by the driver oracle and the parity tests."""
    expr = col
    for pat, rep in _TAG_PASSES:
        rep_sql = "' '" if rep == " " else f"'{rep}'"
        expr = f"regexp_replace({expr}, '{pat}', {rep_sql}, 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = "''''" if ch == "'" else f"'{ch}'"
        expr = f"replace({expr}, '{ent}', {ch_sql})"
    return f"trim(regexp_replace({expr}, '{_WS}', ' ', 'g'))"


def _as_string(col) -> pa.Array:
    """Batch column → utf8 array. Binary columns (the web schema's
    `html:binary`) cast when valid utf-8; rows with invalid bytes decode
    with U+FFFD replacement on a rare per-batch fallback path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        return col
    try:
        return col.cast(pa.string())
    except pa.ArrowInvalid:
        return pa.array(
            [None if v is None else v.decode("utf-8", errors="replace")
             for v in col.to_pylist()], pa.string())


def extract_text_array(html: pa.Array) -> pa.Array:
    """The per-batch kernel: RE2 pass chain over one Arrow column.
    Nulls propagate."""
    a = _as_string(html)
    for pat, rep in _TAG_PASSES:
        a = pc.replace_substring_regex(a, pattern=pat, replacement=rep)
    for ent, ch in _ENTITIES:
        a = pc.replace_substring(a, pattern=ent, replacement=ch)
    a = pc.replace_substring_regex(a, pattern=_WS, replacement=" ")
    return pc.utf8_trim_whitespace(a)


def extract_text(ds, *, html_col: str = "html",
                 out_col: str = "text_extracted"):
    """Append ``out_col`` = extracted text of ``html_col`` (see module
    doc for the exact semantics). Pure map_batches — streams, no
    shuffle, scale-free."""
    def run(batch: pa.Table) -> pa.Table:
        txt = extract_text_array(batch.column(html_col))
        i = batch.schema.get_field_index(out_col)
        if i >= 0:                      # replace an existing column
            return batch.set_column(i, out_col, txt)
        return batch.append_column(out_col, txt)

    return ds.map_batches(run, batch_format="pyarrow",
                          zero_copy_batch=True)


# href attribute start; the OPENING quote is re-emitted after the
# sentinel (RE2 \1 rewrite) so each fragment knows which quote closes
# it — a single [^"']* trim would truncate double-quoted URLs at a
# legal RFC 3986 apostrophe
_HREF_RE = r"""(?i)\bhref\s*=\s*(["'])"""
_SENTINEL = "\x01"


def extract_links_batch(batch: pa.Table, *, html_col: str,
                        id_col: str, out_col: str) -> pa.Table:
    """Explode one batch into (id, link) rows: every quoted href value,
    document order preserved. Vectorized: one RE2 replace marks each
    href start with a sentinel, one split produces the fragments, one
    anchored extract trims each fragment at its closing quote; the id
    column repeats by per-doc link count (np.repeat on the list
    offsets). Unquoted `href=x` attributes don't match (documented), and
    a literal U+0001 in the html is stripped first (the one adversarial
    corner where this differs from the SQL `regexp_extract_all` twin)."""
    html = _as_string(batch.column(html_col))
    s = pc.replace_substring(html, pattern=_SENTINEL, replacement="")
    s = pc.replace_substring_regex(s, pattern=_HREF_RE,
                                   replacement=_SENTINEL + "\\1")
    parts = pc.split_pattern(s, pattern=_SENTINEL)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    offs = parts.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offs)                       # fragments per doc
    flat = parts.values
    keep = np.ones(len(flat), bool)
    keep[offs[:-1][counts > 0]] = False          # drop pre-href fragment
    frags = flat.filter(pa.array(keep))
    u_d = pc.struct_field(
        pc.extract_regex(frags, pattern=r'(?s)^"(?P<u>[^"]*)'), "u")
    u_s = pc.struct_field(
        pc.extract_regex(frags, pattern=r"(?s)^'(?P<u>[^']*)"), "u")
    links = pc.coalesce(u_d, u_s)
    n_links = np.maximum(counts - 1, 0)
    ids = batch.column(id_col)
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    rep_ids = ids.take(pa.array(np.repeat(np.arange(len(batch)), n_links)))
    return pa.table({id_col: rep_ids, out_col: links})


def extract_links(ds, *, html_col: str = "html", id_col: str = "url",
                  out_col: str = "link"):
    """All quoted href values per document as exploded ``(id_col,
    out_col)`` rows — the outlink edge list for web-graph construction.
    Null html emits no rows. Pure map_batches, no shuffle; downstream
    host grouping reuses ops/url.py on the link column."""
    def run(batch: pa.Table) -> pa.Table:
        return extract_links_batch(batch, html_col=html_col,
                                   id_col=id_col, out_col=out_col)

    return ds.map_batches(run, batch_format="pyarrow",
                          zero_copy_batch=True)
