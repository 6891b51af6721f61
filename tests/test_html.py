"""HTML → text extraction and outlink extraction (ops/html.py).

The extractor's contract is the RE2 pattern chain documented in the
module; DuckDB replays the identical chain (both engines are RE2), so
every behavior here is pinned twice: hand-written expectations AND
bit-exact SQL parity over an adversarial corpus.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray.ops.html import (extract_links, extract_links_batch,
                                     extract_text, extract_text_array,
                                     html_to_text_sql)

TRICKY = [
    "<html><head><title>t</title><style>p{color:red}</style></head>"
    "<body><p>Hello &amp; welcome</p><script>var x='<p>no</p>';</script>"
    "<div>World<br>again</div><!-- gone --><P CLASS='x'>Caps</P></body>",
    "plain text no tags",
    "",
    None,
    "bad <unclosed tag survives as text",
    "&lt;tag&gt; &quot;q&quot; &#39;a&#39; &nbsp;sp &amp;amp; stays",
    "<ScRiPt>mixed</sCrIpT>case<STYLE a=b>s</STYLE >done",
    "a  \t b\n\nc   d",
    "<a href=\"http://x.com/1\">one</a> mid <a HREF='//y.com/2?q=1#f'>two</a>",
    "<img src='p.png'/><a href=\"\">empty</a><a href=/nq>unquoted</a>",
    "<p>&amp;lt; double escaped</p>",
]


def _duck(con_rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES " + ",".join(
            f"({i}, " + ("NULL" if h is None else
                         "'" + h.replace("'", "''") + "'") + ")"
            for i, h in enumerate(con_rows)) + ") v(i, h)")
    return con


def test_extract_text_kernel_expectations():
    out = extract_text_array(pa.array(TRICKY, pa.string())).to_pylist()
    assert out[0] == "t Hello & welcome World again Caps"
    assert out[1] == "plain text no tags"
    assert out[2] == ""
    assert out[3] is None
    assert out[4] == "bad <unclosed tag survives as text"
    # entity decode: one level only; &amp;amp; -> &amp;
    assert out[5] == '<tag> "q" \'a\' sp &amp; stays'
    assert out[6] == "case done"                # case-insensitive blocks
    assert out[7] == "a b c d"                  # whitespace collapse
    assert out[10] == "&lt; double escaped"     # HTML-correct double escape


def test_extract_text_sql_parity():
    """The whole adversarial corpus, bit-exact vs the DuckDB replay of
    the same chain (html_to_text_sql builds the SQL from the same
    pattern tables, so the two sides cannot drift)."""
    got = extract_text_array(pa.array(TRICKY, pa.string())).to_pylist()
    con = _duck(TRICKY)
    want = [r[0] for r in con.execute(
        f"SELECT {html_to_text_sql('h')} FROM t ORDER BY i").fetchall()]
    assert got == want


def test_extract_text_binary_and_invalid_utf8():
    """The web schema's html column is binary; valid utf-8 casts
    zero-copy, invalid bytes take the documented U+FFFD fallback."""
    arr = pa.array([b"<p>ok</p>", b"bad \xff byte", None], pa.binary())
    out = extract_text_array(arr).to_pylist()
    assert out[0] == "ok"
    assert out[1] == "bad \ufffd byte"
    assert out[2] is None


def test_extract_text_dataset(ray_session):
    """Dataset-level: webgen's synthetic pages extract to tag-free text
    containing the original body words."""
    import ray
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(rows=200, seed=7)
    out = extract_text(ray.data.from_arrow(tbl),
                       html_col="html").to_pandas()
    assert len(out) == 200
    mask = out.html.notna()
    assert mask.any()
    ext = out.loc[mask, "text_extracted"]
    assert (~ext.str.contains("<", regex=False)).all()
    assert (~ext.str.contains("&amp;", regex=False)).all()
    # body text survives: first word of the source text appears
    first_words = out.loc[mask, "text"].str.split().str[0]
    assert all(w in e for w, e in zip(first_words, ext))
    # null html stays null
    assert out.loc[~mask, "text_extracted"].isna().all()


def test_extract_links_batch_expectations():
    batch = pa.table({
        "url": ["d0", "d1", "d2", "d3"],
        "html": [TRICKY[8], "no links", None,
                 "<a href='a'>1</a><a href=\"b\">2</a><a href='c'>3</a>"]})
    out = extract_links_batch(batch, html_col="html", id_col="url",
                              out_col="link")
    assert out.column("url").to_pylist() == ["d0", "d0", "d3", "d3", "d3"]
    assert out.column("link").to_pylist() == [
        "http://x.com/1", "//y.com/2?q=1#f", "a", "b", "c"]


def test_extract_links_sql_parity(ray_session):
    import ray

    tbl = pa.table({"i": pa.array(range(len(TRICKY)), pa.int64()),
                    "html": pa.array(TRICKY, pa.string())})
    got = extract_links(ray.data.from_arrow(tbl), html_col="html",
                        id_col="i").to_pandas()
    got = got.sort_values(["i", "link"]).reset_index(drop=True)
    con = _duck(TRICKY)
    want = con.execute(
        "SELECT i, unnest(regexp_extract_all(h, "
        "'(?i)\\bhref\\s*=\\s*[\"''\"]([^\"'']*)', 1)) AS link "
        "FROM t ORDER BY i, link").fetchdf()
    assert got.i.tolist() == want.i.tolist()
    assert got.link.tolist() == want.link.tolist()


def test_extract_links_sentinel_stripped():
    """A literal U+0001 in the html must not fabricate links."""
    batch = pa.table({"id": [0], "html": ["pre \x01 href=\"u\" post"]})
    out = extract_links_batch(batch, html_col="html", id_col="id",
                              out_col="link")
    # \x01 stripped first: 'href="u"' then DOES match (documented corner)
    assert out.column("link").to_pylist() == ["u"]
    batch2 = pa.table({"id": [0], "html": ["plain \x01 no href"]})
    out2 = extract_links_batch(batch2, html_col="html", id_col="id",
                               out_col="link")
    assert len(out2) == 0
