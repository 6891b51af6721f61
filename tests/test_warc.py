"""WARC/WET ingestion (parquet_rs_ray/warc.py): spec parsing, gzip
member resync, HTTP stripping, the Ray datasource, and the crawl →
extract → encode chain on the north-star invariant (byte-identical
payload per url)."""

import io
import os
import zlib

import pyarrow as pa
import pytest

from parquet_rs_ray.warc import (WarcError, http_response,
                                 iter_warc_records, read_warc, read_wet,
                                 split_http_payload, write_warc)


def _recs(n=5, binary_tail=b""):
    return [{
        "warc_type": "response",
        "url": f"https://ex.com/p/{i}",
        "date": f"2020-01-02T03:04:{i:02d}Z",
        "content_type": "application/http; msgtype=response",
        "payload": http_response(
            f"<html><body>doc {i}</body></html>".encode() + binary_tail),
    } for i in range(n)]


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip_plain_and_gzip(tmp_path, gz):
    """Writer → record iterator, plain and one-gzip-member-per-record
    (the CC convention); payload bytes exact, headers parsed."""
    p = str(tmp_path / ("a.warc.gz" if gz else "a.warc"))
    recs = _recs(5, binary_tail=b"\r\n\r\nWARC/1.0\r\n")  # spoofy bytes
    write_warc(p, recs, gzip_per_record=gz)
    with open(p, "rb") as f:
        got = list(iter_warc_records(f))
    assert len(got) == 5
    for (h, payload), want in zip(got, recs):
        assert h["warc-target-uri"] == want["url"]
        assert h["warc-type"] == "response"
        assert payload == want["payload"]  # Content-Length framing wins
                                           # over embedded WARC/CRLF bytes


def test_multi_member_gzip_stream_boundaries(tmp_path):
    """Member boundaries land mid-record relative to read chunks; the
    decompressobj unused_data resync must splice them seamlessly."""
    p = str(tmp_path / "b.warc.gz")
    write_warc(p, _recs(50), gzip_per_record=True)
    raw = open(p, "rb").read()

    class Dribble:
        def __init__(self, b):
            self.b, self.i = b, 0

        def read(self, n):
            n = min(n, 7)  # tiny ragged reads
            out = self.b[self.i:self.i + n]
            self.i += n
            return out

    got = list(iter_warc_records(Dribble(raw)))
    assert len(got) == 50
    assert got[49][0]["warc-target-uri"] == "https://ex.com/p/49"


def test_truncated_payload_raises(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, _recs(2))
    raw = open(p, "rb").read()
    with pytest.raises(WarcError, match="truncated"):
        list(iter_warc_records(io.BytesIO(raw[:-40])))
    with pytest.raises(WarcError, match="Content-Length"):
        list(iter_warc_records(io.BytesIO(
            b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")))


def test_split_http_payload():
    body = b"<p>x</p>"
    ctype, got = split_http_payload(http_response(body))
    assert (ctype, got) == ("text/html", body)
    # non-HTTP payload passes through untouched
    ctype, got = split_http_payload(b"plain bytes, no status line")
    assert ctype is None and got == b"plain bytes, no status line"


def test_read_warc_dataset(ray_session, tmp_path):
    """Datasource end-to-end: response records only, HTTP stripped,
    timestamps parsed (fractional seconds truncate), body bytes exact."""
    p = str(tmp_path / "c.warc.gz")
    recs = _recs(7)
    recs[3]["date"] = "2020-01-02T03:04:03.123456Z"   # fractional
    recs.append({"warc_type": "warcinfo", "payload": b"software: x",
                 "content_type": "application/warc-fields"})
    write_warc(p, recs, gzip_per_record=True)
    out = read_warc(p).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(out) == 7                      # warcinfo filtered out
    assert out.content_type.eq("text/html").all()
    assert out.payload[0] == b"<html><body>doc 0</body></html>"
    assert str(out.warc_ts[0]) == "2020-01-02 03:04:00"
    assert str(out.warc_ts[3]) == "2020-01-02 03:04:03"


def test_read_wet_dataset(ray_session, tmp_path):
    p = str(tmp_path / "d.wet.gz")
    write_warc(p, [{
        "warc_type": "conversion", "url": f"https://ex.com/{i}",
        "date": "2021-06-07T08:09:10Z", "content_type": "text/plain",
        "payload": f"extracted text {i}".encode(),
    } for i in range(4)], gzip_per_record=True)
    out = read_wet(p).to_pandas().sort_values("url").reset_index(drop=True)
    assert out.text.tolist() == [f"extracted text {i}" for i in range(4)]
    assert out.warc_type.eq("conversion").all()


def test_crawl_to_encode_chain(ray_session, tmp_path):
    """The full ingestion edge on the north-star invariant: webgen pages
    → WARC response records → read_warc → payload bytes BYTE-IDENTICAL
    per url → extract_text runs on the crawl view."""
    from parquet_rs_ray.ops.html import extract_text
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(rows=64, seed=11)
    rows = [(u, h) for u, h in zip(tbl.column("url").to_pylist(),
                                   tbl.column("html").to_pylist())
            if h is not None]
    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, [{"warc_type": "response", "url": u,
                    "content_type": "application/http; msgtype=response",
                    "payload": http_response(h)} for u, h in rows],
               gzip_per_record=True)
    ds = read_warc(p)
    got = ds.to_pandas().set_index("url").payload.to_dict()
    assert got == dict(rows)                  # byte-identical per url
    ext = extract_text(ds, html_col="payload").to_pandas()
    assert (~ext.text_extracted.str.contains("<", regex=False)).all()


def test_encode_job_ingests_warc_natively(ray_session, tmp_path):
    """encode_job accepts raw crawl files: the fused actor parses WARC,
    strips HTTP, extracts text and encodes — one resumable pass, no
    staging parquet copy. Decode returns the web schema with html
    byte-identical per url."""
    from parquet_rs_ray.job import decode_job, encode_job
    from parquet_rs_ray.ops.html import extract_text_array
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(rows=80, seed=13)
    rows = [(u, h) for u, h in zip(tbl.column("url").to_pylist(),
                                   tbl.column("html").to_pylist())
            if h is not None]
    paths = []
    for s in range(2):
        p = str(tmp_path / f"crawl-{s}.warc.gz")
        part = rows[s::2]
        write_warc(p, [{"warc_type": "response", "url": u,
                        "content_type": "application/http; "
                                        "msgtype=response",
                        "payload": http_response(h)} for u, h in part],
                   gzip_per_record=True)
        paths.append(p)
    out = str(tmp_path / "enc")
    s = encode_job(paths, out, concurrency=2)
    assert s["shards_encoded"] == 2 and s["rows"] == len(rows)
    got = decode_job(out).to_pandas().set_index("url")
    assert sorted(got.columns) == ["html", "text", "warc_ts"]
    assert got.html.to_dict() == dict(rows)   # byte-identical per url
    want_txt = {u: extract_text_array(pa.array([h.decode()]))[0].as_py()
                for u, h in rows}
    assert got.text.to_dict() == want_txt
    # resume: nothing left to do on a second run
    s2 = encode_job(paths, out, concurrency=2)
    assert s2["shards_skipped"] == 2 and s2["shards_encoded"] == 0


def test_encode_job_ingests_wet(ray_session, tmp_path):
    from parquet_rs_ray.job import decode_job, encode_job

    p = str(tmp_path / "x.wet.gz")
    write_warc(p, [{"warc_type": "conversion", "url": f"u{i}",
                    "date": "2021-06-07T08:09:10Z",
                    "content_type": "text/plain",
                    "payload": f"text {i}".encode()} for i in range(5)],
               gzip_per_record=True)
    out = str(tmp_path / "enc")
    encode_job([p], out, concurrency=1)
    got = decode_job(out).to_pandas().sort_values("url")
    assert got.text.tolist() == [f"text {i}" for i in range(5)]
    assert sorted(got.columns) == ["text", "url", "warc_ts"]


def test_crawl_extract_encode_decode_north_rule(ray_session, tmp_path):
    """The north rule end to end: crawl bytes → html→text extraction →
    codec-selector encode → decode — extracted text BYTE-IDENTICAL per
    url through the whole engine."""
    from parquet_rs_ray.ops.html import extract_text, extract_text_array
    from parquet_rs_ray.pipeline import roundtrip
    from parquet_rs_ray.webgen import make_web_table

    tbl = make_web_table(rows=96, seed=12)
    rows = [(u, h) for u, h in zip(tbl.column("url").to_pylist(),
                                   tbl.column("html").to_pylist())
            if h is not None]
    p = str(tmp_path / "crawl.warc.gz")
    write_warc(p, [{"warc_type": "response", "url": u,
                    "content_type": "application/http; msgtype=response",
                    "payload": http_response(h)} for u, h in rows],
               gzip_per_record=True)
    crawl = extract_text(read_warc(p), html_col="payload") \
        .map_batches(lambda b: b.select(["url", "text_extracted"]),
                     batch_format="pyarrow", zero_copy_batch=True)
    out = roundtrip(crawl).to_pandas() \
        .set_index("url").text_extracted.to_dict()
    want = {u: extract_text_array(pa.array([h.decode()]))[0].as_py()
            for u, h in rows}
    assert out == want                        # byte-identical per url


# ---- intra-file byte-range splitting (giant-WARC fan-out) ----

def _all_records(path):
    with open(path, "rb") as f:
        return list(iter_warc_records(f))


@pytest.mark.parametrize("k", [1, 2, 3, 7])
def test_range_slots_cover_exactly_once(tmp_path, k):
    """Union over k byte-range slots == the unpartitioned read, and no
    record lands in two slots — for arbitrary (non-member-aligned)
    byte bounds."""
    from parquet_rs_ray.warc import iter_warc_tables_range

    p = str(tmp_path / "big.warc.gz")
    write_warc(p, _recs(60), gzip_per_record=True)
    size = os.path.getsize(p)
    urls = []
    for i in range(k):
        s, e = size * i // k, size * (i + 1) // k
        with open(p, "rb") as f:
            for tbl in iter_warc_tables_range(
                    f, s, e, record_types=None, strip_http=False,
                    payload_as_text=False):
                urls.extend(tbl.column("url").to_pylist())
    want = [h["warc-target-uri"] for h, _ in _all_records(p)]
    assert sorted(urls) == sorted(want)     # exactly once each
    assert len(urls) == len(set(urls)) == 60


def test_tiny_chunk_size_rejected(tmp_path):
    """Regression (review repro): chunk_size 1–2 cannot keep the
    2-byte straddling-magic reserve, the scan cursor never advances,
    and interior slots silently yielded NOTHING — now a loud
    ValueError; chunk_size=3 (the minimum) must still tile exactly."""
    from parquet_rs_ray.warc import _member_chunks_range, _resync_member

    p = str(tmp_path / "tiny.warc.gz")
    write_warc(p, _recs(12), gzip_per_record=True)
    size = os.path.getsize(p)
    with open(p, "rb") as f:
        with pytest.raises(ValueError):
            _resync_member(f, size // 3, 2 * size // 3, chunk_size=1)
        with pytest.raises(ValueError):
            list(_member_chunks_range(f, size // 3, 2 * size // 3,
                                      chunk_size=2))
    whole = b""
    for i in range(3):
        s, e = size * i // 3, size * (i + 1) // 3
        with open(p, "rb") as f:
            whole += b"".join(_member_chunks_range(f, s, e, chunk_size=3))
    with open(p, "rb") as f:
        want = b"".join(_member_chunks_range(f, 0, size))
    assert whole == want


def test_single_member_gzip_falls_to_slot_zero(tmp_path):
    """A whole-file single gzip member can't split: slot 0 decodes all
    records, the other slots yield nothing (correct, just unsplit)."""
    import gzip

    from parquet_rs_ray.warc import iter_warc_tables_range

    plain = str(tmp_path / "a.warc")
    write_warc(plain, _recs(20))
    p = str(tmp_path / "one.warc.gz")
    with open(p, "wb") as out:
        out.write(gzip.compress(open(plain, "rb").read()))
    size = os.path.getsize(p)
    per_slot = []
    for i in range(3):
        s, e = size * i // 3, size * (i + 1) // 3
        got = 0
        with open(p, "rb") as f:
            for tbl in iter_warc_tables_range(
                    f, s, e, record_types=None, strip_http=False,
                    payload_as_text=False):
                got += tbl.num_rows
        per_slot.append(got)
    assert per_slot == [20, 0, 0]


def test_resync_rejects_spoofed_magic_in_stored_blocks(tmp_path):
    """Payload bytes carrying the gzip member magic appear LITERALLY in
    the compressed stream under stored (level-0) deflate blocks; the
    resync validator must reject them (probe decompress + WARC/ prefix)
    so no phantom records appear and coverage stays exact."""
    from parquet_rs_ray.warc import iter_warc_tables_range

    bait = b"\x1f\x8b\x08\x00AAAA\x00\x03" * 40   # magic + junk headers
    recs = _recs(24, binary_tail=bait)
    p = str(tmp_path / "spoof.warc.gz")
    write_warc(p, recs, gzip_per_record=True, gzip_level=0)
    assert bait[:10] in open(p, "rb").read()      # literally present
    size = os.path.getsize(p)
    urls = []
    for i in range(5):
        s, e = size * i // 5, size * (i + 1) // 5
        with open(p, "rb") as f:
            for tbl in iter_warc_tables_range(
                    f, s, e, record_types=None, strip_http=False,
                    payload_as_text=False):
                urls.extend(tbl.column("url").to_pylist())
    assert sorted(urls) == sorted(r["url"] for r in recs)
    assert len(urls) == len(set(urls)) == 24


def test_read_warc_split_matches_unsplit(ray_session, tmp_path):
    """read_warc(split_target_bytes=...) over several files (one of
    them 'giant' relative to the target) equals the unsplit read."""
    paths = []
    for j, n in enumerate([40, 7, 13]):
        p = str(tmp_path / f"c{j}.warc.gz")
        write_warc(p, [{**r, "url": f"{r['url']}?f={j}"}
                       for r in _recs(n)], gzip_per_record=True)
        paths.append(p)

    unsplit = read_warc(paths).to_pandas().sort_values("url") \
        .reset_index(drop=True)
    split = read_warc(paths, split_target_bytes=2048).to_pandas() \
        .sort_values("url").reset_index(drop=True)
    assert len(split) == 40 + 7 + 13
    assert split.equals(unsplit)
    # the giant file genuinely fanned out to >1 descriptor
    assert os.path.getsize(paths[0]) > 2 * 2048


def test_resync_scans_past_buffer_coverage(tmp_path):
    """Regression (review finding): a member >1 MiB compressed whose
    END lies deep inside a slot's range must not make the slot return
    'no members here' just because the probe window already buffered
    the range — the scan cursor, not buffer coverage, decides
    exhaustion. Coverage must stay exact-once for every split."""
    import os as _os
    import zlib as _zlib

    from parquet_rs_ray.warc import http_response, iter_warc_tables_range

    # one INCOMPRESSIBLE big record (~1.2 MiB compressed) + small ones
    import numpy as _np
    big_body = _np.random.default_rng(33).integers(
        0, 256, 1_200_000, dtype=_np.uint8).tobytes()
    recs = [{"warc_type": "response", "url": "https://ex.com/big",
             "date": "2020-01-02T03:04:05Z",
             "content_type": "application/http; msgtype=response",
             "payload": http_response(big_body)}]
    recs += _recs(10)
    p = str(tmp_path / "bigmember.warc.gz")
    write_warc(p, recs, gzip_per_record=True)
    size = _os.path.getsize(p)
    assert size > (1 << 20)              # member 0 alone exceeds chunk
    for k in (2, 3, 5):
        urls = []
        for i in range(k):
            s, e = size * i // k, size * (i + 1) // k
            with open(p, "rb") as f:
                for tbl in iter_warc_tables_range(
                        f, s, e, record_types=None, strip_http=False,
                        payload_as_text=False):
                    urls.extend(tbl.column("url").to_pylist())
        assert sorted(urls) == sorted(r["url"] for r in recs), k
        assert len(urls) == len(recs)


def test_split_rejects_read_args():
    with pytest.raises(TypeError):
        read_warc(["/tmp/x.warc.gz"], split_target_bytes=1024,
                  override_num_blocks=4)
