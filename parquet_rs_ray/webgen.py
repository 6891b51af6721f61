"""Deterministic synthetic Common-Crawl-style web-page table
(BASELINE.json `input_hint`, FIXTURES.md F1):

    url:string  warc_ts:timestamp[us]  html:binary(nullable ~2%)
    text:string  lang:string

Seeded numpy generators only; no external data. Used by tests and
bench.py at small scale — the engine itself never depends on this.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

LANGS = ( # weights applied via Zipf below
         "en de fr es pt it nl ru ja zh ko ar tr pl sv fi no da cs hu ro el he th vi id ms hi bn ta te ur fa uk bg sr hr sk sl lt lv et".split())



def _vocab(rng: np.random.Generator, size: int = 4096) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(2, 10, size)
    return np.array(["".join(rng.choice(letters, l)) for l in lens])


def make_web_table(rows: int, seed: int = 42, shard: int = 0) -> pa.Table:
    rng = np.random.default_rng(seed + shard * 1009)
    n_domains = 1000
    domains = np.array([f"domain{i:04d}.example" for i in range(n_domains)])

    # urls: sorted-ish within shard → long shared prefixes
    dom_idx = np.sort(rng.integers(0, n_domains, rows))
    path_ids = rng.integers(0, 10 ** 9, rows)
    urls = np.array([f"https://{domains[d]}/page/{p:09d}.html"
                     for d, p in zip(dom_idx, path_ids)])

    # warc_ts: per-shard crawl window of a few hours, µs jitter, clustered
    base = np.datetime64("2025-06-01T00:00:00", "us").astype(np.int64)
    window_start = base + shard * 6 * 3600 * 10 ** 6
    offsets = np.sort(rng.integers(0, 4 * 3600 * 10 ** 6, rows))
    warc_ts = (window_start + offsets).astype("datetime64[us]")

    # zipf langs (long tail: en-heavy)
    zipf_w = 1.0 / np.arange(1, len(LANGS) + 1) ** 1.5
    zipf_w /= zipf_w.sum()
    lang = rng.choice(np.array(LANGS), rows, p=zipf_w)

    # text: Zipf word sampler
    vocab = _vocab(rng)
    word_w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    word_w /= word_w.sum()
    n_words = rng.integers(20, 200, rows)
    all_words = rng.choice(vocab, int(n_words.sum()), p=word_w)
    texts = []
    pos = 0
    for k in n_words:
        texts.append(" ".join(all_words[pos:pos + k]))
        pos += k

    # html: repeated tag vocabulary + text, log-normal length skew
    tag_open = np.array(["<div>", "<p>", "<span>", "<a href='x'>", "<li>"])
    htmls = []
    scale = np.exp(rng.normal(0.0, 1.0, rows))  # log-normal, p99 >> mean
    for i in range(rows):
        rep = max(1, int(scale[i] * 3))
        body = (rng.choice(tag_open) + texts[i][:200]) * rep
        htmls.append(("<html><head><title>t</title></head><body>"
                      + body + "</body></html>").encode())
    null_mask = rng.random(rows) < 0.02
    htmls = [None if m else h for h, m in zip(htmls, null_mask)]

    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
    })


def _write_one(args) -> str:
    out_dir, rows, seed, s = args
    import os
    import pyarrow.parquet as pq
    p = os.path.join(out_dir, f"shard-{s:05d}.parquet")
    if not os.path.exists(p):
        tmp = p + ".tmp"
        pq.write_table(make_web_table(rows, seed, s), tmp)
        os.replace(tmp, p)
    return p


def write_web_shards(out_dir: str, rows_per_shard: int, n_shards: int,
                     seed: int = 42) -> list[str]:
    import os
    os.makedirs(out_dir, exist_ok=True)
    jobs = [(out_dir, rows_per_shard, seed, s) for s in range(n_shards)]
    missing = [j for j in jobs if not os.path.exists(
        os.path.join(out_dir, f"shard-{j[3]:05d}.parquet"))]
    if len(missing) > 4:
        from concurrent.futures import ProcessPoolExecutor
        with ProcessPoolExecutor(min(16, os.cpu_count() or 8)) as ex:
            list(ex.map(_write_one, missing))
    else:
        for j in missing:
            _write_one(j)
    return [os.path.join(out_dir, f"shard-{s:05d}.parquet")
            for s in range(n_shards)]
