"""CLI entry points mirroring the reference binaries.

≙ `parquet-read` (`/root/reference/src/bin/parquet-read.rs:61-94`: file →
row iterator → println, optional row limit) and `parquet-schema`
(`/root/reference/src/bin/parquet-schema.rs:62-96`: file → metadata +
message-type schema printer), plus `inspect` over our encoded-page
output directories (lineage / codec choices — no reference analogue,
it's the PageWriteSpec metrics surfaced).

Usage:
    python -m parquet_rs_ray.cli read <file.parquet> [num_rows] [--columns a,b]
    python -m parquet_rs_ray.cli schema <file.parquet> [--verbose]
    python -m parquet_rs_ray.cli inspect <encoded_dir>

These own a Ray session (guarded init) per the driver contract.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 log_to_driver=False)
    return ray


def cmd_read(path: str, num_rows: int | None, columns: list[str] | None) -> int:
    """Print rows like parquet-read: one Row-ish dict per line."""
    ray = _ray()
    ds = ray.data.read_parquet(path, columns=columns)
    it = ds.iter_rows()
    for i, row in enumerate(it):
        if num_rows is not None and i >= num_rows:
            break
        print(json.dumps(row, default=str))
    return 0


def cmd_schema(path: str, verbose: bool) -> int:
    """Print the message-type DDL (+ metadata when --verbose)."""
    import pyarrow.parquet as pq
    from .schema import print_schema

    pf = pq.ParquetFile(path)
    print(print_schema(pf.schema_arrow, name="schema"))
    if verbose:
        md = pf.metadata
        print()
        print(f"num_rows: {md.num_rows}")
        print(f"num_row_groups: {md.num_row_groups}")
        print(f"created_by: {md.created_by}")
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            print(f"row group {rg}: rows={g.num_rows} "
                  f"bytes={g.total_byte_size}")
            for c in range(g.num_columns):
                col = g.column(c)
                print(f"  {col.path_in_schema}: {col.physical_type} "
                      f"{col.compression} encodings={col.encodings}")
    return 0


def cmd_inspect(encoded_dir: str) -> int:
    """Summarize an encode-job output dir: per-column codec choices,
    sizes, ratios from the committed page blocks + manifest."""
    import os
    ray = _ray()
    from . import manifest
    from .job import committed_block_files

    entries = manifest.load(os.path.join(encoded_dir, "manifest"))
    print(f"manifest: {len(entries)} committed shards")
    files = committed_block_files(encoded_dir)
    ds = ray.data.read_parquet(files)
    df = ds.select_columns(["column", "codec", "plain_size",
                            "encoded_size"]).to_pandas()
    g = df.groupby(["column", "codec"], as_index=False).agg(
        pages=("codec", "size"), plain=("plain_size", "sum"),
        encoded=("encoded_size", "sum"))
    g["ratio"] = (g["encoded"] / g["plain"]).round(4)
    print(g.to_string(index=False))
    total_p, total_e = df["plain_size"].sum(), df["encoded_size"].sum()
    print(f"total: plain={total_p} encoded={total_e} "
          f"ratio={total_e / max(total_p, 1):.4f}")
    from .job import committed_zones
    zones = committed_zones(encoded_dir)
    n_zoned = sum(1 for z in zones.values() if z)
    cols = sorted({c for z in zones.values() if z for c in z})
    print(f"zones: {n_zoned}/{len(zones)} container files carry zone "
          f"maps (columns: {', '.join(cols) if cols else '-'})")
    return 0


def cmd_encode(inputs: list[str], out_dir: str, block_codec: str | None,
               concurrency: int, reorder: str = "off") -> int:
    """Run (or resume) the resumable encode job over input shards."""
    import glob as _glob
    ray = _ray()
    from .job import encode_job

    paths: list[str] = []
    for pat in inputs:
        hits = sorted(_glob.glob(pat))
        paths.extend(hits if hits else [pat])
    s = encode_job(paths, out_dir, concurrency=concurrency,
                   block_codec=block_codec, reorder=reorder)
    print(json.dumps(s))
    return 0


def cmd_decode(encoded_dir: str, out_dir: str | None) -> int:
    """Decode committed blocks back to the original schema; write
    partitioned parquet when --out is given, else print row count."""
    ray = _ray()
    from .job import decode_job

    ds = decode_job(encoded_dir)
    if out_dir:
        ds.write_parquet(out_dir)
        print(json.dumps({"written": out_dir}))
    else:
        n = ds.map_batches(lambda b: {"n": [b.num_rows]},
                           batch_format="pyarrow").sum("n")
        print(json.dumps({"rows": int(n)}))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="parquet_rs_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_read = sub.add_parser("read", help="print rows of a parquet file")
    p_read.add_argument("path")
    p_read.add_argument("num_rows", nargs="?", type=int, default=None)
    p_read.add_argument("--columns", default=None,
                        help="comma-separated projection")

    p_schema = sub.add_parser("schema", help="print message-type schema")
    p_schema.add_argument("path")
    p_schema.add_argument("--verbose", action="store_true")

    p_inspect = sub.add_parser("inspect", help="summarize encoded output")
    p_inspect.add_argument("encoded_dir")

    p_enc = sub.add_parser("encode", help="resumable encode job "
                           "(parquet shards, raw .warc/.wet crawls — "
                           "parsed, HTTP-stripped and html->text "
                           "extracted in the same fused pass — or "
                           ".jsonl/.ndjson[.gz] corpus shards)")
    p_enc.add_argument("inputs", nargs="+",
                       help="parquet/WARC/WET/JSONL paths or globs")
    p_enc.add_argument("out_dir")
    p_enc.add_argument("--block-codec", default="auto")
    p_enc.add_argument("--concurrency", type=int, default=8)
    p_enc.add_argument("--reorder", default="off",
                       choices=["off", "auto", "preserve"],
                       help="intra-block RLE-friendly row sort: auto="
                            "multiset (order not preserved), preserve="
                            "store permutation when it measures smaller")

    p_dec = sub.add_parser("decode", help="decode committed blocks")
    p_dec.add_argument("encoded_dir")
    p_dec.add_argument("--out", default=None,
                       help="write decoded parquet here (else count rows)")

    p_st = sub.add_parser("stats", help="metadata-only column stats "
                          "(no payload reads) of an encoded dir")
    p_st.add_argument("encoded_dir")
    p_st.add_argument("--columns", default=None,
                      help="comma-separated column subset")

    p_cmp = sub.add_parser("compact",
                           help="merge small container files")
    p_cmp.add_argument("encoded_dir")
    p_cmp.add_argument("--target-mb", type=int, default=256)

    p_idx = sub.add_parser("index", help="content-hash index of one "
                           "decoded column (incremental-dedup side)")
    p_idx.add_argument("encoded_dir")
    p_idx.add_argument("column")

    args = ap.parse_args(argv)
    try:
        if args.cmd == "read":
            cols = args.columns.split(",") if args.columns else None
            return cmd_read(args.path, args.num_rows, cols)
        if args.cmd == "schema":
            return cmd_schema(args.path, args.verbose)
        if args.cmd == "encode":
            bc = None if args.block_codec in ("none", "") else args.block_codec
            return cmd_encode(args.inputs, args.out_dir, bc,
                              args.concurrency, args.reorder)
        if args.cmd == "decode":
            return cmd_decode(args.encoded_dir, args.out)
        if args.cmd == "stats":
            _ray()
            from .job import stats_job
            cols = args.columns.split(",") if args.columns else None
            print(stats_job(args.encoded_dir, columns=cols)
                  .to_pandas().to_string(index=False))
            return 0
        if args.cmd == "index":
            _ray()
            from .job import hash_index_job
            print(json.dumps(hash_index_job(args.encoded_dir,
                                            args.column)))
            return 0
        if args.cmd == "compact":
            _ray()
            from .job import compact_job
            print(json.dumps(compact_job(
                args.encoded_dir,
                target_file_bytes=args.target_mb << 20)))
            return 0
        return cmd_inspect(args.encoded_dir)
    finally:
        # the CLI owns its Ray session (driver contract: library never
        # inits/shuts down; scripts do) — leave the machine clean
        import ray
        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
