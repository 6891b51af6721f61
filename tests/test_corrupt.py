"""Corrupt-input handling (≙ reference corrupt-footer tests,
`src/file/reader.rs:532-592`, and AFL fuzz harness `fuzz/src/main.rs`):
truncated / garbage page buffers must raise typed DecodeError /
FormatError naming the page, and torn manifest entries must read as
uncommitted (resume re-executes them instead of crashing)."""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from parquet_rs_ray import manifest
from parquet_rs_ray.errors import DecodeError, FormatError
from parquet_rs_ray.page import decode_page_row, encode_column_chunk
from parquet_rs_ray.selector import CodecSelector


def _pages_for(col, name="c"):
    sel = CodecSelector()
    return encode_column_chunk(name, 0, pa.chunked_array([col]), selector=sel,
                               path="", block_id="b", block_rows=len(col),
                               n_cols=1)


def _corrupt(row, **kw):
    r = dict(row)
    r.update(kw)
    return r


def test_roundtrip_then_truncated_data_raises():
    col = pa.array([f"value-{i:06d}" for i in range(500)], pa.string())
    [row] = _pages_for(col)
    assert decode_page_row(row).to_pylist() == col.to_pylist()
    with pytest.raises(DecodeError, match="column='c'"):
        decode_page_row(_corrupt(row, data=row["data"][:7]))


def test_garbage_compressed_bytes_raise():
    col = pa.array(list(range(4096)), pa.int64())
    sel = CodecSelector(block_codec="zstd")
    [row] = encode_column_chunk("ints", 0, pa.chunked_array([col]),
                                selector=sel, path="", block_id="b",
                                block_rows=len(col), n_cols=1)
    assert row["block_codec"] == "zstd"
    bad = os.urandom(len(row["data"]))
    with pytest.raises(DecodeError):
        decode_page_row(_corrupt(row, data=bad))


def test_unknown_codec_is_format_error():
    col = pa.array([1.5, 2.5], pa.float64())
    [row] = _pages_for(col)
    # tampered codec WITH intact crc → the page checksum catches it first
    with pytest.raises(DecodeError, match="checksum"):
        decode_page_row(_corrupt(row, codec="NOT_A_CODEC"))
    # crc dropped (legacy/unknown row) → typed dispatch error
    with pytest.raises(FormatError, match="unknown codec"):
        decode_page_row(_corrupt(row, codec="NOT_A_CODEC", crc32=None))


def test_torn_manifest_entry_treated_as_uncommitted(tmp_path):
    mdir = str(tmp_path / "manifest")
    manifest.record(mdir, "shard-a", output_path="[]", rows=1,
                    plain_bytes=1, encoded_bytes=1, codecs={}, checksum="x")
    manifest.record(mdir, "shard-b", output_path="[]", rows=1,
                    plain_bytes=1, encoded_bytes=1, codecs={}, checksum="x")
    # tear shard-b's entry mid-json (simulates a crash during commit)
    with open(manifest._entry_path(mdir, "shard-b"), "w") as f:
        f.write('{"shard": "shard-b", "rows"')
    todo = manifest.pending(mdir, ["shard-a", "shard-b", "shard-c"])
    assert todo == ["shard-b", "shard-c"]


def test_wrong_num_values_raises_not_garbage():
    col = pa.array(np.arange(1000, dtype=np.int64))
    [row] = _pages_for(col)
    bad = _corrupt(row, data=row["data"][: len(row["data"]) // 2])
    with pytest.raises(DecodeError):
        arr = decode_page_row(bad)
        # if a codec tolerates truncation it must still fail the length
        if len(arr) != row["num_values"]:
            raise DecodeError("short page")


def _error_is_typed(e) -> bool:
    """Walk the cause chain (incl. Ray wrappers): corruption must fail
    TYPED (DecodeError / FormatError / Arrow / IO error), never e.g. a
    segfault-shaped crash or a silent wrong answer."""
    seen = set()
    root = e
    while e is not None and id(e) not in seen:
        seen.add(id(e))
        if isinstance(e, (DecodeError, FormatError, pa.ArrowInvalid,
                          OSError, ValueError)):
            return True
        nxt = getattr(e, "cause", None) or e.__cause__ or e.__context__
        e = nxt
    # Ray's RayTaskError/UserCodeException wrappers don't always expose
    # a traversable cause chain; fall back to the serialized traceback
    txt = str(root)
    return any(name in txt for name in (
        "DecodeError", "FormatError", "ArrowInvalid", "OSError",
        "ValueError", "Invalid:"))


def test_container_fuzz_truncate_and_flip(ray_session, tmp_path):
    """Seed-corpus fuzz of the committed container file through
    decode_job (≙ the reference AFL harness, fuzz/src/main.rs:14-32):
    every corruption either raises a typed error or decodes to exactly
    the pristine rows — never a crash, never silently wrong output."""
    import shutil
    from parquet_rs_ray.job import committed_block_files, decode_job, encode_job
    from parquet_rs_ray.webgen import write_web_shards

    paths = write_web_shards(str(tmp_path / "web"), rows_per_shard=300,
                             n_shards=1)
    out_dir = str(tmp_path / "enc")
    encode_job(paths, out_dir, concurrency=1)
    [container] = committed_block_files(out_dir)
    pristine_bytes = open(container, "rb").read()
    pristine = decode_job(out_dir).to_pandas() \
        .sort_values("url").reset_index(drop=True)

    rng = np.random.default_rng(1234)
    size = len(pristine_bytes)
    cases = [("trunc", int(size * f)) for f in (0.1, 0.6, 0.98)]
    cases += [("flip", int(o)) for o in rng.integers(0, size, 10)]
    cases += [("flip", size - 5)]  # footer region

    silent_wrong = []
    for kind, off in cases:
        buf = bytearray(pristine_bytes)
        if kind == "trunc":
            buf = buf[:off]
        else:
            buf[off] ^= 0xFF
        with open(container, "wb") as f:
            f.write(bytes(buf))
        try:
            got = decode_job(out_dir).to_pandas() \
                .sort_values("url").reset_index(drop=True)
        except Exception as e:  # must be typed, not a crash
            assert _error_is_typed(e), (kind, off, repr(e)[:300])
            continue
        if not got.equals(pristine):
            silent_wrong.append((kind, off))
    assert not silent_wrong, silent_wrong
    # restore for hygiene
    with open(container, "wb") as f:
        f.write(pristine_bytes)


def test_corrupt_stats_never_misprune(ray_session):
    """A flipped stats_json cell (valid JSON but wrong bounds) must NOT
    silently drop matching blocks: the page CRC covers stats, so prune
    falls back to keep-and-filter-exactly."""
    import ray
    from parquet_rs_ray.pipeline import decode_dataset, encode_dataset
    tbl = pa.table({"k": pa.array(np.arange(1000), pa.int64())})
    pages = pa.concat_tables(list(
        encode_dataset(ray.data.from_arrow(tbl), concurrency=1)
        .iter_batches(batch_format="pyarrow")))
    # tamper: claim max=10 so a (k >= 500) predicate would prune the
    # block if stats were trusted blindly
    lying = json.dumps({"null_count": 0, "min": 0, "max": 10,
                        "kind": "int"})
    idx = pages.column_names.index("stats_json")
    tampered = pages.set_column(
        idx, "stats_json",
        pa.array([lying] * pages.num_rows, pa.string()))
    out = decode_dataset(ray.data.from_arrow(tampered),
                         predicate=("k", ">=", 500)).to_pandas()
    assert sorted(out["k"].tolist()) == list(range(500, 1000))


def test_corrupt_arrow_type_raises_typed(ray_session):
    from parquet_rs_ray.page import decode_page_row
    col = pa.array(np.arange(100), pa.int64())
    [row] = _pages_for(col)
    bad = dict(row)
    at = bytearray(bad["arrow_type"])
    at[len(at) // 2] ^= 0xFF
    bad["arrow_type"] = bytes(at)
    with pytest.raises(DecodeError):
        decode_page_row(bad)
