"""Schema DDL parser/printer (≙ parser.rs / printer.rs) and CLI tools
(≙ src/bin/parquet-read.rs, parquet-schema.rs)."""

import json
import subprocess
import sys

import pyarrow as pa
import pytest

from parquet_rs_ray.schema import (SchemaParseError, check_contains,
                                   parse_message_type, print_schema, project)

SF = "/root/testdata/sf0.001"


WEB_DDL = """
message web_page {
  required byte_array url (UTF8);
  optional int64 warc_ts (TIMESTAMP_MICROS);
  optional byte_array html;
  optional byte_array text (UTF8);
  optional byte_array lang (UTF8);
}
"""


def test_parse_target_schema():
    s = parse_message_type(WEB_DDL)
    assert s.field("url").type == pa.string()
    assert not s.field("url").nullable
    assert s.field("warc_ts").type == pa.timestamp("us")
    assert s.field("html").type == pa.binary()
    assert s.field("lang").nullable


def test_parse_all_primitives_and_logicals():
    s = parse_message_type("""
    message m {
      required boolean b;
      required int32 i (INT_8);
      required int32 d (DATE);
      required int64 u (UINT_64);
      required float f;
      required double g;
      required int96 legacy_ts;
      required fixed_len_byte_array(16) dec (DECIMAL(18,4));
      required fixed_len_byte_array(3) raw;
      repeated int32 xs;
    }""")
    assert s.field("i").type == pa.int8()
    assert s.field("d").type == pa.date32()
    assert s.field("u").type == pa.uint64()
    assert s.field("legacy_ts").type == pa.timestamp("ns")
    assert s.field("dec").type == pa.decimal128(18, 4)
    assert s.field("raw").type == pa.binary(3)
    assert s.field("xs").type == pa.list_(pa.int32())


def test_parse_groups_list_map():
    s = parse_message_type("""
    message m {
      optional group tags (LIST) {
        repeated group list {
          optional byte_array element (UTF8);
        }
      }
      optional group kv (MAP) {
        repeated group key_value {
          required byte_array key (UTF8);
          optional int64 value;
        }
      }
      required group point {
        required double x;
        required double y;
      }
    }""")
    assert s.field("tags").type == pa.list_(pa.string())
    assert s.field("kv").type == pa.map_(pa.string(), pa.int64())
    assert s.field("point").type == pa.struct(
        [pa.field("x", pa.float64(), nullable=False),
         pa.field("y", pa.float64(), nullable=False)])


def test_parse_errors():
    # illegal physical/logical combos (≙ types.rs:238-387 validation)
    with pytest.raises(SchemaParseError):
        parse_message_type("message m { required int32 t (TIMESTAMP_MICROS); }")
    with pytest.raises(SchemaParseError):
        parse_message_type("message m { required int64 s (UTF8); }")
    with pytest.raises(SchemaParseError):
        parse_message_type("not_a_message m { }")
    with pytest.raises(SchemaParseError):
        parse_message_type("message m { required int32 x; ")  # unterminated


def test_print_parse_roundtrip():
    s = parse_message_type(WEB_DDL)
    ddl = print_schema(s)
    s2 = parse_message_type(ddl)
    assert s2.equals(pa.schema(list(s)), check_metadata=False) or all(
        s2.field(i).type == s.field(i).type and
        s2.field(i).nullable == s.field(i).nullable for i in range(len(s)))
    assert "message web_page {" in ddl


def test_check_contains_and_project():
    full = parse_message_type(WEB_DDL)
    sub = pa.schema([pa.field("url", pa.string(), nullable=False),
                     pa.field("lang", pa.string())])
    assert check_contains(full, sub)
    bad = pa.schema([pa.field("url", pa.int64())])
    assert not check_contains(full, bad)
    proj = project(full, ["text", "url"])
    assert proj.names == ["text", "url"]
    with pytest.raises(SchemaParseError):
        project(full, ["nope"])


# ----------------------------------------------------------------- CLI

def test_cli_schema():
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "schema",
         f"{SF}/documents.parquet", "--verbose"],
        capture_output=True, text=True, cwd="/root/repo", timeout=120)
    assert out.returncode == 0, out.stderr
    assert "message schema {" in out.stdout
    assert "byte_array text (UTF8)" in out.stdout
    assert "num_rows:" in out.stdout


def test_cli_read():
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "read",
         f"{SF}/documents.parquet", "3", "--columns", "doc_id,lang"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 3
    row = json.loads(lines[0])
    assert set(row) == {"doc_id", "lang"}


def test_cli_encode_decode(tmp_path):
    enc_dir = str(tmp_path / "enc")
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "encode",
         f"{SF}/documents.parquet", enc_dir, "--concurrency", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out.returncode == 0, out.stderr
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["shards_encoded"] == 1 and s["rows"] == 500
    assert s["encoded_bytes"] < s["plain_bytes"]
    # resume: second run skips the committed shard
    out2 = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "encode",
         f"{SF}/documents.parquet", enc_dir, "--concurrency", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    s2 = json.loads(out2.stdout.strip().splitlines()[-1])
    assert s2["shards_skipped"] == 1 and s2["shards_encoded"] == 0
    out3 = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "decode", enc_dir],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out3.returncode == 0, out3.stderr
    assert json.loads(out3.stdout.strip().splitlines()[-1]) == {"rows": 500}
    # stats: metadata-only column stats of the same encoded dir
    out4 = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "stats", enc_dir,
         "--columns", "doc_id,lang"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300)
    assert out4.returncode == 0, out4.stderr
    body = out4.stdout
    assert "doc_id" in body and "lang" in body and "499" in body


def test_cli_encode_kill_midrun_resumes(tmp_path):
    """North-rule resume: kill the encode process mid-run; the restart
    skips committed shards and the decoded output is complete."""
    import glob
    import pyarrow.parquet as pq
    from parquet_rs_ray.webgen import write_web_shards

    shards = write_web_shards(str(tmp_path / "web"), 500, 12)
    enc_dir = str(tmp_path / "enc")
    proc = subprocess.Popen(
        [sys.executable, "-m", "parquet_rs_ray.cli", "encode",
         *shards, enc_dir, "--concurrency", "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd="/root/repo")
    # wait for the first manifest commits, then kill hard
    import time
    mdir = str(tmp_path / "enc" / "manifest")
    for _ in range(600):
        if glob.glob(mdir + "/*/*.json"):
            break
        time.sleep(0.1)
    proc.kill()
    proc.wait(timeout=60)
    committed_before = len(glob.glob(mdir + "/*/*.json"))
    assert 0 < committed_before  # something committed before the kill
    out = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "encode",
         *shards, enc_dir, "--concurrency", "2"],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert out.returncode == 0, out.stderr
    s = json.loads(out.stdout.strip().splitlines()[-1])
    assert s["shards_skipped"] >= committed_before
    assert s["shards_skipped"] + s["shards_encoded"] == 12
    # decoded output covers every input row exactly once
    out2 = subprocess.run(
        [sys.executable, "-m", "parquet_rs_ray.cli", "decode", enc_dir],
        capture_output=True, text=True, cwd="/root/repo", timeout=600)
    assert json.loads(out2.stdout.strip().splitlines()[-1]) == {
        "rows": 500 * 12}
