"""Checkpoint manifest: per-partition lineage records + resume filter.

≙ SURVEY §4.2: every completed input shard emits a lineage record (input
shard, codec per column, encoded bytes, checksum) written atomically as
one small JSON file per shard (concurrent writers never share a file;
rename is the commit point). On restart, completed shard paths are read
from the manifest and filtered out of the input list before
`read_parquet`, so only uncommitted partitions re-execute.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time


def _entry_name(shard_path: str) -> str:
    return hashlib.sha256(shard_path.encode()).hexdigest()[:24] + ".json"


def record(manifest_dir: str, shard_path: str, *, output_path: str,
           rows: int, plain_bytes: int, encoded_bytes: int,
           codecs: dict, checksum: str) -> dict:
    os.makedirs(manifest_dir, exist_ok=True)
    entry = {
        "shard": shard_path,
        "output": output_path,
        "rows": rows,
        "plain_bytes": plain_bytes,
        "encoded_bytes": encoded_bytes,
        "codecs": codecs,
        "checksum": checksum,
        "committed_at": time.time(),
    }
    final = os.path.join(manifest_dir, _entry_name(shard_path))
    fd, tmp = tempfile.mkstemp(dir=manifest_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)  # atomic commit
    return entry


def load(manifest_dir: str) -> dict[str, dict]:
    """shard path → lineage entry for all committed shards."""
    out: dict[str, dict] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in os.listdir(manifest_dir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(manifest_dir, name)) as f:
                e = json.load(f)
            out[e["shard"]] = e
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn write → treated as uncommitted
    return out


def pending(manifest_dir: str, shard_paths: list[str]) -> list[str]:
    done = load(manifest_dir)
    return [p for p in shard_paths if p not in done]
