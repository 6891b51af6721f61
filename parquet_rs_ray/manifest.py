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
           codecs: dict, checksum: str, zones: dict | None = None) -> dict:
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
    if zones is not None:
        # container file → column → {kind,min,max} zone for THIS shard's
        # blocks in that file (decode_job folds these across shards for
        # manifest-level file elimination; absent = never prunable)
        entry["zones"] = zones
    final = os.path.join(manifest_dir, _entry_name(shard_path))
    fd, tmp = tempfile.mkstemp(dir=manifest_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)  # atomic commit
    return entry


JOURNAL = "_compaction_journal.json"


def write_journal(manifest_dir: str, updates: dict[str, dict]) -> None:
    """Atomically commit a MULTI-shard entry rewrite (compaction): all
    updates land in one journal file via rename, so readers see either
    none of them or all of them. `load` overlays a pending journal, and
    `clear_journal` is called only after every per-shard entry file has
    been rewritten — a crash at any point leaves every reader with ONE
    consistent view."""
    fd, tmp = tempfile.mkstemp(dir=manifest_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(updates, f)
    os.replace(tmp, os.path.join(manifest_dir, JOURNAL))


def pending_journal(manifest_dir: str) -> dict[str, dict]:
    try:
        with open(os.path.join(manifest_dir, JOURNAL)) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return {}  # torn journal write → rename never happened → empty


def clear_journal(manifest_dir: str) -> None:
    try:
        os.remove(os.path.join(manifest_dir, JOURNAL))
    except FileNotFoundError:
        pass


def load(manifest_dir: str) -> dict[str, dict]:
    """shard path → lineage entry for all committed shards. A pending
    compaction journal OVERLAYS the per-shard files (its entries are the
    committed truth the moment the journal rename lands)."""
    out: dict[str, dict] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for name in os.listdir(manifest_dir):
        if not name.endswith(".json") or name == JOURNAL:
            continue
        try:
            with open(os.path.join(manifest_dir, name)) as f:
                e = json.load(f)
            out[e["shard"]] = e
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn write → treated as uncommitted
    out.update(pending_journal(manifest_dir))
    return out


def pending(manifest_dir: str, shard_paths: list[str]) -> list[str]:
    done = load(manifest_dir)
    return [p for p in shard_paths if p not in done]
