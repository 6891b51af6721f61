"""Checkpoint manifest: per-partition lineage records + resume filter.

≙ SURVEY §4.2: every completed input shard emits a lineage record (input
shard, codec per column, encoded bytes, checksum) written atomically as
one small JSON file per shard (concurrent writers never share a file;
rename is the commit point). On restart, completed shard paths are read
from the manifest and filtered out of the input list before
`read_parquet`, so only uncommitted partitions re-execute.

Scale layout (10^6–10^7 shards — the 100 TB regime):

* entry files fan out over 256 hash subdirectories (``ab/<hash>.json``)
  so no single directory holds millions of files;
* ``load`` reads entries sequentially — measured: a thread pool LOSES
  ~13x on tiny local JSON files (json.load is GIL-bound; see
  SCALING.md), and the snapshot below makes load O(1) files anyway;
* ``snapshot`` folds each subdirectory's committed entries into that
  subdirectory's ``_snapshot.json`` (Iceberg-style manifest list,
  sharded 256 ways) and deletes the folded per-shard files; later
  records lay down fresh per-shard deltas that OVERRIDE the snapshot
  at load time, and a pending compaction journal overlays both.
  Per-subdir snapshots keep the fold's memory and write amplification
  at 1/256 of the corpus AND make re-folds incremental: a fold after
  k fresh deltas rewrites only the subdirectories those deltas hash
  into, not the whole manifest. ``compact_job`` calls it after merging
  containers, so a long-lived corpus converges to ≤256 snapshot files
  + recent deltas instead of a file-per-shard directory. Like
  compaction it assumes a SINGLE maintainer (a concurrent record()
  between the fold and the delete could be lost).

Legacy flat-directory entries remain readable forever.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
import time


def _entry_name(shard_path: str) -> str:
    return hashlib.sha256(shard_path.encode()).hexdigest()[:24] + ".json"


def _entry_path(manifest_dir: str, shard_path: str) -> str:
    name = _entry_name(shard_path)
    return os.path.join(manifest_dir, name[:2], name)


def record(manifest_dir: str, shard_path: str, *, output_path: str,
           rows: int, plain_bytes: int, encoded_bytes: int,
           codecs: dict, checksum: str, zones: dict | None = None) -> dict:
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
    final = _entry_path(manifest_dir, shard_path)
    subdir = os.path.dirname(final)
    os.makedirs(subdir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=subdir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(entry, f)
    os.replace(tmp, final)  # atomic commit
    # a pre-snapshot flat-layout file for the same shard would otherwise
    # shadow-or-race this one at load time; the sharded path wins
    legacy = os.path.join(manifest_dir, _entry_name(shard_path))
    if os.path.exists(legacy):
        os.remove(legacy)
    return entry


JOURNAL = "_compaction_journal.json"
SNAPSHOT = "_snapshot.json"


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
    except (FileNotFoundError, json.JSONDecodeError,
            UnicodeDecodeError, OSError):
        return {}  # torn journal write → rename never happened → empty


def clear_journal(manifest_dir: str) -> None:
    try:
        os.remove(os.path.join(manifest_dir, JOURNAL))
    except FileNotFoundError:
        pass


def _entry_files(manifest_dir: str) -> list[str]:
    """Every per-shard entry file, across the sharded and legacy-flat
    layouts (snapshot + journal excluded). LEGACY flat entries list
    FIRST: load() applies files in order, so when a crash between the
    sharded-entry rename and the legacy cleanup leaves BOTH files for
    one shard, the sharded entry (written by current code, hence
    newer) deterministically wins — os.listdir order must not decide
    which commit a resume sees."""
    legacy: list[str] = []
    sharded: list[str] = []
    for name in os.listdir(manifest_dir):
        p = os.path.join(manifest_dir, name)
        if len(name) == 2 and os.path.isdir(p):
            sharded.extend(os.path.join(p, f) for f in os.listdir(p)
                           if f.endswith(".json") and f != SNAPSHOT)
        elif name.endswith(".json") and name not in (JOURNAL, SNAPSHOT):
            legacy.append(p)
    return legacy + sharded


def _read_entry(path: str) -> dict | None:
    try:
        with open(path) as f:
            e = json.load(f)
        e["shard"]  # noqa: B018 — key check
        return e
    except (json.JSONDecodeError, KeyError,
            UnicodeDecodeError, OSError):
        return None  # torn write → treated as uncommitted


def _read_snapshot(path: str) -> dict[str, dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError,
            UnicodeDecodeError, OSError):
        return {}  # torn snapshot write → rename never happened → absent


def _snapshot_files(manifest_dir: str) -> list[str]:
    """Every snapshot file: the per-subdir ones plus the legacy
    single-file top-level layout."""
    out = [os.path.join(manifest_dir, SNAPSHOT)]
    for name in os.listdir(manifest_dir):
        p = os.path.join(manifest_dir, name, SNAPSHOT)
        if len(name) == 2 and os.path.isfile(p):
            out.append(p)
    return out


def load(manifest_dir: str) -> dict[str, dict]:
    """shard path → lineage entry for all committed shards. Precedence
    (lowest to highest): snapshots (legacy top-level, then per-subdir),
    per-shard delta files, pending compaction journal — each layer is
    the newer truth."""
    out: dict[str, dict] = {}
    if not os.path.isdir(manifest_dir):
        return out
    for snap in _snapshot_files(manifest_dir):
        out.update(_read_snapshot(snap))
    for path in _entry_files(manifest_dir):
        e = _read_entry(path)
        if e is not None:
            out[e["shard"]] = e
    out.update(pending_journal(manifest_dir))
    return out


def snapshot(manifest_dir: str) -> int:
    """Fold committed entries into per-subdirectory ``_snapshot.json``
    files and delete the folded per-shard files; returns the number of
    entries now covered by snapshots. Incremental: a subdirectory with
    no fresh deltas (and no legacy contributions) is left untouched, so
    re-folding after k deltas rewrites only the ≤k subdirs they hash
    into. Crash-safe: each snapshot rename is a commit point, and a
    crash before the deletes merely leaves per-shard files that
    override their subdir's snapshot with identical content.
    SINGLE-maintainer only (like compact_job): a record() racing the
    fold could be deleted unseen."""
    if not os.path.isdir(manifest_dir):
        return 0
    top_snap_path = os.path.join(manifest_dir, SNAPSHOT)
    legacy = _read_snapshot(top_snap_path)          # pre-sharded layout
    journal = pending_journal(manifest_dir)
    # group every override source by its 2-hex subdir
    by_sub: dict[str, dict[str, dict]] = {}        # sub → shard → entry
    files_by_sub: dict[str, list[str]] = {}        # sub → files to fold
    for src in (legacy, journal):
        for shard, e in src.items():
            by_sub.setdefault(_entry_name(shard)[:2], {})[shard] = e
    for path in _entry_files(manifest_dir):
        e = _read_entry(path)
        if e is None:
            continue  # torn write: uncommitted; leave the file in place
        sub = _entry_name(e["shard"])[:2]
        # delta files beat the legacy snapshot but not the journal
        prev = by_sub.setdefault(sub, {})
        if e["shard"] not in journal:
            prev[e["shard"]] = e
        files_by_sub.setdefault(sub, []).append(path)
    total = 0
    for sub, merged in by_sub.items():
        subdir = os.path.join(manifest_dir, sub)
        os.makedirs(subdir, exist_ok=True)
        full = dict(_read_snapshot(os.path.join(subdir, SNAPSHOT)))
        full.update(merged)
        fd, tmp = tempfile.mkstemp(dir=subdir, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(full, f)
        os.replace(tmp, os.path.join(subdir, SNAPSHOT))
        for p in files_by_sub.get(sub, ()):
            try:
                os.remove(p)
            except FileNotFoundError:
                pass
        total += len(full)
    # untouched subdirs' snapshots still count toward coverage
    touched = set(by_sub)
    for snap in _snapshot_files(manifest_dir):
        sub = os.path.basename(os.path.dirname(snap))
        if snap != top_snap_path and sub not in touched:
            total += len(_read_snapshot(snap))
    # the legacy top-level snapshot is fully redistributed above
    if legacy:
        try:
            os.remove(top_snap_path)
        except FileNotFoundError:
            pass
    return total


def pending(manifest_dir: str, shard_paths: list[str]) -> list[str]:
    done = load(manifest_dir)
    return [p for p in shard_paths if p not in done]
