"""Lineage manifest + resumable checkpoints.

Ray-native successor of the reference's incremental-reuse protocol
(``src/mmore/process/incremental.py``: previous-results JSONL keyed by
file_path + mtime/processed_at comparison).  Here the unit of reuse is a
*partition* (input shard), not a file:

* each completed partition writes its outputs under
  ``out_dir/<name>/shard=NNNN/`` and then atomically publishes
  ``out_dir/_manifest/<step>_NNNN.json`` (write temp + ``os.replace``);
* a manifest entry records the step, shard id, row counts, per-doc
  lineage reference and wall time;
* on resume, :func:`completed_shards` is consulted and finished
  partitions are skipped — outputs are only ever published after their
  data, so a crash mid-shard re-runs that shard idempotently (the shard
  directory is overwritten).

Per-row lineage (the north-rule invariant) lives in parquet next to the
data: one row per input document with its ``content_sha256`` and output
counts, written by the KG pipeline.
"""

from __future__ import annotations

import json
import os
import re
import time
from pathlib import Path
from typing import Any

MANIFEST_DIR = "_manifest"
_SHARD_RE = re.compile(r"\d{5,}")  # {:05d} grows past 5 digits at 100k shards


def _manifest_path(out_dir: str | Path, step: str, shard: int) -> Path:
    return Path(out_dir) / MANIFEST_DIR / f"{step}_{shard:05d}.json"


def publish(out_dir: str | Path, step: str, shard: int, payload: dict[str, Any]) -> Path:
    """Atomically publish a completed-partition manifest entry."""
    path = _manifest_path(out_dir, step, shard)
    path.parent.mkdir(parents=True, exist_ok=True)
    # payload FIRST: a forwarded stats dict that happens to carry a
    # 'step'/'shard' key must not overwrite the authoritative record
    # (the filename-based resume would still work, but all_entries()
    # would attribute the work to the wrong step/shard)
    record = {
        **payload,
        "step": step,
        "shard": shard,
        "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = path.with_suffix(".json.tmp")
    # fsync before the rename: without it a power loss can journal the
    # rename while the manifest (or the shard data it gates) never hit
    # disk — resume would then skip a partial shard as "done"
    with open(tmp, "w") as f:
        f.write(json.dumps(record, sort_keys=True, indent=1))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dir_fd = os.open(path.parent, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)
    return path


def load(out_dir: str | Path, step: str, shard: int) -> dict[str, Any] | None:
    path = _manifest_path(out_dir, step, shard)
    if not path.exists():
        return None
    return json.loads(path.read_text())


def completed_shards(out_dir: str | Path, step: str) -> set[int]:
    mdir = Path(out_dir) / MANIFEST_DIR
    if not mdir.is_dir():
        return set()
    done: set[int] = set()
    prefix = f"{step}_"
    for f in mdir.iterdir():
        # digits only: int() accepts underscores, so a sibling step
        # named '<step>_1' would otherwise contribute phantom shard
        # ids (int('1_00003') == 100003)
        if (f.suffix == ".json" and f.name.startswith(prefix)
                and _SHARD_RE.fullmatch(f.stem[len(prefix):])):
            done.add(int(f.stem[len(prefix):]))
    return done


def all_entries(out_dir: str | Path) -> list[dict[str, Any]]:
    mdir = Path(out_dir) / MANIFEST_DIR
    if not mdir.is_dir():
        return []
    entries = [json.loads(f.read_text()) for f in sorted(mdir.glob("*.json"))]
    # step entries only — the manifest dir also holds auxiliary
    # write-once state (e.g. sort_bounds.json) that is not an entry
    return [e for e in entries if isinstance(e, dict) and "step" in e]
