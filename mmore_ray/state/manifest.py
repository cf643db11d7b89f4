"""Lineage manifest + resumable checkpoints.

Ray-native successor of the reference's incremental-reuse protocol
(``src/mmore/process/incremental.py``: previous-results JSONL keyed by
file_path + mtime/processed_at comparison).  Here the unit of reuse is a
*partition* (input shard), not a file:

* each completed partition writes its outputs under
  ``out_dir/<name>/shard=NNNN/`` and then atomically publishes
  ``out_dir/_manifest/<step>_NNNNN.json`` (write temp + rename);
* a manifest entry records the step, shard id, row counts, per-doc
  lineage reference and wall time;
* on resume, :func:`completed_shards` is consulted and finished
  partitions are skipped — outputs are only ever published after their
  data, so a crash mid-shard re-runs that shard idempotently (the shard
  directory is overwritten).

Every function takes ``filesystem=None``: the default is the local
POSIX path (tmp + ``os.replace`` + fsync of file AND directory — the
strongest local durability story); pass any ``pyarrow.fs.FileSystem``
(S3, GCS, SubTree, fsspec-wrapped) and ``out_dir`` is a path WITHIN
that filesystem, with publishes routed tmp + ``fs.move`` (see
``state/fsio.py`` for the object-store atomicity contract).

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

from . import fsio

MANIFEST_DIR = "_manifest"
_SHARD_RE = re.compile(r"\d{5,}")  # {:05d} grows past 5 digits at 100k shards


def _manifest_path(out_dir, step: str, shard: int) -> str:
    return f"{out_dir}/{MANIFEST_DIR}/{step}_{shard:05d}.json"


def publish(out_dir: str | Path, step: str, shard: int,
            payload: dict[str, Any], filesystem=None) -> str:
    """Atomically publish a completed-partition manifest entry."""
    path = _manifest_path(out_dir, step, shard)
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
    text = json.dumps(record, sort_keys=True, indent=1)
    # An explicit LOCAL filesystem keeps the full POSIX durability path
    # below (its paths are host paths): routing it through pyarrow
    # streams would silently drop the fsync-file-and-directory
    # guarantee the crash-safety comment depends on.  Non-local
    # filesystems get tmp + move (see fsio's atomicity contract).
    from pyarrow import fs as pafs

    if filesystem is not None and not isinstance(filesystem,
                                                 pafs.LocalFileSystem):
        fsio.ensure_dir(filesystem, f"{out_dir}/{MANIFEST_DIR}")
        fsio.write_text_atomic(filesystem, path, text)
        return path
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    tmp = p.with_suffix(".json.tmp")
    # fsync before the rename: without it a power loss can journal the
    # rename while the manifest (or the shard data it gates) never hit
    # disk — resume would then skip a partial shard as "done"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, p)
    dir_fd = os.open(p.parent, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)
    return path


def load(out_dir: str | Path, step: str, shard: int,
         filesystem=None) -> dict[str, Any] | None:
    path = _manifest_path(out_dir, step, shard)
    if filesystem is not None:
        if not fsio.exists(filesystem, path):
            return None
        return json.loads(fsio.read_text(filesystem, path))
    p = Path(path)
    if not p.exists():
        return None
    return json.loads(p.read_text())


def delete(out_dir: str | Path, step: str, shard: int,
           filesystem=None) -> None:
    """Remove one entry (missing is fine) — run_kg invalidates the
    finalize entry whenever any extract shard re-runs."""
    path = _manifest_path(out_dir, step, shard)
    if filesystem is not None:
        if fsio.exists(filesystem, path):
            filesystem.delete_file(path)
        return
    Path(path).unlink(missing_ok=True)


def _entry_names(out_dir, filesystem) -> list[str]:
    """(.json basename stems, sorted) of everything in the manifest dir."""
    mdir = f"{out_dir}/{MANIFEST_DIR}"
    if filesystem is not None:
        return [fi.base_name[:-5]
                for fi in fsio.list_files(filesystem, mdir, suffix=".json",
                                          recursive=False)]
    p = Path(mdir)
    if not p.is_dir():
        return []
    return sorted(f.stem for f in p.iterdir() if f.suffix == ".json")


def completed_shards(out_dir: str | Path, step: str,
                     filesystem=None) -> set[int]:
    prefix = f"{step}_"
    done: set[int] = set()
    for stem in _entry_names(out_dir, filesystem):
        # digits only: int() accepts underscores, so a sibling step
        # named '<step>_1' would otherwise contribute phantom shard
        # ids (int('1_00003') == 100003)
        if stem.startswith(prefix) and _SHARD_RE.fullmatch(stem[len(prefix):]):
            done.add(int(stem[len(prefix):]))
    return done


def all_entries(out_dir: str | Path, filesystem=None) -> list[dict[str, Any]]:
    entries = []
    for stem in _entry_names(out_dir, filesystem):
        path = f"{out_dir}/{MANIFEST_DIR}/{stem}.json"
        text = (fsio.read_text(filesystem, path) if filesystem is not None
                else Path(path).read_text())
        entries.append(json.loads(text))
    # step entries only — the manifest dir also holds auxiliary
    # write-once state (e.g. sort_bounds.json) that is not an entry
    return [e for e in entries if isinstance(e, dict) and "step" in e]
