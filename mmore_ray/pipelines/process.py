"""The mmore process → postprocess lifecycle, Ray-native (SURVEY §3).

    crawl(roots) → incremental split (reuse/process/deleted)
      → map_batches(read + processor dispatch)        # §3.1
      → post-process chain (taggers/filters/chunker)  # §3.2
      → parquet + reference-format JSONL sinks

Incremental protocol (reference ``process/incremental.py``):
previous results are keyed by ``file_path`` with a ``processed_at``
timestamp; duplicates collapse to the latest; a file is reused iff its
mtime ≤ processed_at; files present only in the previous results
(deleted on disk) are dropped.  Reference semantics, parquet instead
of JSONL, broadcast-small-side semi/anti joins instead of driver
dicts when the manifest outgrows memory (documented)."""

from __future__ import annotations

import json
from collections.abc import Callable
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..sources.crawler import crawl_table, read_contents
from ..stages.processors import SAMPLE_SCHEMA, process_batch

PROCESSED_AT_COL = "processed_at"


def load_previous(path: str | Path) -> pa.Table | None:
    """Latest-RUN-wins dedup of previous results by file_path
    (≙ incremental.py:24-48).  ``path`` may be a parquet file or a
    directory of them.

    A file may own SEVERAL rows in one run (chunked output) — keep
    every row carrying the file's newest ``processed_at``, not one
    arbitrary row (``drop_duplicates`` there silently lost all but one
    chunk on reuse)."""
    path = Path(path)
    if not path.exists():
        return None
    import pyarrow.compute as pc

    # Arrow-native max-per-key: a pandas round-trip degrades types
    # (an all-empty modalities list<struct> comes back list<null>), so
    # reused.parquet would carry a different schema than the new files
    # written beside it
    prev = pq.read_table(path)
    latest = prev.group_by("file_path").aggregate(
        [(PROCESSED_AT_COL, "max")])
    # index_in + take instead of a join: Table.join rejects the
    # list<struct> modalities payload column
    pos = pc.index_in(prev.column("file_path"),
                      value_set=latest.column("file_path").combine_chunks())
    maxed = latest.column(f"{PROCESSED_AT_COL}_max").take(pos)
    mask = pc.equal(prev.column(PROCESSED_AT_COL), maxed)
    return prev.filter(mask)


def split_incremental(crawled: pa.Table, previous: pa.Table | None
                      ) -> tuple[pa.Table, pa.Table]:
    """→ (to_process descriptors, reusable previous rows).

    reuse iff cached and mtime ≤ processed_at (incremental.py:61-81);
    deleted files (in previous, not crawled) drop out naturally
    (anti-join against the crawl set, run_process.py:147-177)."""
    if previous is None or previous.num_rows == 0:
        return crawled, (previous if previous is not None
                         else pa.table({"file_path": pa.array([], pa.string())}))
    prev_at = dict(zip(previous.column("file_path").to_pylist(),
                       previous.column(PROCESSED_AT_COL).to_pylist()))
    mask_process, reuse_paths = [], set()
    for path, mtime in zip(crawled.column("file_path").to_pylist(),
                           crawled.column("modified_at").to_pylist()):
        cached = prev_at.get(path)
        # stamps without the 'Z' UTC marker predate the UTC switch
        # (naive LOCAL time): in a UTC+X zone they read X hours late
        # against the crawl's UTC mtimes, silently reusing files
        # modified up to X hours after that run — untrusted, reprocess
        # once (the rerun writes a marked stamp)
        if cached is not None and cached.endswith("Z"):
            cached = cached[:-1]
        else:
            cached = None
        if cached is not None and mtime <= cached:
            mask_process.append(False)
            reuse_paths.add(path)
        else:
            mask_process.append(True)
    to_process = crawled.filter(pa.array(mask_process, pa.bool_()))
    keep = [p in reuse_paths
            for p in previous.column("file_path").to_pylist()]
    return to_process, previous.filter(pa.array(keep, pa.bool_()))


def run_process(root_dirs: list[str], out_dir: str | Path,
                postprocessors: list[Callable] | None = None,
                previous_results: str | Path | None = None,
                extensions: list[str] | None = None,
                stamp: str | None = None) -> dict:
    """End-to-end process run; returns counters (≙ run_process.py logs).

    ``postprocessors``: ordered batch callables (taggers / filters /
    chunker) applied as chained map_batches — the PPPipeline analogue
    with streaming between stages instead of full-list barriers
    (pipeline.py:99-120).

    ``stamp`` defaults to NOW in UTC (matching the crawl's
    ``modified_at`` convention — both sides of the lexical
    ``mtime ≤ processed_at`` reuse gate MUST share one timezone, or a
    DST fall-back hour silently reuses stale files): a fixed past
    stamp defeats reuse for newer files and a forward-dated one reuses
    stale content; override only in tests that need determinism."""
    if stamp is None:
        import datetime as _dt

        stamp = _dt.datetime.now(_dt.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S")
    # 'Z' tags the stamp as UTC-convention: split_incremental refuses to
    # trust markerless stamps (pre-UTC-switch runs wrote local time)
    if not stamp.endswith("Z"):
        stamp += "Z"
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    crawled = crawl_table(root_dirs, extensions)
    previous = load_previous(previous_results) if previous_results else None
    to_process, reused = split_incremental(crawled, previous)

    ds = ray.data.from_arrow(to_process)
    ds = ds.map_batches(read_contents, batch_format="pyarrow")
    ds = ds.map_batches(process_batch, batch_format="pyarrow")
    for step in postprocessors or []:
        ds = ds.map_batches(step, batch_format="pyarrow")

    def stamp_rows(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            PROCESSED_AT_COL,
            pa.array([stamp] * batch.num_rows, pa.string()))

    ds = ds.map_batches(stamp_rows, batch_format="pyarrow")
    new = ds.materialize()

    import os
    import shutil

    # write the new collection COMPLETELY into a temp dir, then swap:
    # deleting merged/ before the write succeeds would destroy the
    # previous results on a crash mid-write — and previous_results
    # commonly points AT merged/ (the resume usage)
    merged_dir = out_dir / "merged"
    tmp_dir = out_dir / "merged.tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    # an all-reused run writes zero new rows — the sink may then never
    # create the directory, so make it exist before both writes
    tmp_dir.mkdir(parents=True, exist_ok=True)
    new.write_parquet(str(tmp_dir))
    if reused.num_rows:
        # align schemas: reused rows already carry processed_at
        pq.write_table(reused, tmp_dir / "reused.parquet")
    shutil.rmtree(merged_dir, ignore_errors=True)
    os.replace(tmp_dir, merged_dir)
    return {
        "crawled": crawled.num_rows,
        "processed": new.count(),
        "reused": reused.num_rows,
        "out": str(merged_dir),
    }


# ---------------------------------------------------------------------------
# Reference-format JSONL compat (type.py:98-143 to_dict shape)
# ---------------------------------------------------------------------------

def samples_to_jsonl(table: pa.Table, path: str | Path) -> None:
    """Write sample rows in the reference's MultimodalSample JSONL shape
    so reference tooling can consume our output."""
    # derived from the ONE schema: a hand-copied name list here would
    # silently misroute any future base column into the metadata bag
    tag_cols = [c for c in table.column_names
                if c not in SAMPLE_SCHEMA.names]
    with open(path, "w") as f:
        for row in table.to_pylist():
            extra = {c: row[c] for c in tag_cols if row.get(c) is not None}
            # processor metadata (PDF paragraph_starts etc.) spreads
            # into the reference's open metadata bag as real fields,
            # not a double-encoded JSON string
            extra.update(json.loads(row.get("metadata_json") or "{}"))
            rec = {
                "text": row["text"],
                "modalities": row.get("modalities") or [],
                "metadata": {
                    "file_path": row.get("file_path"),
                    "file_name": row.get("file_name"),
                    "processed_at": row.get(PROCESSED_AT_COL),
                    "processor_type": row.get("processor_type"),
                    **extra,
                },
                "id": row["sample_id"],
                "document_id": row.get("document_id", row["sample_id"]),
            }
            f.write(json.dumps(rec) + "\n")


def jsonl_to_table(path: str | Path) -> pa.Table:
    """Read reference-format JSONL into sample rows."""
    from ..stages.processors import MODALITY_STRUCT

    _KNOWN_META = ("file_path", "file_name", "processed_at",
                   "processor_type")
    rows = {k: [] for k in (*SAMPLE_SCHEMA.names, PROCESSED_AT_COL)}
    for line in Path(path).read_text().splitlines():
        d = json.loads(line)
        meta = d.get("metadata") or {}
        fp = meta.get("file_path") or ""
        sid = str(d.get("id", ""))
        rows["sample_id"].append(sid)
        # fall back to the sample id — the writer's own convention; a
        # '' default would break every join keyed on document_id for
        # reference-produced JSONL that lacks the field
        rows["document_id"].append(str(d.get("document_id") or sid))
        rows["text"].append(d.get("text") or "")
        # round-trip the incremental timestamp: dropping it would
        # defeat reuse for any flow fed from re-imported JSONL
        rows[PROCESSED_AT_COL].append(meta.get("processed_at"))
        rows["modalities"].append(d.get("modalities") or [])
        rows["file_path"].append(fp)
        # file_name: from metadata when present (our writer), else
        # re-derived from file_path (reference JSONL lacks it) — the
        # SAMPLE_SCHEMA consumers (chunk_batch etc.) require the column
        rows["file_name"].append(meta.get("file_name")
                                 or fp.rsplit("/", 1)[-1])
        rows["processor_type"].append(meta.get("processor_type") or "")
        # everything else in the open metadata bag (tagger extras,
        # processor offsets) rides back in metadata_json
        rows["metadata_json"].append(json.dumps(
            {k: v for k, v in meta.items() if k not in _KNOWN_META},
            sort_keys=True))
    return pa.table({
        "sample_id": pa.array(rows["sample_id"], pa.string()),
        "document_id": pa.array(rows["document_id"], pa.string()),
        "text": pa.array(rows["text"], pa.string()),
        "modalities": pa.array(rows["modalities"], pa.list_(MODALITY_STRUCT)),
        "file_path": pa.array(rows["file_path"], pa.string()),
        "file_name": pa.array(rows["file_name"], pa.string()),
        "processor_type": pa.array(rows["processor_type"], pa.string()),
        "metadata_json": pa.array(rows["metadata_json"], pa.string()),
        PROCESSED_AT_COL: pa.array(rows[PROCESSED_AT_COL], pa.string()),
    })
