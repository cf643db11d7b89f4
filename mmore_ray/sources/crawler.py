"""File crawler (reference ``process/crawler.py`` analogue).

The reference os.walks root dirs, filters by extension whitelist and
produces FileDescriptor lists (``crawler.py:228-273``).  Here the crawl
emits a Ray Dataset of descriptor rows — the file list IS the input
table; at real scale this is a manifest/parquet listing read, not a
walk (SURVEY §2.1)."""

from __future__ import annotations

import os
from pathlib import Path

import pyarrow as pa

DESCRIPTOR_SCHEMA = pa.schema([
    ("file_path", pa.string()),
    ("file_name", pa.string()),
    ("file_size", pa.int64()),
    ("modified_at", pa.string()),   # ISO-8601, like FileDescriptor
    ("extension", pa.string()),
])


def crawl_table(root_dirs: list[str | Path],
                extensions: list[str] | None = None) -> pa.Table:
    """Walk roots → descriptor table (driver-side listing)."""
    import datetime as dt

    rows = {k: [] for k in ("file_path", "file_name", "file_size",
                            "modified_at", "extension")}
    # normalize whitelist entries with or without the dot ('txt' and
    # '.txt' both work — splitext returns '.txt', so a dotless entry
    # would silently match nothing); an explicit [] means allow NOTHING
    allow = (frozenset("." + e.lower().lstrip(".") for e in extensions)
             if extensions is not None else None)
    for root in root_dirs:
        for dirpath, _, files in sorted(os.walk(root)):
            for name in sorted(files):
                ext = os.path.splitext(name)[1].lower()
                if allow is not None and ext not in allow:
                    continue
                full = os.path.join(dirpath, name)
                try:
                    st = os.stat(full)
                except OSError:
                    # dangling symlink / concurrently-deleted file: one
                    # bad entry must not abort the whole crawl
                    continue
                rows["file_path"].append(full)
                rows["file_name"].append(name)
                rows["file_size"].append(st.st_size)
                # UTC, not naive local time: the incremental reuse
                # gate compares this LEXICALLY against processed_at
                # (same convention in run_process) — a DST fall-back
                # hour or TZ change would silently reuse stale files
                rows["modified_at"].append(dt.datetime.fromtimestamp(
                    st.st_mtime, dt.timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%S"))
                rows["extension"].append(ext)
    return pa.table({
        "file_path": pa.array(rows["file_path"], pa.string()),
        "file_name": pa.array(rows["file_name"], pa.string()),
        "file_size": pa.array(rows["file_size"], pa.int64()),
        "modified_at": pa.array(rows["modified_at"], pa.string()),
        "extension": pa.array(rows["extension"], pa.string()),
    })


def read_contents(batch: pa.Table) -> pa.Table:
    """map_batches stage: descriptor rows → + content column.

    Text formats decode utf-8 (errors='replace'); binary formats
    (pdf/docx/pptx/xlsx/media) decode latin-1 so every byte maps 1:1
    into the string column and the processor's ``encode('latin-1')``
    recovers the exact bytes — utf-8/replace would turn any byte
    ≥ 0x80 into U+FFFD and break every binary parser downstream."""
    from ..stages.processors import BINARY_EXTENSIONS

    contents = []
    for p in batch.column("file_path").to_pylist():
        try:
            raw = Path(p).read_bytes()
        except OSError:
            contents.append("")
            continue
        if p.lower().endswith(BINARY_EXTENSIONS):
            contents.append(raw.decode("latin-1"))
        else:
            contents.append(raw.decode("utf-8", errors="replace"))
    return batch.append_column("content", pa.array(contents, pa.string()))
