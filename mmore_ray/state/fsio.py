"""Small pyarrow.fs helpers shared by the manifest and run_kg.

Every run_kg file operation routes through these (or through the
``filesystem=`` parameter of pyarrow/Ray readers+writers) so the whole
flagship — side-writes, warm counts, bounds, rollup consolidation,
manifest — works over any ``pyarrow.fs.FileSystem`` (S3, GCS, a
PyFileSystem-wrapped fsspec store) with NO shared POSIX mount, the same
exchange contract ``stages/sortwrite.py`` documents.  Proven against a
SubTreeFileSystem (rejects absolute host paths) in tests/test_kg_fs.py.

Atomicity note: "atomic" writes here are tmp-file + ``fs.move``.  On a
local filesystem move is a POSIX rename (atomic).  On object stores
move is copy+delete — not atomic as a rename, but still crash-safe for
the write-once files used here: a crash before the copy completes
leaves no (complete) object at the final path, and every reader treats
a missing file as "not published yet".
"""

from __future__ import annotations

from pyarrow import fs as pafs


def exists(fs, path: str) -> bool:
    return fs.get_file_info(str(path)).type != pafs.FileType.NotFound


def read_text(fs, path: str) -> str:
    with fs.open_input_stream(str(path)) as f:
        return f.read().decode()


def write_text_atomic(fs, path: str, text: str) -> None:
    """tmp + move publish (see module atomicity note).  The tmp name is
    uuid-unique: two workers racing to publish the SAME path (e.g. the
    warm-count files, keyed by batch content digest) must not move each
    other's half-written tmp — and on a multi-node cluster pids collide
    across nodes, so a pid suffix would not be enough."""
    import uuid

    path = str(path)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(text.encode())
    fs.move(tmp, path)


def ensure_dir(fs, path: str) -> None:
    fs.create_dir(str(path), recursive=True)


def delete_dir(fs, path: str) -> None:
    """rm -rf semantics: missing path is fine."""
    path = str(path)
    if exists(fs, path):
        fs.delete_dir(path)


def list_files(fs, path: str, suffix: str = "", recursive: bool = True):
    """Sorted FileInfo list under ``path`` (missing dir → empty list) —
    the fs-portable replacement for Path.glob/rglob."""
    sel = pafs.FileSelector(str(path), recursive=recursive,
                            allow_not_found=True)
    return sorted(
        (fi for fi in fs.get_file_info(sel)
         if fi.type == pafs.FileType.File and fi.path.endswith(suffix)),
        key=lambda fi: fi.path)


def list_dirs(fs, path: str):
    """Sorted immediate subdirectory paths (missing dir → empty)."""
    sel = pafs.FileSelector(str(path), recursive=False,
                            allow_not_found=True)
    return sorted(fi.path for fi in fs.get_file_info(sel)
                  if fi.type == pafs.FileType.Directory)


def move_dir_contents(fs, src: str, dst: str) -> None:
    """Replace ``dst``'s contents with ``src``'s files, then drop
    ``src``.  Per-FILE moves, not a directory rename: object stores
    have no directory rename, and pyarrow's move is only defined on
    single objects there."""
    delete_dir(fs, dst)
    ensure_dir(fs, dst)
    src = str(src)
    for fi in list_files(fs, src):
        rel = fi.path[len(src):].lstrip("/")
        if "/" in rel:
            ensure_dir(fs, f"{dst}/{rel.rsplit('/', 1)[0]}")
        fs.move(fi.path, f"{dst}/{rel}")
    delete_dir(fs, src)
