"""Sorted-write exchange over a pyarrow.fs filesystem (VERDICT r3 #8):
spill and merge must route every file operation through the filesystem
parameter so a multi-node cluster can exchange through S3/GCS with no
shared POSIX mount.  Proven with a SubTreeFileSystem over RELATIVE
paths — any code path bypassing the abstraction (Path.glob, os.* on
the raw string) would miss the subtree and fail or diverge."""

import hashlib
import re

import pyarrow as pa
import pyarrow.parquet as pq
from pyarrow import fs as pafs


def _triples_table(n=5000, seed=3):
    import random

    rng = random.Random(seed)
    subj = [f"E{rng.randrange(200):03d}" for _ in range(n)]
    pred = [rng.choice(["CO_OCCURS_WITH", "CALLS"]) for _ in range(n)]
    obj = [f"E{rng.randrange(200):03d}" for _ in range(n)]
    sha = [hashlib.sha256(f"{i}".encode()).hexdigest() for i in range(n)]
    return pa.table({"subj": subj, "pred": pred, "obj": obj,
                     "content_sha256": sha,
                     "weight": pa.array([1.0] * n, pa.float64())})


def _key_counts(table):
    g = table.group_by(["subj", "pred", "obj"]).aggregate(
        [("weight", "count")])
    return [((s, p, o), float(n)) for s, p, o, n in zip(
        g.column("subj").to_pylist(), g.column("pred").to_pylist(),
        g.column("obj").to_pylist(),
        g.column("weight_count").to_pylist())]


def _read_sorted(dir_path, filesystem=None):
    sel = pafs.FileSelector(str(dir_path))
    fs = filesystem or pafs.LocalFileSystem()
    files = sorted(i.path for i in fs.get_file_info(sel)
                   if i.type == pafs.FileType.File
                   and re.search(r"part-\d+\.parquet$", i.path))
    tables = [pq.read_table(f, filesystem=fs) for f in files]
    return files, pa.concat_tables(tables)


def test_write_sorted_through_subtree_fs_matches_local(ray_session,
                                                       tmp_path):
    from mmore_ray.stages.sortwrite import SORT_COLS, write_sorted

    ray = ray_session
    table = _triples_table()
    counts = _key_counts(table)

    local_out = tmp_path / "local_out"
    write_sorted(ray.data.from_arrow(table), counts, local_out,
                 num_partitions=7)

    base = tmp_path / "subtree_base"
    base.mkdir()
    subfs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    # RELATIVE path within the subtree: a leaked os/Path operation on
    # it would resolve against the process CWD, not the subtree
    write_sorted(ray.data.from_arrow(table), counts, "fs_out",
                 num_partitions=7, filesystem=subfs)

    lf, lt = _read_sorted(local_out)
    sf, st = _read_sorted("fs_out", filesystem=subfs)
    assert len(lf) == len(sf) > 0
    assert lt.num_rows == st.num_rows == table.num_rows
    # identical global order under both media
    cols = SORT_COLS
    assert lt.select(cols).equals(st.select(cols))
    # spill dir cleaned up on the remote medium too
    info = subfs.get_file_info("fs_out/_spill")
    assert info.type == pafs.FileType.NotFound


def test_write_sorted_subtree_output_is_globally_sorted(ray_session,
                                                        tmp_path):
    import pyarrow.compute as pc

    from mmore_ray.stages.sortwrite import write_sorted

    ray = ray_session
    table = _triples_table(n=2000, seed=11)
    base = tmp_path / "b2"
    base.mkdir()
    subfs = pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())
    write_sorted(ray.data.from_arrow(table), _key_counts(table),
                 "out", num_partitions=5, filesystem=subfs)
    files, _ = _read_sorted("out", filesystem=subfs)
    prev_max = None
    for f in files:
        t = pq.read_table(f, filesystem=subfs,
                          columns=["subj", "pred", "obj"])
        if t.num_rows == 0:
            continue
        keys = pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), "\x00")
        assert pc.all(pc.equal(
            pc.sort_indices(keys),
            pa.array(range(t.num_rows), pa.uint64()))).as_py()
        if prev_max is not None:
            assert prev_max <= pc.min(keys).as_py()
        prev_max = pc.max(keys).as_py()
