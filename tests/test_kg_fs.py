"""run_kg's WHOLE exchange over a pyarrow.fs filesystem (VERDICT r4 #1):
tee side-writes, warm-count files, sort_bounds.json, rollup
consolidation, manifest and finalize merge must all route through the
``filesystem=`` seam so a multi-node cluster needs no shared POSIX
mount.  Proven with a SubTreeFileSystem over RELATIVE paths — any code
path bypassing the abstraction (Path.glob, os.* on the raw string)
would resolve against the process CWD, not the subtree, and fail or
diverge.  Also covers VERDICT r4 #2: the post-shard side-file fan-out
bound (docs/mentions/lineage consolidation)."""

import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyarrow import fs as pafs


def _subfs(tmp_path, name):
    base = tmp_path / name
    base.mkdir()
    return base, pafs.SubTreeFileSystem(str(base), pafs.LocalFileSystem())


def _read_dir(dir_path, filesystem=None, suffix=".parquet"):
    fs = filesystem or pafs.LocalFileSystem()
    sel = pafs.FileSelector(str(dir_path), recursive=True,
                            allow_not_found=True)
    files = sorted(i.path for i in fs.get_file_info(sel)
                   if i.type == pafs.FileType.File
                   and i.path.endswith(suffix))
    if not files:
        return files, None
    return files, pa.concat_tables(
        pq.read_table(f, filesystem=fs) for f in files)


def _sorted_triples(out_dir, filesystem=None):
    _, t = _read_dir(f"{out_dir}/triples_sorted", filesystem)
    return t.select(["subj", "pred", "obj", "content_sha256"])


def test_run_kg_through_subtree_fs_matches_local(ray_session, tmp_path):
    from mmore_ray.pipelines.kg import kg_lookup, run_kg
    from mmore_ray.sources.corpus import synthesize_corpus

    ray = ray_session
    table = synthesize_corpus(400, seed=7)
    factory = lambda: ray.data.from_arrow(table)  # noqa: E731

    local_out = tmp_path / "local"
    run_kg(factory, local_out, num_shards=2)

    _, subfs = _subfs(tmp_path, "subtree")
    # RELATIVE out_dir within the subtree: a leaked os/Path operation
    # would resolve against the CWD, not the subtree
    stats = run_kg(factory, "kg_out", num_shards=2, filesystem=subfs)

    # identical sorted triples under both media (same global order)
    lt = _sorted_triples(local_out)
    st = _sorted_triples("kg_out", filesystem=subfs)
    assert lt.num_rows == st.num_rows > 0
    assert lt.equals(st)

    # identical graph rollup
    _, lg = _read_dir(local_out / "graph")
    _, sg = _read_dir("kg_out/graph", filesystem=subfs)
    key = ["subj", "pred", "obj"]
    assert lg.sort_by([(c, "ascending") for c in key]).equals(
        sg.sort_by([(c, "ascending") for c in key]))

    # manifest metrics computed over the remote medium match local
    def metrics(entries):
        return sorted((m["shard"], m["n_docs"], m["n_mentions"],
                       m["n_edges"])
                      for m in entries if m["step"] == "extract")

    from mmore_ray.state import manifest as mf

    assert metrics(stats["manifest"]) == metrics(mf.all_entries(local_out))

    # lineage rows survive the consolidation + fs routing
    _, lin = _read_dir("kg_out/lineage", filesystem=subfs)
    assert lin.num_rows == table.num_rows

    # the partition-pruned serving lookup works over the same fs
    subj = pc.min(lt.column("subj")).as_py()
    got = kg_lookup("kg_out", subj, filesystem=subfs)
    want = kg_lookup(local_out, subj)
    assert got.num_rows == want.num_rows > 0

    # nothing leaked onto the local filesystem outside the subtree:
    # a bypassed fs op would have created ./kg_out relative to CWD
    import os

    assert not os.path.exists("kg_out")


def test_run_kg_resume_over_subtree_fs(ray_session, tmp_path):
    """Resume semantics (skip completed shards, re-run missing ones,
    refuse config drift) must hold when every manifest/bounds byte
    lives behind the filesystem seam."""
    import pytest

    from mmore_ray.pipelines.kg import run_kg
    from mmore_ray.sources.corpus import synthesize_corpus

    ray = ray_session
    table = synthesize_corpus(300, seed=13)
    factory = lambda: ray.data.from_arrow(table)  # noqa: E731

    _, subfs = _subfs(tmp_path, "base")
    run_kg(factory, "out", num_shards=3, filesystem=subfs)
    first = _sorted_triples("out", filesystem=subfs)

    # simulate a crash after shard 1: drop its manifest + finalize
    subfs.delete_file("out/_manifest/extract_00001.json")
    subfs.delete_file("out/_manifest/finalize_00000.json")
    stats = run_kg(factory, "out", num_shards=3, filesystem=subfs)
    assert stats["shards_skipped"] == [0, 2]
    assert _sorted_triples("out", filesystem=subfs).equals(first)

    # num_shards drift is refused from the fs-resident bounds file
    with pytest.raises(ValueError, match="num_shards"):
        run_kg(factory, "out", num_shards=5, filesystem=subfs)

    bounds = json.loads(
        subfs.open_input_stream("out/_manifest/sort_bounds.json")
        .read().decode())
    assert bounds["num_shards"] == 3


def test_run_kg_distributed_rollup_over_subtree_fs(ray_session, tmp_path,
                                                   monkeypatch):
    """The open-vocabulary rollup path (distributed bucketed_agg +
    tmp-dir swap via fsio.move_dir_contents, and the distributed
    finalize combine) must also be fs-clean — forced at tiny scale by
    dropping the driver-combine byte limit to zero."""
    from mmore_ray.pipelines import kg
    from mmore_ray.sources.corpus import synthesize_corpus

    ray = ray_session
    monkeypatch.setattr(kg, "_ROLLUP_DRIVER_LIMIT", 0)
    table = synthesize_corpus(200, seed=3)
    factory = lambda: ray.data.from_arrow(table)  # noqa: E731

    local_out = tmp_path / "local"
    stats_l = kg.run_kg(factory, local_out, num_shards=2)
    _, subfs = _subfs(tmp_path, "base")
    stats_s = kg.run_kg(factory, "out", num_shards=2, filesystem=subfs)
    assert stats_s["rollup"]["finalize"] == "distributed"
    assert stats_s["rollup"].get("shard_0") == "distributed"

    _, lg = _read_dir(local_out / "graph")
    _, sg = _read_dir("out/graph", filesystem=subfs)
    key = [(c, "ascending") for c in ("subj", "pred", "obj")]
    assert lg.sort_by(key).equals(sg.sort_by(key))
    assert stats_l["rollup"]["finalize"] == "distributed"

    import os

    assert not os.path.exists("out")


def test_side_file_fanout_is_bounded_and_lossless(ray_session, tmp_path):
    """Per-shard docs/mentions/lineage file counts must stay under the
    consolidation bound regardless of corpus size (here: 2 corpus sizes,
    tiny tee batches to force many part files), and consolidation must
    not change any output."""
    from mmore_ray.pipelines.kg import run_kg
    from mmore_ray.sources.corpus import synthesize_corpus

    ray = ray_session
    max_files = 4
    counts = {}
    for n_docs in (240, 720):
        table = synthesize_corpus(n_docs, seed=5)
        out = tmp_path / f"kg{n_docs}"
        run_kg(lambda: ray.data.from_arrow(table), out, num_shards=1,
               tee_batch_size=32, consolidate_max_files=max_files)
        # reference run without the fan-out pressure
        ref = tmp_path / f"ref{n_docs}"
        run_kg(lambda: ray.data.from_arrow(table), ref, num_shards=1)

        for name in ("docs", "mentions", "lineage"):
            files, t = _read_dir(out / name / "shard=0000")
            # > max_files part files were written (tee_batch_size=32 →
            # ~n_docs/32 batches), consolidated down to the bound
            assert len(files) <= max_files, (name, n_docs, len(files))
            counts[(name, n_docs)] = len(files)
            _, rt = _read_dir(ref / name / "shard=0000")
            assert t.num_rows == rt.num_rows, (name, n_docs)

        assert _sorted_triples(out).equals(_sorted_triples(ref))
        # manifest metrics identical with and without consolidation
        from mmore_ray.state import manifest as mf

        m = [e for e in mf.all_entries(out) if e["step"] == "extract"][0]
        r = [e for e in mf.all_entries(ref) if e["step"] == "extract"][0]
        assert (m["n_docs"], m["n_mentions"], m["n_edges"]) == \
            (r["n_docs"], r["n_mentions"], r["n_edges"])

    # the bound is independent of corpus size: tripling the docs must
    # not grow the post-consolidation file count past the bound
    for name in ("docs", "mentions", "lineage"):
        assert counts[(name, 720)] <= max_files
