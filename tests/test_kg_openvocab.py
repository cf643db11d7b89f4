"""Open-vocabulary scanner scale paths (VERDICT r3 #1): with a scanner
whose distinct-triple set grows with the corpus (not the dictionary),
the sorted-write boundary gather must stay capped and the graph rollup
must run distributed — no driver-side materialization of a corpus-scale
key set.  Driven through the REAL provider seam
(MMORE_RAY_MENTION_SCANNER=synthetic-openvocab) at >=10**6 distinct
triples."""

import glob
import json

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from mmore_ray.pipelines import kg

N_DOCS = 8_500
K = 16  # mentions per doc -> C(16,2) = 120 unique triples per doc
EXPECT_TRIPLES = N_DOCS * K * (K - 1) // 2  # 1,020,000


def _corpus_table(n: int) -> pa.Table:
    return pa.table({
        "repo": [f"repo{i % 97}" for i in range(n)],
        "path": [f"src/file{i:06d}.py" for i in range(n)],
        "commit": ["deadbeef"] * n,
        "lang": ["python"] * n,
        "content": [f"unique document body {i}" for i in range(n)],
    })


@pytest.fixture(scope="module")
def openvocab_run(ray_session, tmp_path_factory):
    ray = ray_session
    import os

    os.environ["MMORE_RAY_MENTION_SCANNER"] = "synthetic-openvocab"
    # force the distributed combine at test scale (the default 64 MB
    # driver limit is sized for real corpora)
    saved_limit = kg._ROLLUP_DRIVER_LIMIT
    kg._ROLLUP_DRIVER_LIMIT = 1 << 20
    table = _corpus_table(N_DOCS)
    out = tmp_path_factory.mktemp("kg_openvocab") / "kg"
    try:
        stats = kg.run_kg(
            lambda: ray.data.from_arrow(table), out, num_shards=2,
            num_sorted_partitions=48, warm_docs=2_000,
            scanner_kwargs={"mentions_per_doc": K})
    finally:
        kg._ROLLUP_DRIVER_LIMIT = saved_limit
        del os.environ["MMORE_RAY_MENTION_SCANNER"]
    return out, stats


def test_boundary_sample_is_capped(openvocab_run):
    out, stats = openvocab_run
    assert stats["rollup"]["bounded_vocab"] is False
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    # warmup saw 2,000 docs x 120 = 240,000 distinct keys; the gather
    # must have degraded to a hash-threshold sample under the cap
    assert meta["sampled"] is True
    assert 0 < meta["sample_keys"] <= kg._BOUNDARY_SAMPLE_CAP
    assert 0 < meta["sample_rate"] < 1.0
    assert meta["partitions"] == 48


def test_rollup_runs_distributed_and_exact(openvocab_run):
    out, stats = openvocab_run
    assert stats["rollup"]["finalize"] == "distributed"
    assert stats["rollup"].get("shard_0") == "distributed"
    assert stats["rollup"].get("shard_1") == "distributed"
    graph = pq.read_table(
        sorted(glob.glob(f"{out}/graph/*.parquet")),
        columns=["subj", "pred", "obj", "weight"])
    # every doc's triples are unique to it -> the rollup is exact iff
    # it has one row per (doc, pair), weight exactly 1.0
    assert graph.num_rows == EXPECT_TRIPLES
    assert pc.sum(graph.column("weight")).as_py() == float(EXPECT_TRIPLES)
    assert pc.min(graph.column("weight")).as_py() == 1.0


def test_sorted_triples_complete_and_globally_ordered(openvocab_run):
    out, _ = openvocab_run
    files = sorted(glob.glob(f"{out}/triples_sorted/*.parquet"))
    total = 0
    prev_max = None
    for f in files:
        t = pq.read_table(f, columns=["subj", "pred", "obj"])
        total += t.num_rows
        if t.num_rows == 0:
            continue
        keys = pc.binary_join_element_wise(
            t.column("subj"), t.column("pred"), t.column("obj"), "\x00")
        lo = pc.min(keys).as_py()
        hi = pc.max(keys).as_py()
        # within-file order spot check via sorted indices equality
        assert pc.all(pc.equal(
            pc.sort_indices(keys),
            pa.array(range(t.num_rows), pa.uint64()))).as_py()
        if prev_max is not None:
            assert prev_max <= lo
        prev_max = hi
    assert total == EXPECT_TRIPLES


def test_resume_noop_after_openvocab_run(openvocab_run, ray_session):
    out, _ = openvocab_run
    ray = ray_session
    import os

    os.environ["MMORE_RAY_MENTION_SCANNER"] = "synthetic-openvocab"
    try:
        stats = kg.run_kg(
            lambda: ray.data.from_arrow(_corpus_table(N_DOCS)), out,
            num_shards=2, num_sorted_partitions=48, warm_docs=2_000,
            scanner_kwargs={"mentions_per_doc": K})
    finally:
        del os.environ["MMORE_RAY_MENTION_SCANNER"]
    assert stats["shards_skipped"] == [0, 1]
