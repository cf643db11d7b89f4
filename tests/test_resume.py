"""Resumable-checkpoint semantics (FIXTURES.md F6 analogue)."""

import glob

import pyarrow.parquet as pq
import pytest

from mmore_ray.pipelines.kg import run_kg
from mmore_ray.sources.corpus import synthesize_corpus
from mmore_ray.state import manifest as mf


@pytest.fixture()
def read_corpus(ray_session):
    ray = ray_session
    table = synthesize_corpus(200, seed=42)
    return lambda: ray.data.from_arrow(table)


def _lineage_rows(out_dir):
    files = glob.glob(f"{out_dir}/lineage/**/*.parquet", recursive=True)
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def test_full_run_then_noop_resume(read_corpus, tmp_path):
    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=3)
    assert mf.completed_shards(out, "extract") == {0, 1, 2}
    n1 = _lineage_rows(out)
    assert n1 == 200
    stats = run_kg(read_corpus, out, num_shards=3)
    assert stats["shards_skipped"] == [0, 1, 2]
    assert _lineage_rows(out) == 200


def test_partial_resume_is_idempotent(read_corpus, tmp_path):
    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=3)
    gold = (
        pq.read_table(glob.glob(f"{out}/triples_sorted/*.parquet"))
        .to_pandas()
        .sort_values(["content_sha256", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    # simulate a crash after shard 1: drop its manifest + the finalize
    (out / "_manifest" / "extract_00001.json").unlink()
    (out / "_manifest" / "finalize_00000.json").unlink()
    stats = run_kg(read_corpus, out, num_shards=3)
    assert stats["shards_skipped"] == [0, 2]
    assert _lineage_rows(out) == 200  # no appended duplicates
    redo = (
        pq.read_table(glob.glob(f"{out}/triples_sorted/*.parquet"))
        .to_pandas()
        .sort_values(["content_sha256", "subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert gold.equals(redo)


def test_sorted_shards_globally_ordered(read_corpus, tmp_path):
    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=2)
    prev = None
    for f in sorted(glob.glob(f"{out}/triples_sorted/*.parquet")):
        t = pq.read_table(f, columns=["subj", "pred", "obj"])
        keys = list(
            zip(*(t.column(c).to_pylist() for c in ("subj", "pred", "obj")))
        )
        assert all(keys[i] <= keys[i + 1] for i in range(len(keys) - 1))
        if prev is not None and keys:
            assert prev <= keys[0]
        if keys:
            prev = keys[-1]
