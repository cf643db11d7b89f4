"""Adaptive sorted-partition count (VERDICT r3 #6): with
num_sorted_partitions=None (the default) the count derives from the
warmup's triple-byte estimate — small corpora stay at the floor of 32
(old fixed default), large ones grow past it automatically, and the
value freezes in sort_bounds.json so resume stays consistent."""

import glob
import json

import pyarrow.parquet as pq

from mmore_ray.pipelines.kg import run_kg
from mmore_ray.sources.corpus import synthesize_corpus


def _factory(ray, n=300, seed=7):
    table = synthesize_corpus(n, seed=seed)
    return lambda: ray.data.from_arrow(table)


def test_small_corpus_stays_at_floor(ray_session, tmp_path):
    out = tmp_path / "kg"
    run_kg(_factory(ray_session), out, num_shards=2)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta["partitions"] == 32  # floor == the old fixed default
    assert meta["est_total_triple_bytes"] is not None
    assert "growth_note" in meta


def test_large_estimate_grows_past_32_automatically(ray_session, tmp_path):
    out = tmp_path / "kg"
    # a tiny per-partition byte target stands in for a 1000x corpus:
    # the derivation must produce >32 partitions with NO explicit
    # num_sorted_partitions
    run_kg(_factory(ray_session), out, num_shards=2,
           target_partition_bytes=512)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta["partitions"] > 32
    files = sorted(glob.glob(f"{out}/triples_sorted/*.parquet"))
    # partition COUNT adapts; the output stays complete and sorted
    total = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    ref = tmp_path / "kg_ref"
    run_kg(_factory(ray_session), ref, num_shards=2,
           num_sorted_partitions=8)
    ref_total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{ref}/triples_sorted/*.parquet"))
    assert total == ref_total > 0


def test_corpus_docs_hint_skips_probe_and_scales(ray_session, tmp_path):
    out = tmp_path / "kg"
    # claim a web-scale corpus: the estimate extrapolates from the
    # warmup and must cross the floor even at the default byte target
    run_kg(_factory(ray_session), out, num_shards=2,
           corpus_docs=200_000_000)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta["partitions"] > 32


def test_derived_factory_never_pays_a_probe_scan(ray_session, tmp_path):
    """A corpus factory with compute stages (map_batches) is not
    metadata-countable: the adaptive probe must SKIP it (fixed default
    32, estimate recorded as null) rather than silently execute a full
    extra corpus scan for a size estimate."""
    table = synthesize_corpus(200, seed=7)
    marker = tmp_path / "reads.log"

    def factory():
        def counted(b):
            with open(marker, "a") as f:
                f.write("r\n")
            return b
        return ray_session.data.from_arrow(table).map_batches(
            counted, batch_format="pyarrow")

    out = tmp_path / "kg"
    run_kg(factory, out, num_shards=2, target_partition_bytes=512)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta["partitions"] == 32
    assert meta["est_total_triple_bytes"] is None
    # executions: warmup (1 shard) + 2 shard runs = 3 passes; the old
    # count probe would have added a 4th
    assert len(marker.read_text().splitlines()) <= 3


def test_derived_factory_with_corpus_docs_hint_adapts(ray_session, tmp_path):
    table = synthesize_corpus(200, seed=7)

    def factory():
        return ray_session.data.from_arrow(table).map_batches(
            lambda b: b, batch_format="pyarrow")

    out = tmp_path / "kg"
    run_kg(factory, out, num_shards=2, corpus_docs=200_000_000)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta["partitions"] > 32  # hint restores adaptive sizing


def test_resume_reuses_frozen_partition_count(ray_session, tmp_path):
    out = tmp_path / "kg"
    run_kg(_factory(ray_session), out, num_shards=2,
           target_partition_bytes=512)
    meta = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    # resume with DIFFERENT adaptive inputs: frozen bounds win
    stats = run_kg(_factory(ray_session), out, num_shards=2)
    assert stats["shards_skipped"] == [0, 1]
    meta2 = json.loads((out / "_manifest" / "sort_bounds.json").read_text())
    assert meta2["bounds"] == meta["bounds"]
    assert meta2["partitions"] == meta["partitions"]
