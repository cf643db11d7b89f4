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


def test_resume_with_different_num_shards_refuses(read_corpus, tmp_path):
    """Changing num_shards re-partitions by a different hash modulus:
    docs in completed shards would be re-extracted into new shards and
    finalize would merge them twice — run_kg must refuse instead."""
    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=3)
    (out / "_manifest" / "extract_00001.json").unlink()
    with pytest.raises(ValueError, match="num_shards=5"):
        run_kg(read_corpus, out, num_shards=5)
    # the original shard count still resumes cleanly
    run_kg(read_corpus, out, num_shards=3)
    assert _lineage_rows(out) == 200


def test_empty_shard_publishes_manifest(ray_session, tmp_path):
    """A shard with zero input docs must publish its (zero-count)
    manifest instead of crashing on an empty rollup concat."""
    ray = ray_session
    table = synthesize_corpus(30, seed=9)

    def read_corpus(shard: int, num_shards: int):
        if shard == 2:  # sharded factory with one empty file-group
            return ray.data.from_arrow(table.slice(0, 0))
        return ray.data.from_arrow(
            table.filter([i % 2 == shard % 2 for i in range(30)]))

    out = tmp_path / "kg"
    stats = run_kg(read_corpus, out, num_shards=3)
    done = {m["shard"] for m in stats["manifest"] if m["step"] == "extract"}
    assert done == {0, 1, 2}
    empty = [m for m in stats["manifest"]
             if m["step"] == "extract" and m["shard"] == 2][0]
    assert empty["n_docs"] == 0
    assert _lineage_rows(out) == 30


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


def test_mid_shard_crash_leaves_no_duplicates(read_corpus, tmp_path):
    """A crash mid-shard leaves partial spill/output parquet behind with
    NO manifest entry; the re-run must clear and rewrite that shard so
    no stale file contributes duplicate rows (ADVICE: stale-spill
    concatenation)."""
    import pyarrow as pa

    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=3)
    base_triples = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/triples/shard=*/b=*/*.parquet"))

    # simulate the crash: delete shard 1's manifest (it "never finished")
    # and plant stale partial files a dying run could have left
    (out / "_manifest" / "extract_00001.json").unlink()
    (out / "_manifest" / "finalize_00000.json").unlink()
    junk = pa.table({"subj": ["ZZZ"], "pred": ["CO_OCCURS"],
                     "obj": ["ZZZ"], "weight": [1.0],
                     "repo": ["junk"], "path": ["j"], "commit": ["c"],
                     "lang": ["python"], "content_sha256": ["0" * 64]})
    stale_dir = out / "triples" / "shard=0001" / "b=00099"
    stale_dir.mkdir(parents=True, exist_ok=True)
    pq.write_table(junk, stale_dir / "stale.parquet")
    pq.write_table(junk, out / "docs" / "shard=0001" / "stale.parquet")

    stats = run_kg(read_corpus, out, num_shards=3)
    assert stats["shards_skipped"] == [0, 2]
    assert _lineage_rows(out) == 200
    after = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/triples/shard=*/b=*/*.parquet"))
    assert after == base_triples  # stale rows gone, nothing duplicated
    # and the junk key never reaches the sorted output
    for f in glob.glob(f"{out}/triples_sorted/*.parquet"):
        t = pq.read_table(f, columns=["subj"])
        assert "ZZZ" not in set(t.column("subj").to_pylist())


def test_custom_gazetteer_actor_pool_end_to_end(ray_session, tmp_path):
    """run_kg with a CUSTOM gazetteer exercises the actor-pool scanner
    (state in __init__) through warmup, tee, and finalize; mentions and
    sorted triples must reflect only the custom surfaces."""
    import pyarrow as pa

    ray = ray_session
    gaz = [("Widget Corp", "ORGANIZATION", "WIDGET CORP"),
           ("Acme Ltd", "ORGANIZATION", "ACME LTD")]
    alias = {"WIDGET CORP": "WIDGET CORP", "ACME LTD": "ACME LTD"}

    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in range(120):
        rows["repo"].append("r")
        rows["path"].append(f"f{i}.py")
        rows["commit"].append("c")
        rows["lang"].append("python")
        rows["content"].append(
            f"# doc {i}: Widget Corp partners with Acme Ltd uniq{i}")
    table = pa.table(rows)

    out = tmp_path / "kg_custom"
    run_kg(lambda: ray.data.from_arrow(table), out, num_shards=2,
           gazetteer=gaz, alias=alias)
    subs = set()
    for f in glob.glob(f"{out}/triples_sorted/*.parquet"):
        subs |= set(pq.read_table(f, columns=["subj"]).column("subj").to_pylist())
    assert subs == {"ACME LTD"}  # sorted pair: (ACME LTD, WIDGET CORP)
    n_mentions = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/mentions/**/*.parquet", recursive=True))
    assert n_mentions == 240  # two mentions per doc


def test_legacy_sort_bounds_format_migrates(read_corpus, tmp_path):
    """A pre-guard out dir stores bounds as a bare JSON list; resuming
    must migrate it in place instead of crashing on saved['num_shards']."""
    import json

    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=3)
    bf = out / "_manifest" / "sort_bounds.json"
    saved = json.loads(bf.read_text())
    bf.write_text(json.dumps(saved["bounds"]))  # simulate legacy file
    (out / "_manifest" / "extract_00001.json").unlink()
    (out / "_manifest" / "finalize_00000.json").unlink()
    stats = run_kg(read_corpus, out, num_shards=3)
    assert stats["shards_skipped"] == [0, 2]
    assert json.loads(bf.read_text())["num_shards"] == 3  # upgraded
    assert _lineage_rows(out) == 200


def test_batch_tag_is_chunk_layout_independent():
    import pyarrow as pa

    from mmore_ray.stages.sortwrite import _batch_tag

    one = pa.table({"a": pa.array(["x", "y", "z"]),
                    "b": pa.array([1, 2, 3], pa.int64())})
    two = pa.concat_tables([one.slice(0, 1), one.slice(1, 2)])
    assert two.column("a").num_chunks > 1  # genuinely different layout
    assert _batch_tag(one) == _batch_tag(two)


def test_resume_with_different_extraction_config_refuses(read_corpus,
                                                         tmp_path):
    """Resuming under a different gazetteer would mix extraction
    semantics across shards (completed shards keep the old one's
    mentions) — same corruption class as the num_shards guard."""
    out = tmp_path / "kg"
    run_kg(read_corpus, out, num_shards=2)
    (out / "_manifest" / "extract_00001.json").unlink()
    with pytest.raises(ValueError, match="extraction config"):
        run_kg(read_corpus, out, num_shards=2,
               gazetteer=[("Paris", "LOCATION", "KB:PARIS")])
    # the original config still resumes cleanly
    run_kg(read_corpus, out, num_shards=2)
    assert _lineage_rows(out) == 200
