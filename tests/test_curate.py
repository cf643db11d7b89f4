"""Curation ladder semantics: every stage must visibly do its job on
the tri-union input (quality gate, lang gate, exact dedup keep-min with
n_dupes accounting, near-dup drop-higher-id)."""

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_curate_stage_semantics(ray_session):
    from mmore_ray.pipelines.queries import _docs_curate_input, q_curate

    out = q_curate(SF).to_pandas()
    base = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    base_ids = set(base.doc_id)

    # no exact copy (+500000) survives: its original has the lower id
    assert not any(500000 <= i < 1000000 for i in out.doc_id)
    # no near copy (+1000000) survives: jaccard vs its original ≥ 0.5
    assert not any(i >= 1000000 for i in out.doc_id)
    # survivors are a nontrivial subset of the base docs
    assert 0 < len(out) < len(base_ids)
    assert set(out.doc_id) <= base_ids

    # n_dupes: a surviving doc whose id%7==0 AND that passed the gates
    # represents itself + its exact copy
    dup_counts = out.set_index("doc_id")["n_dupes"]
    sevens = [i for i in out.doc_id if i % 7 == 0]
    assert sevens and all(dup_counts[i] == 2 for i in sevens)
    others = [i for i in out.doc_id if i % 7 != 0]
    assert others and all(dup_counts[i] == 1 for i in others)

    # gates actually applied
    assert (out.word_count >= 20).all()
    assert (out.stop_ratio_e4 >= 200).all()
    assert (out.lang_pred == "en").all()

    # input sanity: the tri-union really contains all three variants
    n_in = _docs_curate_input(SF).count()
    n_base = len(base_ids)
    n_ex = sum(1 for i in base_ids if i % 7 == 0)
    n_nr = sum(1 for i in base_ids if i % 5 == 0)
    assert n_in == n_base + n_ex + n_nr


def test_curate_full_composition(ray_session):
    """Decontaminated docs are gone, PII is scrubbed before gates, and
    n_redactions rides through to the output."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate_full

    good = ("the cat and the dog is a fine pair of animals that like "
            "to play in the yard all day long with the ball")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": [good,
                 good + " mail me a@b.cc ok",   # survives with 1 redaction
                 "benchmark overlap text that should be dropped by decontamination here today ok"],
    }))
    bench = ["benchmark overlap text that should be dropped by "
             "decontamination here today"]
    out = curate_full(ds, bench, min_words=5, min_stop_e4=100,
                      jaccard=0.99).to_pandas().sort_values("doc_id")
    assert 3 not in out["doc_id"].tolist()          # decontaminated
    got = dict(zip(out["doc_id"], out["n_redactions"]))
    assert got[1] == 0 and got[2] == 1              # scrub count carried

    # caller-supplied carry_cols merge with the implicit n_redactions
    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": [1], "text": [good], "src": ["web"]}))
    out2 = curate_full(ds2, [], min_words=5, min_stop_e4=100,
                       carry_cols=("src",)).to_pandas()
    assert out2["src"].tolist() == ["web"]
    assert out2["n_redactions"].tolist() == [0]


def test_curate_all_filtered_out_is_empty_not_crash(ray_session):
    """Every doc failing the gates exercises the spill fallback: Ray
    writes ZERO parquet files for an empty dataset, so the checkpoint
    must fall back to the in-memory path instead of crashing on a
    missing read path."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["too short", "also short"]}))
    out = curate(ds, min_words=50)
    assert out.count() == 0
    # to_pandas() drops 0-row blocks entirely; the contract columns
    # live on the Arrow block itself
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    names = {n for b in blocks for n in b.schema.names}
    assert {"doc_id", "n_dupes", "word_count"} <= names


def test_curate_spill_scratch_dir_and_cleanup(ray_session, tmp_path):
    """With an explicit scratch_dir the text-bearing annotated
    checkpoint lands on disk and is KEPT (and it is the ONLY text
    spill — survivors derive from it by re-join, not a second corpus
    write); the default private temp dir is removed before returning."""
    import glob

    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    good = ("the cat and the dog is a fine pair of animals that like "
            "to play in the yard all day long with the ball")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": [good, good + " extra tail words here"]}))
    scratch = tmp_path / "spill"
    out = curate(ds, min_words=5, min_stop_e4=100, jaccard=0.99,
                 scratch_dir=str(scratch)).to_pandas()
    assert len(out) == 2
    assert glob.glob(str(scratch / "annotated" / "*.parquet"))
    assert not (scratch / "survivors").exists()  # no second text write
    # text never reaches the output; metadata columns all present
    assert "text" not in out.columns
    assert {"doc_id", "word_count", "stop_ratio_e4",
            "lang_pred", "n_dupes"} <= set(out.columns)

    before = set(glob.glob("/tmp/mmore_ray_curate_*"))
    curate(ds, min_words=5, min_stop_e4=100).to_pandas()
    assert set(glob.glob("/tmp/mmore_ray_curate_*")) == before


def test_curate_empty_result_runs_upstream_once(ray_session, tmp_path):
    """The all-filtered-out fallback must NOT re-execute the upstream
    pipeline to recover a schema (the annotate scan is the per-byte hot
    path): the spill pass records the schema side-file, and the empty
    branch reads it.  Carry dtypes survive: an int64 carry stays int64
    in the empty output."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    marker = tmp_path / "execs.log"

    def counted(b: pa.Table) -> pa.Table:
        with open(marker, "a") as f:
            f.write("x\n")
        return b

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": ["too short", "also short"],
        "weight": pa.array([5, 6], pa.int64()),
    })).map_batches(counted, batch_format="pyarrow")
    out = curate(ds, min_words=50, carry_cols=("weight",))
    assert out.count() == 0
    # one block, one pass: the old fallback materialised a second one
    assert len(marker.read_text().splitlines()) == 1
    blocks = [b for b in out.to_arrow_refs()]
    import ray as _ray
    schema = pa.unify_schemas([_ray.get(r).schema for r in blocks])
    assert schema.field("weight").type == pa.int64()
    assert schema.field("lang_pred").type == pa.string()
    assert schema.field("n_dupes").type == pa.int64()


def test_curate_reused_scratch_no_schema_pollution(ray_session, tmp_path):
    """Worker schema caches are run-scoped: a second run over the SAME
    scratch_dir (reusing the same Ray worker processes) must not unify
    the previous run's columns into the new run's empty-output schema —
    run 1 carries `weight`, run 2 does not, so run 2's empty output
    must have no phantom `weight` column."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    scratch = str(tmp_path / "reused")
    ds1 = ray.data.from_arrow(pa.table({
        "doc_id": [1], "text": ["too short"],
        "weight": pa.array([5], pa.int64())}))
    out1 = curate(ds1, min_words=50, carry_cols=("weight",),
                  scratch_dir=scratch)
    assert out1.count() == 0

    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": [2], "text": ["also short"]}))
    out2 = curate(ds2, min_words=50, scratch_dir=scratch)
    assert out2.count() == 0
    import ray as _ray
    names = {n for r in out2.to_arrow_refs()
             for n in _ray.get(r).schema.names}
    assert "weight" not in names
    assert {"doc_id", "n_dupes"} <= names


def test_curate_empty_result_nullable_carry_dtype_deterministic(
        ray_session, tmp_path):
    """A nullable int64 carry converts to float64 only in null-bearing
    pandas blocks; the recorded empty-output schema must unify across
    blocks (float64) rather than depend on which block ran first."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    a = ray.data.from_arrow(pa.table({
        "doc_id": [1], "text": ["too short"],
        "weight": pa.array([5], pa.int64())}))
    b = ray.data.from_arrow(pa.table({
        "doc_id": [2], "text": ["also short"],
        "weight": pa.array([None], pa.int64())}))
    for ds in (a.union(b), b.union(a)):  # both block orders
        out = curate(ds, min_words=50, carry_cols=("weight",))
        assert out.count() == 0
        import ray as _ray
        schema = pa.unify_schemas(
            [_ray.get(r).schema for r in out.to_arrow_refs()])
        assert schema.field("weight").type == pa.float64()


def test_curate_scratch_dir_reuse_no_stale_rows(ray_session, tmp_path):
    """Ray's write_parquet APPENDS uniquely-named files into an existing
    directory: a second run over the same scratch_dir must not resurface
    the first run's rows as live data on re-read."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.pipelines.curate import curate

    good = ("the cat and the dog is a fine pair of animals that like "
            "to play in the yard all day long with the ball")
    scratch = str(tmp_path / "reused")
    ds1 = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": [good, good + " extra tail words here"]}))
    out1 = curate(ds1, min_words=5, min_stop_e4=100, jaccard=0.99,
                  scratch_dir=scratch).to_pandas()
    assert sorted(out1.doc_id) == [1, 2]

    ds2 = ray.data.from_arrow(pa.table({
        "doc_id": [7], "text": [good + " a different run entirely"]}))
    out2 = curate(ds2, min_words=5, min_stop_e4=100, jaccard=0.99,
                  scratch_dir=scratch).to_pandas()
    assert sorted(out2.doc_id) == [7]  # no phantom rows from run 1


import pytest


@pytest.mark.parametrize("verify_plan", ["broadcast", "join"])
def test_curate_spill_over_pyarrow_fs(ray_session, tmp_path, monkeypatch,
                                      verify_plan):
    """The curate spill exchange routes ALL file operations (wipe,
    write, has-files probe, schema sidecar, re-reads) through the
    pyarrow.fs parameter — proven with a SubTreeFileSystem over
    RELATIVE paths, which any abstraction-bypassing os/Path operation
    would escape (same protocol as test_sortwrite_fs).  Parametrized
    over BOTH near-dup verify plans: the broadcast plan (default at
    this scale) and the large-candidate-set join plan (_verify_join,
    forced by dropping the small-side limits to 0), whose Ray joins
    re-execute the spill-backed source read inside join tasks — that
    re-read must be fs-clean too."""
    import pyarrow as pa
    import ray.data
    from pyarrow import fs as pafs

    from mmore_ray.pipelines.curate import curate

    if verify_plan == "join":
        import mmore_ray.stages.dedup as dd

        orig_verify = dd.verify_pairs_jaccard
        orig_sum = dd._sum_pair_counts
        monkeypatch.setattr(
            dd, "verify_pairs_jaccard",
            lambda *a, **kw: orig_verify(
                *a, **{**kw, "broadcast_limit": 0}))
        # keep the pair list a Dataset so the dispatcher can actually
        # pick the join plan (a DataFrame pair list forces broadcast)
        monkeypatch.setattr(
            dd, "_sum_pair_counts",
            lambda pairs, nb, small_limit=None: orig_sum(
                pairs, nb, small_limit=0))
    # join mode: a threshold the near-copy pair actually clears, so the
    # candidate set is non-empty and _verify_join's joins re-read the
    # spill through the fs on real rows (doc 2, the higher id, drops)
    jaccard = 0.99 if verify_plan == "broadcast" else 0.5
    expect = [1, 2] if verify_plan == "broadcast" else [1]

    subfs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    good = ("the cat and the dog is a fine pair of animals that like "
            "to play in the yard all day long with the ball")
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2], "text": [good, good + " extra tail words here"]}))
    out = curate(ds, min_words=5, min_stop_e4=100, jaccard=jaccard,
                 scratch_dir="scratch", filesystem=subfs).to_pandas()
    assert sorted(out.doc_id) == expect
    # the spill landed INSIDE the subtree (relative path resolved by fs)
    assert list((tmp_path / "scratch" / "annotated").glob("*.parquet"))
    # sidecar written through the fs too
    assert list((tmp_path / "scratch" / "annotated" / "_schema")
                .glob("*.arrowipc"))

    # the empty-result fallback works over the fs as well
    short = ray.data.from_arrow(pa.table({
        "doc_id": [9], "text": ["too short"]}))
    empty = curate(short, min_words=50, scratch_dir="scratch2",
                   filesystem=subfs)
    assert empty.count() == 0
    import ray as _ray
    names = {n for r in empty.to_arrow_refs()
             for n in _ray.get(r).schema.names}
    assert {"doc_id", "n_dupes", "word_count"} <= names

    # a non-local filesystem without an explicit scratch_dir is refused
    import pytest
    with pytest.raises(ValueError, match="scratch_dir"):
        curate(ds, filesystem=subfs)
