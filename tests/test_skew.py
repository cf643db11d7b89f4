"""Hot-key skew stress: when one entity pair dominates the triple
stream (the 100-TB failure mode for range-partitioned sorts), the
warmup-sampled boundaries must split the hot key WITHIN the key by sha
prefix so no sorted output partition balloons."""

import glob
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def test_hot_key_sorted_partitions_stay_balanced(ray_session, tmp_path):
    import ray as _ray

    from mmore_ray.pipelines.kg import run_kg
    from mmore_ray.sources.corpus import GAZETTEER

    # corpus where ~90% of docs mention the SAME two entities (one hot
    # (subj, pred, obj) key) and 10% spread over other pairs
    hot_a, hot_b = GAZETTEER[0][0], GAZETTEER[2][0]
    others = [g[0] for g in GAZETTEER[4:10]]

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        rows = {"repo": [], "path": [], "commit": [], "lang": [],
                "content": []}
        for i in ids:
            if i % 10 != 0:
                text = f"doc {i} links {hot_a} with {hot_b} uniq{i}"
            else:
                a = others[i % len(others)]
                b = others[(i + 1) % len(others)]
                text = f"doc {i} links {a} with {b} uniq{i}"
            rows["repo"].append(f"r{i % 7}")
            rows["path"].append(f"f{i}.py")
            rows["commit"].append("c0")
            rows["lang"].append("python")
            rows["content"].append(text)
        return pa.table(rows)

    def read_corpus(shard: int, num_shards: int):
        n, per = 8000, 8000 // 4
        start, stop = shard * per, (shard + 1) * per
        return _ray.data.range(stop - start).map_batches(
            lambda t, s=start: gen(
                pa.table({"id": pa.compute.add(t.column("id"), s)})),
            batch_format="pyarrow")

    out = tmp_path / "kg_skew"
    shutil.rmtree(out, ignore_errors=True)
    run_kg(read_corpus, out, num_shards=4, num_sorted_partitions=16,
           warm_docs=1000, max_concurrent_shards=2)

    files = sorted(glob.glob(f"{out}/triples_sorted/*.parquet"))
    sizes = [pq.ParquetFile(f).metadata.num_rows for f in files]
    total = sum(sizes)
    assert total > 0
    # the hot key alone is ~90% of rows; without within-key sha splits
    # one partition would hold ~90% — with them, every partition stays
    # within a small factor of the ideal budget
    budget = total / 16
    assert max(sizes) <= 3 * budget, (sizes, total)
    # and the global (subj,pred,obj,sha) order must still hold
    prev = None
    for f in files:
        t = pq.read_table(f, columns=["subj", "pred", "obj",
                                      "content_sha256"])
        for r in zip(*[t.column(c).to_pylist() for c in
                       ("subj", "pred", "obj", "content_sha256")]):
            assert prev is None or prev <= r
            prev = r


def test_null_semantics_match_sql(ray_session):
    """NULL handling of the aggregate family == SQL: quantile_cont and
    COUNT(DISTINCT) ignore NULLs (a NaN previously shifted the median
    rank — or crashed the int cast when selected — and counted as a
    phantom distinct value)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.groupby import (grouped_count_distinct,
                                          grouped_count_distinct_approx,
                                          grouped_median)

    t = pa.table({
        "g": ["a", "a", "a", "b", "b", "c"],
        "v": pa.array([1.0, 2.0, None, 5.0, None, None], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    med = grouped_median(ds, ["g"], "v", "med_e2").to_pandas()
    got = dict(zip(med["g"], med["med_e2"]))
    assert got == {"a": 150, "b": 500}  # all-NULL group c omitted

    cd = grouped_count_distinct(ds, ["g"], "v", "n_distinct").to_pandas()
    got = dict(zip(cd["g"], cd["n_distinct"]))
    assert got == {"a": 2, "b": 1}  # NULL never counts as a value

    hll = grouped_count_distinct_approx(ds, ["g"], "v", "n_approx"
                                        ).to_pandas()
    got = dict(zip(hll["g"], hll["n_approx"]))
    assert got.get("a") == 2 and got.get("b") == 1


def test_quantile_sketch_clamps_inf_to_top_bin(ray_session):
    """+inf / out-of-range values must clamp to the EDGE bin (the
    documented behavior), not int64-overflow into bin 0."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.groupby import grouped_quantiles_sketch

    t = pa.table({"g": ["a"] * 6,
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, float("inf"), 1e300],
                                pa.float64())})
    out = grouped_quantiles_sketch(
        ray.data.from_arrow(t), ["g"], "v", [0.99], lo=0.0, hi=10.0,
        bins=10).to_pandas()
    # 2 of 6 values clamp to the top bin: q0.99 must read from it
    assert out["q099"].iloc[0] >= 9.0
