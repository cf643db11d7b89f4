"""Benchmark harness.

Default mode: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(num_cpus=$RAY_GRAFT_CPUS|32)``
and print ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N}

``--scaling``: run the headline twice in fresh processes (num_cpus=8 and
32) on the same input and report both throughputs + scaling efficiency
(sandbox stand-in for the N vs 4N node clusters of the north rule).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, logging_level="ERROR")
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from mmore_ray.pipelines import queries as Q
    from mmore_ray.pipelines.kg import run_kg
    from mmore_ray.sources.corpus import derive_corpus_batch

    # Warm the OS page cache so we measure compute+shuffle, not cold reads.
    n_docs = 0
    for t in ("documents", "lineitem", "orders", "events", "part"):
        f = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(f):
            m = pq.read_table(f)
            if t == "documents":
                n_docs = m.num_rows
            del m

    timings: dict[str, float] = {}

    # Headline: the flagship KG construction run (sharded, incl. final
    # global rollup + sort).  The corpus is the documents table expanded
    # deterministically to realistic file counts/sizes (replicate×tile →
    # ~20× docs of ~5 KB) so compute dominates fixed overhead, as it
    # would at real scale.
    from mmore_ray.sources.corpus import expand_documents

    replicate = int(os.environ.get("GRAFT_BENCH_REPLICATE", "20"))
    tile = int(os.environ.get("GRAFT_BENCH_TILE", "16"))

    import pyarrow.compute as pc

    def read_corpus(shard: int, num_shards: int):
        # shard pushdown BEFORE the expensive expansion/derivation so
        # no shard pays for another shard's rows
        return ray.data.read_parquet(
            f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(
            lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("doc_id"), num_shards - 1), shard)),
            batch_format="pyarrow",
        ).map_batches(
            expand_documents, fn_kwargs={"replicate": replicate, "tile": tile},
            batch_format="pyarrow",
        ).map_batches(derive_corpus_batch, batch_format="pyarrow")

    n_docs *= replicate
    out_dir = tempfile.mkdtemp(prefix="kg_bench_")
    headline = _timed(lambda: run_kg(read_corpus, out_dir, num_shards=4))
    timings["kg_full_run"] = headline

    # Representative per-query timings (consumed via count to stream).
    for name in ("kg_graph", "q1_pricing", "q3_top_orders",
                 "q_nation_revenue", "q_events_window"):
        fn = Q.QUERIES[name]
        timings[name] = _timed(lambda f=fn: f(SF_DIR).count())

    result = {
        "metric": "kg_full_run_sec (triple extraction+link+canonicalize+sort, "
                  f"{n_docs} docs)",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "docs_per_sec": round(n_docs / headline, 1) if headline else None,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    print(json.dumps(result))


def scaling() -> None:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    print(json.dumps({
        f"sec_{lo}": t_lo,
        f"sec_{hi}": t_hi,
        f"docs_per_sec_{lo}": r_lo["docs_per_sec"],
        f"docs_per_sec_{hi}": r_hi["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    else:
        main()
