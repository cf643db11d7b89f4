#!/usr/bin/env python
"""Reference-architecture baseline for the throughput comparison.

The reference engine cannot run here (marker/dacite/cleantext absent),
so this harness reproduces its EXECUTION MODEL faithfully — full
sample lists in driver memory, a multiprocessing.Pool mapping
per-document work (dispatcher.py:139-163 + processors/base.py:193-204),
hard barriers between pipeline stages (post_processor/pipeline.py:99-120)
and JSONL sinks (process/utils.py save_samples) — while using the SAME
extraction kernels as the Ray engine (scan → parse → link →
canonicalize → triples).  Differences in measured throughput are
therefore attributable to the execution architecture, not the kernels.

Usage: python scripts/baseline_reference_style.py [n_docs] [n_procs]
Prints one JSON line with docs/sec.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _process_one(doc: dict) -> dict:
    """Per-document work unit shipped through the pool (pickled in/out,
    as the reference ships MultimodalSamples)."""
    import hashlib

    from mmore_ray.stages.mentions import MentionScanner, _PROCESS_SCANNER  # noqa: F401
    import mmore_ray.stages.mentions as M

    if M._PROCESS_SCANNER is None:
        M._PROCESS_SCANNER = MentionScanner()
    sha = hashlib.sha256(doc["content"].encode()).hexdigest()
    mentions, edges = M._PROCESS_SCANNER._scan(doc["content"])
    return {"repo": doc["repo"], "path": doc["path"], "content_sha256": sha,
            "mentions": mentions, "edges": edges}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_procs = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from mmore_ray.pipelines.kg import canonical_alias_map

    # corpus as a full in-driver list (reference: crawl result +
    # sample lists live in driver memory, run_process.py / pipeline.py).
    # Uses the bench's cached parquet corpus (same ~5 KB docs the Ray
    # engine is measured on) when present, else synthesizes.
    # must track bench.py's cache tag (currently _u1: per-doc salted
    # contents) so the baseline runs over the SAME docs as the engine
    cache = os.environ.get(
        "GRAFT_CORPUS_CACHE", "/tmp/kg_corpus_cache_sf0.1_r150_t16_s4_u1")
    if os.path.isdir(cache):
        import pyarrow.parquet as pq

        table = pq.read_table(os.path.join(cache, "shard=0000")) \
                  .slice(0, n_docs)
    else:
        from mmore_ray.sources.corpus import synthesize_corpus

        table = synthesize_corpus(n_docs, seed=42)
    n_docs = table.num_rows
    docs = table.select(["repo", "path", "content"]).to_pylist()
    del table

    t0 = time.perf_counter()
    # stage 1 barrier: pool map over documents
    with mp.Pool(n_procs) as pool:
        samples = pool.map(_process_one, docs, chunksize=64)
    # stage 2 barrier: sequential link+canonicalize+triples (the
    # reference's post-processors run sequentially on the driver,
    # post_processor/base.py:48-86)
    canon = canonical_alias_map()
    triples = []
    for s in samples:
        agg: dict = {}
        for e in s["edges"]:
            a = canon.get(e["src"], e["src"])
            b = canon.get(e["dst"], e["dst"])
            key = (min(a, b), e["description"], max(a, b))
            agg[key] = agg.get(key, 0.0) + e["weight"]
        for (subj, pred, obj), w in agg.items():
            triples.append({"repo": s["repo"], "path": s["path"],
                            "content_sha256": s["content_sha256"],
                            "subj": subj, "pred": pred, "obj": obj,
                            "weight": w})
    # stage 3: JSONL sinks (the reference's only output format)
    out = tempfile.mkdtemp(prefix="refstyle_")
    with open(os.path.join(out, "samples.jsonl"), "w") as f:
        for s in samples:
            f.write(json.dumps(s) + "\n")
    with open(os.path.join(out, "triples.jsonl"), "w") as f:
        for t in triples:
            f.write(json.dumps(t) + "\n")
    # global sort on the driver (no distributed sort exists in the ref)
    triples.sort(key=lambda t: (t["subj"], t["pred"], t["obj"]))
    sec = time.perf_counter() - t0
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"arch": "reference-style (mp.Pool + barriers + JSONL)",
                      "n_docs": n_docs, "n_procs": n_procs,
                      "sec": round(sec, 2),
                      "docs_per_sec": round(n_docs / sec, 1),
                      "n_triples": len(triples)}))


if __name__ == "__main__":
    main()
