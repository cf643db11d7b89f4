"""Flagship pipeline: Ray-Data-native KG construction.

    read corpus (repo, path, commit, lang, content)
      → map_batches(add_sha256)                  # lineage invariant
      → map_batches(MentionScanner, conc=N)      # actor pool, per-doc graphs
      → explode mentions / edges                 # flat rows, content dropped
      → map_batches(EntityLinker, conc=N)        # broadcast alias dict
      → map_batches(CanonicalRelabel)            # union-find canonical map
      → doc_triples                              # per-doc merge, no shuffle
      → partial rollup → groupby(s,p,o).sum      # combiner + small shuffle
      → sort(subj,pred,obj) → write_parquet      # range-partition shuffle

Lifecycle analogue of the reference's process→postprocess chain
(SURVEY §3): crawl ≙ parquet read; processors ≙ normalize stage; NER
post-processor ≙ scanner+parser; the merge step ≙ the lineage manifest.

Canonicalization strategy (SURVEY §7.5): union-find runs driver-side
over the *alias dictionary* pairs — canonical labels are a property of
the (small) dictionary, not of the corpus, so no extra data pass or
shuffle is needed; unknown surfaces canonicalize to themselves.  The
composed surface→canonical map is broadcast once via ``ray.put``.

Sharded, resumable execution: :func:`run_kg` splits the input into hash
buckets of ``(repo, path)`` (stand-in for input-file groups at real
scale), runs the extract phase per shard, publishes a manifest entry
per completed shard, and skips completed shards on resume.  The final
global rollup+sort runs over the per-shard triple parquet.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import stable_u64
from ..stages.canonicalize import CanonicalRelabel, build_canonical_map
from ..stages.linking import EntityLinker, default_alias_dict
from ..stages.mentions import MentionScanner
from ..stages.normalize import add_sha256
from ..stages.triples import (
    doc_triples,
    explode_edges,
    explode_mentions,
    partial_graph_rollup,
)
from ..state import manifest as mf

# Default actor-pool sizing: autoscaling pools so extraction never
# starves the read/write stages; per-batch work is regex-bound CPU.
_SCAN_CONCURRENCY = (1, 8)
_BATCH_SIZE = 1024


def canonical_alias_map(alias: dict[str, str] | None = None) -> dict[str, str]:
    """Compose link + canonicalize into one surface_key → canonical map."""
    alias = alias if alias is not None else default_alias_dict()
    canon = build_canonical_map(list(alias.items()))
    keys = set(alias) | set(canon)
    return {k: canon.get(alias.get(k, k), alias.get(k, k)) for k in keys}


def extract_docs(corpus_ds, gazetteer=None, concurrency=_SCAN_CONCURRENCY):
    """corpus → per-doc nested mention/edge rows (content dropped)."""
    kwargs = {}
    if gazetteer is not None:
        kwargs["gazetteer"] = gazetteer
    return (
        corpus_ds
        .map_batches(add_sha256, batch_format="pyarrow", batch_size=_BATCH_SIZE)
        .map_batches(
            MentionScanner,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=_BATCH_SIZE,
            concurrency=concurrency,
        )
    )


def kg_datasets(corpus_ds, gazetteer=None, alias: dict[str, str] | None = None,
                concurrency=_SCAN_CONCURRENCY) -> dict:
    """Build the lazy dataset graph for all KG outputs.

    Returns dict with Datasets: ``docs`` (nested per-doc), ``mentions``
    (linked, canonical), ``triples`` (per-doc canonical triples),
    ``graph`` (global (subj,pred,obj,weight) rollup), ``lineage``.
    """
    surface_canon = canonical_alias_map(alias)
    canon_ref = ray.put(surface_canon)
    alias_ref = ray.put(alias if alias is not None else default_alias_dict())

    docs = extract_docs(corpus_ds, gazetteer, concurrency)

    mentions = (
        docs.map_batches(explode_mentions, batch_format="pyarrow")
        .map_batches(
            EntityLinker,
            fn_constructor_kwargs={"alias_ref": alias_ref},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(
            CanonicalRelabel,
            fn_constructor_kwargs={"canon_ref": canon_ref,
                                   "columns": {"kb_id": "canonical"}},
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
    )

    triples = (
        docs.map_batches(explode_edges, batch_format="pyarrow")
        .map_batches(
            CanonicalRelabel,
            fn_constructor_kwargs={
                "canon_ref": canon_ref,
                "columns": {"src": "src_canonical", "dst": "dst_canonical"},
            },
            batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .map_batches(doc_triples, batch_format="pyarrow")
    )

    graph = (
        triples.map_batches(partial_graph_rollup, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .sum("weight")
        .rename_columns({"sum(weight)": "weight"})
    )

    def lineage_rows(batch: pa.Table) -> pa.Table:
        n_mentions = pc.list_value_length(batch.column("mentions"))
        n_edges = pc.list_value_length(batch.column("edges"))
        out = batch.select(["repo", "path", "content_sha256"])
        out = out.append_column("n_mentions", n_mentions.cast(pa.int64()))
        out = out.append_column("n_edges", n_edges.cast(pa.int64()))
        return out

    lineage = docs.map_batches(lineage_rows, batch_format="pyarrow")

    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "graph": graph,
        "lineage": lineage,
        "canonical_map": surface_canon,
    }


def _shard_filter(bucket: int, num_shards: int):
    def fn(batch: pa.Table) -> pa.Table:
        repos = batch.column("repo").to_pylist()
        paths = batch.column("path").to_pylist()
        mask = [stable_u64(f"{r}\x00{p}") % num_shards == bucket
                for r, p in zip(repos, paths)]
        return batch.filter(pa.array(mask, pa.bool_()))
    return fn


def run_kg(read_corpus, out_dir: str | Path, num_shards: int = 4,
           gazetteer=None, alias: dict[str, str] | None = None,
           concurrency=_SCAN_CONCURRENCY) -> dict:
    """Sharded, resumable KG run.

    ``read_corpus`` is a zero-arg factory returning a fresh corpus
    Dataset (so each shard re-plans its own read; at real scale shards
    are disjoint input-file groups and the filter disappears).

    Layout under ``out_dir``::

        triples/shard=NNNN/*.parquet    per-doc canonical triples
        mentions/shard=NNNN/*.parquet   linked mention rows
        lineage/shard=NNNN/*.parquet    per-doc sha256 + counts
        graph/*.parquet                 global rollup (after all shards)
        triples_sorted/*.parquet        globally sorted (subj,pred,obj)
        _manifest/*.json                completed-partition records
    """
    out_dir = Path(out_dir)
    done = mf.completed_shards(out_dir, "extract")
    stats: dict = {"shards_skipped": sorted(done & set(range(num_shards)))}

    for shard in range(num_shards):
        if shard in done:
            continue
        t0 = time.perf_counter()
        corpus = read_corpus().map_batches(
            _shard_filter(shard, num_shards), batch_format="pyarrow"
        )
        parts = kg_datasets(corpus, gazetteer, alias, concurrency)
        tri_dir = out_dir / "triples" / f"shard={shard:04d}"
        men_dir = out_dir / "mentions" / f"shard={shard:04d}"
        lin_dir = out_dir / "lineage" / f"shard={shard:04d}"
        # Idempotent re-run: a crashed shard may have left partial
        # parquet behind; writes append, so clear before re-writing.
        for d in (tri_dir, men_dir, lin_dir):
            shutil.rmtree(d, ignore_errors=True)
        parts["triples"].write_parquet(str(tri_dir))
        parts["mentions"].write_parquet(str(men_dir))
        lineage = parts["lineage"].materialize()
        lineage.write_parquet(str(lin_dir))
        n_docs = lineage.count()
        mf.publish(out_dir, "extract", shard, {
            "n_docs": n_docs,
            "seconds": round(time.perf_counter() - t0, 3),
            "paths": {"triples": str(tri_dir), "mentions": str(men_dir),
                      "lineage": str(lin_dir)},
        })

    if mf.load(out_dir, "finalize", 0) is None:
        t0 = time.perf_counter()
        for d in (out_dir / "graph", out_dir / "triples_sorted"):
            shutil.rmtree(d, ignore_errors=True)
        triples = ray.data.read_parquet(str(out_dir / "triples"))
        graph = (
            triples.map_batches(partial_graph_rollup, batch_format="pyarrow")
            .groupby(["subj", "pred", "obj"])
            .sum("weight")
            .rename_columns({"sum(weight)": "weight"})
        )
        graph.write_parquet(str(out_dir / "graph"))
        ordered = triples.sort(["subj", "pred", "obj"])
        ordered.write_parquet(str(out_dir / "triples_sorted"))
        mf.publish(out_dir, "finalize", 0, {
            "seconds": round(time.perf_counter() - t0, 3),
        })

    stats["manifest"] = mf.all_entries(out_dir)
    return stats
