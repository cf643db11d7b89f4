"""Flagship pipeline: Ray-Data-native KG construction.

    read corpus (repo, path, commit, lang, content)
      → map_batches(MentionScanner, conc=N)      # fused sha256 lineage +
                                                 # per-doc graphs, one pass
      → explode mentions / edges                 # flat rows, content dropped
      → map_batches(EntityLinker, conc=N)        # broadcast alias dict
      → map_batches(CanonicalRelabel)            # union-find canonical map
      → doc_triples                              # per-doc merge, no shuffle
      → partial rollup → groupby(s,p,o).sum      # combiner + small shuffle
      → spill-at-extract sorted shards           # warmup-sampled boundaries;
                                                 # finalize = parallel merges

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

import os
import shutil
import time
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import stable_u64
from ..stages.canonicalize import build_canonical_map
from ..stages.linking import default_alias_dict, normalize_alias
from ..stages.triples import (
    doc_triples,
    explode_edges,
    explode_mentions,
    partial_graph_rollup,
)
from ..state import manifest as mf

# Default actor-pool sizing: autoscaling pools so extraction never
# starves the read/write stages; per-batch work is regex-bound CPU.
# Batches small enough that (docs / batch_size) >> pool size keeps every
# actor busy even on modest shards.
_SCAN_CONCURRENCY = (1, 64)
_BATCH_SIZE = 256


def canonical_alias_map(alias: dict[str, str] | None = None) -> dict[str, str]:
    """Compose link + canonicalize into one surface_key → canonical
    map.  User-supplied alias keys are re-keyed by the entity_key
    transform (normalize_alias) so they actually match mention rows."""
    alias = (normalize_alias(alias) if alias is not None
             else default_alias_dict())
    canon = build_canonical_map(list(alias.items()))
    keys = set(alias) | set(canon)
    return {k: canon.get(alias.get(k, k), alias.get(k, k)) for k in keys}


def extract_docs(corpus_ds, gazetteer=None, concurrency=_SCAN_CONCURRENCY,
                 scanner: str | None = None,
                 scanner_kwargs: dict | None = None):
    """corpus → per-doc nested mention/edge rows (content dropped).

    The scanner fuses the lineage sha256 into its single content pass
    (buffer-level hashing + one str materialization per doc — the scan
    is the 100-TB bandwidth hot path, so content is touched once).

    Default gazetteer → elastic task stage (regex compiled once per
    worker process); custom gazetteer or a named ``scanner`` provider →
    actor pool whose actors hold the model/compiled state in
    ``__init__``.  ``scanner`` resolves through the model-provider
    registry (``mmore_ray.models``, role ``mention_scanner``): the
    default is the gazetteer ``MentionScanner``; ``"hf-ner"`` swaps in
    a transformers token-classification model with no other pipeline
    change (the real-model seam — reference ``ner/extractor.py:36``)."""
    # honor the registry's env-var resolution on the default path too:
    # MMORE_RAY_MENTION_SCANNER=hf-ner must not silently fall through
    # to the gazetteer fast path
    scanner = scanner or os.environ.get("MMORE_RAY_MENTION_SCANNER") or None
    if gazetteer is None and scanner is None and not scanner_kwargs:
        from ..stages.mentions import scan_batch

        return corpus_ds.map_batches(scan_batch, batch_format="pyarrow",
                                     batch_size=_BATCH_SIZE)
    from ..models import provider_class

    scanner_cls = provider_class("mention_scanner", scanner)
    kwargs = dict(scanner_kwargs or {})
    if gazetteer is not None:
        import inspect as _inspect

        sig = _inspect.signature(scanner_cls.__init__).parameters
        if "gazetteer" not in sig or "gazetteer" in kwargs:
            raise ValueError(
                "gazetteer= requires a gazetteer-capable scanner provider; "
                f"resolved {scanner_cls.__name__} — dropping the gazetteer "
                "silently would change extraction semantics")
        kwargs["gazetteer"] = gazetteer
    return corpus_ds.map_batches(
        scanner_cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=_BATCH_SIZE,
        concurrency=concurrency,
    )


#: per-worker-process memo for broadcast dicts: ray.get of a local ref
#: avoids a network fetch but still UNPICKLES the whole dict on every
#: call — at 10⁵–10⁶ alias surfaces that is multi-MB of deserialization
#: per 8192-row batch on the hot path.  Keyed by ref hex; a run holds
#: 2 refs, so the cap just bounds pathological many-run workers.
_REF_CACHE: dict[str, object] = {}


def _cached_get(ref):
    key = ref.hex()
    v = _REF_CACHE.get(key)
    if v is None:
        if len(_REF_CACHE) > 16:
            _REF_CACHE.clear()
        v = ray.get(ref)
        _REF_CACHE[key] = v
    return v


def _link_mentions_fn(batch: pa.Table, alias_ref, canon_ref) -> pa.Table:
    """Fused link + canonicalize over exploded mention rows.

    Stateless task stage: the alias dict / canonical map are broadcast
    once via ``ray.put`` and fetched through the per-process memo
    (:data:`_REF_CACHE`) — one deserialization per worker, not one per
    batch."""
    import pandas as pd

    from ..stages.linking import trigram_jaccard

    alias = _cached_get(alias_ref)
    canon = _cached_get(canon_ref)
    batch = explode_mentions(batch)
    keys = pd.Series(batch.column("entity_key").to_pandas())
    # vectorized per distinct key: map through small lookup frames
    uniq = keys.drop_duplicates()
    kb_u = uniq.map(lambda k: alias.get(k, k))
    canon_u = uniq.map(lambda k: canon.get(k, k))
    score_u = pd.Series(
        [trigram_jaccard(k, v) for k, v in zip(uniq, kb_u)], index=uniq.index)
    lut = pd.DataFrame({"kb_id": kb_u.to_numpy(),
                        "canonical": canon_u.to_numpy(),
                        "link_score": score_u.to_numpy()},
                       index=uniq.to_numpy())
    joined = lut.reindex(keys.to_numpy())
    batch = batch.append_column("kb_id", pa.array(joined["kb_id"], pa.string()))
    batch = batch.append_column(
        "link_score", pa.array(joined["link_score"], pa.float64()))
    return batch.append_column(
        "canonical", pa.array(joined["canonical"], pa.string()))


def _doc_triples_fn(batch: pa.Table, canon_ref) -> pa.Table:
    """Fused explode-edges + canonical relabel + per-doc triple merge."""
    import pandas as pd

    canon = _cached_get(canon_ref)
    batch = explode_edges(batch)
    for col, out in (("src", "src_canonical"), ("dst", "dst_canonical")):
        s = batch.column(col).to_pandas()
        m = s.map(canon)  # one dict-map pass; identity fallback below
        batch = batch.append_column(
            out, pa.array(m.where(m.notna(), s), pa.string()))
    return doc_triples(batch)


def kg_datasets(corpus_ds, gazetteer=None, alias: dict[str, str] | None = None,
                concurrency=_SCAN_CONCURRENCY, docs=None) -> dict:
    """Build the lazy dataset graph for all KG outputs.

    Returns dict with Datasets: ``docs`` (nested per-doc), ``mentions``
    (linked, canonical), ``triples`` (per-doc canonical triples),
    ``graph`` (global (subj,pred,obj,weight) rollup), ``lineage``.

    ``docs`` may be passed in pre-materialized (run_kg does, so the
    extraction executes once per shard instead of once per output).
    """
    surface_canon = canonical_alias_map(alias)
    canon_ref = ray.put(surface_canon)
    alias_ref = ray.put(normalize_alias(alias) if alias is not None
                        else default_alias_dict())

    if docs is None:
        docs = extract_docs(corpus_ds, gazetteer, concurrency)

    mentions = docs.map_batches(
        _link_mentions_fn,
        fn_kwargs={"alias_ref": alias_ref, "canon_ref": canon_ref},
        batch_format="pyarrow",
    )

    triples = docs.map_batches(
        _doc_triples_fn,
        fn_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
    )

    graph = (
        triples.map_batches(partial_graph_rollup, batch_format="pyarrow")
        .groupby(["subj", "pred", "obj"])
        .sum("weight")
        .rename_columns({"sum(weight)": "weight"})
    )

    lineage = docs.map_batches(lineage_rows, batch_format="pyarrow")

    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "graph": graph,
        "lineage": lineage,
        "canonical_map": surface_canon,
    }


def lineage_rows(batch: pa.Table) -> pa.Table:
    """Per-doc lineage record: sha256 invariant + output counts."""
    n_mentions = pc.list_value_length(batch.column("mentions"))
    n_edges = pc.list_value_length(batch.column("edges"))
    out = batch.select(["repo", "path", "content_sha256"])
    out = out.append_column("n_mentions", n_mentions.cast(pa.int64()))
    out = out.append_column("n_edges", n_edges.cast(pa.int64()))
    return out


def _shard_filter(bucket: int, num_shards: int):
    """Hash-carve one shard out of the full corpus (the zero-arg-factory
    fallback; the sharded factory never pays this).  The key join runs
    in the Arrow C++ kernel and the per-row sha1 hashes memoryview
    slices of the utf-8 buffer — no to_pylist / f-string per row; the
    values equal ``stable_u64(f"{repo}\\x00{path}")`` exactly, so
    existing shard layouts resume compatibly."""
    from ..functions.hashing import stable_u64_of_string_array

    def fn(batch: pa.Table) -> pa.Table:
        keys = pc.binary_join_element_wise(
            batch.column("repo").cast(pa.string()),
            batch.column("path").cast(pa.string()), "\x00")
        h = stable_u64_of_string_array(keys)
        return batch.filter(pa.array(h % num_shards == bucket))
    return fn


def _config_digest(gazetteer, alias) -> str:
    """Digest of every parameter that changes EXTRACTION SEMANTICS —
    gazetteer entries, alias dict, scanner provider.  Resuming an
    out_dir under a different digest would silently mix extraction
    semantics across shards (completed shards keep the old gazetteer's
    mentions, new shards get the new one's), so resume refuses on
    mismatch — same corruption class as the num_shards guard."""
    import hashlib

    h = hashlib.sha256()
    if gazetteer is None:
        h.update(b"default-gazetteer")
    else:
        for s, t, k in sorted(gazetteer):
            h.update(f"{s}\t{t}\t{k}\n".encode())
    h.update(b"|alias|")
    src = normalize_alias(alias) if alias is not None else default_alias_dict()
    for k in sorted(src):
        h.update(f"{k}\t{src[k]}\n".encode())
    h.update(b"|scanner|")
    h.update(os.environ.get("MMORE_RAY_MENTION_SCANNER", "").encode())
    return h.hexdigest()


def run_kg(read_corpus, out_dir: str | Path, num_shards: int = 4,
           gazetteer=None, alias: dict[str, str] | None = None,
           concurrency=_SCAN_CONCURRENCY, max_concurrent_shards: int = 2,
           num_sorted_partitions: int = 32, warm_docs: int = 20_000,
           tee_batch_size: int = 8_192) -> dict:
    """Sharded, resumable KG run.

    ``read_corpus`` is a factory returning a fresh corpus Dataset:
    either zero-arg (the whole corpus; a hash filter on (repo, path)
    carves out each shard — fallback), or ``(shard, num_shards)``-arg
    (the factory builds only that shard's rows — preferred, since at
    real scale shards are disjoint input-file groups and nothing is
    read twice).

    Shards are independent jobs sharing the cluster; up to
    ``max_concurrent_shards`` execute concurrently (driver threads —
    the sandbox stand-in for concurrently submitted per-shard jobs),
    which overlaps one shard's write barrier with the next one's scan.

    Layout under ``out_dir``::

        triples/shard=NNNN/*.parquet    per-doc canonical triples
        mentions/shard=NNNN/*.parquet   linked mention rows
        lineage/shard=NNNN/*.parquet    per-doc sha256 + counts
        graph/*.parquet                 global rollup (after all shards)
        triples_sorted/*.parquet        globally sorted (subj,pred,obj)
        _manifest/*.json                completed-partition records
    """
    import inspect
    from concurrent.futures import ThreadPoolExecutor

    out_dir = Path(out_dir)
    done = mf.completed_shards(out_dir, "extract")
    stats: dict = {"shards_skipped": sorted(done & set(range(num_shards)))}

    sharded_factory = len(inspect.signature(read_corpus).parameters) >= 2

    def shard_corpus(shard: int):
        if sharded_factory:
            return read_corpus(shard, num_shards)
        return read_corpus().map_batches(
            _shard_filter(shard, num_shards), batch_format="pyarrow"
        )

    import json

    import numpy as np

    from ..stages.sortwrite import bucket_spill, compute_boundaries

    surface_canon = canonical_alias_map(alias)
    canon_ref = ray.put(surface_canon)
    alias_ref = ray.put(normalize_alias(alias) if alias is not None
                        else default_alias_dict())

    # Sorted-write partition boundaries, fixed BEFORE the main pass by a
    # cheap warmup scan (sample-then-range-partition, TeraSort-style):
    # the tee then spills every triple batch directly into its FINAL
    # output partition, so finalize is a pure per-partition merge — no
    # data-sized serial pass, no read amplification.  compute_boundaries
    # only uses count *proportions*, so a sample suffices; skewed hot
    # keys still get split within-key by sha because the sample sees
    # their relative mass.  Boundaries persist write-once in the
    # manifest dir: resumed runs MUST reuse them (completed shards'
    # spill dirs are laid out by them).  Sample bias only affects
    # partition balance, never correctness.
    def _key_counts_kernel(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["subj", "pred", "obj"]).aggregate(
            [("weight", "count")])
        # select by NAME — pyarrow versions disagree on whether group
        # keys or aggregates come first in the output column order
        return pa.table({"subj": g.column("subj"), "pred": g.column("pred"),
                         "obj": g.column("obj"),
                         "n": g.column("weight_count")})

    config = _config_digest(gazetteer, alias)
    bounds_file = out_dir / mf.MANIFEST_DIR / "sort_bounds.json"
    if bounds_file.exists():
        raw = json.loads(bounds_file.read_text())
        # legacy format (bare bounds list, written before the
        # num_shards guard existed): those runs had no guard at all,
        # so resuming with the caller's values preserves the old
        # behavior while upgrading the file in place
        saved = {"num_shards": num_shards, "bounds": raw} \
            if isinstance(raw, list) else raw
        # resuming with a different shard count would re-partition the
        # corpus by a different hash modulus: docs already in completed
        # shards would be extracted AGAIN into new shards and finalize
        # would merge them twice — refuse instead
        if saved["num_shards"] != num_shards:
            raise ValueError(
                f"resume with num_shards={num_shards} but this output dir "
                f"was started with num_shards={saved['num_shards']}; reuse "
                "the original value or start a fresh out_dir")
        # extraction-semantics guard: a resume under a different
        # gazetteer / alias dict / scanner provider would mix
        # semantics across shards (see _config_digest)
        if saved.get("config", config) != config:
            raise ValueError(
                "resume with a different extraction config (gazetteer / "
                "alias / scanner) than this output dir was started with; "
                "re-run with the original config or start a fresh out_dir")
        if "config" not in saved:  # stamp pre-guard files in place
            saved["config"] = config
            tmp = bounds_file.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(saved))
            os.replace(tmp, bounds_file)
        bounds = np.array(saved["bounds"], dtype=object)
    else:
        # warmup sample: shard 0 first, falling back to later shards —
        # an empty shard-0 file group would yield zero boundaries and
        # collapse the ENTIRE sorted write into one merge partition
        parts: list = []
        for warm_shard in range(num_shards):
            warm = extract_docs(shard_corpus(warm_shard).limit(warm_docs),
                                gazetteer, concurrency)
            rollup = warm.map_batches(
                _doc_triples_fn, fn_kwargs={"canon_ref": canon_ref},
                batch_format="pyarrow",
            ).map_batches(_key_counts_kernel, batch_format="pyarrow")
            parts = rollup.take_all()  # vocabulary-bounded: tiny
            if parts:
                break
        agg: dict[tuple[str, str, str], float] = {}
        for r in parts:
            k = (r["subj"], r["pred"], r["obj"])
            agg[k] = agg.get(k, 0.0) + float(r["n"])
        bounds = np.array(
            compute_boundaries(list(agg.items()), num_sorted_partitions),
            dtype=object)
        bounds_file.parent.mkdir(parents=True, exist_ok=True)
        # atomic publish (tmp + replace, like mf.publish): a crash
        # mid-write must not leave truncated JSON that bricks resume
        tmp = bounds_file.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(
            {"num_shards": num_shards, "bounds": list(bounds),
             "config": config}))
        os.replace(tmp, bounds_file)
    n_sorted_parts = len(bounds) + 1

    def run_shard(shard: int) -> None:
        """Phase 1 (per shard, resumable): ONE streaming execution that
        scans and tees every per-doc output.

        docs → mentions → triples are all per-document derivations (no
        shuffle), so a single map chain computes them from each batch
        and writes docs/mentions/triples parquet as side outputs; the
        lineage rows are the terminal sink.  Side-output files are named
        by a content digest of the batch, so a retried task overwrites
        its own file instead of duplicating it."""
        t0 = time.perf_counter()
        dirs = {name: out_dir / name / f"shard={shard:04d}"
                for name in ("docs", "mentions", "triples", "lineage",
                             "_rollup")}
        # Idempotent re-run: a crashed shard may have left partial
        # parquet behind; writes append, so clear before re-writing.
        for d in dirs.values():
            shutil.rmtree(d, ignore_errors=True)
            d.mkdir(parents=True, exist_ok=True)
        paths = {k: str(v) for k, v in dirs.items()}

        def tee(batch: pa.Table, alias_ref=alias_ref, canon_ref=canon_ref,
                paths=paths) -> pa.Table:
            import pyarrow.parquet as pq

            from ..stages.sortwrite import _batch_tag

            # Collision-proof, retry-idempotent file tag: digest of the
            # FULL batch content (every column — two checkouts of the
            # same unchanged file differ only in `commit`, which a
            # key-column digest would miss) — a retried task rewrites
            # its own file; two distinct batches can never collide.
            tag = _batch_tag(batch)
            pq.write_table(batch, f"{paths['docs']}/part-{tag}.parquet")
            mentions = _link_mentions_fn(batch, alias_ref, canon_ref)
            pq.write_table(mentions, f"{paths['mentions']}/part-{tag}.parquet")
            triples = _doc_triples_fn(batch, canon_ref)
            # pre-partitioned by FINAL sorted-output partition (b=BBBBB
            # subdirs): the union of bucket files IS the per-shard
            # triple table, and the finalize merge reads each output
            # partition's rows exactly once
            bucket_spill(triples, bounds, paths["triples"], tag)
            # per-batch PARTIAL graph rollup (vocabulary-bounded, tiny):
            # finalize combines these driver-side instead of re-reading
            # and shuffling the full triple set — the global rollup costs
            # one extra tiny write per batch and zero extra passes
            g = triples.group_by(["subj", "pred", "obj"]).aggregate(
                [("weight", "sum"), ("weight", "count")])
            part = pa.table({
                "subj": g.column("subj"), "pred": g.column("pred"),
                "obj": g.column("obj"),
                "weight": g.column("weight_sum"),
                "n_rows": g.column("weight_count").cast(pa.int64()),
            })
            pq.write_table(part, f"{paths['_rollup']}/part-{tag}.parquet")
            return lineage_rows(batch)

        # tee batch size bounds the spill fan-out: each tee batch writes
        # ≤ num_sorted_partitions bucket files, so spill-file count (and
        # finalize's per-partition open fan-in) scales 1/batch_size.
        # NOT larger: scan+tee fuse into one operator, so this is also
        # the scan task grain — 8192 keeps ≥ ~20 tasks per shard for
        # load balance (16384 measured SLOWER end-to-end: 12 tasks on 8
        # effective CPUs leaves a second-wave tail)
        lineage = (
            extract_docs(shard_corpus(shard), gazetteer, concurrency)
            .map_batches(tee, batch_format="pyarrow",
                         batch_size=tee_batch_size)
        )
        lineage.write_parquet(paths["lineage"])
        # per-partition metrics from the lineage parquet (north rule:
        # lineage + metrics per partition)
        import pyarrow.parquet as pq

        n_docs = n_mentions = n_edges = 0
        for f in sorted(Path(paths["lineage"]).rglob("*.parquet")):
            t = pq.read_table(f, columns=["n_mentions", "n_edges"])
            n_docs += t.num_rows
            n_mentions += pc.sum(t.column("n_mentions")).as_py() or 0
            n_edges += pc.sum(t.column("n_edges")).as_py() or 0
        # Consolidate this shard's per-batch rollup partials into ONE
        # file before publishing: the partials are one-per-tee-batch,
        # which at corpus scale is millions of tiny files — after this,
        # finalize reads num_shards files, independent of corpus size.
        # (Runs before the manifest publish, so a crash re-runs the
        # shard and the rmtree at the top clears half-consolidated
        # state; the combine is vocabulary-bounded, hence tiny.)
        partial_files = sorted(Path(paths["_rollup"]).rglob("*.parquet"))
        if partial_files:  # an empty shard has no partials — still
            # publishes its (zero-count) manifest below
            g = (
                pa.concat_tables([pq.read_table(f) for f in partial_files])
                .group_by(["subj", "pred", "obj"])
                .aggregate([("weight", "sum"), ("n_rows", "sum")])
            )
            combined = pa.table({
                "subj": g.column("subj"), "pred": g.column("pred"),
                "obj": g.column("obj"), "weight": g.column("weight_sum"),
                "n_rows": g.column("n_rows_sum"),
            })
            pq.write_table(combined,
                           Path(paths["_rollup"]) / "_combined.parquet")
            for f in partial_files:
                f.unlink()
        mf.publish(out_dir, "extract", shard, {
            "n_docs": n_docs,
            "n_mentions": n_mentions,
            "n_edges": n_edges,
            "seconds": round(time.perf_counter() - t0, 3),
            "paths": paths,
        })

    todo = [s for s in range(num_shards) if s not in done]
    if todo:
        # the finalize phase aggregates over every shard — any re-run
        # extract invalidates it
        (out_dir / mf.MANIFEST_DIR / "finalize_00000.json").unlink(missing_ok=True)
        with ThreadPoolExecutor(max_workers=max(1, max_concurrent_shards)) as pool:
            for fut in [pool.submit(run_shard, s) for s in todo]:
                fut.result()

    if mf.load(out_dir, "finalize", 0) is None:
        # Phase 3: global graph rollup + globally sorted triple shards.
        # The rollup is combined DRIVER-SIDE from the per-batch partial
        # rollups the extract phase side-wrote (vocabulary-bounded, so
        # the combine is tiny) — finalize never re-reads or shuffles the
        # full triple set for it.  The rollup IS the exact key
        # distribution, so the sorted write range-partitions on known
        # boundaries instead of sampling, and because the tee already
        # spilled triples pre-partitioned by subj range, finalize is
        # just N parallel range merges — no data-sized serial pass
        # remains (stages/sortwrite.py; Dataset.sort measured ~4x
        # slower, and the previous read+spill+merge finalize was ~40%
        # of wall time at 32 CPUs — the Amdahl term of the scaling
        # criterion).
        import pyarrow.parquet as _pq

        from ..stages.sortwrite import merge_sorted_spills

        t0 = time.perf_counter()
        for d in (out_dir / "graph", out_dir / "triples_sorted"):
            shutil.rmtree(d, ignore_errors=True)

        partials = [_pq.read_table(f)
                    for f in sorted((out_dir / "_rollup").rglob("*.parquet"))]
        if partials:
            rolled = (
                pa.concat_tables(partials)
                .group_by(["subj", "pred", "obj"])
                .aggregate([("weight", "sum"), ("n_rows", "sum")])
            )
            graph = pa.table({
                "subj": rolled.column("subj"),
                "pred": rolled.column("pred"),
                "obj": rolled.column("obj"),
                "weight": rolled.column("weight_sum"),
            })
        else:  # every shard was empty: a schema-correct empty graph
            graph = pa.table({
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "weight": pa.array([], pa.float64()),
            })
        graph_dir = out_dir / "graph"
        graph_dir.mkdir(parents=True, exist_ok=True)
        _pq.write_table(graph, graph_dir / "part-00000.parquet")
        spill_roots = sorted((out_dir / "triples").glob("shard=*"))
        merge_sorted_spills(spill_roots, n_sorted_parts,
                            out_dir / "triples_sorted")
        mf.publish(out_dir, "finalize", 0, {
            "seconds": round(time.perf_counter() - t0, 3),
        })

    stats["manifest"] = mf.all_entries(out_dir)
    return stats
