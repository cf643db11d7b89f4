#!/usr/bin/env python
"""KG-construction job entrypoint — submit with::

    ray job submit --working-dir . -- python scripts/run_kg.py \
        --input /data/corpus_parquet --out /data/kg_out --shards 64

In this sandbox (single node) it runs the same job under a local
session.  The input is any parquet with the north-rule corpus schema
(repo, path, commit, lang, content); ``--from-documents`` derives the
corpus from a documents-style table instead.  Resumable: re-submit with
the same --out and completed shards are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# invoked as `python scripts/run_kg.py` → sys.path[0] is scripts/, not
# the repo root where mmore_ray lives
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet file/dir")
    ap.add_argument("--out", required=True, help="output root")
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--concurrent-shards", type=int, default=2)
    ap.add_argument("--from-documents", action="store_true",
                    help="input is a (doc_id, text) documents table; "
                         "derive the corpus deterministically")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="local-mode CPU count (omit on a real cluster)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="sorted-output partition count (default: derived "
                         "from the warmup byte estimate, floor 32)")
    ap.add_argument("--corpus-docs", type=int, default=None,
                    help="known total doc count — skips the shard "
                         "row-count probe when deriving partitions")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kwargs = {"include_dashboard": False, "ignore_reinit_error": True}
        if args.num_cpus:
            kwargs.update(address="local", num_cpus=args.num_cpus)
        ray.init(**kwargs)
    ray.data.DataContext.get_current().enable_progress_bars = False

    from mmore_ray.pipelines.kg import run_kg
    from mmore_ray.sources.corpus import derive_corpus_batch
    from mmore_ray.sources.readers import read_parquet_clean

    def _derive(ds):
        if args.from_documents:
            ds = ds.map_batches(derive_corpus_batch, batch_format="pyarrow")
        return ds

    # SHARDED factory whenever the input has enough parquet files:
    # each shard reads ONLY its file group.  The fallback (hash-filter
    # over a full read) re-scans the whole input once PER SHARD —
    # num_shards× read amplification, fine for small runs, wrong at
    # corpus scale.  File-group assignment is deterministic for a
    # fixed listing, so resume skips stay valid.
    import glob

    p = args.input
    files = sorted(glob.glob(os.path.join(p, "**", "*.parquet"),
                             recursive=True)) if os.path.isdir(p) else [p]
    if len(files) >= args.shards:
        # shard↔file-group assignment must be FROZEN across resumes: a
        # file added/removed between runs would shift every group, so
        # completed-shard manifests would cover different files than
        # they claim (docs skipped or double-extracted).  Persist the
        # listing write-once next to the manifests and refuse on drift.
        listing_file = os.path.join(args.out, "_manifest",
                                    "input_files.json")
        if os.path.exists(listing_file):
            with open(listing_file) as f:
                saved = json.load(f)
            if saved != files:
                raise SystemExit(
                    "input file listing changed since this out dir was "
                    f"started ({len(saved)} -> {len(files)} files); "
                    "resume with the original input or a fresh --out")
        else:
            os.makedirs(os.path.dirname(listing_file), exist_ok=True)
            tmp = listing_file + ".tmp"
            with open(tmp, "w") as f:
                json.dump(files, f)
            os.replace(tmp, listing_file)

        def read_corpus(shard: int, num_shards: int):
            return _derive(read_parquet_clean(files[shard::num_shards]))
    else:
        def read_corpus():  # type: ignore[misc]
            return _derive(read_parquet_clean(p))

    stats = run_kg(read_corpus, args.out, num_shards=args.shards,
                   max_concurrent_shards=args.concurrent_shards,
                   num_sorted_partitions=args.partitions,
                   corpus_docs=args.corpus_docs)
    print(json.dumps({"skipped": stats["shards_skipped"],
                      "manifest_entries": len(stats["manifest"])}))
    ray.shutdown()


if __name__ == "__main__":
    main()
