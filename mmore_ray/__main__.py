"""`python -m mmore_ray` — the CLI surface (≙ the reference's
``mmore`` click group, ``src/mmore/cli.py:12``: process / postprocess /
index / retrieve, plus the engine-native kg and curate jobs).

The CLI owns the Ray session (driver-embedded `entry()`/`queries()`
never init Ray; scripts do, guarded).  Every subcommand prints ONE JSON
line so runs compose in shell pipelines.
"""

from __future__ import annotations

import argparse
import json
import sys


from mmore_ray.sources.readers import read_parquet_clean


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_process(args) -> dict:
    from .config import run_from_config

    return run_from_config(args.config, args.out)


def cmd_kg(args) -> dict:
    ray = _ray()
    from .pipelines.kg import run_kg
    from .sources.corpus import derive_corpus_batch

    def read_corpus():
        ds = read_parquet_clean(args.input)
        if args.from_documents:
            ds = ds.map_batches(derive_corpus_batch, batch_format="pyarrow")
        return ds

    stats = run_kg(read_corpus, args.out, num_shards=args.shards)
    return {"out": args.out,
            "shards_skipped": stats["shards_skipped"],
            "steps": [f"{e['step']}:{e['shard']}" for e in stats["manifest"]]}


def cmd_curate(args) -> dict:
    ray = _ray()
    from .pipelines.curate import curate

    ds = read_parquet_clean(args.input)
    clean = curate(ds, min_words=args.min_words, lang=args.lang)
    clean.write_parquet(args.out)
    import pyarrow.parquet as pq
    from pathlib import Path

    n = sum(pq.ParquetFile(f).metadata.num_rows
            for f in Path(args.out).rglob("*.parquet"))
    return {"out": args.out, "survivors": n}


def cmd_index(args) -> dict:
    ray = _ray()
    from .stages.embed import index_documents

    ds = read_parquet_clean(args.input)
    index_documents(ds, args.out)
    return {"out": args.out, "indexed": ds.count()}


def cmd_retrieve(args) -> dict:
    _ray()
    from .stages.embed import retrieve

    hits = retrieve(args.collection, args.query, k=args.k,
                    rerank=args.rerank).to_pandas()
    return {"query": args.query,
            "hits": hits.to_dict(orient="records")}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="mmore_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("process", help="crawl+process+postprocess via YAML")
    sp.add_argument("--config", required=True)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_process)

    sk = sub.add_parser("kg", help="KG construction over a parquet corpus")
    sk.add_argument("--input", required=True)
    sk.add_argument("--out", required=True)
    sk.add_argument("--shards", type=int, default=4)
    sk.add_argument("--from-documents", action="store_true",
                    help="derive the corpus from a documents-style table")
    sk.set_defaults(fn=cmd_kg)

    sc = sub.add_parser("curate", help="quality/lang/dedup curation ladder")
    sc.add_argument("--input", required=True)
    sc.add_argument("--out", required=True)
    sc.add_argument("--min-words", type=int, default=20)
    sc.add_argument("--lang", default="en")
    sc.set_defaults(fn=cmd_curate)

    si = sub.add_parser("index", help="embed + write a parquet collection")
    si.add_argument("--input", required=True)
    si.add_argument("--out", required=True)
    si.set_defaults(fn=cmd_index)

    sr = sub.add_parser("retrieve", help="hybrid retrieval over a collection")
    sr.add_argument("--collection", required=True)
    sr.add_argument("--query", required=True)
    sr.add_argument("-k", type=int, default=5)
    sr.add_argument("--rerank", action="store_true")
    sr.set_defaults(fn=cmd_retrieve)

    args = p.parse_args(argv)
    if args.cmd == "process":
        _ray()  # config path builds its own datasets
    result = args.fn(args)
    print(json.dumps(result))
    import ray

    if ray.is_initialized():
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
