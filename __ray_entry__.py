"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init(...)`` itself BEFORE importing this module;
nothing here (nor in mmore_ray library code) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``       — flagship KG pipeline on /root/testdata/sf0.001.
- ``queries()``     — one entry per implemented operator/pipeline
                      (SURVEY.md §2), each ``fn(sf_dir) -> Dataset``.
- ``oracle_sql()``  — DuckDB-equivalent SQL per query (same column
                      names; order-insensitive value parity verified in
                      tests/test_queries_oracle.py).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG pipeline: derive the source-code corpus from the
    sf0.001 documents table, extract/link/canonicalize, return the
    per-doc canonical triples Dataset."""
    import ray.data

    from mmore_ray.pipelines.kg import kg_datasets
    from mmore_ray.sources.corpus import derive_corpus_batch

    from mmore_ray.sources.readers import read_parquet_clean
    corpus = read_parquet_clean(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(derive_corpus_batch, batch_format="pyarrow")
    return kg_datasets(corpus)["triples"]


def queries() -> dict[str, Callable[[str], Any]]:
    from mmore_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from mmore_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
