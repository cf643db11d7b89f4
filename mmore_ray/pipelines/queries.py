"""Driver-checked query suite.

One function per implemented operator/pipeline (SURVEY.md §2), each
taking ``sf_dir`` and returning a Ray ``Dataset`` whose rows match the
DuckDB oracle SQL in :data:`ORACLES` value-for-value at sf=0.01.

Numeric parity rule: floating-point aggregates do not hash stably
across engines (summation order), so every money/value aggregate is
integerized FIRST via the shared rounding ``floor(x * scale + 0.5) →
int64`` and summed exactly; column names carry the scale suffix
(``_cents``, ``_e4``).  Weights in the KG outputs are exact small
counts, kept as double.

Scale notes per query are in the docstrings; the common patterns:
  * partial (combiner) aggregation inside ``map_batches`` before every
    ``groupby`` shuffle;
  * broadcast joins for dimension tables (``ray.put`` once);
  * ``Dataset.join`` (hash-partitioned) when both sides are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..sources.corpus import CO_OCCURS_PRED, corpus_sql, gazetteer_sql
from .kg import kg_datasets


def _read(sf_dir: str, name: str, columns: list[str] | None = None):
    from mmore_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# the shared cross-engine parity kernels (functions/numeric.py holds
# the ONE copy of the rounding / epoch-µs expressions the oracles
# mirror; an inline re-implementation here is a parity drift risk)
from ..functions.numeric import int_scale as _int_scale  # noqa: E402
from ..functions.numeric import to_us as _to_us  # noqa: E402


def _sql_scale(expr: str, scale: int) -> str:
    return f"CAST(floor(({expr}) * {scale} + 0.5) AS BIGINT)"


def _sql_sum(expr: str, scale: int) -> str:
    """sum of the integerized expression, cast back to BIGINT.

    DuckDB ``sum(BIGINT)`` returns HUGEINT, which pandas renders as
    float64 — the driver's value hash then sees ``150.0`` vs the
    engine's int64 ``150``.  Casting the sum keeps both sides int64.
    """
    return f"CAST(sum({_sql_scale(expr, scale)}) AS BIGINT)"


# All grouped sums go through stages.groupby.bucketed_sum: Ray's native
# aggregate costs Python-level work per distinct group (measured 147k
# groups → ~70-150 s vs ~3 s bucketed at sf0.1), and aggregates over
# pandas-format blocks hit an additional slow path.


# ---------------------------------------------------------------------------
# KG pipeline queries (corpus derived from the documents table)
# ---------------------------------------------------------------------------

def _corpus_ds(sf_dir: str):
    from ..sources.corpus import derive_corpus_batch

    return _read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        derive_corpus_batch, batch_format="pyarrow"
    )


def kg_corpus(sf_dir: str):
    """North-rule input table + sha256 lineage column."""
    from ..stages.normalize import add_sha256

    return _corpus_ds(sf_dir).map_batches(add_sha256, batch_format="pyarrow")


def kg_mentions(sf_dir: str):
    ds = kg_datasets(_corpus_ds(sf_dir))["mentions"]
    return ds.select_columns(
        ["repo", "path", "content_sha256", "surface", "entity_key",
         "entity_type", "n_occ", "first_pos", "kb_id", "canonical"]
    )


def kg_triples(sf_dir: str):
    ds = kg_datasets(_corpus_ds(sf_dir))["triples"]
    return ds.select_columns(
        ["repo", "path", "content_sha256", "subj", "pred", "obj", "weight"]
    )


def kg_graph(sf_dir: str):
    return kg_datasets(_corpus_ds(sf_dir))["graph"]


def kg_lineage(sf_dir: str):
    return kg_datasets(_corpus_ds(sf_dir))["lineage"]


from ..stages.mentions import MentionScanner as _MS  # noqa: E402

MAX_CLIQUE = _MS.DEFAULT_MAX_CLIQUE

_KG_CTES = f"""WITH corpus AS ({{corpus}}),
corpus_h AS (SELECT *, sha256(content) AS content_sha256 FROM corpus),
mention AS (
  SELECT c.repo, c.path, c.content_sha256,
         g.surface,
         upper(g.surface) AS entity_key,
         g.entity_type,
         (length(c.content) - length(replace(c.content, g.surface, ''))) // length(g.surface) AS n_occ,
         CAST(strpos(c.content, g.surface) AS BIGINT) AS first_pos,
         g.kb_id,
         g.kb_id AS canonical
  FROM corpus_h c JOIN {gazetteer_sql()} ON contains(c.content, g.surface)
),
mention_rn AS (
  -- clique-cap mirror (MentionScanner.DEFAULT_MAX_CLIQUE): edges only
  -- among each doc's first {MAX_CLIQUE} surfaces by first occurrence
  SELECT *, row_number() OVER (PARTITION BY content_sha256
                               ORDER BY first_pos) AS rn
  FROM mention
),
doc_edge AS (
  SELECT m1.repo, m1.path, m1.content_sha256,
         least(m1.canonical, m2.canonical) AS subj,
         '{CO_OCCURS_PRED}' AS pred,
         greatest(m1.canonical, m2.canonical) AS obj
  FROM mention_rn m1 JOIN mention_rn m2
    ON m1.content_sha256 = m2.content_sha256 AND m1.surface < m2.surface
  WHERE m1.rn <= {MAX_CLIQUE} AND m2.rn <= {MAX_CLIQUE}
),
doc_triple AS (
  SELECT repo, path, content_sha256, subj, pred, obj,
         CAST(count(*) AS DOUBLE) AS weight
  FROM doc_edge GROUP BY ALL
)
"""


def _kg_sql(tail: str) -> str:
    return _KG_CTES.format(corpus=corpus_sql()) + tail


# ---------------------------------------------------------------------------
# Relational queries over the TPC-H-ish tables
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "2000-01-01"


def q1_pricing(sf_dir: str):
    """TPC-H-Q1-style pricing summary (filter → bucketed combiner)."""
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pd.Timestamp(_Q1_CUTOFF)

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df.l_shipdate <= cutoff]
        return pd.DataFrame({
            "l_returnflag": df.l_returnflag,
            "l_linestatus": df.l_linestatus,
            "sum_qty": _int_scale(df.l_quantity, 1),
            "sum_base_cents": _int_scale(df.l_extendedprice, 100),
            "sum_disc_e4": _int_scale(df.l_extendedprice * (1 - df.l_discount), 10_000),
            "count_order": np.ones(len(df), dtype=np.int64),
        })

    return bucketed_sum(ds, ["l_returnflag", "l_linestatus"],
                        ["sum_qty", "sum_base_cents", "sum_disc_e4", "count_order"],
                        prepare=prepare, num_buckets=8)


def q3_top_orders(sf_dir: str):
    """Top-10 orders by lineitem revenue — combiner + hash-shuffle
    ``Dataset.join`` against orders, then sort+limit (both sides scale;
    no driver materialization before the limit)."""
    from ..stages.groupby import bucketed_sum, topk

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df.l_orderkey,
            "revenue_e4": _int_scale(df.l_extendedprice * (1 - df.l_discount), 10_000),
        })

    rev = bucketed_sum(li, ["l_orderkey"], ["revenue_e4"], prepare=prepare)
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    # adaptive: broadcast at bench scale, hash join beyond the limit
    from ..stages.joins import lookup_join

    joined = lookup_join(rev, orders, "l_orderkey", "o_orderkey")
    # the join keeps the LEFT key name; restore the orders-side name
    # (pandas-safe rename: Dataset.rename_columns assumes Arrow blocks)
    joined = joined.map_batches(
        lambda df: df.rename(columns={"l_orderkey": "o_orderkey"})[
            ["o_orderkey", "o_custkey", "revenue_e4"]],
        batch_format="pandas")
    return topk(joined, ["revenue_e4", "o_orderkey"], 10, descending=[True, False])


def q_nation_revenue(sf_dir: str):
    """Revenue per customer nation.  Customer is FACT-scale (1.5M
    rows/SF — a driver broadcast would OOM at the 100-TB target), so:
    combiner pre-agg of orders per custkey → hash-shuffle
    ``Dataset.join`` against customer → broadcast only the 25-row
    nation map → small final rollup."""
    from ..stages.groupby import bucketed_sum

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def per_cust(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df.o_custkey,
            "revenue_cents": _int_scale(df.o_totalprice, 100),
            "n_orders": np.ones(len(df), dtype=np.int64),
        })

    rev = bucketed_sum(orders, ["o_custkey"], ["revenue_cents", "n_orders"],
                       prepare=per_cust, num_buckets=32)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    # adaptive: broadcast at bench scale, hash join beyond the limit
    from ..stages.joins import lookup_join

    joined = lookup_join(rev, cust, "o_custkey", "c_custkey")

    nation_tbl = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    n2name_ref = ray.put(dict(zip(nation_tbl.n_nationkey, nation_tbl.n_name)))

    def to_nation(df: pd.DataFrame) -> pd.DataFrame:
        n2name = ray.get(n2name_ref)  # local object-store fetch
        return pd.DataFrame({
            "n_name": df.c_nationkey.map(n2name),
            "revenue_cents": df.revenue_cents,
            "n_orders": df.n_orders,
        })

    return bucketed_sum(joined, ["n_name"], ["revenue_cents", "n_orders"],
                        prepare=to_nation, num_buckets=8)


def q_filter_highvalue(sf_dir: str):
    """Vectorized filter + projection (no shuffle)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"])

    def fn(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.greater(t.column("o_totalprice"), 400_000.0),
                       pc.equal(t.column("o_orderstatus"), "O"))
        t = t.filter(mask)
        cents = pa.array(_int_scale(t.column("o_totalprice").to_numpy(), 100))
        return pa.table({
            "o_orderkey": t.column("o_orderkey"),
            "o_custkey": t.column("o_custkey"),
            "totalprice_cents": cents,
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_distinct_flags(sf_dir: str):
    """Distinct combinations via pre-dedup combiner + bucketed count."""
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_rows"] = np.int64(1)
        return df

    return bucketed_sum(ds, ["l_returnflag", "l_linestatus"], ["n_rows"],
                        prepare=prepare, num_buckets=8)


def q_orders_per_month(sf_dir: str):
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "order_year": df.o_orderdate.dt.year.astype(np.int64),
            "order_month": df.o_orderdate.dt.month.astype(np.int64),
            "n_orders": np.ones(len(df), dtype=np.int64),
            "revenue_cents": _int_scale(df.o_totalprice, 100),
        })

    return bucketed_sum(ds, ["order_year", "order_month"],
                        ["n_orders", "revenue_cents"], prepare=prepare,
                        num_buckets=16)


def q_events_window(sf_dir: str):
    """Tumbling 1-hour event-time windows per event type (streaming-shaped
    workload mapped to groupby; SURVEY §2.10)."""
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        # normalize to µs regardless of the block's datetime64 unit (a
        # ns-coercing pandas/pyarrow would shift windows by 1000x)
        us = _to_us(df.ts)
        return pd.DataFrame({
            "event_type": df.event_type,
            "window_id": us // 3_600_000_000,
            "n_events": np.ones(len(df), dtype=np.int64),
            "sum_value_e2": _int_scale(df.value, 100),
        })

    return bucketed_sum(ds, ["event_type", "window_id"],
                        ["n_events", "sum_value_e2"], prepare=prepare,
                        num_buckets=32)


def q_running_total(sf_dir: str):
    """Cumulative window per partition: running order-value total per
    customer in order-date order (≙ SQL SUM OVER (PARTITION BY ...
    ORDER BY ... ROWS UNBOUNDED PRECEDING)).

    Scale shape: the partition key (o_custkey) is high-cardinality, so
    a native ``groupby(key).map_groups`` would pay the per-group Python
    cliff (groupby.py docstring).  Instead the key is hash-bucketed and
    each bucket computes every customer's cumsum VECTORIZED (one pandas
    ``groupby().cumsum`` per bucket)."""
    from ..stages.groupby import _bucket_of

    NB = 64
    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "o_custkey": df.o_custkey,
            "o_orderkey": df.o_orderkey,
            "o_orderdate": df.o_orderdate,
            "cents": _int_scale(df.o_totalprice, 100),
        })
        out["_bucket"] = _bucket_of(out, ["o_custkey"], NB)
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        g = df.groupby("o_custkey", sort=False)
        out = pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(),
            "o_orderkey": df.o_orderkey.to_numpy(),
            "running_cents": g["cents"].cumsum().to_numpy(),
            "order_seq": (g.cumcount() + 1).to_numpy(),
        })
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def q_topk_brand(sf_dir: str):
    """Per-group top-k (rank within partition) via groupby().map_groups."""
    ds = _read(sf_dir, "part", ["p_brand", "p_partkey", "p_retailprice"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["p_retailprice", "p_partkey"],
                            ascending=[False, True]).head(3)
        return pd.DataFrame({
            "p_brand": df.p_brand,
            "p_partkey": df.p_partkey,
            "price_cents": _int_scale(df.p_retailprice, 100),
            "rnk": np.arange(1, len(df) + 1, dtype=np.int64),
        })

    return ds.groupby("p_brand").map_groups(topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# Deduplication / similarity / text-analysis queries
# ---------------------------------------------------------------------------

def _mod_eq(col, m: int):
    """``col % m == 0`` as Arrow kernels — the dup-injection selector
    shared by every dedup/curate variants builder (ONE copy: its
    constants and expression mirror the SQL oracles verbatim)."""
    import pyarrow.compute as pc

    return pc.equal(pc.subtract(col, pc.multiply(pc.divide(col, m), m)), 0)


def _exact_copy_rows(t: pa.Table) -> pa.Table:
    """Exact copies (doc_id+500000) of every 7th doc."""
    import pyarrow.compute as pc

    keep = t.filter(_mod_eq(t.column("doc_id"), 7))
    return pa.table({
        "doc_id": pc.add(keep.column("doc_id"), 500000),
        "text": keep.column("text"),
    })


def _near_copy_rows(t: pa.Table) -> pa.Table:
    """Perturbed copies (doc_id+1000000, text + ' extradup') of every
    5th doc.  The separator/suffix args are SCALARS: a list built with
    ``* num_rows`` is null-typed for an empty batch and
    binary_join_element_wise has no (string, null, string) kernel."""
    import pyarrow.compute as pc

    keep = t.filter(_mod_eq(t.column("doc_id"), 5))
    return pa.table({
        "doc_id": pc.add(keep.column("doc_id"), 1000000),
        "text": pc.binary_join_element_wise(
            keep.column("text").cast(pa.string()), " extradup", ""),
    })


def _docs_with_exact_copies(sf_dir: str):
    """documents ∪ exact copies — deterministic dup injection, same
    construction as the oracle SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.union(ds.map_batches(_exact_copy_rows, batch_format="pyarrow"))


def _docs_with_near_copies(sf_dir: str):
    """documents ∪ perturbed near copies."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.union(ds.map_batches(_near_copy_rows, batch_format="pyarrow"))


def q_dedup_exact(sf_dir: str):
    """Exact dedup: sha256 identity → keep min doc_id + dup count."""
    from ..stages.dedup import exact_dedup

    return exact_dedup(_docs_with_exact_copies(sf_dir))


def q_dedup_minhash(sf_dir: str):
    """MinHash+LSH near-dup pairs, exact-Jaccard verified (≥ 0.5).

    ``group_cap=None`` on every oracle-checked near-dup wrapper: the
    production blocking-group cap makes the Ray pair set an
    under-approximation on mega-cluster corpora while the DuckDB oracle
    stays exact — uncapped keeps the comparison apples-to-apples on ANY
    corpus (production callers get the capped default)."""
    from ..stages.dedup import near_dup_minhash

    return near_dup_minhash(_docs_with_near_copies(sf_dir), group_cap=None)


def q_dedup_jaccard(sf_dir: str):
    """EXACT n-gram-Jaccard near-dup pairs (≥ 0.3) — the zero-false-
    negative verification-grade dedup; inverted-index blocking +
    join-based exact verify (stages/dedup.py near_dup_jaccard)."""
    from ..stages.dedup import near_dup_jaccard

    return near_dup_jaccard(_docs_with_near_copies(sf_dir), threshold=0.3,
                            group_cap=None)  # oracle parity: see q_dedup_minhash


def _tri_union(t: pa.Table) -> pa.Table:
    """base ∪ exact copies (+500000, every 7th) ∪ near copies
    (+1000000, ' extradup', every 5th) — the ONE copy of the curate
    oracles' ``cdocs`` union."""
    return pa.concat_tables([t.select(["doc_id", "text"]),
                             _exact_copy_rows(t), _near_copy_rows(t)])


def _docs_curate_input(sf_dir: str):
    """documents through :func:`_tri_union` — makes every curation
    stage do real work (plain documents have no duplicates)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _tri_union, batch_format="pyarrow")


def q_curate(sf_dir: str):
    """Flagship curation ladder end-to-end: quality gates → lang-ID →
    exact dedup (keep-min, n_dupes accounting) → exact near-dup dedup
    (drop-higher-id) — one streaming pipeline (pipelines/curate.py),
    SQL-checkable because every stage is an oracle-green operator."""
    from .curate import curate

    return curate(_docs_curate_input(sf_dir),
                  group_cap=None)  # oracle parity: see q_dedup_minhash


def _embeddings_with_near_copies(sf_dir: str):
    """embeddings ∪ scaled near-copies (vec_id+1000000, 1.01×v of every
    5th vec) — the labeled near-dup corpus shared by q_dedup_embedding
    and q_rag_eval.  Everything is widened to float64 so the arithmetic
    is bit-identical to the SQL oracles' ``embedding::DOUBLE[]`` /
    ``list_transform(..., x -> x * 1.01)`` (a float32 copy differs from
    the double-computed one at ~1e-8 — enough to flip a value sitting
    on an e4 rounding boundary)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    f64 = pa.list_(pa.float64())

    def widen(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": t.column("vec_id"),
            "embedding": pc.cast(t.column("embedding"), f64),
        })

    def scaled(t: pa.Table) -> pa.Table:
        keep = t.filter(_mod_eq(t.column("vec_id"), 5))
        col = pc.cast(keep.column("embedding"), f64).combine_chunks()
        flat = pc.multiply(pc.list_flatten(col),
                           pa.scalar(1.01, pa.float64()))
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
        return pa.table({
            "vec_id": pc.add(keep.column("vec_id"), 1000000),
            "embedding": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()), flat),
        })

    return ds.map_batches(widen, batch_format="pyarrow").union(
        ds.map_batches(scaled, batch_format="pyarrow"))


def q_dedup_embedding(sf_dir: str):
    """Embedding-cosine near-dup (cos ≥ 0.999) over embeddings ∪
    scaled copies (vec_id+1000000, 1.01×vec of every 5th)."""
    from ..stages.dedup import embedding_near_dup

    return embedding_near_dup(_embeddings_with_near_copies(sf_dir),
                              threshold=0.999)


def _query_vectors(sf_dir: str, n: int = 5) -> dict[int, list[float]]:
    import pyarrow.parquet as pq

    # predicate pushdown: only the n query rows reach the driver
    # (row-group pruning — unfiltered, the whole vector table would)
    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", n)])
    return dict(zip(t.column("vec_id").to_pylist(),
                    t.column("embedding").to_pylist()))


def q_knn(sf_dir: str):
    """Brute-force cosine top-10 for query vectors vec_id 0..4."""
    from ..stages.similarity import knn_brute_force

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_brute_force(ds, _query_vectors(sf_dir), k=10)


def q_knn_ivf(sf_dir: str):
    """IVF approximate top-10 (16 centroids, nprobe=4) — approximate,
    so no SQL oracle; recall vs brute force asserted in tests."""
    from ..stages.similarity import knn_ivf

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return knn_ivf(ds, _query_vectors(sf_dir), k=10,
                   n_centroids=16, nprobe=4)


def q_knn_ivf_indexed(sf_dir: str):
    """Persisted-IVF top-10 in EXACT mode (nprobe == n_centroids):
    build the bucket-partitioned index once under /tmp, probe it with
    partition-pruned reads (stages/similarity.py build_ivf_index /
    knn_ivf_indexed).  Full probe reads every bucket, so the result
    equals brute force and shares q_knn's oracle."""
    import hashlib
    import os

    from ..stages.similarity import build_ivf_index, knn_ivf_indexed

    # cache key includes the source file's identity (mtime+size), and
    # the skip guard is a _SUCCESS sentinel written AFTER the bucket
    # spill — centroids.json lands first during the build, so checking
    # it would treat an interrupted build as complete and silently
    # serve neighbors from a partial vector set
    src = os.stat(f"{sf_dir}/embeddings.parquet")
    tag = hashlib.sha1(
        f"{sf_dir}:{src.st_mtime_ns}:{src.st_size}".encode()).hexdigest()[:10]
    idx = f"/tmp/ivf_index_{tag}"
    sentinel = f"{idx}/_SUCCESS"
    if not os.path.exists(sentinel):
        build_ivf_index(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                        idx, n_centroids=16)
        with open(sentinel, "w") as f:
            f.write("")
    return knn_ivf_indexed(idx, _query_vectors(sf_dir), k=10, nprobe=16)


def q_rag_eval(sf_dir: str):
    """Retrieval-metrics evaluator — the deterministic analogue of the
    reference's RAG evaluator (rag/evaluator.py:1-199, which scores a
    retriever against gold labels via lm-eval): corpus = embeddings ∪
    injected near-copies, 20 queries (vec_id < 100, every 5th), each
    with an arithmetic gold label — the query's OWN near-copy for every
    3rd query (a guaranteed hit) and an arbitrary unrelated vector
    otherwise (usually a miss) — exact cosine top-10 retrieval, then
    per-query gold_rank / hit@10 / reciprocal-rank.  Unlike q_rag
    (rank fusion + generation, rows-only) every step here is
    SQL-expressible, so the metrics are value-checked end-to-end."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_brute_force

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 100)])
    qt = qt.filter(_mod_eq(qt.column("vec_id"), 5))
    queries = dict(zip(qt.column("vec_id").to_pylist(),
                       qt.column("embedding").to_pylist()))
    top = knn_brute_force(_embeddings_with_near_copies(sf_dir), queries,
                          k=10)

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        qid = int(df.query_id.iloc[0])
        gold = qid + 1000000 if qid % 3 == 0 else qid + 1
        m = df.loc[df.neighbor_id == gold, "rnk"]
        rank = int(m.iloc[0]) if len(m) else -1
        return pd.DataFrame({
            "query_id": np.array([qid], dtype=np.int64),
            "gold_id": np.array([gold], dtype=np.int64),
            "gold_rank": np.array([rank], dtype=np.int64),
            "hit_at_10": np.array([1 if rank > 0 else 0], dtype=np.int64),
            "rr_e6": np.array(
                [int(np.floor(1e6 / rank + 0.5)) if rank > 0 else 0],
                dtype=np.int64),
        })

    return top.groupby("query_id").map_groups(metrics, batch_format="pandas")


def q_colvision(sf_dir: str):
    """ColVision late-interaction retrieval: pages = groups of 4
    embedding vectors (vec_id // 4) in nested multi-vector rows,
    queries = the first 3 pages' vector sets, exact MaxSim top-5
    (stages/colvision.py; score spec milvuscolvision.py:230)."""
    import pyarrow.parquet as pq

    from ..stages.colvision import maxsim_retrieve
    from ..stages.groupby import _BUCKET

    qt = pq.read_table(f"{sf_dir}/embeddings.parquet",
                       columns=["vec_id", "embedding"],
                       filters=[("vec_id", "<", 12)]).to_pandas() \
        .sort_values("vec_id")
    queries = {
        int(pid): [list(v) for v in g.sort_values("vec_id").embedding]
        for pid, g in qt.groupby(qt.vec_id // 4)
    }

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def add_keys(df):
        df = df.copy()
        df["page_id"] = (df.vec_id // 4).astype("int64")
        df[_BUCKET] = (df.page_id % 32).astype("int64")
        return df

    def nest_pages(df):
        rows = {"page_id": [], "patches": []}
        for pid, g in df.groupby("page_id"):
            g = g.sort_values("vec_id")
            rows["page_id"].append(int(pid))
            rows["patches"].append([list(v) for v in g.embedding])
        return pd.DataFrame(rows)

    pages = (
        ds.map_batches(add_keys, batch_format="pandas")
        .groupby(_BUCKET)
        .map_groups(lambda df: nest_pages(df.drop(columns=[_BUCKET])),
                    batch_format="pandas")
    )
    return maxsim_retrieve(pages, queries, k=5)


def q_lang_id(sf_dir: str):
    from ..stages.text_analysis import detect_lang_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(df["doc_id"].astype(np.int64)),
            "lang_pred": pa.array(detect_lang_batch(df["text"]), pa.string()),
        })

    return ds.map_batches(fn, batch_format="pandas")


def q_quality(sf_dir: str):
    from ..stages.text_analysis import quality_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_stats(df)
        out.insert(0, "doc_id", df["doc_id"].astype(np.int64).values)
        return out

    return ds.map_batches(fn, batch_format="pandas")


def q_token_count(sf_dir: str):
    from ..stages.text_analysis import count_tokens_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(df["doc_id"].astype(np.int64)),
            "n_tokens": pa.array(count_tokens_batch(df["text"]), pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pandas")


def q_text_analysis(sf_dir: str):
    """The full text-analysis tagger pass — lang-ID + quality signals +
    token count — in ONE streaming map over the documents table (the
    q_lang_id / q_quality / q_token_count operators, consolidated so
    one driver row value-checks all three tagger kernels; at 100 TB a
    single content pass beats three).  Kernels: compiled-regex batch
    counts only, no per-row Python (stages/text_analysis.py)."""
    from ..stages.text_analysis import (count_tokens_batch,
                                        detect_lang_batch, quality_stats)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_stats(df)
        out.insert(0, "doc_id", df["doc_id"].astype(np.int64).values)
        out["lang_pred"] = detect_lang_batch(df["text"])
        out["n_tokens"] = count_tokens_batch(df["text"])
        return out

    return ds.map_batches(fn, batch_format="pandas")


def q_dedup_simhash(sf_dir: str):
    """SimHash near-dup pairs (hamming ≤ 3) over docs ∪ exact copies —
    bit-level sketch, not SQL-expressible; invariants tested in pytest."""
    from ..stages.dedup import near_dup_simhash

    return near_dup_simhash(_docs_with_exact_copies(sf_dir),
                            group_cap=None)  # pytest-pinned values: uncapped


def q_chunk_fixed(sf_dir: str):
    """Fixed-window chunker (flat-map 1→N): 40-word chunks, ids
    ``doc_id * 1000 + idx`` (the reference chunker's `id+i` scheme,
    chunker/multimodal.py:241)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    W = 40

    def fn(t: pa.Table) -> pa.Table:
        out = {"doc_id": [], "chunk_idx": [], "chunk_text": []}
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            ws = text.split(" ")
            for ci in range((len(ws) + W - 1) // W):
                out["doc_id"].append(did)
                out["chunk_idx"].append(ci)
                out["chunk_text"].append(" ".join(ws[ci * W:(ci + 1) * W]))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
            "chunk_text": pa.array(out["chunk_text"], pa.string()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_sessionize(sf_dir: str):
    """Session windows per user (30-min inactivity gap) — the
    streaming-shaped workload of SURVEY §2.10.  Emits one row per
    session.

    Scale shape: user_id is hash-bucketed (low-cardinality shuffle
    key); each bucket sessionizes ALL its users vectorized — sort by
    (user, ts), session breaks from shifted comparisons, per-user break
    cumsum, one pandas groupby-agg.  No per-user Python work."""
    from ..stages.groupby import _bucket_of
    from ..stages.streaming import GAP_US  # single source of the gap

    NB = 32

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "user_id": df.user_id.astype(np.int64),
            # µs regardless of the block's datetime64 unit (ns-coercing
            # pandas would change the gap semantics by 1000x)
            "us": _to_us(df.ts),
            "value_e2": _int_scale(df.value, 100),
        })
        out["_bucket"] = _bucket_of(out, ["user_id"], NB)
        return pa.Table.from_pandas(out, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "us"], kind="stable")
        user = df.user_id.to_numpy()
        us = df.us.to_numpy()
        brk = np.ones(len(df), dtype=bool)
        if len(df) > 1:
            brk[1:] = (user[1:] != user[:-1]) | ((us[1:] - us[:-1]) > GAP_US)
        sid = (pd.Series(brk.astype(np.int64))
               .groupby(user, sort=False).cumsum().to_numpy())
        out = pd.DataFrame({
            "user_id": user,
            "session_idx": sid,
            "n_events": np.ones(len(df), dtype=np.int64),
            "start_us": us,
            "end_us": us,
            "sum_value_e2": df.value_e2.to_numpy(),
        })
        g = out.groupby(["user_id", "session_idx"], as_index=False).agg(
            n_events=("n_events", "sum"),
            start_us=("start_us", "min"),
            end_us=("end_us", "max"),
            sum_value_e2=("sum_value_e2", "sum"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (ds.map_batches(add_bucket, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(per_bucket, batch_format="pandas"))


def q_streaming_sessionize(sf_dir: str):
    """The STATEFUL incremental-state path (stages/streaming.py) driven
    over the events log — same output contract (and oracle) as the
    batch q_sessionize, proving the incremental state machine agrees
    with the window-batch semantics.  The log is hash-partitioned by
    key inside Ray Data and each bucket streams through its state
    machine in micro-batches — nothing is materialized on the driver."""
    from ..stages.streaming import streaming_sessionize_ds

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])
    return streaming_sessionize_ds(ds, num_buckets=8, micro_batch=1024)


def q_anti_join(sf_dir: str):
    """Customers with no high-value (>450k) order — broadcast anti-join
    (the filtered key set of the big side ships once; no shuffle;
    SURVEY §2.5)."""
    import pyarrow.compute as pc

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    key_chunks = []
    for b in orders.map_batches(
            lambda t: t.filter(pc.greater(t.column("o_totalprice"), 450_000.0)),
            batch_format="pyarrow").iter_batches(batch_size=65536,
                                                 batch_format="pyarrow"):
        key_chunks.append(b.column("o_custkey").combine_chunks())
    keys = pc.unique(pa.concat_arrays(key_chunks)) if key_chunks else pa.array([], pa.int64())
    key_ref = ray.put(keys)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def fn(t: pa.Table) -> pa.Table:
        have = ray.get(key_ref)
        mask = pc.invert(pc.is_in(t.column("c_custkey"), value_set=have))
        t = t.filter(mask)
        return pa.table({
            "c_custkey": t.column("c_custkey"),
            "c_name": t.column("c_name"),
            "acctbal_cents": pa.array(
                _int_scale(t.column("c_acctbal").to_numpy(), 100)),
        })

    return cust.map_batches(fn, batch_format="pyarrow")


def q_region_suppliers(sf_dir: str):
    """Three-level broadcast dimension join: supplier → nation → region
    rollup (supplier count + total acctbal per region)."""
    from ..stages.groupby import bucketed_sum

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    n2r = dict(zip(nation.n_nationkey, nation.n_regionkey))
    r2name = dict(zip(region.r_regionkey, region.r_name))
    ref = ray.put((n2r, r2name))

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        n2r_, r2name_ = ray.get(ref)
        return pd.DataFrame({
            "r_name": df.s_nationkey.map(n2r_).map(r2name_),
            "n_suppliers": np.ones(len(df), dtype=np.int64),
            "acctbal_cents": _int_scale(df.s_acctbal, 100),
        })

    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    return bucketed_sum(sup, ["r_name"], ["n_suppliers", "acctbal_cents"],
                        prepare=prepare, num_buckets=4)


def q_dedup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: the minhash-verified pair graph run through
    distributed min-label connected components — every clustered doc id
    with its component representative (smallest id reachable)."""
    from ..stages.canonicalize import connected_components
    from ..stages.dedup import near_dup_minhash

    pairs = near_dup_minhash(_docs_with_near_copies(sf_dir),
                             group_cap=None)  # oracle parity: see q_dedup_minhash
    labels = connected_components(
        pairs.select_columns(["id_a", "id_b"]), src="id_a", dst="id_b")

    def fix_types(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["node"].astype(np.int64),
                             "cluster_rep": df["label"].astype(np.int64)})

    return labels.map_batches(fix_types, batch_format="pandas")


def q_json_props(sf_dir: str):
    """JSON scalar functions (SURVEY §2.9): parse the events ``props``
    JSON column, extract ``k``, aggregate per event_type."""
    import json as _json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        ks = df.props.map(lambda s: int(_json.loads(s)["k"]))
        return pd.DataFrame({
            "event_type": df.event_type,
            "sum_k": ks.astype(np.int64),
            "max_k": ks.astype(np.int64),
            "n_events": np.ones(len(df), dtype=np.int64),
        })

    def agg(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            sum_k=("sum_k", "sum"), max_k=("max_k", "max"),
            n_events=("n_events", "sum"))

    from ..stages.groupby import bucketed_agg

    return bucketed_agg(ds, ["event_type"], agg, prepare=prepare,
                        num_buckets=8)


def q_process_markdown(sf_dir: str):
    """Markdown processor through the dispatch surface: documents
    rendered as markdown files with an image link → processed text with
    ``<attachment>`` tag + extracted image modality."""
    from ..stages.processors import process_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_md(t: pa.Table) -> pa.Table:
        rows_path, rows_content = [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            rows_path.append(f"/corpus/doc_{did}.md")
            rows_content.append(
                f"# Doc {did}\n\n![fig](img_{did}.png)\n\n{text}\n")
        return pa.table({
            "file_path": pa.array(rows_path, pa.string()),
            "content": pa.array(rows_content, pa.string()),
        })

    processed = ds.map_batches(to_md, batch_format="pyarrow") \
                  .map_batches(process_batch, batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mods = t.column("modalities").to_pylist()
        return pa.table({
            "file_path": t.column("file_path"),
            "text": t.column("text"),
            "n_modalities": pa.array([len(m) for m in mods], pa.int64()),
            "image_src": pa.array(
                [m[0]["value"] if m else "" for m in mods], pa.string()),
            "processor_type": t.column("processor_type"),
        })

    return processed.map_batches(project, batch_format="pyarrow")


def q_process_pdf(sf_dir: str):
    """PDF fast path end-to-end: documents rendered as real (minimal)
    PDF files — 50-word pages, one content stream each — then parsed
    back through the dispatch registry's PDFProcessor (pdfmini text
    layer + the reference fast path's paragraph bookkeeping,
    pdf_processor.py:258-326).  ``last_offset`` is the terminal
    paragraph sentinel and must equal ``length(text)`` — the oracle
    checks the offset arithmetic, not just the text."""
    from ..sources.pdfmini import make_pdf
    from ..stages.processors import dispatch

    W = 50
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_pdf(t: pa.Table) -> pa.Table:
        paths, blobs = [], []
        for did, text in zip(t.column("doc_id").to_pylist(),
                             t.column("text").to_pylist()):
            ws = text.split(" ")
            pages = [" ".join(ws[i * W:(i + 1) * W])
                     for i in range((len(ws) + W - 1) // W)]
            paths.append(f"/corpus/doc_{did}.pdf")
            blobs.append(make_pdf(pages).decode("latin-1"))
        return pa.table({
            "file_path": pa.array(paths, pa.string()),
            "content": pa.array(blobs, pa.string()),
        })

    def parse_rows(t: pa.Table) -> pa.Table:
        out = {"file_path": [], "text": [], "n_pages": [],
               "n_paragraphs": [], "last_offset": [], "processor_type": []}
        for path, blob in zip(t.column("file_path").to_pylist(),
                              t.column("content").to_pylist()):
            proc = dispatch(path)
            parsed = proc.parse(path.rsplit("/", 1)[-1], blob)
            ps = parsed["metadata"]["paragraph_starts"]
            out["file_path"].append(path)
            out["text"].append(parsed["text"])
            out["n_pages"].append(len({p[1] for p in ps[:-1]}))
            out["n_paragraphs"].append(len(ps) - 1)
            out["last_offset"].append(ps[-1][0])
            out["processor_type"].append(proc.NAME)
        return pa.table({
            "file_path": pa.array(out["file_path"], pa.string()),
            "text": pa.array(out["text"], pa.string()),
            "n_pages": pa.array(out["n_pages"], pa.int64()),
            "n_paragraphs": pa.array(out["n_paragraphs"], pa.int64()),
            "last_offset": pa.array(out["last_offset"], pa.int64()),
            "processor_type": pa.array(out["processor_type"], pa.string()),
        })

    return (ds.map_batches(to_pdf, batch_format="pyarrow")
            .map_batches(parse_rows, batch_format="pyarrow"))


def q_rag(sf_dir: str):
    """RAG retrieve→generate (pipelines/rag.py): index the documents
    table (actor-pool fake embedders, batch 64), answer three fixed
    questions with the one-pass multi-query hybrid retrieval + the
    deterministic extractive LLM.  Rank fusion + generation are not
    SQL-expressible → NO_ORACLE (rows-only driver check + pytest)."""
    import tempfile

    from ..stages.embed import index_documents
    from .rag import rag_answer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_samples(t: pa.Table) -> pa.Table:
        return pa.table({
            "sample_id": pa.compute.cast(t.column("doc_id"), pa.string()),
            "text": t.column("text"),
        })

    coll = tempfile.mkdtemp(prefix="rag_coll_")
    index_documents(ds.map_batches(to_samples, batch_format="pyarrow"), coll)
    out = rag_answer(coll, {
        "q1": "customer orders pending",
        "q2": "final deposits across the foxes",
        "q3": "slyly regular packages",
    }, k=3)
    return out[["query_id", "question", "answer", "n_docs"]]


def q_mentions_regions(sf_dir: str):
    """Lang-aware mention detection (the north rule's "tree-sitter +
    regex gazetteers" contract, stages/code_regions.py): split each
    source file into docstring/comment/prose regions per language,
    scan the gazetteer INSIDE regions only, roll up occurrences per
    (file, region_type, surface)."""
    from ..stages.code_regions import explode_regions
    from ..stages.groupby import bucketed_sum

    regions = _corpus_ds(sf_dir).map_batches(explode_regions,
                                             batch_format="pyarrow")

    def scan(batch: pa.Table) -> pa.Table:
        from ..stages.mentions import get_default_scanner

        sc = get_default_scanner()
        out = {"repo": [], "path": [], "region_type": [], "surface": [],
               "entity_type": [], "n_occ": []}
        for r, p, rt, txt in zip(batch.column("repo").to_pylist(),
                                 batch.column("path").to_pylist(),
                                 batch.column("region_type").to_pylist(),
                                 batch.column("region_text").to_pylist()):
            for m in sc._scan(txt)[0]:
                out["repo"].append(r)
                out["path"].append(p)
                out["region_type"].append(rt)
                out["surface"].append(m["surface"])
                out["entity_type"].append(m["entity_type"])
                out["n_occ"].append(m["n_occ"])
        return pa.table({
            "repo": pa.array(out["repo"], pa.string()),
            "path": pa.array(out["path"], pa.string()),
            "region_type": pa.array(out["region_type"], pa.string()),
            "surface": pa.array(out["surface"], pa.string()),
            "entity_type": pa.array(out["entity_type"], pa.string()),
            "n_occ": pa.array(out["n_occ"], pa.int64()),
        })

    found = regions.map_batches(scan, batch_format="pyarrow")
    return bucketed_sum(
        found, ["repo", "path", "region_type", "surface", "entity_type"],
        ["n_occ"], num_buckets=32)


def q_translate(sf_dir: str):
    """Translator post-processor end-to-end (translator/base.py:87-126
    semantics): documents are first de-ified through the deterministic
    en→de word table, then run through the translator stage — classify,
    gate, segment-split, dictionary-translate back to EN, preserve
    ``original_text``.  The word tables are positional-zip inverses, so
    a fully-gated doc round-trips to its original text (the oracle
    states the maps explicitly)."""
    from ..stages.postprocess_extra import dictionary_translate, translator

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stage = translator(target_lang="en", confidence=0.0)

    def prep(t: pa.Table) -> pa.Table:
        texts = [dictionary_translate(x, "en", "de")
                 for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "text": pa.array(texts, pa.string())})

    def project(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "text", "original_text"])

    return (ds.map_batches(prep, batch_format="pyarrow")
            .map_batches(stage, batch_format="pyarrow")
            .map_batches(project, batch_format="pyarrow"))


def q_filter_quality(sf_dir: str):
    """The datatrove-ladder composite: Gopher quality rules +
    unigram-logprob gate over documents (stages/filters.py — the
    published definitions, space-split words).  The logprob table is a
    two-level toy (-2 for EN stopwords, -6 unknown) so the gate reduces
    to a stopword-density threshold the SQL oracle states exactly."""
    from ..stages.filters import gopher_quality_filter, unigram_logprob_filter
    from ..stages.text_analysis import LANG_PROFILES

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(gopher_quality_filter(min_words=50),
                        batch_format="pyarrow")
    table = {w: -2.0 for w in LANG_PROFILES["en"]}
    # avg = -6 + 4·(stop_hits/n)  ⟹  keep ⟺ stop_hits ≥ 0.05·n
    ds = ds.map_batches(
        unigram_logprob_filter(table, min_avg_logprob=-5.8,
                               unknown_logprob=-6.0),
        batch_format="pyarrow")

    def project(df: pd.DataFrame) -> pa.Table:
        from ..stages.filters import _en_stopword_re

        n_words = (df["text"].str.count(" ") + 1).astype(np.int64)
        stops = df["text"].str.count(_en_stopword_re()).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(df["doc_id"].astype(np.int64)),
            "word_count": pa.array(n_words),
            "stop_hits": pa.array(stops),
        })

    return ds.map_batches(project, batch_format="pandas")


def q_filter_length(sf_dir: str):
    """Length + alpha-ratio quality filters over documents."""
    from ..stages.filters import alpha_ratio_filter, length_filter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    ds = ds.map_batches(length_filter(40, 80), batch_format="pyarrow")
    ds = ds.map_batches(alpha_ratio_filter(0.5), batch_format="pyarrow")

    def project(t: pa.Table) -> pa.Table:
        wc = [len(x.split()) for x in t.column("text").to_pylist()]
        return pa.table({"doc_id": t.column("doc_id"),
                         "word_count": pa.array(wc, pa.int64())})

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Registry + oracles
# ---------------------------------------------------------------------------

QUERIES = {
    "kg_corpus": kg_corpus,
    "kg_mentions": kg_mentions,
    "kg_triples": kg_triples,
    "kg_graph": kg_graph,
    "kg_lineage": kg_lineage,
    "q1_pricing": q1_pricing,
    "q3_top_orders": q3_top_orders,
    "q_nation_revenue": q_nation_revenue,
    "q_filter_highvalue": q_filter_highvalue,
    "q_distinct_flags": q_distinct_flags,
    "q_orders_per_month": q_orders_per_month,
    "q_events_window": q_events_window,
    "q_running_total": q_running_total,
    "q_topk_brand": q_topk_brand,
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_jaccard": q_dedup_jaccard,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_embedding": q_dedup_embedding,
    "q_knn": q_knn,
    "q_knn_ivf_indexed": q_knn_ivf_indexed,
    "q_colvision": q_colvision,
    "q_knn_ivf": q_knn_ivf,
    "q_lang_id": q_lang_id,
    "q_quality": q_quality,
    "q_token_count": q_token_count,
    "q_chunk_fixed": q_chunk_fixed,
    "q_process_markdown": q_process_markdown,
    "q_process_pdf": q_process_pdf,
    "q_filter_length": q_filter_length,
    "q_sessionize": q_sessionize,
    "q_anti_join": q_anti_join,
    "q_json_props": q_json_props,
    "q_region_suppliers": q_region_suppliers,
    "q_dedup_clusters": q_dedup_clusters,
    "q_streaming_sessionize": q_streaming_sessionize,
}

# queries() entries with no SQL-expressible oracle (driver falls back to
# a rows-only check); keep this set tight and justified per entry.
#   q_dedup_simhash — 64-bit sketch with bitwise voting; no reasonable
#                     SQL form.  Invariants asserted in pytest.
#   q_rag           — hybrid rank fusion + extractive generation; no
#                     SQL form.  Retrieval/LLM behavior pinned in
#                     pytest (tests/test_rag.py); the SQL-expressible
#                     retrieval-metrics surface is q_rag_eval (green).
#   q_distinct_approx — HyperLogLog estimate; approximate by design,
#                     no SQL form.  Accuracy vs exact + merge
#                     determinism asserted in pytest.
# (q_knn_ivf — approximate, also oracle-free — lives in EXTRA_QUERIES:
# recall vs exact brute force is asserted in pytest, and the IVF
# family's driver surface is q_knn_ivf_indexed.)
NO_ORACLE: set[str] = {"q_dedup_simhash", "q_rag", "q_distinct_approx"}

_SHINGLE_CTES = """
WITH docs AS (
  SELECT doc_id AS id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS id, text || ' extradup' AS text
  FROM documents WHERE doc_id % 5 = 0
),
w AS (SELECT id, string_split(text, ' ') AS ws FROM docs),
sh AS (
  SELECT id, list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
  FROM w
),
shrow AS (SELECT id, unnest(shingles) AS s FROM sh),
cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
         FROM shrow a JOIN shrow b ON a.s = b.s AND a.id < b.id)
"""


def _lang_id_sql(src: str = "documents") -> str:
    from ..stages.text_analysis import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    scores = ", ".join(
        "len(list_filter(ws, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        + f"], x))) AS s_{lang}"
        for lang in langs
    )
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = {gmax} THEN '{lang}'" for lang in langs)
    return f"""
      WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {src}),
      sc AS (SELECT doc_id, {scores} FROM w)
      SELECT doc_id,
             CASE WHEN {gmax} = 0 THEN 'unknown' {case} END AS lang_pred
      FROM sc"""


def _quality_sql(src: str = "documents") -> str:
    from ..stages.text_analysis import LANG_PROFILES

    en = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
      WITH w AS (
        SELECT doc_id, text, string_split(text, ' ') AS ws,
               length(text) AS n_chars
        FROM {src}
      ),
      m AS (
        SELECT doc_id, n_chars,
               len(ws) AS word_count,
               greatest(n_chars - (len(ws) - 1), 0) AS total_word_chars,
               len(list_filter(ws, x -> list_contains([{en}], x))) AS stop_cnt,
               length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS punct
        FROM w
      )
      SELECT doc_id, word_count, n_chars,
             CAST(floor(1.0 * total_word_chars / greatest(word_count, 1) * 100 + 0.5) AS BIGINT) AS mean_word_len_e2,
             CAST(floor(1.0 * stop_cnt / greatest(word_count, 1) * 10000 + 0.5) AS BIGINT) AS stop_ratio_e4,
             CAST(floor(1.0 * punct / greatest(n_chars, 1) * 10000 + 0.5) AS BIGINT) AS punct_ratio_e4
      FROM m"""

ORACLES = {
    "kg_corpus": f"SELECT repo, path, commit, lang, content, sha256(content) AS content_sha256 FROM ({corpus_sql()})",
    "kg_mentions": _kg_sql("SELECT * FROM mention"),
    "kg_triples": _kg_sql("SELECT * FROM doc_triple"),
    "kg_graph": _kg_sql(
        "SELECT subj, pred, obj, CAST(sum(weight) AS DOUBLE) AS weight FROM doc_triple GROUP BY ALL"
    ),
    "kg_lineage": _kg_sql(
        f"""SELECT c.repo, c.path, c.content_sha256,
                  coalesce(m.n, 0) AS n_mentions,
                  coalesce(least(m.n, {MAX_CLIQUE})
                           * (least(m.n, {MAX_CLIQUE}) - 1) // 2, 0)
                    AS n_edges
           FROM corpus_h c LEFT JOIN (
             SELECT content_sha256, count(*) AS n FROM mention GROUP BY 1
           ) m USING (content_sha256)"""
    ),
    "q1_pricing": f"""
        SELECT l_returnflag, l_linestatus,
               {_sql_sum('l_quantity', 1)} AS sum_qty,
               {_sql_sum('l_extendedprice', 100)} AS sum_base_cents,
               {_sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS sum_disc_e4,
               count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
        GROUP BY l_returnflag, l_linestatus""",
    "q3_top_orders": f"""
        SELECT o.o_orderkey, o.o_custkey, r.revenue_e4
        FROM orders o JOIN (
          SELECT l_orderkey,
                 {_sql_sum('l_extendedprice * (1 - l_discount)', 10000)} AS revenue_e4
          FROM lineitem GROUP BY 1
        ) r ON o.o_orderkey = r.l_orderkey
        ORDER BY r.revenue_e4 DESC, o.o_orderkey LIMIT 10""",
    "q_nation_revenue": f"""
        SELECT n.n_name,
               {_sql_sum('o.o_totalprice', 100)} AS revenue_cents,
               count(*) AS n_orders
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    "q_filter_highvalue": f"""
        SELECT o_orderkey, o_custkey,
               {_sql_scale('o_totalprice', 100)} AS totalprice_cents
        FROM orders WHERE o_totalprice > 400000 AND o_orderstatus = 'O'""",
    "q_distinct_flags": """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem GROUP BY 1, 2""",
    "q_orders_per_month": f"""
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
               CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
               count(*) AS n_orders,
               {_sql_sum('o_totalprice', 100)} AS revenue_cents
        FROM orders GROUP BY 1, 2""",
    "q_events_window": f"""
        SELECT event_type,
               epoch_us(ts) // 3600000000 AS window_id,
               count(*) AS n_events,
               {_sql_sum('value', 100)} AS sum_value_e2
        FROM events GROUP BY 1, 2""",
    "q_running_total": f"""
        SELECT o_custkey, o_orderkey,
               CAST(sum({_sql_scale('o_totalprice', 100)})
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS order_seq
        FROM orders""",
    "q_topk_brand": f"""
        SELECT p_brand, p_partkey,
               {_sql_scale('p_retailprice', 100)} AS price_cents,
               CAST(row_number() OVER (PARTITION BY p_brand
                    ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rnk
        FROM part
        QUALIFY rnk <= 3""",
    "q_dedup_exact": """
        WITH docs AS (
          SELECT doc_id, text FROM documents
          UNION ALL
          SELECT doc_id + 500000, text FROM documents WHERE doc_id % 7 = 0
        )
        SELECT sha256(text) AS content_sha256,
               min(doc_id) AS keep_id,
               count(*) AS n_dupes
        FROM docs GROUP BY 1""",
    "q_dedup_minhash": _SHINGLE_CTES + """
        SELECT * FROM (
          SELECT c.id_a, c.id_b,
                 CAST(floor(1.0 * len(list_intersect(x.shingles, y.shingles)) /
                      len(list_distinct(list_concat(x.shingles, y.shingles)))
                      * 10000 + 0.5) AS BIGINT) AS jaccard_e4
          FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
        ) WHERE jaccard_e4 >= 5000""",
    "q_dedup_jaccard": _SHINGLE_CTES + """
        SELECT * FROM (
          SELECT c.id_a, c.id_b,
                 CAST(floor(1.0 * len(list_intersect(x.shingles, y.shingles)) /
                      len(list_distinct(list_concat(x.shingles, y.shingles)))
                      * 10000 + 0.5) AS BIGINT) AS jaccard_e4
          FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
        ) WHERE jaccard_e4 >= 3000""",
    "q_dedup_embedding": """
        WITH vecs AS (
          SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          UNION ALL
          SELECT vec_id + 1000000,
                 list_transform(embedding::DOUBLE[], x -> x * 1.01)
          FROM embeddings WHERE vec_id % 5 = 0
        )
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               CAST(floor(list_cosine_similarity(a.v, b.v) * 1000 + 0.5) AS BIGINT) AS cos_e3
        FROM vecs a JOIN vecs b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.v, b.v) >= 0.999""",
    "q_knn": """
        WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                   FROM embeddings WHERE vec_id < 5),
        s AS (
          SELECT q.query_id, e.vec_id AS neighbor_id,
                 CAST(floor(list_cosine_similarity(q.qv, e.embedding::DOUBLE[])
                      * 10000 + 0.5) AS BIGINT) AS cos_e4
          FROM q JOIN embeddings e ON e.vec_id != q.query_id
        )
        SELECT query_id, neighbor_id, cos_e4,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_e4 DESC, neighbor_id) AS BIGINT) AS rnk
        FROM s QUALIFY rnk <= 10""",
    "q_lang_id": _lang_id_sql(),
    "q_quality": _quality_sql(),
    "q_token_count": r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        FROM documents""",
    "q_chunk_fixed": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        SELECT doc_id,
               CAST(i - 1 AS BIGINT) AS chunk_idx,
               array_to_string(ws[(i-1)*40+1 : least(i*40, len(ws))], ' ') AS chunk_text
        FROM w, unnest(range(1, CAST(ceil(len(ws) / 40.0) AS BIGINT) + 1)) AS t(i)""",
    "q_process_markdown": """
        WITH md AS (
          SELECT doc_id,
                 '/corpus/doc_' || CAST(doc_id AS VARCHAR) || '.md' AS file_path,
                 '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || chr(10) ||
                 '![fig](img_' || CAST(doc_id AS VARCHAR) || '.png)' ||
                 chr(10) || chr(10) || text || chr(10) AS content
          FROM documents
        )
        SELECT file_path,
               replace(content,
                       '![fig](img_' || CAST(doc_id AS VARCHAR) || '.png)',
                       '<attachment>') AS text,
               CAST(1 AS BIGINT) AS n_modalities,
               'img_' || CAST(doc_id AS VARCHAR) || '.png' AS image_src,
               'MarkdownProcessor' AS processor_type
        FROM md""",
    "q_process_pdf": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        pg AS (
          SELECT doc_id, i,
                 array_to_string(ws[(i-1)*50+1 : least(i*50, len(ws))], ' ') AS chunk
          FROM w, unnest(range(1, CAST(ceil(len(ws) / 50.0) AS BIGINT) + 1)) AS t(i)
        )
        SELECT '/corpus/doc_' || CAST(doc_id AS VARCHAR) || '.pdf' AS file_path,
               string_agg(chunk || chr(10), '' ORDER BY i) AS text,
               count(*) AS n_pages,
               count(*) AS n_paragraphs,
               CAST(length(string_agg(chunk || chr(10), '' ORDER BY i)) AS BIGINT) AS last_offset,
               'PDFProcessor' AS processor_type
        FROM pg GROUP BY doc_id""",
    "q_filter_length": """
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS word_count
        FROM documents
        WHERE len(string_split(text, ' ')) BETWEEN 40 AND 80""",
    "q_sessionize": f"""
        WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        o AS (
          SELECT *, CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)
        ),
        s AS (
          SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
                    ROWS UNBOUNDED PRECEDING) AS session_idx
          FROM o
        )
        SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
               count(*) AS n_events,
               min(us) AS start_us, max(us) AS end_us,
               {_sql_sum('value', 100)} AS sum_value_e2
        FROM s GROUP BY 1, 2""",
    "q_anti_join": f"""
        SELECT c_custkey, c_name,
               {_sql_scale('c_acctbal', 100)} AS acctbal_cents
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)""",
    "q_json_props": """
        SELECT event_type,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               max(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
               count(*) AS n_events
        FROM events GROUP BY 1""",
    "q_region_suppliers": f"""
        SELECT r.r_name,
               count(*) AS n_suppliers,
               {_sql_sum('s.s_acctbal', 100)} AS acctbal_cents
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1""",
    "q_dedup_clusters": _SHINGLE_CTES.replace(
        "WITH docs", "WITH RECURSIVE docs", 1) + """,
        verified AS (
          SELECT * FROM (
            SELECT c.id_a, c.id_b,
                   CAST(floor(1.0 * len(list_intersect(x.shingles, y.shingles)) /
                        len(list_distinct(list_concat(x.shingles, y.shingles)))
                        * 10000 + 0.5) AS BIGINT) AS jaccard_e4
            FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
          ) WHERE jaccard_e4 >= 5000
        ),
        edges AS (
          SELECT id_a AS a, id_b AS b FROM verified
          UNION SELECT id_b, id_a FROM verified
        ),
        closure AS (
          SELECT a, b FROM edges
          UNION
          SELECT c.a, e.b FROM closure c JOIN edges e ON c.b = e.a
        )
        SELECT node AS doc_id, min(reachable) AS cluster_rep FROM (
          SELECT a AS node, b AS reachable FROM closure
          UNION SELECT a, a FROM edges
        ) GROUP BY 1""",
}

ORACLES["q_streaming_sessionize"] = ORACLES["q_sessionize"]


def _filter_quality_sql() -> str:
    """Gopher composite + unigram gate; float expressions mirror the
    engine's EXACTLY (same IEEE ops ⟹ same boundary decisions — the
    -2/-6 logprob sums are integers, so accumulation order is moot)."""
    from ..stages.text_analysis import LANG_PROFILES

    en = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
    return f"""
      WITH m AS (
        SELECT doc_id, text, string_split(text, ' ') AS ws,
               length(text) AS n_chars
        FROM documents
      ),
      sig AS (
        SELECT doc_id, n_chars,
               len(ws) AS n_words,
               len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS alpha_words,
               len(list_filter(ws, w -> list_contains([{en}], w))) AS stop_hits,
               (length(text) - length(replace(text, '#', '')))
                 + (length(text) - length(replace(text, '...', ''))) // 3 AS symbols
        FROM m
      )
      SELECT doc_id,
             CAST(n_words AS BIGINT) AS word_count,
             CAST(stop_hits AS BIGINT) AS stop_hits
      FROM sig
      WHERE n_words BETWEEN 50 AND 100000
        AND (1.0 * (n_chars - (n_words - 1)) / n_words) >= 3.0
        AND (1.0 * (n_chars - (n_words - 1)) / n_words) <= 10.0
        AND symbols <= 0.1 * n_words
        AND alpha_words >= 0.8 * n_words
        AND stop_hits >= 2
        AND ((-2.0 * stop_hits - 6.0 * (n_words - stop_hits)) / n_words) >= -5.8"""


QUERIES["q_filter_quality"] = q_filter_quality
ORACLES["q_filter_quality"] = _filter_quality_sql()


def _curate_ladder_sql(docs: str, extras: tuple[str, ...] = ()) -> str:
    """The gates→exact-dedup→near-dup ladder over a (doc_id, text
    [, extras]) CTE named ``docs`` — the ONE copy both curate oracles
    compose (q_curate over the raw tri-union, q_curate_full over the
    decontaminated+redacted corpus).  Emitted as the TAIL of a WITH
    (leading comma); ``extras`` names carried columns."""
    ek = "".join(f", d.{c}" for c in extras)
    es = "".join(f", k.{c}" for c in extras)
    ef = "".join(f", {c}" for c in extras)
    return f""",
      kept AS (
        SELECT d.doc_id, d.text{ek}, q.word_count, q.stop_ratio_e4,
               l.lang_pred
        FROM {docs} d
        JOIN ({_quality_sql(docs)}) q USING (doc_id)
        JOIN ({_lang_id_sql(docs)}) l USING (doc_id)
        WHERE q.word_count >= 20 AND q.stop_ratio_e4 >= 200
          AND l.lang_pred = 'en'
      ),
      ex AS (
        SELECT text, min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_dupes
        FROM kept GROUP BY text
      ),
      surv AS (
        SELECT k.doc_id, k.text, k.word_count, k.stop_ratio_e4,
               k.lang_pred{es}, e.n_dupes
        FROM kept k JOIN ex e ON k.doc_id = e.keep_id
      ),
      w2 AS (SELECT doc_id AS id, string_split(text, ' ') AS ws FROM surv),
      sh AS (
        SELECT id, list_distinct(list_transform(
                 range(1, greatest(len(ws) - 1, 1)),
                 i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS shingles
        FROM w2
      ),
      shrow AS (SELECT id, unnest(shingles) AS s FROM sh),
      cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
               FROM shrow a JOIN shrow b ON a.s = b.s AND a.id < b.id),
      dropped AS (
        SELECT DISTINCT c.id_b
        FROM cand c JOIN sh x ON c.id_a = x.id JOIN sh y ON c.id_b = y.id
        WHERE CAST(floor(1.0 * len(list_intersect(x.shingles, y.shingles)) /
              len(list_distinct(list_concat(x.shingles, y.shingles)))
              * 10000 + 0.5) AS BIGINT) >= 5000
      )
      SELECT doc_id, word_count, stop_ratio_e4, lang_pred{ef}, n_dupes
      FROM surv WHERE doc_id NOT IN (SELECT id_b FROM dropped)"""


def _curate_sql() -> str:
    """The whole curation ladder as one DuckDB query, composed from the
    SAME SQL the per-stage oracles use (quality, lang, shingle Jaccard)
    over the same tri-union input."""
    return f"""
      WITH cdocs AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 500000, text FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 1000000, text || ' extradup'
        FROM documents WHERE doc_id % 5 = 0
      ){_curate_ladder_sql("cdocs")}"""


QUERIES["q_curate"] = q_curate
ORACLES["q_curate"] = _curate_sql()


def _translate_sql() -> str:
    """en→de construction + classify + per-language back-map, with the
    engine's exact gate (argmax ties break lang-ascending; translate
    iff best ≠ en and best score ≥ 1 hit)."""
    from ..stages.text_analysis import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    en = LANG_PROFILES["en"]

    def word_map(table: dict[str, str]) -> str:
        cases = " ".join(f"WHEN w = '{k}' THEN '{v}'"
                         for k, v in table.items())
        return (f"array_to_string(list_transform(ws, "
                f"w -> CASE {cases} ELSE w END), ' ')")

    en2de = word_map(dict(zip(en, LANG_PROFILES["de"])))
    scores = ", ".join(
        "len(list_filter(ws, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in LANG_PROFILES[lang])
        + f"], x))) AS s_{lang}"
        for lang in langs
    )
    gmax = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    best = ("CASE WHEN " + gmax + " = 0 THEN 'unknown' "
            + " ".join(f"WHEN s_{lang} = {gmax} THEN '{lang}'"
                       for lang in langs) + " END")
    backs = " ".join(
        f"WHEN best = '{lang}' THEN {word_map(dict(zip(LANG_PROFILES[lang], en)))}"
        for lang in langs if lang != "en")
    return f"""
      WITH src AS (
        SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      ),
      de AS (SELECT doc_id, {en2de} AS t FROM src),
      d2 AS (SELECT doc_id, t, string_split(t, ' ') AS ws FROM de),
      sc AS (SELECT doc_id, t, ws, {scores} FROM d2),
      cl AS (SELECT doc_id, t, ws, {best} AS best, {gmax} AS gm FROM sc)
      SELECT doc_id,
             CASE WHEN best != 'en' AND best != 'unknown' AND gm >= 1
                  THEN CASE {backs} ELSE t END
                  ELSE t END AS text,
             CASE WHEN best != 'en' AND best != 'unknown' AND gm >= 1
                  THEN t ELSE '' END AS original_text
      FROM cl"""


QUERIES["q_translate"] = q_translate
ORACLES["q_translate"] = _translate_sql()


def _mentions_regions_sql() -> str:
    """Same region-extraction spec as stages/code_regions.py, stated in
    SQL, then the replace-count occurrence oracle per region."""
    strip1 = ("CASE WHEN substr({x}, 1, 1) = ' ' THEN substr({x}, 2) "
              "ELSE {x} END")
    py_comment = strip1.format(x="substr(ln, strpos(ln, '#') + 1)")
    js_comment = strip1.format(x="substr(ln, strpos(ln, '//') + 2)")
    return f"""
      WITH corpus AS ({corpus_sql()}),
      region AS (
        SELECT repo, path, 'docstring' AS region_type,
               unnest(regexp_extract_all(content, '\"\"\"(.*?)\"\"\"', 1, 's')) AS region_text
        FROM corpus WHERE lang = 'python'
        UNION ALL
        SELECT repo, path, 'comment', {py_comment}
        FROM (SELECT repo, path,
                     unnest(string_split(content, chr(10))) AS ln
              FROM corpus WHERE lang = 'python')
        WHERE contains(ln, '#')
        UNION ALL
        SELECT repo, path, 'docstring',
               trim(unnest(regexp_extract_all(content, '/\\*+(.*?)\\*/', 1, 's')), ' *')
        FROM corpus WHERE lang = 'javascript'
        UNION ALL
        SELECT repo, path, 'comment', {js_comment}
        FROM (SELECT repo, path,
                     unnest(string_split(content, chr(10))) AS ln
              FROM corpus WHERE lang = 'javascript')
        WHERE contains(ln, '//')
        UNION ALL
        SELECT repo, path, 'prose', content
        FROM corpus WHERE lang NOT IN ('python', 'javascript')
      ),
      m AS (
        SELECT r.repo, r.path, r.region_type, g.surface, g.entity_type,
               (length(r.region_text) - length(replace(r.region_text, g.surface, '')))
                 // length(g.surface) AS n_occ
        FROM region r JOIN {gazetteer_sql()} ON contains(r.region_text, g.surface)
      )
      SELECT repo, path, region_type, surface, entity_type,
             CAST(sum(n_occ) AS BIGINT) AS n_occ
      FROM m GROUP BY ALL"""


QUERIES["q_mentions_regions"] = q_mentions_regions
ORACLES["q_mentions_regions"] = _mentions_regions_sql()
QUERIES["q_rag"] = q_rag
ORACLES["q_knn_ivf_indexed"] = ORACLES["q_knn"]  # full probe == exact

ORACLES["q_colvision"] = """
  WITH pages AS (SELECT vec_id // 4 AS page_id, vec_id,
                        embedding::DOUBLE[] AS v FROM embeddings),
  q AS (SELECT vec_id // 4 AS query_id, vec_id,
               embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id < 12),
  best AS (
    SELECT q.query_id, q.vec_id AS qvec, p.page_id,
           max(list_dot_product(q.v, p.v)) AS m
    FROM q JOIN pages p ON TRUE
    GROUP BY 1, 2, 3
  ),
  score AS (SELECT query_id, page_id,
                   CAST(floor(sum(m) * 10000 + 0.5) AS BIGINT) AS score_e4
            FROM best GROUP BY 1, 2),
  ranked AS (SELECT *, row_number() OVER
               (PARTITION BY query_id
                ORDER BY score_e4 DESC, page_id) AS rnk
             FROM score)
  SELECT query_id, page_id, score_e4, rnk FROM ranked WHERE rnk <= 5"""


def q_asof_join(sf_dir: str):
    """Backward as-of join: each event matched to the SAME customer's
    most recent order at or before the event time (ties on order date
    broken by max orderkey) — the temporal join operator Ray Data
    lacks, built as the co-partitioned bucketed ``merge_asof`` of
    :func:`mmore_ray.stages.joins.asof_join` (scale notes there)."""
    from ..stages.joins import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def prep_ev(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "key": pa.array(df.user_id.to_numpy(dtype=np.int64)),
            "us": pa.array(_to_us(df.ts)),
            "event_id": pa.array(df.event_id.to_numpy(dtype=np.int64)),
        })

    def prep_ord(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "key": pa.array(df.o_custkey.to_numpy(dtype=np.int64)),
            "us": pa.array(_to_us(df.o_orderdate)),
            "last_orderkey": pa.array(df.o_orderkey.to_numpy(dtype=np.int64)),
            "last_total_cents": pa.array(_int_scale(df.o_totalprice, 100)),
        })

    joined = asof_join(
        ev.map_batches(prep_ev, batch_format="pandas"),
        orders.map_batches(prep_ord, batch_format="pandas"),
        by="key", on="us", left_cols=["event_id"],
        right_cols=["last_orderkey", "last_total_cents"],
        tiebreak="last_orderkey")
    return joined.select_columns(["event_id", "last_orderkey",
                                  "last_total_cents"])


def q_range_join(sf_dir: str):
    """Non-equi interval join + windowed aggregate: every 'purchase'
    event opens a 10-minute attribution window; count and sum the
    value of ALL events (any user — no equality key) inside each
    window.  Built on the band-bucketed
    :func:`mmore_ray.stages.joins.interval_agg_join` (replicate
    intervals into overlapped time bands, equi-merge per band, exact
    containment filter, partial-sum merge; scale notes there).  Every
    window contains its own opening event, so inner semantics lose no
    windows."""
    from ..stages.joins import interval_agg_join

    W_US = 10 * 60 * 1_000_000
    ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def prep_points(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "us": pa.array(_to_us(df.ts)),
            "sum_value_e2": pa.array(_int_scale(df.value, 100)),
        })

    def prep_intervals(df: pd.DataFrame) -> pa.Table:
        d = df[df.event_type == "purchase"]
        us = _to_us(d.ts)
        return pa.table({
            "window_id": pa.array(d.event_id.to_numpy(dtype=np.int64)),
            "start": pa.array(us),
            "end": pa.array(us + W_US),
        })

    return interval_agg_join(
        ev.map_batches(prep_points, batch_format="pandas"),
        ev.map_batches(prep_intervals, batch_format="pandas"),
        point_on="us", interval_id="window_id", interval_start="start",
        interval_end="end", sum_cols=["sum_value_e2"],
        bucket_width=W_US, count_col="n_events")


def q_distinct_per_group(sf_dir: str):
    """Exact distributed count-distinct per group
    (:func:`mmore_ray.stages.groupby.grouped_count_distinct`: pair-hash
    bucketing makes per-bucket counts disjoint partials; scale notes
    there)."""
    from ..stages.groupby import grouped_count_distinct

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])
    return grouped_count_distinct(li, ["l_returnflag"], "l_partkey",
                                  out_col="n_parts")


def q_median(sf_dir: str):
    """Exact grouped median (quantile_cont 0.5 interpolation) via the
    value-rollup selection of
    :func:`mmore_ray.stages.groupby.grouped_median` (scale notes and
    the distinct-values ≪ rows assumption there)."""
    from ..stages.groupby import grouped_median

    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_median(li, ["l_returnflag"], "l_quantity",
                          out_col="median_qty_e2", scale=100)


QUERIES["q_asof_join"] = q_asof_join
ORACLES["q_asof_join"] = """
    WITH m AS (
      SELECT e.event_id, o.o_orderkey, o.o_totalprice,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC,
                                         o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts)
    SELECT event_id, o_orderkey AS last_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS last_total_cents
    FROM m WHERE rn = 1"""
QUERIES["q_range_join"] = q_range_join
ORACLES["q_range_join"] = """
    SELECT i.event_id AS window_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(p.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_e2
    FROM events i JOIN events p
      ON p.ts >= i.ts AND p.ts < i.ts + INTERVAL 10 MINUTE
    WHERE i.event_type = 'purchase'
    GROUP BY i.event_id"""
QUERIES["q_distinct_per_group"] = q_distinct_per_group
ORACLES["q_distinct_per_group"] = """
    SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts
    FROM lineitem GROUP BY l_returnflag"""
QUERIES["q_median"] = q_median
ORACLES["q_median"] = """
    SELECT l_returnflag,
           CAST(floor(median(l_quantity) * 100 + 0.5) AS BIGINT)
             AS median_qty_e2
    FROM lineitem GROUP BY l_returnflag"""


def q_sliding_window(sf_dir: str):
    """Sliding-window aggregate (1-hour windows hopping by 15 min, per
    event type) — the hopping-window shape that tumbling
    (q_events_window) and session (q_sessionize) windows don't cover.
    Built on :func:`mmore_ray.stages.groupby.hopping_window_agg`
    (closed-form window replication + combiner + one bounded shuffle;
    scale notes there)."""
    from ..stages.groupby import hopping_window_agg

    ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "us": _to_us(df.ts),
            "event_type": df.event_type.to_numpy(),
            "sum_value_e2": _int_scale(df.value, 100),
        })

    return hopping_window_agg(
        ev, ts_col="us", keys=["event_type"], sum_cols=["sum_value_e2"],
        width=3_600_000_000, step=900_000_000, prepare=prep,
        count_col="n_events")


QUERIES["q_sliding_window"] = q_sliding_window
ORACLES["q_sliding_window"] = """
    WITH e AS (
      SELECT epoch_us(ts) AS us, event_type,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
      FROM events),
    r AS (
      SELECT us, event_type, v,
             unnest(range((us - 3600000000) // 900000000 + 1,
                          us // 900000000 + 1)) AS k
      FROM e)
    SELECT k * 900000000 AS window_start_us, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(v) AS BIGINT) AS sum_value_e2
    FROM r GROUP BY 1, 2"""


def q_topk_per_group(sf_dir: str):
    """Top-3 orders by value per customer — per-group top-k
    (:func:`mmore_ray.stages.groupby.topk_per_group`: per-batch
    k-survivor combiner + one bucketed shuffle; deterministic via the
    orderkey tie-break; scale notes there)."""
    from ..stages.groupby import topk_per_group

    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_totalprice"])

    def prep(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "o_custkey": pa.array(df.o_custkey.to_numpy(dtype=np.int64)),
            "o_orderkey": pa.array(df.o_orderkey.to_numpy(dtype=np.int64)),
            "totalprice_cents": pa.array(_int_scale(df.o_totalprice, 100)),
        })

    ds = orders.map_batches(prep, batch_format="pandas")
    return topk_per_group(ds, ["o_custkey"],
                          ["totalprice_cents", "o_orderkey"], k=3,
                          descending=[True, False])


def q_argmax_customer(sf_dir: str):
    """Per-group argmax (SQL ``max_by`` / ``arg_max`` semantics, made
    deterministic): for every nation, the customer carrying the
    highest account balance, ties broken by the smaller custkey — the
    k=1 case of the distributed k-survivor combiner
    (:func:`mmore_ray.stages.groupby.topk_per_group`)."""
    from ..stages.groupby import topk_per_group

    cust = _read(sf_dir, "customer",
                 ["c_nationkey", "c_custkey", "c_acctbal"])

    def prep(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "c_nationkey": pa.array(df.c_nationkey.to_numpy(dtype=np.int64)),
            "c_custkey": pa.array(df.c_custkey.to_numpy(dtype=np.int64)),
            "acctbal_cents": pa.array(_int_scale(df.c_acctbal, 100)),
        })

    ds = cust.map_batches(prep, batch_format="pandas")
    return topk_per_group(ds, ["c_nationkey"],
                          ["acctbal_cents", "c_custkey"], k=1,
                          descending=[True, False])


QUERIES["q_argmax_customer"] = q_argmax_customer
ORACLES["q_argmax_customer"] = """
    SELECT c_nationkey, c_custkey, acctbal_cents FROM (
      SELECT c_nationkey, c_custkey,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_cents,
             row_number() OVER (
               PARTITION BY c_nationkey
               ORDER BY CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                        c_custkey) AS rn
      FROM customer) WHERE rn = 1"""


QUERIES["q_topk_per_group"] = q_topk_per_group
ORACLES["q_topk_per_group"] = """
    SELECT o_custkey, o_orderkey, totalprice_cents FROM (
      SELECT o_custkey, o_orderkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
               AS totalprice_cents,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) DESC,
                        o_orderkey) AS rn
      FROM orders) WHERE rn <= 3"""


def q_order_gaps(sf_dir: str):
    """Ordered-window navigation (SQL ``lag() OVER (PARTITION BY ...
    ORDER BY ...)``): days since the customer's previous order, -1 for
    the first (sentinel, not NULL — a null int64 would float64-coerce
    the column on both engines and break value-hash parity).

    Scale shape: :func:`mmore_ray.stages.groupby.bucketed_window` —
    one hash-bucket shuffle co-locates each customer's orders; the
    shift is vectorized across ALL customers of a bucket at once
    (``groupby().shift`` — no per-group Python)."""
    from ..stages.groupby import bucketed_window

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(dtype=np.int64),
            "o_orderkey": df.o_orderkey.to_numpy(dtype=np.int64),
            # day-integer; unit-normalized like the other ts paths
            "_day": df.o_orderdate.to_numpy()
                      .astype("datetime64[D]").astype(np.int64),
        })

    def window_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "_day", "o_orderkey"],
                            kind="stable")
        prev = df.groupby("o_custkey", sort=False)["_day"].shift(1)
        gap = np.where(prev.isna(), -1,
                       df._day.to_numpy() - prev.to_numpy()).astype(np.int64)
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(),
            "o_orderkey": df.o_orderkey.to_numpy(),
            "gap_days": gap,
        })

    return bucketed_window(ds, ["o_custkey"], window_fn, prepare=prepare)


QUERIES["q_order_gaps"] = q_order_gaps
ORACLES["q_order_gaps"] = """
    SELECT o_custkey, o_orderkey,
           CAST(coalesce(date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate), -1) AS BIGINT) AS gap_days
    FROM orders"""


def q_rank_orders(sf_dir: str):
    """Ranking window functions (SQL ``rank()`` / ``dense_rank() OVER
    (PARTITION BY ... ORDER BY ...)``): each order's rank among its
    customer's orders by order DATE — ties (same-day orders) share a
    rank, with gaps for ``rank`` and without for ``dense_rank``
    (pandas ``groupby().rank(method='min'/'dense')`` matches SQL
    exactly; both are int64).

    Scale shape: same :func:`mmore_ray.stages.groupby.bucketed_window`
    single hash-bucket shuffle as q_order_gaps — the rank is computed
    vectorized across ALL customers of a bucket at once."""
    from ..stages.groupby import bucketed_window

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(dtype=np.int64),
            "o_orderkey": df.o_orderkey.to_numpy(dtype=np.int64),
            "_day": df.o_orderdate.to_numpy()
                      .astype("datetime64[D]").astype(np.int64),
        })

    def window_fn(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False)["_day"]
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(),
            "o_orderkey": df.o_orderkey.to_numpy(),
            "rnk": g.rank(method="min").to_numpy().astype(np.int64),
            "drnk": g.rank(method="dense").to_numpy().astype(np.int64),
        })

    return bucketed_window(ds, ["o_custkey"], window_fn, prepare=prepare)


def q_intersect_actors(sf_dir: str):
    """Set intersection (SQL ``INTERSECT``): ids that are BOTH
    high-value-order customers AND event users.

    Scale shape: each side collapses to its DISTINCT key set first
    (per-batch drop_duplicates combiner → one bounded bucket shuffle —
    dup-heavy sides never reach the join at row scale), then the
    adaptive :func:`mmore_ray.stages.joins.lookup_join` intersects the
    two small sets (broadcast when small, hash join when not)."""
    from ..stages.groupby import _BUCKET, _bucket_of
    from ..stages.joins import lookup_join

    def distinct(ds, col: str, out: str):
        def partial(df: pd.DataFrame) -> pa.Table:
            g = pd.DataFrame({out: df[col].astype(np.int64)}) \
                .drop_duplicates()
            g[_BUCKET] = _bucket_of(g, [out], 32)
            return pa.Table.from_pandas(g, preserve_index=False)

        def final(df: pd.DataFrame) -> pa.Table:
            return pa.Table.from_pandas(
                df.drop(columns=[_BUCKET]).drop_duplicates(),
                preserve_index=False)

        return (ds.map_batches(partial, batch_format="pandas")
                .groupby(_BUCKET).map_groups(final, batch_format="pandas"))

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    import pyarrow.compute as pc

    big = orders.map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 400_000.0)),
        batch_format="pyarrow")
    lhs = distinct(big, "o_custkey", "actor_id")
    rhs = distinct(_read(sf_dir, "events", ["user_id"]),
                   "user_id", "actor_id")
    return lookup_join(lhs, rhs, "actor_id", "actor_id")


QUERIES["q_intersect_actors"] = q_intersect_actors
ORACLES["q_intersect_actors"] = """
    SELECT o_custkey AS actor_id FROM orders WHERE o_totalprice > 400000
    INTERSECT
    SELECT user_id FROM events"""


QUERIES["q_rank_orders"] = q_rank_orders
ORACLES["q_rank_orders"] = """
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate) AS BIGINT) AS drnk
    FROM orders"""


def q_window_funcs(sf_dir: str):
    """The consolidated per-row window-function pass — running sum +
    row_number (q_running_total), lag gap (q_order_gaps) and rank /
    dense_rank (q_rank_orders) — over ONE
    :func:`mmore_ray.stages.groupby.bucketed_window` shuffle, so a
    single driver row value-checks all five window kernels.  At scale
    this is also the right plan: every per-customer window shares one
    hash-bucket co-location; each bucket computes all windows
    vectorized across ALL its customers at once (groupby cumsum /
    cumcount / shift / rank — no per-group Python)."""
    from ..stages.groupby import bucketed_window

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate",
                                  "o_totalprice"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(dtype=np.int64),
            "o_orderkey": df.o_orderkey.to_numpy(dtype=np.int64),
            "_day": df.o_orderdate.to_numpy()
                      .astype("datetime64[D]").astype(np.int64),
            "cents": _int_scale(df.o_totalprice, 100),
        })

    def window_fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "_day", "o_orderkey"],
                            kind="stable")
        g = df.groupby("o_custkey", sort=False)
        prev = g["_day"].shift(1)
        gap = np.where(prev.isna(), -1,
                       df._day.to_numpy() - prev.to_numpy()).astype(np.int64)
        return pd.DataFrame({
            "o_custkey": df.o_custkey.to_numpy(),
            "o_orderkey": df.o_orderkey.to_numpy(),
            "running_cents": g["cents"].cumsum().to_numpy(),
            "order_seq": (g.cumcount() + 1).to_numpy(),
            "gap_days": gap,
            "rnk": g["_day"].rank(method="min").to_numpy().astype(np.int64),
            "drnk": g["_day"].rank(method="dense").to_numpy()
                     .astype(np.int64),
        })

    return bucketed_window(ds, ["o_custkey"], window_fn, prepare=prepare)


QUERIES["q_window_funcs"] = q_window_funcs
ORACLES["q_window_funcs"] = """
    SELECT o_custkey, o_orderkey,
           CAST(sum(cents) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents,
           CAST(row_number() OVER w AS BIGINT) AS order_seq,
           CAST(coalesce(date_diff('day',
                 lag(o_orderdate) OVER w, o_orderdate), -1) AS BIGINT)
             AS gap_days,
           CAST(rank() OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate) AS BIGINT) AS drnk
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)"""


def q_rollup_revenue(sf_dir: str):
    """Hierarchical totals (SQL ``GROUP BY ROLLUP(year, month)``):
    revenue at (year, month), (year), and grand-total levels, rolled
    keys carrying -1 (see :func:`mmore_ray.stages.groupby.rollup_sum`
    for why not NULL).  One input scan; coarser levels re-aggregate
    the previous level's (small) output."""
    from ..stages.groupby import rollup_sum

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "order_year": df.o_orderdate.dt.year.astype(np.int64),
            "order_month": df.o_orderdate.dt.month.astype(np.int64),
            "n_orders": np.ones(len(df), dtype=np.int64),
            "revenue_cents": _int_scale(df.o_totalprice, 100),
        })

    return rollup_sum(ds, ["order_year", "order_month"],
                      ["n_orders", "revenue_cents"], prepare=prepare,
                      num_buckets=16)


QUERIES["q_rollup_revenue"] = q_rollup_revenue
ORACLES["q_rollup_revenue"] = """
    SELECT CAST(coalesce(order_year, -1) AS BIGINT) AS order_year,
           CAST(coalesce(order_month, -1) AS BIGINT) AS order_month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM (SELECT year(o_orderdate) AS order_year,
                 month(o_orderdate) AS order_month,
                 CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders)
    GROUP BY ROLLUP(order_year, order_month)"""


def q_pivot_events(sf_dir: str):
    """Pivot (long → wide): per hour-of-day, one count column per event
    type plus the summed value.  One-pass shape: the prepare stage
    emits indicator columns, so the pivot IS a grouped sum — one
    combiner-led shuffle over 24 groups, never a second pass or a
    driver-side reshape."""
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    types = ["click", "view", "purchase", "signup", "error"]

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        out = {"hour": df.ts.dt.hour.astype(np.int64)}
        for t in types:
            out[f"n_{t}"] = (df.event_type == t).to_numpy(dtype=np.int64)
        out["sum_value_e2"] = _int_scale(df.value, 100)
        return pd.DataFrame(out)

    return bucketed_sum(ds, ["hour"],
                        [f"n_{t}" for t in types] + ["sum_value_e2"],
                        prepare=prepare, num_buckets=8)


QUERIES["q_pivot_events"] = q_pivot_events
ORACLES["q_pivot_events"] = """
    SELECT CAST(hour(ts) AS BIGINT) AS hour,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_error,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
                AS sum_value_e2
    FROM events GROUP BY 1"""


def q_above_avg(sf_dir: str):
    """Correlated-subquery pattern: parts priced above their brand's
    average retail price.  Two phases sharing one partitioning: a
    combiner-led grouped (count, sum) — 25 brands, tiny — broadcast
    back as a dict; the filter compares ``cents × n > sum`` in exact
    int64 arithmetic (``price > avg`` without a float division, so the
    boundary rows hash identically on both engines)."""
    from ..stages.groupby import bucketed_sum

    ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_retailprice"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": df.p_partkey.to_numpy(dtype=np.int64),
            "p_brand": df.p_brand,
            "retail_cents": _int_scale(df.p_retailprice, 100),
            "_n": np.ones(len(df), dtype=np.int64),
        })

    prepped = ds.map_batches(
        lambda df: pa.Table.from_pandas(prep(df), preserve_index=False),
        batch_format="pandas")
    stats = bucketed_sum(prepped.select_columns(["p_brand", "retail_cents",
                                                 "_n"]),
                         ["p_brand"], ["retail_cents", "_n"], num_buckets=8)
    # grouped aggregate is brand-cardinality small — broadcast as a dict
    sdf = stats.to_pandas()
    by_brand = {b: (int(n), int(s)) for b, s, n in
                zip(sdf.p_brand, sdf.retail_cents, sdf._n)}
    ref = ray.put(by_brand)

    def flt(batch: pa.Table) -> pa.Table:
        stats_map = ray.get(ref)
        brands = batch.column("p_brand").to_pylist()
        cents = batch.column("retail_cents").to_numpy()
        n = np.array([stats_map[b][0] for b in brands], dtype=np.int64)
        s = np.array([stats_map[b][1] for b in brands], dtype=np.int64)
        keep = batch.filter(pa.array(cents * n > s))
        return keep.select(["p_partkey", "p_brand", "retail_cents"])

    return prepped.map_batches(flt, batch_format="pyarrow")


QUERIES["q_above_avg"] = q_above_avg
ORACLES["q_above_avg"] = """
    WITH p AS (SELECT p_partkey, p_brand,
                      CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
                        AS retail_cents
               FROM part),
         s AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt,
                      CAST(sum(retail_cents) AS BIGINT) AS total
               FROM p GROUP BY 1)
    SELECT p.p_partkey, p.p_brand, p.retail_cents
    FROM p JOIN s USING (p_brand)
    WHERE p.retail_cents * s.cnt > s.total"""


def q_collect_modes(sf_dir: str):
    """Grouped ordered collect (SQL ``string_agg(DISTINCT ... ORDER
    BY ...)``): the sorted comma-joined set of source systems per
    document language.  Scale shape: per-batch + per-bucket distinct
    (a drop_duplicates combiner — survivors bounded by the value
    domain, not row count), then the join runs per final group (a
    handful of languages — low cardinality, native groupby is the
    right plan)."""
    from ..stages.groupby import bucketed_agg

    keys = ["lang", "source"]
    ds = _read(sf_dir, "documents", keys)
    distinct = bucketed_agg(ds, keys,
                            lambda df, k: df[k].drop_duplicates(),
                            num_buckets=8)

    def join_modes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": [df.lang.iloc[0]],
            "sources": [",".join(sorted(df.source))],
        })

    return distinct.groupby(["lang"]).map_groups(join_modes,
                                                 batch_format="pandas")


QUERIES["q_collect_modes"] = q_collect_modes
ORACLES["q_collect_modes"] = """
    SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source)
             AS sources
    FROM documents GROUP BY 1"""


def q_sample_hash(sf_dir: str):
    """Deterministic ~10% sample by multiplicative key hash
    (Knuth 2654435761 mod 2^32) — reproducible across engines, runs
    and cluster sizes, unlike ``Dataset.random_sample``.  Fully
    vectorized (uint64 numpy arithmetic on the zero-copy key column);
    the SQL side computes the identical hash in BIGINT, so the sample
    sets match row-for-row."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey",
                                  "o_totalprice"])

    def fn(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey").to_numpy().astype(np.uint64)
        h = (k * np.uint64(2654435761)) % np.uint64(1 << 32)
        keep = batch.filter(pa.array(h < np.uint64(429496730)))
        cents = np.floor(keep.column("o_totalprice").to_numpy() * 100
                         + 0.5).astype(np.int64)
        return pa.table({
            "o_orderkey": keep.column("o_orderkey"),
            "o_custkey": keep.column("o_custkey"),
            "totalprice_cents": pa.array(cents),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


QUERIES["q_sample_hash"] = q_sample_hash
ORACLES["q_sample_hash"] = """
    SELECT o_orderkey, o_custkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS totalprice_cents
    FROM orders
    WHERE (o_orderkey * 2654435761) % 4294967296 < 429496730"""


def q_sample_per_group(sf_dir: str):
    """Fixed-size deterministic sample PER GROUP (reservoir-sampling
    semantics made reproducible): the 2 documents per language with
    the smallest multiplicative key hash — uniform within each group,
    identical across engines/runs/cluster sizes.  Rides
    :func:`mmore_ray.stages.groupby.topk_per_group`, so each batch
    forwards at most k survivors per group into one bucketed shuffle
    (a distributed reservoir with a k-survivor combiner)."""
    from ..stages.groupby import topk_per_group

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def prep(df: pd.DataFrame) -> pa.Table:
        k = df.doc_id.to_numpy(dtype=np.uint64)
        h = (k * np.uint64(2654435761)) % np.uint64(1 << 32)
        return pa.table({
            "doc_id": pa.array(df.doc_id.to_numpy(dtype=np.int64)),
            "lang": pa.array(df.lang),
            "_h": pa.array(h.astype(np.int64)),
        })

    picked = topk_per_group(ds.map_batches(prep, batch_format="pandas"),
                            ["lang"], ["_h", "doc_id"], k=2,
                            descending=False, num_buckets=8)
    return picked.select_columns(["doc_id", "lang"])


QUERIES["q_sample_per_group"] = q_sample_per_group
ORACLES["q_sample_per_group"] = """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
      FROM documents) WHERE rn <= 2"""


def q_distinct_approx(sf_dir: str):
    """Approximate distinct users per event type — HyperLogLog sketch
    (:func:`mmore_ray.stages.groupby.grouped_count_distinct_approx`).
    The scale path of q_distinct_per_group: register rows shuffled per
    (batch, group) are constant-size, independent of the distinct
    count (the exact op's shuffle grows with distinct pairs).  p=11 →
    ~2.3% stderr; accuracy + layout-determinism pinned in
    tests/test_properties.py."""
    from ..stages.groupby import grouped_count_distinct_approx

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    return grouped_count_distinct_approx(ds, ["event_type"], "user_id",
                                         "approx_users", num_buckets=8)


QUERIES["q_distinct_approx"] = q_distinct_approx


# ---------------------------------------------------------------------------
# Driver registry shaping
# ---------------------------------------------------------------------------
# The driver evaluates the first 50 registered queries, one CORRECTNESS
# row each (round 2 registered 58 and the last 8 got no row).  Operator
# families whose kernel already has a driver-green representative are
# demoted to EXTRA_QUERIES: still first-class callables, still
# value-checked against their DuckDB oracles by the pytest gate
# (tests/test_queries_oracle.py), just not burning one of the 50 rows.
#   q_running_total / q_order_gaps / q_rank_orders
#                          — merged into q_window_funcs (all five window
#                            kernels over ONE bucketed shuffle)
#   q_lang_id / q_quality / q_token_count
#                          — merged into q_text_analysis (one pass)
#   q_topk_brand           — per-group top-k; q_topk_per_group is the
#                            driver surface
#   q_filter_highvalue     — plain vectorized filter+project; subsumed
#                            by q_filter_length / q_sample_hash
#   q_distinct_flags       — plain grouped count; subsumed by every
#                            bucketed_sum query
#   q_streaming_sessionize — same output contract and oracle as
#                            q_sessionize; the incremental state
#                            machine is pinned by tests/test_streaming.py
#                            and the pytest oracle gate
#   q_knn_ivf              — approximate (no oracle); recall vs brute
#                            force pinned in pytest, exact-mode IVF is
#                            driver-checked via q_knn_ivf_indexed

QUERIES["q_text_analysis"] = q_text_analysis
ORACLES["q_text_analysis"] = rf"""
    SELECT q.doc_id, q.word_count, q.n_chars, q.mean_word_len_e2,
           q.stop_ratio_e4, q.punct_ratio_e4, l.lang_pred, t.n_tokens
    FROM ({_quality_sql()}) q
    JOIN ({_lang_id_sql()}) l USING (doc_id)
    JOIN (SELECT doc_id,
                 CAST(len(regexp_extract_all(text,
                      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
                   AS n_tokens
          FROM documents) t USING (doc_id)"""

QUERIES["q_rag_eval"] = q_rag_eval
ORACLES["q_rag_eval"] = """
    WITH vecs AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(embedding::DOUBLE[], x -> x * 1.01)
      FROM embeddings WHERE vec_id % 5 = 0
    ),
    q AS (SELECT vec_id AS query_id, v AS qv,
                 CASE WHEN vec_id % 3 = 0 THEN vec_id + 1000000
                      ELSE vec_id + 1 END AS gold_id
          FROM vecs WHERE vec_id < 100 AND vec_id % 5 = 0),
    s AS (
      SELECT q.query_id, q.gold_id, e.vec_id AS neighbor_id,
             CAST(floor(list_cosine_similarity(q.qv, e.v) * 10000 + 0.5)
                  AS BIGINT) AS cos_e4
      FROM q JOIN vecs e ON e.vec_id != q.query_id
    ),
    r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY cos_e4 DESC, neighbor_id) AS rnk FROM s)
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(gold_id AS BIGINT) AS gold_id,
           CAST(coalesce(max(CASE WHEN neighbor_id = gold_id AND rnk <= 10
                                  THEN rnk END), -1) AS BIGINT) AS gold_rank,
           CAST(coalesce(max(CASE WHEN neighbor_id = gold_id AND rnk <= 10
                                  THEN 1 END), 0) AS BIGINT) AS hit_at_10,
           CAST(coalesce(max(CASE WHEN neighbor_id = gold_id AND rnk <= 10
                                  THEN CAST(floor(1000000.0 / rnk + 0.5)
                                            AS BIGINT) END), 0)
                AS BIGINT) AS rr_e6
    FROM r GROUP BY 1, 2"""

_DEMOTED = [
    "q_running_total", "q_order_gaps", "q_rank_orders",
    "q_lang_id", "q_quality", "q_token_count",
    "q_topk_brand", "q_filter_highvalue", "q_distinct_flags",
    "q_streaming_sessionize", "q_knn_ivf",
]
EXTRA_QUERIES = {k: QUERIES.pop(k) for k in _DEMOTED}
EXTRA_ORACLES = {k: ORACLES.pop(k) for k in _DEMOTED if k in ORACLES}
# extras with no SQL oracle (pytest invariants instead of the gate)
EXTRA_NO_ORACLE: set[str] = {"q_knn_ivf"}

# Deterministic driver registration order: KG flagship first, then the
# relational / dedup / similarity / text / streaming operator families.
_DRIVER_ORDER = [
    "kg_corpus", "kg_mentions", "kg_triples", "kg_graph", "kg_lineage",
    "q1_pricing", "q3_top_orders", "q_nation_revenue",
    "q_orders_per_month", "q_events_window",
    "q_window_funcs",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_jaccard",
    "q_dedup_simhash", "q_dedup_embedding", "q_dedup_clusters",
    "q_knn", "q_knn_ivf_indexed", "q_colvision",
    "q_text_analysis", "q_chunk_fixed",
    "q_process_markdown", "q_process_pdf",
    "q_filter_length", "q_filter_quality",
    "q_sessionize", "q_anti_join", "q_json_props", "q_region_suppliers",
    "q_curate", "q_translate", "q_mentions_regions",
    "q_rag", "q_rag_eval",
    "q_asof_join", "q_range_join",
    "q_distinct_per_group", "q_median",
    "q_sliding_window", "q_argmax_customer", "q_topk_per_group",
    "q_intersect_actors",
    "q_rollup_revenue", "q_pivot_events", "q_above_avg",
    "q_collect_modes", "q_sample_hash", "q_sample_per_group",
    "q_distinct_approx",
]
assert set(_DRIVER_ORDER) == set(QUERIES), (
    sorted(set(_DRIVER_ORDER) ^ set(QUERIES)))
assert len(_DRIVER_ORDER) == 50, len(_DRIVER_ORDER)
QUERIES = {k: QUERIES[k] for k in _DRIVER_ORDER}


def q_fingerprint(sf_dir: str):
    """Per-document winnowing fingerprint (the text-analysis ladder's
    document-fingerprinting component; the reference has no analogue):
    4-word spans → md5 hash → the 8 smallest distinct values per doc,
    comma-joined sorted.  The md5 variant exists exactly so DuckDB can
    value-check the whole distributed computation
    (``md5_number_lower`` parity probed in
    stages/text_analysis.fingerprint_md5_batch); the crc32 rolling
    variant shares the span logic and is pinned in pytest
    (tests/test_dedup_similarity.py)."""
    from ..stages.text_analysis import fingerprint_md5_batch

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pa.Table:
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(dtype=np.int64)),
            "fingerprint": pa.array(fingerprint_md5_batch(df["text"]),
                                    pa.string()),
        })

    return ds.map_batches(fn, batch_format="pandas")


# EXTRA (pytest-gated) — the driver registry is frozen at 50 above
EXTRA_QUERIES["q_fingerprint"] = q_fingerprint
EXTRA_ORACLES["q_fingerprint"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sp AS (
      SELECT doc_id,
             CASE WHEN len(ws) < 4 THEN array_to_string(ws, ' ')
                  ELSE array_to_string(ws[i : i+3], ' ') END AS span
      FROM w, unnest(range(1, greatest(len(ws) - 3, 1) + 1)) AS t(i)
    ),
    h AS (SELECT DISTINCT doc_id,
                 md5_number_lower(span) % 4611686018427387904 AS hv
          FROM sp),
    r AS (SELECT doc_id, hv,
                 row_number() OVER (PARTITION BY doc_id ORDER BY hv) AS rn
          FROM h)
    SELECT doc_id,
           string_agg(CAST(hv AS VARCHAR), ',' ORDER BY hv) AS fingerprint
    FROM r WHERE rn <= 8 GROUP BY doc_id"""


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination (stages/dedup.decontaminate): flag
    every corpus doc sharing an exact 8-word shingle with the
    'benchmark' (every 53rd base doc's text) — corpus is documents ∪
    near copies, so benchmark members and their perturbed copies must
    both flag.  The benchmark-side gather is small BY DEFINITION (eval
    suites are KBs; here 1/53 of the table) — the corpus side streams
    through one broadcast membership map, no shuffle."""
    from ..stages.dedup import decontaminate

    bench_rows = (_read(sf_dir, "documents", ["doc_id", "text"])
                  .map_batches(lambda t: t.filter(
                      _mod_eq(t.column("doc_id"), 53)),
                      batch_format="pyarrow")
                  .take_all())
    bench = [r["text"] for r in bench_rows]
    return decontaminate(_docs_with_near_copies(sf_dir), bench,
                         k=8).select_columns(["doc_id", "contaminated"])


def _inject_pii(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic email/IPv4/phone injection (ONE copy — its
    constants mirror the SQL oracles' ``src`` CTE verbatim)."""
    i = df["doc_id"].astype("int64")
    s = i.astype(str)
    text = df["text"].astype(str)
    text = text.where(i % 3 != 0, text + " mail user" + s + "@ex"
                      + (i % 7).astype(str) + ".org")
    text = text.where(i % 4 != 0, text + " host 10."
                      + (i % 200).astype(str) + ".3."
                      + (i % 250).astype(str))
    text = text.where(i % 5 != 0, text + " tel +41-22-555-"
                      + (1000 + i % 9000).astype(str))
    return pd.DataFrame({"doc_id": i, "text": text})


_INJECT_PII_SQL = """
      SELECT doc_id, text
        || CASE WHEN doc_id % 3 = 0 THEN ' mail user' || CAST(doc_id AS VARCHAR)
                || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org' ELSE '' END
        || CASE WHEN doc_id % 4 = 0 THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR)
                || '.3.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 5 = 0 THEN ' tel +41-22-555-'
                || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END AS text
      FROM documents"""


def q_redact_pii(sf_dir: str):
    """PII redaction (stages/scrub.redact_pii): deterministic
    email/IPv4/phone injection, then the vectorized RE2 scrub —
    redacted text + per-doc redaction count, value-checked against
    DuckDB's RE2 ``regexp_replace(..., 'g')`` on identical patterns."""
    from ..stages.scrub import redact_pii

    src = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _inject_pii, batch_format="pandas")
    return redact_pii(src).select_columns(
        ["doc_id", "text", "n_redactions"])


EXTRA_QUERIES["q_decontaminate"] = q_decontaminate
EXTRA_ORACLES["q_decontaminate"] = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' extradup'
      FROM documents WHERE doc_id % 5 = 0
    ),
    bw AS (SELECT string_split(text, ' ') AS ws
           FROM documents WHERE doc_id % 53 = 0),
    bsp AS (
      SELECT DISTINCT CASE WHEN len(ws) < 8 THEN array_to_string(ws, ' ')
                  ELSE array_to_string(ws[i : i+7], ' ') END AS span
      FROM bw, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
    ),
    dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
    dsp AS (
      SELECT doc_id,
             CASE WHEN len(ws) < 8 THEN array_to_string(ws, ' ')
                  ELSE array_to_string(ws[i : i+7], ' ') END AS span
      FROM dw, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
    ),
    hits AS (SELECT DISTINCT d.doc_id FROM dsp d JOIN bsp b USING (span))
    SELECT c.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM corpus c LEFT JOIN hits h USING (doc_id)"""

def _redact_sql(src: str) -> str:
    """(doc_id, text, n_redactions) after the 3-pattern scrub of
    ``src`` — the SAME patterns in the SAME order as
    stages/scrub.PII_PATTERNS, each count taken on the text the
    corresponding replace sees (mirroring redact_pii_batch's fold).
    Self-contained nested-subquery form so it composes inside any
    WITH."""
    from ..stages.scrub import PII_PATTERNS

    (em, ip, ph) = (p for _, p, _ in PII_PATTERNS)
    return f"""
      SELECT doc_id,
             regexp_replace(t2, '{ph}', '<PHONE>', 'g') AS text,
             n1 + n2 + len(regexp_extract_all(t2, '{ph}')) AS n_redactions
      FROM (
        SELECT doc_id, n1,
               len(regexp_extract_all(t1, '{ip}')) AS n2,
               regexp_replace(t1, '{ip}', '<IP>', 'g') AS t2
        FROM (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{em}')) AS n1,
                 regexp_replace(text, '{em}', '<EMAIL>', 'g') AS t1
          FROM {src}))"""


EXTRA_QUERIES["q_redact_pii"] = q_redact_pii
EXTRA_ORACLES["q_redact_pii"] = (
    f"WITH src AS ({_INJECT_PII_SQL}) {_redact_sql('src')}")


def q_token_budget_mix(sf_dir: str):
    """Domain-mixture sampling (stages/mixing.sample_to_token_budget):
    downsample each language to a 2000-token budget — hash-ordered
    deterministic prefix per group, the doc crossing the boundary
    included.  One bucketed-window shuffle; value-checked against the
    SQL running-sum window."""
    from ..stages.mixing import sample_to_token_budget

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
    return sample_to_token_budget(ds, "lang", budget=2000)


EXTRA_QUERIES["q_token_budget_mix"] = q_token_budget_mix
EXTRA_ORACLES["q_token_budget_mix"] = r"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens,
             (doc_id * 2654435761) % 4294967296 AS h
      FROM documents),
    w AS (
      SELECT *, sum(n_tokens) OVER (
               PARTITION BY lang ORDER BY h, doc_id
               ROWS UNBOUNDED PRECEDING) AS run
      FROM t)
    SELECT doc_id, lang, n_tokens FROM w WHERE run - n_tokens < 2000"""


def q_dup_spans(sf_dir: str):
    """Cross-document duplicate-n-gram fraction
    (stages/dedup.dup_span_fraction): per doc, the share of its
    distinct 8-word spans occurring in ≥ 2 documents — the Gopher/
    Dolma boilerplate signal, corpus-wide.  Corpus is documents ∪ near
    copies so the signal is non-trivial (a near-copied doc's spans are
    almost all duplicated)."""
    from ..stages.dedup import dup_span_fraction

    out = dup_span_fraction(_docs_with_near_copies(sf_dir), k=8)
    return out.select_columns(["id", "n_spans", "n_dup", "dup_frac_e4"])


EXTRA_QUERIES["q_dup_spans"] = q_dup_spans
EXTRA_ORACLES["q_dup_spans"] = """
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text || ' extradup'
      FROM documents WHERE doc_id % 5 = 0
    ),
    dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
    dsp AS (
      SELECT DISTINCT doc_id,
             CASE WHEN len(ws) < 8 THEN array_to_string(ws, ' ')
                  ELSE array_to_string(ws[i : i+7], ' ') END AS span
      FROM dw, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
    ),
    sdf AS (SELECT span, count(*) AS df_cnt FROM dsp GROUP BY span)
    SELECT d.doc_id AS id,
           count(*) AS n_spans,
           CAST(sum(CASE WHEN s.df_cnt >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup,
           CAST(floor(sum(CASE WHEN s.df_cnt >= 2 THEN 1 ELSE 0 END)
                      / count(*) * 10000 + 0.5) AS BIGINT) AS dup_frac_e4
    FROM dsp d JOIN sdf s USING (span)
    GROUP BY d.doc_id"""


def q_curate_full(sf_dir: str):
    """The FULL published curation recipe end-to-end
    (pipelines/curate.curate_full): decontaminate (drop, 8-gram overlap
    with every-53rd-doc 'benchmark') → PII redaction → quality/lang
    gates → exact dedup → near-dup dedup, over the tri-union corpus
    with injected PII.  Every stage is an already-oracle-checked
    operator; this checks their COMPOSITION value-exactly."""
    from ..pipelines.curate import curate_full

    injected = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        _inject_pii, batch_format="pandas")
    # benchmark gather: filter BEFORE injecting (injection is per-row
    # on doc_id, so it commutes) — only 1/53 of the corpus pays the
    # second injection pass
    bench = [r["text"] for r in
             _read(sf_dir, "documents", ["doc_id", "text"])
             .map_batches(lambda t: t.filter(
                 _mod_eq(t.column("doc_id"), 53)), batch_format="pyarrow")
             .map_batches(_inject_pii, batch_format="pandas")
             .take_all()]
    src = injected.map_batches(_tri_union, batch_format="pyarrow")
    return curate_full(src, bench,
                       group_cap=None)  # oracle parity: see q_dedup_minhash


def _curate_full_sql() -> str:
    """The extended ladder in one DuckDB query, composed from the SAME
    SQL fragments the per-stage oracles use (injection, 8-gram decontam
    spans, 3-pattern redaction, quality, lang, 3-gram Jaccard)."""
    return f"""
      WITH src AS ({_INJECT_PII_SQL}),
      cdocs AS (
        SELECT doc_id, text FROM src
        UNION ALL
        SELECT doc_id + 500000, text FROM src WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 1000000, text || ' extradup'
        FROM src WHERE doc_id % 5 = 0
      ),
      bw AS (SELECT string_split(text, ' ') AS ws
             FROM src WHERE doc_id % 53 = 0),
      bsp AS (
        SELECT DISTINCT CASE WHEN len(ws) < 8 THEN array_to_string(ws, ' ')
                    ELSE array_to_string(ws[i : i+7], ' ') END AS span
        FROM bw, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
      ),
      dw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM cdocs),
      dsp AS (
        SELECT doc_id,
               CASE WHEN len(ws) < 8 THEN array_to_string(ws, ' ')
                    ELSE array_to_string(ws[i : i+7], ' ') END AS span
        FROM dw, unnest(range(1, greatest(len(ws) - 7, 1) + 1)) AS t(i)
      ),
      contaminated AS (SELECT DISTINCT d.doc_id
                       FROM dsp d JOIN bsp b USING (span)),
      decon AS (SELECT * FROM cdocs
                WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
      rdocs AS ({_redact_sql("decon")}
      ){_curate_ladder_sql("rdocs", extras=("n_redactions",))}"""


EXTRA_QUERIES["q_curate_full"] = q_curate_full
EXTRA_ORACLES["q_curate_full"] = _curate_full_sql()


def q_kmeans_assign(sf_dir: str):
    """Nearest-centroid assignment (stages/clustering.kmeans_assign)
    with FIXED centroids — the first 4 embedding rows — so the
    assignment half of k-means is SQL-checkable value-for-value
    (cosine argmax, ties → lowest centroid id, the knn family's e4
    rounding).  The iterative fit half is q_kmeans (rows-only) + the
    numpy-differential pytest."""
    import pyarrow.compute as pc

    from ..stages.clustering import kmeans_assign

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    rows = sorted(ds.map_batches(
        lambda t: t.filter(pc.less(t.column("vec_id"), 4)),
        batch_format="pyarrow").take_all(), key=lambda r: r["vec_id"])
    cents = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return kmeans_assign(ds, cents).select_columns(
        ["vec_id", "cluster", "cos_e4"])


def q_kmeans(sf_dir: str):
    """Full distributed k-means (stages/clustering.kmeans_fit: seeded
    sample init + 3 Lloyd passes over every vector, k=8) → cluster
    SIZES.  Iterative → no SQL oracle (rows-only driver check); the
    fit is pinned exactly against a driver-side reference Lloyd in
    tests/test_clustering.py."""
    from ..stages.clustering import kmeans_assign, kmeans_fit
    from ..stages.groupby import bucketed_agg

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    C = kmeans_fit(ds, n_clusters=8, iters=3)
    assigned = kmeans_assign(ds, C).select_columns(["cluster"])
    # agg is idempotent (applied per batch AND per bucket): the count
    # column keeps ONE name end to end so re-aggregation sums partials
    return bucketed_agg(
        assigned, ["cluster"],
        lambda df, keys: df.groupby("cluster", as_index=False, sort=False
                                    ).agg(n_vectors=("n_vectors", "sum")),
        prepare=lambda df: df.assign(n_vectors=np.int64(1)),
        num_buckets=8)


EXTRA_QUERIES["q_kmeans_assign"] = q_kmeans_assign
EXTRA_ORACLES["q_kmeans_assign"] = """
    WITH c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
               FROM embeddings WHERE vec_id < 4),
    s AS (SELECT e.vec_id, c.cid,
                 list_cosine_similarity(e.embedding::DOUBLE[], c.cv) AS sim
          FROM embeddings e JOIN c ON TRUE),
    r AS (SELECT vec_id, cid, sim,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY sim DESC, cid) AS rn
          FROM s)
    SELECT vec_id, CAST(cid AS BIGINT) AS cluster,
           CAST(floor(sim * 10000 + 0.5) AS BIGINT) AS cos_e4
    FROM r WHERE rn = 1"""

EXTRA_QUERIES["q_kmeans"] = q_kmeans
EXTRA_NO_ORACLE.add("q_kmeans")


def _lineify(batch: pa.Table) -> pa.Table:
    """Deterministic line structure for the repetition signals: 6-word
    lines, and docs with doc_id % 3 == 0 get their FIRST line appended
    twice (guaranteed duplicates).  Test-variant builder (the corpus
    has no newlines) — per-row loop is fine here, the OPERATOR under
    test is the vectorized repetition_stats kernel.  Mirrors the SQL
    oracle's base/extra CTEs verbatim."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    lined = []
    for i, txt in zip(ids, texts):
        ws = (txt or "").split(" ")
        lines = [" ".join(ws[j:j + 6]) for j in range(0, len(ws), 6)]
        if i % 3 == 0 and lines:
            lines += [lines[0], lines[0]]
        lined.append("\n".join(lines))
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(lined, pa.string())})


def q_repetition(sf_dir: str):
    """Gopher-style duplicate-line repetition signals
    (stages/text_analysis.repetition_stats) over the line-ified corpus —
    the standard within-document repetition gate of a pre-training
    quality pipeline (Rae et al. 2021 Table A1)."""
    from ..stages.text_analysis import repetition_stats

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        stats = repetition_stats(df, "text")
        stats.insert(0, "doc_id", df["doc_id"].astype(np.int64))
        return stats

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(_lineify, batch_format="pyarrow")
            .map_batches(fn, batch_format="pandas"))


EXTRA_QUERIES["q_repetition"] = q_repetition
EXTRA_ORACLES["q_repetition"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    base AS (
      SELECT doc_id,
             array_to_string(ws[(j-1)*6+1 : (j-1)*6+6], ' ') AS line, j
      FROM w, unnest(range(1, CAST(ceil(len(ws)/6.0) AS BIGINT) + 1)) AS t(j)
    ),
    extra AS (
      SELECT doc_id, line FROM base WHERE j = 1 AND doc_id % 3 = 0
      UNION ALL
      SELECT doc_id, line FROM base WHERE j = 1 AND doc_id % 3 = 0
    ),
    lines AS (SELECT doc_id, line FROM base
              UNION ALL SELECT doc_id, line FROM extra),
    l AS (SELECT doc_id, line, length(line) AS ln
          FROM lines WHERE line <> ''),
    g AS (SELECT doc_id, line, count(*) AS c, min(ln) AS ln
          FROM l GROUP BY doc_id, line),
    per AS (SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n,
                   CAST(count(*) AS BIGINT) AS d,
                   CAST(sum(c * ln) AS BIGINT) AS chars,
                   CAST(sum((c - 1) * ln) AS BIGINT) AS dupchars
            FROM g GROUP BY doc_id)
    -- divide FIRST then scale: identical float64 operation order as
    -- the numpy kernel, so floor(x+0.5) agrees on half-exact ratios
    SELECT d0.doc_id,
           COALESCE(per.n, 0) AS n_lines,
           COALESCE(CAST(floor((per.n - per.d) * 1.0 / per.n * 10000.0 + 0.5)
                         AS BIGINT), 0) AS dup_line_frac_e4,
           CASE WHEN COALESCE(per.chars, 0) = 0 THEN 0
                ELSE CAST(floor(per.dupchars * 1.0 / per.chars * 10000.0 + 0.5)
                          AS BIGINT) END AS dup_line_char_frac_e4
    FROM documents d0 LEFT JOIN per USING (doc_id)"""


def q_top_ngram(sf_dir: str):
    """Gopher-style top-n-gram concentration
    (stages/text_analysis.top_ngram_stats): per doc, the char fraction
    covered by the most char-covering word 2-gram and 3-gram — the
    within-document repetition gate complementing q_repetition's
    duplicate-line family."""
    from ..stages.text_analysis import top_ngram_stats

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        stats = top_ngram_stats(df, "text", ns=(2, 3))
        stats.insert(0, "doc_id", df["doc_id"].astype(np.int64))
        return stats

    return (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(fn, batch_format="pandas"))


EXTRA_QUERIES["q_top_ngram"] = q_top_ngram
EXTRA_ORACLES["q_top_ngram"] = """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws,
                      length(text) AS nc FROM documents),
    g2 AS (SELECT doc_id, array_to_string(ws[i : i+1], ' ') AS g
           FROM w, unnest(range(1, len(ws))) AS t(i)),
    g3 AS (SELECT doc_id, array_to_string(ws[i : i+2], ' ') AS g
           FROM w, unnest(range(1, len(ws) - 1)) AS t(i)),
    m2 AS (SELECT doc_id, max(c * length(g)) AS m FROM (
             SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
           GROUP BY doc_id),
    m3 AS (SELECT doc_id, max(c * length(g)) AS m FROM (
             SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g)
           GROUP BY doc_id)
    -- divide FIRST then scale (float64 op-order parity with the kernel)
    SELECT w.doc_id,
           COALESCE(CAST(floor(m2.m * 1.0 / w.nc * 10000.0 + 0.5) AS BIGINT), 0)
               AS top2gram_char_frac_e4,
           COALESCE(CAST(floor(m3.m * 1.0 / w.nc * 10000.0 + 0.5) AS BIGINT), 0)
               AS top3gram_char_frac_e4
    FROM w LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)"""


_KG_LOOKUP_SUBJ = "BARACK OBAMA"


def _kg_run_dir(sf_dir: str) -> str:
    """Completed run_kg output for this corpus under /tmp, built (or
    resumed) on first use — run_kg's manifest makes the repeat call a
    cheap no-op once finalize has published.  The cache tag covers the
    source file's identity, the extraction-config digest AND a digest
    of the pipeline source modules, so neither a gazetteer/alias change
    nor a code change can serve stale cached output (a stale hit would
    make the oracle gate silently validate OLD code).  Not safe against
    two processes building the same tag concurrently (the oracle gates
    run queries serially)."""
    import hashlib
    import inspect
    import os

    from ..functions import hashing as _hashing
    from ..stages import canonicalize, linking, mentions, sortwrite, triples
    from ..state import fsio as _fsio
    from ..state import manifest as _manifest
    from . import kg as _kg

    code = hashlib.sha1()
    for mod in (_kg, mentions, triples, linking, canonicalize, sortwrite,
                _hashing, _fsio, _manifest):
        code.update(inspect.getsource(mod).encode())
    src = os.stat(f"{sf_dir}/documents.parquet")
    cfg = _kg._config_digest(None, None, None)[:8]
    tag = hashlib.sha1(
        f"{sf_dir}:{src.st_mtime_ns}:{src.st_size}:{cfg}:"
        f"{code.hexdigest()}".encode()).hexdigest()[:10]
    out = f"/tmp/kg_run_{tag}"
    _kg.run_kg(lambda: _corpus_ds(sf_dir), out, num_shards=4)
    return out


def q_kg_lookup(sf_dir: str):
    """Serving-side point lookup over a completed run's globally sorted
    triple shards (pipelines/kg.kg_lookup — the payoff of the sorted
    layout): answers ``subj = 'BARACK OBAMA'`` by opening ONLY the
    partitions whose key range can contain the subject (the file-open
    count is asserted in tests/test_kg_pipeline.py) and must return
    exactly the rows the corpus-scale doc_triple relation holds for
    it."""
    from .kg import kg_lookup

    t = kg_lookup(_kg_run_dir(sf_dir), _KG_LOOKUP_SUBJ)
    return t.select(["repo", "path", "content_sha256",
                     "subj", "pred", "obj", "weight"])


EXTRA_QUERIES["q_kg_lookup"] = q_kg_lookup
EXTRA_ORACLES["q_kg_lookup"] = _kg_sql(
    "SELECT repo, path, content_sha256, subj, pred, obj, weight "
    f"FROM doc_triple WHERE subj = '{_KG_LOOKUP_SUBJ}'")


def q_websearch(sf_dir: str):
    """Web-search-augmented RAG (pipelines/websearch.py — the
    reference's websearchRAG loop): three fixed questions driven
    through the full per-record orchestration (subquery generation,
    loop-1 relevance gate, dual token budgets, cross-loop snippet
    dedup, per-subquery/per-loop summaries, labeled synthesis) on the
    deterministic offline search + research-LLM providers, as an
    actor-pool map_batches stage.  Multi-call LLM orchestration is not
    SQL-expressible → NO_ORACLE (rows-only driver check; the
    orchestration semantics are pinned case-for-case against the
    reference's own test families in tests/test_websearch.py, and this
    query's byte-exact output in test_q_websearch_deterministic)."""
    import ray.data

    from .websearch import WebsearchConfig, websearch_answers

    queries = [
        {"query_id": 0, "input": "how do customers place pending orders"},
        {"query_id": 1, "input": "final deposits across the foxes"},
        {"query_id": 2, "input": "slyly regular packages wake quickly"},
    ]
    out = websearch_answers(
        ray.data.from_items(queries),
        WebsearchConfig(n_loops=2, n_subqueries=2),
        concurrency=2, batch_size=2)
    return out.select_columns(["query_id", "query", "web_summary",
                               "short_answer", "detailed_answer",
                               "sources"]).sort("query_id")


EXTRA_QUERIES["q_websearch"] = q_websearch
EXTRA_NO_ORACLE.add("q_websearch")
