"""Embedding + index + retrieve (reference §3.3 ``mmore index`` /
``mmore retrieve`` analogue).

The reference embeds batches of 64 docs (dense sentence-transformers +
sparse SPLADE) into a Milvus collection (``index/indexer.py:115-216``)
and retrieves with a dense/sparse WeightedRanker hybrid
(``rag/retriever.py:182-231``).  Here:

  * embedders are actor-pool stages with the model "loaded" in
    ``__init__`` — deterministic fakes (the reference's own tests run
    on FakeEmbeddings / FakeSparseEmbedding, tests/conftest.py:15-22);
  * the collection is partitioned parquet (id, document_id, text,
    dense, sparse indices/values, metadata columns kept dynamic —
    enable_dynamic_field analogue);
  * retrieval is brute-force hybrid scoring over the collection via
    the same broadcast-query pattern as stages/similarity.py.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

EMBED_BATCH = 64  # reference indexer insert batch (indexer.py:96,176)


class FakeDenseEmbedder:
    """Deterministic dense embedder: sha256-stream moments × seeded
    projection (unit-normalized).  Actor-pool stage."""

    def __init__(self, dim: int = 16, seed: int = 7):
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal((32, dim))

    def embed_one(self, text: str) -> np.ndarray:
        digest = hashlib.sha256(text.encode()).digest()
        x = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        v = x @ self._proj
        return v / max(np.linalg.norm(v), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = [self.embed_one(t).tolist()
                for t in batch.column("text").to_pylist()]
        return batch.append_column(
            "dense_embedding", pa.array(vecs, pa.list_(pa.float64())))


class FakeSparseEmbedder:
    """Deterministic sparse embedder (SPLADE analogue): crc32 word
    buckets with log-tf values, top-8 kept."""

    def __init__(self, vocab_size: int = 1024, top_k: int = 8):
        self._vocab = vocab_size
        self._k = top_k

    def embed_one(self, text: str) -> tuple[list[int], list[float]]:
        tf: dict[int, int] = {}
        for w in text.split():
            idx = zlib.crc32(w.lower().encode()) % self._vocab
            tf[idx] = tf.get(idx, 0) + 1
        items = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[:self._k]
        return ([i for i, _ in items],
                [float(np.log1p(c)) for _, c in items])

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, vals = [], []
        for t in batch.column("text").to_pylist():
            i, v = self.embed_one(t)
            idxs.append(i)
            vals.append(v)
        batch = batch.append_column(
            "sparse_indices", pa.array(idxs, pa.list_(pa.int64())))
        return batch.append_column(
            "sparse_values", pa.array(vals, pa.list_(pa.float64())))


def index_documents(ds, out_dir: str, concurrency=(1, 4),
                    dense_provider: str | None = None,
                    sparse_provider: str | None = None) -> None:
    """Embed (dense + sparse actor pools, batch 64) and write the
    parquet collection.  Extra input columns ride along (dynamic-field
    analogue).

    The embedder classes come from the model-provider registry
    (``mmore_ray.models``): default = deterministic fakes; a real
    checkpoint is ``dense_provider="sentence-transformers"`` (or the
    ``MMORE_RAY_DENSE_EMBEDDER`` env var) — no other code changes."""
    import os
    import shutil

    from ..models import provider_class

    # resolve providers BEFORE touching the existing collection: a bad
    # provider name / env var raises here with the old index intact
    dense_cls = provider_class("dense_embedder", dense_provider)
    sparse_cls = provider_class("sparse_embedder", sparse_provider)
    out = (
        ds.map_batches(dense_cls, batch_format="pyarrow",
                       batch_size=EMBED_BATCH, concurrency=concurrency)
        .map_batches(sparse_cls, batch_format="pyarrow",
                     batch_size=EMBED_BATCH, concurrency=concurrency)
    )
    # sink convention (colvision.py / build_ivf_index): write_parquet
    # APPENDS uniquely-named files, so a re-index into an existing
    # collection dir would silently merge stale and new rows and
    # retrieve() would return ghost/duplicate hits.  Write-then-swap:
    # a failed or interrupted re-index leaves the old collection
    # untouched (same tmp+replace shape as run_process's merged sink).
    tmp_dir = out_dir.rstrip("/") + ".tmp"
    shutil.rmtree(tmp_dir, ignore_errors=True)
    # pre-create: Ray writes NO files (and no directory) for an empty
    # dataset, and the swap below must still run — an empty collection
    # is the correct result of indexing zero docs, not a lost index
    os.makedirs(tmp_dir, exist_ok=True)
    out.write_parquet(tmp_dir)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp_dir, out_dir)


class FakeReranker:
    """Cross-encoder reranker analogue (reference BGE reranker,
    rag/retriever.py:88-106, batch scoring :281-322).

    Actor-pool stage: "model" loads once per actor; scores each
    (query, doc) pair — here a deterministic token-overlap × idf-ish
    kernel standing in for the cross-encoder forward pass.  Batch size
    32 matches the reference's scoring batch."""

    BATCH = 32

    def __init__(self, query_text: str = ""):
        self._q = query_text.lower().split()

    def score_pair(self, doc: str) -> float:
        toks = doc.lower().split()
        if not toks or not self._q:
            return 0.0
        overlap = sum(1 for t in self._q if t in toks)
        return overlap / (len(self._q) + 0.5 * abs(len(toks) - len(self._q)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        scores = [self.score_pair(t) for t in batch.column("text").to_pylist()]
        return batch.append_column("rerank_score",
                                   pa.array(scores, pa.float64()))


def get_by_ids(collection_dir: str, ids: list[str]):
    """≙ Milvus `id in [...]` expression lookup (rag/retriever.py:415-455):
    broadcast the id set, filter the collection."""
    import pyarrow.compute as pc
    import ray.data

    # vectorized membership over the whole collection scan
    ref = ray.put(pa.array(sorted(set(ids)), pa.string()))

    def fn(batch: pa.Table) -> pa.Table:
        want = ray.get(ref)
        return batch.filter(
            pc.is_in(batch.column("sample_id"), value_set=want))

    from mmore_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(collection_dir).map_batches(
        fn, batch_format="pyarrow")


def retrieve(collection_dir: str, query_text: str, k: int = 5,
             dense_weight: float = 0.5, rerank: bool = False,
             dense_provider: str | None = None,
             sparse_provider: str | None = None,
             reranker_provider: str | None = None):
    """Hybrid retrieval: WeightedRanker(w·dense_cos + (1-w)·sparse_dot)
    over the parquet collection (brute force, broadcast query).

    Query embedders / reranker resolve through the model-provider
    registry — they must match the providers that built the
    collection."""
    import ray.data

    from ..models import get_instance, provider_class

    # per-process singleton instances: a real checkpoint loads once per
    # process, not once per query (RetrieverSession serves many)
    dense_q = np.asarray(get_instance(
        "dense_embedder", dense_provider).embed_one(query_text),
        dtype=np.float64)
    sq_idx, sq_val = get_instance("sparse_embedder",
                                  sparse_provider).embed_one(query_text)
    _o = np.argsort(np.asarray(sq_idx, dtype=np.int64))
    q_ref = ray.put((dense_q, np.asarray(sq_idx, np.int64)[_o],
                     np.asarray(sq_val, np.float64)[_o]))

    def score(batch: pa.Table) -> pa.Table:
        # the collection MUST carry sample_id (index_documents writes
        # it; it is also topk's tie-break below) — a silent fallback
        # here would only crash later, wider, in the shuffle
        keep = batch.select(["sample_id", "text"])
        if batch.num_rows == 0:  # empty block: (0,) @ (dim,) raises
            return keep.append_column("score", pa.array([], pa.float64()))
        import pyarrow.compute as pc

        dq, sidx, sval = ray.get(q_ref)
        # Arrow-native extraction (list_flatten → reshape): this scans
        # the whole collection per query — to_pylist would allocate a
        # Python float per vector element
        dense = pc.list_flatten(batch.column("dense_embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64) \
            .reshape(batch.num_rows, -1)
        d_cos = dense @ dq
        # vectorized sparse dot: flatten the per-row index/value lists,
        # look each index up in the SORTED query arrays (searchsorted),
        # multiply, and segment-sum back per row
        flat_i = pc.list_flatten(batch.column("sparse_indices")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat_v = pc.list_flatten(batch.column("sparse_values")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        counts = pc.list_value_length(batch.column("sparse_indices")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        s_dot = np.zeros(batch.num_rows, np.float64)
        if len(flat_i) and len(sidx):
            pos = np.minimum(np.searchsorted(sidx, flat_i), len(sidx) - 1)
            qw = np.where(sidx[pos] == flat_i, sval[pos], 0.0)
            np.add.at(s_dot, np.repeat(np.arange(batch.num_rows), counts),
                      qw * flat_v)
        hybrid = dense_weight * d_cos + (1 - dense_weight) * s_dot
        return keep.append_column("score", pa.array(hybrid, pa.float64()))

    from mmore_ray.sources.readers import read_parquet_clean

    ds = read_parquet_clean(collection_dir)
    scored = ds.map_batches(score, batch_format="pyarrow")
    from .groupby import topk

    # sample_id tie-break: equal scores must not survive or die by
    # nondeterministic block order (topk's documented contract)
    hits = topk(scored, ["score", "sample_id"], k, descending=[True, False])
    if not rerank:
        return hits
    # rerank the k survivors with the cross-encoder pool and re-sort
    reranker_cls = provider_class("reranker", reranker_provider)
    reranked = hits.map_batches(
        reranker_cls, fn_constructor_kwargs={"query_text": query_text},
        batch_format="pyarrow",
        batch_size=getattr(reranker_cls, "BATCH", FakeReranker.BATCH),
        concurrency=(1, 2),
    )
    return topk(reranked, ["rerank_score", "score", "sample_id"], k,
                descending=[True, True, False])
