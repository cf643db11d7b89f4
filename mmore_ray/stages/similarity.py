"""Similarity search over an embedding column (``list<float>``).

Baseline: exact brute-force cosine top-k — the query matrix is
broadcast once (``ray.put``) and every batch computes a numpy matmul
block against it (no shuffle; O(nq·d) per row spread over the
cluster).  Scale path: an IVF index — k-means-style centroids
(deterministic seeded init + a few Lloyd iterations over a sample),
vectors bucketed by nearest centroid, queries probe only ``nprobe``
buckets.  With ``nprobe == n_centroids`` IVF is exhaustive and must
equal brute force (tested).

All three entry points share ONE scoring kernel (:func:`_make_block`)
and ONE final merge (:func:`final_topk_fn`), so the rounding/tie-break
contract — ``floor(cos·1e4 + 0.5)``, lexsort on (-score, id), head(k)
— lives in exactly one place and cannot drift from the SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def _ids_and_vectors(batch: pa.Table, id_col: str,
                     vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Arrow-native batch extraction: int64 ids + the NORMALIZED
    (n, d) vector matrix.  ``list_flatten`` → numpy → reshape stays in
    C the whole way; ``to_pylist`` here would allocate a Python float
    per vector element on the per-batch hot path."""
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column(vec_col)
    try:
        flat = pc.list_flatten(col) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        V = flat.reshape(len(ids), -1) if len(ids) else flat.reshape(0, 1)
    except pa.lib.ArrowNotImplementedError:
        # Ray tensor-extension column (e.g. from_pandas of ndarray
        # cells) — no list_flatten kernel; stack the row tensors
        V = np.stack(col.to_pylist()).astype(np.float64) if len(ids) \
            else np.zeros((0, 1))
    return ids, _normalize(V)


def _make_block(ref, k: int, id_col: str, vec_col: str):
    """The shared per-batch scoring kernel.  ``ref`` is a ``ray.put``
    of ``(q_ids, Q, C, probes)``; ``C``/``probes`` are None for brute
    force (score every row) and set for IVF (score only rows whose
    nearest-centroid bucket is probed by the query).  Emits local
    top-k candidate rows (query_id, neighbor_id, cos_e4)."""

    def block(batch: pa.Table) -> pa.Table:
        out = {"query_id": [], "neighbor_id": [], "cos_e4": []}
        if len(batch) == 0:
            # empty block: _ids_and_vectors' (0, 1) placeholder would
            # dimension-mismatch the gemm below
            return pa.table({n: pa.array(v, pa.int64())
                             for n, v in out.items()})
        qids, Qn, Cn, prob = ray.get(ref)
        ids, V = _ids_and_vectors(batch, id_col, vec_col)

        def emit(qi: int, sub_ids: np.ndarray, scores: np.ndarray) -> None:
            row_e4 = np.floor(scores * 10000 + 0.5).astype(np.int64)
            # rank on the ROUNDED score + id — the same total order the
            # oracle uses, so top-k boundary ties resolve identically
            order = np.lexsort((sub_ids, -row_e4))[:k]
            out["query_id"].extend([int(qids[qi])] * len(order))
            out["neighbor_id"].extend(int(i) for i in sub_ids[order])
            out["cos_e4"].extend(int(s) for s in row_e4[order])

        if Cn is None:
            # brute force: ONE gemm for every query at once; per-query
            # work is just masking the precomputed score row (a
            # per-query V[mask] copy + gemv multiplies memory traffic
            # by the query count)
            S = Qn @ V.T
            for qi in range(len(qids)):
                mask = ids != qids[qi]  # exclude self-matches
                if mask.any():
                    emit(qi, ids[mask], S[qi][mask])
        else:
            bucket = np.argmax(V @ Cn.T, axis=1)
            for qi in range(len(qids)):
                mask = (ids != qids[qi]) & np.isin(bucket, prob[qi])
                if mask.any():
                    emit(qi, ids[mask], V[mask] @ Qn[qi])
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    return block


def final_topk_fn(k: int, score_col: str = "cos_e4",
                  id_col: str = "neighbor_id"):
    """Single-partition merge of per-block top-k survivors: global
    top-k per query with (score desc, id asc) tie-break + 1-based
    rank.  Survivors are ≤ k × num_blocks × nq — tiny."""

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for _, g in df.groupby("query_id"):
            g = g.sort_values([score_col, id_col],
                              ascending=[False, True]).head(k).copy()
            g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            frames.append(g)
        return pd.concat(frames) if frames else df.assign(rnk=[])

    return final_topk


def _query_refs(queries: dict[int, list[float]], C=None, nprobe: int = 0):
    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[i] for i in q_ids], dtype=np.float64))
    probes = None
    if C is not None:
        probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    return np.array(q_ids, dtype=np.int64), Q, probes


def _topk_pipeline(ds, ref, k: int, id_col: str, vec_col: str):
    local = ds.map_batches(_make_block(ref, k, id_col, vec_col),
                           batch_format="pyarrow", batch_size=4096)
    return local.repartition(1).map_batches(
        final_topk_fn(k), batch_format="pandas", batch_size=None)


def knn_brute_force(ds, queries: dict[int, list[float]], k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_e4, rnk); self-matches
    (neighbor_id == query_id) are excluded.  Per-batch local top-k then
    a single final top-k merge — same shape as stages.groupby.topk.
    """
    qids, Q, _ = _query_refs(queries)
    ref = ray.put((qids, Q, None, None))
    return _topk_pipeline(ds, ref, k, id_col, vec_col)


def _trained_centroids(ds, n_centroids: int, vec_col: str, id_col: str,
                       train_sample: int) -> np.ndarray:
    """Centroids from a bounded, ORDER-STABLE sample.  Ray block order
    is nondeterministic across executions AND ``limit()`` picks
    whichever blocks arrive first, so when the dataset exceeds
    ``train_sample`` the sample is chosen by a deterministic
    multiplicative hash of the id (block-order-independent), then
    sorted and cut on the driver — the same data must always yield the
    same centroids (rebuilt indexes and repeated queries stay
    consistent)."""
    src = ds.select_columns([id_col, vec_col])
    n = src.count()
    rate = 1.5 * train_sample / max(n, 1)
    if rate < 1.0:
        # expected ~1.5 × train_sample hash-selected rows reach the
        # driver; the sorted head(train_sample) cut is deterministic
        thr = np.uint64(int(rate * 0xFFFFFFFFFFFFFFFF))
        K = np.uint64(0x9E3779B97F4A7C15)

        def keep(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col) \
                .to_numpy(zero_copy_only=False).astype(np.uint64)
            return batch.filter(pa.array(ids * K <= thr))

        src = src.map_batches(keep, batch_format="pyarrow")
    df = src.to_pandas()
    if df.empty:
        # empty input loses its schema through to_pandas; callers
        # degrade to zero buckets / zero pairs
        return np.empty((0, 0))
    sample = df.sort_values(id_col).head(train_sample)
    V = np.array(sample[vec_col].tolist(), dtype=np.float64)
    return train_centroids(V, n_centroids)


def train_centroids(V: np.ndarray, n_centroids: int, iters: int = 5,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on normalized vectors (cosine ≙
    dot-product on the unit sphere).  ``n_centroids`` is clamped to the
    sample size so tiny datasets degrade to exhaustive search instead
    of crashing the seeded init."""
    rng = np.random.default_rng(seed)
    Vn = _normalize(V)
    n_centroids = min(n_centroids, len(Vn))
    C = Vn[rng.choice(len(Vn), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Vn @ C.T, axis=1)
        for c in range(n_centroids):
            members = Vn[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def knn_ivf(ds, queries: dict[int, list[float]], k: int = 10,
            n_centroids: int = 16, nprobe: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id",
            train_sample: int = 4096):
    """Approximate top-k via IVF: probe only the ``nprobe`` buckets
    whose centroids are nearest each query.

    The centroid model is trained on a driver-side sample (bounded by
    ``train_sample``) and broadcast; each batch scores only the rows
    whose bucket is probed by some query.  Same output schema as
    :func:`knn_brute_force`; with nprobe == n_centroids results are
    exact."""
    C = _trained_centroids(ds, n_centroids, vec_col, id_col, train_sample)
    qids, Q, probes = _query_refs(queries, C, nprobe)
    ref = ray.put((qids, Q, C, probes))
    return _topk_pipeline(ds, ref, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# Persisted IVF index (build once, probe many)
# ---------------------------------------------------------------------------

def build_ivf_index(ds, index_dir, n_centroids: int = 16,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    train_sample: int = 4096) -> None:
    """Build a persisted IVF index under ``index_dir``:

    * ``centroids.json`` — the (tiny) centroid matrix;
    * ``bucket=NNN/*.parquet`` — vectors partitioned by nearest
      centroid, written from the assigning map tasks.

    The point at scale: a query session then reads ONLY its probed
    bucket directories (partition-pruned ``read_parquet``), instead of
    re-training centroids and re-scanning every vector per call — the
    round-1 weak spot of :func:`knn_ivf`.  Rebuild to refresh; the
    directory is replaced atomically enough for single-writer use
    (cleared up front, like every sink here)."""
    import json
    import shutil
    from pathlib import Path

    import pyarrow.parquet as pq

    index_dir = Path(index_dir)
    shutil.rmtree(index_dir, ignore_errors=True)
    index_dir.mkdir(parents=True, exist_ok=True)

    C = _trained_centroids(ds, n_centroids, vec_col, id_col, train_sample)
    (index_dir / "centroids.json").write_text(json.dumps(C.tolist()))
    c_ref = ray.put(C)

    def assign_and_spill(batch: pa.Table) -> pa.Table:
        import hashlib

        if len(batch) == 0:  # (0, 1) placeholder would break the gemm
            return pa.table({"rows": pa.array([0], pa.int64())})
        Cn = ray.get(c_ref)
        ids, V = _ids_and_vectors(batch, id_col, vec_col)
        bucket = np.argmax(V @ Cn.T, axis=1)
        tag = hashlib.sha1(ids.tobytes()).hexdigest()[:16]
        for b in np.unique(bucket):
            sub = batch.filter(pa.array(bucket == b))
            d = index_dir / f"bucket={int(b):03d}"
            d.mkdir(parents=True, exist_ok=True)
            pq.write_table(sub, d / f"part-{tag}.parquet")
        return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})

    ds.map_batches(assign_and_spill, batch_format="pyarrow",
                   batch_size=4096).count()


def knn_ivf_indexed(index_dir, queries: dict[int, list[float]], k: int = 10,
                    nprobe: int = 4, vec_col: str = "embedding",
                    id_col: str = "vec_id"):
    """Top-k against a persisted IVF index: load the centroids (tiny),
    pick each query's ``nprobe`` buckets, ``read_parquet`` ONLY the
    union of probed bucket dirs, brute-force within them.  Output
    schema matches :func:`knn_brute_force`; with nprobe == n_centroids
    it reads everything and is exact."""
    import json
    from pathlib import Path

    index_dir = Path(index_dir)
    C = np.array(json.loads((index_dir / "centroids.json").read_text()),
                 dtype=np.float64)
    qids, Q, probes = _query_refs(queries, C, nprobe)
    needed = sorted({int(b) for row in probes for b in row})
    paths = [str(f) for b in needed
             for f in sorted((index_dir / f"bucket={b:03d}").glob("*.parquet"))
             if (index_dir / f"bucket={b:03d}").is_dir()]
    if not paths:
        return ray.data.from_items([])
    from mmore_ray.sources.readers import read_parquet_clean
    sub = read_parquet_clean(paths)

    # the bucket re-check inside the kernel is a no-op filter for rows
    # of probed buckets but keeps per-query probe sets exact when
    # buckets are shared across queries
    ref = ray.put((qids, Q, C, probes))
    return _topk_pipeline(sub, ref, k, id_col, vec_col)
