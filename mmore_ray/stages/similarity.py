"""Similarity search over an embedding column (``list<float>``).

Baseline: exact brute-force cosine top-k — the query matrix is
broadcast once (``ray.put``) and every batch computes a numpy matmul
block against it (no shuffle; O(nq·d) per row spread over the
cluster).  Scale path: an IVF index — k-means-style centroids
(deterministic seeded init + a few Lloyd iterations over a sample),
vectors bucketed by nearest centroid, queries probe only ``nprobe``
buckets.  With ``nprobe == n_centroids`` IVF is exhaustive and must
equal brute force (tested)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


def knn_brute_force(ds, queries: dict[int, list[float]], k: int = 10,
                    vec_col: str = "embedding", id_col: str = "vec_id"):
    """Exact top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, cos_e4, rnk); self-matches
    (neighbor_id == query_id) are excluded.  Per-batch local top-k then
    a single final top-k merge — same shape as stages.groupby.topk.
    """
    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[i] for i in q_ids], dtype=np.float64))
    ref = ray.put((np.array(q_ids, dtype=np.int64), Q))

    def block(batch: pa.Table) -> pa.Table:
        qids, Qn = ray.get(ref)
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.array(batch.column(vec_col).to_pylist(),
                                dtype=np.float64))
        S = Qn @ V.T  # (nq, nb)
        out = {"query_id": [], "neighbor_id": [], "cos_e4": []}
        for qi in range(len(qids)):
            mask = ids != qids[qi]
            row_e4 = np.floor(S[qi][mask] * 10000 + 0.5).astype(np.int64)
            sub_ids = ids[mask]
            # rank on the ROUNDED score + id — the same total order the
            # oracle uses, so top-k boundary ties resolve identically
            order = np.lexsort((sub_ids, -row_e4))[:k]
            for c in order:
                out["query_id"].append(int(qids[qi]))
                out["neighbor_id"].append(int(sub_ids[c]))
                out["cos_e4"].append(int(row_e4[c]))
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    local = ds.map_batches(block, batch_format="pyarrow", batch_size=4096)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(["cos_e4", "neighbor_id"],
                              ascending=[False, True]).head(k)
            g = g.copy()
            g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            frames.append(g)
        return pd.concat(frames) if frames else df.assign(rnk=[])

    # survivors ≤ k × num_blocks × nq — tiny; single-partition merge
    return local.repartition(1).map_batches(final_topk, batch_format="pandas",
                                            batch_size=None)


def _trained_centroids(ds, n_centroids: int, vec_col: str, id_col: str,
                       train_sample: int) -> np.ndarray:
    """Centroids from a bounded, ORDER-STABLE sample: Ray block order
    is nondeterministic across executions, so the sample is sorted by
    id before training — the same data must always yield the same
    centroids (rebuilt indexes and repeated queries stay consistent)."""
    sample = (ds.select_columns([id_col, vec_col]).limit(train_sample)
              .to_pandas().sort_values(id_col))
    V = np.array(sample[vec_col].tolist(), dtype=np.float64)
    return train_centroids(V, n_centroids)


def train_centroids(V: np.ndarray, n_centroids: int, iters: int = 5,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on normalized vectors (cosine ≙
    dot-product on the unit sphere)."""
    rng = np.random.default_rng(seed)
    Vn = _normalize(V)
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

    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[i] for i in q_ids], dtype=np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    ref = ray.put((np.array(q_ids, dtype=np.int64), Q, C, probes))

    def block(batch: pa.Table) -> pa.Table:
        qids, Qn, Cn, prob = ray.get(ref)
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.array(batch.column(vec_col).to_pylist(),
                                dtype=np.float64))
        bucket = np.argmax(V @ Cn.T, axis=1)
        out = {"query_id": [], "neighbor_id": [], "cos_e4": []}
        for qi in range(len(qids)):
            probe_mask = np.isin(bucket, prob[qi])
            probe_mask &= ids != qids[qi]
            if not probe_mask.any():
                continue
            row_e4 = np.floor((V[probe_mask] @ Qn[qi]) * 10000
                              + 0.5).astype(np.int64)
            sub_ids = ids[probe_mask]
            order = np.lexsort((sub_ids, -row_e4))[:k]
            for c in order:
                out["query_id"].append(int(qids[qi]))
                out["neighbor_id"].append(int(sub_ids[c]))
                out["cos_e4"].append(int(row_e4[c]))
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    local = ds.map_batches(block, batch_format="pyarrow", batch_size=4096)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(["cos_e4", "neighbor_id"],
                              ascending=[False, True]).head(k)
            g = g.copy()
            g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            frames.append(g)
        return pd.concat(frames) if frames else df.assign(rnk=[])

    return local.repartition(1).map_batches(final_topk, batch_format="pandas",
                                            batch_size=None)


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

        Cn = ray.get(c_ref)
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.array(batch.column(vec_col).to_pylist(),
                                dtype=np.float64))
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
    q_ids = sorted(queries)
    Q = _normalize(np.array([queries[i] for i in q_ids], dtype=np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    needed = sorted({int(b) for row in probes for b in row})
    paths = [str(f) for b in needed
             for f in sorted((index_dir / f"bucket={b:03d}").glob("*.parquet"))
             if (index_dir / f"bucket={b:03d}").is_dir()]
    if not paths:
        return ray.data.from_items([])
    from mmore_ray.sources.readers import read_parquet_clean
    sub = read_parquet_clean(paths)

    ref = ray.put((np.array(q_ids, dtype=np.int64), Q, C, probes))

    def block(batch: pa.Table) -> pa.Table:
        qids, Qn, Cn, prob = ray.get(ref)
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        V = _normalize(np.array(batch.column(vec_col).to_pylist(),
                                dtype=np.float64))
        bucket = np.argmax(V @ Cn.T, axis=1)
        out = {"query_id": [], "neighbor_id": [], "cos_e4": []}
        for qi in range(len(qids)):
            probe_mask = np.isin(bucket, prob[qi])
            probe_mask &= ids != qids[qi]
            if not probe_mask.any():
                continue
            row_e4 = np.floor((V[probe_mask] @ Qn[qi]) * 10000
                              + 0.5).astype(np.int64)
            sub_ids = ids[probe_mask]
            order = np.lexsort((sub_ids, -row_e4))[:k]
            for c in order:
                out["query_id"].append(int(qids[qi]))
                out["neighbor_id"].append(int(sub_ids[c]))
                out["cos_e4"].append(int(row_e4[c]))
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    local = sub.map_batches(block, batch_format="pyarrow", batch_size=4096)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for qid, g in df.groupby("query_id"):
            g = g.sort_values(["cos_e4", "neighbor_id"],
                              ascending=[False, True]).head(k)
            g = g.copy()
            g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
            frames.append(g)
        return pd.concat(frames) if frames else df.assign(rnk=[])

    return local.repartition(1).map_batches(final_topk, batch_format="pandas",
                                            batch_size=None)
