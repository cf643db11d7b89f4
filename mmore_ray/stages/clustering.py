"""Distributed k-means over an embedding column — corpus organization
for the vector toolbox (balanced IVF partitions, semantic sharding,
topic bucketing).  Complements stages/similarity.py: that module
trains centroids on a bounded DRIVER-SIDE sample (good enough to route
queries); this one runs true Lloyd iterations over the FULL corpus so
centroids converge on all the data, at any scale.

Scale shape per iteration: centroids broadcast once (``ray.put``,
k×d floats), ONE streaming ``map_batches`` pass emits k pre-combined
partial rows per batch (cluster, vector sum, count — never the
vectors), and a k-group reduce (k « corpus) finishes on tiny data.
Driver holds only k×d floats; iterations = ``iters`` full passes, the
textbook mini-batch-free Lloyd cost.

Geometry is spherical (cosine) k-means — vectors and centroids live on
the unit sphere, matching the knn/IVF family's scoring kernel.
Determinism: seeded sample init (similarity._trained_centroids —
block-order-independent); within one execution the result is exact,
across executions float summation order over different batch splits
can drift assignments only on exact near-ties (documented; the
differential test uses separated clusters)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


def kmeans_fit(ds, n_clusters: int = 16, iters: int = 5,
               vec_col: str = "embedding", id_col: str = "vec_id",
               train_sample: int = 4096) -> np.ndarray:
    """Full-corpus spherical k-means: seeded sample init, then
    ``iters`` distributed Lloyd passes.  Returns the (k, d) unit-norm
    centroid matrix.  Empty clusters keep their previous centroid (the
    standard Lloyd degenerate-case rule)."""
    from .groupby import bucketed_agg
    from .similarity import _ids_and_vectors, _normalize, _trained_centroids

    C = _trained_centroids(ds, n_clusters, vec_col, id_col, train_sample)
    k = len(C)
    src = ds.select_columns([id_col, vec_col])

    def combine(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        sums = np.stack(df["s"].to_numpy())
        out = df.groupby("cluster", sort=False, as_index=False).agg(
            n=("n", "sum"))
        agg = {c: i for i, c in enumerate(out["cluster"])}
        acc = np.zeros((len(out), sums.shape[1]))
        np.add.at(acc, [agg[c] for c in df["cluster"]], sums)
        out["s"] = list(acc)
        return out

    for _ in range(iters):
        ref = ray.put(C)

        def partial(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:  # (0, 1) placeholder would break the gemm
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64())),
                    "n": pa.array([], pa.int64())})
            _, V = _ids_and_vectors(batch, id_col, vec_col)
            cen = ray.get(ref)
            a = np.argmax(V @ cen.T, axis=1)
            present = np.unique(a)
            sums = [V[a == c].sum(axis=0) for c in present]
            counts = np.bincount(a, minlength=len(cen))[present]
            return pa.table({
                "cluster": pa.array(present, pa.int64()),
                "s": pa.array([s.tolist() for s in sums],
                              pa.list_(pa.float64())),
                "n": pa.array(counts, pa.int64()),
            })

        stats = bucketed_agg(
            src.map_batches(partial, batch_format="pyarrow"),
            ["cluster"], combine, num_buckets=min(k, 16)).to_pandas()
        C_new = C.copy()
        for c, s, n in zip(stats["cluster"], stats["s"], stats["n"]):
            if n > 0:
                C_new[int(c)] = np.asarray(s) / n
        C = _normalize(C_new)
    return C


def kmeans_assign(ds, centroids: np.ndarray, vec_col: str = "embedding",
                  id_col: str = "vec_id", out_col: str = "cluster"):
    """Append the nearest-centroid id (cosine argmax, ties → lowest
    cluster id — numpy argmax first-max) plus the winning similarity
    ``cos_e4`` (floor(cos·10⁴+0.5), the knn family's rounding).  One
    broadcast + one streaming pass; SQL-expressible for FIXED
    centroids, so the assignment half of k-means is oracle-checkable
    even though the iterative fit is not."""
    from .similarity import _ids_and_vectors, _normalize

    ref = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # (0, 1) placeholder would break the gemm
            return batch.append_column(
                out_col, pa.array([], pa.int64())).append_column(
                "cos_e4", pa.array([], pa.int64()))
        _, V = _ids_and_vectors(batch, id_col, vec_col)
        S = V @ ray.get(ref).T
        a = np.argmax(S, axis=1)
        best = S[np.arange(len(a)), a]
        return batch.append_column(
            out_col, pa.array(a, pa.int64())
        ).append_column(
            "cos_e4", pa.array(np.floor(best * 10000 + 0.5).astype(np.int64)))

    return ds.map_batches(assign, batch_format="pyarrow")
