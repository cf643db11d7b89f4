"""Distributed k-means tests (stages/clustering.py) — differential vs
a driver-side reference Lloyd from the same seeded init."""

import numpy as np
import pyarrow as pa


def _sphere_corpus(n_per: int = 50, d: int = 3, noise: float = 0.05):
    rng = np.random.default_rng(7)
    base = np.eye(d)
    V = np.concatenate([b + rng.normal(0, noise, (n_per, d)) for b in base])
    return pa.table({
        "vec_id": np.arange(len(V)),
        "embedding": pa.array([v.tolist() for v in V],
                              pa.list_(pa.float64()))}), V


def test_kmeans_fit_matches_reference_lloyd(ray_session):
    import ray.data

    from mmore_ray.stages.clustering import kmeans_assign, kmeans_fit
    from mmore_ray.stages.similarity import _normalize, _trained_centroids

    t, V = _sphere_corpus()
    ds = ray.data.from_arrow(t)
    C = kmeans_fit(ds, n_clusters=3, iters=4, train_sample=64)
    assert C.shape == (3, 3)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)

    # reference Lloyd: same init, same geometry, driver-side numpy
    Cr = _trained_centroids(ds, 3, "embedding", "vec_id", 64)
    Vn = _normalize(V)
    for _ in range(4):
        a = np.argmax(Vn @ Cr.T, axis=1)
        for c in range(3):
            m = Vn[a == c]
            if len(m):
                Cr[c] = m.mean(axis=0)
        Cr = _normalize(Cr)
    assert np.allclose(C, Cr, atol=1e-9)

    out = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
    a = out["cluster"].to_numpy()
    assert (a == np.argmax(Vn @ Cr.T, axis=1)).all()
    # ground-truth clusters land whole (well-separated by construction)
    for g in range(3):
        seg = a[g * 50:(g + 1) * 50]
        assert (seg == seg[0]).all()


def test_kmeans_assign_tie_breaks_lowest_cluster(ray_session):
    import ray.data

    from mmore_ray.stages.clustering import kmeans_assign

    # two identical centroids: every vector ties; argmax must pick 0
    C = np.array([[1.0, 0.0], [1.0, 0.0]])
    t = pa.table({"vec_id": [1, 2],
                  "embedding": pa.array([[0.6, 0.8], [1.0, 0.0]],
                                        pa.list_(pa.float64()))})
    out = kmeans_assign(ray.data.from_arrow(t), C).to_pandas()
    assert out["cluster"].tolist() == [0, 0]


def test_kmeans_empty_cluster_keeps_centroid(ray_session):
    import ray.data

    from mmore_ray.stages.clustering import kmeans_fit

    # 2 points, 2 clusters possible; ask for k > distinct directions —
    # clamped init (train_centroids clamps k to sample size), and any
    # cluster that loses all members keeps its previous centroid
    t = pa.table({"vec_id": [0, 1],
                  "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                        pa.list_(pa.float64()))})
    C = kmeans_fit(ray.data.from_arrow(t), n_clusters=5, iters=2,
                   train_sample=16)
    assert len(C) == 2  # clamped
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
