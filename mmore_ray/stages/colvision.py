"""ColVision-style late-interaction retrieval (multi-vector MaxSim).

Reference surface: ``src/mmore/colvision/`` — pages are embedded as
MULTI-vectors (one embedding per visual patch / query token), stored
flat (one Milvus row per sub-vector, ``milvuscolvision.py:71-99``), and
scored by MaxSim late interaction:
``score(Q, D) = np.dot(Q, D.T).max(1).sum()``
(``milvuscolvision.py:230``) — for each query sub-vector take its best
document sub-vector, then sum.  The reference does a two-stage search
(per-sub-vector ANN for candidates, then exact MaxSim rerank,
``milvuscolvision.py:182-261``).

Ray-native shape here:

* the **collection** is a Dataset with one row per page holding its
  patch vectors NESTED (``patches: list<list<double>>``) — each page's
  sub-vectors stay inside one row, so exact MaxSim per page is a
  per-batch numpy einsum with NO grouping shuffle;
* :func:`maxsim_retrieve` is the exact path (per-batch local top-k →
  tiny global merge — the same combine the knn operators use).  At
  corpus scale the reference's candidate pre-filter maps onto the
  persisted IVF index (stages/similarity.py) over a flattened view,
  with this exact scorer as the rerank;
* the encoders are deterministic fakes (colqwen weights are not in
  this container): :class:`FakePatchEmbedder` derives one unit vector
  per patch/token from sha256 streams — swapping in the real model
  changes only the actor's ``__init__``/encode.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


class FakePatchEmbedder:
    """Deterministic multi-vector encoder (actor-pool stage).

    Pages: the payload is split into ``n_patches`` byte ranges, each
    hashed into a unit vector.  Queries: one vector per whitespace
    token.  Clearly fake; the real colqwen encoder slots in here."""

    def __init__(self, dim: int = 16, n_patches: int = 4, seed: int = 11):
        rng = np.random.default_rng(seed)
        self._proj = rng.standard_normal((32, dim))
        self._n = n_patches

    def _vec(self, data: bytes) -> list[float]:
        digest = hashlib.sha256(data).digest()
        x = np.frombuffer(digest, dtype=np.uint8).astype(np.float64) / 255.0
        v = x @ self._proj
        return (v / max(np.linalg.norm(v), 1e-12)).tolist()

    def embed_page(self, payload: bytes) -> list[list[float]]:
        step = max(len(payload) // self._n, 1)
        return [self._vec(payload[i * step:(i + 1) * step] or b"\x00")
                for i in range(self._n)]

    def embed_query(self, text: str) -> list[list[float]]:
        return [self._vec(w.encode()) for w in text.split()] or \
            [self._vec(b"\x00")]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = [self.embed_page(p)
                for p in batch.column("payload").to_pylist()]
        return batch.append_column(
            "patches", pa.array(vecs, pa.list_(pa.list_(pa.float64()))))


def maxsim_retrieve(pages_ds, queries: dict[int, list[list[float]]],
                    k: int = 5, id_col: str = "page_id",
                    patch_col: str = "patches"):
    """Exact MaxSim top-k pages per query.

    Returns (query_id, page_id, score_e4, rnk); scores round to 1e-4
    before ranking (rounded-score + id is the total order, same
    convention as the knn operators so oracle ties resolve
    identically)."""
    q_ids = sorted(queries)
    Q = [np.asarray(queries[i], dtype=np.float64) for i in q_ids]
    ref = ray.put((np.array(q_ids, dtype=np.int64), Q))

    def block(batch: pa.Table) -> pa.Table:
        qids, Qs = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        pages = [np.asarray(p, dtype=np.float64)
                 for p in batch.column(patch_col).to_pylist()]
        # ONE flat gemm per query over the whole batch instead of an
        # nq × n_pages Python loop of tiny matmuls: stack every patch
        # row, score flat, segment-max back per page via reduceat
        # (ragged patch counts welcome; milvuscolvision.py:230 MaxSim)
        npatch = np.array([len(P) for P in pages], dtype=np.int64)
        flat = (np.concatenate([P for P in pages if len(P)])
                if npatch.sum() else np.zeros((0, 1)))
        nz = npatch > 0
        starts = np.concatenate([[0], np.cumsum(npatch[nz])[:-1]]).astype(int)
        out = {"query_id": [], "page_id": [], "score_e4": []}
        for qi in range(len(qids)):
            Qm = Qs[qi]  # (nq_sub, d)
            scores = np.zeros(len(pages), np.float64)
            if len(flat) and len(Qm):
                S = Qm @ flat.T  # (nq_sub, total_patches)
                # per-page max over each query vector, then sum over
                # the query vectors — MaxSim late interaction
                mx = np.maximum.reduceat(S, starts, axis=1)
                scores[nz] = mx.sum(axis=0)
            s_e4 = np.floor(scores * 10000 + 0.5).astype(np.int64)
            order = np.lexsort((ids, -s_e4))[:k]
            for c in order:
                out["query_id"].append(int(qids[qi]))
                out["page_id"].append(int(ids[c]))
                out["score_e4"].append(int(s_e4[c]))
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    local = pages_ds.map_batches(block, batch_format="pyarrow",
                                 batch_size=4096)

    # same global merge as the knn operators — one rounding/tie-break
    # contract for every retrieval surface
    from .similarity import final_topk_fn

    return local.repartition(1).map_batches(
        final_topk_fn(k, score_col="score_e4", id_col="page_id"),
        batch_format="pandas", batch_size=None)


def index_pages(pages_ds, out_dir, n_patches: int = 4,
                concurrency: tuple[int, int] = (1, 8)):
    """Embed + persist a page collection: actor-pool encode → parquet
    (nested patch layout; one row per page).

    The raw ``payload`` bytes are dropped before the write — the index
    stores vectors, not the corpus — and the return value reads the
    PERSISTED parquet, so consuming it never re-runs the encoder pool
    (returning the lazy embed dataset would re-encode every page on
    first use).  ``out_dir`` is cleared first: ``write_parquet``
    appends uniquely-named files, so re-indexing into a dir holding a
    previous index would silently merge stale and new pages."""
    import shutil

    shutil.rmtree(str(out_dir), ignore_errors=True)
    embedded = pages_ds.map_batches(
        FakePatchEmbedder,
        fn_constructor_kwargs={"n_patches": n_patches},
        batch_format="pyarrow", concurrency=concurrency, batch_size=64
    ).map_batches(lambda t: t.drop_columns(["payload"]),
                  batch_format="pyarrow")
    embedded.write_parquet(str(out_dir))
    import ray.data

    # read_parquet_clean: strips the b'pandas' schema metadata that
    # makes pa.Schema unhashable (slow-path unify + log spam in every
    # downstream task) — same helper as every other collection read
    from ..sources.readers import read_parquet_clean

    return read_parquet_clean(str(out_dir))
