"""Deduplication operators (training-data-pipeline additions).

The reference dedups only exactly (keep-latest per file_path,
``incremental.py:32-48``); at 100 TB a corpus engine needs the full
ladder.  All operators follow the same scale shape: vectorized
per-batch sketching → bucketed/banded groupby on low-cardinality keys →
exact verification of the (small) candidate set.

Hash discipline: every hash is deterministic across processes
(crc32 / sha1-derived), never Python's salted ``hash``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

_MERSENNE = np.uint64((1 << 61) - 1)


def _stable_rng_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_set(text: str, k: int = 3) -> list[str]:
    """Distinct k-word shingles, first-seen order (matches the SQL
    oracle's ``list_distinct`` over in-order shingles)."""
    ws = text.split(" ")
    if len(ws) < k:
        return [" ".join(ws)]
    seen: dict[str, None] = {}
    for i in range(len(ws) - k + 1):
        seen.setdefault(" ".join(ws[i:i + k]), None)
    return list(seen)


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    return np.array(
        [zlib.crc32(s.encode()) for s in shingle_set(text, k)], dtype=np.uint64
    )


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """n_perm minhashes of the doc's shingle set (universal hashing
    modulo a Mersenne prime, vectorized over shingles × perms)."""
    h = _shingle_hashes(text, k)
    vals = (h[:, None] * a[None, :] + b[None, :]) % _MERSENNE
    return vals.min(axis=0)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                num_buckets: int = 64):
    """Keep the minimum-id row per exact text (sha256 identity).

    hash → bucketed groupby → per-group min; returns
    (content_sha256, keep_id, n_dupes)."""
    from ..functions.hashing import sha256_column
    from .groupby import bucketed_agg

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "content_sha256": sha256_column(df[text_col].tolist()),
            "keep_id": df[id_col].astype(np.int64),
            "n_dupes": np.ones(len(df), dtype=np.int64),
        })

    def agg(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False).agg(
            keep_id=("keep_id", "min"), n_dupes=("n_dupes", "sum")
        )

    return bucketed_agg(ds, ["content_sha256"], agg, prepare=prepare,
                        num_buckets=num_buckets)


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def near_dup_minhash(ds, text_col: str = "text", id_col: str = "doc_id",
                     n_perm: int = 64, bands: int = 32, k: int = 3,
                     threshold: float = 0.5, num_buckets: int = 64):
    """Verified near-duplicate pairs via MinHash-LSH.

    shingle → minhash(n_perm) → ``bands`` banded keys → groupby band
    key → candidate pairs → exact shingle-Jaccard verification →
    (id_a, id_b, jaccard_e4) with jaccard ≥ threshold.

    With r = n_perm/bands rows per band, a pair at similarity s is
    missed with probability (1-s^r)^bands — callers pick (n_perm,
    bands) so the miss rate at their threshold is negligible (defaults:
    r=2, b=32 → 4e-10 at s=0.7).

    The verification step broadcasts an id → shingle-set map via
    ``ray.put`` (corpus vocabulary scale; shard the map by id hash when
    it outgrows worker memory — documented assumption)."""
    from .groupby import bucketed_agg

    rows = n_perm // bands
    a, b = _stable_rng_params(n_perm)
    source = ds.select_columns([id_col, text_col])

    def sketch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out = {"id": [], "band": [], "band_hash": []}
        for i, t in zip(ids, texts):
            sig = minhash_signature(t, a, b, k)
            for bd in range(bands):
                out["id"].append(i)
                out["band"].append(bd)
                out["band_hash"].append(
                    zlib.crc32(sig[bd * rows:(bd + 1) * rows].tobytes())
                    & 0xFFFFFFFF
                )
        return pa.table({n: pa.array(v, pa.int64()) for n, v in out.items()})

    band_ds = source.map_batches(sketch, batch_format="pyarrow",
                                 batch_size=2048)

    from .groupby import _BUCKET, _bucket_of

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, ["band", "band_hash"], num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"]):
            ids = sorted(set(g["id"]))
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    pairs = (
        band_ds.map_batches(add_bucket, batch_format="pandas", batch_size=65536)
        .groupby(_BUCKET)
        .map_groups(lambda df: pairs_in_bucket(df.drop(columns=[_BUCKET])),
                    batch_format="pandas")
    )

    # distinct candidate pairs (a pair can match in several bands)
    from .groupby import bucketed_agg

    pairs = bucketed_agg(
        pairs, ["id_a", "id_b"],
        lambda df, keys: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets,
    ).materialize()

    # verification: shingle sets of CANDIDATE ids only (small relative
    # to the corpus), gathered in one filtered pass and broadcast
    cand_ids = set()
    for row_batch in pairs.iter_batches(batch_size=65536, batch_format="pandas"):
        cand_ids.update(row_batch["id_a"])
        cand_ids.update(row_batch["id_b"])
    cand_ref = ray.put(cand_ids)

    def collect_shingles(batch: pa.Table) -> pa.Table:
        wanted = ray.get(cand_ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        keep_i, keep_s = [], []
        for i, t in zip(ids, texts):
            if i in wanted:
                keep_i.append(i)
                keep_s.append(shingle_set(t, k))
        return pa.table({
            "id": pa.array(keep_i, pa.int64()),
            "shingles": pa.array(keep_s, pa.list_(pa.string())),
        })

    shingle_map: dict[int, frozenset] = {}
    for row_batch in source.map_batches(
            collect_shingles, batch_format="pyarrow",
            batch_size=2048).iter_batches(batch_size=8192,
                                          batch_format="pyarrow"):
        for i, s in zip(row_batch.column("id").to_pylist(),
                        row_batch.column("shingles").to_pylist()):
            shingle_map[i] = frozenset(s)
    sh_ref = ray.put(shingle_map)

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        sm = ray.get(sh_ref)
        ja = []
        for ia, ib in zip(df["id_a"], df["id_b"]):
            sa, sb = sm[ia], sm[ib]
            union = len(sa | sb)
            ja.append(len(sa & sb) / union if union else 0.0)
        out = df.copy()
        out["jaccard_e4"] = np.floor(np.array(ja, dtype=np.float64) * 10000
                                     + 0.5).astype(np.int64)
        return out[out["jaccard_e4"] >= int(threshold * 10000)]

    return pairs.map_batches(verify, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (crc32-derived, deterministic)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for w in text.split(" "):
        h = np.uint64(zlib.crc32(w.encode())
                      | (zlib.crc32(w[::-1].encode()) << 32))
        bits = (h >> shifts) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def near_dup_simhash(ds, text_col: str = "text", id_col: str = "doc_id",
                     max_hamming: int = 3, num_buckets: int = 64):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit hash into 4 × 16-bit chunks —
    any pair within hamming 3 matches exactly on ≥1 chunk, so a
    groupby per (chunk_idx, chunk_value) finds all candidates; exact
    hamming verification follows."""
    from .groupby import _BUCKET, _bucket_of

    def sketch(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        rows = {"id": [], "chunk": [], "value": [], "sim": []}
        for i, t in zip(ids, texts):
            sh = simhash64(t)
            sh_signed = sh - (1 << 64) if sh >= (1 << 63) else sh  # fit int64
            for c in range(4):
                rows["id"].append(i)
                rows["chunk"].append(c)
                rows["value"].append((sh >> (16 * c)) & 0xFFFF)
                rows["sim"].append(sh_signed)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    bands = ds.select_columns([id_col, text_col]).map_batches(
        sketch, batch_format="pyarrow", batch_size=4096
    )

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, ["chunk", "value"], num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        out = {"id_a": [], "id_b": [], "hamming": []}
        for _, g in df.groupby(["chunk", "value"]):
            recs = sorted(set(zip(g["id"], g["sim"])))
            for x in range(len(recs)):
                for y in range(x + 1, len(recs)):
                    (ia, sa), (ib, sb) = recs[x], recs[y]
                    # signed-stored 64-bit values: mask the xor back
                    ham = int(bin((sa ^ sb) & ((1 << 64) - 1)).count("1"))
                    if ham <= max_hamming:
                        out["id_a"].append(ia)
                        out["id_b"].append(ib)
                        out["hamming"].append(ham)
        return pd.DataFrame(out).drop_duplicates(subset=["id_a", "id_b"])

    cand = (
        bands.map_batches(add_bucket, batch_format="pandas", batch_size=65536)
        .groupby(_BUCKET)
        .map_groups(lambda df: pairs_in_bucket(df.drop(columns=[_BUCKET])),
                    batch_format="pandas")
    )

    from .groupby import bucketed_agg

    return bucketed_agg(
        cand, ["id_a", "id_b"],
        lambda df, keys: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                       threshold: float = 0.999):
    """Pairs with cosine ≥ threshold, exact blocked matmul.

    The full normalized matrix is broadcast once (``ray.put``); each
    batch computes its block-row of the similarity matrix against the
    whole — O(n²d) flops spread across the cluster with no shuffle.
    For n beyond broadcast capacity, the IVF index in
    ``stages/similarity.py`` prunes the candidate space first."""
    mat_ids: list[int] = []
    vecs: list[list[float]] = []
    for batch in ds.select_columns([id_col, vec_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        mat_ids.extend(batch.column(id_col).to_pylist())
        vecs.extend(batch.column(vec_col).to_pylist())
    order = np.argsort(mat_ids, kind="stable")
    ids_sorted = np.array(mat_ids, dtype=np.int64)[order]
    V = np.array(vecs, dtype=np.float64)[order]
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids_sorted, V))

    def block(batch: pa.Table) -> pa.Table:
        ids_all, Vn = ray.get(ref)
        ids = np.array(batch.column(id_col).to_pylist(), dtype=np.int64)
        Q = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        Q /= np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        S = Q @ Vn.T
        ia, ib, cos = [], [], []
        for r in range(len(ids)):
            hits = np.where(S[r] >= threshold)[0]
            for c in hits:
                if ids[r] < ids_all[c]:
                    ia.append(int(ids[r]))
                    ib.append(int(ids_all[c]))
                    cos.append(float(S[r, c]))
        return pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "cos_e3": pa.array(
                np.floor(np.array(cos) * 1000 + 0.5).astype(np.int64)
                if cos else np.array([], dtype=np.int64)),
        })

    return ds.map_batches(block, batch_format="pyarrow", batch_size=1024)
