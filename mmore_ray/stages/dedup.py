"""Deduplication operators (training-data-pipeline additions).

The reference dedups only exactly (keep-latest per file_path,
``incremental.py:32-48``); at 100 TB a corpus engine needs the full
ladder.  All operators follow the same scale shape: vectorized
per-batch sketching → bucketed/banded groupby on low-cardinality keys →
exact verification of the (small) candidate set.

Hash discipline: every hash is deterministic across processes — the
batch sketch kernels share :func:`_word_hashes` (pandas siphash with
its fixed default key) combined through :func:`_window_constants`;
the remaining crc32/sha256 uses are per-row reference APIs.  Never
Python's salted ``hash``.
"""

from __future__ import annotations

import logging
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

logger = logging.getLogger(__name__)

_MERSENNE = np.uint64((1 << 61) - 1)

#: members per blocking group (posting list / band bucket / simhash
#: chunk) before the quadratic pair generation is capped — 1024 keeps a
#: single group's pair emission ≤ ~524k rows.
DEFAULT_GROUP_CAP = 1024


def _cap_group_members(d: pd.DataFrame, keys: list[str],
                       cap: int | None, label: str) -> pd.DataFrame:
    """Bound quadratic pair generation per blocking group.

    A group with m members emits m(m-1)/2 pairs, so ONE boilerplate
    mega-cluster (10⁶ near-identical docs sharing a band_hash) would
    make a single ``map_groups`` task emit ~5·10¹¹ rows.  Groups over
    ``cap`` keep the ``cap`` members with the smallest deterministic
    multiplicative id-hash — stable across runs, executors and block
    order (first-k would not be) — and the drop is logged.

    This mirrors the mention-stage clique cap
    (mentions.py DEFAULT_MAX_CLIQUE): exact dedup upstream already
    collapses byte-identical members, so a capped group is a
    near-identical boilerplate family whose surviving members still
    link the cluster for any downstream connected-components merge;
    the pair list itself becomes a documented under-approximation for
    that family only."""
    if cap is None or not len(d):
        return d
    sizes = d.groupby(keys, sort=False)["id"].transform("size").to_numpy()
    over = sizes > cap
    if not over.any():
        return d
    h = (d["id"].to_numpy().astype(np.uint64)
         * np.uint64(0x9E3779B97F4A7C15)).view(np.int64)
    capped = d.assign(_h=h).sort_values(keys + ["_h"], kind="stable")
    rank = capped.groupby(keys, sort=False).cumcount().to_numpy()
    kept = capped[rank < cap].drop(columns=["_h"])
    n_groups = int(d.loc[over, keys].drop_duplicates().shape[0])
    logger.warning(
        "near-dup %s: capped %d blocking group(s) at %d members "
        "(dropped %d posting rows)", label, n_groups, cap,
        len(d) - len(kept))
    return kept


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


def _self_pairs(d: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """Shared bucket-local candidate-pair generation for every sketch:
    self hash-join of the (pre-deduplicated) posting frame on ``keys``
    + ordered ``id_x < id_y`` filter, renamed to ``id_a``/``id_b``.
    Non-key payload columns survive as ``<col>_x``/``<col>_y``.  The
    caller must drop duplicate (keys, id) rows first — duplicates here
    multiply pair rows."""
    m = d.merge(d, on=keys)
    m = m[m["id_x"] < m["id_y"]]
    return m.rename(columns={"id_x": "id_a", "id_y": "id_b"})


def _window_constants(k: int) -> np.ndarray:
    """k DISTINCT per-position odd multipliers (seeded, process-stable).

    Cycling a short constant table would make windows that swap words
    at positions ``j`` and ``j+len(table)`` hash equal BY CONSTRUCTION
    for k > table length — a structural collision class, not a random
    one.  Distinct per-position constants leave only the generic
    ~2⁻⁶⁴-per-pair accidental collisions."""
    rng = np.random.default_rng(0x5EED_C0DE + k)
    return (rng.integers(0, 1 << 63, size=k, dtype=np.uint64)
            << np.uint64(1)) | np.uint64(1)


def _word_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Shared tokenize+hash preamble of every sketch kernel: Arrow
    space-split → flat word array → per-word siphash (pandas C kernel,
    fixed key ⇒ process-stable).  Returns (word_hashes uint64, words
    per doc int64) — one hash family for all sketches.  Null text rows
    hash as '' — the SAME convention as exact_dedup's sha256 of null
    (hashing.sha256_column); without the fill, a single null document
    NaN-poisons the count array and crashes np.repeat in
    _hashed_windows, killing every sketch operator on raw crawl
    input."""
    import pyarrow.compute as pc

    lists = pc.split_pattern(pc.fill_null(texts, ""), " ")
    counts = pc.list_value_length(lists).to_numpy().astype(np.int64)
    words = pd.Series(pc.list_flatten(lists).to_pandas(), copy=False)
    wh = pd.util.hash_pandas_object(words, index=False).to_numpy()
    return wh, counts


def _hashed_windows(texts, k: int):
    """Vectorized k-word-window hashes for a batch of texts.

    :func:`_word_hashes` → per-position-weighted uint64 combine over
    each k-window that stays inside one doc.  Docs with < k words get
    one window = the whole-text hash, so every doc has ≥ 1 window and
    window order follows doc order.  Returns ``(g, doc_idx, n_short)``:
    uint64 window hashes, the owning doc index per window
    (nondecreasing), and how many short docs were appended (their
    windows sort back in by the stable argsort below only when
    present)."""
    import pyarrow.compute as pc

    texts = pc.fill_null(texts, "")  # null rows hash as '' (see _word_hashes)
    wh, counts = _word_hashes(texts)
    doc_idx = np.repeat(np.arange(len(counts)), counts)
    n = len(wh)
    if n >= k:
        C = _window_constants(k)
        g = wh[: n - k + 1] * C[0]
        for j in range(1, k):
            g = g + wh[j: n - k + 1 + j] * C[j]
        valid = doc_idx[: n - k + 1] == doc_idx[k - 1:]
        g = g[valid]
        widx = doc_idx[: n - k + 1][valid]
    else:
        g = np.empty(0, np.uint64)
        widx = np.empty(0, np.int64)
    short = counts < k
    n_short = int(short.sum())
    if n_short:
        # hash only the short rows — a full-batch whole-text hash pass
        # would touch every byte to produce n_short values
        short_texts = texts.filter(pa.array(short))
        th = pd.util.hash_pandas_object(
            pd.Series(short_texts.to_pandas(), copy=False),
            index=False).to_numpy().astype(np.uint64)
        g = np.concatenate([g, th])
        widx = np.concatenate([widx, np.flatnonzero(short)])
        order = np.argsort(widx, kind="stable")
        g, widx = g[order], widx[order]
    return g, widx, n_short


def _distinct_doc_windows(batch: pa.Table, text_col: str,
                          k: int) -> tuple[np.ndarray, np.ndarray]:
    """The batch's DISTINCT (doc, k-window-hash) pairs as (doc-row
    indices, int64 hashes) — shared by every hash-blocked explode
    (jaccard posting lists, dup-span counting).  Per-doc distinct via
    hash-based dedup (np.unique(axis=) lexsorts structured rows —
    measured 5x slower)."""
    texts = batch.column(text_col).cast(pa.string())
    g, widx, _ = _hashed_windows(texts, k)
    uniq = pd.DataFrame({"d": widx, "g": g.view(np.int64)}
                        ).drop_duplicates()
    return uniq["d"].to_numpy(), uniq["g"].to_numpy()


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int = 3) -> np.ndarray:
    """n_perm minhashes of ONE doc's shingle set (universal hashing
    modulo a Mersenne prime, vectorized over shingles × perms).

    Reference per-row API over crc32 shingle hashes; the pipeline
    (:func:`near_dup_minhash`) uses the batched kernel over
    :func:`_hashed_windows` instead — a different (equally valid) hash
    family with the same LSH guarantee."""
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
                     threshold: float = 0.5, num_buckets: int = 64,
                     group_cap: int | None = DEFAULT_GROUP_CAP):
    """Verified near-duplicate pairs via MinHash-LSH.

    shingle → minhash(n_perm) → ``bands`` banded keys → groupby band
    key → candidate pairs → exact shingle-Jaccard verification →
    (id_a, id_b, jaccard_e4) with jaccard ≥ threshold.

    With r = n_perm/bands rows per band, a pair at similarity s is
    missed with probability (1-s^r)^bands — callers pick (n_perm,
    bands) so the miss rate at their threshold is negligible (defaults:
    r=2, b=32 → 4e-10 at s=0.7).

    Verification is join-based end-to-end: the distinct candidate ids
    semi-join the corpus for their texts (``Dataset.join``), candidate
    texts hash-join onto the pair list for both endpoints, and each
    pair's exact shingle Jaccard is computed in the map task — no
    driver-side candidate map, so a dup-heavy corpus cannot OOM the
    driver."""
    from .groupby import bucketed_agg

    if not 1 <= bands <= n_perm or n_perm % bands:
        # bands > n_perm makes every band an empty-slice sum (all docs
        # collide in every band: quadratic blow-up + silent recall loss
        # after the cap); a non-dividing bands silently discards the
        # remainder permutations, voiding the (1-s^r)^b miss-rate math
        raise ValueError(
            f"bands must divide n_perm: got n_perm={n_perm}, bands={bands}")
    rows = n_perm // bands
    a, b = _stable_rng_params(n_perm)
    source = ds.select_columns([id_col, text_col])

    def sketch(batch: pa.Table) -> pa.Table:
        # Fully vectorized batch sketch: shared window-hash kernel →
        # one (a[j]*g + b[j]) % M pass per permutation with a
        # np.minimum.reduceat over doc boundaries (min over the
        # multiset == min over the set, so no per-doc dedup needed) →
        # constant-weighted uint64 band combine.  The signature hash
        # family differs from the per-row crc32 path but the LSH
        # guarantee (miss rate (1-s^r)^b) is the same, and the exact
        # string-Jaccard verification fixes the output set regardless.
        if len(batch) == 0:
            return pa.table({"id": pa.array([], pa.int64()),
                             "band": pa.array([], pa.int64()),
                             "band_hash": pa.array([], pa.int64())})
        texts = batch.column(text_col).cast(pa.string())
        ids = batch.column(id_col).to_numpy()
        g, widx, _ = _hashed_windows(texts, k)
        starts = np.flatnonzero(np.r_[True, widx[1:] != widx[:-1]])
        sig = np.empty((len(batch), n_perm), np.uint64)
        for j in range(n_perm):
            sig[:, j] = np.minimum.reduceat(
                (g * a[j] + b[j]) % _MERSENNE, starts)
        # band hash: position-weighted sum of the band's rows (uint64
        # wraparound); only used as a grouping key, so any
        # process-stable combine works
        w = _window_constants(rows)
        bh = np.empty((len(batch), bands), np.uint64)
        for bd in range(bands):
            bh[:, bd] = (sig[:, bd * rows:(bd + 1) * rows] * w).sum(axis=1)
        n_rows = len(batch) * bands
        return pa.table({
            "id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int64),
                                     len(batch)), pa.int64()),
            "band_hash": pa.array(bh.reshape(n_rows).view(np.int64),
                                  pa.int64()),
        })

    band_ds = source.map_batches(sketch, batch_format="pyarrow",
                                 batch_size=2048)

    from .groupby import _BUCKET, _bucket_of

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, ["band", "band_hash"], num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = _cap_group_members(
            df.drop_duplicates(["band", "band_hash", "id"]),
            ["band", "band_hash"], group_cap, "minhash")
        m = _self_pairs(d, ["band", "band_hash"])
        return m[["id_a", "id_b"]].drop_duplicates()

    pairs = (
        band_ds.map_batches(add_bucket, batch_format="pandas", batch_size=65536)
        .groupby(_BUCKET)
        .map_groups(lambda df: pairs_in_bucket(df.drop(columns=[_BUCKET])),
                    batch_format="pandas")
    )

    pairs = _distinct_pairs(pairs, num_buckets)
    return verify_pairs_jaccard(pairs, source, id_col=id_col,
                                text_col=text_col, k=k, threshold=threshold,
                                num_buckets=num_buckets)


def _drop_schemaless_empties(mat_ds, fallback: pa.Table):
    """Ray's hash JoinOperator materializes empty partitions as
    zero-COLUMN Arrow blocks, and map_batches passes 0-row blocks
    through WITHOUT running the fn — so typed-output map fns cannot
    heal them, and a downstream acero join rejects the schema-less
    side with "No match or multiple matches for key field reference".
    Rebuild a MATERIALIZED dataset from its non-empty blocks.  Row
    counts come from the dataset's own block METADATA (recorded at
    materialization) — no tasks, and blocks are never pulled into the
    driver: the join plan exists precisely because the pair set can be
    too large for driver memory.  Tiny remote probes are the fallback
    only for blocks whose metadata lacks a row count.  ``fallback``:
    the typed empty table to return when every block is empty, so
    downstream consumers keep their schema."""
    import ray
    import ray.data

    counts = [m.num_rows for b in mat_ds.iter_internal_ref_bundles()
              for m in b.metadata]
    # to_arrow_refs preserves block order (and is ref-identity for
    # Arrow blocks; pandas blocks get one remote conversion task each)
    refs = mat_ds.to_arrow_refs()
    assert len(refs) == len(counts), (len(refs), len(counts))
    if any(n is None for n in counts):  # metadata-less block: probe

        @ray.remote(num_cpus=0)
        def _nrows(block) -> int:
            return block.num_rows

        probe = [i for i, n in enumerate(counts) if n is None]
        for i, n in zip(probe,
                        ray.get([_nrows.remote(refs[i]) for i in probe])):
            counts[i] = n
    keep = [r for r, n in zip(refs, counts) if n]
    if not keep:
        return ray.data.from_arrow(fallback)
    return ray.data.from_arrow_refs(keep)


def _typed_pairs(df: pd.DataFrame,
                 extra: tuple[str, ...] = ()) -> pd.DataFrame:
    """Normalize a gathered pair frame: an EMPTY ``map_groups`` output
    loses its schema entirely (zero groups → zero columns), so a
    dup-free corpus — the normal case for a clean post-exact-dedup
    crawl — would KeyError every downstream groupby/verify.  Non-empty
    frames pass through untouched."""
    cols = ("id_a", "id_b", *extra)
    if all(c in df.columns for c in cols):
        return df
    assert df.empty, f"pair frame missing {cols}: {list(df.columns)}"
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})


def _distinct_pairs(pairs, num_buckets: int, small_limit: int = 5_000_000):
    """Distinct (id_a, id_b) rows — driver-side pandas when the raw
    pair list is small (one cheap gather instead of a groupby shuffle;
    candidates are normally a tiny fraction of the corpus), bucketed
    groupby distinct above the limit."""
    from .groupby import bucketed_agg

    mat = pairs.materialize()
    if mat.count() <= small_limit:
        return _typed_pairs(mat.to_pandas()).drop_duplicates(
            subset=["id_a", "id_b"])
    return bucketed_agg(
        mat, ["id_a", "id_b"],
        lambda df, keys: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets,
    ).materialize()


def verify_pairs_jaccard(pairs, source, id_col: str, text_col: str,
                         k: int = 3, threshold: float = 0.5,
                         num_buckets: int = 64,
                         broadcast_limit: int = 50_000):
    """Exact shingle-Jaccard verification of an (id_a, id_b) pair
    Dataset against ``source`` (id, text).

    Two physical plans behind one semantic (standard small-side rule):

    * **broadcast** (≤ ``broadcast_limit`` distinct candidate ids) —
      the candidate texts are gathered once, ``ray.put``, and looked
      up inside the verify map task.  No shuffle, no join operators;
      this is the common case because candidates are a tiny fraction
      of the corpus.
    * **join** (above the limit, e.g. a dup-heavy crawl) — the
      distinct candidate ids semi-join the corpus for their texts
      (``Dataset.join``), candidate texts hash-join onto the pair list
      for both endpoints, and the Jaccard is computed in the map task
      — no driver-side candidate map, so the driver cannot OOM.

    Returns (id_a, id_b, jaccard_e4) with jaccard ≥ threshold.

    ``pairs`` may be a pandas DataFrame (already-distinct small pair
    list, e.g. from :func:`_distinct_pairs`) — then the candidate ids
    come straight off the frame and the broadcast plan is used — or a
    Dataset."""
    import ray

    from .groupby import bucketed_agg

    if isinstance(pairs, pd.DataFrame):
        id_set = set(pairs["id_a"]) | set(pairs["id_b"])
        # one block per chunk (from_pandas of a list, no shuffle) so the
        # verify map parallelizes instead of running as a single task
        n_chunks = max(1, min(64, len(pairs) // 10_000))
        chunks = [pairs.iloc[i::n_chunks].reset_index(drop=True)
                  for i in range(n_chunks)]
        return _verify_broadcast(ray.data.from_pandas(chunks), id_set,
                                 source, id_col, text_col, k, threshold)

    # Dataset pair lists arrive from join/map_groups producers that
    # leave zero-column empty-partition blocks behind; strip them at
    # this single dispatch point so BOTH plans (and their outputs) stay
    # clean — map_batches passes 0-row blocks through untouched, so the
    # broadcast plan would otherwise re-expose them to downstream acero
    # joins (e.g. curate's anti_join large path).
    pairs = _drop_schemaless_empties(pairs.materialize(), pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64())}))

    def stack_ids(t: pa.Table) -> pa.Table:
        return pa.table({"id": pa.concat_arrays([
            t.column("id_a").combine_chunks(),
            t.column("id_b").combine_chunks()])})

    # materialized: a pending all-to-all (the distinct's sort) sharing
    # one plan with a JoinOperator can starve it of CPU slots
    cand_ids = bucketed_agg(
        pairs.map_batches(stack_ids, batch_format="pyarrow"),
        ["id"], lambda df, keys: df.drop_duplicates(subset=["id"]),
        num_buckets=num_buckets,
    ).materialize()

    if cand_ids.count() <= broadcast_limit:
        id_set = {r["id"] for r in cand_ids.take_all()}
        return _verify_broadcast(pairs, id_set, source, id_col, text_col,
                                 k, threshold)
    return _verify_join(pairs, cand_ids, source, id_col, text_col, k,
                        threshold)


def _shingle_hash_arrays(texts: list[str], k: int) -> list[np.ndarray]:
    """Per-text sorted UNIQUE window-hash arrays via the shared
    vectorized kernel (:func:`_hashed_windows`) — the verification-side
    twin of :func:`shingle_set` in hash space.  |set| and intersection
    counts equal the string-set ones up to the same accidental
    ~m²/2⁶⁴-per-doc 64-bit collision class documented on
    :func:`_bound_filter_pairs`; no structural class exists
    (:func:`_window_constants`)."""
    g, widx, _ = _hashed_windows(pa.array(texts, pa.string()), k)
    bounds = np.searchsorted(widx, np.arange(len(texts) + 1))
    return [np.unique(g[bounds[i]:bounds[i + 1]])
            for i in range(len(texts))]


def _jaccard_e4_from_arrays(arrs_a: list[np.ndarray],
                            arrs_b: list[np.ndarray]) -> np.ndarray:
    """floor(J·10⁴+0.5) per pair of sorted-unique hash arrays — one
    C-speed searchsorted membership count per pair, no Python string
    hashing (every doc has ≥ 1 window, so unions are never empty)."""
    out = np.empty(len(arrs_a), np.int64)
    for i, (A, B) in enumerate(zip(arrs_a, arrs_b)):
        if len(A) > len(B):
            A, B = B, A
        idx = np.searchsorted(B, A)
        idx[idx == len(B)] = 0  # out-of-range probes can't match B[0] anyway
        c = int(np.count_nonzero(B[idx] == A))
        # ...unless A's smallest element IS B[0] and also probed out of
        # range — impossible: searchsorted(B, x) == len(B) ⇒ x > B[-1]
        # ≥ B[0], and A is sorted unique so x != B[0].
        u = len(A) + len(B) - c
        out[i] = int(np.floor(c / u * 10000 + 0.5))
    return out


def _verify_broadcast(pairs, id_set: set, source, id_col: str,
                      text_col: str, k: int, threshold: float):
    """Broadcast plan: candidate SHINGLE-HASH ARRAYS are computed once
    (vectorized, driver-side over the gathered candidate texts — texts
    themselves never ship to the verify tasks) and looked up in the
    verify map task."""
    import pyarrow.compute as pc
    import ray

    if not id_set:
        # dup-free corpus: no candidates — return the typed empty
        # result without scanning (an empty inferred pa.array is
        # null-typed and would break the is_in kernel)
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "jaccard_e4": pa.array([], pa.int64())}))

    # broadcast as an Arrow array: the pick filter below scans the FULL
    # corpus, so membership must be the vectorized is_in kernel, not a
    # per-row Python set probe.  Type is inferred (ids may be strings —
    # the join plan is type-agnostic and this plan must match it).
    id_ref = ray.put(pa.array(sorted(id_set)))

    def pick(batch: pa.Table) -> pa.Table:
        wanted = ray.get(id_ref)
        return batch.filter(
            pc.is_in(batch.column(id_col), value_set=wanted))

    picked = source.map_batches(pick, batch_format="pyarrow").take_all()
    arrs = _shingle_hash_arrays([r[text_col] for r in picked], k)
    arrs_ref = ray.put({r[id_col]: a for r, a in zip(picked, arrs)})

    def verify_bcast(df: pd.DataFrame) -> pd.DataFrame:
        sets = ray.get(arrs_ref)
        ja = _jaccard_e4_from_arrays([sets[i] for i in df["id_a"]],
                                     [sets[i] for i in df["id_b"]])
        out = df[["id_a", "id_b"]].copy()
        out["jaccard_e4"] = ja
        return out[out["jaccard_e4"] >= int(threshold * 10000)]

    return pairs.map_batches(verify_bcast, batch_format="pandas")


def _verify_join(pairs, cand_ids, source, id_col: str, text_col: str,
                 k: int, threshold: float):
    """Join plan: candidate texts reach the pair rows through hash
    joins, never through a driver-side map.

    ``pairs`` arrives pre-stripped of schema-less empty blocks (the
    dispatcher does it); the join outputs produced HERE get the same
    treatment (:func:`_drop_schemaless_empties`) before feeding the
    next acero join, which rejects a side containing a zero-column
    block."""
    _int64 = pa.array([], pa.int64())
    _str = pa.array([], pa.string())

    # semi-join: only candidate docs' texts leave the scan
    cand_docs = cand_ids.join(
        source, join_type="inner", num_partitions=16,
        on=("id",), right_on=(id_col,),
    ).materialize()
    cand_docs = _drop_schemaless_empties(
        cand_docs, pa.table({"id": _int64, text_col: _str}))

    # one JoinOperator per execution (materialize between): two joins
    # sharing a plan can deadlock on CPU slots at low parallelism
    j1 = pairs.join(
        cand_docs.rename_columns({"id": "_ia", text_col: "_text_a"}),
        join_type="inner", num_partitions=16,
        on=("id_a",), right_on=("_ia",),
    ).materialize()
    j1 = _drop_schemaless_empties(
        j1, pa.table({"id_a": _int64, "id_b": _int64,
                      "_ia": _int64, "_text_a": _str}))
    j = j1.join(
        cand_docs.rename_columns({"id": "_ib", text_col: "_text_b"}),
        join_type="inner", num_partitions=16,
        on=("id_b",), right_on=("_ib",),
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        # factorize-once per batch: each distinct text is shingle-hashed
        # exactly once by the shared vectorized kernel, then every pair
        # is a sorted-array intersection count
        both = pd.concat([df["_text_a"], df["_text_b"]],
                         ignore_index=True)
        codes, uniques = pd.factorize(both)
        arrs = _shingle_hash_arrays(list(uniques), k)
        n = len(df)
        ja = _jaccard_e4_from_arrays([arrs[c] for c in codes[:n]],
                                     [arrs[c] for c in codes[n:]])
        out = df[["id_a", "id_b"]].copy()
        out["jaccard_e4"] = ja
        return out[out["jaccard_e4"] >= int(threshold * 10000)]

    return j.map_batches(verify, batch_format="pandas")


def near_dup_jaccard(ds, text_col: str = "text", id_col: str = "doc_id",
                     k: int = 3, threshold: float = 0.5,
                     num_buckets: int = 64, max_df: int | None = None,
                     group_cap: int | None = DEFAULT_GROUP_CAP):
    """EXACT n-gram-Jaccard near-duplicate pairs (no sketching).

    Inverted-index blocking: explode each doc into its distinct word
    k-shingles, bucketed-groupby the shingle, emit candidate pairs per
    posting list WITH per-bucket co-occurrence counts, aggregate the
    counts to ``c = |A∩B|`` in hash space, pre-filter on the hash-space
    Jaccard ``c/(|A|+|B|-c)`` (rounded exactly as the verify stage
    rounds — see :func:`_bound_filter_pairs`), and exact-verify the
    survivors with :func:`verify_pairs_jaccard`.  The pre-filter is the
    PPJoin-style step that keeps dup-heavy corpora from re-reading
    candidate texts: without it every blocked pair (possibly a large
    fraction of n²) re-gathers both texts; with it only true matches +
    collision survivors do.  False negatives require an accidental
    64-bit window-hash collision between two shingles of one doc that
    are both shared with the partner (≲ m²/2⁶⁴ per pair — see
    :func:`_bound_filter_pairs`); candidate generation itself is
    collision-safe (docs sharing a shingle always share its hash).  At
    corpus scale a hot shingle's posting list generates O(df²) pairs,
    so either pass ``max_df`` to drop stopword-like shingles (standard
    blocking practice; makes the result a documented
    under-approximation — and disables the count pre-filter, whose c
    would undercount dropped shingles) or prefer
    :func:`near_dup_minhash`."""
    from .groupby import _BUCKET, _bucket_of, bucketed_agg

    source = ds.select_columns([id_col, text_col])
    counted = max_df is None

    def explode_shingles(batch: pa.Table) -> pa.Table:
        # Block on a HASH of the shingle, not the string: docs sharing
        # a shingle always share its hash, so hash-blocked candidates
        # are a superset of string-blocked ones and the exact
        # verification makes the final output identical — while the
        # shuffle moves int64s instead of n-gram strings.
        ids = batch.column(id_col).to_numpy()
        ud, hashes = _distinct_doc_windows(batch, text_col, k)
        out = {"id": pa.array(ids[ud], pa.int64()),
               "shingle": pa.array(hashes, pa.int64())}
        if counted:
            # per-doc distinct-shingle-set size, repeated per row (docs
            # never span batches, so the per-batch count is global);
            # only the counted path reads it — don't shuffle it otherwise
            sz = np.bincount(ud, minlength=len(batch))[ud]
            out["sz"] = pa.array(sz, pa.int64())
        return pa.table(out)

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        # sz never rides the pair shuffle (docstring contract): sizes
        # are joined back after the global c-sum, so shipping the
        # per-doc constant here would be pure shuffle weight
        df = df[["id", "shingle"]].copy()
        df[_BUCKET] = _bucket_of(df, ["shingle"], num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized posting-list pair generation: self-merge on the
        # shingle (pandas hash join) + ordered filter — no per-group
        # Python loop.  sz never rides the merge: a per-doc constant on
        # O(pairs) rows makes the groupby a multi-agg (measured 2.7x
        # the single-column sum) — sizes are joined back after the
        # global c-sum instead.
        d = df[["shingle", "id"]].drop_duplicates()
        if max_df is not None:
            vc = d["shingle"].value_counts()
            d = d[d["shingle"].isin(vc[vc <= max_df].index)]
        # cap AFTER max_df: on a capped posting list the summed c
        # undercounts |A∩B| for that family, so the bound pre-filter
        # (which never over-drops on exact counts) becomes part of the
        # same documented under-approximation the cap itself is
        d = _cap_group_members(d, ["shingle"], group_cap, "jaccard")
        m = _self_pairs(d, ["shingle"])
        if not counted:
            return m[["id_a", "id_b"]].drop_duplicates()
        # partial |A∩B|: this bucket holds a hash-disjoint slice of the
        # shingle space, so per-pair row counts sum to the global c
        return (m.groupby(["id_a", "id_b"], sort=False)
                 .size().rename("c").reset_index())

    ex = source.map_batches(explode_shingles, batch_format="pyarrow",
                            batch_size=2048)
    if counted:
        # consumed twice (pair-gen + candidate sizes): materialize so
        # the explode runs once.  The exploded table is ~16 B per
        # distinct (doc, shingle) — object-store-resident, spilling to
        # disk beyond memory, which beats re-running the explode's
        # string pass over the full corpus
        ex = ex.materialize()
    pairs = (
        ex.map_batches(add_bucket, batch_format="pandas", batch_size=65536)
        .groupby(_BUCKET)
        .map_groups(lambda df: pairs_in_bucket(df.drop(columns=[_BUCKET])),
                    batch_format="pandas")
    )
    if counted:
        pairs = _sum_pair_counts(pairs, num_buckets)
        pairs = _bound_filter_pairs(pairs, ex, threshold, num_buckets)
    else:
        pairs = _distinct_pairs(pairs, num_buckets)
    return verify_pairs_jaccard(pairs, source, id_col=id_col,
                                text_col=text_col, k=k, threshold=threshold,
                                num_buckets=num_buckets)


def _bound_filter_pairs(pairs, ex, threshold: float, num_buckets: int):
    """Filter counted candidate pairs on the hash-space Jaccard of the
    pair, keeping every pair whose HALF-UP-ROUNDED hash Jaccard clears
    the threshold — the same rounding the exact verification applies
    (``floor(j·10⁴+0.5) ≥ thr``), so a pair the verify stage would emit
    is never dropped by a rounding disagreement at the boundary.
    Integer arithmetic: keep iff ``2·c·10⁴ ≥ (2·thr−1)·(sz_a+sz_b−c)``.

    Collision honesty: with distinct per-position window constants
    (:func:`_window_constants`) there is no structural collision class;
    an ACCIDENTAL 64-bit collision between two shingles of one doc that
    are both shared with the partner can still lower the hash Jaccard
    below the string Jaccard ((c−1)/(D−1) < c/D), so the zero-false-
    negative guarantee holds up to ~m²/2⁶⁴ per doc-pair — the same
    residual class every hash-sketch operator carries.  Candidate
    GENERATION is unaffected (collisions only add candidates).

    ``ex`` is the materialized (id, shingle, sz) explode table; sizes
    for the candidate ids are fetched by a broadcast-set filter when
    the candidate set is small, by hash joins when it is not (same
    small-side rule as the text verification)."""
    import pyarrow.compute as pc

    from .groupby import bucketed_agg

    thr = int(threshold * 10000)

    def first_sizes(t: pa.Table) -> pa.Table:
        d = pd.DataFrame({"id": t.column("id").to_numpy(),
                          "sz": t.column("sz").to_numpy()}
                         ).drop_duplicates("id")
        return pa.Table.from_pandas(d, preserve_index=False)

    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            # dup-free corpus: skip the size gather (its all-empty
            # blocks come back schema-less from to_pandas)
            return pairs.loc[:, ["id_a", "id_b"]]
        cand = np.unique(np.concatenate([pairs["id_a"].to_numpy(),
                                         pairs["id_b"].to_numpy()]))
        cand_ref = ray.put(pa.array(cand, pa.int64()))

        def pick(t: pa.Table) -> pa.Table:
            want = ray.get(cand_ref)
            return first_sizes(
                t.filter(pc.is_in(t.column("id"), value_set=want)))

        sz = (ex.map_batches(pick, batch_format="pyarrow")
                .to_pandas().drop_duplicates("id").set_index("id")["sz"])
        sz_a = pairs["id_a"].map(sz).to_numpy()
        sz_b = pairs["id_b"].map(sz).to_numpy()
        c = pairs["c"].to_numpy()
        keep = (2 * c * 10000) >= (2 * thr - 1) * (sz_a + sz_b - c)
        return pairs.loc[keep, ["id_a", "id_b"]].reset_index(drop=True)

    # large path: distributed sizes + two hash joins, then the filter
    sizes = bucketed_agg(
        ex.select_columns(["id", "sz"]),
        ["id"], lambda df, keys: df.drop_duplicates("id"),
        num_buckets=num_buckets,
    ).materialize()
    j = pairs.join(
        sizes.rename_columns({"id": "_ia", "sz": "_sz_a"}),
        join_type="inner", num_partitions=16,
        on=("id_a",), right_on=("_ia",),
    ).materialize().join(
        sizes.rename_columns({"id": "_ib", "sz": "_sz_b"}),
        join_type="inner", num_partitions=16,
        on=("id_b",), right_on=("_ib",),
    )

    def flt(df: pd.DataFrame) -> pa.Table:
        # typed ARROW output: a 0-row pandas block loses its schema
        # (the _typed_pairs class) and the downstream _verify_join
        # JoinOperator (acero) rejects a schema-less left side with
        # "No match ... for key field reference FieldRef.Name(id_a)"
        # — map_batches tolerated it, the hash join does not
        df = _typed_pairs(df, extra=("c", "_sz_a", "_sz_b"))
        keep = df[(2 * df["c"] * 10000)
                  >= (2 * thr - 1) * (df["_sz_a"] + df["_sz_b"] - df["c"])]
        return pa.table({
            "id_a": pa.array(keep["id_a"].to_numpy(), pa.int64()),
            "id_b": pa.array(keep["id_b"].to_numpy(), pa.int64()),
        })

    # materialized: the pending joins must not share one plan with the
    # verify stage's JoinOperators (CPU-slot starvation; same rule as
    # _verify_join), and verify consumes the pair list twice.  The join
    # upstream leaves zero-column empty-partition blocks in the output;
    # _verify_join strips them at its own inputs.
    return j.map_batches(flt, batch_format="pandas").materialize()


def _sum_pair_counts(pairs, num_buckets: int, small_limit: int = 5_000_000):
    """Aggregate per-bucket (id_a, id_b, c) partials to global
    co-occurrence counts — driver-side pandas when small, a bucketed
    groupby Dataset above the limit (same small-side rule as
    :func:`_distinct_pairs`)."""
    from .groupby import bucketed_agg

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["id_a", "id_b"], sort=False,
                          as_index=False)["c"].sum()

    mat = pairs.materialize()
    if mat.count() <= small_limit:
        return combine(_typed_pairs(mat.to_pandas(), extra=("c",)))
    # materialized: the groupby's pending all-to-all must not share an
    # execution plan with downstream JoinOperators (_bound_filter_pairs
    # large path) — same starvation rule as _verify_join
    return bucketed_agg(
        mat, ["id_a", "id_b"], lambda df, keys: combine(df),
        num_buckets=num_buckets,
    ).materialize()


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

def _simhash_batch(texts) -> np.ndarray:
    """Vectorized 64-bit SimHash over word unigrams for a batch of
    texts (pyarrow string array) — one bit-matrix unpack + one
    ``np.add.reduceat`` over doc boundaries; no per-row Python.
    Returns uint64 per doc.  Deterministic (pandas siphash, fixed
    key)."""
    wh, counts = _word_hashes(texts)
    # per-bit segment sums as 64 1-D reduceats (a 2-D unpackbits +
    # axis-0 reduceat measured 60x slower); every doc has ≥ 1 word
    # ("" splits to [""]), so the boundaries are strictly increasing
    starts = np.cumsum(np.concatenate([[0], counts[:-1]]))
    bitsum = np.empty((len(counts), 64), np.int64)
    one = np.uint64(1)
    for j in range(64):
        bitsum[:, j] = np.add.reduceat(
            ((wh >> np.uint64(j)) & one).view(np.int64), starts)
    acc = 2 * bitsum - counts[:, None]  # sum of ±1 per bit
    return np.packbits(acc > 0, axis=1,
                       bitorder="little").view(np.uint64).ravel()


def simhash64(text: str) -> int:
    """64-bit SimHash of one text (the batch kernel applied to a
    single row)."""
    return int(_simhash_batch(pa.array([text], pa.string()))[0])


def near_dup_simhash(ds, text_col: str = "text", id_col: str = "doc_id",
                     max_hamming: int = 3, num_buckets: int = 64,
                     group_cap: int | None = DEFAULT_GROUP_CAP):
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit hash into ``max_hamming + 1``
    near-equal chunks — a pair within the hamming budget cannot differ
    in every chunk, so a groupby per (chunk_idx, chunk_value) finds
    ALL candidates (a FIXED 4-chunk split would silently lose recall
    for max_hamming ≥ 4); exact hamming verification follows."""
    from .groupby import _BUCKET, _bucket_of

    n_chunks = max_hamming + 1
    if not 1 <= n_chunks <= 64:
        raise ValueError(f"max_hamming must be in [0, 63]: {max_hamming}")
    widths = np.full(n_chunks, 64 // n_chunks, dtype=np.int64)
    widths[: 64 % n_chunks] += 1
    shifts = np.concatenate([[0], np.cumsum(widths)[:-1]]).astype(np.uint64)
    masks = np.array([(1 << int(w)) - 1 for w in widths], dtype=np.uint64)

    def sketch(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({k: pa.array([], pa.int64())
                             for k in ("id", "chunk", "value", "sim")})
        ids = batch.column(id_col).to_numpy()
        sh = _simhash_batch(batch.column(text_col).cast(pa.string()))
        chunk = np.tile(np.arange(n_chunks, dtype=np.int64), len(sh))
        value = ((np.repeat(sh, n_chunks) >> np.tile(shifts, len(sh)))
                 & np.tile(masks, len(sh))).view(np.int64)
        return pa.table({
            "id": pa.array(np.repeat(ids, n_chunks), pa.int64()),
            "chunk": pa.array(chunk, pa.int64()),
            "value": pa.array(value, pa.int64()),
            "sim": pa.array(np.repeat(sh.view(np.int64), n_chunks),
                            pa.int64()),
        })

    bands = ds.select_columns([id_col, text_col]).map_batches(
        sketch, batch_format="pyarrow", batch_size=4096
    )

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, ["chunk", "value"], num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # shared pair-gen + vectorized popcount hamming on the surviving
        # sim_x/sim_y payload columns
        d = _cap_group_members(df.drop_duplicates(["chunk", "value", "id"]),
                               ["chunk", "value"], group_cap, "simhash")
        m = _self_pairs(d, ["chunk", "value"])
        if not len(m):
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int64)})
        x = (np.ascontiguousarray(m["sim_x"].to_numpy()).view(np.uint64)
             ^ np.ascontiguousarray(m["sim_y"].to_numpy()).view(np.uint64))
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        m = m.assign(hamming=ham)
        m = m[m["hamming"] <= max_hamming]
        return (m[["id_a", "id_b", "hamming"]]
                .drop_duplicates(subset=["id_a", "id_b"]))

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

#: rows per matmul side in embedding_near_dup before a centroid bucket
#: is split — 4096² float64 similarities ≈ 134 MB per task.
DEFAULT_BUCKET_BUDGET = 4096

_MAX_SPLITS = 1 << 10  # task-key encoding bound (splits per bucket)


def embedding_near_dup(ds, vec_col: str = "embedding", id_col: str = "vec_id",
                       threshold: float = 0.999, n_centroids: int = 16,
                       nprobe: int = 2, train_sample: int = 4096,
                       num_buckets: int = 64,
                       bucket_budget: int = DEFAULT_BUCKET_BUDGET):
    """Pairs with cosine ≥ threshold — IVF-bucketed exact verification.

    Scale shape (no full-matrix broadcast, no O(n·d) driver state):

      1. centroids are trained on a BOUNDED driver-side sample
         (``train_sample`` rows) and broadcast — tiny;
      2. each vector is assigned to its ``nprobe`` nearest centroids
         (multi-probe: a pair at cos ≥ threshold ≈ 1 has near-identical
         centroid similarities, so the two top-``nprobe`` sets always
         intersect — missing a pair needs BOTH probes to differ);
      3. **hot buckets split**: a centroid that attracts more than
         ``bucket_budget`` vectors is divided into s = ⌈m/budget⌉
         sub-buckets by a deterministic id hash, and every UNORDERED
         sub-bucket pair (i ≤ j) becomes its own task — each vector
         ships to its s tasks, every intra-bucket pair is still
         compared exactly once, and per-task memory stays ≤ budget²
         similarities regardless of skew (a dominant-centroid corpus
         no longer OOMs one worker);
      4. pairs are found by an exact normalized matmul within each
         (sub-)bucket task (``groupby(task).map_groups``), then deduped
         across shared probe buckets.

    Bucket sizes are counted with one cheap pass over the int64 bucket
    column (per-batch bincount partials combined on the driver —
    ``n_centroids`` values, no shuffle)."""
    from .groupby import bucketed_agg
    from .similarity import _trained_centroids

    # ORDER-STABLE bounded sample (similarity._trained_centroids):
    # limit() takes whichever blocks arrive first, so centroids — and
    # therefore probe assignments and the emitted pair set — would
    # differ run-to-run on identical data
    C = _trained_centroids(ds, n_centroids, vec_col, id_col, train_sample)
    if len(C) == 0:
        # empty input: zero pairs, like every sibling operator
        return ray.data.from_arrow(pa.table({
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "cos_e3": pa.array([], pa.int64())}))
    c_ref = ray.put(C)
    dim = C.shape[1]

    def assign(batch: pa.Table) -> pa.Table:
        from .similarity import _ids_and_vectors

        if len(batch) == 0:  # (0, 1) placeholder would break the gemm
            return pa.table({
                "bucket": pa.array([], pa.int64()),
                "id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float64(), dim))})
        Cn = ray.get(c_ref)
        # Arrow-native extraction (list_flatten → reshape, no per-float
        # Python objects) — this runs over every corpus vector
        ids, Vn = _ids_and_vectors(batch, id_col, vec_col)
        npb = min(nprobe, len(Cn))
        probes = np.argsort(-(Vn @ Cn.T), axis=1)[:, :npb]  # (n, nprobe)
        reps = np.repeat(np.arange(len(ids)), npb)
        flat = pa.array(Vn[reps].ravel(), pa.float64())
        return pa.table({
            "bucket": pa.array(probes.reshape(-1).astype(np.int64)),
            "id": pa.array(np.repeat(ids, npb)),
            "vec": pa.FixedSizeListArray.from_arrays(flat, dim),
        })

    # materialized: consumed twice (size census + task explode) — the
    # assignment matmul should run once, and the nprobe×n×dim store is
    # object-store-resident/spillable
    assigned = ds.select_columns([id_col, vec_col]).map_batches(
        assign, batch_format="pyarrow", batch_size=4096).materialize()

    def count_buckets(t: pa.Table) -> pa.Table:
        n = np.bincount(t.column("bucket").to_numpy(), minlength=len(C))
        return pa.table({"bucket": pa.array(np.arange(len(C), dtype=np.int64)),
                         "n": pa.array(n.astype(np.int64))})

    census = (assigned.select_columns(["bucket"])
              .map_batches(count_buckets, batch_format="pyarrow")
              .to_pandas().groupby("bucket")["n"].sum())
    splits = {int(b): min(int(np.ceil(n / bucket_budget)), _MAX_SPLITS)
              for b, n in census.items() if n > bucket_budget}
    if splits:
        logger.warning(
            "embedding_near_dup: %d hot centroid bucket(s) over %d rows "
            "split into sub-bucket tasks: %s", len(splits), bucket_budget,
            {b: s for b, s in sorted(splits.items())})
    splits_ref = ray.put(splits)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def explode_tasks(t: pa.Table) -> pa.Table:
        """task = bucket·S² + ti·S + tj (ti ≤ tj).  A vector in
        sub-bucket s_i joins every task pairing s_i with another
        sub-bucket — s tasks per vector, each unordered pair of rows
        co-located exactly once: same-split pairs meet only in the
        (s_i, s_i) task, cross-split pairs only in (min, max)."""
        sp = ray.get(splits_ref)
        bucket = t.column("bucket").to_numpy()
        if not sp:
            task = bucket * (_MAX_SPLITS * _MAX_SPLITS)
            return t.append_column(
                "task", pa.array(task, pa.int64())).append_column(
                "split", pa.array(np.zeros(len(t), np.int64))).drop_columns(
                ["bucket"])
        # vectorized split-count lookup (centroid-indexed table, not a
        # per-row dict probe — this map runs over every assigned row)
        lut = np.ones(len(C), dtype=np.int64)
        for b, s in sp.items():
            lut[b] = s
        s_arr = lut[bucket]
        ids = t.column("id").to_numpy()
        my = ((ids.astype(np.uint64) * GOLD)
              % s_arr.astype(np.uint64)).astype(np.int64)
        idx = np.repeat(np.arange(len(t)), s_arr)
        offs = np.cumsum(s_arr) - s_arr
        other = np.arange(int(s_arr.sum())) - np.repeat(offs, s_arr)
        mine = my[idx]
        ti = np.minimum(mine, other)
        tj = np.maximum(mine, other)
        task = (bucket[idx] * (_MAX_SPLITS * _MAX_SPLITS)
                + ti * _MAX_SPLITS + tj)
        return pa.table({
            "task": pa.array(task, pa.int64()),
            "split": pa.array(mine, pa.int64()),
            "id": pa.array(ids[idx], pa.int64()),
            "vec": t.column("vec").take(pa.array(idx)),
        })

    tasks = assigned.map_batches(explode_tasks, batch_format="pyarrow",
                                 batch_size=65536)

    def pairs_in_task(df: pd.DataFrame) -> pa.Table:
        task = int(df["task"].iat[0])
        ti = (task // _MAX_SPLITS) % _MAX_SPLITS
        tj = task % _MAX_SPLITS
        if ti == tj:
            ids = df["id"].to_numpy()
            V = np.stack(df["vec"].to_numpy())
            S = V @ V.T
            iu, ju = np.where(S >= threshold)
            keep = ids[iu] < ids[ju]
            ia, ib = ids[iu[keep]], ids[ju[keep]]
            cos = S[iu[keep], ju[keep]]
        else:
            da = df[df["split"].to_numpy() == ti]
            db = df[df["split"].to_numpy() == tj]
            if not len(da) or not len(db):
                return pa.table({"id_a": pa.array([], pa.int64()),
                                 "id_b": pa.array([], pa.int64()),
                                 "cos_e3": pa.array([], pa.int64())})
            aid, bid = da["id"].to_numpy(), db["id"].to_numpy()
            S = np.stack(da["vec"].to_numpy()) @ np.stack(
                db["vec"].to_numpy()).T
            iu, ju = np.where(S >= threshold)
            xa, xb = aid[iu], bid[ju]
            ia, ib = np.minimum(xa, xb), np.maximum(xa, xb)
            cos = S[iu, ju]
        return pa.table({
            "id_a": pa.array(ia, pa.int64()),
            "id_b": pa.array(ib, pa.int64()),
            "cos_e3": pa.array(
                np.floor(cos * 1000 + 0.5).astype(np.int64)),
        })

    pairs = tasks.groupby("task").map_groups(
        pairs_in_task, batch_format="pandas")

    # a pair sharing several probed buckets appears once per bucket
    return bucketed_agg(
        pairs, ["id_a", "id_b"],
        lambda df, keys: df.drop_duplicates(subset=["id_a", "id_b"]),
        num_buckets=num_buckets,
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

def decontaminate(ds, benchmark_texts: list[str], text_col: str = "text",
                  k: int = 8, mode: str = "tag"):
    """Benchmark decontamination: mark (``mode='tag'``, adds a bool
    ``contaminated`` column) or drop (``mode='drop'``) every document
    sharing at least one exact k-word shingle with any benchmark text —
    the eval-overlap filter every published LLM data pipeline runs
    (GPT-3 appx. C / The Pile use 13-gram overlap; reference has no
    analogue — this is engine-extension surface like the dedup family).

    Scale shape: the benchmark side is SMALL by definition (eval suites
    are KBs–MBs, the corpus is TBs), so its shingles are built once
    driver-side and broadcast via ``ray.put`` — corpus docs stream
    through one vectorized ``map_batches`` membership test with NO
    shuffle and no second pass.  Two-phase exactness: the uint64
    window-hash pre-filter (shared :func:`_hashed_windows` kernel)
    never misses a true string match (docs sharing a shingle share its
    hash), and hash-hit rows are re-verified against the exact
    benchmark shingle STRING set, so an accidental 64-bit collision
    cannot condemn a clean document — output is value-exact vs a SQL
    oracle, zero residual."""
    import ray

    if not benchmark_texts:
        if mode == "drop":
            return ds
        return ds.map_batches(
            lambda b: b.append_column(
                "contaminated", pa.array([False] * len(b), pa.bool_())),
            batch_format="pyarrow")
    bench_strings = set()
    for t in benchmark_texts:
        bench_strings.update(shingle_set(t, k))
    arr = pa.array(benchmark_texts, pa.string())
    g, _, _ = _hashed_windows(arr, k)
    bench_hashes = np.unique(g)
    hashes_ref = ray.put(bench_hashes)
    strings_ref = ray.put(bench_strings)

    def tag(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).cast(pa.string())
        hset = ray.get(hashes_ref)
        g, widx, _ = _hashed_windows(texts, k)
        hit = np.zeros(len(batch), bool)
        cand = np.unique(widx[np.isin(g, hset)])
        if len(cand):
            sset = ray.get(strings_ref)
            # exact string verify only on the (rare) hash-hit rows;
            # null text verifies as '' (the hash convention)
            ok = [any(s in sset for s in
                      shingle_set(texts[int(d)].as_py() or "", k))
                  for d in cand]
            hit[cand[ok]] = True
        if mode == "drop":
            return batch.filter(pa.array(~hit))
        return batch.append_column("contaminated",
                                   pa.array(hit, pa.bool_()))

    return ds.map_batches(tag, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document duplicate-span fraction
# ---------------------------------------------------------------------------

def dup_span_fraction(ds, text_col: str = "text", id_col: str = "doc_id",
                      k: int = 8, num_buckets: int = 64,
                      join_partitions: int = 16):
    """Per-document CROSS-corpus duplicate-n-gram fraction: of each
    doc's distinct k-word spans, what share occurs in ≥ 2 distinct
    documents — the boilerplate signal Gopher/Dolma threshold on
    ("fraction of characters in duplicated n-grams"), computed corpus-
    wide rather than within-doc (filters.py's repetition gate covers
    the within-doc variant).

    Scale shape: explode to (doc, span-hash) distinct pairs (shared
    :func:`_hashed_windows` kernel, int64s on the wire — never the
    span strings), bucketed-groupby the span hash to a per-span
    distinct-doc count, then ONE more bucketed aggregate per doc of
    (spans, spans-with-df≥2).  No driver-side gather at any size; both
    shuffles carry pre-combined rows.  Collision honesty: two distinct
    spans hashing equal (≈ n²/2⁶⁴) can only INFLATE df, so the
    fraction over-counts by the same residual class every hash-sketch
    operator here carries; the SQL oracle computes exact string spans
    and has matched value-for-value at every tested scale.

    Returns (id, n_spans, n_dup, dup_frac_e4) with
    ``dup_frac_e4 = floor(n_dup / n_spans · 10⁴ + 0.5)``."""
    from .groupby import bucketed_agg

    source = ds.select_columns([id_col, text_col])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        ud, hashes = _distinct_doc_windows(batch, text_col, k)
        return pa.table({
            "id": pa.array(ids[ud], pa.int64()),
            "span": pa.array(hashes, pa.int64()),
        })

    # consumed twice (per-span df count + join back): materialize so
    # the explode's string pass runs once — ~16 B per distinct
    # (doc, span) row, object-store-resident, spills beyond memory
    ex = source.map_batches(explode, batch_format="pyarrow",
                            batch_size=2048).materialize()

    # span → distinct-doc count (rows are already (doc, span)-distinct,
    # so a plain count is the distinct-doc count; partial counts sum)
    def span_df(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(
            df_cnt=("df_cnt", "sum"))

    counts = bucketed_agg(
        ex, ["span"], span_df,
        prepare=lambda df: df.assign(df_cnt=np.int64(1))[["span", "df_cnt"]],
        num_buckets=num_buckets)

    # ship the flag back to the exploded rows by a hash join on the
    # span (both sides already speak int64 span hashes).  counts is
    # materialized first: a pending groupby all-to-all must not share
    # an execution plan with a JoinOperator (starves — same rule as
    # _verify_join / _sum_pair_counts).  join_partitions is SEPARATE
    # from num_buckets: the join spawns one aggregator actor per
    # partition up front, so oversizing it past the cluster's CPUs
    # deadlocks scheduling (64 partitions hang a 4-CPU session —
    # probed); 16 matches every other join site here
    joined = ex.join(counts.materialize(), join_type="inner",
                     num_partitions=join_partitions, on=("span",))

    def per_doc(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False, sort=False).agg(
            n_spans=("n_spans", "sum"), n_dup=("n_dup", "sum"))

    stats = bucketed_agg(
        joined, ["id"], per_doc,
        prepare=lambda df: pd.DataFrame({
            "id": df["id"].to_numpy(dtype=np.int64),
            "n_spans": np.ones(len(df), dtype=np.int64),
            "n_dup": (df["df_cnt"].to_numpy(dtype=np.int64) >= 2
                      ).astype(np.int64),
        }),
        num_buckets=num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n_spans").to_numpy()
        d = batch.column("n_dup").to_numpy()
        frac = np.floor(d / n * 10000 + 0.5).astype(np.int64)
        return batch.append_column("dup_frac_e4", pa.array(frac))

    return stats.map_batches(finish, batch_format="pyarrow")
