"""Scalable grouped aggregation and top-k.

Ray Data's native ``groupby(key).aggregate(...)`` reduce phase costs
Python-level work *per group*, which collapses at high key cardinality
(measured: 147k groups → 70-150 s for a 600k-row sum that takes ~3 s
bucketed).  The engine therefore aggregates in three stages:

  1. **partial** — vectorized per-batch combine inside ``map_batches``
     (pandas groupby / pyarrow), emitting Arrow (never pandas blocks:
     aggregates over pandas blocks hit a separate slow path);
  2. **bucket** — a deterministic hash of the key columns modulo
     ``num_buckets`` (low cardinality, so the Ray shuffle's per-group
     cost is bounded by ``num_buckets``, not by distinct keys);
  3. **final** — one vectorized pandas aggregate per bucket via
     ``groupby("_bucket").map_groups``.

Scale sizing: pick ``num_buckets`` so (total distinct keys /
num_buckets) × row width fits a worker's heap; skewed keys are already
collapsed per batch by the partial, so a hot key costs one row per
(batch, key) — salt only if one *single* key's partials outgrow a
bucket.  Ray's native path is still right for LOW-cardinality keys
(≲1k groups); callers choose.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_BUCKET = "_bucket"


def _bucket_of(df: pd.DataFrame, keys: list[str], num_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _replicate_spans(span: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized variable-count row replication: (idx, pos) where row
    i appears ``span[i]`` times (idx) at positions 0..span[i]-1 (pos).
    The ONE copy of the tricky repeat/cumsum idiom shared by hopping
    windows and interval joins.  Negative spans (malformed intervals —
    they contain no points by definition) clamp to zero replicas;
    np.repeat would crash on a negative count."""
    span = np.maximum(span, 0).astype(np.int64)
    idx = np.repeat(np.arange(len(span)), span)
    pos = np.arange(int(span.sum())) - np.repeat(np.cumsum(span) - span,
                                                 span)
    return idx, pos


def _restore_key_dtypes(out: pd.DataFrame, src: pd.DataFrame,
                        keys: list[str]) -> pd.DataFrame:
    """pandas groupby(dropna=False) re-infers key dtypes: a block whose
    only group is the NULL group turns an object (string) key into
    float64 NaN, which Arrow types ``double`` — un-unifiable with the
    ``string`` blocks of other buckets.  Restoring the source dtype
    keeps an all-null key object → Arrow ``null``, which unifies.
    (Nullable INT keys remain unsupported: Arrow int64-with-null
    becomes pandas float64 on INPUT already — coalesce upstream, same
    rule as rollup_sum's fill_value.)"""
    for k in keys:
        if k in out.columns and out[k].dtype != src[k].dtype:
            out[k] = out[k].astype(src[k].dtype)
    return out


def bucketed_sum(
    ds,
    keys: list[str],
    sum_cols: list[str],
    prepare=None,
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """groupby(keys).sum(sum_cols) at any key cardinality.

    ``prepare``: optional vectorized fn ``pd.DataFrame -> pd.DataFrame``
    producing the key + value columns from a raw batch (runs inside the
    partial stage, before the per-batch combine).
    """

    def partial(df: pd.DataFrame) -> pa.Table:
        if prepare is not None:
            df = prepare(df)
        # dropna=False: SQL GROUP BY keeps the NULL group — pandas'
        # default would silently drop those rows from every total
        g = df.groupby(keys, as_index=False, dropna=False)[sum_cols].sum()
        g = _restore_key_dtypes(g, df, keys)
        g[_BUCKET] = _bucket_of(g, keys, num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pa.Table:
        # emit Arrow blocks: pandas blocks break downstream
        # rename_columns/Project ops and trip Ray's schema-dedup hashing
        out = df.drop(columns=[_BUCKET]).groupby(
            keys, as_index=False, dropna=False)[sum_cols].sum()
        out = _restore_key_dtypes(out, df, keys)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pandas")
    )


def bucketed_agg(
    ds,
    keys: list[str],
    agg_fn,
    prepare=None,
    num_buckets: int = 64,
    batch_size: int = 65536,
):
    """General mergeable aggregate: ``agg_fn(df, keys) -> df`` must be
    idempotent under re-aggregation (applied per batch AND per bucket),
    e.g. sum/min/max/any-combine of pre-combined rows.  If rows with
    null keys must survive (SQL NULL-group semantics), ``agg_fn``'s own
    groupby must pass ``dropna=False`` — pandas drops them by default."""

    def partial(df: pd.DataFrame) -> pa.Table:
        if prepare is not None:
            df = prepare(df)
        g = agg_fn(df, keys)
        g[_BUCKET] = _bucket_of(g, keys, num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pa.Table:
        out = agg_fn(df.drop(columns=[_BUCKET]), keys)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(final, batch_format="pandas")
    )


def topk(ds, sort_cols: list[str], k: int, descending: list[bool] | bool = True):
    """Global top-k without a full sort shuffle: per-batch local top-k,
    then one final top-k over the ≤ k×num_blocks survivors.

    Determinism: ``sort_cols`` should end in a unique tie-breaking
    column (same contract as :func:`topk_per_group`) — equal-valued
    rows at the k boundary otherwise survive or die by nondeterministic
    block order."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    ascending = [not d for d in descending]

    def local(df: pd.DataFrame) -> pa.Table:
        out = df.sort_values(sort_cols, ascending=ascending,
                             kind="stable").head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    reduced = ds.map_batches(local, batch_format="pandas", batch_size=65536)
    # survivors are tiny; a single-partition sort finishes the job
    return reduced.repartition(1).map_batches(
        local, batch_format="pandas", batch_size=None
    )


def grouped_count_distinct(ds, keys: list[str], col: str, out_col: str,
                           num_buckets: int = 64, batch_size: int = 65536):
    """Exact distributed ``count(DISTINCT col) GROUP BY keys``.

    Scale shape: per-batch dedup of the (keys, col) pairs (the
    combiner — dup-heavy batches collapse before any shuffle), then
    ONE bucketed shuffle keyed on the PAIR hash — every distinct pair
    lands in exactly one bucket, so the per-bucket counts per key are
    disjoint partials — and a final bounded :func:`bucketed_sum` over
    ≤ num_buckets partial rows per key.  Driver holds nothing; a hot
    key's distinct values spread over all buckets (the pair hash salts
    the key for free), so key skew does not concentrate."""
    pair = keys + [col]

    def partial(df: pd.DataFrame) -> pa.Table:
        # SQL COUNT(DISTINCT col) ignores NULLs — drop them before the
        # dedup or every null-bearing key counts one phantom value
        g = df.loc[df[col].notna(), pair].drop_duplicates()
        g = g.copy()
        g[_BUCKET] = _bucket_of(g, pair, num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        d = df.drop(columns=[_BUCKET]).drop_duplicates(subset=pair)
        out = (d.groupby(keys, as_index=False, dropna=False)
               .size().rename(columns={"size": out_col}))
        out = _restore_key_dtypes(out, df, keys)
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = (
        ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
        .groupby(_BUCKET)
        .map_groups(per_bucket, batch_format="pandas"))
    return bucketed_sum(partials, keys, [out_col],
                        num_buckets=max(8, num_buckets // 4))


def grouped_median(ds, keys: list[str], col: str, out_col: str,
                   scale: int = 100, num_buckets: int = 64,
                   batch_size: int = 65536):
    """Exact grouped median with ``quantile_cont(0.5)`` semantics (even
    counts interpolate the two middle values), integerized as
    ``floor(median * scale + 0.5)`` for cross-engine hash parity — the
    interpolation fraction is only ever 0 or exactly 0.5, so the
    float64 arithmetic is exact for integer-representable inputs.

    Scale shape — the exact-percentile-by-value-rollup trick: a
    :func:`bucketed_sum` rolls the input up to (keys, value) → count
    (combiner + one bounded shuffle; scale-safe while distinct values
    per key ≪ rows — quantities, scores, sizes; for continuous
    high-cardinality values switch to a fixed-bin histogram sketch and
    accept approximation), then one bucketed shuffle on keys and a
    per-key weighted-median selection over the sorted value/count rows
    (cheap: rows per key = distinct values per key)."""
    n_col = "_n"

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        # SQL quantile_cont ignores NULLs: a NaN value would sort last,
        # inflate the rank (shifting the median) and crash the int cast
        # when selected.  All-NULL groups are omitted from the output
        # (SQL would emit the key with a NULL median — callers needing
        # that row can left-join the key set back).
        out = df.loc[df[col].notna(), keys + [col]].copy()
        out[n_col] = np.int64(1)
        return out

    rolled = bucketed_sum(ds, keys + [col], [n_col], prepare=prepare,
                          num_buckets=num_buckets, batch_size=batch_size)

    def add_key_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, keys, num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_key_bucket(df: pd.DataFrame) -> pa.Table:
        rows = []
        for kv, g in df.drop(columns=[_BUCKET]).groupby(keys, sort=False,
                                                        dropna=False):
            g = g.sort_values(col)
            v = g[col].to_numpy(dtype=np.float64)
            cum = np.cumsum(g[n_col].to_numpy(dtype=np.int64))
            n = int(cum[-1])
            p = 0.5 * (n - 1)
            lo = int(np.floor(p))
            frac = p - lo
            vlo = v[np.searchsorted(cum, lo, side="right")]
            vhi = (v[np.searchsorted(cum, lo + 1, side="right")]
                   if frac else vlo)
            med = vlo + frac * (vhi - vlo)
            row = dict(zip(keys, kv if isinstance(kv, tuple) else (kv,)))
            row[out_col] = np.int64(np.floor(med * scale + 0.5))
            rows.append(row)
        out = _restore_key_dtypes(pd.DataFrame(rows), df, keys)
        return pa.Table.from_pandas(out, preserve_index=False)

    return (rolled.map_batches(add_key_bucket, batch_format="pandas")
            .groupby(_BUCKET)
            .map_groups(per_key_bucket, batch_format="pandas"))


def hopping_window_agg(ds, *, ts_col: str, keys: list[str],
                       sum_cols: list[str], width: int, step: int,
                       prepare=None, window_col: str = "window_start_us",
                       count_col: str = "n_rows", num_buckets: int = 64,
                       batch_size: int = 65536):
    """Sliding (hopping) window aggregate: count + column sums per
    ``(window_start, *keys)`` for EVERY window of length ``width``
    advancing by ``step`` that contains the row's ``ts_col`` (int64
    epoch-µs; windows align to the ``k·step`` epoch grid).  Tumbling
    windows are the ``step == width`` special case.

    Scale shape: a row's covering windows are CLOSED-FORM —
    ``k ∈ [(ts - width)//step + 1, ts//step]`` — so the map stage
    replicates each row into its ``width/step`` windows with
    ``np.repeat`` (no join, no state, no ordering assumption), the
    per-batch combiner collapses the replicas immediately, and one
    bounded :func:`bucketed_sum` shuffle merges the partials.
    Replication factor = ``width/step`` (size ``step`` accordingly);
    window-grid cardinality is time-range/step, spread uniformly by
    the bucket hash, so no window is hot unless its KEY is hot."""

    def prepare_rep(df: pd.DataFrame) -> pd.DataFrame:
        if prepare is not None:
            df = prepare(df)
        us = df[ts_col].to_numpy(dtype=np.int64)
        k1 = us // step
        k0 = (us - width) // step + 1
        idx, pos = _replicate_spans(k1 - k0 + 1)
        out = pd.DataFrame({window_col: (k0[idx] + pos) * step,
                            **{k: df[k].to_numpy()[idx] for k in keys},
                            **{c: df[c].to_numpy()[idx] for c in sum_cols}})
        out[count_col] = np.int64(1)
        return out

    return bucketed_sum(ds, [window_col, *keys], [count_col, *sum_cols],
                        prepare=prepare_rep, num_buckets=num_buckets,
                        batch_size=batch_size)


def grouped_quantiles_sketch(ds, keys: list[str], col: str,
                             quantiles: list[float], lo: float, hi: float,
                             bins: int = 512, prefix: str = "q",
                             num_buckets: int = 32,
                             batch_size: int = 65536):
    """Approximate grouped quantiles via a fixed-bin histogram sketch —
    the documented scale fallback of :func:`grouped_median` for
    CONTINUOUS high-cardinality values, where the exact value-rollup
    would approach one row per input row.

    Error bound: each estimate is within one bin width
    ``(hi - lo) / bins`` of the exact quantile (within-bin linear
    interpolation; values outside ``[lo, hi]`` clamp to the edge bins,
    so quantiles in clamped mass carry the clamp error too — widen the
    range or raise ``bins`` as needed; both are O(bins) memory per
    key, independent of row count).

    Scale shape: the histogram is a MERGEABLE sketch, so the partial /
    shuffle / final structure of :func:`bucketed_sum` applies
    verbatim — per-batch vectorized ``np.add.at`` histograms (one row
    per key per batch, ``bins`` int64 columns wide), one bounded
    bucketed shuffle, and a vectorized per-key inverse-CDF read-off."""
    hcols = [f"_h{i}" for i in range(bins)]
    width = (hi - lo) / bins

    def partial_hist(df: pd.DataFrame) -> pd.DataFrame:
        v = df[col].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        if not ok.all():
            # NaN → int64 casts to INT64_MIN, which clip would count in
            # the lowest bin, skewing every quantile toward lo; SQL
            # quantiles ignore NULLs — drop them
            df = df[ok]
            v = v[ok]
        # clip in FLOAT space before the int cast: +inf / out-of-range
        # values cast to INT64_MIN and would land in bin 0 instead of
        # clamping to the documented edge bin
        b = np.clip((v - lo) / width, 0, bins - 1).astype(np.int64)
        codes, uniq = pd.factorize(
            pd.MultiIndex.from_frame(df[keys]) if len(keys) > 1
            else df[keys[0]])
        mat = np.zeros((len(uniq), bins), dtype=np.int64)
        np.add.at(mat, (codes, b), 1)
        out = pd.DataFrame(mat, columns=hcols)
        if len(keys) > 1:
            for i, k in enumerate(keys):
                out.insert(i, k, [u[i] for u in uniq])
        else:
            out.insert(0, keys[0], uniq)
        return out

    merged = bucketed_sum(ds, keys, hcols, prepare=partial_hist,
                          num_buckets=num_buckets, batch_size=batch_size)

    qnames = [f"{prefix}{str(q).replace('.', '')}" for q in quantiles]

    def read_off(df: pd.DataFrame) -> pa.Table:
        mat = df[hcols].to_numpy(dtype=np.int64)
        cum = np.cumsum(mat, axis=1)
        n = cum[:, -1]
        out = df[keys].copy().reset_index(drop=True)
        for q, name in zip(quantiles, qnames):
            r = q * (n - 1)
            # first bin whose cumulative count exceeds the target rank
            b = (cum <= r[:, None]).sum(axis=1)
            prev = np.where(b > 0, np.take_along_axis(
                cum, np.maximum(b - 1, 0)[:, None], axis=1)[:, 0], 0)
            cnt = np.take_along_axis(mat, b[:, None], axis=1)[:, 0]
            frac = np.where(cnt > 0, (r - prev + 0.5) / cnt, 0.5)
            out[name] = lo + (b + np.clip(frac, 0.0, 1.0)) * width
        return pa.Table.from_pandas(out, preserve_index=False)

    return merged.map_batches(read_off, batch_format="pandas")


def topk_per_group(ds, keys: list[str], sort_cols: list[str], k: int,
                   descending: list[bool] | bool = True,
                   num_buckets: int = 64, batch_size: int = 65536):
    """Top-k rows PER GROUP (global top-k is :func:`topk`).

    Determinism: ``sort_cols`` must end in a tie-breaking unique
    column, or equal-valued rows at the k boundary make the result
    run-dependent (same contract as the SQL ``row_number()``
    equivalent).

    Scale shape: the per-batch combiner keeps at most k rows per
    (batch, group) — a vectorized sort + ``groupby(keys).head(k)`` —
    so survivors entering the single bucketed shuffle are ≤ k × blocks
    per group regardless of group size; the per-bucket final repeats
    the same sort+head.  Both stages are whole-frame vectorized (no
    per-group Python)."""
    if isinstance(descending, bool):
        descending = [descending] * len(sort_cols)
    ascending = [not d for d in descending]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(sort_cols, ascending=ascending,
                               kind="stable")
                .groupby(keys, sort=False, dropna=False).head(k))

    def partial(df: pd.DataFrame) -> pa.Table:
        g = local(df).copy()
        g[_BUCKET] = _bucket_of(g, keys, num_buckets)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(local(df.drop(columns=[_BUCKET])),
                                    preserve_index=False)

    return (ds.map_batches(partial, batch_format="pandas",
                           batch_size=batch_size)
            .groupby(_BUCKET)
            .map_groups(final, batch_format="pandas"))


def bucketed_window(ds, keys: list[str], window_fn, prepare=None,
                    num_buckets: int = 64, batch_size: int = 65536):
    """Ordered window functions (lag/lead/rank/cumsum/...) over
    high-cardinality partitions without the per-group Python cliff.

    ``window_fn(df) -> pd.DataFrame`` receives every row of a hash
    bucket of partitions (all rows of each partition co-located) and
    must compute the window VECTORIZED across all partitions in the
    bucket (``df.sort_values(...).groupby(keys).shift()/cumsum()/...``).

    Scale shape: one shuffle keyed by ``hash(keys) % num_buckets`` —
    the Ray ``groupby`` sees ``num_buckets`` groups regardless of
    partition cardinality; each bucket holds ~1/num_buckets of the
    rows, so size num_buckets to the worker heap.  Unlike aggregation
    there is no combiner (windows need every row), so this is the
    one bucketed pattern whose shuffle moves all rows — same volume
    as the SQL window it replaces.
    """

    def add_bucket(df: pd.DataFrame) -> pa.Table:
        if prepare is not None:
            df = prepare(df)
        df = df.copy()
        df[_BUCKET] = _bucket_of(df, keys, num_buckets)
        return pa.Table.from_pandas(df, preserve_index=False)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        out = window_fn(df.drop(columns=[_BUCKET]))
        return pa.Table.from_pandas(out, preserve_index=False)

    return (ds.map_batches(add_bucket, batch_format="pandas",
                           batch_size=batch_size)
            .groupby(_BUCKET)
            .map_groups(per_bucket, batch_format="pandas"))


def rollup_sum(ds, hierarchy: list[str], sum_cols: list[str], prepare=None,
               fill_value: int = -1, num_buckets: int = 64,
               batch_size: int = 65536):
    """``GROUP BY ROLLUP(hierarchy)``: sums at every prefix level of the
    hierarchy plus the grand total, in one scan of the input.

    Rolled-up key columns carry ``fill_value`` (not NULL: a null int64
    key would coerce the whole column to float64 in pandas on both
    engines — the SQL side mirrors with ``coalesce(key, fill)``).

    Scale shape: the input is scanned ONCE, into the finest-level
    aggregate (bucketed partial-combine shuffle).  Every coarser level
    re-aggregates the PREVIOUS level's output — at most ``distinct
    keys(level)`` rows, orders of magnitude smaller than the input —
    so rollup costs one big shuffle plus len(hierarchy) tiny ones.
    """
    finest = bucketed_sum(ds, hierarchy, sum_cols, prepare=prepare,
                          num_buckets=num_buckets, batch_size=batch_size)

    def filled(level_ds, keep: list[str]):
        rolled = [c for c in hierarchy if c not in keep]

        def fill(t: pa.Table) -> pa.Table:
            n = t.num_rows
            for c in rolled:
                t = t.append_column(
                    c, pa.array(np.full(n, fill_value), pa.int64()))
            return t.select(hierarchy + sum_cols)

        return level_ds.map_batches(fill, batch_format="pyarrow")

    levels = [filled(finest, hierarchy)]
    prev = finest
    for i in range(len(hierarchy) - 1, 0, -1):
        keep = hierarchy[:i]
        prev = bucketed_sum(prev, keep, sum_cols,
                            num_buckets=min(num_buckets, 8))
        levels.append(filled(prev, keep))

    def grand(df: pd.DataFrame) -> pa.Table:
        # sum of the last level's few rows; emitted from a single-group
        # groupby so it stays inside the Dataset (no driver collect)
        out = df[sum_cols].sum().to_frame().T
        for c in hierarchy:
            out[c] = np.int64(fill_value)
        return pa.Table.from_pandas(out[hierarchy + sum_cols],
                                    preserve_index=False)

    g = prev.map_batches(
        lambda df: df.assign(**{_BUCKET: np.int64(0)}),
        batch_format="pandas").groupby(_BUCKET).map_groups(
        lambda df: grand(df.drop(columns=[_BUCKET])), batch_format="pandas")
    levels.append(g)

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (SplitMix64) — vectorized, no Python
    per row; the avalanche quality HLL needs."""
    z = x.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def grouped_count_distinct_approx(ds, keys: list[str], col: str,
                                  out_col: str, p: int = 11,
                                  num_buckets: int = 16,
                                  batch_size: int = 65536):
    """Approximate distinct count per group — HyperLogLog registers as
    a mergeable sketch (relative error ≈ 1.04/sqrt(2^p); p=11 → ~2.3%).

    The exact path (:func:`grouped_count_distinct`) shuffles one row
    per distinct (key, value) pair; at 100 TB a near-unique value
    column makes that shuffle input-sized.  The sketch path shuffles
    one 2^p-byte register row per (batch, group) instead — constant
    per group, independent of distinct-value count.

    Pipeline: per-batch vectorized register build (SplitMix64 hash →
    bucket index = top p bits, rank = leading-zero count of the rest;
    ``np.maximum.at`` per group) → bucketed max-merge of registers →
    standard HLL estimate with the linear-counting small-range
    correction.  Merging is max(), so re-aggregation is idempotent and
    the result is deterministic regardless of block order.
    """
    m = np.uint64(1 << p)
    alpha = 0.7213 / (1 + 1.079 / float(m))

    def _hash_col(s: pd.Series) -> np.ndarray:
        if s.dtype.kind in "iu":
            return _splitmix64(s.to_numpy())
        # deterministic across processes (fixed-key siphash)
        return _splitmix64(
            pd.util.hash_pandas_object(s, index=False).to_numpy())

    def _registers(df: pd.DataFrame) -> pd.DataFrame:
        # SQL COUNT(DISTINCT) ignores NULLs — a NaN would hash into a
        # register like any value (same rule as the exact path)
        df = df[df[col].notna()]
        h = _hash_col(df[col])
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1
        nbits = 64 - p
        rank = np.zeros(len(h), dtype=np.uint8)
        bits = rest
        for shift in (32, 16, 8, 4, 2, 1):
            mask = bits < np.uint64(1 << (64 - shift))
            rank[mask] += shift
            bits = np.where(mask, bits << np.uint64(shift), bits)
        rank = np.minimum(rank, nbits).astype(np.uint8) + 1

        gdf = df[keys].copy()
        codes, uniq_idx = pd.factorize(
            pd.util.hash_pandas_object(gdf, index=False), sort=False)
        regs = np.zeros((len(uniq_idx), int(m)), dtype=np.uint8)
        np.maximum.at(regs, (codes, idx), rank)
        out = gdf.iloc[
            pd.Series(np.arange(len(gdf))).groupby(codes).first().to_numpy()
        ].reset_index(drop=True)
        out["_regs"] = [r.tobytes() for r in regs]
        return out

    def agg_fn(df: pd.DataFrame, ks: list[str]) -> pd.DataFrame:
        if "_regs" not in df.columns:
            return _registers(df)

        def merge(series: pd.Series) -> bytes:
            stack = np.frombuffer(b"".join(series), dtype=np.uint8)
            return stack.reshape(len(series), int(m)).max(axis=0).tobytes()

        out = df.groupby(ks, as_index=False,
                         dropna=False).agg(_regs=("_regs", merge))
        return _restore_key_dtypes(out, df, ks)

    sketches = bucketed_agg(ds, keys, agg_fn, num_buckets=num_buckets,
                            batch_size=batch_size)

    def estimate(df: pd.DataFrame) -> pa.Table:
        regs = np.frombuffer(b"".join(df["_regs"]), dtype=np.uint8)
        regs = regs.reshape(len(df), int(m)).astype(np.float64)
        est = alpha * float(m) ** 2 / np.power(2.0, -regs).sum(axis=1)
        zeros = (regs == 0).sum(axis=1)
        small = (est <= 2.5 * float(m)) & (zeros > 0)
        with np.errstate(divide="ignore"):
            linear = float(m) * np.log(float(m) / np.maximum(zeros, 1))
        est = np.where(small, linear, est)
        out = df[keys].copy()
        out[out_col] = np.floor(est + 0.5).astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    return sketches.map_batches(estimate, batch_format="pandas")
