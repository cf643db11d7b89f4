"""Adaptive equi-join: broadcast the right side when it is small,
hash-shuffle ``Dataset.join`` when it is not.

The rule every distributed engine applies (e.g. Spark's broadcast-join
threshold): shipping a small dimension table to every task once is
strictly cheaper than shuffling both sides; but a fact-scale right side
must never be collected to the driver.  One semantic, two physical
plans — output columns and rows are identical (tested in
tests/test_joins.py), so callers write one line and stay scale-safe.

The reference has no relational joins (SURVEY §2.5); this is the
engine-native surface its incremental-reuse lookups and our relational
queries build on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


def _is_source_plan(ds) -> bool:
    """True when the dataset is a bare source (parquet read, in-memory
    blocks) with no compute stages — its ``count()`` is metadata-only
    and consuming it never re-runs upstream work."""
    try:
        return not ds._logical_plan.dag.input_dependencies
    except Exception:  # private API moved — conservative: materialize
        return False


def lookup_join(left_ds, right_ds, left_key: str, right_key: str,
                broadcast_limit: int = 2_000_000, num_partitions: int = 16):
    """Inner equi-join ``left ⋈ right``; the right side contributes its
    non-key columns.  Output columns: left's columns (key keeps the
    LEFT name) + right's non-key columns — the same shape for both
    physical plans.

    ``right_ds.count()`` on a bare source is metadata-only and the
    chosen plan streams straight from the scan, so a fact-scale
    parquet right side is never copied into the object store.  A right
    side WITH compute stages is materialized first so the count for
    the plan choice and the join consume ONE execution instead of
    running the upstream pipeline twice."""
    if not _is_source_plan(right_ds):
        right_ds = right_ds.materialize()
    if right_ds.count() <= broadcast_limit:
        tbl = right_ds.to_pandas().set_index(right_key)
        ref = ray.put(tbl)

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            right = ray.get(ref)  # local object-store fetch per task
            out = df.join(right, on=left_key, how="inner")
            return out.reset_index(drop=True)

        return left_ds.map_batches(attach, batch_format="pandas")

    joined = left_ds.join(right_ds, join_type="inner",
                          num_partitions=num_partitions,
                          on=(left_key,), right_on=(right_key,))
    # Dataset.join keeps the left key column under the left name and
    # drops the right key — already the contract; nothing to rename.
    return joined


def anti_join(left_ds, right_ds, left_key: str, right_key: str,
              broadcast_limit: int = 2_000_000, num_partitions: int = 16):
    """Left anti-join: left rows whose ``left_key`` does NOT appear in
    the right side's ``right_key`` column.  Null keys are assumed
    absent (engine convention: ids are non-null int64/string).

    Same adaptive split as :func:`lookup_join` — ONE semantic, two
    physical plans (tested identical):

    * small right → the key set is collected once and broadcast
      (``ray.put``), each task filters locally — no shuffle;
    * large right → the keys are globally deduplicated with one
      bounded bucket shuffle (so duplicates cannot multiply left
      rows), then a distributed ``left_outer`` hash join against a
      marker column keeps exactly the unmatched rows — the drop set
      never touches the driver."""
    import pyarrow.compute as pc

    if not _is_source_plan(right_ds):
        right_ds = right_ds.materialize()
    keys_ds = right_ds.select_columns([right_key])
    if right_ds.count() <= broadcast_limit:
        chunks = [b.column(right_key).combine_chunks()
                  for b in keys_ds.iter_batches(batch_format="pyarrow")]
        if not chunks:
            return left_ds  # empty right side: nothing to drop
        # broadcast an Arrow value set (zero-copy from plasma) and
        # filter with the vectorized is_in kernel — a Python set would
        # re-unpickle per task and probe per row.  Default is_in null
        # semantics equal the previous pandas isin (probed): a null
        # left key drops iff the right side contains a null.
        ref = ray.put(pc.unique(pa.chunked_array(chunks)))

        def drop(t: pa.Table) -> pa.Table:
            m = pc.is_in(t.column(left_key), value_set=ray.get(ref))
            return t.filter(pc.invert(m))

        return left_ds.map_batches(drop, batch_format="pyarrow")

    from .groupby import _BUCKET, _bucket_of

    marker = "_aj_marker"

    def partial(df: pd.DataFrame) -> pa.Table:
        out = df[[right_key]].drop_duplicates()
        out = out.copy()
        out[_BUCKET] = _bucket_of(out, [right_key], num_partitions * 4)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(df: pd.DataFrame) -> pa.Table:
        out = df.drop(columns=[_BUCKET]).drop_duplicates()
        out = out.copy()
        out[marker] = np.int64(1)
        return pa.Table.from_pandas(out, preserve_index=False)

    distinct = (keys_ds.map_batches(partial, batch_format="pandas")
                .groupby(_BUCKET).map_groups(final, batch_format="pandas"))
    joined = left_ds.join(distinct, join_type="left_outer",
                          num_partitions=num_partitions,
                          on=(left_key,), right_on=(right_key,))

    def unmatched(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(marker))).drop_columns([marker])

    return joined.map_batches(unmatched, batch_format="pyarrow")


def _int64_relation(df: pd.DataFrame, live: list[str], dead: list[str],
                    side: int, bucket: np.ndarray) -> pa.Table:
    """One side of a two-sided co-grouped operator as a typed Arrow
    relation: live columns as int64, the other side's columns as int64
    ZERO sentinels (never read — rows are split by ``_side`` before any
    access; zeros, not nulls, because a null in any row would make the
    pandas conversion of the unioned column float64, and float64 cannot
    represent epoch-µs timestamps ≈ 1.7e18 > 2^53 exactly), plus the
    side tag and shuffle bucket.  Keeping every payload column int64
    (epoch-µs timestamps, integerized money — the suite's
    numeric-parity convention) is what lets two different schemas union
    into ONE relation with no schema negotiation."""
    n = len(df)
    cols: dict[str, pa.Array] = {}
    for c in live:
        cols[c] = pa.array(df[c].to_numpy(dtype=np.int64, copy=False),
                           type=pa.int64())
    for c in dead:
        cols[c] = pa.array(np.zeros(n, dtype=np.int64))
    cols["_side"] = pa.array(np.full(n, side, dtype=np.int64))
    cols["_bucket"] = pa.array(bucket.astype(np.int64))
    return pa.table(cols)


def asof_join(left_ds, right_ds, *, by: str, on: str,
              left_cols: list[str], right_cols: list[str],
              tiebreak: str, num_buckets: int = 32,
              batch_size: int = 65536):
    """Distributed backward as-of join — the temporal-join operator Ray
    Data lacks (DuckDB ``ASOF JOIN`` / pandas ``merge_asof``
    semantics, made deterministic).

    For each left row: the right row with the same ``by`` key and the
    greatest ``on`` ≤ the left ``on``; ties on ``on`` broken by the
    greatest ``tiebreak`` (which must be one of ``right_cols``).  Left
    rows with no qualifying right row are dropped (inner).

    Every participating column must be int64 (pre-convert timestamps
    to epoch-µs and integerize money — see module doc of
    pipelines/queries.py for the parity rule).

    Scale shape: hash-bucket ``by`` with the SAME function on both
    sides (co-partitioning), union the two int64 relations, ONE
    ``groupby(_bucket)`` shuffle, and inside each bucket a single
    vectorized ``pd.merge_asof`` over the sorted frames.  No driver
    state, no broadcast of either side; a bucket's memory is bounded
    by (rows of its keys on both sides), so skew is bounded by the
    hottest single key — salt ``by`` upstream if one key outgrows a
    worker (same rule as stages/groupby.py).
    """
    if tiebreak not in right_cols:
        raise ValueError("tiebreak must be one of right_cols")
    from .groupby import _bucket_of

    out_schema = pa.schema(
        [(c, pa.int64()) for c in [by, on, *left_cols, *right_cols]])

    def prep_left(df: pd.DataFrame) -> pa.Table:
        b = _bucket_of(df, [by], num_buckets)
        return _int64_relation(df, [by, on, *left_cols], right_cols, 0, b)

    def prep_right(df: pd.DataFrame) -> pa.Table:
        b = _bucket_of(df, [by], num_buckets)
        return _int64_relation(df, [by, on, *right_cols], left_cols, 1, b)

    def per_bucket(df: pd.DataFrame) -> pa.Table:
        left = df[df["_side"] == 0]
        right = df[df["_side"] == 1]
        if left.empty or right.empty:
            return out_schema.empty_table()
        lf = pd.DataFrame(
            {c: left[c].to_numpy(dtype=np.int64) for c in [by, on, *left_cols]}
        ).sort_values(on, kind="stable")
        # ascending (on, tiebreak): merge_asof takes the LAST right row
        # with on ≤ left.on, so equal-on ties resolve to max(tiebreak)
        rf = pd.DataFrame(
            {c: right[c].to_numpy(dtype=np.int64) for c in [by, on, *right_cols]}
        ).sort_values([on, tiebreak], kind="stable").reset_index(drop=True)
        # join on a right ROW NUMBER, not the right payload: merge_asof
        # renders unmatched slots as NaN, which would force the matched
        # payload column through float64 (inexact past 2^53); the row
        # number is always < 2^53, and the payload is then gathered
        # from the intact int64 frame
        rkey = rf[[by, on]].copy()
        rkey["_ridx"] = np.arange(len(rf), dtype=np.int64)
        m = pd.merge_asof(lf, rkey, on=on, by=by, direction="backward")
        mask = m["_ridx"].notna().to_numpy()
        m = m[mask]
        ridx = m["_ridx"].to_numpy(dtype=np.int64)
        out = {c: pa.array(m[c].to_numpy(dtype=np.int64), pa.int64())
               for c in [by, on, *left_cols]}
        for c in right_cols:
            out[c] = pa.array(rf[c].to_numpy()[ridx], pa.int64())
        return pa.table(out)

    unioned = (
        left_ds.map_batches(prep_left, batch_format="pandas",
                            batch_size=batch_size)
        .union(right_ds.map_batches(prep_right, batch_format="pandas",
                                    batch_size=batch_size)))
    return unioned.groupby("_bucket").map_groups(
        per_bucket, batch_format="pandas")


def interval_agg_join(points_ds, intervals_ds, *, point_on: str,
                      interval_id: str, interval_start: str,
                      interval_end: str, sum_cols: list[str],
                      bucket_width: int, count_col: str = "n_points",
                      num_buckets: int = 32, batch_size: int = 65536):
    """Non-equi range join + windowed aggregate: for each interval
    ``[start, end)``, the count and column sums of the points whose
    ``point_on`` falls inside it.  No equality key at all — both sides
    can be fact-scale.  Intervals with zero points are absent from the
    output (inner semantics).

    All columns int64 (epoch-µs / integerized), as in :func:`asof_join`.

    Scale shape (band-bucketing, the classic distributed interval
    join): time is cut into ``bucket_width`` bands; each point lands
    in exactly one band, each interval is REPLICATED into every band
    it overlaps (≤ ``len/width + 1`` copies — choose ``bucket_width``
    ≥ the typical interval length so replication stays ≤ 2×).  Bands
    are spread round-robin over ``num_buckets`` shuffle groups
    (adjacent hot bands land on different workers); inside a group the
    candidate pairs come from an exact equi-merge on the band id — a
    (point, interval) pair can meet in only the point's band, so no
    pair dedup is needed — then the exact containment filter and a
    vectorized partial aggregate per interval.  Partials from
    different bands of the same interval are summed by one final
    bounded ``bucketed_sum`` shuffle.
    """
    from .groupby import _replicate_spans, bucketed_sum

    out_cols = [count_col, *sum_cols]

    def prep_points(df: pd.DataFrame) -> pa.Table:
        us = df[point_on].to_numpy(dtype=np.int64)
        tb = us // bucket_width
        out = pd.DataFrame({"_tb": tb, point_on: us,
                            **{c: df[c].to_numpy(dtype=np.int64)
                               for c in sum_cols}})
        return _int64_relation(
            out, ["_tb", point_on, *sum_cols],
            [interval_id, interval_start, interval_end], 0,
            (tb % num_buckets))

    def prep_intervals(df: pd.DataFrame) -> pa.Table:
        start = df[interval_start].to_numpy(dtype=np.int64)
        end = df[interval_end].to_numpy(dtype=np.int64)
        ids = df[interval_id].to_numpy(dtype=np.int64)
        tb0 = start // bucket_width
        tb1 = (end - 1) // bucket_width
        # negative spans (malformed end < start) clamp to zero replicas
        # inside the shared helper
        idx, pos = _replicate_spans(tb1 - tb0 + 1)
        out = pd.DataFrame({"_tb": tb0[idx] + pos, interval_id: ids[idx],
                            interval_start: start[idx],
                            interval_end: end[idx]})
        return _int64_relation(
            out, ["_tb", interval_id, interval_start, interval_end],
            [point_on, *sum_cols], 1, (out["_tb"].to_numpy() % num_buckets))

    partial_schema = pa.schema(
        [(interval_id, pa.int64())] + [(c, pa.int64()) for c in out_cols])

    def per_band_group(df: pd.DataFrame) -> pa.Table:
        pt = df[df["_side"] == 0]
        iv = df[df["_side"] == 1]
        if pt.empty or iv.empty:
            return partial_schema.empty_table()
        ptf = pd.DataFrame({c: pt[c].to_numpy(dtype=np.int64)
                            for c in ["_tb", point_on, *sum_cols]})
        ivf = pd.DataFrame({c: iv[c].to_numpy(dtype=np.int64)
                            for c in ["_tb", interval_id, interval_start,
                                      interval_end]})
        m = ptf.merge(ivf, on="_tb")
        m = m[(m[point_on] >= m[interval_start])
              & (m[point_on] < m[interval_end])]
        if m.empty:
            return partial_schema.empty_table()
        m[count_col] = np.int64(1)
        g = m.groupby(interval_id, as_index=False)[out_cols].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    unioned = (
        points_ds.map_batches(prep_points, batch_format="pandas",
                              batch_size=batch_size)
        .union(intervals_ds.map_batches(prep_intervals, batch_format="pandas",
                                        batch_size=batch_size)))
    partials = unioned.groupby("_bucket").map_groups(
        per_band_group, batch_format="pandas")
    return bucketed_sum(partials, [interval_id], out_cols,
                        num_buckets=max(8, num_buckets // 2))
