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

import pandas as pd

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


def lookup_join(left_ds, right_ds, left_key: str, right_key: str,
                broadcast_limit: int = 2_000_000, num_partitions: int = 16):
    """Inner equi-join ``left ⋈ right``; the right side contributes its
    non-key columns.  Output columns: left's columns (key keeps the
    LEFT name) + right's non-key columns — the same shape for both
    physical plans.

    ``right_ds.count()`` on a pure parquet read is metadata-only, so
    the plan choice costs no data pass."""
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
