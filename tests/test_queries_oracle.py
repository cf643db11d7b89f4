"""Mirror of the driver's correctness gate: run every Ray query and its
DuckDB oracle on the same parquet, compare row count, column names and
order-insensitive values."""

import duckdb
import pandas as pd
import pytest

from mmore_ray.pipelines.queries import (EXTRA_ORACLES, EXTRA_QUERIES,
                                         ORACLES, QUERIES)

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# one flat gate over driver-registered queries AND the demoted extras
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(ALL_ORACLES[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) & set(ALL_ORACLES)))
def test_query_matches_oracle(name, ray_session):
    got = ALL_QUERIES[name](SF_DIR)
    if not isinstance(got, pd.DataFrame):  # the driver converts likewise
        got = got.to_pandas()
    want = _oracle(name)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    got_c, want_c = _canon(got), _canon(want)
    assert len(got_c) == len(want_c), f"{name}: rows {len(got_c)} != {len(want_c)}"
    # the driver hashes VALUES, so int64 `150` vs float64 `150.0` is a
    # mismatch even when assert_frame_equal(check_dtype=False) passes —
    # compare dtype kinds too (the round-1 red-hash lesson)
    got_kinds = {c: got_c[c].dtype.kind for c in got_c.columns}
    want_kinds = {c: want_c[c].dtype.kind for c in want_c.columns}
    assert got_kinds == want_kinds, f"{name}: dtype kinds {got_kinds} != {want_kinds}"
    pd.testing.assert_frame_equal(got_c, want_c, check_dtype=False, check_exact=True)


def test_variant_builders_survive_empty_batches():
    """A tail block with no doc_id % 5 == 0 rows used to crash the
    near-copy builder: pa.array([' extradup'] * 0) is null-typed and
    binary_join_element_wise has no (string, null, string) kernel —
    the suffix must be a scalar."""
    import pyarrow as pa

    from mmore_ray.pipelines.queries import _exact_copy_rows, _near_copy_rows

    t = pa.table({"doc_id": pa.array([3071, 3072, 3074], pa.int64()),
                  "text": pa.array(["a", "b", "c"])})  # none % 5 or % 7
    assert _near_copy_rows(t).num_rows == 0  # empty keep: no crash
    assert _exact_copy_rows(t).num_rows == 0
    full = pa.table({"doc_id": pa.array([5, 7], pa.int64()),
                     "text": pa.array(["x", "y"])})
    nr = _near_copy_rows(full)
    assert nr.column("text").to_pylist() == ["x extradup"]
    assert nr.column("doc_id").to_pylist() == [1000005]


def test_ivf_index_interrupted_build_rebuilds(ray_session, tmp_path,
                                              monkeypatch):
    """The q_knn_ivf_indexed skip guard is a _SUCCESS sentinel written
    AFTER the bucket spill: a dir holding only centroids.json (an
    interrupted build) must be rebuilt, not served."""
    import os

    from mmore_ray.pipelines.queries import QUERIES

    # first run builds and marks success
    out1 = QUERIES["q_knn_ivf_indexed"](SF_DIR)
    if not isinstance(out1, pd.DataFrame):
        out1 = out1.to_pandas()
    import glob
    import hashlib

    src = os.stat(f"{SF_DIR}/embeddings.parquet")
    tag = hashlib.sha1(
        f"{SF_DIR}:{src.st_mtime_ns}:{src.st_size}".encode()).hexdigest()[:10]
    idx = f"/tmp/ivf_index_{tag}"
    assert os.path.exists(f"{idx}/_SUCCESS")
    # simulate the interrupt: buckets gone, centroids present, no sentinel
    os.unlink(f"{idx}/_SUCCESS")
    for f in glob.glob(f"{idx}/bucket=*/*.parquet"):
        os.unlink(f)
    out2 = QUERIES["q_knn_ivf_indexed"](SF_DIR)
    if not isinstance(out2, pd.DataFrame):
        out2 = out2.to_pandas()
    assert os.path.exists(f"{idx}/_SUCCESS")
    pd.testing.assert_frame_equal(_canon(out1), _canon(out2))


def test_every_query_has_oracle_or_is_flagged():
    # non-SQL-expressible ops may be oracle-free, but must be explicit
    from mmore_ray.pipelines.queries import EXTRA_NO_ORACLE, NO_ORACLE
    assert set(QUERIES) - set(ORACLES) == NO_ORACLE
    assert set(EXTRA_QUERIES) - set(EXTRA_ORACLES) == EXTRA_NO_ORACLE


def test_driver_registry_is_exactly_fifty():
    """The driver checks the first 50 registered queries; every
    registered operator must land inside that window (round-2 gate
    gap: 58 registered, the last 8 got no CORRECTNESS row)."""
    assert len(QUERIES) == 50
    # the consolidated surfaces are registered, their donors demoted
    for merged in ("q_window_funcs", "q_text_analysis", "q_rag_eval"):
        assert merged in QUERIES
    for donor in ("q_running_total", "q_order_gaps", "q_rank_orders",
                  "q_lang_id", "q_quality", "q_token_count"):
        assert donor in EXTRA_QUERIES and donor not in QUERIES
