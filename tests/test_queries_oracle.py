"""Mirror of the driver's correctness gate: run every Ray query and its
DuckDB oracle on the same parquet, compare row count, column names and
order-insensitive values."""

import duckdb
import pandas as pd
import pytest

from mmore_ray.pipelines.queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle(name: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con.execute(ORACLES[name]).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) & set(ORACLES)))
def test_query_matches_oracle(name, ray_session):
    got = QUERIES[name](SF_DIR)
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


def test_every_query_has_oracle_or_is_flagged():
    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be oracle-free, but must be explicit
    from mmore_ray.pipelines.queries import NO_ORACLE
    assert missing == NO_ORACLE, missing
