"""read_parquet_clean: metadata-free schemas without breaking projection."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mmore_ray.sources.readers import clean_schema, read_parquet_clean


@pytest.fixture(scope="module")
def pandas_style_parquet(tmp_path_factory):
    # Parquet with a pandas-style metadata blob on the schema, like the
    # driver's testdata files — this is what makes schemas unhashable.
    path = str(tmp_path_factory.mktemp("rp") / "t.parquet")
    tbl = pa.table(
        {"a": [1, 2, 3], "b": ["x", "y", "z"], "c": [1.0, 2.0, 3.0]}
    ).replace_schema_metadata({b"pandas": b"{}"})
    pq.write_table(tbl, path)
    return path


def test_clean_schema_strips_metadata(pandas_style_parquet):
    s = clean_schema(pandas_style_parquet)
    assert s.metadata is None
    hash(s)  # hashable => Ray's schema-dedup fast path works


def test_clean_schema_projects_in_requested_order(pandas_style_parquet):
    s = clean_schema(pandas_style_parquet, columns=["c", "a"])
    assert s.names == ["c", "a"]


def test_read_all_columns(ray_session, pandas_style_parquet):
    ds = read_parquet_clean(pandas_style_parquet)
    assert ds.count() == 3
    assert ds.schema().names == ["a", "b", "c"]


def test_read_columns_in_non_file_order(ray_session, pandas_style_parquet):
    # Ray 2.49 builds blocks with pa.Table.from_batches(..., schema=schema);
    # a full-file schema with a reordered column subset raises ArrowInvalid,
    # so the helper must project the schema to the requested columns/order.
    ds = read_parquet_clean(pandas_style_parquet, columns=["b", "a"])
    rows = ds.take_all()
    assert sorted(r["a"] for r in rows) == [1, 2, 3]
    assert set(rows[0].keys()) == {"a", "b"}
