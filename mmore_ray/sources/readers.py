"""Parquet reading helpers.

``read_parquet_clean`` is ``ray.data.read_parquet`` with the file's
schema stripped of metadata before it is handed to Ray.  Parquet written
by pandas/pyarrow carries a ``b'pandas'`` metadata blob, and
``pyarrow.Schema.__hash__`` raises on any schema with metadata — so every
block-schema unification inside Ray Data takes the slow path and logs
"Failed to hash the schemas (for deduplication)" once per unify, in every
task process.  Passing an explicit metadata-free schema makes every block
schema hashable (fast-path dedup, zero log noise) and costs one
footer/schema read on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import ray


def clean_schema(paths, columns=None, filesystem=None):
    """The unified Arrow schema of ``paths`` (file, dir, or list), without
    metadata, projected to ``columns`` (in the requested order) when given.

    Ray's parquet reader builds each output block with
    ``pa.Table.from_batches(..., schema=schema)``; a fragment batch carries
    exactly the requested columns in the requested order, so the schema we
    hand Ray must match that order or block construction raises
    ``ArrowInvalid`` (observed on Ray 2.49).

    ``filesystem``: optional ``pyarrow.fs.FileSystem`` the paths live on.
    """
    schema = pads.dataset(paths, filesystem=filesystem) \
        .schema.remove_metadata()
    if columns is not None:
        schema = pa.schema([schema.field(n) for n in columns])
    return schema


def read_parquet_clean(paths, *, columns=None, filesystem=None,
                       **kwargs) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        paths, columns=columns,
        schema=clean_schema(paths, columns, filesystem=filesystem),
        filesystem=filesystem, **kwargs
    )
