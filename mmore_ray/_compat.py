"""Environment shims.

This sandbox ships fsspec without aiohttp, so importing
``fsspec.implementations.http`` raises.  Ray Data's path resolution
imports it on every read/write and tolerates ``ModuleNotFoundError`` —
but when two driver threads trigger the import concurrently, the loser
observes a *partially initialized* module and gets a plain
``ImportError`` that Ray does not catch.  Installing a tiny stub module
up front makes the import always succeed; the stub class is never
instantiated (there is no HTTP filesystem in this sealed environment),
so Ray's ``isinstance`` checks simply return False.
"""

from __future__ import annotations

import sys
import types


def install_schema_hash_warning_filter() -> None:
    """Drop Ray Data's per-block "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning.

    The warning fires inside ``transform_pyarrow.unify_schemas`` whenever a
    block schema is unhashable.  Parquet written by pandas/pyarrow carries
    a ``b'pandas'`` metadata blob, and ``pyarrow.Schema.__hash__`` raises on
    any schema with metadata — so *every* ``read_parquet`` of such a file
    logs the warning once per unify, hundreds of times per pipeline.  Ray
    falls back to the slow-path set-compare and produces identical results;
    the message carries no signal for metadata-bearing schemas, so it is
    filtered here (only that exact message — other warnings pass through).
    """
    import logging

    class _DropSchemaHashWarning(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            return "Failed to hash the schemas" not in record.getMessage()

    logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").addFilter(
        _DropSchemaHashWarning()
    )


def install_fsspec_http_stub() -> None:
    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel only; nothing instantiates it
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


install_fsspec_http_stub()
install_schema_hash_warning_filter()
