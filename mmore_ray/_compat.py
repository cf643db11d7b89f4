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
