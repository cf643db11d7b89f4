"""The cross-engine numeric-parity kernels — ONE copy.

The driver's correctness gate compares column-sorted VALUES between the
Ray engine and the DuckDB oracles, so every float that reaches an
output is integerized with the SAME expression on both sides, and
every timestamp is normalized to epoch-µs the SAME way.  These two
helpers ARE that contract; inline re-implementations drift (a unit or
rounding change applied to one copy silently breaks oracle parity for
the queries using the others).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def int_scale(x, scale: int) -> np.ndarray:
    """``floor(x*scale + 0.5)`` as int64 — mirrors the SQL side's
    ``CAST(floor(expr * scale + 0.5) AS BIGINT)``."""
    return np.floor(
        np.asarray(x, dtype=np.float64) * scale + 0.5).astype(np.int64)


def to_us(ts: pd.Series) -> np.ndarray:
    """Epoch-µs regardless of the input's datetime64 unit (a pandas /
    pyarrow version that coerces to ns would otherwise silently change
    window/gap semantics by 1000x)."""
    return ts.to_numpy().astype("datetime64[us]").astype(np.int64)
