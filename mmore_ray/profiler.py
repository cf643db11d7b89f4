"""Per-stage profiling hooks (≙ the reference's cProfile wrapper,
``src/mmore/profiler.py:36-138`` + ``docs/advanced_usage/profiler.md``,
re-expressed Ray-natively).

The reference wraps pipeline functions in cProfile dumps; the Ray-Data
equivalent of "where did the time go" is ``Dataset.stats()`` — per
operator wall time, block counts, and task breakdowns from the
streaming executor.  :func:`profiled` runs a consumption, captures the
stats text plus wall time, and (optionally) persists them next to the
job's manifest so a production run leaves its execution profile in the
output directory — the same place resume state lives.

Usage::

    from mmore_ray.profiler import profiled

    result, prof = profiled("scan", lambda: ds.count(),
                            dataset=lambda: ds, out_dir=out)

Env-gated like the reference (``MMORE_PROFILE=1`` enables persistence
by default; explicit ``out_dir`` always persists).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any, Callable


def profiled(name: str, consume: Callable[[], Any],
             dataset: Callable[[], Any] | None = None,
             out_dir: str | Path | None = None) -> tuple[Any, dict]:
    """Run ``consume`` (a Dataset consumption thunk), return its result
    plus a profile record ``{name, seconds, stats}``.

    ``dataset`` (optional): zero-arg callable returning the consumed
    Dataset so its ``.stats()`` can be captured AFTER execution (Ray
    populates stats on the executed plan).  Persists to
    ``out_dir/_profile/<name>.json`` when ``out_dir`` is given or
    ``MMORE_PROFILE`` is set."""
    t0 = time.perf_counter()
    result = consume()
    record = {
        "name": name,
        "seconds": round(time.perf_counter() - t0, 3),
        "stats": None,
    }
    if dataset is not None:
        try:
            record["stats"] = dataset().stats()
        except Exception as exc:  # stats are best-effort diagnostics
            record["stats"] = f"unavailable: {exc}"
    target = out_dir or os.environ.get("MMORE_PROFILE_DIR")
    if target or os.environ.get("MMORE_PROFILE"):
        base = Path(target) if target else Path(".")
        pdir = base / "_profile"
        pdir.mkdir(parents=True, exist_ok=True)
        (pdir / f"{name}.json").write_text(json.dumps(record, indent=1))
    return result, record
