"""Filter stages (reference §2.3 ``DatatroveFilter`` surface).

The reference wraps 11 datatrove quality filters
(``filter/datatrove_wrapper.py:27-39``); the datatrove library is not
in this environment, so the filters a code/text corpus actually needs
are reimplemented from their published definitions as vectorized batch
predicates.  Each filter is ``batch -> batch`` returning the kept
subset — the reference's keep-if-true flat-map semantics
(``filter/base.py:44-49``).

``sampler_filter`` replaces datatrove's random sampler with a
*deterministic* hash-based sample (stable across processes and
re-runs — a property the engine's resume semantics require)."""

from __future__ import annotations

import re
from collections.abc import Callable

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_u64


def _keep(batch: pa.Table, mask: list[bool]) -> pa.Table:
    return batch.filter(pa.array(mask, pa.bool_()))


def length_filter(min_words: int = 1, max_words: int = 1_000_000) -> Callable:
    """Gopher-style doc-length gate."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = [min_words <= len(t.split()) <= max_words
                for t in batch.column("text").to_pylist()]
        return _keep(batch, mask)

    return fn


def alpha_ratio_filter(min_ratio: float = 0.5) -> Callable:
    """C4/gopher-style: fraction of words containing ≥1 alphabetic char."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = []
        for t in batch.column("text").to_pylist():
            ws = t.split()
            ok = sum(1 for w in ws if any(c.isalpha() for c in w))
            mask.append((ok / len(ws) if ws else 0.0) >= min_ratio)
        return _keep(batch, mask)

    return fn


def repetition_filter(max_dup_line_frac: float = 0.5) -> Callable:
    """Gopher repetition signal: fraction of duplicate lines."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = []
        for t in batch.column("text").to_pylist():
            lines = [ln for ln in t.splitlines() if ln.strip()]
            if not lines:
                mask.append(True)
                continue
            dup = 1 - len(set(lines)) / len(lines)
            mask.append(dup <= max_dup_line_frac)
        return _keep(batch, mask)

    return fn


def regex_filter(pattern: str, keep_matching: bool = False) -> Callable:
    """≙ datatrove RegexFilter: drop (or keep) docs matching pattern."""
    rx = re.compile(pattern)

    def fn(batch: pa.Table) -> pa.Table:
        mask = [bool(rx.search(t)) == keep_matching
                for t in batch.column("text").to_pylist()]
        return _keep(batch, mask)

    return fn


def lang_filter(allowed: set[str]) -> Callable:
    """Keep docs whose detected language is in ``allowed`` (uses the
    ``lang`` tag column when present, else detects)."""

    def fn(batch: pa.Table) -> pa.Table:
        if "lang" in batch.column_names:
            langs = batch.column("lang").to_pylist()
        else:
            from .text_analysis import detect_lang

            langs = [detect_lang(t) for t in batch.column("text").to_pylist()]
        return _keep(batch, [lg in allowed for lg in langs])

    return fn


def sampler_filter(rate: float, key_col: str = "sample_id",
                   seed: int = 42) -> Callable:
    """Deterministic sample: keep row iff
    stable_u64(seed ∥ key) mod 1e6 < rate·1e6."""
    threshold = int(rate * 1_000_000)

    def fn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        mask = [stable_u64(f"{seed}:{k}") % 1_000_000 < threshold
                for k in keys]
        return _keep(batch, mask)

    return fn


def lambda_filter(predicate: Callable[[dict], bool]) -> Callable:
    """≙ datatrove LambdaFilter — arbitrary per-row predicate (slow
    path; prefer the vectorized filters in hot stages)."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return _keep(batch, [bool(predicate(r)) for r in rows])

    return fn


ALL_FILTERS = {
    "length": length_filter,
    "alpha_ratio": alpha_ratio_filter,
    "repetition": repetition_filter,
    "regex": regex_filter,
    "lang": lang_filter,
    "sampler": sampler_filter,
    "lambda": lambda_filter,
}


def stopword_mask(texts: list[str], stopwords: set[str],
                  min_hits: int = 2) -> np.ndarray:
    """Gopher stopword signal helper (≥ min_hits stopwords present)."""
    out = np.zeros(len(texts), dtype=bool)
    for i, t in enumerate(texts):
        hits = sum(1 for w in t.split() if w in stopwords)
        out[i] = hits >= min_hits
    return out
