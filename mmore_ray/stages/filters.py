"""Filter stages (reference §2.3 ``DatatroveFilter`` surface).

The reference wraps 11 datatrove quality filters
(``filter/datatrove_wrapper.py:27-39``); the datatrove library is not
in this environment, so 10 of the 11 are reimplemented from their
published definitions as vectorized batch predicates (language,
repetition, gopher-quality composite, fineweb/C4-style signals via the
composite, sampler, regex, lambda, unigram-logprob, url blocklist).
Only the fasttext classifier stays out — it is a learned model, not
logic.  Each filter is ``batch -> batch`` returning the kept subset —
the reference's keep-if-true flat-map semantics
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
    """Gopher-style doc-length gate.  Vectorized word counts via the
    exact Python-``str.split()`` whitespace class (taggers._WORD_RUN);
    null text counts 0 words (never crashes the batch)."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .taggers import _WORD_RUN

        wc = pc.count_substring_regex(
            pc.fill_null(batch.column("text"), ""), _WORD_RUN)
        return batch.filter(pc.and_(pc.greater_equal(wc, min_words),
                                    pc.less_equal(wc, max_words)))

    return fn


def alpha_ratio_filter(min_ratio: float = 0.5) -> Callable:
    """C4/gopher-style: fraction of words containing ≥1 alphabetic
    char.  Vectorized: total words and letter-bearing words are two
    RE2 counts (``\\pL`` == Python ``isalpha`` — both are the Unicode
    letter categories); null/empty text has ratio 0.0."""

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .taggers import _PY_WS, _WORD_RUN

        texts = pc.fill_null(batch.column("text"), "")
        wc = pc.count_substring_regex(texts, _WORD_RUN).to_numpy()
        aw = pc.count_substring_regex(
            texts, f"[^{_PY_WS}]*\\pL[^{_PY_WS}]*").to_numpy()
        ratio = np.where(wc > 0, aw / np.maximum(wc, 1), 0.0)
        return batch.filter(pa.array(ratio >= min_ratio))

    return fn


def repetition_filter(max_dup_line_frac: float = 0.5) -> Callable:
    """Gopher repetition signal: fraction of duplicate lines.  Null
    text has no lines (kept, like empty text)."""

    def fn(batch: pa.Table) -> pa.Table:
        mask = []
        for t in batch.column("text").to_pylist():
            lines = [ln for ln in (t or "").splitlines() if ln.strip()]
            if not lines:
                mask.append(True)
                continue
            dup = 1 - len(set(lines)) / len(lines)
            mask.append(dup <= max_dup_line_frac)
        return _keep(batch, mask)

    return fn


def regex_filter(pattern: str, keep_matching: bool = False) -> Callable:
    """≙ datatrove RegexFilter: drop (or keep) docs matching pattern.
    Null text never matches (kept unless keep_matching)."""
    rx = re.compile(pattern)

    def fn(batch: pa.Table) -> pa.Table:
        mask = [bool(rx.search(t or "")) == keep_matching
                for t in batch.column("text").to_pylist()]
        return _keep(batch, mask)

    return fn


def lang_filter(allowed: set[str]) -> Callable:
    """Keep docs whose detected language is in ``allowed`` (uses the
    ``lang`` tag column when present, else detects)."""

    allowed_arr = pa.array(sorted(allowed), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if "lang" in batch.column_names:
            langs = batch.column("lang")
        else:
            from .text_analysis import detect_lang_batch

            # vectorized classifier (one compiled-regex scan per
            # language), identical answers to per-row detect_lang;
            # null text → 'unknown'
            langs = pa.array(
                detect_lang_batch(batch.column("text").to_pandas()),
                pa.string())
        # is_in yields null for null lang values; filter drops them —
        # same as the per-row `lg in allowed` (None is never allowed)
        return batch.filter(pc.is_in(langs, value_set=allowed_arr))

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


_ALPHA_WORD_RE = re.compile(r"(?<![^ ])[^ ]*[A-Za-z][^ ]*(?![^ ])")
_ELLIPSIS_RE = re.compile(r"\.\.\.")


def _en_stopword_re() -> re.Pattern:
    from .text_analysis import LANG_PROFILES

    return re.compile(
        "(?<![^ ])(?:" + "|".join(map(re.escape, LANG_PROFILES["en"]))
        + ")(?![^ ])")


def url_filter(blocked_domains: frozenset | set = frozenset(),
               blocked_subwords: tuple[str, ...] = (),
               url_col: str = "url") -> Callable:
    """≙ datatrove URLFilter (blocklist form, ``filter_url`` in
    ``datatrove_wrapper.py:39``): drop docs whose URL's domain — or any
    parent domain — is blocklisted, or whose URL contains a blocked
    subword.  Pure string logic, no model."""
    blocked_domains = frozenset(d.lower() for d in blocked_domains)

    def fn(batch: pa.Table) -> pa.Table:
        mask = []
        for u in batch.column(url_col).to_pylist():
            u = u or ""  # null url: no domain, nothing blocklisted
            # the authority ends at the first of / ? # — a no-path URL
            # like 'http://evil.com?x=@good.com' must not smuggle a
            # fake '@userinfo' in via its query string
            authority = re.split(r"[/?#]", u.split("//", 1)[-1], 1)[0]
            # strip userinfo: 'user@evil.com' must not hide the host
            dom = authority.rsplit("@", 1)[-1].split(":")[0].lower()
            parts = dom.split(".")
            chain = {".".join(parts[i:]) for i in range(len(parts))}
            bad = bool(chain & blocked_domains) or any(
                s in u for s in blocked_subwords)
            mask.append(not bad)
        return _keep(batch, mask)

    return fn


def unigram_logprob_filter(word_logprobs: dict[str, float],
                           min_avg_logprob: float = -8.0,
                           unknown_logprob: float = -10.0) -> Callable:
    """≙ datatrove UnigramLogProbFilter (``filter_unigram-logprob``):
    keep docs whose mean per-word unigram log-probability clears the
    threshold.  The probability table is caller-supplied (datatrove
    ships a 1T-ngram-derived table; any ``{word: log10 p}`` dict
    works); unknown words get ``unknown_logprob``.  Vectorized via a
    pandas dict-map over the exploded word column."""
    import pandas as pd

    def fn(batch: pa.Table) -> pa.Table:
        texts = pd.Series(batch.column("text").to_pylist())
        n = (texts.str.count(" ") + 1).to_numpy()
        flat = texts.str.split(" ").explode()
        lp = flat.map(word_logprobs).fillna(unknown_logprob).to_numpy()
        sums = np.zeros(len(texts))
        np.add.at(sums, flat.index.to_numpy().astype(np.int64), lp)
        avg = sums / np.maximum(n, 1)
        return _keep(batch, list(avg >= min_avg_logprob))

    return fn


def gopher_quality_filter(min_words: int = 50, max_words: int = 100_000,
                          min_avg_word_len: float = 3.0,
                          max_avg_word_len: float = 10.0,
                          max_symbol_word_ratio: float = 0.1,
                          min_alpha_word_ratio: float = 0.8,
                          min_stop_words: int = 2) -> Callable:
    """≙ datatrove GopherQualityFilter (``filter_gopher-quality``) —
    the published Gopher rules (Rae et al. 2021 §A1.1) as one
    vectorized composite: word-count window, mean word length window,
    ``#``/ellipsis symbol ratio, alphabetic-word ratio, and a minimum
    English stopword count.  Words are space-split (the engine's
    oracle-checkable convention) rather than nltk-tokenized."""
    import pandas as pd

    stop_re = _en_stopword_re()

    def fn(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column("text").to_pylist())
        n_words = (s.str.count(" ") + 1).to_numpy()
        n_chars = s.str.len().to_numpy()
        avg_len = (n_chars - (n_words - 1)) / np.maximum(n_words, 1)
        symbols = (s.str.count("#") + s.str.count(_ELLIPSIS_RE)).to_numpy()
        alpha_words = s.str.count(_ALPHA_WORD_RE).to_numpy()
        stops = s.str.count(stop_re).to_numpy()
        ok = (
            (n_words >= min_words) & (n_words <= max_words)
            & (avg_len >= min_avg_word_len) & (avg_len <= max_avg_word_len)
            & (symbols <= max_symbol_word_ratio * n_words)
            & (alpha_words >= min_alpha_word_ratio * n_words)
            & (stops >= min_stop_words)
        )
        return _keep(batch, list(ok))

    return fn


def lambda_filter(predicate: Callable[[dict], bool]) -> Callable:
    """≙ datatrove LambdaFilter — arbitrary per-row predicate (slow
    path; prefer the vectorized filters in hot stages)."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return _keep(batch, [bool(predicate(r)) for r in rows])

    return fn


class HashingTextClassifier:
    """fastText-supervised-style linear text classifier: hashed bag of
    word unigrams + bigrams (feature hashing, the trick fastText uses)
    → multinomial logistic regression trained by deterministic
    full-batch gradient descent.

    This is the 11th datatrove filter's model family implemented for
    real (``filter/datatrove_wrapper.py:36`` FastTextClassifierFilter)
    — the reference loads pre-trained ``.bin`` weights, which cannot be
    fetched in this sandbox, so the classifier trains from caller-
    provided (text, label) pairs instead; both are the same linear
    model at inference time.  Deterministic end-to-end (seeded init,
    fixed iteration order)."""

    def __init__(self, dim: int = 4096, lr: float = 0.5,
                 epochs: int = 50, seed: int = 3):
        self._dim = dim
        self._lr = lr
        self._epochs = epochs
        self._seed = seed
        self._labels: list[str] = []
        self._W: np.ndarray | None = None

    def _features(self, text: str) -> np.ndarray:
        import zlib

        v = np.zeros(self._dim, dtype=np.float64)
        words = text.lower().split()
        for i, w in enumerate(words):
            v[zlib.crc32(w.encode()) % self._dim] += 1.0
            if i + 1 < len(words):
                bg = f"{w} {words[i + 1]}"
                v[zlib.crc32(bg.encode()) % self._dim] += 1.0
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def fit(self, texts: list[str], labels: list[str]) -> "HashingTextClassifier":
        self._labels = sorted(set(labels))
        lab_idx = {l: i for i, l in enumerate(self._labels)}
        X = np.stack([self._features(t) for t in texts])
        Y = np.zeros((len(texts), len(self._labels)))
        for r, l in enumerate(labels):
            Y[r, lab_idx[l]] = 1.0
        rng = np.random.default_rng(self._seed)
        W = rng.standard_normal((self._dim, len(self._labels))) * 0.01
        for _ in range(self._epochs):
            Z = X @ W
            Z -= Z.max(axis=1, keepdims=True)
            P = np.exp(Z)
            P /= P.sum(axis=1, keepdims=True)
            W -= self._lr * (X.T @ (P - Y)) / len(texts)
        self._W = W
        return self

    def predict_proba(self, texts: list[str]) -> np.ndarray:
        assert self._W is not None, "fit() first"
        X = np.stack([self._features(t) for t in texts])
        Z = X @ self._W
        Z -= Z.max(axis=1, keepdims=True)
        P = np.exp(Z)
        return P / P.sum(axis=1, keepdims=True)

    @property
    def labels(self) -> list[str]:
        return self._labels


def fasttext_like_filter(keep_label: str, threshold: float = 0.5,
                         train_texts: list[str] | None = None,
                         train_labels: list[str] | None = None,
                         classifier: HashingTextClassifier | None = None,
                         text_col: str = "text") -> Callable:
    """Keep rows where P(keep_label) ≥ threshold under the linear
    classifier (≙ datatrove FastTextClassifierFilter semantics).  Pass
    a pre-trained ``classifier`` or training pairs; the model is built
    ONCE at filter construction (per-pipeline, not per batch) and rides
    into tasks by closure capture."""
    if classifier is None and not train_texts:
        raise ValueError(
            "fasttext_like_filter needs a pre-trained `classifier` or "
            "(`train_texts`, `train_labels`) pairs — with neither, fit() "
            "would die on an empty feature stack")
    if classifier is None and len(train_texts or []) != len(train_labels or []):
        # short labels would silently train all-zero targets for the
        # unlabeled rows (wrong keep/drop decisions, no error); missing
        # labels would die in a cryptic numpy reduction error
        raise ValueError(
            f"train_texts ({len(train_texts or [])}) and train_labels "
            f"({len(train_labels or [])}) must pair up one-to-one")
    clf = classifier or HashingTextClassifier().fit(
        train_texts or [], train_labels or [])
    if keep_label not in clf.labels:
        raise ValueError(
            f"keep_label {keep_label!r} not among trained labels "
            f"{clf.labels}")
    col = clf.labels.index(keep_label)

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        if not texts:
            return batch
        p = clf.predict_proba(texts)[:, col]
        return _keep(batch, list(p >= threshold))

    return fn


ALL_FILTERS = {
    "length": length_filter,
    "alpha_ratio": alpha_ratio_filter,
    "repetition": repetition_filter,
    "regex": regex_filter,
    "lang": lang_filter,
    "sampler": sampler_filter,
    "lambda": lambda_filter,
    "url": url_filter,
    "unigram_logprob": unigram_logprob_filter,
    "gopher_quality": gopher_quality_filter,
    "fasttext_like": fasttext_like_filter,
}
