"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting.

Ray-native equivalents of the reference's tagger post-processors
(``post_processor/tagger/*`` — WordsCounter, LangDetector, TextHash)
plus the quality heuristics a training-data pipeline needs (datatrove-
style gopher/C4 signals, reimplemented from their published
definitions as vectorizable kernels).

Every kernel is deliberately SQL-expressible (counts, ratios, argmax
over fixed word lists) so the DuckDB oracles can check them
value-for-value; the langdetect/fasttext models of the reference are
replaced by a deterministic stopword-profile classifier (the
reference's own tests never assert model output, only tag plumbing —
``tagger/lang_detector.py:6-16``)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# Small, fixed stopword profiles; order of LANGS is the tie-break order.
LANG_PROFILES: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "ist", "ein", "zu"],
    "en": ["the", "a", "and", "of", "to", "is", "in", "that"],
    "es": ["el", "la", "los", "y", "de", "que", "en", "un"],
    "fr": ["le", "la", "les", "et", "de", "que", "dans", "un"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")

# One compiled per-language regex counting whole space-delimited tokens:
# space-only lookarounds reproduce split-by-space semantics exactly (a
# "\n"-suffixed token must NOT match, as in the SQL oracle's
# string_split(text, ' ')).
_LANG_RES: dict[str, re.Pattern] = {
    lang: re.compile(
        "(?<![^ ])(?:" + "|".join(map(re.escape, words)) + ")(?![^ ])")
    for lang, words in LANG_PROFILES.items()
}


def detect_lang(text: str) -> str:
    """argmax over stopword hit-counts; 'unknown' when nothing hits
    (parity with the reference's 'unknown' fallback).  Ties break by
    language code ascending."""
    words = text.split(" ")
    best_lang, best_score = "unknown", 0
    for lang in sorted(LANG_PROFILES):
        prof = LANG_PROFILES[lang]
        score = sum(1 for w in words if w in prof)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def detect_lang_scored(text: str) -> tuple[str, float]:
    """(lang, confidence) where confidence = best-profile hit ratio —
    the classifier-confidence analogue the translator gate needs
    (≙ langid's normalized probability, translator/base.py:89)."""
    words = text.split(" ")
    lang = detect_lang(text)
    if lang == "unknown" or not words:
        return lang, 0.0
    hits = sum(1 for w in words if w in LANG_PROFILES[lang])
    return lang, hits / len(words)


def detect_lang_batch(s: pd.Series) -> np.ndarray:
    """Vectorized :func:`detect_lang` over a text column — one compiled
    regex scan per language instead of a Python loop per document
    (this is the 100-TB hot path).  np.argmax returns the FIRST max,
    which is the same ascending-language tie-break.  Null text rows
    classify as 'unknown' (str.count yields NaN there, which would
    otherwise poison argmax into a confident wrong tag)."""
    langs = sorted(LANG_PROFILES)
    scores = np.stack(
        [s.str.count(_LANG_RES[lang]).fillna(0).to_numpy()
         for lang in langs], axis=1)
    out = np.array(langs, dtype=object)[np.argmax(scores, axis=1)]
    out[scores.max(axis=1) == 0] = "unknown"
    return out


def count_tokens_batch(s: pd.Series) -> np.ndarray:
    """Vectorized :func:`count_tokens` (regex count, no findall lists)."""
    return s.str.count(_TOKEN_RE).to_numpy().astype(np.int64)


def quality_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Vectorized quality signals per document.

    word_count          whitespace tokens (reference WordsCounter)
    n_chars             raw length
    mean_word_len_e2    ×100, floor(x+0.5)
    stop_ratio_e4       EN-stopword fraction of words, ×1e4
    punct_ratio_e4      non-alnum-non-space chars / chars, ×1e4
    """
    s = df[text_col]
    # len(text.split(" ")) == count(" ") + 1 — no per-row list building
    word_count = (s.str.count(" ") + 1).astype(np.int64)
    n_chars = s.str.len().astype(np.int64)
    total_word_chars = (n_chars - (word_count - 1)).clip(lower=0)
    mean_len = total_word_chars / word_count.clip(lower=1)
    # whole-token stopword matches via ONE compiled regex scan — same
    # answer as per-token set membership (space lookarounds reproduce
    # split-by-space token identity), no Python per row
    stop_cnt = s.str.count(_LANG_RES["en"])
    punct = s.str.count(r"[^A-Za-z0-9\s]")
    return pd.DataFrame({
        "word_count": word_count,
        "n_chars": n_chars,
        "mean_word_len_e2": np.floor(mean_len * 100 + 0.5).astype(np.int64),
        "stop_ratio_e4": np.floor(
            stop_cnt / word_count.clip(lower=1) * 10000 + 0.5).astype(np.int64),
        "punct_ratio_e4": np.floor(
            punct / n_chars.clip(lower=1) * 10000 + 0.5).astype(np.int64),
    })


def count_tokens(text: str) -> int:
    """BPE-ish pre-tokenizer count: letter runs, digit runs, and
    individual punctuation marks."""
    return len(_TOKEN_RE.findall(text))


def top_ngram_stats(df: pd.DataFrame, text_col: str = "text",
                    ns: tuple[int, ...] = (2, 3)) -> pd.DataFrame:
    """Gopher-style top-n-gram concentration (Rae et al. 2021 Table A1):
    per document, the fraction of characters covered by the single most
    char-covering word n-gram — ``max over grams of count(gram) ×
    len(gram)``, divided by ``len(text)``, ×1e4.  Maximizing the char
    product (not the bare count) makes the statistic deterministic with
    no tie-break on equal counts.

    Vectorized: one word explode + per-n groupby-shift joins — no
    Python loop per document."""
    s = df[text_col].fillna("")
    n_chars = s.str.len().to_numpy(np.int64)
    ex = s.str.split(" ").explode()
    out = pd.DataFrame(index=df.index)
    grp = ex.groupby(level=0, sort=False)
    # grams build INCREMENTALLY across sorted ns (the (n−1)-gram prefix
    # concat is the expensive string pass — pay it once, not per n);
    # group-tail rows carry NaN and are dropped per n below
    run_gram, run_n = ex, 1
    for n in sorted(ns):
        for k in range(run_n, n):
            run_gram = run_gram + " " + grp.shift(-k)
        run_n = n
        gram = run_gram.dropna()  # group tails with < n words left
        col = f"top{n}gram_char_frac_e4"
        if len(gram) == 0:
            out[col] = np.zeros(len(df), np.int64)
            continue
        t = pd.DataFrame({"g": gram.values}, index=gram.index)
        c = (t.groupby([t.index, "g"], sort=False).size()
              .reset_index(level=1, name="c"))
        c["cover"] = c["c"] * c["g"].str.len()
        m = c.groupby(level=0, sort=False)["cover"].max() \
             .reindex(df.index).fillna(0).to_numpy(np.int64)
        out[col] = np.where(
            n_chars > 0,
            np.floor(m / np.maximum(n_chars, 1) * 10000 + 0.5),
            0).astype(np.int64)
    return out


def repetition_stats(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 — the duplicate-line family),
    vectorized per batch.  Lines are ``\\n``-separated; EMPTY lines are
    excluded (blank separators are formatting, not repetition).

    n_lines                  non-empty lines
    dup_line_frac_e4         (lines − distinct lines) / lines, ×1e4
    dup_line_char_frac_e4    chars in repeat occurrences / total line
                             chars (newlines excluded), ×1e4

    Implementation is two pandas groupbys over the exploded line table —
    no Python loop per document (this would sit on the 100-TB quality-
    gate hot path next to quality_stats)."""
    s = df[text_col].fillna("")
    ex = s.str.split("\n").explode()
    ex = ex[ex != ""]
    out = pd.DataFrame(index=df.index)
    if len(ex) == 0:
        for c in ("n_lines", "dup_line_frac_e4", "dup_line_char_frac_e4"):
            out[c] = np.zeros(len(df), np.int64)
        return out
    t = pd.DataFrame({"line": ex.values, "ln": ex.str.len().values},
                     index=ex.index)
    g = (t.groupby([t.index, "line"], sort=False)
          .agg(c=("ln", "size"), ln=("ln", "first")).reset_index(level=1))
    per = pd.DataFrame({
        "n": g["c"], "one": np.ones(len(g), np.int64),
        "chars": g["c"] * g["ln"], "dup": (g["c"] - 1) * g["ln"],
    }).groupby(level=0, sort=False).sum()
    n = per["n"].reindex(df.index).fillna(0).to_numpy(np.int64)
    d = per["one"].reindex(df.index).fillna(0).to_numpy(np.int64)
    chars = per["chars"].reindex(df.index).fillna(0).to_numpy(np.int64)
    dup = per["dup"].reindex(df.index).fillna(0).to_numpy(np.int64)
    out["n_lines"] = n
    out["dup_line_frac_e4"] = np.where(
        n > 0, np.floor((n - d) / np.maximum(n, 1) * 10000 + 0.5), 0
    ).astype(np.int64)
    out["dup_line_char_frac_e4"] = np.where(
        chars > 0, np.floor(dup / np.maximum(chars, 1) * 10000 + 0.5), 0
    ).astype(np.int64)
    return out


def fingerprint_md5_batch(s: pd.Series, window: int = 4,
                          keep: int = 8) -> list[str]:
    """Winnowing fingerprints as comma-joined sorted ints, md5-hashed so
    a SQL oracle can value-check them (DuckDB ``md5_number_lower(x)`` ==
    ``struct.unpack('<Q', md5(x).digest()[8:])[0]`` — probed, not
    assumed; reduced mod 2⁶² so the value fits BIGINT on both sides).
    Same span construction as :func:`fingerprint_rolling`."""
    import hashlib
    import struct

    out = []
    mod = 1 << 62
    for text in s:
        hs = {struct.unpack("<Q", hashlib.md5(sp.encode()).digest()[8:])[0]
              % mod for sp in _spans(text, window)}
        out.append(",".join(str(h) for h in sorted(hs)[:keep]))
    return out


def _spans(text: str, window: int) -> list[str]:
    """``window``-word spans of ``text`` (whole text when shorter).
    Shared by both fingerprint kernels — their SQL/pytest oracles pin
    identical span construction."""
    ws = text.split(" ")
    if len(ws) < window:
        return [" ".join(ws)]
    return [" ".join(ws[i:i + window]) for i in range(len(ws) - window + 1)]


def fingerprint_rolling(text: str, window: int = 4, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: crc32 over each
    ``window``-word span, keep the ``keep`` smallest values (sorted).
    Deterministic; equal fingerprints ⇒ likely near-identical runs."""
    import zlib

    hashes = sorted({zlib.crc32(s.encode()) for s in _spans(text, window)})
    return [int(h) for h in hashes[:keep]]
