"""Training-data curation pipeline: the standard pre-training ladder
(quality gates → language ID → exact dedup → near-dup dedup) as ONE
streaming Ray Data flow.

This is the composition a large-scale curation job actually runs (the
reference exposes the stages separately: taggers + DatatroveFilter
post-processors, SURVEY §2.3); every stage here is the engine's
already-oracle-checked operator, so the whole ladder is SQL-checkable
end-to-end (``q_curate``).

Scale shape per stage:

* annotate+gate — one vectorized ``map_batches`` (no shuffle; the
  quality/lang kernels are the 100-TB per-byte hot path and reuse the
  compiled-regex batch implementations in stages/text_analysis.py);
* exact dedup — bucketed keep-min (stages/dedup.exact_dedup), joined
  back adaptively (stages/joins.lookup_join: broadcast when small,
  hash join when not);
* near-dup — EXACT n-gram Jaccard (stages/dedup.near_dup_jaccard,
  zero false negatives) with the drop-higher-id policy: any doc that
  appears as ``id_b`` of a verified pair is dropped via the adaptive
  distributed anti-join (stages/joins.anti_join — a dup-heavy corpus's
  pair ids never gather on the driver).  Single-linkage clustering is
  available separately (stages/canonicalize) when the transitive
  policy is wanted.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def curate(ds, text_col: str = "text", id_col: str = "doc_id",
           min_words: int = 20, min_stop_e4: int = 200, lang: str = "en",
           jaccard: float = 0.5, num_buckets: int = 64,
           carry_cols: tuple[str, ...] = ()):
    """(id, text) Dataset → curated Dataset with columns
    (doc_id, word_count, stop_ratio_e4, lang_pred, n_dupes).

    ``n_dupes`` counts the exact-duplicate group size the surviving doc
    represents (provenance for loss-weighting / dedup accounting).
    ``carry_cols`` names extra input columns to pass through unchanged
    (e.g. a redaction count from an upstream scrub stage)."""
    from ..stages.dedup import exact_dedup, near_dup_jaccard
    from ..stages.joins import anti_join, lookup_join
    from ..stages.text_analysis import detect_lang_batch, quality_stats

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        qs = quality_stats(df, text_col)
        langs = detect_lang_batch(df[text_col])
        out = pd.DataFrame({
            "doc_id": df[id_col].astype(np.int64),
            "text": df[text_col],
            "word_count": qs["word_count"].to_numpy(),
            "stop_ratio_e4": qs["stop_ratio_e4"].to_numpy(),
            "lang_pred": langs,
        })
        for c in carry_cols:
            out[c] = df[c].to_numpy()
        keep = ((out["word_count"].to_numpy() >= min_words)
                & (out["stop_ratio_e4"].to_numpy() >= min_stop_e4)
                & (langs == lang))
        return out[keep].reset_index(drop=True)

    kept = ds.map_batches(annotate, batch_format="pandas").materialize()

    # exact dedup: keep the minimum id per content; n_dupes rides along
    groups = exact_dedup(kept, text_col="text", id_col="doc_id",
                         num_buckets=num_buckets)
    survivors = lookup_join(
        kept, groups.select_columns(["keep_id", "n_dupes"]),
        "doc_id", "keep_id").materialize()

    # near-dup: exact Jaccard pairs; drop every id_b (id_a < id_b).
    # anti_join keeps the drop set distributed (broadcast only when
    # small; a dup-heavy corpus's pair ids never gather on the driver)
    pairs = near_dup_jaccard(survivors, text_col="text", id_col="doc_id",
                             threshold=jaccard, num_buckets=num_buckets)
    kept_cols = anti_join(survivors, pairs.select_columns(["id_b"]),
                          "doc_id", "id_b")
    return kept_cols.map_batches(
        lambda df: df.drop(columns=["text"]).reset_index(drop=True),
        batch_format="pandas")


def curate_full(ds, benchmark_texts: list[str], text_col: str = "text",
                id_col: str = "doc_id", decontam_k: int = 8, **curate_kw):
    """The FULL published pre-training recipe as one streaming flow:
    benchmark decontamination (drop) → PII redaction → quality gates →
    language ID → exact dedup → near-dup dedup.

    Decontamination runs FIRST on raw text (published practice: eval
    overlap is judged on the original n-grams, before any rewriting);
    redaction then rewrites text IN PLACE, so every downstream hash /
    shingle / gate operates on the scrubbed corpus — the output is what
    the trainer would actually see.  All stages are the engine's
    oracle-checked operators; the composition is itself SQL-checkable
    end-to-end (q_curate_full).  Adds ``n_redactions`` to the q_curate
    output columns."""
    from ..stages.dedup import decontaminate
    from ..stages.scrub import redact_pii

    clean = decontaminate(ds, benchmark_texts, text_col=text_col,
                          k=decontam_k, mode="drop")
    scrubbed = redact_pii(clean, text_col=text_col)
    # merge caller carry_cols rather than shadowing them (passing both
    # through **curate_kw would raise "multiple values for carry_cols")
    carry = ("n_redactions", *curate_kw.pop("carry_cols", ()))
    return curate(scrubbed, text_col=text_col, id_col=id_col,
                  carry_cols=carry, **curate_kw)
