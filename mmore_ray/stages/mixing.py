"""Domain-mixture sampling: downsample each group (domain / language /
source) to a TOKEN budget — the mixture-weights step of every published
LLM data recipe (The Pile / Dolma / RedPajama sample sources to target
token shares, not document counts).  The reference has no analogue —
engine-extension surface like the dedup family.

Scale shape: rides :func:`mmore_ray.stages.groupby.bucketed_window` —
ONE shuffle keyed by ``hash(group) % num_buckets`` (the Ray groupby
sees ``num_buckets`` groups regardless of domain cardinality), then a
vectorized per-bucket sort + grouped cumsum.  Determinism: rows are
taken in multiplicative-id-hash order (Knuth 2654435761 mod 2³² —
uniform within a group, identical across engines / runs / cluster
sizes; same hash family as q_sample_hash), so the sample is
reproducible and oracle-checkable."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def sample_to_token_budget(ds, group_col: str, budget: int,
                           id_col: str = "doc_id", text_col: str = "text",
                           token_col: str | None = None,
                           num_buckets: int = 64):
    """Keep, per group, the hash-ordered prefix of documents whose
    RUNNING token total stays under ``budget``: a doc is kept iff the
    cumulative count BEFORE it is < budget, so the doc that crosses
    the boundary is included and every non-empty group keeps ≥ 1 doc
    (budget ≥ 1).  Token counts come from ``token_col`` when given,
    else from the shared BPE-ish tokenizer over ``text_col``
    (text_analysis.count_tokens_batch — same kernel and SQL expression
    q_token_count pins).  Ids must be NON-NEGATIVE (the same contract
    as every multiplicative-id-hash site here — q_sample_hash,
    _cap_group_members: a negative id wraps differently in numpy
    uint64 than in SQL's signed ``%``).  Returns (id, group, n_tokens)
    rows."""
    from .groupby import bucketed_window
    from .text_analysis import count_tokens_batch

    def prepare(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.uint64)
        h = (ids * np.uint64(2654435761)) % np.uint64(1 << 32)
        tok = (df[token_col].to_numpy(dtype=np.int64) if token_col
               else count_tokens_batch(df[text_col]))
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(dtype=np.int64),
            group_col: df[group_col].to_numpy(),
            "n_tokens": tok,
            "_h": h.astype(np.int64),
        })

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group_col, "_h", id_col], kind="stable")
        # dropna=False: a NULL group is its own budgeted partition
        # (SQL PARTITION BY semantics) — pandas' default would NaN the
        # cumsum and silently discard every null-group row
        run = df.groupby(group_col, sort=False,
                         dropna=False)["n_tokens"].cumsum()
        keep = (run - df["n_tokens"]) < budget
        return df.loc[keep, [id_col, group_col, "n_tokens"]]

    return bucketed_window(ds, [group_col], window, prepare=prepare,
                           num_buckets=num_buckets)
