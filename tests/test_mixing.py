"""Domain-mixture sampling tests (stages/mixing.py)."""

import pyarrow as pa


def test_sample_to_token_budget_semantics(ray_session):
    """Boundary doc included; every non-empty group keeps >=1 doc;
    token_col shortcut equals text-derived counts."""
    import ray.data

    from mmore_ray.stages.mixing import sample_to_token_budget

    t = pa.table({
        "doc_id": [1, 2, 3, 10, 11],
        "grp": ["a", "a", "a", "b", "b"],
        "text": ["one two three", "four five", "six", "seven", "x " * 50],
    })
    ds = ray.data.from_arrow(t)
    out = sample_to_token_budget(ds, "grp", budget=4, id_col="doc_id"
                                 ).to_pandas().sort_values("doc_id")
    # group a in hash order of ids; cumulative-before < 4 keeps the
    # crosser; group b's first doc always survives
    assert (out.groupby("grp").size() >= 1).all()
    assert out["n_tokens"].sum() >= 4  # boundary doc included
    # tiny budget: exactly one doc per group
    one = sample_to_token_budget(ds, "grp", budget=1).to_pandas()
    assert one.groupby("grp").size().tolist() == [1, 1]
    # pre-computed token column path agrees with the text path
    import numpy as np
    from mmore_ray.stages.text_analysis import count_tokens_batch
    import pandas as pd
    tok = count_tokens_batch(pd.Series(t.column("text").to_pylist()))
    t2 = t.append_column("tok", pa.array(tok, pa.int64()))
    via_col = sample_to_token_budget(
        ray.data.from_arrow(t2), "grp", budget=4, token_col="tok"
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert via_col.equals(out.reset_index(drop=True))


def test_sample_to_token_budget_null_group(ray_session):
    """NULL group is its own budgeted partition (SQL PARTITION BY
    semantics), never silently discarded."""
    import ray.data

    from mmore_ray.stages.mixing import sample_to_token_budget

    t = pa.table({
        "doc_id": [1, 2, 3],
        "grp": pa.array(["a", None, None], pa.string()),
        "text": ["one two", "three four", "five six"]})
    out = sample_to_token_budget(ray.data.from_arrow(t), "grp",
                                 budget=2).to_pandas()
    null_rows = out[out["grp"].isna()]
    assert len(null_rows) == 1  # budget binds inside the null group too
    assert len(out[out["grp"] == "a"]) == 1
