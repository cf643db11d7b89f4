"""Curation ladder semantics: every stage must visibly do its job on
the tri-union input (quality gate, lang gate, exact dedup keep-min with
n_dupes accounting, near-dup drop-higher-id)."""

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_curate_stage_semantics(ray_session):
    from mmore_ray.pipelines.queries import _docs_curate_input, q_curate

    out = q_curate(SF).to_pandas()
    base = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    base_ids = set(base.doc_id)

    # no exact copy (+500000) survives: its original has the lower id
    assert not any(500000 <= i < 1000000 for i in out.doc_id)
    # no near copy (+1000000) survives: jaccard vs its original ≥ 0.5
    assert not any(i >= 1000000 for i in out.doc_id)
    # survivors are a nontrivial subset of the base docs
    assert 0 < len(out) < len(base_ids)
    assert set(out.doc_id) <= base_ids

    # n_dupes: a surviving doc whose id%7==0 AND that passed the gates
    # represents itself + its exact copy
    dup_counts = out.set_index("doc_id")["n_dupes"]
    sevens = [i for i in out.doc_id if i % 7 == 0]
    assert sevens and all(dup_counts[i] == 2 for i in sevens)
    others = [i for i in out.doc_id if i % 7 != 0]
    assert others and all(dup_counts[i] == 1 for i in others)

    # gates actually applied
    assert (out.word_count >= 20).all()
    assert (out.stop_ratio_e4 >= 200).all()
    assert (out.lang_pred == "en").all()

    # input sanity: the tri-union really contains all three variants
    n_in = _docs_curate_input(SF).count()
    n_base = len(base_ids)
    n_ex = sum(1 for i in base_ids if i % 7 == 0)
    n_nr = sum(1 for i in base_ids if i % 5 == 0)
    assert n_in == n_base + n_ex + n_nr
