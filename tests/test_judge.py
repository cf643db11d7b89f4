"""Corrective-retrieval judge: metrics gate, coercion ladder, merge,
JSON repair, and the retrieve→judge→correct loop (semantics of the
reference's rag/judge package, expectations mirrored from its
tests/test_judge.py)."""

import pytest

from mmore_ray.stages.judge import (
    ADD_QUESTIONS,
    PROCEED,
    RE_RETRIEVE,
    coerce_decision,
    compute_retrieval_metrics,
    effective_retrieve_params,
    evaluate_metrics,
    merge_hits,
    parse_judge_response,
    repair_json_text,
    retrieve_with_judge,
)


def _hit(sim=0.5, id_="1", rerank=None):
    return {"id": id_, "text": id_, "similarity": sim,
            "rerank_score": rerank, "rank": 1}


def test_metrics_and_thresholds():
    hits = [_hit(0.9, "1"), _hit(0.5, "2")]
    assert compute_retrieval_metrics(hits)["mean_similarity"] == \
        pytest.approx(0.7)

    metrics, passed, status = evaluate_metrics(
        hits, {"min_mean_similarity": 0.35, "min_num_docs": 2})
    assert passed and "PASS" in status
    assert metrics["max_similarity"] == pytest.approx(0.9)

    # absent rerank scores fail a rerank threshold; present ones pass
    _, fail_rerank, _ = evaluate_metrics(
        [_hit(0.9)], {"min_max_rerank_score": 0.5})
    assert not fail_rerank
    _, pass_rerank, _ = evaluate_metrics(
        [_hit(0.9, rerank=0.8)], {"min_max_rerank_score": 0.5})
    assert pass_rerank

    # no thresholds configured => never passes (judge always consulted)
    _, none_passed, _ = evaluate_metrics(hits, {})
    assert not none_passed


def test_merge_hits_dedupes_and_reranks():
    merged = merge_hits([_hit(0.8, "1")], [_hit(0.8, "1"), _hit(0.6, "2")])
    assert [h["id"] for h in merged] == ["1", "2"]
    assert merged[1]["rank"] == 2
    # id-less hits dedupe by text
    a = {"id": None, "text": "same", "similarity": 0.3}
    assert len(merge_hits([a], [dict(a)])) == 1


# the reference's fallback ladder, case for case
# (tests/test_judge.py::test_coerce_decision_fallback)
@pytest.mark.parametrize("allowed,raw,expected", [
    ([PROCEED, RE_RETRIEVE], "ADD_QUESTIONS", RE_RETRIEVE),
    ([PROCEED, ADD_QUESTIONS], "RE_RETRIEVE", ADD_QUESTIONS),
    ([PROCEED, RE_RETRIEVE], "ADD_CONTEXT", RE_RETRIEVE),
    ([PROCEED], "ADD_QUESTIONS", PROCEED),
    ([PROCEED], "RE_RETRIEVE", PROCEED),
    ([PROCEED, RE_RETRIEVE, ADD_QUESTIONS], "ADD_QUESTIONS", ADD_QUESTIONS),
    ([PROCEED, RE_RETRIEVE], "garbage", PROCEED),
])
def test_coerce_decision_fallback(allowed, raw, expected):
    decision, coerced = coerce_decision(raw, allowed)
    assert decision == expected
    assert coerced == (raw != expected)


def test_effective_retrieve_params_defaults():
    # parsing.py:179-191: k defaults to max(2k, k+3)
    assert effective_retrieve_params(None, "q", 5) == {"input": "q", "k": 10}
    assert effective_retrieve_params(None, "q", 2) == {"input": "q", "k": 5}
    assert effective_retrieve_params({"k": 7, "input": "x"}, "q", 5) == \
        {"input": "x", "k": 7}


def test_parse_judge_response_repairs_llm_json():
    # trailing comma + Python literals (parsing.py:24-30)
    assert repair_json_text('{"a": True, "b": None,}') == \
        '{"a": true, "b": null}'
    parsed = parse_judge_response(
        'noise before {"decision": "RE_RETRIEVE", '
        '"retrieve_params": {"k": 8,}, "ok": True} noise after')
    assert parsed["decision"] == "RE_RETRIEVE"
    assert parsed["retrieve_params"]["k"] == 8
    with pytest.raises(Exception):
        parse_judge_response("no json here at all")


class _Corpus:
    """Retriever stub: quality improves with k (bigger k reaches the
    high-similarity tail)."""

    def __init__(self):
        self.calls = []

    def __call__(self, query, k):
        self.calls.append((query, k))
        sims = [0.2, 0.3, 0.9, 0.95, 0.99]
        return [_hit(sims[i % 5], f"{query}-{i}") for i in range(k)]


def test_judge_loop_threshold_early_exit():
    corpus = _Corpus()
    out = retrieve_with_judge(corpus, "q", k=5,
                              thresholds={"min_num_docs": 3},
                              judge_fn=lambda *a: {"decision": RE_RETRIEVE})
    assert out["judge_reason"] == "metrics_above_thresholds"
    assert out["judge_actions"] == []
    assert corpus.calls == [("q", 5)]  # no corrective retrieval


def test_judge_loop_re_retrieve_until_pass():
    corpus = _Corpus()
    out = retrieve_with_judge(
        corpus, "q", k=2,
        thresholds={"min_max_similarity": 0.9},  # needs k>2 to reach 0.9
        judge_fn=lambda q, m, h: {"decision": RE_RETRIEVE})
    assert out["judge_actions"] == [RE_RETRIEVE]
    # corrective call used the doubled-k default max(2k, k+3) = 5
    assert corpus.calls == [("q", 2), ("q", 5)]
    assert out["judge_reason"] == "metrics_after_correction"
    assert out["retrieval_metrics"]["thresholds_met"] == 1.0
    assert out["retrieval_corrections"][0]["thresholds_met_before"] == 0.0
    assert out["retrieval_corrections"][0]["thresholds_met_after"] == 1.0
    # merged hits deduped by id and re-ranked contiguously
    ranks = [h["rank"] for h in out["docs"]]
    assert ranks == list(range(1, len(ranks) + 1))


def test_judge_loop_max_steps_and_force():
    corpus = _Corpus()
    out = retrieve_with_judge(
        corpus, "q", k=2,
        thresholds={"min_mean_similarity": 2.0},  # unreachable
        judge_fn=lambda q, m, h: {"decision": RE_RETRIEVE,
                                  "retrieve_params": {"k": 3}},
        max_corrective_steps=2)
    assert out["judge_reason"] == "max_corrective_steps"
    assert out["hit_max_corrective_steps"] == 1.0
    assert out["judge_actions"] == [RE_RETRIEVE, RE_RETRIEVE]

    # forced action never consults the judge and uses k=10
    corpus2 = _Corpus()
    out2 = retrieve_with_judge(
        corpus2, "q", k=2,
        thresholds={"min_mean_similarity": 2.0},
        judge_fn=lambda *a: (_ for _ in ()).throw(AssertionError("llm")),
        force_corrective_action=RE_RETRIEVE, max_corrective_steps=1)
    assert corpus2.calls[1] == ("q", 10)
    assert all(not s["llm_invoked"] for s in out2["judge_steps"])

    with pytest.raises(ValueError):
        retrieve_with_judge(corpus, "q", thresholds={"min_num_docs": 99},
                            force_corrective_action=ADD_QUESTIONS,
                            allow_add_questions=False)


def test_judge_loop_add_questions_and_parse_fallback():
    corpus = _Corpus()
    out = retrieve_with_judge(
        corpus, "q", k=2,
        thresholds={"min_num_docs": 4},
        judge_fn=lambda q, m, h: {
            "decision": ADD_QUESTIONS,
            "extra_questions": ["s1", "s2", "s3", "s4-ignored"]},
        allow_add_questions=True, allow_re_retrieve=False)
    # at most 3 sub-questions retrieved (corrective.py:47-50)
    assert [c[0] for c in corpus.calls] == ["q", "s1", "s2", "s3"]
    assert out["judge_actions"] == [ADD_QUESTIONS]

    # unparseable raw LLM text → proceed with parse_error_fallback
    out2 = retrieve_with_judge(
        _Corpus(), "q", k=2, thresholds={"min_num_docs": 99},
        judge_fn=lambda *a: "certainly! here is my decision:")
    assert out2["judge_reason"] == "parse_error_fallback"
    assert out2["judge_actions"] == []


def test_judge_over_real_retrieval(ray_session, tmp_path):
    """End-to-end: judge loop over the engine's distributed retrieve."""
    import pandas as pd
    import ray

    from mmore_ray.stages.embed import index_documents, retrieve
    from mmore_ray.stages.judge import hits_from_table

    docs = pd.DataFrame({
        "sample_id": [f"d{i}" for i in range(30)],
        "text": [f"document about topic {i % 5} number {i}"
                 for i in range(30)],
    })
    coll = str(tmp_path / "coll")
    index_documents(ray.data.from_pandas(docs), coll)

    def retrieve_fn(query, k):
        return hits_from_table(retrieve(coll, query, k=k))

    out = retrieve_with_judge(
        retrieve_fn, "topic 3", k=2,
        thresholds={"min_num_docs": 4},
        judge_fn=lambda q, m, h: {"decision": RE_RETRIEVE})
    assert out["retrieval_metrics"]["num_docs"] >= 4
    assert out["judge_actions"] == [RE_RETRIEVE]
    assert out["retrieval_metrics"]["thresholds_met"] == 1.0


def test_review_fixes_judge_machinery():
    """Regression bundle for review findings: misspelled thresholds
    fail closed, bad judge k falls back, merge keys are type-tagged,
    question-less ADD_QUESTIONS exits instead of burning steps."""
    from mmore_ray.stages.judge import (
        effective_retrieve_params,
        evaluate_metrics,
        merge_hits,
    )

    # misspelled threshold key: gate must FAIL, not pass silently
    _, passed, status = evaluate_metrics(
        [_hit(0.1)], {"min_similarity": 0.9})  # typo for min_mean_…
    assert not passed and "No applicable" in status

    # untrusted judge k: non-numeric and non-positive fall back
    assert effective_retrieve_params({"k": "many"}, "q", 5)["k"] == 10
    assert effective_retrieve_params({"k": -3}, "q", 5)["k"] == 10
    assert effective_retrieve_params({"k": 7}, "q", 5)["k"] == 7

    # id-less hit whose text equals another hit's id must survive
    merged = merge_hits([{"id": "x", "text": "A"}],
                        [{"id": None, "text": "x"}])
    assert len(merged) == 2

    # coerced ADD_QUESTIONS with no questions: zero retrievals, one
    # no-op exit — not max_corrective_steps of fake corrections
    calls = []

    def retrieve_fn(q, k):
        calls.append(q)
        return [_hit(0.1)]

    out = retrieve_with_judge(
        retrieve_fn, "q", k=2, thresholds={"min_num_docs": 99},
        judge_fn=lambda q, m, h: {"decision": RE_RETRIEVE},
        allow_re_retrieve=False, allow_add_questions=True,
        max_corrective_steps=2)
    assert out["judge_reason"] == "no_extra_questions"
    assert out["judge_actions"] == []
    assert calls == ["q"]  # only the initial retrieval ran

    # boundary step: the question-less guard must win over the step
    # limit — zero corrective retrievals must never be reported as
    # "max_corrective_steps"
    out = retrieve_with_judge(
        retrieve_fn, "q", k=2, thresholds={"min_num_docs": 99},
        judge_fn=lambda q, m, h: {"decision": RE_RETRIEVE},
        allow_re_retrieve=False, allow_add_questions=True,
        max_corrective_steps=0)
    assert out["judge_reason"] == "no_extra_questions"
    assert out["hit_max_corrective_steps"] == 0.0


def test_hits_from_table_preserves_rerank_order():
    import pandas as pd

    from mmore_ray.stages.judge import hits_from_table

    df = pd.DataFrame({
        "sample_id": ["a", "b"],
        "text": ["ta", "tb"],
        "score": [0.9, 0.1],
        "rerank_score": [0.1, 0.9],
    })
    hits = hits_from_table(df)
    assert [h["id"] for h in hits] == ["b", "a"]  # cross-encoder wins
    assert hits[0]["rank"] == 1


def test_parse_judge_response_object_followed_by_commentary():
    """A valid decision object followed by brace-containing commentary
    must parse (raw_decode of the FIRST complete object — the greedy
    first-{-to-last-} span swallowed the commentary and degraded a
    valid corrective decision to PROCEED)."""
    from mmore_ray.stages.judge import parse_judge_response

    r = parse_judge_response(
        '{"decision": "RE_RETRIEVE", "retrieve_params": {"k": 8}}\n'
        'Note: the {metrics} looked low')
    assert r["decision"] == "RE_RETRIEVE"
    assert r["retrieve_params"]["k"] == 8
