"""RAG retrieve→generate pipeline tests (reference rag/pipeline.py
semantics: rank-tagged context blocks, DEFAULT_PROMPT, per-query
answers; retrieval = one pass for all queries)."""

import pyarrow as pa

from mmore_ray.pipelines.rag import (
    DEFAULT_PROMPT,
    DONT_KNOW,
    FakeChatLLM,
    format_docs,
    rag_answer,
)


def test_format_docs_rank_tags():
    assert format_docs(["alpha", "beta"]) == "[1] alpha\n\n[2] beta"


def test_fake_llm_extractive_and_dont_know():
    llm = FakeChatLLM()
    prompt = DEFAULT_PROMPT.format(
        context="[1] The cat sat on the mat.\n\n[2] Dogs bark loudly.")
    assert "cat" in llm.generate(prompt, "where did the cat sit")
    assert llm.generate(prompt, "quantum flux capacitors") == DONT_KNOW


def test_rag_answer_end_to_end(ray_session, tmp_path):
    ray = ray_session
    from mmore_ray.stages.embed import index_documents

    docs = pa.table({
        "sample_id": pa.array(["a", "b", "c", "d"], pa.string()),
        "text": pa.array([
            "the moon orbits the earth every month",
            "paris is the capital city of france",
            "ray datasets stream blocks with backpressure",
            "completely unrelated filler content here",
        ], pa.string()),
    })
    coll = str(tmp_path / "coll")
    index_documents(ray.data.from_arrow(docs), coll)
    out = rag_answer(coll, {
        "q_moon": "what orbits the earth",
        "q_paris": "capital city of france",
    }, k=2)
    out = out.set_index("query_id")
    assert out.loc["q_moon", "n_docs"] == 2
    assert "moon" in out.loc["q_moon", "context"]
    assert "orbits" in out.loc["q_moon", "answer"]
    assert "paris" in out.loc["q_paris", "answer"]
    # determinism: same inputs, same answers
    out2 = rag_answer(coll, {"q_moon": "what orbits the earth"}, k=2)
    assert out2.iloc[0]["answer"] == out.loc["q_moon", "answer"]
