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


def test_fake_llm_strips_rank_tag_and_empty_collection_block(ray_session, tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray as _ray

    from mmore_ray.pipelines.rag import FakeChatLLM, rag_answer
    from mmore_ray.stages.embed import index_documents

    # the extracted answer must not carry the "[N] " context tag
    ans = FakeChatLLM().generate(
        "Context:\n[1] the moon orbits the earth", "what orbits the earth")
    assert ans == "the moon orbits the earth"

    # a zero-row parquet file in the collection must not crash score()
    docs = pd.DataFrame({
        "sample_id": ["d1", "d2"],
        "text": ["the moon orbits the earth", "apples are red"],
    })
    coll = tmp_path / "coll"
    index_documents(_ray.data.from_pandas(docs), str(coll))
    schema = pq.read_schema(next(coll.glob("*.parquet")))
    pq.write_table(schema.empty_table(), coll / "empty.parquet")
    out = rag_answer(str(coll), {"q1": "what orbits the earth"}, k=1)
    assert out.answer.iloc[0] == "the moon orbits the earth"
