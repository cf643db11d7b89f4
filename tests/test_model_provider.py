"""The real-model seam (mmore_ray.models): one registry where heavy
models drop into the existing actor pools without touching pipeline
code.

Mirrors the reference's opt-in gating (``tests/conftest.py:74-88``
``--gpu`` flag): tests that need a real checkpoint run only where the
library imports — everywhere else the same tests prove the seam with
fakes and custom registrations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from mmore_ray import models


def test_defaults_resolve_to_fakes():
    from mmore_ray.stages.embed import (FakeDenseEmbedder, FakeReranker,
                                        FakeSparseEmbedder)
    from mmore_ray.stages.mentions import MentionScanner

    assert models.provider_class("dense_embedder") is FakeDenseEmbedder
    assert models.provider_class("sparse_embedder") is FakeSparseEmbedder
    assert models.provider_class("reranker") is FakeReranker
    assert models.provider_class("mention_scanner") is MentionScanner


def test_env_var_overrides_default(monkeypatch):
    monkeypatch.setenv("MMORE_RAY_DENSE_EMBEDDER", "sentence-transformers")
    assert (models.provider_class("dense_embedder")
            is models.SentenceTransformerEmbedder)
    # explicit name beats the env var
    from mmore_ray.stages.embed import FakeDenseEmbedder
    assert models.provider_class("dense_embedder", "fake") is FakeDenseEmbedder


def test_unknown_role_and_name_raise_with_choices():
    with pytest.raises(KeyError, match="registered"):
        models.provider_class("nonexistent_role")
    with pytest.raises(KeyError, match="registered"):
        models.provider_class("dense_embedder", "nonexistent")


@pytest.mark.skipif(
    models.available("dense_embedder", "sentence-transformers"),
    reason="sentence-transformers installed — the failure path is moot")
def test_unavailable_provider_fails_naming_the_library():
    """Construction (not registry lookup) is where the heavy import
    happens, and the error must name the missing library."""
    with pytest.raises(ImportError, match="sentence_transformers"):
        models.SentenceTransformerEmbedder()


def test_custom_embedder_drops_into_index_documents(ray_session, tmp_path,
                                                    monkeypatch):
    """Register a new dense provider, select it by env var, run the
    UNCHANGED indexing pipeline — the collection carries the custom
    embeddings.  This is the 'swap this constructor' proof: zero
    pipeline edits."""
    import pyarrow.parquet as pq
    import ray

    from mmore_ray.stages.embed import index_documents

    class ConstantEmbedder:
        """8-dim constant-direction embedder (distinguishable from the
        16-dim fake)."""

        def __init__(self):
            self._v = [1.0] + [0.0] * 7

        def embed_one(self, text):
            return np.array(self._v)

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "dense_embedding",
                pa.array([self._v] * len(batch), pa.list_(pa.float64())))

    models.register("dense_embedder", "constant-test", ConstantEmbedder)
    monkeypatch.setenv("MMORE_RAY_DENSE_EMBEDDER", "constant-test")

    ds = ray.data.from_pandas(pd.DataFrame({
        "sample_id": ["a", "b"], "text": ["hello world", "foo bar"]}))
    out = tmp_path / "coll"
    index_documents(ds, str(out))
    got = pq.read_table(str(out)).to_pandas()
    assert all(len(v) == 8 and v[0] == 1.0 for v in got.dense_embedding)


def test_custom_scanner_drops_into_extract_docs(ray_session):
    """A MentionScanner-shaped subclass (custom detector, inherited
    graph/row machinery — exactly how models.HFNERScanner is built)
    registered and selected by name flows through the UNCHANGED kg
    extract stage."""
    import ray

    from mmore_ray.pipelines.kg import extract_docs
    from mmore_ray.stages.mentions import MentionScanner

    class TwoEntityScanner(MentionScanner):
        """Pretend model: every doc mentions ALPHA and BETA once."""

        def __init__(self):
            super().__init__(gazetteer=[])
            from mmore_ray.functions.textfns import clean_str
            for s, t in (("Alpha", "ORGANIZATION"), ("Beta", "PERSON")):
                self._type_of[s] = t
                self._entity_of[s] = (
                    str(clean_str(s.upper())), str(clean_str(t.upper())),
                    str(clean_str(f"MENTION OF {s.upper()}")))

        def _scan(self, content):
            if not content:
                return [], []
            counts = {"Alpha": [1, 0], "Beta": [1, 5]}
            return self._rows([("Alpha", "ORGANIZATION"),
                               ("Beta", "PERSON")], counts)

    models.register("mention_scanner", "two-entity-test", TwoEntityScanner)

    corpus = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r"], "path": ["p.py"], "commit": ["c"],
        "lang": ["python"], "content": ["some document text"]}))
    docs = extract_docs(corpus, scanner="two-entity-test",
                        concurrency=1).to_pandas()
    assert len(docs) == 1
    mentions = docs.iloc[0]["mentions"]
    keys = sorted(m["entity_key"] for m in mentions)
    assert keys == ["ALPHA", "BETA"]
    edges = docs.iloc[0]["edges"]
    assert len(edges) == 1 and edges[0]["src"] == "ALPHA" \
        and edges[0]["dst"] == "BETA"


# --- gated real-model tests (run only where the library imports) -----------

requires_st = pytest.mark.skipif(
    not models.available("dense_embedder", "sentence-transformers"),
    reason="sentence-transformers not installed (gated like the "
           "reference's --gpu tests)")
requires_transformers = pytest.mark.skipif(
    not models.available("mention_scanner", "hf-ner"),
    reason="transformers not installed")


@requires_st
def test_real_sentence_transformers_indexes(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray

    from mmore_ray.stages.embed import index_documents

    ds = ray.data.from_pandas(pd.DataFrame({
        "sample_id": ["a", "b"], "text": ["hello world", "foo bar"]}))
    out = tmp_path / "coll_real"
    index_documents(ds, str(out), dense_provider="sentence-transformers")
    got = pq.read_table(str(out)).to_pandas()
    assert {len(v) for v in got.dense_embedding} == {384}  # MiniLM dim


@requires_transformers
def test_real_hf_ner_scanner_loads_in_actor_init(ray_session):
    import ray

    from mmore_ray.pipelines.kg import extract_docs

    corpus = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r"], "path": ["p.md"], "commit": ["c"], "lang": ["md"],
        "content": ["Barack Obama visited Google in California."]}))
    docs = extract_docs(corpus, scanner="hf-ner", concurrency=1).to_pandas()
    assert len(docs) == 1 and len(docs.iloc[0]["mentions"]) > 0


def test_env_var_reaches_extract_docs_default_path(ray_session, monkeypatch):
    """MMORE_RAY_MENTION_SCANNER must not silently fall through to the
    gazetteer fast path when run_kg/extract_docs is called with no
    explicit scanner (the registry's documented resolution order)."""
    import ray

    from mmore_ray.pipelines.kg import extract_docs
    from mmore_ray.stages.mentions import MentionScanner

    class OneEntityScanner(MentionScanner):
        def __init__(self):
            super().__init__(gazetteer=[])
            from mmore_ray.functions.textfns import clean_str
            self._type_of["Env"] = "ORGANIZATION"
            self._entity_of["Env"] = (
                str(clean_str("ENV")), str(clean_str("ORGANIZATION")),
                str(clean_str("MENTION OF ENV")))

        def _scan(self, content):
            if not content:
                return [], []
            return self._rows([("Env", "ORGANIZATION")], {"Env": [1, 0]})

    models.register("mention_scanner", "env-test", OneEntityScanner)
    monkeypatch.setenv("MMORE_RAY_MENTION_SCANNER", "env-test")
    corpus = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r"], "path": ["p.py"], "commit": ["c"],
        "lang": ["python"], "content": ["anything"]}))
    docs = extract_docs(corpus, concurrency=1).to_pandas()
    assert [m["entity_key"] for m in docs.iloc[0]["mentions"]] == ["ENV"]


def test_gazetteer_with_incompatible_provider_raises(ray_session,
                                                     monkeypatch):
    import ray

    from mmore_ray.pipelines.kg import extract_docs

    class NoGazScanner:
        def __init__(self):
            pass

        def __call__(self, batch):
            return batch

    models.register("mention_scanner", "nogaz-test", NoGazScanner)
    corpus = ray.data.from_pandas(pd.DataFrame({
        "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["l"],
        "content": ["x"]}))
    with pytest.raises(ValueError, match="gazetteer-capable"):
        extract_docs(corpus, gazetteer=[("A", "ORGANIZATION", "kb:A")],
                     scanner="nogaz-test")


def test_hf_ner_window_overlap_no_phantom_fragments():
    """Window-overlap acceptance: an entity is counted by its FIRST
    fully-containing window only — a leading fragment re-detected at
    the next window's start must not become a phantom mention, and an
    entity straddling a cut is counted once (by the later window)."""
    import re as _re

    from mmore_ray.models import _hf_ner_scanner
    from mmore_ray.stages.mentions import MentionScanner

    cls = _hf_ner_scanner()
    sc = cls.__new__(cls)
    MentionScanner.__init__(sc, gazetteer=[])

    def fake_ner(chunk):
        out = []
        for m in _re.finditer("John Smith", chunk):
            out.append({"word": "John Smith", "entity_group": "PER",
                        "start": m.start(), "end": m.end()})
        # emulate the model seeing a LEADING FRAGMENT when the window
        # starts mid-entity
        if chunk.startswith("Smith"):
            out.append({"word": "Smith", "entity_group": "PER",
                        "start": 0, "end": 5})
        return out

    sc._ner = fake_ner
    # entity at [1795, 1805): window 1 = [0, 2000) contains it whole;
    # window 2 = [1800, 3800) starts mid-entity and sees 'Smith'
    content = ("x" * 1795 + "John Smith" + " y" * 600)
    mentions, _ = sc._scan(content)
    got = {m["surface"]: m["n_occ"] for m in mentions}
    assert got == {"John Smith": 1}, got

    # entity straddling the first cut at 2000: [1995, 2005) — window 1
    # drops it (may be truncated), window 2 counts it whole, once
    content2 = ("x" * 1995 + "John Smith" + " y" * 600)
    mentions2, _ = sc._scan(content2)
    got2 = {m["surface"]: m["n_occ"] for m in mentions2}
    assert got2 == {"John Smith": 1}, got2


# --- llm role (reference rag/llm.py name tables + generation kwargs) --------

def test_llm_provider_inference_matches_reference_tables():
    """Spot-check each family + the two fallbacks
    (rag/llm.py:106-128)."""
    assert models.infer_llm_provider("gpt-4o") == "OPENAI"
    assert models.infer_llm_provider("claude-3-5-sonnet") == "ANTHROPIC"
    assert models.infer_llm_provider("mistral-large-3") == "MISTRAL"
    assert models.infer_llm_provider("command-r-08-2024") == "COHERE"
    # unknown name, no base_url -> local HF checkpoint
    assert models.infer_llm_provider("meta-llama/Llama-3-8B") == "HF"
    # unknown name WITH base_url -> self-hosted endpoint (provider None)
    assert models.infer_llm_provider("my-vllm-model",
                                     base_url="http://h:8000") is None


def test_llm_generation_kwargs_spelling():
    """Per-provider max-token key (rag/llm.py:130-138)."""
    assert models.llm_generation_kwargs("ANTHROPIC", 0.2, 64) == {
        "temperature": 0.2, "max_tokens": 64}
    assert models.llm_generation_kwargs("HF", 0.2, 64) == {
        "temperature": 0.2, "max_new_tokens": 64}
    assert models.llm_generation_kwargs("OPENAI", 0.2, 64) == {
        "temperature": 0.2, "max_completion_tokens": 64}
    assert models.llm_generation_kwargs(None, 0.2, 64) == {
        "temperature": 0.2, "max_completion_tokens": 64}


def test_llm_role_default_is_deterministic_fake():
    from mmore_ray.pipelines.rag import FakeChatLLM

    assert models.provider_class("llm") is FakeChatLLM
    assert models.provider_class("llm", "hf") is models.HFChatGenerator


def test_rag_answer_resolves_llm_through_registry(ray_session, tmp_path,
                                                  monkeypatch):
    """A custom llm provider selected by env var reaches rag_answer
    with no code change (and the default stays the extractive fake,
    so q_rag's output is untouched)."""
    import ray

    from mmore_ray.pipelines.rag import rag_answer
    from mmore_ray.stages.embed import index_documents

    class EchoLLM:
        def generate(self, prompt, question):
            return f"ECHO:{question}"

    models.register("llm", "echo-test", EchoLLM)
    ds = ray.data.from_pandas(pd.DataFrame({
        "sample_id": ["a", "b"],
        "text": ["the sky is blue today", "grass is green"]}))
    coll = tmp_path / "coll_llm"
    index_documents(ds, str(coll))

    monkeypatch.setenv("MMORE_RAY_LLM", "echo-test")
    got = rag_answer(str(coll), {"q1": "what color is the sky"}, k=1)
    assert got.iloc[0]["answer"] == "ECHO:what color is the sky"
    # explicit provider arg beats the env var; default path unchanged
    monkeypatch.delenv("MMORE_RAY_LLM")
    base = rag_answer(str(coll), {"q1": "what color is the sky"}, k=1)
    assert base.iloc[0]["answer"] != "ECHO:what color is the sky"


requires_llm_hf = pytest.mark.skipif(
    not models.available("llm", "hf"), reason="transformers not installed")


@requires_llm_hf
def test_real_hf_chat_generator_answers(ray_session, tmp_path):
    import ray

    from mmore_ray.pipelines.rag import rag_answer
    from mmore_ray.stages.embed import index_documents

    ds = ray.data.from_pandas(pd.DataFrame({
        "sample_id": ["a"], "text": ["Paris is the capital of France."]}))
    coll = tmp_path / "coll_hf_llm"
    index_documents(ds, str(coll))
    got = rag_answer(str(coll), {"q1": "What is the capital of France?"},
                     k=1, llm_provider="hf")
    assert isinstance(got.iloc[0]["answer"], str) and got.iloc[0]["answer"]


def test_hf_chat_generator_sampling_kwargs(monkeypatch):
    """temperature=None → greedy (do_sample=False, no temperature);
    temperature set → do_sample=True, or transformers silently ignores
    the temperature and decodes greedily anyway.  Exercised through a
    stub transformers module so the kwarg contract is tested even where
    the real library is absent."""
    import sys
    import types

    seen = {}

    def fake_pipeline(task, **kwargs):
        seen.update(kwargs, task=task)
        return lambda msgs: [{"generated_text": "ok"}]

    stub = types.ModuleType("transformers")
    stub.pipeline = fake_pipeline
    monkeypatch.setitem(sys.modules, "transformers", stub)

    models.HFChatGenerator(temperature=None)
    assert seen["do_sample"] is False and "temperature" not in seen

    seen.clear()
    models.HFChatGenerator(temperature=0.9)
    assert seen["do_sample"] is True and seen["temperature"] == 0.9

    # temperature=0.0 means greedy, not "sample at 0" (transformers
    # rejects do_sample with a non-positive temperature)
    seen.clear()
    models.HFChatGenerator(temperature=0.0)
    assert seen["do_sample"] is False and "temperature" not in seen
