"""websearchRAG parity tests — the reference's own test families
(tests/test_websearch_pipeline.py:1-573) ported case-for-case against
the Ray-native pipeline (mmore_ray/pipelines/websearch.py), plus the
actor-pool end-to-end drive the reference cannot run offline."""

import json

import pytest

from mmore_ray.pipelines.websearch import (SUMMARY_SYSTEM_MSG,
                                           DdgSearchProvider,
                                           FakeResearchLLM,
                                           FakeSearchProvider,
                                           TavilySearchProvider,
                                           WebsearchAnswerer,
                                           WebsearchConfig,
                                           clean_llm_output,
                                           extract_response, run_websearch,
                                           websearch_answers)


class MockLLM:
    """≙ the reference's mocked LLM (test_websearch_pipeline.py:46-50):
    fixed synthesis-shaped reply, 1 word = 1 token.  A plain class (not
    MagicMock) so getattr(llm, 'tokenizer', None) stays None."""

    def __init__(self, content="short answer: ok\ndetailed answer: "
                               "detailed ok"):
        self.content = content

    def generate(self, prompt: str, question: str) -> str:
        return self.content

    def get_num_tokens(self, text: str) -> int:
        return len(text.split())


class StubSearcher:
    def __init__(self, results=None):
        self.results = results or []

    def search(self, query):
        return self.results


def make_answerer(max_context_tokens=100, n_subqueries=2, n_loops=1,
                  use_summary=False, use_rag=False, subqueries=("sub1",),
                  results=None, **overrides):
    cfg = WebsearchConfig(max_context_tokens=max_context_tokens,
                          n_subqueries=n_subqueries, n_loops=n_loops,
                          use_summary=use_summary, use_rag=use_rag,
                          **overrides)
    ans = WebsearchAnswerer(cfg, llm=MockLLM(),
                            searcher=StubSearcher(results))
    if subqueries is not None:
        subs = list(subqueries)
        ans.generate_subqueries = lambda *a, **kw: subs
    return ans


def r(url, snippet, title="t"):
    """websearch.py provider output shape."""
    return {"body": snippet, "href": url, "title": title}


# -- extract_response / clean_llm_output (ref :74-101) -----------------------

def test_extract_response_shapes():
    assert extract_response("hello") == "hello"
    assert extract_response(["first", "second", "third"]) == "third"
    assert extract_response([{"content": "from dict"}]) == "from dict"
    assert extract_response([{"other": "value"}]) == ""
    assert extract_response([]) == ""  # empty chunk list must not crash


def test_clean_llm_output_strips_hf_header():
    raw = ("garbage<|eot_id|><|start_header_id|>assistant"
           "<|end_header_id|>actual answer")
    assert clean_llm_output(raw) == "actual answer"
    assert clean_llm_output("normal text") == "normal text"


# -- token helpers (ref :105-178) ---------------------------------------------

def test_count_tokens_delegates_to_llm_without_tokenizer():
    a = make_answerer()
    assert a._count_tokens("one two three") == 3


def test_count_tokens_uses_local_tokenizer_when_available():
    a = make_answerer()

    class Tok:
        def encode(self, text, add_special_tokens=False):
            assert add_special_tokens is False
            return [1, 2, 3, 4, 5]

    a._tokenizer = Tok()
    assert a._count_tokens("some text") == 5


def test_truncate_no_op_when_within_limit():
    a = make_answerer()
    assert a._truncate_to_token_limit("one two three", 10) == "one two three"


def test_truncate_shortens_text():
    a = make_answerer()
    long_text = "word " * 100
    assert len(a._truncate_to_token_limit(long_text, 5)) < len(long_text)


def test_truncate_with_local_tokenizer_slices_ids():
    a = make_answerer()

    class Tok:
        def encode(self, text, add_special_tokens=False):
            return list(range(20))

        def decode(self, ids, skip_special_tokens=True):
            assert ids == list(range(5))
            return "truncated text"

    a._tokenizer = Tok()
    assert a._truncate_to_token_limit("some long text", 5) == "truncated text"


def test_fast_tokenizer_counts_and_truncates():
    a = make_answerer(fast_tokenizer=True)
    assert a._count_tokens("twelve chars") == 3          # ceil(12/4)
    assert a._truncate_to_token_limit("twelve chars", 2) == "twelve c"
    assert a._truncate_to_token_limit("twelve chars", 5) == "twelve chars"


def test_fit_to_budget_truncates_content():
    a = make_answerer(max_context_tokens=20)
    # fixed parts = 3 tokens -> 17 available (10% margin may undershoot)
    out = a._fit_to_budget("word " * 30, "system prompt", "prefix")
    assert a._count_tokens(out) <= 17


def test_fit_to_budget_raises_when_fixed_exceeds_max():
    a = make_answerer(max_context_tokens=5)
    with pytest.raises(ValueError, match="exceed max_context_tokens"):
        a._fit_to_budget(
            "content",
            "this is a very long system prompt that exceeds everything")


# -- smoke (ref :184-202) ------------------------------------------------------

def test_process_record_returns_expected_keys():
    a = make_answerer(n_loops=1, n_subqueries=1, subqueries=None)
    result = a.process_record({"input": "What's the weather like today?"})
    assert result["query"] == "What's the weather like today?"
    for key in ("query", "short_answer", "detailed_answer", "sources"):
        assert key in result
    assert result["sources"] == {}


def test_empty_query():
    a = make_answerer(n_loops=1, subqueries=None)
    assert a.process_record({"input": ""})["query"] == ""


# -- snippet budget (ref :209-305) ---------------------------------------------

def test_all_snippets_collected_when_within_budget():
    a = make_answerer(max_context_tokens=5000,
                      results=[r("http://a.com", "small snippet one"),
                               r("http://b.com", "small snippet two")])
    result = a.process_record({"input": "test query"})
    assert "http://a.com" in result["sources"]
    assert "http://b.com" in result["sources"]


def test_budget_exhaustion_stops_accumulation():
    a = make_answerer(results=[
        r("http://a.com", "alpha bravo charlie"),
        r("http://b.com",
          "delta echo foxtrot golf hotel india juliet kilo")])
    a._compute_content_budget = lambda *_: 5
    result = a.process_record({"input": "test query"})
    assert "http://a.com" in result["sources"]
    assert "http://b.com" not in result["sources"]


def test_budget_exhaustion_skips_remaining_subqueries():
    a = make_answerer(n_subqueries=3, subqueries=["sub1", "sub2", "sub3"])
    a._compute_content_budget = lambda *_: 5
    calls = []

    def counting_web_search(query):
        calls.append(query)
        if len(calls) == 1:
            return [{"url": "http://1.com", "snippet": "word " * 10,
                     "title": "t"}]
        return [{"url": f"http://{len(calls)}.com", "snippet": "other",
                 "title": "t"}]

    a.web_search = counting_web_search
    a.process_record({"input": "test query"})
    assert len(calls) == 1


def test_snippet_at_exact_boundary_is_accepted():
    a = make_answerer(results=[r("http://a.com", "first"),
                               r("http://b.com", "second"),
                               r("http://c.com", "third")])
    a._count_tokens = lambda _: 10
    a._compute_content_budget = lambda *_: 20
    result = a.process_record({"input": "test query"})
    assert "http://a.com" in result["sources"]
    assert "http://b.com" in result["sources"]
    assert "http://c.com" not in result["sources"]


def test_tiny_budget_raises():
    a = make_answerer(max_context_tokens=1,
                      results=[r("http://a.com", "data")])
    with pytest.raises(ValueError, match="exceed max_context_tokens"):
        a.process_record({"input": "test query"})


# -- dedup (ref :312-416) --------------------------------------------------------

def test_exact_duplicate_is_skipped():
    a = make_answerer(results=[r("http://a.com", "same snippet"),
                               r("http://a.com", "same snippet")])
    result = a.process_record({"input": "test query"})
    assert len(result["sources"]["http://a.com"]) == 1


def test_same_url_different_snippet_kept():
    a = make_answerer(results=[
        r("http://a.com", "snippet alpha", title="Title A"),
        r("http://a.com", "snippet beta", title="Title B")])
    result = a.process_record({"input": "test query"})
    assert len(result["sources"]["http://a.com"]) == 2


def test_same_snippet_different_url_kept():
    a = make_answerer(results=[r("http://a.com", "identical text"),
                               r("http://b.com", "identical text")])
    result = a.process_record({"input": "test query"})
    assert "http://a.com" in result["sources"]
    assert "http://b.com" in result["sources"]


def test_dedup_persists_across_subqueries():
    a = make_answerer(max_context_tokens=5000, n_subqueries=2,
                      subqueries=["sub1", "sub2"])
    calls = []

    def same_result(query):
        calls.append(query)
        return [{"url": "http://shared.com", "snippet": "shared content",
                 "title": "t"}]

    a.web_search = same_result
    result = a.process_record({"input": "test query"})
    assert len(calls) == 2
    assert len(result["sources"]["http://shared.com"]) == 1


def test_duplicates_do_not_consume_budget():
    a = make_answerer(max_context_tokens=5000, results=[
        r("http://a.com", "real content"),
        r("http://a.com", "real content"),
        r("http://b.com", "different content")])
    a._count_tokens = lambda _: 10
    a._compute_content_budget = lambda *_: 25
    result = a.process_record({"input": "test query"})
    assert "http://b.com" in result["sources"]


def test_dedup_persists_across_loops():
    a = make_answerer(max_context_tokens=5000, n_loops=2)
    a.evaluate_subquery_relevance = lambda *args: True
    calls = []

    def per_loop(query):
        calls.append(query)
        return [{"url": "http://a.com", "snippet": "same snippet",
                 "title": f"Title Loop {len(calls)}"}]

    a.web_search = per_loop
    result = a.process_record({"input": "test query"})
    assert result["sources"]["http://a.com"] == ["Title Loop 1"]


# -- multi-loop (ref :425-512) ----------------------------------------------------

def _counting_search(calls):
    def web_search(query):
        calls.append(query)
        return [{"url": f"http://{len(calls)}.com", "snippet": "info",
                 "title": "t"}]
    return web_search


def test_second_loop_runs_when_relevant():
    a = make_answerer(max_context_tokens=5000, n_loops=2)
    calls = []
    a.web_search = _counting_search(calls)
    a.evaluate_subquery_relevance = lambda *args: True
    a.process_record({"input": "test query"})
    assert len(calls) == 2


def test_second_loop_skipped_when_irrelevant():
    a = make_answerer(max_context_tokens=5000, n_loops=2)
    calls = []
    a.web_search = _counting_search(calls)
    a.evaluate_subquery_relevance = lambda *args: False
    a.process_record({"input": "test query"})
    assert len(calls) == 1


def test_rag_context_grows_across_loops():
    a = make_answerer(max_context_tokens=5000, n_loops=2)
    rag_docs_seen = []

    def tracking_integrate(original, rag_doc, web_content):
        rag_docs_seen.append(rag_doc)
        return {"short": "s", "detailed": "long detailed answer for growth"}

    a.integrate_with_llm = tracking_integrate
    a.evaluate_subquery_relevance = lambda *args: True
    a.web_search = lambda query: [{"url": "http://x.com", "snippet": "data",
                                   "title": "t"}]
    a.process_record({"input": "test query"})
    assert rag_docs_seen[0] == ""
    assert "Prior answer:" in rag_docs_seen[1]
    assert "long detailed answer for growth" in rag_docs_seen[1]


def test_snippet_budget_shrinks_with_growing_context():
    a = make_answerer(max_context_tokens=200, n_loops=2)
    a.llm.content = "short answer: s\ndetailed answer: " + "word " * 30
    budgets = []
    original = a._compute_content_budget

    def tracking(*fixed_parts):
        b = original(*fixed_parts)
        budgets.append(b)
        return b

    a._compute_content_budget = tracking
    a.evaluate_subquery_relevance = lambda *args: True
    a.web_search = lambda query: [{"url": "http://x.com", "snippet": "data",
                                   "title": "t"}]
    a.process_record({"input": "test query"})
    assert len(budgets) >= 4
    assert budgets[2] < budgets[0]


# -- per-subquery summary budget (ref :519-573) -------------------------------------

def test_large_snippet_excluded_by_summary_budget():
    small = "word " * 3
    large = "word " * 50
    a = make_answerer(results=[r("http://a.com", small),
                               r("http://b.com", small),
                               r("http://c.com", large)])
    a._compute_content_budget = lambda *_: 10
    summary_inputs = []

    def tracking_summary(content, query):
        summary_inputs.append(content)
        return "summary"

    a.generate_summary = tracking_summary
    a.process_record({"input": "test query"})
    assert len(summary_inputs) >= 1
    assert small.strip() in summary_inputs[0]
    assert large.strip() not in summary_inputs[0]


def test_use_summary_bypasses_synthesis_overhead():
    snippet = "this snippet has six words total"

    a_no = make_answerer(max_context_tokens=60, use_summary=False,
                         results=[r("http://a.com", snippet)])
    a_no._compute_content_budget = lambda *_: 3
    result_no = a_no.process_record({"input": "test query"})

    a_yes = make_answerer(max_context_tokens=60, use_summary=True,
                          results=[r("http://a.com", snippet)])
    a_yes._compute_content_budget = lambda *_: 60
    result_yes = a_yes.process_record({"input": "test query"})

    assert "http://a.com" not in result_no["sources"]
    assert "http://a.com" in result_yes["sources"]


# -- deterministic research LLM -------------------------------------------------

def test_fake_research_llm_produces_parseable_subqueries():
    a = WebsearchAnswerer(WebsearchConfig(n_subqueries=3),
                          llm=FakeResearchLLM(), searcher=StubSearcher())
    subs = a.generate_subqueries("how do solar panels work")
    assert len(subs) == 3
    assert all("solar" in s for s in subs)
    assert len(set(subs)) == 3  # distinct aspects


def test_fake_research_llm_relevance_vote():
    a = WebsearchAnswerer(WebsearchConfig(), llm=FakeResearchLLM(),
                          searcher=StubSearcher())
    assert a.evaluate_subquery_relevance("q", ["new angle"], ["old"]) is True
    assert a.evaluate_subquery_relevance("q", ["old"], ["old"]) is False


def test_fake_research_llm_summary_no_useful_information():
    llm = FakeResearchLLM()
    out = llm.generate(
        f"{SUMMARY_SYSTEM_MSG}\n\nQuestion: quantum entanglement\n\n"
        "---CONTEXT---\ncompletely unrelated words here\n---END CONTEXT---",
        "quantum entanglement")
    assert out == "NO_USEFUL_INFORMATION"


# -- search providers ------------------------------------------------------------

def test_fake_search_provider_is_deterministic():
    p = FakeSearchProvider(max_results=5)
    a, b = p.search("solar panel efficiency"), p.search(
        "solar panel efficiency")
    assert a == b and len(a) >= 1
    assert all(set(x) == {"body", "href", "title"} for x in a)
    assert p.search("") == []


def test_ddg_provider_retries_on_ratelimit_then_succeeds():
    class RatelimitException(Exception):
        pass

    attempts = []
    sleeps = []

    class Client:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def text(self, query, max_results, region):
            attempts.append(query)
            if len(attempts) < 3:
                raise RatelimitException()
            return [{"title": "t", "href": "u", "body": "b"}]

    p = DdgSearchProvider(_client_factory=Client, _sleep=sleeps.append)
    out = p.search("q")
    assert len(out) == 1 and len(attempts) == 3
    assert sleeps == [1, 2]  # exponential backoff (websearch.py:59)


def test_ddg_provider_skips_dead_sleep_after_final_attempt():
    class RatelimitException(Exception):
        pass

    sleeps = []

    class Client:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def text(self, query, max_results, region):
            raise RatelimitException()

    p = DdgSearchProvider(_client_factory=Client, _sleep=sleeps.append)
    assert p.search("q") == []
    assert sleeps == [1, 2]  # no trailing 4s sleep before giving up


def test_mixed_query_id_records_rejected(ray_session):
    with pytest.raises(ValueError, match="mix"):
        websearch_answers([{"query_id": 1, "input": "a"}, {"input": "b"}],
                          WebsearchConfig(n_loops=1))


def test_call_requires_input_column():
    import pyarrow as pa

    a = make_answerer(results=[])
    with pytest.raises(ValueError, match="'input' column"):
        a(pa.table({"query_id": [0], "question": ["q"]}))


def test_ddg_provider_returns_empty_on_other_errors():
    class Client:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def text(self, query, max_results, region):
            raise RuntimeError("boom")

    assert DdgSearchProvider(_client_factory=Client).search("q") == []


def test_tavily_provider_maps_result_fields():
    class Client:
        def search(self, query, max_results):
            return {"results": [{"content": "c", "url": "u", "title": "t"}]}

    out = TavilySearchProvider(_client=Client()).search("q")
    assert out == [{"body": "c", "href": "u", "title": "t"}]


def test_ddg_pacing_keyed_on_actual_searcher(monkeypatch):
    """The 2s DDG pacing must follow the searcher INSTANCE: an injected
    stub never sleeps even when config says duckduckgo, and a real
    DdgSearchProvider paces even when config left the name unset."""
    import mmore_ray.pipelines.websearch as ws

    sleeps = []
    monkeypatch.setattr(ws.time, "sleep", sleeps.append)

    a = make_answerer(search_provider="duckduckgo",
                      results=[r("http://a.com", "data")])
    a.process_record({"input": "test query"})
    assert sleeps == []  # stub searcher → no pacing

    b = make_answerer(results=[])
    b.searcher = DdgSearchProvider(
        _client_factory=lambda: (_ for _ in ()).throw(RuntimeError),
        _sleep=lambda s: None)
    b.process_record({"input": "test query"})
    assert sleeps == [2]  # real DDG provider → paced once per subquery


def test_call_requires_query_id_column():
    import pyarrow as pa

    a = make_answerer(results=[])
    with pytest.raises(ValueError, match="query_id"):
        a(pa.table({"input": ["q1", "q2"]}))


def test_rag_informations_round_trips(tmp_path):
    """use_rag=True: the original RAG answer must survive into both the
    Arrow output and the JSON file (ProcessedResponse parity)."""
    import pyarrow as pa

    cfg = WebsearchConfig(use_rag=True, n_loops=1, n_subqueries=1,
                          max_context_tokens=5000)
    a = WebsearchAnswerer(cfg, llm=MockLLM(),
                          searcher=StubSearcher([r("http://a.com", "x")]))
    a.generate_subqueries = lambda *ar, **kw: ["sub1"]
    out = a(pa.table({"query_id": [7], "input": ["the question"],
                      "answer": ["upstream rag answer"]}))
    assert out["rag_informations"].to_pylist() == ["upstream rag answer"]


def test_run_websearch_accepts_question_key(ray_session, tmp_path):
    """This repo's rag_answer output uses 'question'; the file wrapper
    must chain from it without a rename pass."""
    inp = tmp_path / "rag_out.json"
    inp.write_text(json.dumps([
        {"question": "how do solar panels convert sunlight",
         "answer": "panels use the photovoltaic effect"},
    ]))
    outp = tmp_path / "out.json"
    outputs = run_websearch(
        str(inp), str(outp),
        WebsearchConfig(use_rag=True, n_loops=1, n_subqueries=1))
    assert outputs[0]["query"] == "how do solar panels convert sunlight"
    assert outputs[0]["rag_informations"] == \
        "panels use the photovoltaic effect"


def test_q_websearch_deterministic(ray_session):
    """The EXTRA query surface (queries.q_websearch) is rows-only for
    the driver, so pin it here: stable schema, 3 rows, non-empty
    answers, offline sources, and byte-exact across two runs."""
    from mmore_ray.pipelines.queries import EXTRA_NO_ORACLE, EXTRA_QUERIES

    assert "q_websearch" in EXTRA_NO_ORACLE
    a = EXTRA_QUERIES["q_websearch"]("/root/testdata/sf0.001").take_all()
    assert [r["query_id"] for r in a] == [0, 1, 2]
    for row in a:
        assert row["short_answer"] and row["detailed_answer"]
        sources = json.loads(row["sources"])
        assert sources and all(u.startswith("https://fake.example/")
                               for u in sources)
    b = EXTRA_QUERIES["q_websearch"]("/root/testdata/sf0.001").take_all()
    assert a == b


# -- Ray end-to-end ---------------------------------------------------------------

def test_websearch_answers_actor_pool_end_to_end(ray_session, tmp_path):
    import ray.data

    queries = [{"query_id": i, "input": q} for i, q in enumerate([
        "how do solar panels convert sunlight",
        "what causes ocean tides",
        "why is the sky blue during the day",
    ])]
    ds = websearch_answers(ray.data.from_items(queries),
                           WebsearchConfig(n_loops=2, n_subqueries=2),
                           concurrency=2, batch_size=2)
    rows = sorted(ds.take_all(), key=lambda x: x["query_id"])
    assert len(rows) == 3
    for row, q in zip(rows, queries):
        assert row["query"] == q["input"]
        assert row["short_answer"]          # fake pipeline found content
        sources = json.loads(row["sources"])
        assert sources and all(u.startswith("https://fake.example/")
                               for u in sources)

    # determinism: a second run produces byte-identical rows
    ds2 = websearch_answers(ray.data.from_items(queries),
                            WebsearchConfig(n_loops=2, n_subqueries=2),
                            concurrency=2, batch_size=2)
    assert sorted(ds2.take_all(), key=lambda x: x["query_id"]) == rows

    # the file wrapper (run_websearch.py semantics): JSONL in, JSON out
    inp = tmp_path / "queries.jsonl"
    inp.write_text("\n".join(json.dumps({"input": q["input"]})
                             for q in queries))
    outp = tmp_path / "out.json"
    outputs = run_websearch(str(inp), str(outp),
                            WebsearchConfig(n_loops=1, n_subqueries=2))
    assert len(outputs) == 3
    on_disk = json.loads(outp.read_text())
    assert on_disk == outputs
    assert all(set(o) >= {"query", "web_summary", "short_answer",
                          "detailed_answer", "sources"} for o in on_disk)
