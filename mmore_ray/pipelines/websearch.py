"""Web-search-augmented RAG — the reference's ``websearchRAG`` package
re-expressed Ray-Data-first.

Reference semantics (``websearchRAG/pipeline.py:1-569``,
``websearchRAG/websearch.py:1-105``, ``run_websearch.py``): for each
query record, loop up to ``n_loops`` times — generate ``n_subqueries``
search subqueries with the LLM (conditioned on the running context),
gate loops > 0 on an LLM relevance vote, fetch web results per
subquery, accumulate snippets under TWO token budgets (a global
snippet budget derived from the synthesis prompt and a per-subquery
summary budget), dedupe on (url, snippet) across subqueries AND loops,
summarize per subquery then per loop, and synthesize a
short/detailed answer that becomes the next loop's context.

Ray-native shape: each record is an independent multi-call LLM
orchestration, so the unit of parallelism is the RECORD — an
actor-pool ``map_batches`` stage (:class:`WebsearchAnswerer`) holds
the chat model and search provider once per actor (``__init__``) and
drives the per-record loop in ``__call__``.  At fleet scale the
queries table streams through the pool; no shuffle, no driver state.
The per-record Python loop is deliberate: each iteration is an LLM /
network call, not a row-kernel (hot-path vectorization doesn't apply).

Environment notes: the search providers the reference uses (``ddgs``,
``tavily``) and live network access are absent from this sandbox —
both provider classes exist with the reference's retry/backoff logic
and fail at construction naming the missing library; the registered
default is a deterministic offline fake so the full orchestration is
testable end-to-end (the reference's own test suite mocks the searcher
the same way, ``tests/test_websearch_pipeline.py:55-57``).
"""

from __future__ import annotations

import json
import math
import os
import re
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa

from ..models import get_instance, provider_class, register

# ---------------------------------------------------------------------------
# Prompt parity constants (websearchRAG/pipeline.py:24-73).  Kept
# byte-identical so a real chat model receives the same instructions
# under both systems (same rationale as the LLM name tables in
# models.py); all orchestration around them is original.
# ---------------------------------------------------------------------------

SUMMARY_SYSTEM_MSG = (
    "You are an extractive summarizer. Use only the provided context, "
    "no external knowledge. Keep the summary concise and factual.")
SUMMARY_PREFIX = "Question: {query}\n\n---CONTEXT---\n"
SUMMARY_SUFFIX = (
    "\n---END CONTEXT---\n\n"
    "Extract and summarize only the information relevant to the question "
    "above.\nIf the context contains no useful information, respond "
    "exactly with: 'NO_USEFUL_INFORMATION'")

RELEVANCE_SYSTEM_MSG = ("You are a binary classifier. You must respond "
                        "with exactly one word: 'yes' or 'no'.")
RELEVANCE_PROMPT = (
    "Original query:\n{query}\n\n"
    "Previous subqueries that contribute to understanding:"
    "\n{previous_subqueries}\n\n"
    "New subqueries:\n{current_subqueries}\n\n"
    "Are any of the new subqueries relevant in the context of the original "
    "query and previous subqueries? Respond with a single word: 'yes' or "
    "'no'.")

SUBQUERY_SYSTEM_MSG = ("You are a search query generator. Output only the "
                       "requested subqueries in the specified format.")
SUBQUERY_TASK = (
    "Generate exactly {n} independent web-search subqueries that together "
    "cover the question comprehensively.\n"
    "Each subquery must be concise (≤30 words) and search-engine "
    "friendly.\n\n"
    "Output format (one per line, no extra text):\n"
    "subquery <i>: <query>\n")
SUBQUERY_TASK_WITH_CONTEXT = (
    "Partial answer so far:\n{current_context}\n\n"
    "Generate exactly {n} independent web-search subqueries to fill gaps "
    "in the partial answer.\n"
    "Each subquery must be concise (≤30 words) and search-engine "
    "friendly.\n"
    "Do not repeat aspects already covered by the partial answer.\n\n"
    "Output format (one per line, no extra text):\n"
    "subquery <i>: <query>\n")

SYNTHESIS_SYSTEM_MSG = (
    "You are a research assistant. Synthesize the provided sources into a "
    "clear answer. Do not introduce information beyond what is given.")
SYNTHESIS_PREFIX = ("Question: {original}\n\n---RAG SOURCES---\n{rag_doc}\n"
                    "---END RAG SOURCES---\n\n---WEB SOURCES---\n")
SYNTHESIS_SUFFIX = (
    "\n---END WEB SOURCES---\n\n"
    "Respond in exactly this format (keep the labels):\n"
    "short answer: <1-2 sentence answer>\n"
    "detailed answer: <comprehensive answer with key details>")

_HF_ASSISTANT_DELIM = "<|eot_id|><|start_header_id|>assistant<|end_header_id|>"
_SUBQUERY_RE = re.compile(r"subquery \d+: (.*)", re.IGNORECASE)


def extract_response(content: str | list) -> str:
    """≙ pipeline.py:86-99 — a chat response may be a string or a
    list of message chunks; the LAST chunk's text wins.  (An empty
    chunk list yields "" rather than the reference's IndexError —
    inside an actor that crash would fail the whole batch.)"""
    if isinstance(content, str):
        return content
    if not content:
        return ""
    last = content[-1]
    if isinstance(last, str):
        return last
    return last.get("content", "")


def clean_llm_output(content: str) -> str:
    """≙ pipeline.py:176-182 — strip a leaked HF chat-template header
    (everything before the assistant delimiter)."""
    if _HF_ASSISTANT_DELIM not in content:
        return content
    return content.split(_HF_ASSISTANT_DELIM, 1)[-1].strip()


# ---------------------------------------------------------------------------
# Search providers (role "search") — ≙ websearchRAG/websearch.py
# ---------------------------------------------------------------------------

class FakeSearchProvider:
    """Deterministic offline searcher: results are derived from the
    query text alone, so the full orchestration runs (and is exactly
    reproducible) with no network.  Result shape matches
    ``WebsearchOnly.websearch_pipeline`` (websearch.py:86-91):
    ``{"body", "href", "title"}``."""

    def __init__(self, max_results: int = 10, max_retries: int = 3,
                 region: str = "wt-wt"):
        self.max_results = max_results

    def search(self, query: str) -> list[dict[str, str]]:
        words = [w for w in re.findall(r"\w+", query.lower()) if len(w) > 2]
        if not words:
            return []
        out = []
        for i in range(min(self.max_results, 1 + len(words))):
            w = words[i % len(words)]
            out.append({
                "body": f"{w} facts: {' '.join(words)} (result {i})",
                "href": f"https://fake.example/{w}/{i}",
                "title": f"About {w} #{i}",
            })
        return out


class DdgSearchProvider:
    """DuckDuckGo provider with the reference's exponential-backoff
    retry (websearch.py:46-72, fixes their timeout issue #230).  The
    ``ddgs`` package and network access are absent from this sandbox —
    construction fails naming the library; the retry logic is covered
    by injecting a fake client in tests."""

    REQUIRES = "ddgs"

    def __init__(self, max_results: int = 10, max_retries: int = 3,
                 region: str = "wt-wt", _client_factory=None,
                 _sleep=time.sleep):
        if _client_factory is None:
            import ddgs  # noqa: F401 — fails here when absent

            _client_factory = ddgs.DDGS
        self._client_factory = _client_factory
        self._sleep = _sleep
        self.max_results = max_results
        self.max_retries = max_retries
        self.region = region

    def search(self, query: str) -> list[dict[str, str]]:
        for attempt in range(self.max_retries):
            try:
                with self._client_factory() as client:
                    return list(client.text(query,
                                            max_results=self.max_results,
                                            region=self.region))
            except Exception as e:
                # ≙ RatelimitException backoff 1s → 2s → 4s; other
                # DDGS errors return [] (websearch.py:58-72).  Deviation:
                # the reference also sleeps after the FINAL attempt (no
                # retry follows); we skip that dead sleep.
                if type(e).__name__ == "RatelimitException":
                    if attempt + 1 < self.max_retries:
                        self._sleep(2 ** attempt)
                    continue
                return []
        return []


class TavilySearchProvider:
    """Tavily provider (websearch.py:74-84): requires TAVILY_API_KEY
    and the ``tavily`` package (absent here)."""

    REQUIRES = "tavily"

    def __init__(self, max_results: int = 10, max_retries: int = 3,
                 region: str = "wt-wt", _client=None):
        if _client is None:
            from tavily import TavilyClient  # fails here when absent

            api_key = os.getenv("TAVILY_API_KEY")
            if not api_key:
                raise ValueError("set TAVILY_API_KEY environment variable")
            _client = TavilyClient(api_key=api_key)
        self._client = _client
        self.max_results = max_results

    def search(self, query: str) -> list[dict[str, str]]:
        response = self._client.search(query, max_results=self.max_results)
        return [{"body": r.get("content", ""), "href": r.get("url", ""),
                 "title": r.get("title", "")}
                for r in response.get("results", [])]


register("search", "fake", FakeSearchProvider, default=True)
register("search", "duckduckgo", DdgSearchProvider)
register("search", "tavily", TavilySearchProvider)


# ---------------------------------------------------------------------------
# Deterministic research LLM (role "llm", name "fake-research")
# ---------------------------------------------------------------------------

class FakeResearchLLM:
    """Offline stand-in that recognizes the four websearch tasks by
    their system message and produces well-formed structured output —
    subquery lines the pipeline's regex parses, yes/no relevance
    votes, extractive summaries, and labeled short/detailed synthesis.
    Same ``generate(prompt, question)`` contract as FakeChatLLM /
    HFChatGenerator, so a real model swaps in with zero pipeline
    change."""

    def get_num_tokens(self, text: str) -> int:
        return len(text.split())

    def generate(self, prompt: str, question: str) -> str:
        if SUBQUERY_SYSTEM_MSG in prompt:
            return self._subqueries(prompt, question)
        if RELEVANCE_SYSTEM_MSG in prompt:
            return self._relevance(prompt)
        if SUMMARY_SYSTEM_MSG in prompt:
            return self._summary(prompt, question)
        if SYNTHESIS_SYSTEM_MSG in prompt:
            return self._synthesis(prompt, question)
        return self._best_sentences(prompt, question, 1)

    @staticmethod
    def _subqueries(prompt: str, question: str) -> str:
        m = re.search(r"Generate exactly (\d+)", prompt)
        n = int(m.group(1)) if m else 3
        words = [w for w in re.findall(r"\w+", question.lower())
                 if len(w) > 2] or ["query"]
        lines = [f"subquery {i + 1}: {question} {words[i % len(words)]}"
                 for i in range(n)]
        return "\n".join(lines)

    @staticmethod
    def _relevance(prompt: str) -> str:
        prev = re.search(r"Previous subqueries.*?:\n(.*?)\n\nNew subqueries:",
                         prompt, re.DOTALL)
        new = re.search(r"New subqueries:\n(.*?)\n\nAre any", prompt,
                        re.DOTALL)
        prev_set = set((prev.group(1) if prev else "").splitlines())
        new_lines = [ln for ln in (new.group(1) if new else "").splitlines()
                     if ln.strip()]
        return "no" if new_lines and all(
            ln in prev_set for ln in new_lines) else "yes"

    @classmethod
    def _summary(cls, prompt: str, question: str) -> str:
        m = re.search(r"---CONTEXT---\n(.*?)\n---END CONTEXT---", prompt,
                      re.DOTALL)
        context = m.group(1) if m else ""
        best = cls._best_sentences(context, question, 2)
        return best if best else "NO_USEFUL_INFORMATION"

    @classmethod
    def _synthesis(cls, prompt: str, question: str) -> str:
        m = re.search(r"---WEB SOURCES---\n(.*?)\n---END WEB SOURCES---",
                      prompt, re.DOTALL)
        web = m.group(1) if m else ""
        short = cls._best_sentences(web, question, 1) or "unknown"
        detailed = cls._best_sentences(web, question, 3) or short
        return f"short answer: {short}\ndetailed answer: {detailed}"

    @staticmethod
    def _best_sentences(text: str, question: str, k: int) -> str:
        q = set(re.findall(r"\w+", question.lower()))
        scored = []
        for i, line in enumerate(text.splitlines()):
            for sent in line.split(". "):
                sent = sent.strip()
                if not sent:
                    continue
                score = sum(1 for w in re.findall(r"\w+", sent.lower())
                            if w in q)
                if score:
                    scored.append((-score, i, sent))
        scored.sort()
        return " ".join(s for _, _, s in scored[:k])


register("llm", "fake-research", FakeResearchLLM)


# ---------------------------------------------------------------------------
# Config (field parity with websearchRAG/config.py WebsearchConfig)
# ---------------------------------------------------------------------------

@dataclass
class WebsearchConfig:
    """≙ WebsearchConfig (config.py:12-57) minus the file-path fields
    (the Ray pipeline takes a Dataset in and returns one out; the
    JSON/JSONL file wrapper lives in :func:`run_websearch`)."""

    use_rag: bool = False
    use_summary: bool = False
    n_subqueries: int = 3
    n_loops: int = 2
    max_searches: int = 10
    max_retries: int = 3
    search_provider: str | None = None   # registry name; None → default
    llm_provider: str | None = None      # registry name; None → research fake
    max_context_tokens: int = 2048
    fast_tokenizer: bool = False
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        for name in ("n_loops", "n_subqueries", "max_searches"):
            if not getattr(self, name):
                raise ValueError(f"'{name}' is a required field.")


# ---------------------------------------------------------------------------
# The per-record orchestration
# ---------------------------------------------------------------------------

class WebsearchAnswerer:
    """Actor-pool stage: chat model + searcher load once per actor,
    ``__call__`` drives the reference's process_record loop per row.

    Injection points (``llm``, ``searcher``) take precedence over the
    provider registry — the same hook shape as ``rag_answer(llm=...)``
    and ``judge.judge_fn`` — and the per-task methods are overridable
    the way the reference's tests monkeypatch them."""

    def __init__(self, config: WebsearchConfig | dict | None = None,
                 llm: Any = None, searcher: Any = None):
        if config is None:
            config = WebsearchConfig()
        elif isinstance(config, dict):
            config = WebsearchConfig(**config)
        self.config = config
        if llm is None:
            name = (config.llm_provider
                    or os.environ.get("MMORE_RAY_LLM") or "fake-research")
            llm = get_instance("llm", name)
        self.llm = llm
        if searcher is None:
            cls = provider_class("search", config.search_provider)
            searcher = cls(max_results=config.max_searches,
                           max_retries=config.max_retries)
        self.searcher = searcher
        self._tokenizer = getattr(llm, "tokenizer", None)

    # -- LLM plumbing ----------------------------------------------------

    def _invoke(self, system: str, user: str, question: str) -> str:
        """System+user → one generate() call (the engine's chat
        contract); response unwrapping and HF-header stripping match
        the reference (pipeline.py:146-150)."""
        raw = self.llm.generate(f"{system}\n\n{user}", question)
        return clean_llm_output(extract_response(raw))

    # -- token budgets (pipeline.py:185-250) ------------------------------

    def _count_tokens(self, text: str) -> int:
        if self.config.fast_tokenizer:
            return math.ceil(len(text) / 4)
        if self._tokenizer is not None:
            return len(self._tokenizer.encode(text, add_special_tokens=False))
        if hasattr(self.llm, "get_num_tokens"):
            return self.llm.get_num_tokens(text)
        return math.ceil(len(text) / 4)

    def _truncate_to_token_limit(self, text: str, max_tokens: int) -> str:
        if self.config.fast_tokenizer:
            return text[:max_tokens * 4]
        if self._tokenizer is not None:
            ids = self._tokenizer.encode(text, add_special_tokens=False)
            if len(ids) <= max_tokens:
                return text
            return self._tokenizer.decode(ids[:max_tokens],
                                          skip_special_tokens=True)
        total = self._count_tokens(text)
        if total <= max_tokens:
            return text
        # Parity (pipeline.py:229-236): single proportional char cut
        # with the reference's 10% margin, NOT re-checked — skewed
        # char/token ratios can still land over budget; the real fix
        # on both systems is a tokenizer or fast_tokenizer=True.
        cut = int(len(text) * (max_tokens / total * 0.9))
        return text[:cut] if cut > 0 else ""

    def _fit_to_budget(self, content: str, *fixed_parts: str) -> str:
        # Parity (pipeline.py:238-249): fixed parts over budget raise —
        # in the reference this aborts the whole serial run the same
        # way it fails a Ray batch here; it is a loud config error
        # (raise max_context_tokens), not something to truncate away.
        fixed = sum(self._count_tokens(p) for p in fixed_parts)
        available = self.config.max_context_tokens - fixed
        if available <= 0:
            raise ValueError(
                "Prompt fixed parts exceed max_context_tokens: "
                f"max_context_tokens={self.config.max_context_tokens}, "
                f"fixed_tokens={fixed}.")
        return self._truncate_to_token_limit(content, available)

    def _compute_content_budget(self, *fixed_parts: str) -> int:
        fixed = sum(self._count_tokens(p) for p in fixed_parts)
        return max(0, self.config.max_context_tokens - fixed)

    # -- LLM tasks (pipeline.py:134-174, 248-338) --------------------------

    def generate_summary(self, content: str | None, query: str) -> str:
        prefix = SUMMARY_PREFIX.format(query=query)
        fitted = self._fit_to_budget(content or "No context yet",
                                     SUMMARY_SYSTEM_MSG, prefix,
                                     SUMMARY_SUFFIX)
        return self._invoke(SUMMARY_SYSTEM_MSG,
                            prefix + fitted + SUMMARY_SUFFIX, query)

    def evaluate_subquery_relevance(self, query: str, current: list[str],
                                    previous: list[str]) -> bool:
        prompt = RELEVANCE_PROMPT.format(
            query=query,
            previous_subqueries="\n".join(previous),
            current_subqueries="\n".join(current))
        response = self._invoke(RELEVANCE_SYSTEM_MSG, prompt,
                                query).strip().lower()
        if re.match(r"^yes\b", response):
            return True
        # unexpected output counts as "no" (pipeline.py:168-174)
        return False

    def generate_subqueries(self, original_query: str,
                            current_context: str | None = None) -> list[str]:
        n = self.config.n_subqueries
        task = (SUBQUERY_TASK.format(n=n) if current_context is None
                else SUBQUERY_TASK_WITH_CONTEXT.format(
                    n=n, current_context=current_context))
        response = self._invoke(SUBQUERY_SYSTEM_MSG,
                                f"Question: {original_query}\n\n" + task,
                                original_query)
        return _SUBQUERY_RE.findall(response)

    def web_search(self, query: str) -> list[dict[str, str]]:
        """Provider result → the pipeline's snippet/url/title shape
        (pipeline.py:282-296)."""
        return [{"snippet": r.get("body", ""), "url": r.get("href", ""),
                 "title": r.get("title", "")}
                for r in self.searcher.search(query)]

    def integrate_with_llm(self, original: str, rag_doc: str | None,
                           web_content: str) -> dict[str, str]:
        rag_text = rag_doc or "No RAG sources"
        prefix = SYNTHESIS_PREFIX.format(original=original, rag_doc=rag_text)
        fitted = self._fit_to_budget(web_content, SYNTHESIS_SYSTEM_MSG,
                                     prefix, SYNTHESIS_SUFFIX)
        content = self._invoke(SYNTHESIS_SYSTEM_MSG,
                               prefix + fitted + SYNTHESIS_SUFFIX, original)
        # Parity (pipeline.py:320-326): the short-answer regex requires
        # the "detailed answer:" label as a lookahead, so a reply with
        # only a short answer yields "" on both systems.
        sa = re.findall(r"short answer:\s*(.*?)(?=detailed answer:)",
                        content, flags=re.IGNORECASE | re.DOTALL)
        da = re.findall(r"detailed answer:\s*(.*)", content,
                        flags=re.IGNORECASE | re.DOTALL)
        return {"short": sa[-1].strip().rstrip(",") if sa else "",
                "detailed": da[-1].strip() if da else ""}

    # -- the record loop (pipeline.py:340-484) -----------------------------

    def process_record(self, rec: dict) -> dict:
        cfg = self.config
        qr = (rec.get("input") or "").strip()
        rag_ans = rec.get("answer", "") if cfg.use_rag else None
        rag_summary = self.generate_summary(rag_ans, qr) if cfg.use_rag \
            else None

        source_map: dict[str, list[str]] = {}
        seen_results: set[tuple[str, str]] = set()
        current_context = rag_summary
        final_short = final_detailed = ""
        web_summary_all = ""
        web_summaries: list[str] = []
        previous_sub: list[str] = []

        for loop in range(cfg.n_loops):
            # Parity quirk (pipeline.py:351-355): only RAG mode feeds
            # the running context back into subquery generation —
            # non-RAG loops regenerate from the original query alone
            # (loop variety comes from the LLM, not the prompt).
            subs = (self.generate_subqueries(qr, current_context)
                    if cfg.use_rag else self.generate_subqueries(qr))
            if loop > 0 and not self.evaluate_subquery_relevance(
                    qr, subs, previous_sub):
                break

            rag_for_llm = rag_summary or ""
            if current_context and current_context != rag_summary:
                rag_for_llm += f"\n\nPrior answer:\n{current_context}"

            if cfg.use_summary:
                snippet_budget = cfg.max_context_tokens
            else:
                synthesis_prefix = SYNTHESIS_PREFIX.format(
                    original=qr, rag_doc=rag_for_llm or "No RAG sources")
                snippet_budget = self._compute_content_budget(
                    SYNTHESIS_SYSTEM_MSG, synthesis_prefix, SYNTHESIS_SUFFIX)

            snippets: list[str] = []
            subquery_summaries: list[str] = []
            total_tokens = 0
            budget_exhausted = False

            for sq in subs:
                if budget_exhausted:
                    break
                sq_prefix = SUMMARY_PREFIX.format(query=sq)
                summary_budget = self._compute_content_budget(
                    SUMMARY_SYSTEM_MSG, sq_prefix, SUMMARY_SUFFIX)
                if isinstance(self.searcher, DdgSearchProvider):
                    # DDG pacing (pipeline.py:395-397).  Keyed on the
                    # ACTUAL searcher, not cfg.search_provider as the
                    # reference does: the env-var / injection paths the
                    # reference lacks would otherwise skip pacing (or
                    # pace a stub) when config and instance disagree.
                    time.sleep(2)
                res = self.web_search(query=sq)

                subquery_snippets: list[str] = []
                subquery_tokens = 0
                for r in res:
                    url, snippet, title = r["url"], r["snippet"], r["title"]
                    if (url, snippet) in seen_results:
                        continue
                    snippet_tokens = self._count_tokens(snippet + "\n")
                    if total_tokens + snippet_tokens > snippet_budget:
                        budget_exhausted = True
                        break
                    if subquery_tokens + snippet_tokens > summary_budget:
                        break
                    source_map.setdefault(url, [])
                    if title not in source_map[url]:
                        source_map[url].append(title)
                    snippets.append(snippet)
                    subquery_snippets.append(snippet)
                    total_tokens += snippet_tokens
                    subquery_tokens += snippet_tokens
                    seen_results.add((url, snippet))

                if subquery_snippets:
                    subquery_summaries.append(self.generate_summary(
                        "\n".join(subquery_snippets), sq))

            # Parity quirk (pipeline.py:444): the relevance gate
            # compares against the PREVIOUS loop only, not all loops.
            previous_sub = subs

            web_summary = self.generate_summary(
                "\n".join(str(s) if s else "" for s in subquery_summaries),
                qr)
            web_summaries.append(web_summary)
            web_for_llm = (web_summary if cfg.use_summary
                           else "\n".join(snippets))
            # Parity quirk (pipeline.py:461-464): the all-loops summary
            # is regenerated inside every loop (earlier results are
            # overwritten unread) — kept so a real model sees the
            # reference's exact call sequence.
            web_summary_all = self.generate_summary(
                "\n".join(str(s) if s else "" for s in web_summaries), qr)

            out = self.integrate_with_llm(qr, rag_for_llm, web_for_llm)
            final_short, final_detailed = out["short"], out["detailed"]
            current_context = final_detailed

        return {
            "query": qr,
            "rag_informations": rag_ans,
            "rag_summary": rag_summary if cfg.use_rag else None,
            "web_summary": web_summary_all,
            "short_answer": final_short,
            "detailed_answer": final_detailed,
            "sources": source_map,
        }

    # -- the batch contract -------------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = set(batch.column_names)
        if "query_id" not in names:
            # A per-batch fallback (range(num_rows)) would silently
            # collide across batches; require a real id instead.
            raise ValueError(
                "websearch input needs a 'query_id' column (batch-local "
                "fallbacks would duplicate ids across batches)")
        if "input" not in names:
            raise ValueError(
                f"websearch input needs an 'input' column (got "
                f"{sorted(names)}); rename the query column — the file "
                f"wrapper run_websearch accepts 'question' records")
        ids = batch["query_id"].to_pylist()
        inputs = batch["input"].to_pylist()
        answers = (batch["answer"].to_pylist() if "answer" in names
                   else [""] * batch.num_rows)
        rows = [self.process_record({"input": q, "answer": a})
                for q, a in zip(inputs, answers)]
        return pa.table({
            "query_id": pa.array(ids),
            "query": pa.array([r["query"] for r in rows], pa.string()),
            "rag_informations": pa.array(
                [r["rag_informations"] for r in rows], pa.string()),
            "rag_summary": pa.array([r["rag_summary"] for r in rows],
                                    pa.string()),
            "web_summary": pa.array([r["web_summary"] for r in rows],
                                    pa.string()),
            "short_answer": pa.array([r["short_answer"] for r in rows],
                                     pa.string()),
            "detailed_answer": pa.array([r["detailed_answer"] for r in rows],
                                        pa.string()),
            "sources": pa.array([json.dumps(r["sources"], sort_keys=True)
                                 for r in rows], pa.string()),
        })


def websearch_answers(queries, config: WebsearchConfig | dict | None = None,
                      llm: Any = None, searcher: Any = None,
                      concurrency: int = 4, batch_size: int = 8):
    """Run the websearch loop over a queries Dataset (columns:
    ``query_id``, ``input``, optional ``answer`` from a prior RAG
    pass — ≙ run_websearch.py's RAG-output mode).

    Returns a Dataset with one enhanced-answer row per query.  Each
    actor holds the model/searcher once; ``batch_size`` is small
    because a record costs several LLM calls, not because rows are
    wide."""
    import ray.data

    if not isinstance(queries, ray.data.Dataset):
        items = list(queries)
        n_with = sum("query_id" in rec for rec in items)
        if n_with == 0:
            items = [{"query_id": i, **rec} for i, rec in enumerate(items)]
        elif n_with != len(items):
            # enumerate-filling only the gaps would collide with the
            # explicit ids; make the caller pick one convention
            raise ValueError("either every record or no record may "
                             "carry 'query_id' (got a mix)")
        queries = ray.data.from_items(items)
    elif "query_id" not in queries.schema().names:
        raise ValueError("websearch input Dataset needs a 'query_id' "
                         "column (there is no cheap global row index "
                         "to synthesize one distributively)")
    cfg = config if isinstance(config, WebsearchConfig) else \
        WebsearchConfig(**(config or {}))
    return queries.map_batches(
        WebsearchAnswerer,
        fn_constructor_kwargs={"config": cfg, "llm": llm,
                               "searcher": searcher},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def run_websearch(input_path: str, output_path: str,
                  config: WebsearchConfig | dict | None = None,
                  llm: Any = None, searcher: Any = None,
                  concurrency: int = 4) -> list[dict]:
    """File-level wrapper (≙ run_websearch.py + pipeline.run): read
    queries (JSONL of ``{"input": ...}`` records, or a JSON list from
    a RAG output file), run the loop, write a JSON array of
    ProcessedResponse dicts."""
    from pathlib import Path

    text = Path(input_path).read_text(encoding="utf-8")
    if input_path.endswith(".jsonl"):
        data = [json.loads(ln) for ln in text.splitlines() if ln.strip()]
    else:
        data = json.loads(text)
    # "input" is the reference's key; "question" is what this repo's
    # own rag_answer output carries — accept both so the documented
    # RAG→websearch chaining works without a rename pass.
    records = [{"query_id": i,
                "input": rec.get("input") or rec.get("question", ""),
                "answer": rec.get("answer", "")}
               for i, rec in enumerate(data)]
    result = websearch_answers(records, config, llm, searcher,
                               concurrency=concurrency)
    rows = sorted(result.take_all(), key=lambda r: r["query_id"])
    outputs = [{
        "query": r["query"],
        "rag_informations": r["rag_informations"],
        "rag_summary": r["rag_summary"],
        "web_summary": r["web_summary"],
        "short_answer": r["short_answer"],
        "detailed_answer": r["detailed_answer"],
        "sources": json.loads(r["sources"]),
    } for r in rows]
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(outputs, ensure_ascii=False, indent=2),
                   encoding="utf-8")
    return outputs
