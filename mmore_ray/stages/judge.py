"""Corrective-retrieval judge (reference ``rag/judge/`` package).

The reference wraps per-query retrieval in a judge loop: compute
retrieval-quality metrics, short-circuit when thresholds pass, otherwise
ask an LLM judge for a corrective action (re-retrieve with different
params / add sub-questions / add web context), apply it, merge+dedupe
the document lists, and re-evaluate up to ``max_corrective_steps``
(``rag/judge/corrective.py:76-180``).  The decision machinery —
metrics (``metrics.py:14-47``), threshold gate (``metrics.py:50-76``),
decision coercion with its fallback ladder (``decisions.py:24-54``),
document merge (``metrics.py:148-167``), effective retrieve params
(``parsing.py:179-191``), tolerant JSON repair (``parsing.py:24-30``)
— is pure logic and reimplemented here over plain dict "hit" rows.

The LLM itself is a hook (``judge_fn``), exactly like the engine's
``translate_fn`` / ``llm`` hooks: this container has no chat model, and
the reference's own judge tests drive the machinery with mocks.  The
ADD_CONTEXT (web search) action is out of scope (no network) and is
simply never in the allowed set.

Scale shape: the judge loop is per-query driver-side control flow (in
the reference too); each retrieval it triggers is a distributed Ray
Data scan (``embed.retrieve``), so the loop adds no driver-side data
movement beyond the k merged hits it already holds.
"""

from __future__ import annotations

import json
import re
from typing import Any, Callable

# Decisions (≙ JudgeDecision enum, rag/judge/types.py:91-95).
# ADD_CONTEXT (web search) is recognized by the coercion ladder but
# never allowed here (no network), so it always falls back.
PROCEED = "PROCEED"
RE_RETRIEVE = "RE_RETRIEVE"
ADD_QUESTIONS = "ADD_QUESTIONS"
ADD_CONTEXT = "ADD_CONTEXT"

_METRIC_KEYS = ("num_docs", "mean_similarity", "max_similarity",
                "mean_rerank_score", "max_rerank_score")


def compute_retrieval_metrics(hits: list[dict]) -> dict[str, float]:
    """≙ metrics.py:14-47: similarity/rerank stats over the hit list;
    absent scores contribute 0.0 aggregates, not errors."""
    sims = [float(h["similarity"]) for h in hits
            if h.get("similarity") is not None]
    reranks = [float(h["rerank_score"]) for h in hits
               if h.get("rerank_score") is not None]
    return {
        "num_docs": float(len(hits)),
        "mean_similarity": sum(sims) / len(sims) if sims else 0.0,
        "max_similarity": max(sims) if sims else 0.0,
        "mean_rerank_score": sum(reranks) / len(reranks) if reranks else 0.0,
        "max_rerank_score": max(reranks) if reranks else 0.0,
    }


def evaluate_metrics(hits: list[dict],
                     thresholds: dict[str, float]) -> tuple[dict, bool, str]:
    """≙ metrics.py:50-88: metrics + ``min_<key>`` threshold gate.
    No thresholds configured ⇒ never passes (the judge always runs)."""
    metrics = compute_retrieval_metrics(hits)
    if not thresholds:
        return metrics, False, "No thresholds configured."
    lines, all_pass = [], True
    for key in _METRIC_KEYS:
        tkey = f"min_{key}"
        if tkey not in thresholds:
            continue
        ok = metrics[key] >= thresholds[tkey]
        all_pass = all_pass and ok
        lines.append(f"- {key}: {metrics[key]:.4f} "
                     f"(need {tkey}={thresholds[tkey]}) -> "
                     f"{'PASS' if ok else 'FAIL'}")
    if not lines:
        # thresholds configured but none applicable (e.g. a misspelled
        # min_<metric> key): failing open would silently disable the
        # judge — fail closed like the no-thresholds case instead
        return metrics, False, "No applicable threshold keys."
    return metrics, all_pass, "\n".join(lines)


def coerce_decision(raw: str, allowed: list[str]) -> tuple[str, bool]:
    """≙ decisions.py:24-54 fallback ladder.  Returns (decision,
    coerced).  Unknown → PROCEED; disallowed RE_RETRIEVE falls back to
    ADD_QUESTIONS when that is allowed; any other disallowed corrective
    falls back to RE_RETRIEVE when allowed; else PROCEED."""
    if raw not in (PROCEED, RE_RETRIEVE, ADD_QUESTIONS, ADD_CONTEXT):
        return PROCEED, True
    if raw in allowed or raw == PROCEED:
        return raw, raw not in allowed and raw != PROCEED
    if raw == RE_RETRIEVE and ADD_QUESTIONS in allowed:
        return ADD_QUESTIONS, True
    if raw != RE_RETRIEVE and RE_RETRIEVE in allowed:
        return RE_RETRIEVE, True
    return PROCEED, True


def merge_hits(existing: list[dict], new: list[dict]) -> list[dict]:
    """≙ metrics.py:148-167: concat, dedupe by id (falling back to
    text), reassign 1-based ranks in merged order."""
    seen: set[tuple[str, str]] = set()
    merged: list[dict] = []
    for h in list(existing) + list(new):
        # type-tagged key: an id-less hit whose text equals another
        # hit's id must not collide into the same dedupe slot
        key = (("id", str(h["id"])) if h.get("id") is not None
               else ("text", h.get("text", "")))
        if key in seen:
            continue
        seen.add(key)
        merged.append(dict(h))
    for i, h in enumerate(merged):
        h["rank"] = i + 1
    return merged


def effective_retrieve_params(params: dict | None, query: str,
                              k: int) -> dict:
    """≙ parsing.py:179-191: judge-supplied input/k with the doubled-k
    default (``max(2k, k+3)``).  ``k`` comes from untrusted judge
    output — non-numeric / non-positive values fall back to the
    default instead of crashing the loop (same tolerance the JSON
    layer applies)."""
    params = params or {}
    try:
        kk = int(params.get("k"))
    except (TypeError, ValueError):
        kk = 0
    return {
        "input": params.get("input") or query,
        "k": kk if kk > 0 else max(k * 2, k + 3),
    }


def repair_json_text(text: str) -> str:
    """≙ parsing.py:24-30: trailing commas + Python literals."""
    text = re.sub(r",\s*([}\]])", r"\1", text)
    text = re.sub(r"\bTrue\b", "true", text)
    text = re.sub(r"\bFalse\b", "false", text)
    return re.sub(r"\bNone\b", "null", text)


def parse_judge_response(text: str) -> dict:
    """JSON object extraction: raw_decode the FIRST complete object
    (the reference's ``_judge_json_snippet`` shape — a greedy
    first-{-to-last-} span would swallow brace-containing commentary
    after a valid decision and fail), then strict-then-repaired on the
    first-{ suffix; raises ``json.JSONDecodeError`` when hopeless —
    the loop maps that to a PROCEED parse_error_fallback."""
    start = text.find("{")
    snippet = text[start:] if start >= 0 else text
    try:
        obj, _ = json.JSONDecoder().raw_decode(snippet)
    except json.JSONDecodeError:
        try:
            obj = json.loads(repair_json_text(snippet))
        except json.JSONDecodeError:
            # last resort: the old greedy span through the repair pass
            # (recovers objects whose PREFIX is malformed but whose
            # full span repairs clean)
            m = re.search(r"\{.*\}", text, re.DOTALL)
            obj = json.loads(repair_json_text(m.group(0) if m else text))
    if not isinstance(obj, dict):
        raise json.JSONDecodeError("not an object", snippet, 0)
    return obj


def hits_from_table(table) -> list[dict]:
    """Adapter: a ``retrieve``/``topk`` result (Arrow table or Dataset)
    → ranked hit dicts (score ≙ Milvus similarity)."""
    if hasattr(table, "to_pandas"):
        df = table.to_pandas()
    else:
        df = table
    # the reranker's ordering outranks the raw retrieval score — a
    # score-only sort would silently undo retrieve(..., rerank=True)
    by = [c for c in ("rerank_score", "score") if c in df.columns]
    df = df.sort_values(by, ascending=False,
                        na_position="last").reset_index(drop=True)
    out = []
    for i, row in enumerate(df.itertuples(index=False)):
        d = row._asdict() if hasattr(row, "_asdict") else dict(row)
        out.append({
            "id": d.get("sample_id"),
            "text": d.get("text", ""),
            "similarity": d.get("score"),
            "rerank_score": d.get("rerank_score"),
            "rank": i + 1,
        })
    return out


def retrieve_with_judge(
    retrieve_fn: Callable[..., list[dict]],
    query: str,
    *,
    k: int = 5,
    thresholds: dict[str, float] | None = None,
    judge_fn: Callable[[str, dict, list[dict]], dict] | str | None = None,
    allow_re_retrieve: bool = True,
    allow_add_questions: bool = False,
    max_corrective_steps: int = 2,
    force_corrective_action: str | None = None,
) -> dict[str, Any]:
    """≙ corrective.py:76-180 loop over a pluggable retriever/judge.

    ``retrieve_fn(query, k) -> list[hit]`` (each hit a dict with id /
    text / similarity and optional rerank_score).  ``judge_fn(query,
    metrics, hits)`` returns a decision dict (``{"decision": ...,
    "retrieve_params"|"extra_questions": ...}``) or a raw LLM string to
    be JSON-parsed; ``None`` behaves as an always-PROCEED judge.
    """
    thresholds = thresholds or {}
    allowed = [PROCEED] + ([ADD_QUESTIONS] if allow_add_questions else []) \
        + ([RE_RETRIEVE] if allow_re_retrieve else [])
    hits = retrieve_fn(query, k)
    steps: list[dict] = []
    actions: list[str] = []
    corrections: list[dict] = []
    exit_reason = "metrics_above_thresholds"

    for step in range(max_corrective_steps + 1):
        metrics, passed, status = evaluate_metrics(hits, thresholds)
        if passed:
            exit_reason = ("metrics_after_correction" if actions
                           else "metrics_above_thresholds")
            steps.append({"step": step, "decision": PROCEED,
                          "exit_reason": exit_reason, "llm_invoked": False})
            break

        # decide: forced action > judge hook > proceed
        if force_corrective_action is not None:
            if force_corrective_action not in allowed:
                raise ValueError(
                    f"force_corrective_action {force_corrective_action!r} "
                    f"not in allowed {allowed}")
            parsed: dict = {"decision": force_corrective_action}
            if force_corrective_action == RE_RETRIEVE:
                parsed["retrieve_params"] = {"k": 10}
            llm_invoked, exit_reason = False, "force_corrective_action"
            decision, coerced = parsed["decision"], False
        elif judge_fn is None:
            steps.append({"step": step, "decision": PROCEED,
                          "exit_reason": "no_judge", "llm_invoked": False})
            exit_reason = "no_judge"
            break
        else:
            raw = judge_fn(query, metrics, hits)
            llm_invoked = True
            if isinstance(raw, str):
                try:
                    parsed = parse_judge_response(raw)
                except json.JSONDecodeError:
                    steps.append({"step": step, "decision": PROCEED,
                                  "exit_reason": "parse_error_fallback",
                                  "llm_invoked": True, "raw": raw})
                    exit_reason = "parse_error_fallback"
                    break
            else:
                parsed = dict(raw)
            decision, coerced = coerce_decision(
                str(parsed.get("decision", PROCEED)), allowed)
            exit_reason = ("llm_proceed" if decision == PROCEED
                           else "llm_corrective")

        steps.append({"step": step, "decision": decision,
                      "coerced_decision": coerced,
                      "exit_reason": exit_reason,
                      "llm_invoked": llm_invoked})
        if decision == PROCEED:
            break
        if decision == ADD_QUESTIONS \
                and not (parsed.get("extra_questions") or []):
            # a coerced (or question-less) ADD_QUESTIONS performs zero
            # retrievals — looping on it would burn every corrective
            # step as a no-op while the telemetry claimed corrections.
            # Checked BEFORE the step limit so the boundary step still
            # reports the true cause instead of "max_corrective_steps".
            exit_reason = "no_extra_questions"
            steps[-1]["exit_reason"] = exit_reason
            break
        if step >= max_corrective_steps:
            exit_reason = "max_corrective_steps"
            break

        actions.append(decision)
        before = hits
        if decision == ADD_QUESTIONS:
            for sub_q in list(parsed.get("extra_questions") or [])[:3]:
                hits = merge_hits(hits, retrieve_fn(str(sub_q), k))
        else:  # RE_RETRIEVE
            eff = effective_retrieve_params(
                parsed.get("retrieve_params"), query, k)
            hits = merge_hits(hits, retrieve_fn(eff["input"], eff["k"]))
        m_before, tm_before, _ = evaluate_metrics(before, thresholds)
        m_after, tm_after, _ = evaluate_metrics(hits, thresholds)
        corrections.append({
            "action": decision, "before": m_before, "after": m_after,
            "thresholds_met_before": float(tm_before),
            "thresholds_met_after": float(tm_after),
        })

    metrics, passed, _ = evaluate_metrics(hits, thresholds)
    metrics["thresholds_met"] = float(passed)
    return {
        "input": query,
        "docs": hits,
        "retrieval_metrics": metrics,
        "judge_actions": actions,
        "judge_steps": steps,
        "retrieval_corrections": corrections,
        "judge_reason": exit_reason,
        "hit_max_corrective_steps": float(
            exit_reason == "max_corrective_steps"),
    }
