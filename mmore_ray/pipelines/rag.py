"""RAG retrieve→generate pipeline (reference ``rag/pipeline.py``).

The reference chains Milvus hybrid retrieval → context formatting
(``[{rank}] {content}`` blocks, pipeline.py:93-97) → a chat prompt
(DEFAULT_PROMPT, pipeline.py:28-33) → an LLM → answer per query.  Here
the same observable contract runs Ray-native:

  * **retrieval is ONE pass for ALL queries** — the query matrix
    (dense + sparse) is broadcast once and every collection batch
    scores all queries locally, keeping per-query local top-k
    (the knn_brute_force shape; no per-query collection scan);
  * context assembly and generation run over the tiny top-k result
    set; the LLM is a deterministic extractive fake (this container
    has no model — same treatment as the embedders, which the
    reference's own tests also fake) behind the ``llm`` hook.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

# ≙ pipeline.py:28-33
DEFAULT_PROMPT = (
    "Use the following context to answer the questions. If none of the "
    "context answer the question, just say you don't know.\n\n"
    "Context:\n{context}\n"
)

DONT_KNOW = "I don't know."


def format_docs(texts: list[str]) -> str:
    """≙ RAGPipeline.format_docs (pipeline.py:93-97): rank-tagged blocks."""
    return "\n\n".join(f"[{i + 1}] {t}" for i, t in enumerate(texts))


class FakeChatLLM:
    """Deterministic extractive stand-in for the chat model: answers
    with the context sentence sharing the most words with the question,
    or the don't-know fallback the prompt instructs.  Loads once per
    actor when used in a pool; swap a real model via the ``llm`` hook
    of :func:`rag_answer`."""

    _RANK_TAG = re.compile(r"^\[\d+\] ")

    def generate(self, prompt: str, question: str) -> str:
        q = set(question.lower().split())
        best, best_score = DONT_KNOW, 0
        for line in prompt.splitlines():
            # strip the format_docs rank tag so it never leaks into the
            # extracted answer
            line = self._RANK_TAG.sub("", line.strip())
            if not line or line.startswith(("Context:", "Use the following")):
                continue
            for sent in line.split(". "):
                score = sum(1 for w in sent.lower().split() if w in q)
                if score > best_score:
                    best, best_score = sent.strip(), score
        return best


def rag_answer(collection_dir: str, queries: dict[str, str], k: int = 3,
               dense_weight: float = 0.5, llm=None,
               prompt: str = DEFAULT_PROMPT,
               dense_provider: str | None = None,
               sparse_provider: str | None = None,
               llm_provider: str | None = None) -> pd.DataFrame:
    """Answer ``queries`` ({query_id: question}) against an indexed
    parquet collection (built by ``stages/embed.index_documents``).

    Query embedders resolve through the model-provider registry so
    they MATCH the providers that built the collection (the same rule
    embed.retrieve documents — a fake 16-dim query against a real
    384-dim collection would dimension-mismatch the matmul).

    Returns (query_id, question, answer, context, n_docs) — small,
    driver-side, like the reference's API response."""
    import ray.data  # noqa: F401 — also binds `ray` in function scope

    from ..models import get_instance

    # the chat model resolves through the provider registry (reference
    # rag/llm.py name tables ≙ models.infer_llm_provider): default is
    # the deterministic extractive fake, MMORE_RAY_LLM=hf /
    # llm_provider="hf" swaps in a real local text-generation model
    # with no other change; an explicit `llm` object overrides both
    llm = llm if llm is not None else get_instance("llm", llm_provider)
    q_ids = sorted(queries)
    dense = get_instance("dense_embedder", dense_provider)
    sparse = get_instance("sparse_embedder", sparse_provider)
    Q = np.stack([np.asarray(dense.embed_one(queries[q]), dtype=np.float64)
                  for q in q_ids])
    SQ = []
    for q in q_ids:
        si, sv = sparse.embed_one(queries[q])
        o = np.argsort(np.asarray(si, dtype=np.int64))
        SQ.append((np.asarray(si, np.int64)[o], np.asarray(sv, np.float64)[o]))
    q_ref = ray.put((Q, SQ))

    def score(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # an empty block would make D 1-D and
            return pa.table({   # crash the matmul
                "qi": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
                "score": pa.array([], pa.int64()),
            })
        import pyarrow.compute as pc

        Qm, SQm = ray.get(q_ref)
        # Arrow-native extraction + vectorized sparse dot — the same
        # kernels as embed.retrieve (to_pylist would allocate a Python
        # float per vector element on the whole-collection scan)
        D = pc.list_flatten(batch.column("dense_embedding")) \
            .to_numpy(zero_copy_only=False).astype(np.float64) \
            .reshape(batch.num_rows, -1)
        d_cos = Qm @ D.T  # (nq, nb)
        flat_i = pc.list_flatten(batch.column("sparse_indices")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        flat_v = pc.list_flatten(batch.column("sparse_values")) \
            .to_numpy(zero_copy_only=False).astype(np.float64)
        counts = pc.list_value_length(batch.column("sparse_indices")) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        rows_rep = np.repeat(np.arange(batch.num_rows), counts)
        texts = np.asarray(batch.column("text").to_pylist(), dtype=object)
        # lexical rank of each text: the deterministic tie-break key
        # (block-local top-k must use the SAME total order the final
        # driver sort uses, or tie survivors depend on block splits)
        tcodes = np.unique(texts, return_inverse=True)[1]
        out = {"qi": [], "text": [], "score": []}
        for qi, (sidx, sval) in enumerate(SQm):
            s_dot = np.zeros(batch.num_rows, np.float64)
            if len(flat_i) and len(sidx):
                pos = np.minimum(np.searchsorted(sidx, flat_i),
                                 len(sidx) - 1)
                qw = np.where(sidx[pos] == flat_i, sval[pos], 0.0)
                np.add.at(s_dot, rows_rep, qw * flat_v)
            hybrid = dense_weight * d_cos[qi] + (1 - dense_weight) * s_dot
            e4 = np.floor(hybrid * 10000 + 0.5).astype(np.int64)
            top = np.lexsort((tcodes, -e4))[:k]
            for c in top:
                out["qi"].append(qi)
                out["text"].append(texts[c])
                out["score"].append(int(e4[c]))
        return pa.table({
            "qi": pa.array(out["qi"], pa.int64()),
            "text": pa.array(out["text"], pa.string()),
            "score": pa.array(out["score"], pa.int64()),
        })

    from mmore_ray.sources.readers import read_parquet_clean
    local = read_parquet_clean(collection_dir).map_batches(
        score, batch_format="pyarrow")
    # survivors ≤ k × blocks × nq — tiny
    hits = local.to_pandas()
    rows = []
    for qi, q_id in enumerate(q_ids):
        g = hits[hits.qi == qi].sort_values(
            ["score", "text"], ascending=[False, True]).head(k)
        context = format_docs(g["text"].tolist())
        full_prompt = prompt.format(context=context)
        answer = llm.generate(full_prompt, queries[q_id])
        rows.append({"query_id": q_id, "question": queries[q_id],
                     "answer": answer, "context": context,
                     "n_docs": len(g)})
    return pd.DataFrame(rows)
