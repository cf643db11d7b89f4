"""Model-provider registry — the ONE seam where real GPU/HF models drop
into the engine's actor-pool stages without touching pipeline code.

Reference parity: the reference constructs its heavy models at fixed
name-table sites — marker-pdf model dict (``pdf_processor.py:71``),
Whisper ASR pipelines per device (``media_processor.py:31-61,107``),
dense embedders by name table (``rag/model/dense/base.py:14-41,69-84``),
SPLADE (``rag/model/sparse/splade.py:18-36``), the BGE cross-encoder
reranker (``rag/retriever.py:88-106``).  This module is the engine's
equivalent of those tables, with two rules:

* providers are CLASSES (actor-pool constructors): weights load in
  ``__init__`` — once per actor — and ``__call__`` is the per-batch
  contract the pipelines already use, so
  ``map_batches(provider_class(role), concurrency=N)`` is the whole
  integration;
* heavy imports happen INSIDE ``__init__``, so this module imports
  cleanly where the library is absent and asking for an unavailable
  provider fails at construction with the missing library's name.

Resolution order: explicit ``name`` argument → ``MMORE_RAY_<ROLE>``
environment variable → the registered default (the deterministic fake —
the reference's own tests run on fakes the same way,
``tests/conftest.py:15-22`` FakeEmbeddings / FakeSparseEmbedding).

Availability is gated, not assumed: ``tests/test_model_provider.py``
mirrors the reference's ``--gpu`` opt-in (``tests/conftest.py:74-88``) —
real-model tests run only where the library imports.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa

_REGISTRY: dict[str, dict[str, type]] = {}
_DEFAULT: dict[str, str] = {}


def register(role: str, name: str, cls: type, *, default: bool = False) -> None:
    """Register a provider class for a role (user-extension surface —
    same shape as the reference's FILTERS_MAP / TAGGERS_LOADERS_MAP
    registries)."""
    _REGISTRY.setdefault(role, {})[name] = cls
    if default or role not in _DEFAULT:
        _DEFAULT[role] = name


def provider_class(role: str, name: str | None = None) -> type:
    """Resolve a provider class: ``name`` → ``MMORE_RAY_<ROLE>`` env →
    registered default.  The returned class is what pipelines hand to
    ``map_batches(cls, fn_constructor_kwargs=..., concurrency=...)``."""
    if role not in _REGISTRY:
        raise KeyError(f"unknown model role {role!r}; "
                       f"registered: {sorted(_REGISTRY)}")
    chosen = (name
              or os.environ.get(f"MMORE_RAY_{role.upper()}")
              or _DEFAULT[role])
    table = _REGISTRY[role]
    if chosen not in table:
        raise KeyError(f"unknown {role} provider {chosen!r}; "
                       f"registered: {sorted(table)}")
    return table[chosen]


_INSTANCES: dict[tuple[str, str], Any] = {}


def get_instance(role: str, name: str | None = None, **kwargs) -> Any:
    """A per-process singleton provider instance (no-kwargs path only —
    custom kwargs always construct fresh).  Driver-side query paths
    (``retrieve``/``RetrieverSession``) go through this so a real
    checkpoint loads once per process, not once per query; actor pools
    keep constructing per actor via :func:`provider_class`."""
    cls = provider_class(role, name)
    if kwargs:
        return cls(**kwargs)
    key = (role, cls.__qualname__)
    inst = _INSTANCES.get(key)
    if inst is None:
        inst = _INSTANCES[key] = cls()
    return inst


def available(role: str, name: str) -> bool:
    """True iff the provider's heavy dependency imports (cheap probe
    used by the gated tests; never imports weights)."""
    cls = _REGISTRY[role][name]
    dep = getattr(cls, "REQUIRES", None)
    if not dep:
        return True
    import importlib.util

    return importlib.util.find_spec(dep) is not None


# ---------------------------------------------------------------------------
# Real-model provider classes (lazy heavy imports in __init__)
# ---------------------------------------------------------------------------

class SentenceTransformerEmbedder:
    """Dense embedder over a real sentence-transformers checkpoint
    (reference ``rag/model/dense/base.py:69-84``).  Same ``__call__`` /
    ``embed_one`` contract as ``embed.FakeDenseEmbedder`` — swap the
    provider name, touch nothing else."""

    REQUIRES = "sentence_transformers"

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 device: str | None = None):
        from sentence_transformers import SentenceTransformer

        self._model = SentenceTransformer(model_name, device=device)

    def embed_one(self, text: str) -> np.ndarray:
        return self._model.encode([text], normalize_embeddings=True)[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = self._model.encode(batch.column("text").to_pylist(),
                                  normalize_embeddings=True)
        return batch.append_column(
            "dense_embedding",
            pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())))


class SpladeSparseEmbedder:
    """SPLADE sparse embedder (reference ``rag/model/sparse/
    splade.py:18-36``): MLM logits → log1p(relu) → max-pool over
    tokens, top-k indices/values.  Same output columns as
    ``embed.FakeSparseEmbedder``."""

    REQUIRES = "transformers"

    def __init__(self, model_name: str = "naver/splade-v3", top_k: int = 64,
                 device: str | None = None):
        import torch
        from transformers import AutoModelForMaskedLM, AutoTokenizer

        self._torch = torch
        self._tok = AutoTokenizer.from_pretrained(model_name)
        self._model = AutoModelForMaskedLM.from_pretrained(model_name)
        self._device = device
        if device:
            self._model = self._model.to(device)
        self._k = top_k

    def embed_one(self, text: str) -> tuple[list[int], list[float]]:
        torch = self._torch
        with torch.no_grad():
            enc = self._tok(text, return_tensors="pt", truncation=True)
            if self._device:  # inputs must live where the model lives
                enc = {k: v.to(self._device) for k, v in enc.items()}
            logits = self._model(**enc).logits[0]
            w = torch.max(torch.log1p(torch.relu(logits)), dim=0).values
            top = torch.topk(w, k=min(self._k, w.numel()))
            keep = top.values > 0
        return (top.indices[keep].tolist(),
                [float(v) for v in top.values[keep]])

    def __call__(self, batch: pa.Table) -> pa.Table:
        idxs, vals = [], []
        for t in batch.column("text").to_pylist():
            i, v = self.embed_one(t)
            idxs.append(i)
            vals.append(v)
        batch = batch.append_column(
            "sparse_indices", pa.array(idxs, pa.list_(pa.int64())))
        return batch.append_column(
            "sparse_values", pa.array(vals, pa.list_(pa.float64())))


class CrossEncoderReranker:
    """Real cross-encoder reranker (reference BGE reranker,
    ``rag/retriever.py:88-106``, batch scoring ``:281-322``).  Same
    constructor/``__call__`` contract as ``embed.FakeReranker``."""

    REQUIRES = "sentence_transformers"
    BATCH = 32  # reference scoring batch

    def __init__(self, query_text: str = "",
                 model_name: str = "BAAI/bge-reranker-base",
                 device: str | None = None):
        from sentence_transformers import CrossEncoder

        self._model = CrossEncoder(model_name, device=device)
        self._q = query_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        pairs = [(self._q, t) for t in batch.column("text").to_pylist()]
        scores = [float(s) for s in self._model.predict(pairs)]
        return batch.append_column("rerank_score",
                                   pa.array(scores, pa.float64()))


class MarkerPdfParser:
    """Full-fidelity PDF parse via marker-pdf (reference
    ``pdf_processor.py:36-68,71`` — model dict loaded once per actor,
    exactly this ``__init__``).  ``parse_one`` returns the same dict
    shape as ``processors.PDFProcessor.parse`` so the processor's
    full-path slot consumes it unchanged."""

    REQUIRES = "marker"

    def __init__(self, device: str | None = None):
        from marker.converters.pdf import PdfConverter
        from marker.models import create_model_dict

        self._converter = PdfConverter(
            artifact_dict=create_model_dict(device=device))

    def parse_one(self, file_name: str, payload: bytes) -> dict:
        import os
        import tempfile

        # marker's converter takes a FILE PATH (the reference calls
        # converter(str(file_path)), pdf_processor.py:100) — spool the
        # payload to a temp file for the conversion
        fd, tmp = tempfile.mkstemp(suffix=".pdf")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(payload)
            rendered = self._converter(tmp)
        finally:
            os.unlink(tmp)
        # the ProcessorBase.parse contract (text + modalities [+ metadata])
        return {"text": rendered.markdown, "modalities": []}


class MiniPdfParser:
    """Default PDF provider: the engine's stdlib text-layer fast path
    (``sources/pdfmini.py`` via ``PDFProcessor.parse_fast`` — the
    reference's ``process_fast`` analogue, pdf_processor.py:258).  No
    heavy dependencies; marker swaps in as ``pdf_parser="marker"`` /
    ``MMORE_RAY_PDF_PARSER=marker``."""

    def parse_one(self, file_name: str, payload: bytes) -> dict:
        from .stages.processors import PDFProcessor

        return PDFProcessor.parse_fast(file_name, payload)


class WhisperTranscriber:
    """ASR via a transformers Whisper pipeline (reference
    ``media_processor.py:31-61`` — pipeline cached per device, loaded
    once per actor).  ``transcribe`` matches the fake
    ``processors.AsrTranscriber`` contract."""

    REQUIRES = "transformers"

    def __init__(self, model_name: str = "openai/whisper-base",
                 device: str | None = None):
        from transformers import pipeline

        self._asr = pipeline("automatic-speech-recognition",
                             model=model_name, device=device)

    def transcribe(self, audio: Any) -> str:
        return self._asr(audio)["text"]


def _hf_ner_scanner() -> type:
    # MentionScanner import deferred: models.py must import before the
    # stages package in user code paths
    from .stages.mentions import MentionScanner

    class HFNERScanner(MentionScanner):
        """Model-backed mention scanner: a transformers
        token-classification pipeline replaces the gazetteer regex as
        the DETECTOR; everything downstream — graph build, clique cap,
        mention/edge row schema, the fused sha256 lineage pass — is
        inherited from ``MentionScanner`` unchanged (``_rows``).
        Reference ``ner/extractor.py:36-53`` shape: model in
        ``__init__``, once per actor."""

        REQUIRES = "transformers"

        def __init__(self, model_name: str = "dslim/bert-base-NER",
                     device: str | None = None,
                     max_clique: int = MentionScanner.DEFAULT_MAX_CLIQUE):
            from transformers import pipeline

            super().__init__(gazetteer=[], max_clique=max_clique)
            self._ner = pipeline("token-classification", model=model_name,
                                 aggregation_strategy="simple",
                                 device=device)

        #: character window / overlap for long documents: BERT-family
        #: NER models cap at 512 tokens, so the pipeline is fed
        #: overlapping windows and entity offsets are rebased — without
        #: this any real document past the model limit crashes the run
        WINDOW_CHARS = 2000
        OVERLAP_CHARS = 200

        def _scan(self, content: str):
            if not content:
                return [], []
            from .functions.textfns import clean_str

            counts: dict[str, list[int]] = {}
            order: list[str] = []
            pos, n = 0, len(content)
            prev_end = 0  # previous window's global end (0 = none)
            while pos < n:
                end = min(pos + self.WINDOW_CHARS, n)
                chunk = content[pos:end]
                for ent in self._ner(chunk):
                    # accept an entity from its FIRST fully-containing
                    # window: fully inside this window (a cut-touching
                    # detection may be a truncated fragment — the next
                    # window, which starts OVERLAP_CHARS earlier,
                    # re-detects it whole) AND extending past the
                    # previous window (else the previous window already
                    # counted it — and a leading FRAGMENT of an entity
                    # cut by this window's start would otherwise be
                    # re-counted at a new offset as a phantom mention).
                    # Entities longer than OVERLAP_CHARS that straddle a
                    # cut fit no window and are dropped — size OVERLAP
                    # to the longest expected surface.
                    g_start = pos + int(ent["start"])
                    g_end = pos + int(ent["end"])
                    if end < n and g_end >= end:
                        continue  # may be end-truncated
                    if prev_end and g_end <= prev_end:
                        continue  # previous window's territory
                    s, t = str(ent["word"]), str(ent["entity_group"])
                    slot = counts.get(s)
                    if slot is None:
                        counts[s] = [1, g_start]
                        order.append(s)
                        self._type_of[s] = t
                        self._entity_of[s] = (
                            str(clean_str(s.upper())),
                            str(clean_str(t.upper())),
                            str(clean_str(f"MENTION OF {s.upper()}")))
                    else:
                        slot[0] += 1
                if end >= n:
                    break
                prev_end = end
                pos = end - self.OVERLAP_CHARS
            return self._rows([(s, self._type_of[s]) for s in order], counts)

    return HFNERScanner


# ---------------------------------------------------------------------------
# Chat / text-generation role (reference ``rag/llm.py``)
# ---------------------------------------------------------------------------

#: reference name tables (``rag/llm.py:25-87``): the provider of a chat
#: model is inferred from its name, falling back to HF for local
#: checkpoints.  The API-backed providers themselves are out of scope
#: here (network clients — this engine runs offline); the inference and
#: generation-kwarg mapping are pure logic and keep config parity, so a
#: reference YAML names the same provider under both systems.
_OPENAI_MODELS = frozenset({
    "gpt-5.4", "gpt-5.4-mini", "gpt-5.4-nano", "gpt-5.2", "gpt-5",
    "gpt-5-mini", "gpt-4", "gpt-4-turbo", "gpt-4o", "gpt-4o-mini",
    "gpt-4.1", "o3", "o3-mini", "o4-mini", "gpt-3.5-turbo",
})
_ANTHROPIC_MODELS = frozenset({
    "claude-opus-4-6", "claude-sonnet-4-6", "claude-haiku-4-5",
    "claude-3-5-sonnet", "claude-3-5-haiku", "claude-3-opus",
    "claude-3-sonnet", "claude-3-haiku",
})
_MISTRAL_MODELS = frozenset({
    "mistral-small-4", "mistral-large-3", "mistral-medium-3.1",
    "mistral-small-3.2", "ministral-3-14b", "ministral-3-8b",
    "ministral-3-3b", "codestral", "codestral-latest",
    "mistral-small-latest", "mistral-medium-latest",
    "mistral-large-latest",
})
_COHERE_MODELS = frozenset({
    "command-a-03-2025", "command-a-translate-08-2025",
    "command-a-reasoning-08-2025", "command-a-vision-07-2025",
    "command-r7b-12-2024", "command-r-08-2024",
    "command-r-plus-08-2024",
})


def infer_llm_provider(llm_name: str,
                       base_url: str | None = None) -> str | None:
    """Provider inference (``rag/llm.py:106-128`` LLMConfig.__post_init__):
    name tables first, then HF for local names WITHOUT a base_url; a
    base_url with an unknown name means a self-hosted OpenAI-compatible
    endpoint (provider None, reference's vLLM example)."""
    if llm_name in _OPENAI_MODELS:
        return "OPENAI"
    if llm_name in _ANTHROPIC_MODELS:
        return "ANTHROPIC"
    if llm_name in _MISTRAL_MODELS:
        return "MISTRAL"
    if llm_name in _COHERE_MODELS:
        return "COHERE"
    return "HF" if base_url is None else None


def llm_generation_kwargs(provider: str | None, temperature: float = 0.7,
                          max_new_tokens: int | None = None) -> dict:
    """Per-provider generation-kwarg spelling
    (``rag/llm.py:130-138`` LLMConfig.generation_kwargs)."""
    if provider in ("MISTRAL", "ANTHROPIC", "COHERE"):
        key = "max_tokens"
    elif provider == "HF":
        key = "max_new_tokens"
    else:
        key = "max_completion_tokens"
    return {"temperature": temperature, key: max_new_tokens}


class HFChatGenerator:
    """Local text-generation chat model (reference ``rag/llm.py:183-214``:
    ``HuggingFacePipeline.from_model_id(task='text-generation')`` wrapped
    as a chat model).  Same ``generate(prompt, question)`` contract as
    the deterministic default (``pipelines/rag.py`` FakeChatLLM), so
    ``MMORE_RAY_LLM=hf`` swaps a real generative answer stage into
    ``rag_answer`` with zero pipeline change.  Deterministic by default
    (greedy decoding) — set ``temperature`` to sample."""

    REQUIRES = "transformers"

    def __init__(self, model_name: str = "Qwen/Qwen2.5-0.5B-Instruct",
                 max_new_tokens: int = 256,
                 temperature: float | None = None,
                 device: str | None = None):
        from transformers import pipeline

        kwargs = llm_generation_kwargs("HF", temperature or 0.0,
                                       max_new_tokens)
        if not temperature:  # None OR 0.0: greedy, reproducible —
            # transformers rejects do_sample with temperature=0
            kwargs.pop("temperature")
            kwargs["do_sample"] = False
        else:
            # transformers defaults do_sample=False and silently
            # ignores temperature without this
            kwargs["do_sample"] = True
        self._gen = pipeline("text-generation", model=model_name,
                             device=device, return_full_text=False,
                             **kwargs)

    def generate(self, prompt: str, question: str) -> str:
        msgs = [{"role": "system", "content": prompt},
                {"role": "user", "content": question}]
        out = self._gen(msgs)[0]["generated_text"]
        if isinstance(out, list):  # chat-format pipelines return turns
            out = out[-1]["content"]
        return str(out).strip()


def _synthetic_openvocab_scanner() -> type:
    from .stages.mentions import MentionScanner

    class SyntheticOpenVocabScanner(MentionScanner):
        """Deterministic OPEN-VOCABULARY scanner for scale validation:
        emits ``mentions_per_doc`` surfaces unique to each document
        (derived from the content sha1), so distinct triples grow
        linearly with the corpus — the adversarial shape for any
        vocabulary-bounded assumption in the rollup / sort-boundary
        paths (``pipelines/kg.py``).  No heavy dependencies; swaps in
        via ``MMORE_RAY_MENTION_SCANNER=synthetic-openvocab`` exactly
        like ``hf-ner``, so stress tests exercise the REAL provider
        seam."""

        def __init__(self, mentions_per_doc: int = 8,
                     max_clique: int = MentionScanner.DEFAULT_MAX_CLIQUE):
            super().__init__(gazetteer=[], max_clique=max_clique)
            self._k = mentions_per_doc

        def _scan(self, content: str):
            if not content:
                return [], []
            import hashlib

            from .functions.textfns import clean_str

            tag = hashlib.sha1(
                content.encode("utf-8")).hexdigest()[:12].upper()
            found: list[tuple[str, str]] = []
            counts: dict[str, list[int]] = {}
            for i in range(self._k):
                s = f"SYN {tag} {i:02d}"
                counts[s] = [1, i]
                self._type_of[s] = "SYNTH"
                self._entity_of[s] = (str(clean_str(s)), "SYNTH",
                                      str(clean_str(f"MENTION OF {s}")))
                found.append((s, "SYNTH"))
            rows = self._rows(found, counts)
            # per-doc vocabulary is unique to the doc — drop it after
            # the rows are built so actor memory stays bounded by a
            # batch, not by the corpus
            for s, _ in found:
                del self._type_of[s]
                del self._entity_of[s]
            return rows

    return SyntheticOpenVocabScanner


def _register_builtins() -> None:
    from .stages.embed import (FakeDenseEmbedder, FakeReranker,
                               FakeSparseEmbedder)
    from .stages.mentions import MentionScanner
    from .stages.multimodal import AsrTranscriber

    register("dense_embedder", "fake", FakeDenseEmbedder, default=True)
    register("dense_embedder", "sentence-transformers",
             SentenceTransformerEmbedder)
    register("sparse_embedder", "fake", FakeSparseEmbedder, default=True)
    register("sparse_embedder", "splade", SpladeSparseEmbedder)
    register("reranker", "fake", FakeReranker, default=True)
    register("reranker", "cross-encoder", CrossEncoderReranker)
    register("mention_scanner", "gazetteer", MentionScanner, default=True)
    register("mention_scanner", "hf-ner", _hf_ner_scanner())
    register("mention_scanner", "synthetic-openvocab",
             _synthetic_openvocab_scanner())
    # defaults are always constructible in this env; the heavy
    # providers opt in by name / env var (consumed by
    # stages/processors.py PDFProcessor.parse and MediaProcessor.parse)
    register("pdf_parser", "mini", MiniPdfParser, default=True)
    register("pdf_parser", "marker", MarkerPdfParser)
    register("asr", "fake", AsrTranscriber, default=True)
    register("asr", "whisper", WhisperTranscriber)
    from .pipelines.rag import FakeChatLLM

    register("llm", "fake", FakeChatLLM, default=True)
    register("llm", "hf", HFChatGenerator)


_register_builtins()
