"""Deterministic source-code corpus (the north-rule input table).

Input shape (authoritative, from BASELINE.json input_hint):
    (repo: string, path: string, commit: string, lang: string, content: string)

Two generation paths, both seeded and self-contained:

  * :func:`derive_corpus_batch` — a vectorizable ``map_batches`` kernel
    that derives the corpus deterministically from the driver-provided
    ``documents`` table (doc_id, text).  Each document becomes one
    source file whose docstring/comment embeds a known entity sentence
    from :data:`SENTENCE_BANK`, so gold mentions/triples per row are
    known at generation time (FIXTURES.md F1/F3).
  * :func:`synthesize_corpus` — standalone generator for arbitrary row
    counts (bench scale control), same templates, seeded word-salad
    text.

:func:`corpus_sql` renders the *identical* derivation as a DuckDB SQL
CTE from the same Python constants, so driver-side oracles can check
the whole KG pipeline value-for-value.  ~30% of rows land in a single
"mega-repo" to exercise skew handling (salted keys) downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# ---------------------------------------------------------------------------
# Entity gazetteer: (surface form, entity type, canonical kb_id).
# Surfaces are pairwise non-substring (asserted in tests) so exact
# occurrence counting is well-defined both in Python and in SQL.
# Two surfaces may share a kb_id (alias clusters → union-find work).
# Types follow the reference default set (ner/extractor.py:23).
# ---------------------------------------------------------------------------
GAZETTEER: list[tuple[str, str, str]] = [
    ("Barack Obama", "PERSON", "BARACK OBAMA"),
    ("President Obama", "PERSON", "BARACK OBAMA"),
    ("Google LLC", "ORGANIZATION", "GOOGLE LLC"),
    ("Alphabet Inc", "ORGANIZATION", "GOOGLE LLC"),
    ("Larry Page", "PERSON", "LARRY PAGE"),
    ("Sergey Brin", "PERSON", "SERGEY BRIN"),
    ("Eiffel Tower", "LOCATION", "EIFFEL TOWER"),
    ("Paris", "LOCATION", "PARIS"),
    ("France", "LOCATION", "FRANCE"),
    ("Honolulu", "LOCATION", "HONOLULU"),
    ("Hawaii", "LOCATION", "HAWAII"),
    ("SpaceX", "ORGANIZATION", "SPACEX"),
    ("Elon Musk", "PERSON", "ELON MUSK"),
    ("Amazon", "ORGANIZATION", "AMAZON"),
    ("Seattle", "LOCATION", "SEATTLE"),
    ("Tokyo", "LOCATION", "TOKYO"),
    ("Mountain View", "LOCATION", "MOUNTAIN VIEW"),
    ("California", "LOCATION", "CALIFORNIA"),
    ("August 4, 1961", "DATE", "AUGUST 4, 1961"),
    # Remaining surfaces of the reference NER gold corpus
    # (examples/sample_data/example_outputs_ner, 6 EN + 6 FR docs);
    # FR surfaces alias to the EN canonical where they co-refer.
    ("artificial intelligence", "EVENT", "ARTIFICIAL INTELLIGENCE"),
    ("March 15, 2024", "DATE", "MARCH 15, 2024"),
    ("New York", "LOCATION", "NEW YORK"),
    ("Cape Canaveral", "LOCATION", "CAPE CANAVERAL"),
    ("December 12, 2024", "DATE", "DECEMBER 12, 2024"),
    ("François Hollande", "PERSON", "FRANÇOIS HOLLANDE"),
    ("12 août 1954", "DATE", "12 AOÛT 1954"),
    ("Rouen", "LOCATION", "ROUEN"),
    ("Californie", "LOCATION", "CALIFORNIA"),
    ("tour Eiffel", "LOCATION", "EIFFEL TOWER"),
    ("intelligence artificielle", "EVENT", "ARTIFICIAL INTELLIGENCE"),
    ("15 mars 2024", "DATE", "MARCH 15, 2024"),
    ("Bernard Arnault", "PERSON", "BERNARD ARNAULT"),
    ("LVMH", "ORGANIZATION", "LVMH"),
    ("12 décembre 2024", "DATE", "DECEMBER 12, 2024"),
    ("La Poste", "ORGANIZATION", "LA POSTE"),
    ("Marseille", "LOCATION", "MARSEILLE"),
    ("Biarritz", "LOCATION", "BIARRITZ"),
]

# Sentences embedded into file docstrings/comments; doc_id % len(bank)
# picks the sentence.  The first three mirror the reference's NER gold
# corpus texts (examples/sample_data/example_outputs_ner).  No
# apostrophes (they are inlined into SQL literals).
SENTENCE_BANK: list[str] = [
    "Barack Obama was born on August 4, 1961, in Honolulu, Hawaii.",
    "Google LLC, headquartered in Mountain View, California, was founded by Larry Page and Sergey Brin.",
    "The Eiffel Tower, located in Paris, France, attracts millions of tourists every year.",
    "SpaceX was founded by Elon Musk.",
    "Amazon opened a new office in Seattle.",
    "President Obama visited Tokyo.",
    "Alphabet Inc announced a partnership with SpaceX.",
    "Larry Page met Elon Musk in California.",
]

LANGS = ["python", "javascript", "markdown", "text"]

MEGA_REPO = "megacorp/monorepo"

# Relationship predicate emitted for in-document entity co-occurrence.
CO_OCCURS_PRED = "CO_OCCURS"


def _lang_for(doc_id: int) -> str:
    return LANGS[doc_id % 4]


def _repo_for(doc_id: int) -> str:
    if doc_id % 10 < 3:
        return MEGA_REPO
    return f"org{doc_id % 7}/repo{doc_id % 13}"


def _path_for(doc_id: int, lang: str) -> str:
    if lang == "python":
        return f"src/pkg/mod_{doc_id}.py"
    if lang == "javascript":
        return f"lib/util_{doc_id}.js"
    if lang == "markdown":
        return f"docs/guide_{doc_id}.md"
    return f"notes/note_{doc_id}.txt"


def _commit_for(repo: str, doc_id: int) -> str:
    return hashlib.sha256(f"commit:{repo}:{doc_id}".encode()).hexdigest()[:40]


def _content_for(doc_id: int, text: str, lang: str) -> str:
    sent = SENTENCE_BANK[doc_id % len(SENTENCE_BANK)]
    if lang == "python":
        return (
            f'"""{sent}"""\n\ndef handler_{doc_id}(x):\n    # {text}\n    return x\n'
        )
    if lang == "javascript":
        return (
            f"/** {sent} */\nfunction handler_{doc_id}(x) {{\n  // {text}\n  return x;\n}}\n"
        )
    if lang == "markdown":
        return f"# Guide {doc_id}\n\n{sent}\n\n{text}\n"
    return f"{sent}\n\n{text}\n"


def derive_corpus_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` kernel: (doc_id, text) → corpus rows.

    Per-row string templating; each op is C-speed, no model state, so a
    stateless task stage is right.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    repo, path, commit, lang, content = [], [], [], [], []
    for doc_id, text in zip(doc_ids, texts):
        lg = _lang_for(doc_id)
        rp = _repo_for(doc_id)
        repo.append(rp)
        path.append(_path_for(doc_id, lg))
        commit.append(_commit_for(rp, doc_id))
        lang.append(lg)
        content.append(_content_for(doc_id, text, lg))
    return pa.table(
        {
            "repo": pa.array(repo, pa.string()),
            "path": pa.array(path, pa.string()),
            "commit": pa.array(commit, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "content": pa.array(content, pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# SQL rendering of the SAME derivation (DuckDB oracle side).
# ---------------------------------------------------------------------------

def _sql_quote(s: str) -> str:
    assert "'" not in s, "keep SQL-literal strings apostrophe-free"
    return "'" + s + "'"


def corpus_sql(documents_rel: str = "documents") -> str:
    """DuckDB SELECT producing rows byte-identical to the Ray derivation."""
    # modulus derived from the bank, not hardcoded: the Python side
    # picks sentences mod len(SENTENCE_BANK), so growing the bank must
    # move BOTH sides or every byte-identity check fails far from here
    bank_case = f"CASE doc_id % {len(SENTENCE_BANK)} " + " ".join(
        f"WHEN {i} THEN {_sql_quote(s)}" for i, s in enumerate(SENTENCE_BANK)
    ) + " END"
    did = "CAST(doc_id AS VARCHAR)"
    lang_case = (
        "CASE doc_id % 4 WHEN 0 THEN 'python' WHEN 1 THEN 'javascript' "
        "WHEN 2 THEN 'markdown' ELSE 'text' END"
    )
    repo_expr = (
        f"CASE WHEN doc_id % 10 < 3 THEN '{MEGA_REPO}' "
        f"ELSE 'org' || CAST(doc_id % 7 AS VARCHAR) || '/repo' || CAST(doc_id % 13 AS VARCHAR) END"
    )
    path_case = (
        f"CASE doc_id % 4 WHEN 0 THEN 'src/pkg/mod_' || {did} || '.py' "
        f"WHEN 1 THEN 'lib/util_' || {did} || '.js' "
        f"WHEN 2 THEN 'docs/guide_' || {did} || '.md' "
        f"ELSE 'notes/note_' || {did} || '.txt' END"
    )
    nl = "chr(10)"
    q = _sql_quote
    content_case = f"""CASE doc_id % 4
      WHEN 0 THEN '\"\"\"' || sent || '\"\"\"' || {nl} || {nl} || 'def handler_' || {did} || '(x):' || {nl} || '    # ' || text || {nl} || '    return x' || {nl}
      WHEN 1 THEN '/** ' || sent || ' */' || {nl} || 'function handler_' || {did} || '(x) {{' || {nl} || '  // ' || text || {nl} || '  return x;' || {nl} || '}}' || {nl}
      WHEN 2 THEN {q('# Guide ')} || {did} || {nl} || {nl} || sent || {nl} || {nl} || text || {nl}
      ELSE sent || {nl} || {nl} || text || {nl}
    END"""
    return f"""
    SELECT repo,
           path,
           substr(sha256('commit:' || repo || ':' || {did}), 1, 40) AS commit,
           lang,
           {content_case} AS content
    FROM (
      SELECT doc_id, text,
             {repo_expr} AS repo,
             {path_case} AS path,
             {lang_case} AS lang,
             {bank_case} AS sent
      FROM {documents_rel}
    )
    """


def gazetteer_sql() -> str:
    """Inline VALUES relation (surface, entity_type, kb_id)."""
    rows = ", ".join(
        f"({_sql_quote(s)}, {_sql_quote(t)}, {_sql_quote(k)})" for s, t, k in GAZETTEER
    )
    return f"(VALUES {rows}) AS g(surface, entity_type, kb_id)"


# ---------------------------------------------------------------------------
# Standalone synthesizer (bench scale control; no external data).
# ---------------------------------------------------------------------------

_VOCAB = (
    "the fast key order sort table scan merge part window small hash join "
    "batch spark group query row data slow filter customer line value big "
    "stream agg column vector a"
).split()


def synthesize_corpus(n_rows: int, seed: int = 42) -> pa.Table:
    """Seeded corpus of ``n_rows`` files with the same templates/gold."""
    rng = np.random.default_rng(seed)
    lengths = rng.integers(20, 80, size=n_rows)
    vocab = np.array(_VOCAB)
    out = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for doc_id in range(n_rows):
        words = vocab[rng.integers(0, len(vocab), size=lengths[doc_id])]
        text = " ".join(words.tolist())
        lg = _lang_for(doc_id)
        rp = _repo_for(doc_id)
        out["repo"].append(rp)
        out["path"].append(_path_for(doc_id, lg))
        out["commit"].append(_commit_for(rp, doc_id))
        out["lang"].append(lg)
        out["content"].append(_content_for(doc_id, text, lg))
    return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})
