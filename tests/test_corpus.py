"""Corpus generator invariants (FIXTURES.md F1)."""

import duckdb
import pyarrow.parquet as pq

from mmore_ray.functions.textfns import clean_str
from mmore_ray.sources.corpus import (
    GAZETTEER,
    MEGA_REPO,
    SENTENCE_BANK,
    corpus_sql,
    derive_corpus_batch,
    gazetteer_sql,
    synthesize_corpus,
)


def test_trie_regex_longest_match_with_prefix_overlaps():
    # beyond our non-substring invariant: prefix-overlapping surfaces
    # must still match longest-first
    import re

    from mmore_ray.stages.mentions import _trie_regex

    rx = re.compile(_trie_regex(["New York", "New York City", "New"]))
    assert rx.findall("in New York City and New Haven") == \
        ["New York City", "New"]
    rx2 = re.compile(_trie_regex(["AB", "ABC", "B"]))
    assert rx2.findall("xABCx") == ["ABC"]


def test_gazetteer_surfaces_pairwise_non_substring():
    # exact occurrence counting (Python and SQL) needs this invariant
    surfaces = [s for s, _, _ in GAZETTEER]
    for a in surfaces:
        for b in surfaces:
            if a != b:
                assert a not in b, (a, b)


def test_gazetteer_upper_is_cleaned():
    # parser node names are clean_str(surface.upper()); for gazetteer
    # surfaces that must equal plain .upper()
    for s, _, _ in GAZETTEER:
        assert clean_str(s.upper()) == s.upper()


def test_sentence_bank_sql_safe():
    for s in SENTENCE_BANK:
        assert "'" not in s


def test_corpus_text_has_no_accidental_gazetteer_hits():
    # word-salad text must not contain any surface, so gold mentions
    # come only from the embedded sentence
    table = synthesize_corpus(200, seed=7)
    contents = table.column("content").to_pylist()
    for content in contents:
        body = content.split("\n", 1)[-1] if content.startswith('"""') else content
        # strip the known sentence; remaining text should be surface-free
        for sent in SENTENCE_BANK:
            body = body.replace(sent, "")
        for s, _, _ in GAZETTEER:
            assert s not in body, (s, content[:80])


def test_synthesize_deterministic_and_skewed():
    a = synthesize_corpus(500, seed=42)
    b = synthesize_corpus(500, seed=42)
    assert a.equals(b)
    repos = a.column("repo").to_pylist()
    frac = sum(r == MEGA_REPO for r in repos) / len(repos)
    assert 0.25 < frac < 0.35  # deliberate mega-repo skew


def test_derivation_matches_sql_byte_for_byte():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    py = derive_corpus_batch(docs).to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", docs)
    sql = con.execute(corpus_sql() + " ORDER BY repo, path").df()
    for col in ["repo", "path", "commit", "lang", "content"]:
        assert (py[col] == sql[col]).all(), col
    assert con.execute(f"SELECT count(*) FROM {gazetteer_sql()}").fetchone()[0] == len(GAZETTEER)


def test_extract_regions_per_language():
    from mmore_ray.stages.code_regions import extract_regions

    py = '"""Doc line."""\n\ndef f(x):\n    # note about Paris\n    return x\n'
    got = extract_regions("python", py)
    assert ("docstring", "Doc line.") in got
    assert ("comment", "note about Paris") in got
    assert all(rt != "prose" for rt, _ in got)

    js = "/** Block doc */\nfunction f(x) {\n  // inline note\n  return x;\n}\n"
    got = extract_regions("javascript", js)
    assert ("docstring", "Block doc") in got
    assert ("comment", "inline note") in got

    md = "# Guide\n\nplain text\n"
    assert extract_regions("markdown", md) == [("prose", md)]
