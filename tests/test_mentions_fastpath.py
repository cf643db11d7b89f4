"""The closed-form graph construction in MentionScanner._graph_of must
be observationally identical to the render→parse roundtrip it replaces
(mentions.py fast path), and the per-batch scan memo must not change
output on duplicate-content batches."""

import random

import pyarrow as pa

from mmore_ray.sources.corpus import GAZETTEER
from mmore_ray.stages.mentions import (
    MentionScanner,
    render_records,
)
from mmore_ray.stages.parser import parse_extraction


def _graphs_equal(a, b):
    assert a.nodes == b.nodes
    assert a.edges == b.edges


def test_fastpath_matches_render_parse_randomized():
    rng = random.Random(7)
    sc = MentionScanner()
    surfaces = sorted(sc._type_of)
    for _ in range(200):
        k = rng.randint(0, 8)
        found = [(s, sc._type_of[s])
                 for s in rng.sample(surfaces, min(k, len(surfaces)))]
        fast = sc._graph_of(found)
        slow = parse_extraction(render_records(found))
        _graphs_equal(fast, slow)


def test_fastpath_handles_colliding_cleaned_names():
    # two surfaces that clean/uppercase to the SAME entity name exercise
    # the duplicate-entity merge and the self-loop edge the parser makes
    gaz = [("Paris", "LOCATION", "PARIS"), ("paris", "CITY", "PARIS")]
    sc = MentionScanner(gazetteer=gaz)
    found = [("Paris", "LOCATION"), ("paris", "CITY")]
    fast = sc._graph_of(found)
    slow = parse_extraction(render_records(found))
    _graphs_equal(fast, slow)


def test_delimiter_surface_dropped_not_crashed():
    # a surface containing a delimiter cannot round-trip the extraction
    # record format — it is DROPPED (warned), never a KeyError mid-scan
    gaz = [("a<|>b", "ORGANIZATION", "AB"), ("Paris", "LOCATION", "PARIS"),
           ("x##y", "LOCATION", "XY")]
    sc = MentionScanner(gazetteer=gaz)
    mentions, _ = sc._scan("a<|>b went to Paris via x##y")
    assert [m["surface"] for m in mentions] == ["Paris"]


def test_fastpath_disabled_when_type_contains_delimiter():
    # TYPES can still carry delimiters — that perturbs record
    # tokenization, so the render+parse roundtrip stays in force
    gaz = [("Paris", "LOC<|>X", "PARIS")]
    sc = MentionScanner(gazetteer=gaz)
    assert not sc._fastpath


def test_prefix_surfaces_counted_at_shared_start():
    # the trie yields the longest match; prefix surfaces must still be
    # credited at the shared start (SQL replace-formula parity)
    sc = MentionScanner(gazetteer=[("Ray", "T", "K1"),
                                   ("RayCluster", "T", "K2")])
    m, _ = sc._scan("use RayCluster and Ray here")
    got = {r["surface"]: (r["n_occ"], r["first_pos"]) for r in m}
    assert got == {"RayCluster": (1, 5), "Ray": (2, 5)}


def test_scan_memo_identical_on_duplicate_content():
    sc = MentionScanner()
    text = "Barack Obama visited Paris with Elon Musk."
    batch = pa.table({
        "repo": ["r"] * 4,
        "path": [f"p{i}" for i in range(4)],
        "commit": ["c"] * 4,
        "lang": ["python"] * 4,
        "content": [text, "no entities here", text, text],
    })
    out = sc(batch)
    m = out.column("mentions").to_pylist()
    e = out.column("edges").to_pylist()
    assert m[0] == m[2] == m[3] and m[0]  # memo rows identical, non-empty
    assert e[0] == e[2] == e[3]
    assert m[1] == [] and e[1] == []
    # memo off-path sanity: a fresh scanner scanning row-by-row agrees
    ref = MentionScanner()
    for i, content in enumerate([text, "no entities here", text, text]):
        mm, ee = ref._scan(content)
        assert mm == m[i] and ee == e[i]


def test_default_gazetteer_surfaces_delimiter_free():
    # precondition for the fast path being on by default
    for s, _, _ in GAZETTEER:
        assert "<|>" not in s and "##" not in s


def test_review_fixes_scanner_edge_cases():
    """Regression bundle: clean_str-altered surfaces, null content,
    deterministic type tie-break, delimiter-in-type fastpath gate,
    empty surfaces, and overlapping-surface counting."""
    # 1. a surface clean_str alters (HTML entity) must not crash the
    #    scan, and entity_key must equal the PARSER-CLEANED node key
    sc = MentionScanner(gazetteer=[("AT&amp;T", "ORGANIZATION", "KB1")])
    m, e = sc._scan("call AT&amp;T today")
    assert m[0]["entity_key"] == "AT&T"
    assert m[0]["entity_type"] == "ORGANIZATION"

    # 2. null content row survives the batch path
    batch = pa.table({
        "repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["py"],
        "content": pa.array([None], pa.string()),
    })
    out = MentionScanner()(batch)
    assert out.column("mentions").to_pylist() == [[]]

    # 3. duplicate surface, conflicting types: FIRST gazetteer entry
    #    wins, independent of hash seed / set order
    sc = MentionScanner(gazetteer=[("Paris", "LOCATION", "K1"),
                                   ("Paris", "PERSON", "K2")])
    m, _ = sc._scan("in Paris")
    assert m[0]["entity_type"] == "LOCATION"

    # 4. a delimiter in a TYPE must disable the fast path so both code
    #    paths parse identically
    sc = MentionScanner(gazetteer=[("Paris", "LOC<|>X", "K")])
    assert not sc._fastpath
    m, _ = sc._scan("Paris")
    assert m[0]["entity_type"] == "LOC"  # parsed, not raw

    # 5. empty surfaces are dropped instead of matching everywhere
    sc = MentionScanner(gazetteer=[("", "LOCATION", "K"),
                                   ("Paris", "LOCATION", "K")])
    m, _ = sc._scan("go Paris")
    assert [x["surface"] for x in m] == ["Paris"]

    # 6. surfaces overlapping a preceding match still count (SQL
    #    occurrence parity): 'AB' and 'BC' in 'ABC' -> both found
    sc = MentionScanner(gazetteer=[("AB", "X", "K"), ("BC", "X", "K")])
    m, _ = sc._scan("ABC")
    assert sorted(x["surface"] for x in m) == ["AB", "BC"]

    # 6b. but SELF-overlapping occurrences of one surface count
    #     NON-overlapping, matching the oracle's replace-based n_occ:
    #     'neon' in 'neoneon' is ONE occurrence, 'neonneon' is two
    sc = MentionScanner(gazetteer=[("neon", "X", "K")])
    m, _ = sc._scan("neoneon")
    assert m[0]["n_occ"] == 1
    m, _ = sc._scan("neonneon")
    assert m[0]["n_occ"] == 2


def test_gazetteer_scale_trie_and_clique_cap():
    """The two at-scale properties of the scanner: (a) trie matching
    cost is bounded by trie depth, not dictionary size — a 30k-surface
    gazetteer must still scan at tens of MB/s; (b) co-occurrence edges
    are capped at DEFAULT_MAX_CLIQUE distinct surfaces (the per-doc
    relationship set is a clique — one dense doc would otherwise
    explode into O(k²) edge rows), while mention rows are never
    capped."""
    import random
    import time

    rng = random.Random(7)
    words = [f"w{rng.randrange(10**6):06d}" for _ in range(60000)]
    surfaces = sorted({f"Ent{a.capitalize()} {b.capitalize()}"
                       for a, b in zip(words[::2], words[1::2])})
    sc = MentionScanner(
        gazetteer=[(s, "ORGANIZATION", f"KB{i}")
                   for i, s in enumerate(surfaces)])
    assert len(surfaces) > 25000

    doc = " ".join(rng.choice(surfaces) if i % 40 == 0 else f"tok{i}"
                   for i in range(20000))
    t0 = time.perf_counter()
    m, e = sc._scan(doc)
    dt = time.perf_counter() - t0
    distinct = len(m)
    assert distinct > MentionScanner.DEFAULT_MAX_CLIQUE  # dense doc
    cap = MentionScanner.DEFAULT_MAX_CLIQUE
    assert len(e) == cap * (cap - 1) // 2  # capped clique
    # generous wall bound (noisy host): the capped scan of a ~170 KB
    # doc against 25k+ surfaces must stay well under a second
    assert dt < 2.0, dt

    # sparse doc (the realistic case): cap is a no-op
    doc2 = " ".join(rng.choice(surfaces[:3]) if i % 500 == 0 else f"t{i}"
                    for i in range(5000))
    m2, e2 = sc._scan(doc2)
    assert len(m2) == 3 and len(e2) == 3


def test_re2_prefilter_equality_and_adaptive_disable():
    """The Arrow/re2 presence pre-filter must be invisible in results
    (mixed corpus: entity-free docs skip the Python scan, matching docs
    don't) and must switch itself off on match-heavy corpora."""
    import pyarrow as pa

    from mmore_ray.sources.corpus import GAZETTEER
    from mmore_ray.stages.mentions import MentionScanner

    surf = GAZETTEER[0][0]
    texts = [f"mentions {surf} here" if i % 3 == 0 else f"nothing here {i}"
             for i in range(300)]
    batch = pa.table({"repo": ["r"] * 300,
                      "path": [f"p{i}" for i in range(300)],
                      "commit": ["c"] * 300, "lang": ["t"] * 300,
                      "content": pa.array(texts, pa.string())})
    with_pf = MentionScanner()
    assert with_pf._prefilter is not None
    no_pf = MentionScanner()
    no_pf._prefilter = None
    assert with_pf(batch).equals(no_pf(batch))

    # adaptive disable: >90% matching over >=20k docs turns it off
    hot = MentionScanner()
    hot_batch = pa.table({"repo": ["r"] * 1000,
                          "path": [f"p{i}" for i in range(1000)],
                          "commit": ["c"] * 1000, "lang": ["t"] * 1000,
                          "content": pa.array([f"{surf} again {i}"
                                               for i in range(1000)])})
    for _ in range(21):
        hot(hot_batch)
    assert hot._prefilter is None
