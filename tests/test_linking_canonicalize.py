"""EntityLinker / CanonicalRelabel / union-find unit coverage."""

import pyarrow as pa

from mmore_ray.stages.canonicalize import (
    CanonicalRelabel,
    build_canonical_map,
    distinct_pairs,
)
from mmore_ray.stages.linking import EntityLinker, trigram_jaccard


def test_entity_linker_stage():
    linker = EntityLinker(alias={"OBAMA": "BARACK OBAMA"})
    batch = pa.table({"entity_key": ["OBAMA", "UNKNOWN THING"]})
    out = linker(batch)
    assert out.column("kb_id").to_pylist() == ["BARACK OBAMA", "UNKNOWN THING"]
    scores = out.column("link_score").to_pylist()
    assert scores[1] == 1.0  # identity link
    assert 0.0 < scores[0] < 1.0


def test_trigram_jaccard_bounds():
    assert trigram_jaccard("ABC", "ABC") == 1.0
    assert trigram_jaccard("ABCDEF", "XYZUVW") == 0.0


def test_build_canonical_map_chains_and_components():
    pairs = [("ALPHABET INC", "GOOGLE LLC"), ("GOOGLE LLC", "GOOGLE LLC"),
             ("TOUR EIFFEL", "EIFFEL TOWER"), ("LONER", "LONER")]
    canon = build_canonical_map(pairs)
    assert canon["ALPHABET INC"] == "GOOGLE LLC"
    assert canon["GOOGLE LLC"] == "GOOGLE LLC"
    assert canon["TOUR EIFFEL"] == "EIFFEL TOWER"
    assert canon["LONER"] == "LONER"
    # two kb ids linked transitively → lexicographic min wins
    canon2 = build_canonical_map([("X", "KB B"), ("X", "KB A")])
    assert canon2["X"] == "KB A" and canon2["KB B"] == "KB A"


def test_canonical_relabel_stage():
    stage = CanonicalRelabel(canon={"A": "CANON_A"},
                             columns={"kb_id": "canonical"})
    out = stage(pa.table({"kb_id": ["A", "B"]}))
    assert out.column("canonical").to_pylist() == ["CANON_A", "B"]


def test_distinct_pairs_shuffle(ray_session):
    ray = ray_session
    ds = ray.data.from_items(
        [{"k": "a", "v": "x"}] * 50 + [{"k": "b", "v": "y"}] * 30)
    pairs = distinct_pairs(ds, "k", "v")
    assert sorted(pairs) == [("a", "x"), ("b", "y")]
