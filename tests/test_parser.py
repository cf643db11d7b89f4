"""Parser unit tests — ported from the reference's test vectors
(FIXTURES.md F4; reference tests/test_postprocessors.py:147-227 and
output_parser.py semantics)."""

from mmore_ray.functions.textfns import clean_str
from mmore_ray.stages.parser import parse_extraction

TD, RD = "<|>", "##"


def test_single_entity_record():
    g = parse_extraction('("entity"<|>HELLO WORLD<|>ORGANIZATION<|>A SAMPLE ORGANIZATION)')
    assert set(g.nodes) == {"HELLO WORLD"}
    node = g.nodes["HELLO WORLD"]
    assert node["type"] == "ORGANIZATION"
    assert node["description"] == ["A SAMPLE ORGANIZATION"]
    assert g.edges == {}


def test_lowercase_entity_is_uppercased():
    g = parse_extraction('("entity"<|>Hello World<|>organization<|>desc)')
    assert set(g.nodes) == {"HELLO WORLD"}
    assert g.nodes["HELLO WORLD"]["type"] == "ORGANIZATION"


def test_duplicate_entity_merges_descriptions():
    text = RD.join(
        [
            '("entity"<|>HELLO WORLD<|>ORGANIZATION<|>A SAMPLE ORGANIZATION)',
            '("entity"<|>HELLO WORLD<|>ORGANIZATION<|>ANOTHER DESCRIPTION)',
        ]
    )
    g = parse_extraction(text)
    assert set(g.nodes["HELLO WORLD"]["description"]) == {
        "A SAMPLE ORGANIZATION",
        "ANOTHER DESCRIPTION",
    }


def test_relationship_creates_missing_endpoints_and_weight_always_one():
    # The reference's weight guard checks isinstance(attrs[-1], Number)
    # but split() yields str — so the trailing "7"/"3" strength is never
    # parsed and each emission contributes exactly 1.0.
    text = RD.join(
        [
            '("entity"<|>HELLO WORLD<|>ORGANIZATION<|>A SAMPLE ORGANIZATION)',
            '("relationship"<|>HELLO WORLD<|>ACME<|>Hello World partners with Acme<|>7)',
            '("relationship"<|>HELLO WORLD<|>ACME<|>duplicate edge<|>3)',
        ]
    )
    g = parse_extraction(text)
    assert g.nodes["ACME"] == {"type": "", "description": [""]}  # auto-created
    assert len(g.edges) == 1
    edge = g.edges[("ACME", "HELLO WORLD")]
    assert edge["weight"] == 2.0
    assert set(edge["description"]) == {
        "Hello World partners with Acme",
        "duplicate edge",
    }


def test_three_duplicate_edges_accumulate():
    # The reference would raise TypeError here (nested-set quirk,
    # output_parser.py:117-119); we merge flatly — documented divergence.
    text = RD.join(['("relationship"<|>A<|>B<|>d%d<|>1)' % i for i in range(3)])
    g = parse_extraction(text)
    assert g.edges[("A", "B")]["weight"] == 3.0


def test_edges_are_undirected():
    text = RD.join(
        [
            '("relationship"<|>A<|>B<|>forward<|>1)',
            '("relationship"<|>B<|>A<|>backward<|>1)',
        ]
    )
    g = parse_extraction(text)
    assert len(g.edges) == 1
    assert g.edges[("A", "B")]["weight"] == 2.0


def test_malformed_records_are_skipped():
    text = RD.join(
        [
            '("entity"<|>TOO<|>FEW)',                      # <4 attrs
            '("wrongtoken"<|>A<|>B<|>C<|>D)',              # bad leading token
            '(entity<|>A<|>B<|>C)',                         # unquoted token
            '("relationship"<|>A<|>B<|>C)',                 # <5 attrs
            "",
        ]
    )
    g = parse_extraction(text)
    assert g.nodes == {} and g.edges == {}


def test_clean_str_html_and_control_chars():
    assert clean_str("  A&amp;B\x00\x1f\x7f  ") == "A&B"
    assert clean_str(42) == 42  # non-string passthrough
    # .upper() runs BEFORE clean_str (reference order); &AMP; is a
    # valid uppercase HTML5 entity so it still unescapes.
    g = parse_extraction('("entity"<|> Caf&amp;e\x01 <|>LOCATION<|>d)')
    assert set(g.nodes) == {"CAF&E"}


def test_completion_delimiter_tail_kept_in_last_attr():
    # The reference never strips the completion delimiter; for a
    # relationship the trailing attr is only (never) used for weight.
    text = '("relationship"<|>A<|>B<|>desc<|>1)<|COMPLETE|>'
    g = parse_extraction(text)
    assert g.edges[("A", "B")]["weight"] == 1.0
    assert g.edges[("A", "B")]["description"] == ["desc"]


def test_parenthesis_stripping_is_single_and_anchored():
    g = parse_extraction('(("entity"<|>X<|>T<|>d))')
    # only one leading ( and one trailing ) are removed; the leftover
    # parens corrupt the first/last attrs → record rejected
    assert g.nodes == {}
