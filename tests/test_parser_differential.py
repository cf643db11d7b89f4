"""Differential test: our parser vs the REFERENCE's own
EntityExtractionOutputParser, loaded from /root/reference by file path
with a minimal langchain_core shim (the real lib isn't installed).

Runs the reference implementation head-to-head on seeded random record
streams and asserts graph equality (node names, effective types,
description sets, undirected edges, weights).  Known reference crash
quirks (nested-set edge merge on a 3rd duplicate emission; KeyError on
duplicate entity with empty type) are counted and asserted to NOT
crash our parser — documented divergences, not parity failures."""

import importlib.util
import random
import sys
import types

import pytest

from mmore_ray.stages.parser import parse_extraction

REF = "/root/reference/src/mmore/process/post_processor/ner/output_parser.py"


def _load_reference_parser():
    if "langchain_core.output_parsers" not in sys.modules:
        lc = types.ModuleType("langchain_core")
        out = types.ModuleType("langchain_core.output_parsers")

        class BaseOutputParser:
            def __init__(self, **kwargs):
                for k, v in kwargs.items():
                    setattr(self, k, v)

            def __class_getitem__(cls, item):
                return cls

        out.BaseOutputParser = BaseOutputParser
        lc.output_parsers = out
        sys.modules["langchain_core"] = lc
        sys.modules["langchain_core.output_parsers"] = out
    spec = importlib.util.spec_from_file_location("ref_output_parser", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.EntityExtractionOutputParser(
        tuple_delimiter="<|>", record_delimiter="##")


def _flatten_desc(desc) -> frozenset:
    out = set()
    stack = list(desc) if isinstance(desc, (list, set)) else [desc]
    while stack:
        x = stack.pop()
        if isinstance(x, (list, set, frozenset)):
            stack.extend(x)
        else:
            out.add(x)
    return frozenset(out)


def _ref_graph_shape(g):
    nodes = {}
    for name, data in g.nodes(data=True):
        etype = data.get("entity_type", data.get("type", ""))
        nodes[name] = (etype, _flatten_desc(data.get("description", [])))
    edges = {}
    for a, b, data in g.edges(data=True):
        key = (a, b) if a <= b else (b, a)
        edges[key] = (data["weight"], _flatten_desc(data.get("description", [])))
    return nodes, edges


def _our_graph_shape(g):
    nodes = {n: (d["type"], _flatten_desc(d["description"]))
             for n, d in g.nodes.items()}
    edges = {k: (e["weight"], _flatten_desc(e["description"]))
             for k, e in g.edges.items()}
    return nodes, edges


NAMES = ["Alpha", "beta corp", "GAMMA", "Delta&amp;Co", " padded ", "X"]
TYPES = ["PERSON", "org", "LOCATION", "", "EVENT"]
DESCS = ["a desc", "other", "d3", ""]


def _random_record(rng: random.Random) -> str:
    if rng.random() < 0.5:
        parts = ['"entity"', rng.choice(NAMES), rng.choice(TYPES),
                 rng.choice(DESCS)]
        if rng.random() < 0.2:
            parts = parts[: rng.randint(1, 3)]  # malformed: too few attrs
    else:
        parts = ['"relationship"', rng.choice(NAMES), rng.choice(NAMES),
                 rng.choice(DESCS), str(rng.randint(1, 9))]
        if rng.random() < 0.2:
            parts = parts[: rng.randint(1, 4)]
    if rng.random() < 0.1:
        parts[0] = rng.choice(['"wrong"', "entity", '"entity'])
    return "(" + "<|>".join(parts) + ")"


def test_differential_vs_reference_parser():
    ref = _load_reference_parser()
    rng = random.Random(42)
    compared = ref_crashes = 0
    for trial in range(300):
        n = rng.randint(1, 10)
        text = "##".join(_random_record(rng) for _ in range(n))
        if rng.random() < 0.3:
            text += "<|COMPLETE|>"
        ours = parse_extraction(text)  # must never crash
        try:
            theirs = ref.parse(text)
        except (TypeError, KeyError):
            # reference quirks (output_parser.py:59-70 entity_type
            # KeyError; :117-119 nested-set TypeError) — documented
            # divergences our parser survives
            ref_crashes += 1
            continue
        assert _our_graph_shape(ours) == _ref_graph_shape(theirs), text
        compared += 1
    assert compared >= 150, (compared, ref_crashes)


def test_differential_fixture_strings():
    ref = _load_reference_parser()
    fixtures = [
        '("entity"<|>HELLO WORLD<|>ORGANIZATION<|>A SAMPLE ORGANIZATION)',
        '("entity"<|>Hello World<|>organization<|>desc)',
        '("entity"<|>A<|>T1<|>d1)##("entity"<|>A<|>T2<|>d2)',
        '("relationship"<|>A<|>B<|>edge desc<|>7)',
        '("relationship"<|>A<|>B<|>d1<|>7)##("relationship"<|>B<|>A<|>d2<|>3)',
        '("entity"<|>TOO<|>FEW)##("relationship"<|>A<|>B<|>C)',
        '("entity"<|> Caf&amp;e\x01 <|>LOCATION<|>d)',
        '(("entity"<|>X<|>T<|>d))',
        '("relationship"<|>A<|>B<|>d<|>1)<|COMPLETE|>',
        '("relationship"<|>SAME<|>SAME<|>self loop<|>1)',
        "",
        "##ps##",
    ]
    for text in fixtures:
        ours = parse_extraction(text)
        theirs = ref.parse(text)
        assert _our_graph_shape(ours) == _ref_graph_shape(theirs), text
