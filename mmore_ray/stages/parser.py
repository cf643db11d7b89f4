"""Tuple-record extraction parser.

Reimplements the semantics of mmore's ``EntityExtractionOutputParser``
(``src/mmore/process/post_processor/ner/output_parser.py:31-143``) as a
pure function over plain dicts — no networkx, no langchain — so it can
run zero-dependency inside ``map_batches`` workers.  This parser is the
*spec* for triple-match correctness (P/R ≥ 0.95 vs the reference), so
every observable behavior is reproduced:

  * records split on ``record_delimiter``, stripped, leading ``(`` /
    trailing ``)`` removed (one each, anchored), then split on
    ``tuple_delimiter``;
  * entity records need first attr exactly ``'"entity"'`` and ≥4 attrs;
    name/type are ``clean_str(attr.upper())``, description ``clean_str``;
  * duplicate entity → description set-union; type overridden only if
    the new one is non-empty;
  * relationship records need first attr ``'"relationship"'`` and ≥5
    attrs; endpoints uppercased+cleaned; missing endpoints auto-created
    with empty type and ``[""]`` description;
  * weight: the reference guards on ``isinstance(attrs[-1], numbers.Number)``
    but split() always yields ``str`` — so **each emission contributes
    exactly 1.0** and duplicate edges accumulate ``weight += 1.0``
    (``output_parser.py:94-98,112-116``).  The trailing strength number
    in the record is never parsed.  Reproduced exactly.
  * edges are UNDIRECTED (the reference stores them in ``nx.Graph``).

Deliberate divergences (documented, do not affect (subj,pred,obj)
matching):
  * description lists keep first-seen insertion order instead of Python
    set order — the reference's ``list({*...})`` ordering is
    hash-salt-nondeterministic across processes;
  * the reference's duplicate-edge merge builds ``[{set}]`` (a list
    containing a set, ``output_parser.py:117-119``) which raises
    ``TypeError`` on a third duplicate emission; we merge flatly so any
    number of duplicate emissions works, weights still +1.0 each.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ..functions.textfns import clean_str

DEFAULT_TUPLE_DELIMITER = "<|>"
DEFAULT_RECORD_DELIMITER = "##"
DEFAULT_COMPLETION_DELIMITER = "<|COMPLETE|>"
DEFAULT_ENTITY_TYPES = ["ORGANIZATION", "PERSON", "LOCATION", "EVENT", "DATE"]

_ENTITY_MIN_ATTRS = 4
_RELATIONSHIP_MIN_ATTRS = 5

_PAREN_EDGES_RE = re.compile(r"^\(|\)$")


@dataclass
class DocGraph:
    """Per-document entity/relation graph as plain dicts.

    nodes: name -> {"type": str, "description": [str, ...]}
    edges: (a, b) sorted-endpoint key -> {"weight": float,
                                          "description": [str, ...]}
    """

    nodes: dict[str, dict] = field(default_factory=dict)
    edges: dict[tuple[str, str], dict] = field(default_factory=dict)

    def add_entity(self, name: str, etype: str, description: str) -> None:
        node = self.nodes.get(name)
        if node is None:
            self.nodes[name] = {"type": etype, "description": [description]}
        else:
            if description not in node["description"]:
                node["description"].append(description)
            if etype != "":
                node["type"] = etype

    def add_relationship(self, source: str, target: str, description: str) -> None:
        for endpoint in (source, target):
            if endpoint not in self.nodes:
                self.nodes[endpoint] = {"type": "", "description": [""]}
        key = (source, target) if source <= target else (target, source)
        edge = self.edges.get(key)
        if edge is None:
            self.edges[key] = {"weight": 1.0, "description": [description]}
        else:
            edge["weight"] += 1.0
            if description not in edge["description"]:
                edge["description"].append(description)


def parse_extraction(
    text: str,
    tuple_delimiter: str = DEFAULT_TUPLE_DELIMITER,
    record_delimiter: str = DEFAULT_RECORD_DELIMITER,
) -> DocGraph:
    """Parse extractor output text into a :class:`DocGraph`."""
    graph = DocGraph()
    for raw in text.split(record_delimiter):
        record = _PAREN_EDGES_RE.sub("", raw.strip())
        attrs = record.split(tuple_delimiter)
        head = attrs[0]
        if head == '"entity"' and len(attrs) >= _ENTITY_MIN_ATTRS:
            graph.add_entity(
                str(clean_str(attrs[1].upper())),
                str(clean_str(attrs[2].upper())),
                str(clean_str(attrs[3])),
            )
        elif head == '"relationship"' and len(attrs) >= _RELATIONSHIP_MIN_ATTRS:
            graph.add_relationship(
                str(clean_str(attrs[1].upper())),
                str(clean_str(attrs[2].upper())),
                str(clean_str(attrs[3])),
            )
    return graph
