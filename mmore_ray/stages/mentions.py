"""Mention detection over code/comments/docstrings.

Deterministic gazetteer-driven extraction: a compiled alternation regex
(longest-surface-first, case-sensitive) scans each file's content; the
matches are rendered into the reference's tuple-record format and run
through :func:`mmore_ray.stages.parser.parse_extraction` — the same
parser-defined merge semantics the reference applies to LLM output
(`ner/extractor.py` + `ner/output_parser.py`; the reference's own tests
mock the LLM with fixed tuple strings the same way,
`tests/test_postprocessors.py:147-227`).

Stage shape: callable CLASS → Ray actor pool (`map_batches(MentionScanner,
concurrency=N)`); the regex and lookup tables are compiled once per
actor in ``__init__``.  Output is one row per document with *nested*
mention/edge lists (content is dropped here — wide rows don't travel
past extraction), exploded downstream by
:mod:`mmore_ray.stages.triples`.
"""

from __future__ import annotations

import logging
import re

import pyarrow as pa

from ..sources.corpus import CO_OCCURS_PRED, GAZETTEER
from .parser import (
    DEFAULT_RECORD_DELIMITER,
    DEFAULT_TUPLE_DELIMITER,
    DocGraph,
    parse_extraction,
)

logger = logging.getLogger(__name__)

MENTION_STRUCT = pa.struct(
    [
        ("surface", pa.string()),
        ("entity_key", pa.string()),
        ("entity_type", pa.string()),
        ("n_occ", pa.int64()),
        ("first_pos", pa.int64()),
    ]
)

EDGE_STRUCT = pa.struct(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("weight", pa.float64()),
        ("description", pa.string()),
    ]
)

DOC_KEY_COLUMNS = ["repo", "path", "commit", "lang", "content_sha256"]


def load_gazetteer(path: str) -> list[tuple[str, str, str]]:
    """Gazetteer file loader (the config-surface analogue of the
    reference's prompt/types files, ``ner/extractor.py:26-33``): TSV
    lines ``surface<TAB>entity_type<TAB>kb_id``; blank lines and ``#``
    comment lines ignored.  A comment is a '#'-leading line WITHOUT a
    tab — '#include<TAB>MACRO<TAB>KB:x' is a legitimate code-entity
    data row, not a comment."""
    rows: list[tuple[str, str, str]] = []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip() or (
                    line.lstrip().startswith("#") and "\t" not in line):
                continue
            surface, etype, kb_id = line.split("\t")
            if not surface:
                # an empty surface compiles to a zero-width-matching
                # trie that "finds" itself at every character position
                continue
            rows.append((surface, etype, kb_id))
    return rows


def render_records(found: list[tuple[str, str]],
                   tuple_delimiter: str = DEFAULT_TUPLE_DELIMITER,
                   record_delimiter: str = DEFAULT_RECORD_DELIMITER,
                   max_clique: int | None = None) -> str:
    """Render (surface, entity_type) matches (first-occurrence order) into
    tuple-record text: one entity record per distinct surface, one
    relationship record per unordered pair (offset order).

    ``max_clique``: co-occurrence pairs are emitted only among the
    first ``max_clique`` distinct surfaces (entity records are never
    capped) — see :class:`MentionScanner` for why."""
    td, rd = tuple_delimiter, record_delimiter
    recs = [
        f'("entity"{td}{s}{td}{t}{td}MENTION OF {s.upper()})' for s, t in found
    ]
    k = len(found) if max_clique is None else min(len(found), max_clique)
    for i in range(k):
        for j in range(i + 1, k):
            a, b = found[i][0], found[j][0]
            recs.append(
                f'("relationship"{td}{a}{td}{b}{td}{CO_OCCURS_PRED}{td}1)'
            )
    return rd.join(recs)


def _trie_regex(surfaces: list[str]) -> str:
    """Factor literal surfaces into a prefix-trie regex.

    A flat alternation of N literals costs O(N) branch attempts per
    candidate position; the trie form shares prefixes so matching cost
    is bounded by trie depth — the property that lets a gazetteer grow
    to ~10^5-10^6 surfaces without the scan degrading (the remaining
    scale lever is sharding the dictionary across actors,
    stages/linking.py module doc).  Longest match wins at each node
    (children sorted longest-first, end-of-word alternative last).
    """
    root: dict = {}
    END = "\x00"
    for s in surfaces:
        node = root
        for ch in s:
            node = node.setdefault(ch, {})
        node[END] = {}

    def render(node: dict) -> str:
        # deterministic child order; end-of-word becomes an optional
        # suffix so continuations (longer surfaces) are tried first
        alts = [re.escape(ch) + render(node[ch])
                for ch in sorted(k for k in node if k != END)]
        if not alts:
            return ""
        body = "|".join(alts)
        if END in node:
            return f"(?:{body})?"
        return f"(?:{body})" if len(alts) > 1 else body

    return render(root)


class MentionScanner:
    """Actor-pool stage: corpus rows → per-doc mention/edge lists.

    Config surface (≙ ``NERExtractorConfig``, ner/extractor.py:26-33):
    ``gazetteer`` inline rows or ``gazetteer_path`` TSV file,
    ``entity_types`` allowlist, and the tuple/record delimiters the
    rendered records (and their parse) use."""

    #: co-occurrence edges are emitted only among the first
    #: ``max_clique`` distinct surfaces of a document (first-occurrence
    #: order — deterministic).  The per-doc relationship set is a
    #: CLIQUE, i.e. O(k²) edge rows: one pathological doc hitting 5k
    #: gazetteer surfaces would explode into 12.5M edge rows from a
    #: single input row.  256 keeps the worst doc ≤ ~32k edges while
    #: leaving every realistic document (the gold corpus peaks at 4)
    #: untouched; mention rows are never capped.
    DEFAULT_MAX_CLIQUE = 256

    def __init__(self, gazetteer: list[tuple[str, str, str]] | None = None,
                 gazetteer_path: str | None = None,
                 entity_types: list[str] | None = None,
                 tuple_delimiter: str = DEFAULT_TUPLE_DELIMITER,
                 record_delimiter: str = DEFAULT_RECORD_DELIMITER,
                 max_clique: int = DEFAULT_MAX_CLIQUE):
        self._max_clique = max_clique
        if gazetteer_path is not None:
            gaz = load_gazetteer(gazetteer_path)
        else:
            gaz = gazetteer if gazetteer is not None else GAZETTEER
        if entity_types is not None:
            allowed = set(entity_types)
            gaz = [(s, t, k) for s, t, k in gaz if t in allowed]
        self._delims = (tuple_delimiter, record_delimiter)
        # duplicate surface with conflicting types: the FIRST gazetteer
        # entry wins — gazetteer order is deterministic, set iteration
        # order is hash-salted per process and made two actors in one
        # job emit different types for identical documents
        first_type: dict[str, str] = {}
        for s, t, _ in gaz:
            if s:  # empty surfaces match zero-width everywhere — drop
                first_type.setdefault(s, t)
        # a surface containing a delimiter cannot round-trip the
        # extraction record format (the render→parse channel truncates
        # it at the delimiter, then _rows KeyErrors on the full-surface
        # key; the reference's LLM tuple format could not express it
        # either) — drop it loudly rather than crash the extract job
        bad = [s for s in first_type
               if tuple_delimiter in s or record_delimiter in s]
        if bad:
            logger.warning(
                "mention scanner: dropped %d gazetteer surface(s) "
                "containing the tuple/record delimiter: %s",
                len(bad), bad[:3])
            for s in bad:
                del first_type[s]
        ordered = sorted(first_type.items(), key=lambda x: (-len(x[0]), x[0]))
        self._type_of = dict(ordered)
        # prefix-trie-factored pattern: longest match at shared prefixes,
        # matching cost independent of dictionary size (see _trie_regex).
        # Scanned with a search loop stepping start+1 (see _scan) so
        # surfaces overlapping a preceding match are still found
        # ('AB','BC' in 'ABC' must count both — the SQL occurrence
        # oracle does).  A capturing-lookahead pattern has the same
        # semantics but defeats the engine's scan optimizations
        # (measured 3x slower than plain search).
        trie_src = _trie_regex([s for s, _ in ordered]) if ordered else None
        self._pattern = re.compile(trie_src) if trie_src else None
        # Arrow/re2 presence pre-filter: one SIMD DFA pass over the
        # batch decides WHICH docs contain any surface at all; docs
        # with none skip the (much slower) Python position scan
        # entirely.  Real corpora are mostly entity-free, so this is a
        # first-order 100-TB win; it is ADAPTIVE — when a corpus turns
        # out to be match-heavy (>90% of the first 20k docs), the
        # pre-filter switches itself off and the pass is saved instead.
        # Presence semantics for a pure-literal alternation are
        # identical in re and re2; the probe below catches any
        # re2-incompatible escape and falls back to scanning everything.
        # Only the base _scan may be skipped on no-match — model-backed
        # subclasses (models.HFNERScanner) detect without the pattern.
        self._prefilter: str | None = None
        self._prefilter_seen = 0
        self._prefilter_hits = 0
        if trie_src and type(self)._scan is MentionScanner._scan:
            import pyarrow.compute as _pc

            # the SAME rendered source self._pattern compiled from —
            # deriving it independently could desynchronize the
            # prefilter from the scan (skip must imply empty result)
            try:
                _pc.match_substring_regex(pa.array([""], pa.string()),
                                          pattern=trie_src)
                self._prefilter = trie_src
            except Exception:
                self._prefilter = None
        # Fast graph path: the render→parse string roundtrip is pure
        # per-doc overhead (~40% of scan CPU measured) when no surface
        # contains a delimiter — the parsed graph is then a closed-form
        # function of the found list.  Precompute each surface's
        # parser-cleaned entity name / type / description once;
        # tests/test_mentions_fastpath.py asserts graph equality with
        # the render+parse path on randomized docs.
        from ..functions.textfns import clean_str

        # delimiters in SURFACES or TYPES both perturb record
        # tokenization (a type like 'LOC<|>X' would parse into
        # type 'LOC' + description 'X' on the render+parse path)
        self._fastpath = all(
            tuple_delimiter not in s and record_delimiter not in s
            and tuple_delimiter not in t and record_delimiter not in t
            for s, t in ordered)
        self._entity_of = {
            s: (str(clean_str(s.upper())),
                str(clean_str(t.upper())),
                str(clean_str(f"MENTION OF {s.upper()}")))
            for s, t in ordered
        }
        self._co_occurs = str(clean_str(CO_OCCURS_PRED))
        # prefix-surface bookkeeping for _scan: the trie returns the
        # LONGEST surface at a position, so a surface that is a proper
        # PREFIX of another would lose its occurrence at a shared start
        # (infix/suffix overlaps are already found by the start+1 step).
        # Memoized lazily per matched surface — corpora hit few
        # distinct surfaces, so this costs ~nothing when (as in the
        # default gazetteer) no surface prefixes another.
        self._surface_lens = sorted({len(s) for s in self._type_of})
        self._prefix_memo: dict[str, tuple[str, ...]] = {}

    def _prefixes_of(self, s: str) -> tuple[str, ...]:
        """Proper-prefix surfaces of ``s`` (shortest first), memoized."""
        r = self._prefix_memo.get(s)
        if r is None:
            r = tuple(s[:n] for n in self._surface_lens
                      if n < len(s) and s[:n] in self._type_of)
            self._prefix_memo[s] = r
        return r

    def _graph_of(self, found: list[tuple[str, str]]):
        """DocGraph of a found list — closed form when no surface can
        perturb record tokenization, else the render+parse roundtrip."""
        if not self._fastpath:
            td, rd = self._delims
            return parse_extraction(
                render_records(found, td, rd, max_clique=self._max_clique),
                tuple_delimiter=td, record_delimiter=rd)
        graph = DocGraph()
        names = []
        for s, _ in found:
            name, etype, desc = self._entity_of[s]
            graph.add_entity(name, etype, desc)
            names.append(name)
        pred = self._co_occurs
        k = min(len(names), self._max_clique)
        for i in range(k):
            for j in range(i + 1, k):
                graph.add_relationship(names[i], names[j], pred)
        return graph

    def _scan(self, content: str) -> tuple[list[dict], list[dict]]:
        if self._pattern is None or not content:
            # empty/filtered gazetteer, or a null/empty content row
            return [], []
        counts: dict[str, list[int]] = {}
        order: list[str] = []
        # overlap-correct enumeration: restart the search one char past
        # each match START (not its end), so a DIFFERENT surface
        # overlapping the previous match is found too ('AB','BC' in
        # 'ABC' both count).  The trie yields the LONGEST surface at a
        # position, so proper-PREFIX surfaces of the match are credited
        # at the same start (each under its own gate) — 'Ray' at the
        # head of 'RayCluster' counts for both.  Occurrences of the
        # SAME surface that overlap its own previous counted occurrence
        # are skipped (last_end gate): per-surface counts are
        # left-to-right NON-overlapping — exactly the SQL oracle's
        # replace-based n_occ ('neon' in 'neoneon' counts once).
        last_end: dict[str, int] = {}
        search = self._pattern.search
        pos = 0
        while True:
            m = search(content, pos)
            if m is None:
                break
            s = m.group(0)
            p = m.start()
            pos = p + 1
            for surf in (s, *self._prefixes_of(s)):
                if p < last_end.get(surf, 0):
                    continue  # self-overlap: already counted
                last_end[surf] = p + len(surf)
                slot = counts.get(surf)
                if slot is None:
                    counts[surf] = [1, p]
                    order.append(surf)
                else:
                    slot[0] += 1
        found = [(s, self._type_of[s]) for s in order]
        return self._rows(found, counts)

    def _rows(self, found: list[tuple[str, str]],
              counts: dict[str, list[int]]) -> tuple[list[dict], list[dict]]:
        """found list + per-surface [n_occ, pos0] → (mentions, edges)
        rows.  Shared by the regex scan and model-backed scanners
        (models.HFNERScanner overrides only the detection, not this)."""
        order = [s for s, _ in found]
        graph = self._graph_of(found)
        mentions = [
            {
                "surface": s,
                # the PARSER-CLEANED name: graph nodes (and edge
                # src/dst, and every downstream canonical join) are
                # keyed by clean_str(upper) — raw s.upper() raises
                # KeyError for any surface clean_str alters
                "entity_key": key,
                "entity_type": graph.nodes[key]["type"],
                "n_occ": counts[s][0],
                "first_pos": counts[s][1] + 1,  # 1-based (SQL strpos parity)
            }
            for s in order
            for key in (self._entity_of[s][0],)
        ]
        edges = [
            {"src": a, "dst": b, "weight": e["weight"], "description": e["description"][0]}
            for (a, b), e in graph.edges.items()
        ]
        return mentions, edges

    def __call__(self, batch: pa.Table) -> pa.Table:
        # Single pass over the content column: the lineage sha256 is
        # hashed from the Arrow buffer (no bytes copies) and the regex
        # scan reuses ONE str materialization — content bytes are the
        # 100-TB bandwidth budget, touch them once.
        if "content_sha256" not in batch.column_names:
            from ..functions.hashing import sha256_of_string_array

            batch = batch.append_column(
                "content_sha256",
                pa.array(sha256_of_string_array(batch.column("content")),
                         pa.string()))
        # Exact-duplicate scan elision: web-scale corpora are dup-heavy
        # (identical files across repo forks/commits), and the scan is a
        # pure function of content — so scan each distinct content once
        # per batch, keyed by the sha256 already computed for lineage.
        # Cost when all rows are distinct: one dict probe per row.
        keep = None
        if self._prefilter is not None:
            import pyarrow.compute as _pc

            mask = _pc.match_substring_regex(
                batch.column("content").cast(pa.string()),
                pattern=self._prefilter)
            keep = mask.to_pylist()  # None (null content) skips too
            self._prefilter_seen += len(keep)
            self._prefilter_hits += sum(1 for k in keep if k)
            if (self._prefilter_seen >= 20_000
                    and self._prefilter_hits > 0.9 * self._prefilter_seen):
                # match-heavy corpus: the presence pass is pure overhead
                self._prefilter = None
        mention_col, edge_col = [], []
        memo: dict[str, tuple[list[dict], list[dict]]] = {}
        for i, (sha, content) in enumerate(
                zip(batch.column("content_sha256").to_pylist(),
                    batch.column("content").to_pylist())):
            if keep is not None and not keep[i]:
                mention_col.append([])
                edge_col.append([])
                continue
            hit = memo.get(sha)
            if hit is None:
                hit = memo[sha] = self._scan(content)
            mentions, edges = hit
            mention_col.append(mentions)
            edge_col.append(edges)
        out = batch.select([c for c in DOC_KEY_COLUMNS if c in batch.column_names])
        out = out.append_column("mentions", pa.array(mention_col, pa.list_(MENTION_STRUCT)))
        out = out.append_column("edges", pa.array(edge_col, pa.list_(EDGE_STRUCT)))
        return out


_PROCESS_SCANNER: MentionScanner | None = None


def get_default_scanner() -> MentionScanner:
    """Per-worker cached default-gazetteer scanner (compile once)."""
    global _PROCESS_SCANNER
    if _PROCESS_SCANNER is None:
        _PROCESS_SCANNER = MentionScanner()
    return _PROCESS_SCANNER


def scan_batch(batch: pa.Table) -> pa.Table:
    """Task-stage variant of the scanner for the DEFAULT gazetteer.

    Stateful setup (regex compile) happens once per *worker process*
    via a module-global cache — same amortization as an actor pool, but
    task stages carry no pool-startup cost and scale elastically with
    the cluster.  Custom gazetteers go through the actor-pool path
    (state can't live in a module global keyed by arbitrary input).
    """
    return get_default_scanner()(batch)
