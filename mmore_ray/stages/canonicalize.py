"""Canonicalization: connected components over the alias graph.

The reference canonicalizes only implicitly (uppercase name equality
within one document, ``ner/output_parser.py:55-59``); the north rule
requires *global* canonicalization: union-find connected components over
(entity_key ↔ kb_id) alias edges, every member relabeled to one
representative.

Two implementations, picked by data size:

* :func:`build_canonical_map` — driver-side union-find over the
  **distinct** alias pairs.  The distinct-pair set is tiny relative to
  data (it is bounded by vocabulary, not corpus size), so the pipeline
  first shrinks pairs per batch, then a small ``groupby`` dedups them
  globally, and only the distinct pairs reach the driver.  This is the
  default path (SURVEY §7.5 "union-find across partitions").
* :func:`connected_components` — fully distributed min-label
  propagation over a Ray ``Dataset`` of edges, for alias graphs too big
  to collect (iterate ``groupby(node).min(label)`` until fixpoint,
  typically ≤ log(diameter) rounds).  Also reused by near-dup
  clustering (``stages/dedup.py``).

Representative choice: the lexicographically smallest *kb id* in the
component (falls back to smallest member when a component has no kb
node).  With a consistent alias dictionary each component holds exactly
one kb id, so the representative is that id.
"""

from __future__ import annotations

import pyarrow as pa

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None


class UnionFind:
    def __init__(self):
        self._parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        parent = self._parent
        if x not in parent:
            parent[x] = x
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self._parent[rb] = ra

    def members(self) -> dict[str, list[str]]:
        groups: dict[str, list[str]] = {}
        for node in list(self._parent):
            groups.setdefault(self.find(node), []).append(node)
        return groups


def build_canonical_map(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find over (surface_key, kb_id) pairs → {node: canonical}.

    ``pairs`` must be the distinct alias pairs (small; see module doc).
    """
    uf = UnionFind()
    kb_nodes: set[str] = set()
    for surface, kb in pairs:
        uf.union(surface, kb)
        kb_nodes.add(kb)
    canon: dict[str, str] = {}
    for _, members in uf.members().items():
        kbs = sorted(m for m in members if m in kb_nodes)
        rep = kbs[0] if kbs else min(members)
        for m in members:
            canon[m] = rep
    return canon


def distinct_pairs(ds, left: str, right: str) -> list[tuple[str, str]]:
    """Distinct (left, right) pairs of a Dataset via a small groupby
    shuffle; only the distinct set is collected to the driver."""
    small = ds.select_columns([left, right]).groupby([left, right]).count()
    rows = small.take_all()
    return [(r[left], r[right]) for r in rows]


class CanonicalRelabel:
    """Actor-pool stage: map configured columns through the broadcast
    canonical map (``ray.put`` once, ``ray.get`` in ``__init__``)."""

    def __init__(self, canon_ref=None, canon: dict[str, str] | None = None,
                 columns: dict[str, str] | None = None):
        self._canon = ray.get(canon_ref) if canon_ref is not None else (canon or {})
        self._columns = columns or {"kb_id": "canonical"}

    def __call__(self, batch: pa.Table) -> pa.Table:
        canon = self._canon
        for col, out in self._columns.items():
            vals = batch.column(col).to_pylist()
            batch = batch.append_column(
                out, pa.array([canon.get(v, v) for v in vals], pa.string())
            )
        return batch


def connected_components(edges_ds, src: str = "src", dst: str = "dst",
                         max_rounds: int = 20):
    """Distributed connected components by min-label propagation.

    ``edges_ds``: Dataset of undirected edges.  Returns a Dataset
    (node, component) where component is the minimum node id reachable.

    Each round: labels join onto edges, nodes adopt the min neighbor
    label (``groupby(node).min(label)``); stops at fixpoint.  Rounds are
    all-to-all shuffles — callers should pre-dedup edges.  Suitable when
    the edge set is too large for driver-side union-find.
    """
    import pyarrow.compute as pc

    def edge_to_labels(batch: pa.Table) -> pa.Table:
        a, b = batch.column(src), batch.column(dst)
        lab = pc.min_element_wise(a, b)
        return pa.table({
            "node": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
            "label": pa.concat_arrays([lab.combine_chunks(), lab.combine_chunks()]),
        })

    edges = edges_ds.select_columns([src, dst]).materialize()
    labels = (
        edges.map_batches(edge_to_labels, batch_format="pyarrow")
        .groupby("node").min("label")
        .rename_columns({"min(label)": "label"})
        .materialize()
    )
    for _ in range(max_rounds):
        # Propagate: for every edge, each endpoint offers its label to
        # the other; then take per-node min with the current labels.
        label_map = {r["node"]: r["label"] for r in labels.take_all()}
        # Small-map broadcast path: alias graphs have bounded distinct
        # nodes; if this map outgrew the driver we would switch to a
        # bucketed join here.
        ref = ray.put(label_map)

        def offer(batch: pa.Table, _ref=ref) -> pa.Table:
            lm = ray.get(_ref)
            a = batch.column(src).to_pylist()
            b = batch.column(dst).to_pylist()
            nodes, labs = [], []
            for x, y in zip(a, b):
                lx, ly = lm[x], lm[y]
                m = lx if lx < ly else ly
                nodes.extend((x, y))
                labs.extend((m, m))
            return pa.table({"node": pa.array(nodes), "label": pa.array(labs)})

        new_labels = (
            edges.map_batches(offer, batch_format="pyarrow")
            .groupby("node").min("label")
            .rename_columns({"min(label)": "label"})
            .materialize()
        )
        new_map = {r["node"]: r["label"] for r in new_labels.take_all()}
        if new_map == label_map:
            break
        labels = new_labels
    return labels
