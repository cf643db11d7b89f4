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
        import pandas as pd

        canon = self._canon
        for col, out in self._columns.items():
            s = batch.column(col).to_pandas()
            # vectorized dict map with identity fallback (no row loop)
            m = s.map(canon)
            mapped = m.where(m.notna(), s)
            batch = batch.append_column(out, pa.array(mapped, pa.string()))
        return batch


def connected_components(edges_ds, src: str = "src", dst: str = "dst",
                         max_rounds: int = 30, num_buckets: int = 32,
                         join_partitions: int = 16):
    """Distributed connected components: min-label propagation with
    pointer doubling — driver memory stays O(1).

    ``edges_ds``: Dataset of undirected edges.  Returns a Dataset
    (node, label) where label is the minimum node id reachable.

    Labels live as a Dataset end-to-end (never collected):

      * **propagate** — ``edges ⋈ labels`` hash joins on both endpoints
        (``Dataset.join``), each endpoint offers ``min(label_a,
        label_b)`` (its own label is one of the two, so labels only
        decrease and no union with the old labels is needed), reduced
        by the bucketed min (stages/groupby — Ray's native groupby
        costs per-group Python at high node cardinality);
      * **double** — ``labels ⋈ labels`` on ``label = node`` shortcuts
        label chains (label ← label(label)), so rounds scale with
        log(diameter) instead of diameter;
      * **converge** — exact fixpoint test: join old vs new labels and
        count differing rows (a scalar aggregate, no driver collect).

    Raises ``RuntimeError`` if ``max_rounds`` is exhausted before the
    fixpoint — a silent partial result would mislabel long chains.
    """
    import numpy as np
    import pandas as pd

    from .groupby import bucketed_agg

    def minlab(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
        return df.groupby(keys, as_index=False)["label"].min()

    def local_cc(batch: pa.Table) -> pa.Table:
        # batch-local union-find: collapses every component whose edges
        # land in one batch to its min in a single pass, so the global
        # rounds only stitch components that SPAN batches
        uf = UnionFind()
        for a, b in zip(batch.column(src).to_pylist(),
                        batch.column(dst).to_pylist()):
            uf.union(a, b)
        nodes, labs = [], []
        for _, members in uf.members().items():
            m = min(members)
            nodes.extend(members)
            labs.extend([m] * len(members))
        typ = batch.schema.field(src).type
        return pa.table({"node": pa.array(nodes, typ),
                         "label": pa.array(labs, typ)})

    _CHK_MOD = 1 << 40

    def checksum(label_ds) -> int | None:
        # order/partition-invariant label fingerprint: labels only ever
        # decrease, so equal checksums across rounds == fixpoint
        # (collision odds ~2^-40 per comparison).  Per-batch row-hash
        # sums are reduced mod 2^40, and the FINAL sum must be reduced
        # again — sums of residues are only congruent, not equal, so a
        # partition-dependent raw sum would mask real convergence.
        def chk(df: pd.DataFrame) -> pa.Table:
            h = pd.util.hash_pandas_object(df, index=False).to_numpy()
            v = int(h.sum(dtype=np.uint64)) % _CHK_MOD
            return pa.table({"chk": pa.array([v], pa.int64())})
        total = label_ds.map_batches(chk, batch_format="pandas").sum("chk")
        return None if total is None else total % _CHK_MOD

    def double_fn(t: pa.Table) -> pa.Table:
        # coalesce IN ARROW: a pandas batch would coerce the nullable
        # int64 _plabel through float64, silently corrupting any label
        # above 2^53 (hash-derived 64-bit node ids)
        import pyarrow.compute as pc

        lab = pc.coalesce(t.column("_plabel"), t.column("label"))
        return pa.table({"node": t.column("node"), "label": lab})

    edges = edges_ds.select_columns([src, dst])
    # static node-perspective adjacency (both directions), built once
    def to_adj(batch: pa.Table) -> pa.Table:
        a = batch.column(src).combine_chunks()
        b = batch.column(dst).combine_chunks()
        return pa.table({"node": pa.concat_arrays([a, b]),
                         "nbr": pa.concat_arrays([b, a])})

    adj = edges.map_batches(to_adj, batch_format="pyarrow").materialize()
    labels = bucketed_agg(
        edges.map_batches(local_cc, batch_format="pyarrow"),
        ["node"], minlab, num_buckets=num_buckets,
    ).materialize()
    prev_chk = checksum(labels)
    if prev_chk is None:  # empty edge set
        return labels

    for _ in range(max_rounds):
        # propagate: each node receives its neighbors' labels (one hash
        # join on nbr), unioned with its own label, then bucketed min
        nbr_offers = adj.join(
            labels.rename_columns({"node": "_n", "label": "_nl"}),
            join_type="inner", num_partitions=join_partitions,
            on=("nbr",), right_on=("_n",),
        ).rename_columns({"_nl": "label"}).select_columns(["node", "label"])
        new_labels = bucketed_agg(
            nbr_offers.union(labels), ["node"], minlab,
            num_buckets=num_buckets,
        ).materialize()
        chk = checksum(new_labels)
        if chk == prev_chk:
            # propagation offered nothing new → labels are constant per
            # component and equal to the component min: fixpoint, and
            # the doubling join below is skipped on this final round
            return new_labels
        # pointer doubling: label ← label(label) shortcuts chains, so
        # rounds scale with log(diameter); every label value is itself a
        # node, but left_outer + coalesce guards degenerate cases
        labels = new_labels.join(
            new_labels.rename_columns({"node": "_pn", "label": "_plabel"}),
            join_type="left_outer", num_partitions=join_partitions,
            on=("label",), right_on=("_pn",),
        ).map_batches(double_fn, batch_format="pyarrow").materialize()
        prev_chk = checksum(labels)
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        f"(component diameter too large?)")
