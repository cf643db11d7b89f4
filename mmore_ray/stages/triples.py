"""Triple explode / aggregate kernels (graph materialization inputs).

The per-doc nested mention/edge lists from
:class:`~mmore_ray.stages.mentions.MentionScanner` are exploded into
flat rows here.  Because one document's lists live entirely inside one
row, per-document aggregation (canonical-pair weight merge) completes
*within the batch* — no shuffle is needed for the per-doc triple table.
Only the global graph rollup (``groupby(subj,pred,obj).sum(weight)``)
shuffles, and it runs over per-batch partials, not raw rows.
"""

from __future__ import annotations

import pyarrow as pa

from .mentions import DOC_KEY_COLUMNS


def _replicate(batch: pa.Table, columns: list[str], counts: list[int]) -> dict[str, list]:
    out: dict[str, list] = {c: [] for c in columns}
    cols = {c: batch.column(c).to_pylist() for c in columns}
    for i, n in enumerate(counts):
        for c in columns:
            out[c].extend([cols[c][i]] * n)
    return out


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Per-doc nested mentions → one row per (doc, surface)."""
    keys = [c for c in DOC_KEY_COLUMNS if c in batch.column_names]
    nested = batch.column("mentions").to_pylist()
    counts = [len(m) for m in nested]
    out = _replicate(batch, keys, counts)
    flat = [m for doc in nested for m in doc]
    table = {k: pa.array(v, pa.string()) for k, v in out.items()}
    table["surface"] = pa.array([m["surface"] for m in flat], pa.string())
    table["entity_key"] = pa.array([m["entity_key"] for m in flat], pa.string())
    table["entity_type"] = pa.array([m["entity_type"] for m in flat], pa.string())
    table["n_occ"] = pa.array([m["n_occ"] for m in flat], pa.int64())
    table["first_pos"] = pa.array([m["first_pos"] for m in flat], pa.int64())
    return pa.table(table)


def explode_edges(batch: pa.Table) -> pa.Table:
    """Per-doc nested edges → one row per (doc, src, dst)."""
    keys = [c for c in DOC_KEY_COLUMNS if c in batch.column_names]
    nested = batch.column("edges").to_pylist()
    counts = [len(e) for e in nested]
    out = _replicate(batch, keys, counts)
    flat = [e for doc in nested for e in doc]
    table = {k: pa.array(v, pa.string()) for k, v in out.items()}
    table["src"] = pa.array([e["src"] for e in flat], pa.string())
    table["dst"] = pa.array([e["dst"] for e in flat], pa.string())
    table["weight"] = pa.array([e["weight"] for e in flat], pa.float64())
    table["description"] = pa.array([e["description"] for e in flat], pa.string())
    return pa.table(table)


def doc_triples(batch: pa.Table) -> pa.Table:
    """Relabeled edge rows → per-doc canonical triples.

    Expects columns ``src_canonical`` / ``dst_canonical`` (from
    :class:`~mmore_ray.stages.canonicalize.CanonicalRelabel`).  Merges
    weights of edges mapping to the same canonical pair *within each
    document*; complete within the batch (see module doc).
    """
    keys = [c for c in DOC_KEY_COLUMNS if c in batch.column_names]
    cols = {c: batch.column(c).to_pylist() for c in
            keys + ["src_canonical", "dst_canonical", "weight", "description"]}
    agg: dict[tuple, list] = {}
    order: list[tuple] = []
    n = batch.num_rows
    for i in range(n):
        a, b = cols["src_canonical"][i], cols["dst_canonical"][i]
        subj, obj = (a, b) if a <= b else (b, a)
        pred = cols["description"][i]
        key = tuple(cols[c][i] for c in keys) + (subj, pred, obj)
        slot = agg.get(key)
        if slot is None:
            agg[key] = [cols["weight"][i]]
            order.append(key)
        else:
            slot[0] += cols["weight"][i]
    table: dict[str, pa.Array] = {}
    for j, c in enumerate(keys):
        table[c] = pa.array([k[j] for k in order], pa.string())
    nk = len(keys)
    table["subj"] = pa.array([k[nk] for k in order], pa.string())
    table["pred"] = pa.array([k[nk + 1] for k in order], pa.string())
    table["obj"] = pa.array([k[nk + 2] for k in order], pa.string())
    table["weight"] = pa.array([agg[k][0] for k in order], pa.float64())
    return pa.table(table)


def partial_graph_rollup(batch: pa.Table) -> pa.Table:
    """Per-batch partial of the global graph aggregate: collapse this
    batch's triples to one row per (subj, pred, obj) before the global
    groupby shuffle (combiner pattern)."""
    cols = {c: batch.column(c).to_pylist() for c in ["subj", "pred", "obj", "weight"]}
    agg: dict[tuple[str, str, str], float] = {}
    for s, p, o, w in zip(cols["subj"], cols["pred"], cols["obj"], cols["weight"]):
        k = (s, p, o)
        agg[k] = agg.get(k, 0.0) + w
    items = list(agg.items())
    return pa.table(
        {
            "subj": pa.array([k[0] for k, _ in items], pa.string()),
            "pred": pa.array([k[1] for k, _ in items], pa.string()),
            "obj": pa.array([k[2] for k, _ in items], pa.string()),
            "weight": pa.array([w for _, w in items], pa.float64()),
        }
    )
