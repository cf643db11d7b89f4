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


def _explode(batch: pa.Table, list_col: str, fields: list[str]) -> pa.Table:
    """Zero-copy explode of a list<struct> column: flatten() exposes the
    child struct arrays without materializing Python objects; the doc
    key columns replicate via vectorized take on parent indices."""
    import pyarrow.compute as pc

    keys = [c for c in DOC_KEY_COLUMNS if c in batch.column_names]
    la = batch.column(list_col).combine_chunks()
    if isinstance(la, pa.ChunkedArray):  # single chunk after combine
        la = la.chunk(0)
    idx = pc.list_parent_indices(la)
    flat = la.flatten()
    cols: dict[str, pa.Array] = {
        c: pc.take(batch.column(c), idx) for c in keys
    }
    for f in fields:
        cols[f] = flat.field(f)
    return pa.table(cols)


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Per-doc nested mentions → one row per (doc, surface)."""
    return _explode(batch, "mentions",
                    ["surface", "entity_key", "entity_type", "n_occ",
                     "first_pos"])


def explode_edges(batch: pa.Table) -> pa.Table:
    """Per-doc nested edges → one row per (doc, src, dst)."""
    return _explode(batch, "edges", ["src", "dst", "weight", "description"])


def doc_triples(batch: pa.Table) -> pa.Table:
    """Relabeled edge rows → per-doc canonical triples (vectorized).

    Expects columns ``src_canonical`` / ``dst_canonical``.  Merges
    weights of edges mapping to the same canonical pair *within each
    document*; complete within the batch (see module doc).
    """
    import numpy as np

    keys = [c for c in DOC_KEY_COLUMNS if c in batch.column_names]
    df = batch.select(
        keys + ["src_canonical", "dst_canonical", "weight", "description"]
    ).to_pandas()
    a = df["src_canonical"].to_numpy()
    b = df["dst_canonical"].to_numpy()
    swap = a > b
    df["subj"] = np.where(swap, b, a)
    df["obj"] = np.where(swap, a, b)
    df = df.rename(columns={"description": "pred"})
    # dropna=False: a null doc-key column must not silently delete a
    # document's triples while lineage still counts its edges
    g = df.groupby(keys + ["subj", "pred", "obj"], as_index=False,
                   sort=False, dropna=False)["weight"].sum()
    return _typed(g, keys + ["subj", "pred", "obj"])


def _typed(g, str_cols: list[str]) -> pa.Table:
    """pandas frame → Arrow with an EXPLICIT schema and no pandas
    metadata blob: an empty frame would otherwise emit null-typed
    string columns (un-concat-able with real blocks in the rollup /
    sorted-write merges), and the metadata makes block schemas
    unhashable (Ray's schema-dedup slow path, readers.py doc)."""
    fields = [pa.field(c, pa.string()) for c in str_cols]
    fields.append(pa.field("weight", pa.float64()))
    return pa.Table.from_pandas(
        g, schema=pa.schema(fields),
        preserve_index=False).replace_schema_metadata(None)


def partial_graph_rollup(batch: pa.Table) -> pa.Table:
    """Per-batch partial of the global graph aggregate: collapse this
    batch's triples to one row per (subj, pred, obj) before the global
    groupby shuffle (combiner pattern)."""
    df = batch.select(["subj", "pred", "obj", "weight"]).to_pandas()
    g = df.groupby(["subj", "pred", "obj"], as_index=False,
                   sort=False, dropna=False)["weight"].sum()
    return _typed(g, ["subj", "pred", "obj"])
