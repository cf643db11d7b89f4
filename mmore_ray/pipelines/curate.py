"""Training-data curation pipeline: the standard pre-training ladder
(quality gates → language ID → exact dedup → near-dup dedup) as ONE
streaming Ray Data flow.

This is the composition a large-scale curation job actually runs (the
reference exposes the stages separately: taggers + DatatroveFilter
post-processors, SURVEY §2.3); every stage here is the engine's
already-oracle-checked operator, so the whole ladder is SQL-checkable
end-to-end (``q_curate``).

Scale shape per stage:

* annotate+gate — one vectorized ``map_batches`` (no shuffle; the
  quality/lang kernels are the 100-TB per-byte hot path and reuse the
  compiled-regex batch implementations in stages/text_analysis.py);
* exact dedup — bucketed keep-min (stages/dedup.exact_dedup), joined
  back adaptively (stages/joins.lookup_join: broadcast when small,
  hash join when not);
* near-dup — EXACT n-gram Jaccard (stages/dedup.near_dup_jaccard,
  zero false negatives) with the drop-higher-id policy: any doc that
  appears as ``id_b`` of a verified pair is dropped via the adaptive
  distributed anti-join (stages/joins.anti_join — a dup-heavy corpus's
  pair ids never gather on the driver).  Single-linkage clustering is
  available separately (stages/canonicalize) when the transitive
  policy is wanted.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import numpy as np
import pandas as pd


class _SpillPoint:
    """A two-consumer intermediate checkpointed to parquet, re-read
    lazily (with per-consumer column pruning) instead of pinned in the
    object store.

    ``Dataset.materialize()`` here would hold the full TEXT-bearing
    corpus in the object store (~1× corpus bytes spilled at 100 TB);
    writing it to parquet once and re-reading streams each consumer
    from disk, so peak store usage is streaming-block-scale.

    Ray writes NO files for an empty dataset, and 0-row blocks are
    never handed to downstream ``map_batches`` fns — so a schema for
    the empty case cannot be observed at this spill point.  Re-running
    the upstream pipeline just to recover one would double the most
    expensive scan; instead the PRODUCING stage records its output
    schema from a batch that still has input rows (``_record_schema``
    inside ``curate.annotate``) into the spill dir's side file, and the
    empty case reads that."""

    def __init__(self, ds, path: str, filesystem=None):
        import pyarrow.fs as pafs

        from ..stages.sortwrite import _resolve_fs

        self._fs = _resolve_fs(filesystem)
        # Ray's write_parquet APPENDS uniquely-named files: a reused
        # scratch_dir would resurface the PREVIOUS run's rows as live
        # data on re-read, so each spill point owns a fresh directory
        if self._fs.get_file_info(path).type != pafs.FileType.NotFound:
            self._fs.delete_dir(path)
        self._fs.create_dir(path, recursive=True)
        ds.write_parquet(path, filesystem=self._fs)
        has_files = any(
            fi.base_name.endswith(".parquet")
            for fi in self._fs.get_file_info(pafs.FileSelector(path)))
        self._path = path if has_files else None
        self._schema = (None if has_files
                        else _read_sidecar_schema(_schema_sidecar(path),
                                                  self._fs))

    @property
    def is_empty(self) -> bool:
        # zero files written ⇔ zero rows (the only case that falls back)
        return self._path is None

    @property
    def schema(self):
        """Arrow schema, or None for a blockless (never-executed-a-
        batch) input — only possible when the caller's dataset itself
        had no blocks."""
        if self._path is None:
            return self._schema
        from ..sources.readers import clean_schema

        return clean_schema(self._path, filesystem=self._fs)

    @property
    def column_names(self) -> list[str]:
        return list(self._require_schema().names)

    def read(self, columns: list[str] | None = None):
        if self._path is None:
            return _empty_dataset(self._require_schema(), columns)
        from ..sources.readers import read_parquet_clean

        return read_parquet_clean(self._path, columns=columns,
                                  filesystem=self._fs)

    def _require_schema(self):
        """Reading an empty spill whose producer recorded no sidecar is
        a producer-contract violation — fail loudly rather than hand
        downstream a silent zero-column dataset."""
        schema = self.schema
        if schema is None:
            raise RuntimeError(
                "empty spill point has no recorded schema — the "
                "producing stage must call _record_schema on a "
                "row-bearing batch (see _SpillPoint docstring)")
        return schema


def _schema_sidecar(path: str) -> str:
    # a directory: one file per worker PROCESS (its running unified
    # schema) — pyarrow dataset discovery ignores the "_" prefix
    return f"{path.rstrip('/')}/_schema"


# per-process state: [run_token, dtype_signature, unified Schema] per
# sidecar dir — token-scoped so a reused scratch_dir's NEXT run never
# unifies against (or skips re-writing over) a previous run's schema
_SCHEMA_CACHE: dict = {}
_PROC_TAG: str | None = None  # unique per process ACROSS nodes (pid alone
#                               collides between container pid namespaces)


def _record_schema(df, sidecar_dir: str, run_token: str,
                   filesystem=None) -> None:
    """Record ``df``'s Arrow schema into the sidecar dir, unified with
    every schema this process has seen for it THIS RUN — the reader
    unifies the per-process files again, so the recorded schema is the
    SAME regardless of block order (a nullable int64 carry converts to
    float64 only in null-bearing pandas blocks; first-batch-wins would
    make the empty-output dtype nondeterministic).  Call with a frame
    that HAS rows: inference on a 0-row pandas frame degrades object
    columns to Arrow ``null``.

    Hot-path cost: one dtype-signature compare per batch;
    ``Schema.from_pandas`` (which scans object columns) and the file
    write run only when the pandas dtype signature changes — the fresh
    ``run_token`` per curate() call makes same-run cache hits safe
    (the spill dir is wiped only before execution, never during).

    All file IO routes through ``filesystem`` (``pyarrow.fs``; local
    default) — the sidecar works on the same exchange medium as the
    spill itself."""
    import pyarrow as pa

    from ..stages.sortwrite import _resolve_fs

    global _PROC_TAG
    if _PROC_TAG is None:
        import uuid
        _PROC_TAG = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
    sig = (tuple(df.columns), tuple(str(t) for t in df.dtypes))
    slot = _SCHEMA_CACHE.get(sidecar_dir)
    if slot is not None and slot[0] != run_token:
        slot = None  # stale: a previous run of a reused scratch_dir
    if slot is not None and slot[1] == sig:
        return
    fs = _resolve_fs(filesystem)
    out = f"{sidecar_dir}/{_PROC_TAG}.arrowipc"
    s = pa.Schema.from_pandas(df, preserve_index=False)
    if slot is not None:
        s = pa.unify_schemas([slot[2], s], promote_options="permissive")
    else:
        # the slot may have been lost (cache bound below, or a retried
        # task after a write failure) while THIS RUN's file survives —
        # the spill dir was wiped before execution, so any existing
        # file of ours is this run's: unify rather than overwrite, or
        # an earlier nullable promotion would be silently dropped
        import pyarrow.fs as pafs

        if fs.get_file_info(out).type != pafs.FileType.NotFound:
            with fs.open_input_stream(out) as f:
                prev = pa.ipc.read_schema(pa.py_buffer(f.read()))
            s = pa.unify_schemas([prev, s], promote_options="permissive")
    fs.create_dir(sidecar_dir, recursive=True)
    # per-process-unique name (pid+uuid: container pid namespaces
    # collide across nodes); tmp+move so a reader never sees a partial
    # file even on filesystems without atomic rename
    tmp = f"{out}.tmp"
    with fs.open_output_stream(tmp) as f:
        f.write(s.serialize().to_pybytes())
    fs.move(tmp, out)
    # cache only AFTER the write succeeded: a transient fs error on a
    # retried task must not leave a sig hit with no file behind it
    if len(_SCHEMA_CACHE) > 64:  # bound: dead-tempdir keys never recur
        _SCHEMA_CACHE.clear()
    _SCHEMA_CACHE[sidecar_dir] = [run_token, sig, s]


def _read_sidecar_schema(sidecar_dir: str, filesystem=None):
    import pyarrow as pa
    import pyarrow.fs as pafs

    from ..stages.sortwrite import _resolve_fs

    fs = _resolve_fs(filesystem)
    sel = pafs.FileSelector(sidecar_dir, allow_not_found=True)
    schemas = []
    for fi in sorted(fs.get_file_info(sel), key=lambda fi: fi.path):
        if not fi.base_name.endswith(".arrowipc"):
            continue
        with fs.open_input_stream(fi.path) as f:
            schemas.append(pa.ipc.read_schema(pa.py_buffer(f.read())))
    if not schemas:
        return None
    return pa.unify_schemas(schemas, promote_options="permissive")


def _empty_dataset(schema, columns: list[str] | None = None):
    """A 0-row Dataset that still REPORTS ``schema``'s columns.
    ``from_arrow`` on a 0-row table yields a blockless dataset that
    forgets its schema; routing through one dummy block keeps a real
    0-row Arrow block downstream consumers can see columns on."""
    import pyarrow as pa
    import ray.data

    fields = ([(n, t) for n, t in zip(schema.names, schema.types)]
              if schema is not None else [])
    if columns is not None:
        # match clean_schema semantics: requested ORDER is preserved and
        # an unknown name fails loudly — the non-empty parquet path
        # raises on it, so the empty path must not silently diverge
        by_name = dict(fields)
        missing = [n for n in columns if n not in by_name]
        if missing:
            raise KeyError(
                f"columns not in spill schema: {missing} "
                f"(schema has {sorted(by_name)})")
        fields = [(n, by_name[n]) for n in columns]
    empty = pa.table({n: pa.array([], t) for n, t in fields})
    return ray.data.from_items([{"_": 0}]).map_batches(
        lambda _b: empty, batch_format="pyarrow")


def curate(ds, text_col: str = "text", id_col: str = "doc_id",
           min_words: int = 20, min_stop_e4: int = 200, lang: str = "en",
           jaccard: float = 0.5, num_buckets: int = 64,
           carry_cols: tuple[str, ...] = (),
           group_cap="default",
           scratch_dir: str | None = None,
           filesystem=None):
    """(id, text) Dataset → curated Dataset with columns
    (doc_id, word_count, stop_ratio_e4, lang_pred, n_dupes).

    ``n_dupes`` counts the exact-duplicate group size the surviving doc
    represents (provenance for loss-weighting / dedup accounting).
    ``carry_cols`` names extra input columns to pass through unchanged
    (e.g. a redaction count from an upstream scrub stage).

    ``group_cap`` forwards to the near-dup blocking stage
    (stages/dedup._cap_group_members): the production default bounds
    quadratic pair emission per blocking group; pass ``None`` for the
    exact (uncapped) pair set — the oracle-checked query wrappers do,
    so the SQL comparison stays apples-to-apples on ANY corpus.

    ``scratch_dir``: where the annotated corpus (the one text-bearing
    intermediate) spills as parquet (kept across the run for
    inspection); default a private temp dir removed before returning.

    ``filesystem``: optional ``pyarrow.fs.FileSystem`` the scratch
    lives on — pass an ``S3FileSystem``/``GcsFileSystem`` with a
    bucket-relative ``scratch_dir`` and the spill exchange needs no
    shared POSIX FS (same contract as stages/sortwrite); requires an
    explicit ``scratch_dir`` and leaves it in place."""
    from ..stages.dedup import (DEFAULT_GROUP_CAP, exact_dedup,
                                near_dup_jaccard)
    from ..stages.joins import anti_join, lookup_join
    from ..stages.text_analysis import detect_lang_batch, quality_stats

    if group_cap == "default":
        group_cap = DEFAULT_GROUP_CAP

    if filesystem is not None and scratch_dir is None:
        raise ValueError("a non-local filesystem needs an explicit "
                         "scratch_dir (a path WITHIN that filesystem)")
    own_scratch = scratch_dir is None
    spill_root = scratch_dir or tempfile.mkdtemp(prefix="mmore_ray_curate_")
    annotated_dir = f"{spill_root.rstrip('/')}/annotated"
    import uuid
    run_token = uuid.uuid4().hex  # scopes worker schema caches to this run

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        qs = quality_stats(df, text_col)
        langs = detect_lang_batch(df[text_col])
        out = pd.DataFrame({
            "doc_id": df[id_col].astype(np.int64),
            "text": df[text_col],
            "word_count": qs["word_count"].to_numpy(),
            "stop_ratio_e4": qs["stop_ratio_e4"].to_numpy(),
            "lang_pred": langs,
        })
        for c in carry_cols:
            out[c] = df[c].to_numpy()
        if len(out):
            # schema capture for the everything-filtered case: 0-row
            # blocks never reach a downstream map fn, so the empty
            # fallback cannot observe dtypes anywhere else without
            # re-running this (hot-path) scan.  Text is dropped: the
            # empty path never reads it, and object-column inference
            # over full document texts is the one expensive part
            _record_schema(out.drop(columns=["text"]),
                           _schema_sidecar(annotated_dir), run_token,
                           filesystem=filesystem)
        keep = ((out["word_count"].to_numpy() >= min_words)
                & (out["stop_ratio_e4"].to_numpy() >= min_stop_e4)
                & (langs == lang))
        return out[keep].reset_index(drop=True)

    try:
        # checkpoint the annotated corpus to parquet, not the object
        # store: both consumers below re-read it streaming, and the
        # dedup scan prunes to (doc_id, text)
        kept = _SpillPoint(ds.map_batches(annotate, batch_format="pandas"),
                           annotated_dir, filesystem=filesystem)
        if kept.is_empty:
            # a blockless empty dataset loses its schema through the
            # bucketed dedup aggregations — build the (empty) output
            # with the contract schema directly
            import pyarrow as pa

            schema = kept.schema
            if schema is not None and schema.names:
                # the captured Arrow schema preserves real carry dtypes
                # (an int64 carry stays int64); a 0-row pandas OBJECT
                # column infers as Arrow `null` — those are the string
                # columns (text/lang_pred/string carries)
                fields = [(n, pa.string() if pa.types.is_null(t) else t)
                          for n, t in zip(schema.names, schema.types)
                          if n != "text"]
            else:  # blockless input: fall back to the contract dtypes
                fields = [("doc_id", pa.int64()), ("word_count", pa.int64()),
                          ("stop_ratio_e4", pa.int64()),
                          ("lang_pred", pa.string())]
                fields += [(c, pa.string()) for c in carry_cols]
            fields += [("n_dupes", pa.int64())]
            return _empty_dataset(pa.schema(fields))

        # exact dedup: keep the minimum id per content; n_dupes rides
        # along.  `groups` feeds TWO joins below — materialize it ONCE
        # (metadata-width: keep_id + n_dupes) so the bucketed dedup
        # shuffle doesn't execute twice; pinning id-scale bytes is the
        # accepted checkpoint cost, the TEXT column never is.
        groups = exact_dedup(kept.read(["doc_id", "text"]),
                             text_col="text", id_col="doc_id",
                             num_buckets=num_buckets).materialize()

        # the two survivor views derive straight from the annotated
        # spill (a second text-bearing spill would re-WRITE the whole
        # corpus; the broadcast/hash join is far cheaper to run twice):
        # text view for the near-dup scan, text-free view for the output
        survivors_text = lookup_join(kept.read(["doc_id", "text"]),
                                     groups.select_columns(["keep_id"]),
                                     "doc_id", "keep_id")

        # near-dup: exact Jaccard pairs; drop every id_b (id_a < id_b).
        # anti_join keeps the drop set distributed (broadcast only when
        # small; a dup-heavy corpus's pair ids never gather on the
        # driver) and runs on the TEXT-FREE projection — text never
        # enters the final exchange
        pairs = near_dup_jaccard(survivors_text,
                                 text_col="text", id_col="doc_id",
                                 threshold=jaccard, num_buckets=num_buckets,
                                 group_cap=group_cap)
        meta_cols = [c for c in kept.column_names if c != "text"]
        survivors_meta = lookup_join(
            kept.read(meta_cols),
            groups.select_columns(["keep_id", "n_dupes"]),
            "doc_id", "keep_id")
        out = anti_join(survivors_meta,
                        pairs.select_columns(["id_b"]), "doc_id", "id_b")
        # the result is metadata-width (no text): materializing it pins
        # metadata-scale bytes only, and lets the scratch dir go away
        return out.materialize()
    finally:
        if own_scratch:
            shutil.rmtree(spill_root, ignore_errors=True)


def curate_full(ds, benchmark_texts: list[str], text_col: str = "text",
                id_col: str = "doc_id", decontam_k: int = 8, **curate_kw):
    """The FULL published pre-training recipe as one streaming flow:
    benchmark decontamination (drop) → PII redaction → quality gates →
    language ID → exact dedup → near-dup dedup.

    Decontamination runs FIRST on raw text (published practice: eval
    overlap is judged on the original n-grams, before any rewriting);
    redaction then rewrites text IN PLACE, so every downstream hash /
    shingle / gate operates on the scrubbed corpus — the output is what
    the trainer would actually see.  All stages are the engine's
    oracle-checked operators; the composition is itself SQL-checkable
    end-to-end (q_curate_full).  Adds ``n_redactions`` to the q_curate
    output columns."""
    from ..stages.dedup import decontaminate
    from ..stages.scrub import redact_pii

    clean = decontaminate(ds, benchmark_texts, text_col=text_col,
                          k=decontam_k, mode="drop")
    scrubbed = redact_pii(clean, text_col=text_col)
    # merge caller carry_cols rather than shadowing them (passing both
    # through **curate_kw would raise "multiple values for carry_cols")
    carry = ("n_redactions", *curate_kw.pop("carry_cols", ()))
    return curate(scrubbed, text_col=text_col, id_col=id_col,
                  carry_cols=carry, **curate_kw)
