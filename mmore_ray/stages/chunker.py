"""Markdown-table-aware chunking (reference §2.3 ``MultimodalChunker``).

Semantics mirrored from the reference chunker
(``post_processor/chunker/multimodal.py`` + ``chunker/utils.py``, spec
only — fresh implementation):

  * markdown tables are detected line-wise (header row, separator row,
    data rows); detection is anchored per line so a pipe-line missing
    its closing ``|`` is rejected in linear time (the reference guards
    against regex backtracking, tests/test_postprocessors.py:480-485);
  * table chunking modes: ``single_row`` (header+separator prepended to
    every data row), ``multi_rows`` (greedy packing of rows under the
    size budget, header prepended per chunk), ``keep_whole`` (one chunk
    per table), ``none`` (table text flows as prose);
  * prose is chunked by sentence groups (``chunk_size`` sentences) —
    the reference's default chonkie SentenceChunker shape — or by word
    windows;
  * chunk ids are ``f"{sample_id}+{i}"`` and ``document_id`` stays the
    parent id (multimodal.py:241, type.py:91-92);
  * ``<attachment>`` tags keep their positions: the n-th tag in a chunk
    binds the n-th remaining modality (multimodal.py:66-84).
"""

from __future__ import annotations

import re

import pyarrow as pa

from .processors import ATTACHMENT_TAG, MODALITY_STRUCT

_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|(?:\s*:?-+:?\s*\|)+\s*$")
_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def detect_markdown_tables(text: str) -> list[tuple[int, int]]:
    """Return (start_line, end_line_exclusive) for each table block.

    A block needs a header row immediately followed by a separator row,
    then zero or more data rows.  Line-anchored matching only — no
    multi-line regex, so pathological pipe strings stay linear."""
    lines = text.splitlines()
    blocks: list[tuple[int, int]] = []
    i = 0
    n = len(lines)
    while i < n:
        if (_TABLE_ROW_RE.match(lines[i]) and i + 1 < n
                and _TABLE_SEP_RE.match(lines[i + 1])):
            j = i + 2
            while j < n and _TABLE_ROW_RE.match(lines[j]) \
                    and not _TABLE_SEP_RE.match(lines[j]):
                j += 1
            blocks.append((i, j))
            i = j
        else:
            i += 1
    return blocks


def split_sentences(text: str) -> list[str]:
    parts = [p for p in _SENTENCE_SPLIT_RE.split(text.strip()) if p]
    return parts


def chunk_prose(text: str, chunk_size: int = 2, unit: str = "sentence") -> list[str]:
    """Group ``chunk_size`` units per chunk.

    Units mirror the reference's chonkie strategy set
    (``chunker/utils.py:344-354`` load_chonkie): ``sentence`` (default
    SentenceChunker shape), ``word`` (WordChunker), ``token``
    (TokenChunker over the BPE-ish pre-tokenizer — chunk text is the
    raw slice spanning its tokens, so nothing is lost between token
    boundaries), and ``semantic`` (SemanticChunker shape —
    embedding-similarity grouping, :func:`chunk_semantic`)."""
    if not text.strip():
        return []
    if unit == "token":
        from .text_analysis import _TOKEN_RE

        # the attachment tag is ATOMIC here: the plain pre-tokenizer
        # would split it into '<', 'attachment', '>' and a chunk
        # boundary inside the literal would drop its modality binding
        tag_re = re.compile(re.escape(ATTACHMENT_TAG) + "|"
                            + _TOKEN_RE.pattern)
        spans = [m.span() for m in tag_re.finditer(text)]
        out = []
        for i in range(0, len(spans), chunk_size):
            j = min(i + chunk_size, len(spans))
            # contiguous slices: each chunk runs to the NEXT group's
            # start, so inter-token text is never silently elided
            end = spans[j][0] if j < len(spans) else spans[-1][1]
            out.append(text[spans[i][0]:end].rstrip())
        return out
    if unit == "semantic":
        return chunk_semantic(text, max_sentences=max(chunk_size, 1))
    if unit not in ("sentence", "word"):
        # an unknown unit silently falling through to word chunking
        # would make a YAML typo ('sentences') produce wrong chunks
        # with no error — same contract as chunk_table's mode check
        raise ValueError(f"unknown chunk unit {unit!r}: expected "
                         "sentence|word|token|semantic")
    parts = split_sentences(text) if unit == "sentence" else text.split()
    sep = " "
    return [sep.join(parts[i:i + chunk_size])
            for i in range(0, len(parts), chunk_size)]


def _bow_vector(text: str, dim: int = 64) -> "np.ndarray":
    """Deterministic hashed bag-of-words unit vector (feature hashing).
    Real lexical locality — sentences sharing words have high cosine —
    which is what the semantic grouping needs; a neural encoder would
    swap in here as an actor-pool stage."""
    import zlib

    import numpy as np

    v = np.zeros(dim, dtype=np.float64)
    for w in text.lower().split():
        h = zlib.crc32(w.encode())
        v[h % dim] += 1.0 if (h >> 16) & 1 else -1.0  # signed hashing
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def chunk_semantic(text: str, threshold: float = 0.3,
                   max_sentences: int = 8, dim: int = 64) -> list[str]:
    """SemanticChunker shape: grow a sentence group while each next
    sentence stays cosine-similar to the group centroid; break below
    ``threshold`` or at ``max_sentences``."""
    import numpy as np

    sents = split_sentences(text)
    if not sents:
        return []
    vecs = [_bow_vector(s, dim) for s in sents]
    chunks: list[str] = []
    group = [sents[0]]
    centroid = vecs[0].copy()
    for s, v in zip(sents[1:], vecs[1:]):
        n = np.linalg.norm(centroid)
        sim = float(centroid @ v / n) if n > 0 else 0.0
        if sim < threshold or len(group) >= max_sentences:
            chunks.append(" ".join(group))
            group, centroid = [s], v.copy()
        else:
            group.append(s)
            centroid += v
    chunks.append(" ".join(group))
    return chunks


def chunk_table(lines: list[str], mode: str = "single_row",
                max_rows: int = 8) -> list[tuple[str, bool, str, int]]:
    """Chunk one table block → [(chunk_text, is_table_chunk, header,
    dup_tags)].

    ``lines`` = header, separator, data rows.  ``dup_tags`` counts the
    ``<attachment>`` occurrences that are REPLICATED header/separator
    text (every chunk after the first): the reference binds modalities
    by tag offsets in the ORIGINAL document (multimodal.py:68-84), so a
    replicated header must not re-consume the modality cursor —
    without this, a header tag steals the next chunk's modality."""
    header, sep = lines[0].strip(), lines[1].strip()
    data = [ln.strip() for ln in lines[2:]]
    hdr_tags = (header + sep).count(ATTACHMENT_TAG)
    if mode == "keep_whole":
        return [("\n".join([header, sep, *data]), True, header, 0)]
    if mode == "single_row":
        if not data:
            return [("\n".join([header, sep]), True, header, 0)]
        return [("\n".join([header, sep, row]), True, header,
                 0 if i == 0 else hdr_tags)
                for i, row in enumerate(data)]
    if mode == "multi_rows":
        out = []
        for i in range(0, max(len(data), 1), max_rows):
            rows = data[i:i + max_rows]
            out.append(("\n".join([header, sep, *rows]), True, header,
                        0 if i == 0 else hdr_tags))
        return out
    # table_mode == "none" never reaches here (chunk_document detects
    # no tables then) — any other value is a config error
    raise ValueError(f"unknown table_mode: {mode!r}")


def chunk_document(text: str, chunk_size: int = 2, unit: str = "sentence",
                   table_mode: str = "single_row",
                   max_rows: int = 8) -> list[tuple[str, bool, str, int]]:
    """Full document → ordered [(chunk_text, is_table_chunk, header,
    dup_tags)] — see :func:`chunk_table` for dup_tags."""
    lines = text.splitlines()
    blocks = detect_markdown_tables(text) if table_mode != "none" else []
    chunks: list[tuple[str, bool, str, int]] = []
    cursor = 0
    for start, end in blocks:
        prose = "\n".join(lines[cursor:start])
        chunks.extend((c, False, "", 0)
                      for c in chunk_prose(prose, chunk_size, unit))
        chunks.extend(chunk_table(lines[start:end], table_mode, max_rows))
        cursor = end
    tail = "\n".join(lines[cursor:])
    chunks.extend((c, False, "", 0)
                  for c in chunk_prose(tail, chunk_size, unit))
    if not chunks:
        # empty / whitespace-only document: keep ONE empty chunk so the
        # doc stays in the output and the incremental manifest — a doc
        # that vanishes entirely is re-crawled and re-processed forever
        chunks.append(("", False, "", 0))
    return chunks


def chunk_batch(batch: pa.Table, chunk_size: int = 2, unit: str = "sentence",
                table_mode: str = "single_row", max_rows: int = 8) -> pa.Table:
    """Flat-map stage: sample rows → chunk rows (1→N).

    Expects processors.SAMPLE_SCHEMA-shaped input; emits the same shape
    plus chunk metadata, with modalities redistributed by
    ``<attachment>`` occurrence order."""
    own = ("sample_id", "document_id", "text", "modalities",
           "file_path", "file_name", "processor_type",
           "chunk_idx", "is_table_chunk", "table_header")
    out = {k: [] for k in own}
    cols = {c: batch.column(c).to_pylist() for c in batch.column_names}
    # pass-through columns (e.g. tag columns added upstream) replicate
    # their parent value onto every chunk
    extra_cols = [c for c in batch.column_names if c not in own]
    extra_out: dict[str, list] = {c: [] for c in extra_cols}
    for r in range(batch.num_rows):
        sample_id = cols["sample_id"][r]
        modalities = list(cols["modalities"][r] or [])
        mod_cursor = 0
        # null text chunks as '' (the repo-wide null-text convention;
        # None.splitlines() would kill the whole map task)
        pieces = chunk_document(cols["text"][r] or "", chunk_size, unit,
                                table_mode, max_rows)
        for i, (ctext, is_table, header, dup_tags) in enumerate(pieces):
            # tags minus the replicated-header copies: only tags from
            # the chunk's ORIGINAL text span consume modalities
            n_tags = max(ctext.count(ATTACHMENT_TAG) - dup_tags, 0)
            mods = modalities[mod_cursor:mod_cursor + n_tags]
            mod_cursor += n_tags
            out["sample_id"].append(f"{sample_id}+{i}")
            out["document_id"].append(sample_id)
            out["text"].append(ctext)
            out["modalities"].append(mods)
            out["file_path"].append(cols["file_path"][r])
            out["file_name"].append(cols["file_name"][r])
            out["processor_type"].append(cols["processor_type"][r])
            out["chunk_idx"].append(i)
            out["is_table_chunk"].append(is_table)
            out["table_header"].append(header)
            for c in extra_cols:
                extra_out[c].append(cols[c][r])
    table = pa.table({
        "sample_id": pa.array(out["sample_id"], pa.string()),
        "document_id": pa.array(out["document_id"], pa.string()),
        "text": pa.array(out["text"], pa.string()),
        "modalities": pa.array(out["modalities"], pa.list_(MODALITY_STRUCT)),
        "file_path": pa.array(out["file_path"], pa.string()),
        "file_name": pa.array(out["file_name"], pa.string()),
        "processor_type": pa.array(out["processor_type"], pa.string()),
        "chunk_idx": pa.array(out["chunk_idx"], pa.int64()),
        "is_table_chunk": pa.array(out["is_table_chunk"], pa.bool_()),
        "table_header": pa.array(out["table_header"], pa.string()),
    })
    for c in extra_cols:
        table = table.append_column(
            c, pa.array(extra_out[c], batch.schema.field(c).type))
    return table
