"""Tagger stages (reference §2.3: WordsCounter, ModalitiesCounter,
LangDetector, TextHash, FileNamer).

Reference taggers write into ``metadata.extra``; here each tagger is a
vectorized ``map_batches`` fn appending a flat column (the JSONL
compat writer in pipelines/process.py folds tag columns back into an
``extra`` dict on export).  Tag semantics match the reference:
``<attachment>`` tags are stripped before word counting / language
detection / hashing (tagger/{words,lang_detector,hash}.py)."""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import md5_hex, sha256_column
from .processors import ATTACHMENT_TAG

TAG_COLUMNS = ["word_count", "modalities_count", "lang", "text_md5",
               "content_sha256"]


def _clean_text_array(batch: pa.Table) -> pa.ChunkedArray:
    """The text column minus attachment tags, as an Arrow array
    (vectorized replace — taggers run per corpus document)."""
    import pyarrow.compute as pc

    return pc.replace_substring(batch.column("text"), ATTACHMENT_TAG, "")


def _clean_texts(batch: pa.Table) -> list[str]:
    return _clean_text_array(batch).to_pylist()


# re2's \s is ASCII-only; this class is the exact Python str.split()
# whitespace set (every cp where chr(c).isspace(), enumerated + fuzzed
# against len(t.split()) over 5k random unicode docs) so NBSP/U+2028-
# laden web text counts identically to the per-row reference semantics.
_PY_WS = (r"\t\n\x0b\x0c\r\x1c-\x1f \x85\xa0\x{1680}\x{2000}-\x{200a}"
          r"\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}")
_WORD_RUN = f"[^{_PY_WS}]+"


def tag_words(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    # len(text.split()) == number of non-whitespace runs — one Arrow
    # regex count
    counts = pc.count_substring_regex(
        _clean_text_array(batch), _WORD_RUN).cast(pa.int64())
    return batch.append_column("word_count", counts)


def tag_modalities(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    n = pc.list_value_length(batch.column("modalities")).cast(pa.int64())
    return batch.append_column("modalities_count", n)


def tag_lang(batch: pa.Table) -> pa.Table:
    from .text_analysis import detect_lang_batch

    # vectorized classifier — identical answers to per-row detect_lang
    langs = detect_lang_batch(_clean_text_array(batch).to_pandas())
    return batch.append_column("lang", pa.array(langs, pa.string()))


def tag_hash(batch: pa.Table) -> pa.Table:
    """MD5 for reference-TextHash parity + sha256 (engine identity)."""
    texts = _clean_texts(batch)
    batch = batch.append_column(
        "text_md5", pa.array([md5_hex(t) for t in texts], pa.string()))
    return batch.append_column(
        "content_sha256", pa.array(sha256_column(texts), pa.string()))


def tag_file_name(batch: pa.Table) -> pa.Table:
    if "file_name" in batch.column_names:
        return batch
    names = [p.rsplit("/", 1)[-1]
             for p in batch.column("file_path").to_pylist()]
    return batch.append_column("file_name", pa.array(names, pa.string()))


ALL_TAGGERS = {
    "words": tag_words,
    "modalities": tag_modalities,
    "lang": tag_lang,
    "hash": tag_hash,
    "file_name": tag_file_name,
}
