"""Remaining reference post-processors: NER tagger, metadata infusion,
translator (SURVEY §2.3 rows NERecognizer / MetaDataInfusor /
TranslatorPostProcessor)."""

from __future__ import annotations

from functools import lru_cache

import pyarrow as pa

NER_STRUCT = pa.struct([
    ("entity", pa.string()),
    ("type", pa.string()),
    ("description", pa.list_(pa.string())),
])


def make_ner_tagger(**scanner_kwargs):
    """≙ NERecognizer (ner/ner.py:18-31) with the NERExtractorConfig
    surface (ner/extractor.py:26-33) exposed: ``gazetteer_path``,
    ``entity_types``, ``tuple_delimiter``, ``record_delimiter`` pass
    through to :class:`mentions.MentionScanner`.  Runs extraction per
    sample and stores the graph NODES into a column (the reference
    persists nodes only into ``metadata.extra['ner']``; edges flow
    through the KG pipeline instead, SURVEY §7.5)."""
    from .mentions import MentionScanner

    scanner = MentionScanner(**scanner_kwargs)

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            mentions, _ = scanner._scan(text)
            graph_nodes = {}
            for m in mentions:
                graph_nodes[m["entity_key"]] = {
                    "entity": m["entity_key"],
                    "type": m["entity_type"],
                    "description": [f"MENTION OF {m['entity_key']}"],
                }
            out.append(list(graph_nodes.values()))
        return batch.append_column("ner", pa.array(out, pa.list_(NER_STRUCT)))

    return fn


def tag_ner(batch: pa.Table) -> pa.Table:
    """Default-config NER tagger (scanner compiled once per worker)."""
    global _NER_FN
    try:
        fn = _NER_FN
    except NameError:
        fn = _NER_FN = make_ner_tagger()
    return fn(batch)


def metadata_infusor(template: str, position: str = "prepend"):
    """≙ MetaDataInfusor (metafuse/base.py:21-61): format the template
    from row fields and prepend/append it to text."""

    def fn(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        texts = []
        for r in rows:
            infix = template.format_map({k: ("" if v is None else v)
                                         for k, v in r.items()})
            body = r["text"] or ""  # null text row must not crash
            texts.append(infix + "\n" + body if position == "prepend"
                         else body + "\n" + infix)
        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(texts, pa.string()))

    return fn


@lru_cache(maxsize=1)
def _xlate_tables() -> dict[tuple[str, str], dict[str, str]]:
    """Deterministic word-level translation tables: positional zips of
    the stopword profiles, so (xx→en) is the exact inverse of (en→xx).
    The argos stand-in — word-for-word, unknown words pass through.
    Cached: this runs once per segment per row on the translator hot
    path — rebuilding all eight pair tables per call is pure waste."""
    from .text_analysis import LANG_PROFILES

    en = LANG_PROFILES["en"]
    tables: dict[tuple[str, str], dict[str, str]] = {}
    for lang, words in LANG_PROFILES.items():
        if lang == "en":
            continue
        tables[(lang, "en")] = dict(zip(words, en))
        tables[("en", lang)] = dict(zip(en, words))
    return tables


def dictionary_translate(text: str, from_code: str, to_code: str) -> str:
    """Deterministic dictionary translation (the argos-translate
    stand-in): space-tokenized word map, unknown words unchanged."""
    table = _xlate_tables().get((from_code, to_code), {})
    return " ".join(table.get(w, w) for w in text.split(" "))


def translator(target_lang: str = "en", confidence: float = 0.0,
               attachment_tag: str = "<attachment>",
               translate_fn=dictionary_translate):
    """≙ TranslatorPostProcessor (translator/base.py:29,87-126).

    Full observable contract: classify (lang + confidence); skip when
    already in the target language, unknown, or confidence ≤ threshold;
    otherwise split on the attachment tag (tags must never reach the
    translator), translate each segment, rejoin with the tag, and
    preserve the pre-translation text in ``original_text``.

    ``translate_fn(text, from_code, to_code)`` defaults to the
    deterministic dictionary stand-in (argos-translate is not in this
    env); swap in a real engine via this hook."""

    def fn(batch: pa.Table) -> pa.Table:
        from .text_analysis import detect_lang_scored

        texts = batch.column("text").to_pylist()
        out_texts, originals = [], []
        for t in texts:
            if not t:  # null/empty rows pass through untranslated
                out_texts.append(t)
                originals.append("")
                continue
            lang, score = detect_lang_scored(t)
            if lang == target_lang or lang == "unknown" or score <= confidence:
                out_texts.append(t)
                originals.append("")
                continue
            segments = t.split(attachment_tag)
            translated = attachment_tag.join(
                translate_fn(s, lang, target_lang) for s in segments)
            out_texts.append(translated)
            originals.append(t)
        # re-applied stage / resumed output: replace an existing
        # original_text instead of appending a duplicate field (a
        # twice-present column KeyErrors every later select)
        if "original_text" in batch.column_names:
            oidx = batch.schema.get_field_index("original_text")
            batch = batch.set_column(oidx, "original_text",
                                     pa.array(originals, pa.string()))
        else:
            batch = batch.append_column(
                "original_text", pa.array(originals, pa.string()))
        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(out_texts, pa.string()))

    return fn
