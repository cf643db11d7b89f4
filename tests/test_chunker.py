"""Chunker tests — ported from the reference's expectations
(tests/test_postprocessors.py: table detection, single/multi-row table
chunking, chunk index bounds, regex-backtracking guard, 2-sentence
split; FIXTURES.md F5)."""

import time

from mmore_ray.stages.chunker import (
    chunk_document,
    chunk_prose,
    chunk_table,
    detect_markdown_tables,
)

TABLE = """| Name | Age | City |
|------|-----|------|
| Alice | 30 | Paris |
| Bob | 25 | London |
| Carol | 35 | Berlin |"""


def test_detect_simple_table():
    blocks = detect_markdown_tables(TABLE)
    assert blocks == [(0, 5)]


def test_detect_table_with_surrounding_prose():
    text = "Intro line.\n\n" + TABLE + "\n\nOutro line."
    blocks = detect_markdown_tables(text)
    assert len(blocks) == 1
    start, end = blocks[0]
    assert text.splitlines()[start].startswith("| Name")
    assert end - start == 5


def test_detect_two_tables():
    text = TABLE + "\n\nSome prose between.\n\n" + TABLE
    assert len(detect_markdown_tables(text)) == 2


def test_header_only_table():
    text = "| A | B |\n|---|---|"
    assert detect_markdown_tables(text) == [(0, 2)]


def test_alignment_colons_separator():
    text = "| A | B | C |\n| :--- | :---: | ---: |\n| 1 | 2 | 3 |"
    assert detect_markdown_tables(text) == [(0, 3)]


def test_unclosed_pipe_line_rejected_fast():
    # reference guards against regex catastrophic backtracking
    # (test_postprocessors.py:480-485)
    bad = "|" + " a" * 5000  # no closing pipe
    t0 = time.perf_counter()
    assert detect_markdown_tables(bad) == []
    assert time.perf_counter() - t0 < 0.5


def test_single_row_mode_prepends_header():
    lines = TABLE.splitlines()
    chunks = chunk_table(lines, mode="single_row")
    assert len(chunks) == 3
    for text, is_table, header, _dup in chunks:
        assert is_table and header == "| Name | Age | City |"
        assert text.startswith("| Name | Age | City |\n|------|-----|------|\n| ")


def test_multi_rows_mode_packs_greedily():
    rows = "\n".join(f"| r{i} | {i} | x |" for i in range(50))
    lines = ("| A | B | C |\n|---|---|---|\n" + rows).splitlines()
    chunks = chunk_table(lines, mode="multi_rows", max_rows=8)
    assert len(chunks) == 7  # ceil(50/8)
    assert all(c[0].startswith("| A | B | C |") for c in chunks)
    total_rows = sum(len(c[0].splitlines()) - 2 for c in chunks)
    assert total_rows == 50


def test_keep_whole_mode():
    chunks = chunk_table(TABLE.splitlines(), mode="keep_whole")
    assert len(chunks) == 1
    assert chunks[0][0] == TABLE


def test_two_sentence_split():
    # reference chunker default: 2 sentences per chunk (:44-64)
    text = "One sentence here. Two sentences now. Third one lands. Fourth."
    chunks = chunk_prose(text, chunk_size=2, unit="sentence")
    assert chunks == [
        "One sentence here. Two sentences now.",
        "Third one lands. Fourth.",
    ]


def test_mixed_document_order_preserved():
    text = "Lead paragraph. Second sentence.\n" + TABLE + "\nTail words."
    chunks = chunk_document(text, chunk_size=2, table_mode="single_row")
    kinds = [is_table for _, is_table, _, _ in chunks]
    assert kinds == [False, True, True, True, False]


def test_table_mode_none_flows_as_prose():
    chunks = chunk_document(TABLE, table_mode="none")
    assert all(not is_table for _, is_table, _, _ in chunks)


def test_token_unit_chunks_are_raw_slices():
    from mmore_ray.stages.chunker import chunk_prose
    from mmore_ray.stages.text_analysis import count_tokens

    text = "alpha beta42 gamma, delta epsilon zeta eta theta!"
    chunks = chunk_prose(text, chunk_size=3, unit="token")
    # every chunk holds ≤ 3 pre-tokenizer tokens, and all tokens survive
    assert all(count_tokens(c) <= 3 for c in chunks)
    assert sum(count_tokens(c) for c in chunks) == count_tokens(text)
    # chunk text is a verbatim slice of the original
    for c in chunks:
        assert c in text


def test_semantic_unit_groups_by_topic():
    from mmore_ray.stages.chunker import chunk_prose, chunk_semantic

    text = ("the cat sat on the mat. the cat ate near the mat. "
            "stock markets fell today. stock markets dropped again.")
    chunks = chunk_semantic(text, threshold=0.3)
    assert len(chunks) == 2
    assert "cat" in chunks[0] and "markets" not in chunks[0]
    assert "markets" in chunks[1] and "cat" not in chunks[1]
    # deterministic
    assert chunks == chunk_semantic(text, threshold=0.3)
    # reachable through the chunk_prose unit switch
    assert chunk_prose(text, chunk_size=8, unit="semantic") == chunks


def test_semantic_respects_max_sentences():
    from mmore_ray.stages.chunker import chunk_semantic

    text = " ".join(["the same exact words here."] * 10)
    chunks = chunk_semantic(text, threshold=0.1, max_sentences=4)
    assert len(chunks) == 3  # 4 + 4 + 2


def test_replicated_table_header_tag_does_not_steal_modalities():
    """Reference binds modalities by tag offsets in the ORIGINAL text
    (multimodal.py:68-84): a header tag replicated into every
    single_row chunk must not re-consume the modality cursor."""
    import pyarrow as pa

    from mmore_ray.stages.chunker import chunk_batch
    from mmore_ray.stages.processors import ATTACHMENT_TAG, MODALITY_STRUCT

    text = (f"| Logo {ATTACHMENT_TAG} | Age |\n|------|-----|\n"
            "| r1 | 1 |\n| r2 | 2 |\n"
            f"Prose with image {ATTACHMENT_TAG} here.")
    mods = [{"type": "image", "value": "logo.png"},
            {"type": "image", "value": "prose.png"}]
    batch = pa.table({
        "sample_id": pa.array(["s"]), "document_id": pa.array(["s"]),
        "text": pa.array([text]),
        "modalities": pa.array([mods], pa.list_(MODALITY_STRUCT)),
        "file_path": pa.array(["f.md"]), "file_name": pa.array(["f.md"]),
        "processor_type": pa.array(["MarkdownProcessor"]),
    })
    out = chunk_batch(batch, table_mode="single_row")
    got = out.column("modalities").to_pylist()
    # chunk 0 (header+r1) owns the logo; chunk 1's replicated header
    # binds nothing; the prose chunk keeps ITS image
    assert got[0] == [mods[0]]
    assert got[1] == []
    assert got[2] == [mods[1]]


def test_token_unit_keeps_attachment_tag_atomic():
    from mmore_ray.stages.chunker import chunk_prose
    from mmore_ray.stages.processors import ATTACHMENT_TAG

    text = f"{ATTACHMENT_TAG} hello world and more words"
    chunks = chunk_prose(text, chunk_size=2, unit="token")
    # the tag literal survives inside exactly one chunk
    assert sum(c.count(ATTACHMENT_TAG) for c in chunks) == 1
    assert chunks[0].startswith(ATTACHMENT_TAG)
