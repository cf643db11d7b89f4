"""NER tagger / metafuse / translator + distributed connected
components."""

import pyarrow as pa
import pytest


def _sample_batch(texts):
    return pa.table({
        "sample_id": [f"s{i}" for i in range(len(texts))],
        "text": texts,
        "file_path": [f"/x/{i}.txt" for i in range(len(texts))],
    })


def test_tag_ner_matches_reference_node_shape():
    from mmore_ray.stages.postprocess_extra import tag_ner

    out = tag_ner(_sample_batch(
        ["Barack Obama was born in Honolulu.", "no entities here"]))
    ner = out.column("ner").to_pylist()
    assert {e["entity"] for e in ner[0]} == {"BARACK OBAMA", "HONOLULU"}
    assert all(e["type"] in ("PERSON", "LOCATION") for e in ner[0])
    assert all(isinstance(e["description"], list) for e in ner[0])
    assert ner[1] == []


def test_metadata_infusor_prepend():
    from mmore_ray.stages.postprocess_extra import metadata_infusor

    fn = metadata_infusor("[source: {file_path}]")
    out = fn(_sample_batch(["body text"]))
    assert out.column("text").to_pylist()[0] == "[source: /x/0.txt]\nbody text"


def test_translator_gate_translate_and_tag_isolation():
    from mmore_ray.stages.postprocess_extra import (
        dictionary_translate,
        translator,
    )

    fn = translator(target_lang="en")
    # already-EN text passes through untouched, original_text empty
    out = fn(_sample_batch(["the cat is on the mat and that is that"]))
    assert out.column("original_text").to_pylist() == [""]

    # FR text translates word-by-word; original preserved
    fr_text = "le chat et le chien dans la maison et le jardin"
    out = fn(_sample_batch([fr_text]))
    assert out.column("original_text").to_pylist() == [fr_text]
    got = out.column("text").to_pylist()[0]
    assert got == dictionary_translate(fr_text, "fr", "en")
    assert got != fr_text

    # attachment tags are split out and NEVER reach the translator
    seen: list[str] = []

    def spy(text, src, dst):
        seen.append(text)
        return dictionary_translate(text, src, dst)

    fn2 = translator(target_lang="en", translate_fn=spy)
    tagged = "le chat <attachment> le chien"
    out = fn2(_sample_batch([tagged]))
    assert all("<attachment>" not in s for s in seen)
    assert out.column("text").to_pylist()[0].count("<attachment>") == 1
    # round-trip property of the positional tables
    assert dictionary_translate(
        dictionary_translate("the a and of", "en", "de"), "de", "en"
    ) == "the a and of"


def test_connected_components_distributed(ray_session):
    ray = ray_session
    from mmore_ray.stages.canonicalize import connected_components

    edges = pa.table({
        "src": ["a", "b", "x", "y", "p"],
        "dst": ["b", "c", "y", "z", "p"],
    })
    labels = connected_components(ray.data.from_arrow(edges))
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {"a": "a", "b": "a", "c": "a",
                   "x": "x", "y": "x", "z": "x", "p": "p"}


def test_connected_components_chain_converges(ray_session):
    ray = ray_session
    from mmore_ray.stages.canonicalize import connected_components

    # a long chain forces multiple label-propagation rounds
    n = 20
    edges = pa.table({
        "src": [f"n{i:02d}" for i in range(n - 1)],
        "dst": [f"n{i+1:02d}" for i in range(n - 1)],
    })
    labels = connected_components(ray.data.from_arrow(edges))
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert set(got.values()) == {"n00"}


def test_null_text_rows_pass_through_postprocessors():
    """Null text rows must flow through the infusor and translator
    instead of killing the map task (the scanner already guards)."""
    import pyarrow as pa

    from mmore_ray.stages.postprocess_extra import (
        metadata_infusor,
        translator,
    )

    batch = pa.table({
        "text": pa.array([None, "bonjour le monde et les gens"], pa.string()),
        "file_name": pa.array(["a", "b"]),
    })
    out = metadata_infusor("[{file_name}]")(batch)
    assert out.column("text").to_pylist()[0] == "[a]\n"

    out2 = translator(target_lang="en")(batch)
    assert out2.column("text").to_pylist()[0] is None
    assert out2.column("original_text").to_pylist()[0] == ""


def test_triples_kernels_empty_and_null_key_batches():
    """Empty batches must emit STRING-typed (metadata-free) schemas —
    null-typed columns cannot concat with real rollup/spill blocks —
    and a null doc-key must not silently drop a doc's triples."""
    import pyarrow as pa

    from mmore_ray.stages.triples import doc_triples, partial_graph_rollup

    empty = pa.table({
        "repo": pa.array([], pa.string()),
        "src_canonical": pa.array([], pa.string()),
        "dst_canonical": pa.array([], pa.string()),
        "weight": pa.array([], pa.float64()),
        "description": pa.array([], pa.string()),
    })
    t = doc_triples(empty)
    assert t.schema.field("subj").type == pa.string()
    assert t.schema.metadata is None

    r = partial_graph_rollup(pa.table({
        "subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
        "obj": pa.array([], pa.string()),
        "weight": pa.array([], pa.float64())}))
    assert r.schema.field("subj").type == pa.string()
    # concat with a REAL block must unify (the kg rollup/merge path)
    real = partial_graph_rollup(pa.table({
        "subj": pa.array(["a"]), "pred": pa.array(["p"]),
        "obj": pa.array(["b"]), "weight": pa.array([1.0])}))
    assert pa.concat_tables([r, real]).num_rows == 1

    nullkey = pa.table({
        "repo": pa.array([None], pa.string()),
        "src_canonical": pa.array(["A"]),
        "dst_canonical": pa.array(["B"]),
        "weight": pa.array([1.0]),
        "description": pa.array(["REL"]),
    })
    out = doc_triples(nullkey)
    assert out.num_rows == 1  # null repo kept, not dropped


def test_crawler_skips_dangling_symlinks_and_accepts_dotless_ext(tmp_path):
    import os

    from mmore_ray.sources.crawler import crawl_table

    (tmp_path / "a.txt").write_text("hello")
    os.symlink(tmp_path / "missing.txt", tmp_path / "dangling.txt")
    t = crawl_table([str(tmp_path)], extensions=["txt"])  # dotless
    assert t.column("file_name").to_pylist() == ["a.txt"]
    # explicit empty whitelist admits nothing
    assert crawl_table([str(tmp_path)], extensions=[]).num_rows == 0


def test_sha256_column_null_contract_matches_array_form():
    import pyarrow as pa

    from mmore_ray.functions.hashing import (
        sha256_column,
        sha256_of_string_array,
    )

    arr = pa.array(["x", None], pa.string())
    assert sha256_column(["x", None]) == sha256_of_string_array(arr)
