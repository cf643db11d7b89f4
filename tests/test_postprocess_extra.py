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
