"""YAML pipeline-config surface (reference §2.11)."""

import os

import pytest

from mmore_ray.config import build_stage, load_pipeline_config, register_stage

CFG = """
process:
  roots: ["${TEST_DATA_ROOT}"]
  extensions: [".txt", ".md"]
postprocess:
  - type: tagger/words
  - type: tagger/lang
  - type: filter/length
    args: {min_words: 2}
  - type: chunker
    args: {chunk_size: 2}
"""


def test_env_expansion_and_stage_building(monkeypatch):
    monkeypatch.setenv("TEST_DATA_ROOT", "/data/x")
    cfg = load_pipeline_config(CFG)
    assert cfg["process"]["roots"] == ["/data/x"]
    assert len(cfg["postprocessors"]) == 4
    assert all(callable(s) for s in cfg["postprocessors"])


def test_unset_env_var_raises_instead_of_empty_substitution(monkeypatch):
    monkeypatch.delenv("TEST_DATA_ROOT", raising=False)
    # '' substitution would turn '${TEST_DATA_ROOT}/corpus' into the
    # absolute path '/corpus' and crawl the wrong tree silently
    with pytest.raises(KeyError, match="TEST_DATA_ROOT"):
        load_pipeline_config(CFG)


def test_tagger_stage_rejects_unknown_args():
    with pytest.raises(TypeError, match="accepts no args"):
        build_stage({"type": "tagger/words",
                     "args": {"strip_attachments": False}})


def test_unknown_stage_raises_with_known_list():
    with pytest.raises(KeyError) as e:
        build_stage({"type": "nope"})
    assert "tagger/words" in str(e.value)


def test_register_custom_stage():
    register_stage("custom/noop", lambda **kw: (lambda b: b))
    fn = build_stage({"type": "custom/noop"})
    assert callable(fn)


def test_config_driven_run(ray_session, tmp_path, monkeypatch):
    from mmore_ray.config import run_from_config

    (tmp_path / "a.txt").write_text("one two three four five six")
    (tmp_path / "b.md").write_text("# T\n\nseven eight nine")
    monkeypatch.setenv("TEST_DATA_ROOT", str(tmp_path))
    stats = run_from_config(CFG, str(tmp_path / "out"))
    assert stats["processed"] >= 2


def test_ner_config_surface_custom_gazetteer(tmp_path):
    """NERExtractorConfig analogue via YAML args (ner/extractor.py:26-33):
    gazetteer file + entity-type allowlist + custom delimiters drive the
    scanner end-to-end."""
    import pyarrow as pa

    gaz = tmp_path / "gaz.tsv"
    gaz.write_text(
        "# surface\ttype\tkb_id\n"
        "Widget\tPRODUCT\tKB:WIDGET\n"
        "Acme\tORGANIZATION\tKB:ACME\n"
        "Zurich\tLOCATION\tKB:ZURICH\n"
    )
    stage = build_stage({"type": "ner", "args": {
        "gazetteer_path": str(gaz),
        "entity_types": ["PRODUCT", "ORGANIZATION"],  # LOCATION filtered
        "tuple_delimiter": "||",
        "record_delimiter": "@@",
    }})
    batch = pa.table({"text": pa.array(
        ["Acme ships a Widget from Zurich", "nothing here"], pa.string())})
    out = stage(batch)
    ner = out.column("ner").to_pylist()
    got = {(e["entity"], e["type"]) for e in ner[0]}
    assert got == {("ACME", "ORGANIZATION"), ("WIDGET", "PRODUCT")}
    assert ner[1] == []


def test_profiler_captures_stats_and_persists(ray_session, tmp_path):
    import json

    import ray as _ray

    from mmore_ray.profiler import profiled

    ds = _ray.data.range(100).map_batches(lambda b: b)
    mat = {}

    def consume():
        mat["ds"] = ds.materialize()
        return mat["ds"].count()

    result, rec = profiled("count100", consume,
                           dataset=lambda: mat["ds"], out_dir=tmp_path)
    assert result == 100
    assert rec["seconds"] >= 0
    assert "MapBatches" in (rec["stats"] or "")
    saved = json.loads((tmp_path / "_profile" / "count100.json").read_text())
    assert saved["name"] == "count100"
