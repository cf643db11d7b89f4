"""`python -m mmore_ray` subcommand smoke: each command prints one JSON
line and composes (process → index → retrieve).  Runs in subprocesses
(each owns its Ray session, as the CLI contract requires)."""

import json
import subprocess
import sys


def _run(args):
    out = subprocess.run([sys.executable, "-m", "mmore_ray", *args],
                         capture_output=True, text=True, timeout=300,
                         cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_process_index_retrieve(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("hello world this is a text file.")
    (src / "b.md").write_text("# Title\n\nSome markdown body.")
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"process:\n  roots: [\"{src}\"]\npostprocess:\n"
        "  - type: tagger/words\n")

    proc = _run(["process", "--config", str(cfg),
                 "--out", str(tmp_path / "proc")])
    assert proc["processed"] == 2 and proc["crawled"] == 2

    idx = _run(["index", "--input", proc["out"],
                "--out", str(tmp_path / "coll")])
    assert idx["indexed"] == 2

    hits = _run(["retrieve", "--collection", str(tmp_path / "coll"),
                 "--query", "markdown body", "-k", "1"])
    assert len(hits["hits"]) == 1
    assert "markdown" in hits["hits"][0]["text"]


def test_cli_curate(tmp_path):
    out = _run(["curate", "--input",
                "/root/testdata/sf0.001/documents.parquet",
                "--out", str(tmp_path / "clean")])
    assert 0 < out["survivors"] <= 500
