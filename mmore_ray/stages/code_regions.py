"""Language-aware comment/docstring splitting for code files.

The north rule names "tree-sitter + regex gazetteers" for mention
detection over code; tree-sitter grammars aren't in this container, so
this module is the regex-lexer realization of the same contract: per
language, split a source file into its PROSE regions (docstrings,
block comments, line comments — where entity mentions actually live)
and leave code regions out.  The extraction spec below is deliberately
simple and SQL-expressible so the region-scoped mention query can be
oracle-checked; swapping in a real tree-sitter lexer at production
changes only :func:`extract_regions`.

Spec (per ``lang``):
  * ``python``     — ``\"\"\"...\"\"\"`` bodies → ``docstring``; per
    line, everything after the first ``#`` (one leading space
    stripped) → ``comment``.
  * ``javascript`` — ``/*...*/`` bodies stripped of ``' *'`` edges →
    ``docstring``; per line, everything after the first ``//`` (one
    leading space stripped) → ``comment``.
  * anything else  — the whole content → ``prose``.
"""

from __future__ import annotations

import re

import pyarrow as pa

_PY_DOCSTRING_RE = re.compile(r'"""(.*?)"""', re.DOTALL)
_JS_BLOCK_RE = re.compile(r"/\*+(.*?)\*/", re.DOTALL)


def _strip_one_space(s: str) -> str:
    return s[1:] if s.startswith(" ") else s


def extract_regions(lang: str, content: str) -> list[tuple[str, str]]:
    """(region_type, region_text) prose regions of one file."""
    out: list[tuple[str, str]] = []
    if lang == "python":
        for m in _PY_DOCSTRING_RE.finditer(content):
            out.append(("docstring", m.group(1)))
        for line in content.split("\n"):
            if "#" in line:
                out.append(
                    ("comment", _strip_one_space(line.split("#", 1)[1])))
    elif lang == "javascript":
        for m in _JS_BLOCK_RE.finditer(content):
            out.append(("docstring", m.group(1).strip(" *")))
        for line in content.split("\n"):
            if "//" in line:
                out.append(
                    ("comment", _strip_one_space(line.split("//", 1)[1])))
    else:
        out.append(("prose", content))
    return out


def explode_regions(batch: pa.Table) -> pa.Table:
    """corpus rows → one row per prose region (repo, path, lang,
    region_type, region_text)."""
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()
    out = {"repo": [], "path": [], "lang": [], "region_type": [],
           "region_text": []}
    for r, p, lg, c in zip(repos, paths, langs, contents):
        for rt, txt in extract_regions(lg, c):
            out["repo"].append(r)
            out["path"].append(p)
            out["lang"].append(lg)
            out["region_type"].append(rt)
            out["region_text"].append(txt)
    return pa.table({k: pa.array(v, pa.string()) for k, v in out.items()})
