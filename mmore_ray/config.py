"""YAML pipeline configuration (reference §2.11 extension surface).

The reference builds pipelines from dacite-parsed YAML with env-var
expansion (``utils.py:17-43``) and name-keyed registries for
post-processors / taggers / filters (``post_processor/__init__.py:13-47``).
Same shape here: a YAML document names ordered stages; each stage entry
is ``{type: <registry name>, args: {...}}``; ``${VAR}`` strings expand
from the environment.

Example::

    process:
      roots: ["${DATA_ROOT}/corpus"]
      extensions: [".txt", ".md"]
    postprocess:
      - type: tagger/words
      - type: tagger/lang
      - type: filter/length
        args: {min_words: 5}
      - type: chunker
        args: {chunk_size: 2, table_mode: single_row}
      - type: ner

Custom stages register via :func:`register_stage` — the user-extension
hook (≙ subclassing BasePostProcessor + registry entry).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from functools import partial
from typing import Any

import yaml

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def _expand_env(node: Any) -> Any:
    if isinstance(node, str):
        def sub(m: re.Match) -> str:
            val = os.environ.get(m.group(1))
            if val is None:
                # substituting '' would turn '${DATA_ROOT}/corpus' into
                # the absolute path '/corpus' and crawl the wrong tree
                # with no error — surface the misconfiguration instead
                raise KeyError(
                    f"config references unset environment variable "
                    f"${{{m.group(1)}}}")
            return val

        return _ENV_RE.sub(sub, node)
    if isinstance(node, list):
        return [_expand_env(x) for x in node]
    if isinstance(node, dict):
        return {k: _expand_env(v) for k, v in node.items()}
    return node


def _build_chunker(**kwargs) -> Callable:
    from .stages.chunker import chunk_batch

    return partial(chunk_batch, **kwargs)


def _build_ner(**kwargs) -> Callable:
    """NER stage with the NERExtractorConfig surface: YAML args
    ``gazetteer_path`` (TSV surface/type/kb_id), ``entity_types``,
    ``tuple_delimiter``, ``record_delimiter``."""
    from .stages.postprocess_extra import make_ner_tagger, tag_ner

    return make_ner_tagger(**kwargs) if kwargs else tag_ner


def _builders() -> dict[str, Callable[..., Callable]]:
    from .stages.filters import ALL_FILTERS
    from .stages.postprocess_extra import metadata_infusor, translator
    from .stages.taggers import ALL_TAGGERS

    reg: dict[str, Callable[..., Callable]] = {}

    def tagger_builder(name: str, f: Callable) -> Callable[..., Callable]:
        def build(**kw) -> Callable:
            if kw:  # taggers take no args — swallowing them silently
                # would let a config "option" simply not take effect
                raise TypeError(
                    f"tagger/{name} accepts no args, got {sorted(kw)}")
            return f

        return build

    for name, fn in ALL_TAGGERS.items():
        reg[f"tagger/{name}"] = tagger_builder(name, fn)
    for name, factory in ALL_FILTERS.items():
        reg[f"filter/{name}"] = factory
    reg["chunker"] = _build_chunker
    reg["ner"] = _build_ner
    reg["metafuse"] = metadata_infusor
    reg["translator"] = translator
    return reg


_EXTRA_STAGES: dict[str, Callable[..., Callable]] = {}


def register_stage(name: str, builder: Callable[..., Callable]) -> None:
    """User-extension hook: make ``{type: name}`` resolvable in YAML."""
    _EXTRA_STAGES[name] = builder


def build_stage(entry: dict) -> Callable:
    reg = {**_builders(), **_EXTRA_STAGES}
    stype = entry["type"]
    if stype not in reg:
        raise KeyError(
            f"unknown stage type '{stype}'; known: {sorted(reg)}")
    return reg[stype](**(entry.get("args") or {}))


def load_pipeline_config(path_or_text: str) -> dict:
    """Parse config (a YAML file path or inline YAML text) →
    {'process': {...}, 'postprocessors': [stage_fns]}."""
    if "\n" not in path_or_text and os.path.exists(path_or_text):
        with open(path_or_text) as f:
            raw = yaml.safe_load(f)
    else:
        raw = yaml.safe_load(path_or_text)
    raw = _expand_env(raw or {})
    stages = [build_stage(e) for e in raw.get("postprocess") or []]
    return {"process": raw.get("process") or {}, "postprocessors": stages}


def run_from_config(path_or_text: str, out_dir: str) -> dict:
    """Config-driven end-to-end run (the `mmore process` CLI analogue)."""
    from .pipelines.process import run_process

    cfg = load_pipeline_config(path_or_text)
    proc = cfg["process"]
    return run_process(
        proc.get("roots") or ["."],
        out_dir,
        postprocessors=cfg["postprocessors"],
        previous_results=proc.get("previous_results"),
        extensions=proc.get("extensions"),
    )
