"""Entity-link scoring stage.

Analogue of the reference's stateful model stages (SURVEY §2.4: per-
device model caches in ``pdf_processor.py:37-68`` → here a per-actor
alias dictionary + similarity scorer).  The alias dictionary maps an
entity surface key (uppercased cleaned form) to a candidate KB id.

Scale design: the dictionary is a *small side* — it is ``ray.put`` once
on the driver and each actor ``ray.get``s it in ``__init__`` (broadcast,
no per-batch reshipping, no shuffle join).  If the dictionary outgrew
worker memory, the same stage would shard it by ``hash(entity_key)`` and
the pipeline would bucket mentions to matching shards (documented
partitioning assumption; not needed at current dictionary sizes).

Link score: character-trigram Jaccard similarity between surface key and
KB id — deterministic, model-free, cached per distinct key per actor.
"""

from __future__ import annotations

import pyarrow as pa

try:  # allow pure-python unit tests without a Ray session
    import ray
except ImportError:  # pragma: no cover
    ray = None

from ..functions.textfns import clean_str
from ..sources.corpus import GAZETTEER


def normalize_alias(alias: dict[str, str]) -> dict[str, str]:
    """Re-key an alias dict by the SAME transform mention rows use for
    ``entity_key`` — ``clean_str(surface.upper())``.  A raw-upper key
    whose surface clean_str alters (leading space, control char, HTML
    entity) would otherwise never match any mention: the lookup falls
    back to identity and the mislink is silent."""
    return {str(clean_str(k.upper())): v for k, v in alias.items()}


def default_alias_dict() -> dict[str, str]:
    """surface_key (uppercased CLEANED form — the entity_key contract)
    → kb_id, from the gazetteer."""
    return {str(clean_str(s.upper())): kb for s, _, kb in GAZETTEER}


def trigram_jaccard(a: str, b: str) -> float:
    if a == b:
        return 1.0
    ta = {a[i : i + 3] for i in range(max(1, len(a) - 2))}
    tb = {b[i : i + 3] for i in range(max(1, len(b) - 2))}
    inter = len(ta & tb)
    union = len(ta | tb)
    return inter / union if union else 0.0


class EntityLinker:
    """Actor-pool stage: adds ``kb_id`` (+ optional ``link_score``) for
    each configured entity-key column.

    Parameters
    ----------
    alias_ref : ray.ObjectRef | None
        Broadcast handle to the alias dict (``ray.put`` once on the
        driver).  Falls back to :func:`default_alias_dict`.
    columns : mapping of input column → output kb column.
    score_for : input column for which to also emit ``link_score``.
    """

    def __init__(
        self,
        alias_ref=None,
        alias: dict[str, str] | None = None,
        columns: dict[str, str] | None = None,
        score_for: str | None = "entity_key",
    ):
        if alias_ref is not None:
            self._alias = normalize_alias(ray.get(alias_ref))
        elif alias is not None:
            self._alias = normalize_alias(alias)
        else:
            self._alias = default_alias_dict()
        self._columns = columns or {"entity_key": "kb_id"}
        self._score_for = score_for
        self._score_cache: dict[str, float] = {}

    def link(self, key: str) -> str:
        # identity fallback for unlinked surfaces — mirrored verbatim in
        # the kg_mentions SQL oracle (COALESCE to the key), so an
        # unlinked entity scores trigram_jaccard(key, key) = 1.0 BY
        # DESIGN on both engines.  Consumers needing "was it actually
        # in the KB?" should test kb_id != entity_key, not link_score.
        return self._alias.get(key, key)

    def score(self, key: str) -> float:
        s = self._score_cache.get(key)
        if s is None:
            s = trigram_jaccard(key, self.link(key))
            self._score_cache[key] = s
        return s

    def __call__(self, batch: pa.Table) -> pa.Table:
        for col, out in self._columns.items():
            keys = batch.column(col).to_pylist()
            batch = batch.append_column(
                out, pa.array([self.link(k) for k in keys], pa.string())
            )
            if col == self._score_for:
                batch = batch.append_column(
                    "link_score",
                    pa.array([self.score(k) for k in keys], pa.float64()),
                )
        return batch
