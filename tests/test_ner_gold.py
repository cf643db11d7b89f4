"""Parity with the reference NER gold corpus.

Runs our deterministic gazetteer extraction over the reference's own
gold texts (examples/sample_data/example_outputs_ner, 12 docs EN+FR)
and scores entity P/R against the xNER annotations — the north-rule
gate is P ≥ 0.95 and R ≥ 0.95."""

import json
from pathlib import Path

import pytest

from mmore_ray.stages.mentions import MentionScanner

GOLD = Path(
    "/root/reference/examples/sample_data/example_outputs_ner/merged/merged_results.jsonl"
)


@pytest.mark.skipif(not GOLD.exists(), reason="reference corpus not present")
def test_entity_precision_recall_vs_reference_gold():
    scanner = MentionScanner()
    tp = fp = fn = 0
    type_mismatches = []
    for line in GOLD.read_text().splitlines():
        doc = json.loads(line)
        mentions, _ = scanner._scan(doc["text"])
        got = {(m["entity_key"], m["entity_type"]) for m in mentions}
        want = {(e["entity"].upper(), e["type"]) for e in doc["metadata"]["xNER"]}
        tp += len(got & want)
        fp += len(got - want)
        fn += len(want - got)
        for g in got - want:
            type_mismatches.append((doc["text"][:40], g, sorted(want)))
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    assert precision >= 0.95, (precision, type_mismatches)
    assert recall >= 0.95, (recall, type_mismatches)
