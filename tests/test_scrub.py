"""PII scrubbing kernel tests (stages/scrub.py)."""

import pyarrow as pa

from mmore_ray.stages.scrub import redact_pii, redact_pii_batch


def test_redact_pii_batch_patterns_and_counts():
    texts = [
        "contact me at john.doe+spam@example.co.uk or jane@x.io thanks",
        "server at 10.0.0.255 and 192.168.1.1, version 1.2.3.4.5 though",
        "call +41-22-555-0134 or +1 212 555 9876 now",
        "no pii here at all",
        "",
    ]
    red, n = redact_pii_batch(pa.array(texts, pa.string()))
    assert red.to_pylist() == [
        "contact me at <EMAIL> or <EMAIL> thanks",
        "server at <IP> and <IP>, version <IP>.5 though",
        "call <PHONE> or <PHONE> now",
        "no pii here at all",
        "",
    ]
    assert n.to_pylist() == [2, 3, 2, 0, 0]


def test_redact_pii_dataset_replaces_in_place(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["mail a@b.cc now", "clean"],
        "other": ["x", "y"]}))
    out = redact_pii(ds).to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == ["mail <EMAIL> now", "clean"]
    assert out["n_redactions"].tolist() == [1, 0]
    assert out["other"].tolist() == ["x", "y"]  # untouched columns survive
