"""End-to-end drive of the stdlib HTTP indexer facade
(mmore_ray/serving_http.py) against the reference's endpoint surface
(run_index_api.py:180-575): status codes, response shapes, SSE stream,
and the ingest→collection→retrieve loop, all over a real socket."""

import json
import urllib.error
import urllib.request
import uuid

import pytest


def _multipart(fields: dict, files: list[tuple[str, str, bytes]]):
    """(body, content_type) for multipart/form-data."""
    boundary = f"b{uuid.uuid4().hex}"
    out = bytearray()
    for k, v in fields.items():
        out += (f"--{boundary}\r\nContent-Disposition: form-data; "
                f"name=\"{k}\"\r\n\r\n{v}\r\n").encode()
    for name, filename, data in files:
        out += (f"--{boundary}\r\nContent-Disposition: form-data; "
                f"name=\"{name}\"; filename=\"{filename}\"\r\n"
                "Content-Type: application/octet-stream\r\n\r\n").encode()
        out += data + b"\r\n"
    out += f"--{boundary}--\r\n".encode()
    return bytes(out), f"multipart/form-data; boundary={boundary}"


def _call(method: str, url: str, body: bytes = b"",
          content_type: str = "application/json"):
    """(status, parsed-or-raw body) — HTTPError carries non-2xx."""
    req = urllib.request.Request(url, data=body or None, method=method)
    if body:
        req.add_header("Content-Type", content_type)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            raw = resp.read()
            code = resp.status
    except urllib.error.HTTPError as e:
        raw = e.read()
        code = e.code
    try:
        return code, json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError):
        return code, raw


@pytest.fixture()
def service(ray_session, tmp_path):
    from mmore_ray.serving_http import IndexHTTPService

    svc = IndexHTTPService(tmp_path / "uploads", tmp_path / "collection",
                           devices=["cpu:0"])
    yield svc, f"http://127.0.0.1:{svc.port}"
    svc.close()


def test_full_file_lifecycle_over_http(service):
    svc, base = service

    code, health = _call("GET", f"{base}/")
    assert code == 200 and "running" in health["message"]

    doc = b"# Title\n\nthe cat sat on the mat and told a long story\n"
    body, ctype = _multipart({"fileId": "doc1"}, [("file", "a.md", doc)])
    code, resp = _call("POST", f"{base}/v1/files", body, ctype)
    assert code == 202 and resp["fileId"] == "doc1"
    job = svc.wait(resp["jobId"], timeout=60)
    assert job.status.value == "done", job.error
    assert job.result["chunks"] >= 1

    # job snapshot endpoint mirrors the queue record
    code, snap = _call("GET", f"{base}/v1/jobs/{resp['jobId']}")
    assert code == 200 and snap["status"] == "done"
    assert snap["fileId"] == "doc1" and snap["device"] == "cpu:0"
    code, _ = _call("GET", f"{base}/v1/jobs/nope")
    assert code == 404

    # duplicate id → 409 (run_index_api.py:222)
    code, _ = _call("POST", f"{base}/v1/files", body, ctype)
    assert code == 409

    # download returns the exact staged bytes
    code, raw = _call("GET", f"{base}/v1/files/doc1")
    assert code == 200 and raw == doc

    # the ingested doc is retrievable through the HTTP retriever
    code, hits = _call("POST", f"{base}/v1/retrieve",
                       json.dumps({"text": "cat mat story", "k": 3}).encode())
    assert code == 200 and hits["hits"]
    assert any(h["sample_id"].startswith("doc1#") for h in hits["hits"])

    # replace (PUT) re-ingests under the same id
    body2, ctype2 = _multipart({}, [("file", "a.md", b"now about dogs only")])
    code, resp2 = _call("PUT", f"{base}/v1/files/doc1", body2, ctype2)
    assert code == 202
    assert svc.wait(resp2["jobId"], timeout=60).status.value == "done"
    # the canonical staged bytes were committed by the replace
    code, raw = _call("GET", f"{base}/v1/files/doc1")
    assert code == 200 and raw == b"now about dogs only"

    # delete unindexes: 200, then download 404 and retrieval is empty
    code, out = _call("DELETE", f"{base}/v1/files/doc1")
    assert code == 200 and out["status"] == "success"
    code, _ = _call("GET", f"{base}/v1/files/doc1")
    assert code == 404
    code, _ = _call("DELETE", f"{base}/v1/files/doc1")
    assert code == 404
    code, hits = _call("POST", f"{base}/v1/retrieve",
                       json.dumps({"text": "cat mat story"}).encode())
    assert code == 200 and not any(
        h["sample_id"].startswith("doc1#") for h in hits["hits"])


def test_validation_and_bulk_outcomes(service):
    svc, base = service

    # traversal-shaped fileId refused (422, run_index_api.py:128)
    body, ctype = _multipart({"fileId": "../evil"},
                             [("file", "a.txt", b"x")])
    code, _ = _call("POST", f"{base}/v1/files", body, ctype)
    assert code == 422

    # PUT on a missing id → 404 (run_index_api.py:348)
    body, ctype = _multipart({}, [("file", "a.txt", b"x")])
    code, _ = _call("PUT", f"{base}/v1/files/ghost", body, ctype)
    assert code == 404

    # bulk: per-file outcome list (202 even when some fail)
    ok = b"the quick brown fox jumps over the lazy dog again"
    body, ctype = _multipart({}, [("b1", "b1.txt", ok),
                                  ("bad/id", "b2.txt", ok),
                                  ("b1", "dup.txt", ok)])
    code, resp = _call("POST", f"{base}/v1/files/bulk", body, ctype)
    assert code == 202
    b1_entries = [j for j in resp["jobs"] if j["fileId"] == "b1"]
    assert "jobId" in b1_entries[0]  # first b1 was accepted
    assert "error" in b1_entries[1]  # duplicate hit the staged first b1
    bad = [j for j in resp["jobs"] if j["fileId"] == "bad/id"]
    assert bad and "error" in bad[0]
    assert svc.wait(b1_entries[0]["jobId"],
                    timeout=60).status.value == "done"

    # trailing slash / query string → clean 404s, never a dropped socket
    for url in (f"{base}/v1/jobs/", f"{base}/v1/files/",
                f"{base}/v1/jobs"):
        code, _ = _call("GET", url)
        assert code == 404
    code, _ = _call("GET", f"{base}/v1/jobs/nope?x=1")
    assert code == 404  # query string stripped before routing

    # non-numeric retrieve params → 422, not a handler crash
    code, _ = _call("POST", f"{base}/v1/retrieve",
                    json.dumps({"text": "x", "k": "abc"}).encode())
    assert code == 422
    code, _ = _call("POST", f"{base}/v1/retrieve",
                    json.dumps({"text": "x", "dense_weight": None}).encode())
    assert code == 422


def test_percent_encoded_file_id_roundtrip(service):
    """A fileId needing percent-encoding must work across the whole
    lifecycle (path segments are URL-decoded before lookup)."""
    svc, base = service
    fid = "a b"
    enc = "a%20b"
    body, ctype = _multipart({"fileId": fid},
                             [("file", "t.txt", b"spaced id content here")])
    code, resp = _call("POST", f"{base}/v1/files", body, ctype)
    assert code == 202
    assert svc.wait(resp["jobId"], timeout=60).status.value == "done"
    code, raw = _call("GET", f"{base}/v1/files/{enc}")
    assert code == 200 and raw == b"spaced id content here"
    code, out = _call("DELETE", f"{base}/v1/files/{enc}")
    assert code == 200 and out["fileId"] == fid


def test_queue_full_maps_to_503_and_retry_succeeds(ray_session, tmp_path):
    from mmore_ray.serving_http import IndexHTTPService

    def slow_factory(upload_dir, collection_dir, file_id, filename,
                     staged_path):
        def work(device: str) -> dict:
            import time as _t

            _t.sleep(2.0)
            return {"chunks": 0}
        return work

    svc = IndexHTTPService(tmp_path / "u", tmp_path / "c",
                           devices=["cpu:0"], max_queue_size=1,
                           ingest_factory=slow_factory)
    base = f"http://127.0.0.1:{svc.port}"
    try:
        b1, c1 = _multipart({"fileId": "f1"}, [("file", "f1.txt", b"x")])
        code, resp1 = _call("POST", f"{base}/v1/files", b1, c1)
        assert code == 202
        b2, c2 = _multipart({"fileId": "f2"}, [("file", "f2.txt", b"y")])
        code, _ = _call("POST", f"{base}/v1/files", b2, c2)
        assert code == 503  # run_index_api.py:241
        # the rejection left NO staged state: retrying after the queue
        # drains must succeed (not 409 "already exists")
        assert not (tmp_path / "u" / "f2").exists()
        svc.wait(resp1["jobId"], timeout=60)
        code, resp2 = _call("POST", f"{base}/v1/files", b2, c2)
        assert code == 202
        assert svc.wait(resp2["jobId"], timeout=60).status.value == "done"

        # a PUT rejected as duplicate-in-flight keeps the OLD bytes
        b3, c3 = _multipart({"fileId": "f3"}, [("file", "f3.txt", b"old")])
        code, resp3 = _call("POST", f"{base}/v1/files", b3, c3)
        assert code == 202
        b3n, c3n = _multipart({}, [("file", "f3.txt", b"new")])
        code, _ = _call("PUT", f"{base}/v1/files/f3", b3n, c3n)
        assert code == 409  # job for f3 still queued/processing
        assert (tmp_path / "u" / "f3").read_bytes() == b"old"
        svc.wait(resp3["jobId"], timeout=60)
    finally:
        svc.close()


def test_delete_during_inflight_job_stays_unindexed(ray_session, tmp_path):
    """DELETE racing an in-flight ingest must not resurrect the doc:
    the work fn re-checks the canonical staged file after indexing and
    removes its own parquet (serving_http.default_ingest)."""
    from mmore_ray.serving_http import IndexHTTPService, default_ingest

    gate = str(tmp_path / "gate")  # sentinel file: crosses the actor

    def gated_factory(upload_dir, collection_dir, file_id, filename,
                      staged_path):
        inner = default_ingest(upload_dir, collection_dir, file_id,
                               filename, staged_path)

        def work(device: str) -> dict:
            import os
            import time as _t

            for _ in range(600):  # hold until the DELETE has landed
                if os.path.exists(gate):
                    break
                _t.sleep(0.05)
            return inner(device)
        return work

    svc = IndexHTTPService(tmp_path / "u", tmp_path / "c",
                           devices=["cpu:0"], ingest_factory=gated_factory)
    base = f"http://127.0.0.1:{svc.port}"
    try:
        body, ctype = _multipart({"fileId": "ghost"},
                                 [("file", "g.md", b"to be deleted")])
        code, resp = _call("POST", f"{base}/v1/files", body, ctype)
        assert code == 202
        code, _ = _call("DELETE", f"{base}/v1/files/ghost")
        assert code == 200
        (tmp_path / "gate").write_bytes(b"go")
        job = svc.wait(resp["jobId"], timeout=60)
        assert job.status.value == "done", job.error
        assert job.result["deleted"] is True
        assert not list((tmp_path / "c").glob("doc-ghost*"))
        code, hits = _call("POST", f"{base}/v1/retrieve",
                           json.dumps({"text": "deleted"}).encode())
        assert code == 200 and not any(
            h["sample_id"].startswith("ghost#") for h in hits["hits"])
    finally:
        svc.close()


def test_sse_stream_ends_at_terminal_status(service):
    svc, base = service
    doc = b"stream me a tiny document with a few words in it"
    body, ctype = _multipart({"fileId": "sse1"},
                             [("file", "s.txt", doc)])
    code, resp = _call("POST", f"{base}/v1/files", body, ctype)
    assert code == 202

    req = urllib.request.Request(
        f"{base}/v1/jobs/{resp['jobId']}/events", method="GET")
    events = []
    with urllib.request.urlopen(req, timeout=60) as stream:
        assert stream.headers["Content-Type"].startswith(
            "text/event-stream")
        for line in stream:  # server closes at the terminal event
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[len("data: "):]))
    assert events, "no SSE events received"
    assert events[-1]["status"] in ("done", "failed")
    assert events[-1]["jobId"] == resp["jobId"]
    # statuses only move forward through the lifecycle
    order = {"queued": 0, "processing": 1, "done": 2, "failed": 2}
    seq = [order[e["status"]] for e in events]
    assert seq == sorted(seq)
