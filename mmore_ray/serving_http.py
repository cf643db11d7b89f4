"""Stdlib HTTP facade over the serving layer — the indexer API.

The reference ships this surface as FastAPI (``run_index_api.py:85-575``)
and a retriever endpoint (``run_retriever.py``).  FastAPI/uvicorn are
absent from this environment, so the same ENDPOINT SURFACE — routes,
methods, status codes, response shapes, and the SSE job stream — is
implemented on the standard library's ``ThreadingHTTPServer``:

    GET    /                      health           (run_index_api.py:180)
    POST   /v1/files              upload one file  (:187 — 202/409/422/503)
    POST   /v1/files/bulk         upload many      (:245 — per-file outcome)
    PUT    /v1/files/{fileId}     replace          (:317 — 202/404/422/503)
    DELETE /v1/files/{fileId}     delete + unindex (:375 — 200/404)
    GET    /v1/files/{fileId}     download bytes   (:442 — 200/404)
    GET    /v1/jobs/{jobId}       job snapshot     (:509 — 200/404)
    GET    /v1/jobs/{jobId}/events  SSE job stream (:540)
    POST   /v1/retrieve           retriever query  (run_retriever.py)

Work runs on :class:`mmore_ray.serving.IndexJobQueue` (Ray device-slot
actors — the Ray-native queue the reference implements with a thread
pool).  The queue is deliberately lock-free (pull-model, deterministic
to test), so THIS layer owns one service lock that serializes every
queue call and every staged-file mutation across handler threads.

Each accepted upload stages an immutable per-job snapshot under
``uploads/.jobs/`` that the work fn reads — the canonical staged file
(``uploads/<fileId>``, what GET/DELETE see) is only committed once the
queue has accepted the job, so a 409/503 rejection leaves no state
behind (a rejected retry works, a rejected PUT keeps the old bytes,
and an in-flight job can never observe a later upload's content).

The default ingest processes the uploaded file with the real
AutoProcessor dispatch, embeds it through the model-provider registry,
and writes one parquet per document into the collection dir the
reference's Milvus held — so DELETE can unindex per document and
:class:`mmore_ray.serving.RetrieverSession` serves the result.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

from .serving import (DuplicateJobError, IndexJobQueue, Job, QueueFullError,
                      RetrieverSession)

#: SSE cadence (reference run_index_api.py POLL_INTERVAL /
#: HEARTBEAT_SECONDS, scaled to test time)
SSE_POLL_INTERVAL = 0.05
SSE_HEARTBEAT_SECONDS = 2.0


def _job_payload(job: Job) -> dict:
    """≙ run_index_api.py:60-71."""
    return {
        "jobId": job.id,
        "fileId": job.file_id,
        "filename": job.filename,
        "status": job.status.value,
        "device": job.device,
        "result": job.result,
        "error": job.error,
    }


def _safe_component(name: str) -> bool:
    """Path-component sanity (≙ the reference's Invalid-filename 422,
    run_index_api.py:118-128): no separators, no traversal, non-empty.
    ``.jobs`` is reserved for the per-job snapshot directory."""
    return bool(name) and "/" not in name and "\\" not in name \
        and "\x00" not in name and name not in (".", "..", ".jobs")


def _parse_multipart(content_type: str, body: bytes):
    """multipart/form-data → ({field: value}, [(field, filename, bytes)]).

    Stdlib ``email`` MIME parser (the ``cgi`` module is removed in new
    Pythons); form-data parts are ordinary MIME parts with a
    Content-Disposition header."""
    import email.parser
    import email.policy

    msg = email.parser.BytesParser(policy=email.policy.HTTP).parsebytes(
        b"Content-Type: " + content_type.encode() + b"\r\n\r\n" + body)
    fields: dict[str, str] = {}
    files: list[tuple[str, str, bytes]] = []
    if not msg.is_multipart():
        return fields, files
    for part in msg.iter_parts():
        name = part.get_param("name", header="content-disposition")
        filename = part.get_filename()
        payload = part.get_payload(decode=True) or b""
        if filename is None:
            fields[str(name)] = payload.decode("utf-8", errors="replace")
        else:
            files.append((str(name), filename, payload))
    return fields, files


def default_ingest(upload_dir: str, collection_dir: str, file_id: str,
                   filename: str, staged_path: str):
    """Build the work_fn the queue runs for one uploaded file: process
    (AutoProcessor dispatch — the real processor stack) → embed (dense
    + sparse through the model-provider registry) → write ONE parquet
    per document into the collection (atomic tmp+rename), so deletion /
    replacement is a per-document file operation — the role the
    reference's Milvus ``document_id`` filter plays
    (run_index_api.py:414-427).

    ``staged_path`` is this job's immutable snapshot — the work fn
    never reads the canonical ``uploads/<fileId>`` (which a later PUT
    may rewrite).  After indexing it re-checks the canonical file: if a
    DELETE removed it mid-flight, the just-written parquet is unlinked
    so a deleted document can never be resurrected by a racing job."""

    def work(device: str) -> dict:
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from .models import provider_class
        from .stages.processors import BINARY_EXTENSIONS, process_batch

        raw = Path(staged_path).read_bytes()
        content = (raw.decode("latin-1")
                   if filename.lower().endswith(BINARY_EXTENSIONS)
                   else raw.decode("utf-8", errors="replace"))
        samples = process_batch(pa.table({
            "file_path": pa.array([filename], pa.string()),
            "content": pa.array([content], pa.string()),
        }), on_error="raise")
        # document identity for per-doc delete/replace; sample ids are
        # re-keyed under the fileId so two uploads of the same filename
        # under different ids can never collide in the collection
        samples = samples.set_column(
            samples.schema.get_field_index("document_id"), "document_id",
            pa.array([file_id] * samples.num_rows, pa.string()))
        samples = samples.set_column(
            samples.schema.get_field_index("sample_id"), "sample_id",
            pa.array([f"{file_id}#{i}" for i in range(samples.num_rows)],
                     pa.string()))
        dense = provider_class("dense_embedder", None)()
        sparse = provider_class("sparse_embedder", None)()
        embedded = sparse(dense(samples))
        out = Path(collection_dir) / f"doc-{job_safe(file_id)}.parquet"
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_name(f".{out.name}.{uuid.uuid4().hex}.tmp")
        pq.write_table(embedded, tmp)
        os.replace(tmp, out)
        deleted = not (Path(upload_dir) / file_id).exists()
        if deleted:
            out.unlink(missing_ok=True)
        try:
            Path(staged_path).unlink()  # snapshot consumed
        except OSError:
            pass
        return {"chunks": 0 if deleted else embedded.num_rows,
                "device": device, "deleted": deleted}

    return work


def job_safe(file_id: str) -> str:
    """Filesystem-stable name for a fileId (hex-escape non-word chars)."""
    return "".join(c if c.isalnum() or c in "-_." else f"%{ord(c):02x}"
                   for c in file_id)


class IndexHTTPService:
    """The running service: queue + upload dir + collection + HTTP
    listener on 127.0.0.1 (``port=0`` → ephemeral, read ``.port``).

    ``self._lock`` serializes every IndexJobQueue call and every
    staged-file mutation across ThreadingHTTPServer handler threads —
    the queue itself is single-threaded by design (serving.py).  Use
    :meth:`wait` (not ``svc.queue.wait``) when HTTP traffic may be
    concurrent."""

    def __init__(self, upload_dir: str, collection_dir: str,
                 devices: list[str] | None = None, jobs_per_gpu: int = 1,
                 max_queue_size: int | None = None, port: int = 0,
                 ingest_factory=default_ingest):
        self.upload_dir = str(upload_dir)
        self.collection_dir = str(collection_dir)
        self._jobs_dir = Path(self.upload_dir) / ".jobs"
        self._jobs_dir.mkdir(parents=True, exist_ok=True)
        Path(self.collection_dir).mkdir(parents=True, exist_ok=True)
        self.queue = IndexJobQueue(devices or ["cpu:0"], jobs_per_gpu,
                                   max_queue_size)
        self._lock = threading.Lock()
        self._ingest_factory = ingest_factory
        svc = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict,
                      content_type: str = "application/json") -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", content_type)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length", "0") or 0)
                return self.rfile.read(n) if n else b""

            def _route(self):
                """(raw-path-no-query-rstripped, decoded segments) —
                segments are split BEFORE unquoting so an encoded '/'
                in a fileId cannot change the route shape."""
                raw = self.path.split("?", 1)[0].rstrip("/")
                return raw, [urllib.parse.unquote(p)
                             for p in raw.split("/")]

            # -- routing ------------------------------------------------
            def do_GET(self):
                raw, parts = self._route()
                if raw == "":
                    return self._send(200, {
                        "message": "Indexer API is running"})
                if len(parts) == 5 and parts[1:3] == ["v1", "jobs"] \
                        and parts[4] == "events":
                    return svc._sse(self, parts[3])
                if len(parts) == 4 and parts[1:3] == ["v1", "jobs"]:
                    return svc._job_snapshot(self, parts[3])
                if len(parts) == 4 and parts[1:3] == ["v1", "files"]:
                    return svc._download(self, parts[3])
                self._send(404, {"detail": "unknown route"})

            def do_POST(self):
                raw, _ = self._route()
                if raw == "/v1/files":
                    return svc._upload(self, self._body(),
                                       self.headers.get("Content-Type", ""),
                                       replace=False)
                if raw == "/v1/files/bulk":
                    return svc._bulk(self, self._body(),
                                     self.headers.get("Content-Type", ""))
                if raw == "/v1/retrieve":
                    return svc._retrieve(self, self._body())
                self._send(404, {"detail": "unknown route"})

            def do_PUT(self):
                raw, parts = self._route()
                if len(parts) == 4 and parts[1:3] == ["v1", "files"]:
                    return svc._upload(self, self._body(),
                                       self.headers.get("Content-Type", ""),
                                       replace=True, file_id=parts[3])
                self._send(404, {"detail": "unknown route"})

            def do_DELETE(self):
                raw, parts = self._route()
                if len(parts) == 4 and parts[1:3] == ["v1", "files"]:
                    return svc._delete(self, parts[3])
                self._send(404, {"detail": "unknown route"})

        self._httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self._httpd.server_address[1]
        self._thread = threading.Thread(target=self._httpd.serve_forever,
                                        daemon=True)
        self._thread.start()

    # -- endpoint bodies (svc methods so they can use the queue) --------

    def _stage_and_submit(self, file_id: str, filename: str, data: bytes,
                          replace: bool) -> tuple[int, dict]:
        """Shared by single upload, PUT replace and bulk: validate →
        snapshot → submit → commit canonical staged bytes.  A queue
        rejection rolls everything back (no staged-file leak, a
        rejected replace keeps the previous content), so the client
        can simply retry."""
        with self._lock:
            staged = Path(self.upload_dir) / file_id
            exists = staged.exists()
            if not replace and exists:
                return 409, {
                    "detail": f"File with ID {file_id} already exists"}
            if replace and not exists:
                return 404, {
                    "detail": f"File with ID {file_id} not found"}
            snap = self._jobs_dir / f"{job_safe(file_id)}.{uuid.uuid4().hex}"
            snap.write_bytes(data)
            work = self._ingest_factory(self.upload_dir,
                                        self.collection_dir,
                                        file_id, filename, str(snap))
            old = staged.read_bytes() if exists else None
            # canonical bytes must be visible BEFORE submit: the work
            # fn's delete-guard checks this path, and a fast job must
            # not mistake a not-yet-committed upload for a deletion
            staged.write_bytes(data)
            try:
                job_id = self.queue.submit(file_id, filename, work)
            except (DuplicateJobError, QueueFullError) as e:
                if old is None:
                    staged.unlink(missing_ok=True)
                else:
                    staged.write_bytes(old)
                snap.unlink(missing_ok=True)
                if isinstance(e, DuplicateJobError):
                    return 409, {
                        "detail": f"File with ID {file_id} is already "
                                  "being processed"}
                return 503, {"detail": "Server busy, retry later"}
            return 202, {"jobId": job_id, "fileId": file_id}

    def _upload(self, handler, body: bytes, ctype: str,
                replace: bool, file_id: str | None = None) -> None:
        fields, files = _parse_multipart(ctype, body)
        if file_id is None:
            file_id = fields.get("fileId", "")
        if not files or not files[0][1]:
            return handler._send(422, {
                "detail": "Provided file should have a filename"})
        _, filename, data = files[0]
        if not (_safe_component(file_id) and _safe_component(filename)):
            return handler._send(422, {"detail": "Invalid filename"})
        code, payload = self._stage_and_submit(file_id, filename, data,
                                               replace)
        handler._send(code, payload)

    def _bulk(self, handler, body: bytes, ctype: str) -> None:
        """Per-file outcome list (≙ run_index_api.py:245-316): each
        part's FIELD NAME is its fileId."""
        _, files = _parse_multipart(ctype, body)
        if not files:
            return handler._send(400, {"detail": "no files provided"})
        jobs = []
        for file_id, filename, data in files:
            if not (_safe_component(file_id) and _safe_component(filename)):
                jobs.append({"fileId": file_id, "error": "invalid filename"})
                continue
            code, payload = self._stage_and_submit(file_id, filename, data,
                                                   replace=False)
            if code == 202:
                jobs.append({"fileId": file_id, "jobId": payload["jobId"]})
            else:
                jobs.append({"fileId": file_id, "error": payload["detail"]})
        handler._send(202, {"jobs": jobs})

    def _delete(self, handler, file_id: str) -> None:
        with self._lock:
            staged = Path(self.upload_dir) / file_id
            if not _safe_component(file_id) or not staged.exists():
                return handler._send(404, {
                    "detail": f"File with ID {file_id} not found"})
            # unlink canonical first: an in-flight job for this id
            # re-checks it after indexing and removes its own parquet
            # (default_ingest), so either ordering ends unindexed
            staged.unlink()
            doc = (Path(self.collection_dir)
                   / f"doc-{job_safe(file_id)}.parquet")
            doc.unlink(missing_ok=True)  # ≙ Milvus document_id delete
        handler._send(200, {"status": "success",
                            "message": "File successfully deleted",
                            "fileId": file_id})

    def _download(self, handler, file_id: str) -> None:
        with self._lock:
            staged = Path(self.upload_dir) / file_id
            if not _safe_component(file_id) or not staged.exists():
                return handler._send(404, {
                    "detail": f"File with ID {file_id} not found"})
            data = staged.read_bytes()
        handler.send_response(200)
        handler.send_header("Content-Type", "application/octet-stream")
        handler.send_header("Content-Length", str(len(data)))
        handler.end_headers()
        handler.wfile.write(data)

    def _get_job(self, job_id: str) -> Job | None:
        with self._lock:
            return self.queue.get(job_id)

    def wait(self, job_id: str, timeout: float = 60.0) -> Job | None:
        """Lock-holding analogue of ``IndexJobQueue.wait`` — safe while
        handler threads are serving traffic."""
        deadline = time.monotonic() + timeout
        while True:
            job = self._get_job(job_id)
            if job is None or job.status.is_terminal \
                    or time.monotonic() >= deadline:
                return job
            time.sleep(0.05)

    def _job_snapshot(self, handler, job_id: str) -> None:
        job = self._get_job(job_id)
        if job is None:
            return handler._send(404, {"detail": f"Unknown job {job_id}"})
        handler._send(200, _job_payload(job))

    def _sse(self, handler, job_id: str) -> None:
        """≙ run_index_api.py:540-575: push status changes until the
        job is terminal; comment keepalives while idle.  A client
        disconnect ends the stream quietly (BrokenPipe on the next
        write) instead of dumping a handler traceback."""
        handler.send_response(200)
        handler.send_header("Content-Type", "text/event-stream")
        handler.send_header("Cache-Control", "no-cache")
        handler.end_headers()
        last = None
        idle = 0.0
        try:
            while True:
                job = self._get_job(job_id)
                status = job.status.value if job else "unknown"
                if status != last:
                    last = status
                    idle = 0.0
                    payload = (_job_payload(job) if job
                               else {"jobId": job_id, "status": status})
                    handler.wfile.write(
                        f"data: {json.dumps(payload)}\n\n".encode())
                    handler.wfile.flush()
                    if job is None or job.status.is_terminal:
                        return
                else:
                    idle += SSE_POLL_INTERVAL
                    if idle >= SSE_HEARTBEAT_SECONDS:
                        idle = 0.0
                        handler.wfile.write(b": keepalive\n\n")
                        handler.wfile.flush()
                time.sleep(SSE_POLL_INTERVAL)
        except (BrokenPipeError, ConnectionResetError):
            return

    def _retrieve(self, handler, body: bytes) -> None:
        """≙ run_retriever.py query endpoint over RetrieverSession."""
        try:
            req = json.loads(body.decode() or "{}")
        except json.JSONDecodeError:
            return handler._send(400, {"detail": "invalid JSON body"})
        text = req.get("text")
        if not text:
            return handler._send(422, {"detail": "missing 'text'"})
        try:
            k = int(req.get("k", 5))
            dense_weight = float(req.get("dense_weight", 0.5))
        except (TypeError, ValueError):
            return handler._send(422, {
                "detail": "'k' and 'dense_weight' must be numeric"})
        session = RetrieverSession(self.collection_dir)
        hits = session.query(text, k=k, dense_weight=dense_weight)
        handler._send(200, {"hits": hits})

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=5)
        with self._lock:
            self.queue.shutdown(wait=True)
