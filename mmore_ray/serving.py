"""Serving-layer analogue (library surface, no HTTP).

The reference ships an indexer API — FastAPI endpoints around an
in-memory ``JobQueue`` with one worker per GPU (``run_index_api.py``,
``job_queue.py:67-95``) — and a retriever API (``run_retriever.py``).
FastAPI/uvicorn are absent from this environment, so the HTTP layer is
out of scope (recorded in COVERAGE.md); the SEMANTICS underneath are
implemented here as first-class library components, and each reference
endpoint maps 1:1 onto a method:

    POST /v1/files            → IndexJobQueue.submit
    GET  /v1/files/{job_id}   → IndexJobQueue.get
    POST /v1/retrieve         → RetrieverSession.query

Ray-native design (NOT the reference's thread pool): each device slot
is a Ray ACTOR holding that device for its lifetime — the per-GPU
models can never be double-booked because the actor is the booking.
Job state is advanced by a pull model (``_poll`` on every public call)
instead of worker-thread callbacks: no background threads, fully
deterministic to test.

Queue discipline mirrors the reference: ``jobs_per_gpu`` slots per
device, pending cap 10× workers (``QueueFullError``), one in-flight job
per ``file_id`` (``DuplicateJobError``), finished jobs queryable for
2 h then evicted."""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Optional

import ray

#: keep finished jobs queryable before eviction (reference
#: job_queue.py JOB_RETENTION_SECONDS)
JOB_RETENTION_SECONDS = 7200


class JobStatus(str, Enum):
    QUEUED = "queued"
    PROCESSING = "processing"
    DONE = "done"
    FAILED = "failed"

    @property
    def is_terminal(self) -> bool:
        return self in (JobStatus.DONE, JobStatus.FAILED)


class DuplicateJobError(Exception):
    """A job for this file id is already queued or running."""


class QueueFullError(Exception):
    """Too many jobs pending; the caller should retry later."""


@dataclass
class Job:
    id: str
    file_id: str
    filename: str
    status: JobStatus = JobStatus.QUEUED
    device: Optional[str] = None
    result: Optional[dict] = None
    error: Optional[str] = None
    created_at: float = field(default_factory=time.time)
    started_at: Optional[float] = None
    finished_at: Optional[float] = None


@ray.remote
class _DeviceSlot:
    """One device checkout for its whole lifetime.  Ray serializes the
    actor's method calls, so at most one job runs on the slot at a
    time — the actor IS the device lock."""

    def __init__(self, device: str):
        self._device = device

    def run(self, work_fn: Callable[[str], dict]) -> dict:
        return work_fn(self._device)


class IndexJobQueue:
    """≙ reference ``job_queue.JobQueue`` (job_queue.py:67-95) on Ray
    actors.  ``submit`` returns a job id immediately; QUEUED jobs wait
    in a FIFO and bind to the first FREE device slot (one in-flight
    call per slot); state advances on every public call via
    non-blocking ``ray.wait``."""

    def __init__(self, devices: list[str], jobs_per_gpu: int = 1,
                 max_queue_size: int | None = None):
        self.devices = list(devices)
        self._closed = False
        self.n_workers = len(self.devices) * jobs_per_gpu
        self.max_queue_size = (max_queue_size if max_queue_size is not None
                               else self.n_workers * 10)
        self._slots = [
            (_DeviceSlot.options(name=None).remote(d), d)
            for d in self.devices for _ in range(jobs_per_gpu)
        ]
        # at most ONE in-flight call per slot; QUEUED jobs wait in a
        # FIFO and bind to a device only when a slot frees — the
        # reference's first-free-device checkout (static binding at
        # submit time would let a free device idle behind a long job
        # queued on another slot)
        self._inflight: dict[int, tuple[Any, str] | None] = {
            i: None for i in range(len(self._slots))}
        self._pending: list[tuple[str, Callable[[str], dict]]] = []
        self._jobs: dict[str, Job] = {}
        self._reserved: set[str] = set()

    # -- public API (the would-be HTTP endpoints) ------------------------

    def submit(self, file_id: str, filename: str,
               work_fn: Callable[[str], dict]) -> str:
        if self._closed:
            # a silent post-shutdown accept would return a job id that
            # can never run (no slots; _dispatch is a no-op)
            raise RuntimeError("queue is shut down")
        self._poll()
        if file_id in self._reserved:
            raise DuplicateJobError(file_id)
        if self._pending_count() >= self.max_queue_size:
            raise QueueFullError()
        job_id = uuid.uuid4().hex
        self._reserved.add(file_id)
        self._jobs[job_id] = Job(id=job_id, file_id=file_id,
                                 filename=filename)
        self._pending.append((job_id, work_fn))
        self._dispatch()
        return job_id

    def get(self, job_id: str) -> Optional[Job]:
        self._poll()
        return self._jobs.get(job_id)

    def wait(self, job_id: str, timeout: float = 60.0) -> Job:
        """Block until the job is terminal (test/CLI convenience; the
        HTTP layer would poll ``get`` instead)."""
        deadline = time.time() + timeout
        while time.time() < deadline:
            job = self.get(job_id)
            if job is None or job.status.is_terminal:
                return job
            time.sleep(0.05)
        return self.get(job_id)

    def shutdown(self, wait: bool = True) -> None:
        """Drain in-flight jobs (the reference's
        ``executor.shutdown(wait=True)``) then release the slots.
        ``wait=False`` hard-kills mid-job — in-flight jobs are marked
        FAILED rather than left PROCESSING forever.  Still-QUEUED jobs
        are FAILED too in both modes (``_dispatch`` is a no-op once
        closed, so they could never run), releasing their file_id
        reservations.  Either way the queue refuses further submits."""
        self._closed = True
        if wait:
            # one final poll per in-flight ref, blocking: records land
            # in their terminal state and file_ids are released
            # (_closed stops _poll's trailing dispatch from launching
            # queued jobs onto the freed slots just before ray.kill)
            refs = [slot[0] for slot in self._inflight.values()
                    if slot is not None]
            if refs:
                ray.wait(refs, num_returns=len(refs))
            self._poll()
        else:
            for idx, slot in self._inflight.items():
                if slot is not None:
                    job = self._jobs[slot[1]]
                    job.status = JobStatus.FAILED
                    job.error = "shutdown(wait=False) killed the slot"
                    job.finished_at = time.time()
                    self._reserved.discard(job.file_id)
        for job_id, _work_fn in self._pending:
            job = self._jobs[job_id]
            if not job.status.is_terminal:
                job.status = JobStatus.FAILED
                job.error = "cancelled: queue shut down before dispatch"
                job.finished_at = time.time()
                self._reserved.discard(job.file_id)
        for actor, _ in self._slots:
            ray.kill(actor)
        self._slots = []
        self._inflight = {}
        self._pending = []

    # -- internals --------------------------------------------------------

    def _poll(self) -> None:
        for idx, slot in self._inflight.items():
            if slot is None:
                continue
            ref, job_id = slot
            done, _ = ray.wait([ref], timeout=0)
            if not done:
                continue
            job = self._jobs[job_id]
            try:
                job.result = ray.get(ref)
                job.status = JobStatus.DONE
            except Exception as e:  # noqa: BLE001 — error IS the result
                job.error = str(e)
                job.status = JobStatus.FAILED
            job.finished_at = time.time()
            self._reserved.discard(job.file_id)
            self._inflight[idx] = None
        self._dispatch()
        self._evict_old()

    def _dispatch(self) -> None:
        """FIFO jobs onto free slots; a job transitions QUEUED →
        PROCESSING (device bound, started_at stamped) only here."""
        if self._closed:
            # shutdown() owns the fate of still-pending jobs; launching
            # them onto slots about to be ray.kill'ed would strand them
            # PROCESSING forever with their file_ids reserved
            return
        for idx in self._inflight:
            if not self._pending:
                return
            if self._inflight[idx] is not None:
                continue
            job_id, work_fn = self._pending.pop(0)
            actor, device = self._slots[idx]
            job = self._jobs[job_id]
            job.device = device
            job.status = JobStatus.PROCESSING
            job.started_at = time.time()
            self._inflight[idx] = (actor.run.remote(work_fn), job_id)

    def _pending_count(self) -> int:
        return sum(not j.status.is_terminal for j in self._jobs.values())

    def _evict_old(self) -> None:
        now = time.time()
        stale = [j.id for j in self._jobs.values()
                 if j.finished_at
                 and now - j.finished_at > JOB_RETENTION_SECONDS]
        for job_id in stale:
            self._jobs.pop(job_id, None)


class RetrieverSession:
    """≙ reference ``run_retriever.py`` read path: hold one collection,
    answer queries (hybrid dense/sparse, optional cross-encoder rerank)
    and id lookups.  Providers resolve through ``mmore_ray.models``, so
    real embedders serve without code changes."""

    def __init__(self, collection_dir: str,
                 dense_provider: str | None = None,
                 sparse_provider: str | None = None,
                 reranker_provider: str | None = None):
        self._dir = collection_dir
        self._dense = dense_provider
        self._sparse = sparse_provider
        # the rerank seam must ride along with the embedder seams — a
        # real-model session would otherwise silently rerank with the
        # token-overlap fake
        self._reranker = reranker_provider

    def query(self, text: str, k: int = 5, dense_weight: float = 0.5,
              rerank: bool = False) -> list[dict]:
        from .stages.embed import retrieve

        hits = retrieve(self._dir, text, k=k, dense_weight=dense_weight,
                        rerank=rerank, dense_provider=self._dense,
                        sparse_provider=self._sparse,
                        reranker_provider=self._reranker)
        return hits.to_pandas().to_dict("records")

    def get_by_ids(self, ids: list[str]) -> list[dict]:
        from .stages.embed import get_by_ids

        return get_by_ids(self._dir, ids).to_pandas().to_dict("records")
