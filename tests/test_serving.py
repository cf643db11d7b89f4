"""Serving-layer analogue (mmore_ray/serving.py): the reference's
indexer job queue (job_queue.py:67-95) and retriever session semantics
as library components — device slots are Ray actors, state advances on
poll."""

import pandas as pd
import pytest

from mmore_ray.serving import (DuplicateJobError, IndexJobQueue, JobStatus,
                               QueueFullError, RetrieverSession)


def _make_work():
    # defined as a closure: cloudpickle ships it BY VALUE (a module-level
    # test function would pickle by reference, unimportable in actors)
    def work(device: str) -> dict:
        return {"device": device, "ok": True}
    return work


def _make_boom():
    def boom(device: str) -> dict:
        raise RuntimeError("index job exploded")
    return boom


def _make_slow():
    def slow(device: str) -> dict:
        import time
        time.sleep(0.3)
        return {"device": device}
    return slow


def test_job_runs_on_a_device_slot_and_completes(ray_session):
    q = IndexJobQueue(devices=["dev:0", "dev:1"])
    try:
        jid = q.submit("file-1", "a.pdf", _make_work())
        job = q.wait(jid)
        assert job.status == JobStatus.DONE
        assert job.result["device"] in ("dev:0", "dev:1")
        assert job.device == job.result["device"]
        assert job.started_at and job.finished_at
    finally:
        q.shutdown()


def test_duplicate_file_id_rejected_until_terminal(ray_session):
    q = IndexJobQueue(devices=["dev:0"])
    try:
        jid = q.submit("file-1", "a.pdf", _make_slow())
        with pytest.raises(DuplicateJobError):
            q.submit("file-1", "a.pdf", _make_work())
        q.wait(jid)
        # terminal → the file_id frees up
        jid2 = q.submit("file-1", "a.pdf", _make_work())
        assert q.wait(jid2).status == JobStatus.DONE
    finally:
        q.shutdown()


def test_queue_full_raises(ray_session):
    q = IndexJobQueue(devices=["dev:0"], max_queue_size=2)
    try:
        q.submit("f1", "a", _make_slow())
        q.submit("f2", "b", _make_slow())
        with pytest.raises(QueueFullError):
            q.submit("f3", "c", _make_work())
    finally:
        q.shutdown()


def test_failed_job_records_error_and_frees_reservation(ray_session):
    q = IndexJobQueue(devices=["dev:0"])
    try:
        jid = q.submit("f1", "a", _make_boom())
        job = q.wait(jid)
        assert job.status == JobStatus.FAILED
        assert "index job exploded" in job.error
        # failure releases the file_id like the reference's finally block
        jid2 = q.submit("f1", "a", _make_work())
        assert q.wait(jid2).status == JobStatus.DONE
    finally:
        q.shutdown()


def test_retention_eviction(ray_session, monkeypatch):
    import mmore_ray.serving as serving

    q = IndexJobQueue(devices=["dev:0"])
    try:
        jid = q.submit("f1", "a", _make_work())
        q.wait(jid)
        monkeypatch.setattr(serving, "JOB_RETENTION_SECONDS", -1.0)
        q.submit("f2", "b", _make_work())  # submit triggers eviction
        assert q.get(jid) is None
    finally:
        q.shutdown()


def test_retriever_session_query_and_lookup(ray_session, tmp_path):
    import ray

    from mmore_ray.stages.embed import index_documents

    docs = pd.DataFrame({
        "sample_id": [f"d{i}" for i in range(8)],
        "text": [f"customer orders pending item{i}" for i in range(4)]
        + [f"unrelated noise tokens {i}" for i in range(4)],
    })
    coll = tmp_path / "coll"
    index_documents(ray.data.from_pandas(docs), str(coll))

    sess = RetrieverSession(str(coll))
    hits = sess.query("customer orders pending", k=3)
    assert len(hits) == 3
    assert all(h["sample_id"].startswith("d") for h in hits)
    assert hits[0]["score"] >= hits[-1]["score"]

    rows = sess.get_by_ids(["d0", "d5"])
    assert sorted(r["sample_id"] for r in rows) == ["d0", "d5"]


def test_queued_jobs_report_queued_until_a_slot_frees(ray_session):
    """One device slot: the second job must report QUEUED (not
    PROCESSING) while the first occupies the slot, and its started_at
    must reflect dispatch, not submit."""
    q = IndexJobQueue(devices=["dev:0"])
    try:
        j1 = q.submit("f1", "a", _make_slow())
        j2 = q.submit("f2", "b", _make_work())
        assert q.get(j1).status == JobStatus.PROCESSING
        snap = q.get(j2)
        assert snap.status == JobStatus.QUEUED
        assert snap.device is None and snap.started_at is None
        assert q.wait(j2).status == JobStatus.DONE
    finally:
        q.shutdown()


def test_free_device_picks_up_queued_job_not_bound_to_busy_slot(ray_session):
    """Two devices, three jobs (long, short, short): the third job must
    run as soon as EITHER device frees — dynamic dispatch, no static
    slot binding."""
    def _make_long():
        def long(device: str) -> dict:
            import time
            time.sleep(2.0)
            return {"device": device}
        return long

    q = IndexJobQueue(devices=["dev:0", "dev:1"])
    try:
        j1 = q.submit("f1", "a", _make_long())
        q.submit("f2", "b", _make_work())
        j3 = q.submit("f3", "c", _make_work())
        job = q.wait(j3, timeout=10)
        # the dispatch property, host-speed-independent: j3 completed on
        # the freed fast slot while the 2 s job still held the other
        assert job.status == JobStatus.DONE
        assert q.get(j1).status == JobStatus.PROCESSING
        q.wait(j1)
    finally:
        q.shutdown()


def test_shutdown_wait_fails_queued_jobs_and_releases_reservations(ray_session):
    """shutdown(wait=True) with a QUEUED backlog: the drain poll must
    NOT dispatch queued jobs onto the freed slots (ray.kill would strand
    them PROCESSING forever) — they end FAILED with their file_ids
    released, while the in-flight job drains to DONE."""
    q = IndexJobQueue(devices=["dev:0"])
    j1 = q.submit("f1", "a", _make_slow())
    j2 = q.submit("f2", "b", _make_work())
    q.shutdown(wait=True)
    assert q.get(j1).status == JobStatus.DONE
    snap = q.get(j2)
    assert snap.status == JobStatus.FAILED
    assert "shut down" in snap.error
    assert snap.finished_at is not None
    assert "f2" not in q._reserved


def test_shutdown_nowait_fails_queued_and_inflight(ray_session):
    """shutdown(wait=False): both the killed in-flight job and the
    never-dispatched queued job must reach a terminal state with
    reservations released (neither stays PROCESSING/QUEUED forever)."""
    q = IndexJobQueue(devices=["dev:0"])
    j1 = q.submit("f1", "a", _make_slow())
    j2 = q.submit("f2", "b", _make_work())
    q.shutdown(wait=False)
    assert q.get(j1).status == JobStatus.FAILED
    assert q.get(j2).status == JobStatus.FAILED
    assert q._reserved == set()
