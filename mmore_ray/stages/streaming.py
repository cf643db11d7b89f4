"""Stateful streaming-window processing (SURVEY §2.10 actor-state path).

The reference is strictly batch; for stream-shaped workloads the
engine offers two shapes:

  * batch windows — bucketed ``map_groups`` over ts-sorted groups
    (pipelines/queries.q_sessionize / q_events_window);
  * **incremental state** (this module) — when events arrive as an
    ordered, partitioned log and sessions must be emitted while the
    stream is still running, one state machine per key-hash bucket
    holds the open-session state and emits sessions as their gap
    closes.

Two drivers over the same :class:`SessionState` machine:

  * :func:`streaming_sessionize_ds` — the scale path: the log is
    hash-partitioned by key into buckets INSIDE Ray Data
    (``groupby(bucket).map_groups``); each bucket's rows stream
    through its own state machine in micro-batches within the worker.
    Nothing is materialized on the driver; the result is a Dataset.
  * :class:`SessionActor` + :func:`streaming_sessionize` — the
    unbounded-stream shape: long-lived actors keyed by bucket consume
    micro-batches pushed from a log tail; used when sessions must be
    emitted before the input ends.  The helper drives it from an
    in-memory frame (tests / demos only — production would feed it
    from a log consumer).

Ordering assumption (documented per the guide): batches fed to one
bucket's state machine arrive in non-decreasing event-time order per
key; ``flush()`` closes remaining sessions at end-of-stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# the shared cross-engine parity kernels (ONE copy repo-wide)
from ..functions.numeric import int_scale as _int_scale
from ..functions.numeric import to_us as _to_us

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

GAP_US = 30 * 60 * 1_000_000

_OUT_COLS = ["user_id", "session_idx", "n_events", "start_us", "end_us",
             "sum_value_e2"]


class SessionState:
    """Open-session state for one key-hash bucket (plain class; wrap in
    ``SessionActor`` for the long-lived streaming shape)."""

    def __init__(self, gap_us: int = GAP_US):
        self._gap = gap_us
        self._open: dict[int, dict] = {}  # user_id -> session accumulator

    def process(self, rows: pd.DataFrame) -> pd.DataFrame:
        """Consume a ts-ordered micro-batch; return sessions CLOSED by it."""
        closed = []
        for user_id, g in rows.groupby("user_id"):
            us = g["ts_us"].to_numpy()
            vals = g["value_e2"].to_numpy()
            cur = self._open.get(user_id)
            for t, v in zip(us, vals):
                if cur is not None and t - cur["end_us"] > self._gap:
                    closed.append(cur)
                    cur = None
                if cur is None:
                    cur = {"user_id": int(user_id), "session_idx": 0,
                           "n_events": 0, "start_us": int(t),
                           "end_us": int(t), "sum_value_e2": 0}
                cur["n_events"] += 1
                cur["end_us"] = int(t)
                cur["sum_value_e2"] += int(v)
            self._open[user_id] = cur
        return pd.DataFrame(closed)

    def flush(self) -> pd.DataFrame:
        out = [s for s in self._open.values() if s is not None]
        self._open.clear()
        return pd.DataFrame(out)


SessionActor = ray.remote(SessionState) if ray is not None else None


def _user_bucket(uids: pd.Series, num_buckets: int) -> np.ndarray:
    """Hash-spread user→bucket assignment (same fixed-key siphash as
    groupby._bucket_of).  Raw ``user_id % n`` collapses structured id
    spaces — all-even ids would feed only half the buckets, halving
    parallelism and doubling per-bucket memory."""
    h = pd.util.hash_pandas_object(uids, index=False).to_numpy()
    return (h % np.uint64(num_buckets)).astype(np.int64)


def _number_sessions(out: pd.DataFrame) -> pd.DataFrame:
    """Per-user 1-based numbering in session start order (sessions of a
    user all live in one bucket, so per-bucket numbering is global)."""
    if not len(out):
        return pd.DataFrame(columns=_OUT_COLS)
    out = out.sort_values(["user_id", "start_us"], kind="stable")
    out["session_idx"] = out.groupby("user_id").cumcount() + 1
    return out[_OUT_COLS].reset_index(drop=True)


def streaming_sessionize_ds(events_ds, num_buckets: int = 8,
                            micro_batch: int = 1024,
                            gap_us: int = GAP_US):
    """Sessionize an events Dataset through per-bucket state machines.

    The log is hash-partitioned by ``user_id`` into ``num_buckets``
    groups inside Ray Data; each group is ts-sorted in its worker and
    replayed through :class:`SessionState` in ``micro_batch`` slices —
    the same incremental path an unbounded stream would take — and the
    closed sessions come back as a Dataset.  Driver memory is O(1).

    Scale note: parallelism == num_buckets; size it to the cluster.
    A bucket's events must fit one worker (they are one ``map_groups``
    group) — at true stream scale the per-bucket state machine is the
    long-lived ``SessionActor`` fed by a log consumer instead.
    """

    def prep(df: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "ts_us": _to_us(df["ts"]),
            "value_e2": _int_scale(df["value"], 100),
        })
        out["_bucket"] = _user_bucket(out["user_id"], num_buckets)
        return pa.Table.from_pandas(out, preserve_index=False)

    def run_bucket(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values("ts_us", kind="stable")
        state = SessionState(gap_us)
        frames = [state.process(df.iloc[i:i + micro_batch])
                  for i in range(0, len(df), micro_batch)]
        frames.append(state.flush())
        frames = [f for f in frames if len(f)]
        out = (pd.concat(frames, ignore_index=True)
               if frames else pd.DataFrame(columns=_OUT_COLS))
        return pa.Table.from_pandas(_number_sessions(out),
                                    preserve_index=False)

    return (events_ds.map_batches(prep, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(run_bucket, batch_format="pandas"))


def streaming_sessionize(events: pd.DataFrame, num_buckets: int = 4,
                         micro_batch: int = 1000,
                         gap_us: int = GAP_US) -> pd.DataFrame:
    """Drive the ACTOR pool over an in-memory event log as a stream —
    the unbounded-stream demo shape (tests feed it small frames; a
    production stream would push micro-batches from a log tail).

    ``events``: (user_id, ts, value).  Returns closed+flushed sessions;
    ``session_idx`` is assigned per user in emission order (1-based) to
    match the batch sessionizer's numbering.
    """
    ev = events.sort_values("ts", kind="stable")
    df = pd.DataFrame({
        "user_id": ev["user_id"].astype(np.int64).to_numpy(),
        "ts_us": _to_us(ev["ts"]),
        "value_e2": _int_scale(ev["value"], 100),
    })
    actors = [SessionActor.remote(gap_us) for _ in range(num_buckets)]
    try:
        pending = []
        for start in range(0, len(df), micro_batch):
            chunk = df.iloc[start:start + micro_batch]
            bucket = _user_bucket(chunk["user_id"], num_buckets)
            for b in range(num_buckets):
                sub = chunk[bucket == b]
                if len(sub):
                    pending.append(actors[b].process.remote(sub))
        pending.extend(a.flush.remote() for a in actors)
        frames = [f for f in ray.get(pending) if len(f)]
        out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
            columns=_OUT_COLS)
        return _number_sessions(out)
    finally:
        # a worker-side error must not leak num_buckets long-lived
        # actors (and their open-session state) into the Ray session
        for a in actors:
            ray.kill(a)
