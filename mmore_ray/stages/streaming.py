"""Stateful streaming-window processing (SURVEY §2.10 actor-state path).

The reference is strictly batch; for stream-shaped workloads the
engine offers two shapes:

  * batch windows — ``groupby(key).map_groups`` over ts-sorted groups
    (pipelines/queries.q_sessionize / q_events_window);
  * **incremental state in actors** (this module) — when events arrive
    as an ordered, partitioned log and sessions must be emitted while
    the stream is still running, one actor per key-hash bucket holds
    the open-session state and emits sessions as their gap closes.

Ordering assumption (documented per the guide): batches fed to one
bucket actor arrive in non-decreasing event-time order per key; the
driver routes each micro-batch through ``route_batches`` so a key
always hits the same actor.  ``flush()`` closes remaining sessions at
end-of-stream.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

try:
    import ray
except ImportError:  # pragma: no cover
    ray = None

GAP_US = 30 * 60 * 1_000_000


@ray.remote
class SessionActor:
    """Holds open sessions for one key-hash bucket."""

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


def streaming_sessionize(events: pd.DataFrame, num_buckets: int = 4,
                         micro_batch: int = 1000,
                         gap_us: int = GAP_US) -> pd.DataFrame:
    """Drive the actor pool over an event log as a stream.

    ``events``: (user_id, ts, value) — globally ts-sorted (the log
    order).  Returns closed+flushed sessions; ``session_idx`` is
    assigned per user in emission order (1-based) to match the batch
    sessionizer's numbering.
    """
    ev = events.sort_values("ts", kind="stable")
    df = pd.DataFrame({
        "user_id": ev["user_id"].astype(np.int64).to_numpy(),
        # normalize to µs regardless of the input's datetime64 unit
        "ts_us": ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
        "value_e2": np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64),
    })
    actors = [SessionActor.remote(gap_us) for _ in range(num_buckets)]
    pending = []
    for start in range(0, len(df), micro_batch):
        chunk = df.iloc[start:start + micro_batch]
        bucket = (chunk["user_id"].to_numpy() % num_buckets)
        for b in range(num_buckets):
            sub = chunk[bucket == b]
            if len(sub):
                pending.append(actors[b].process.remote(sub))
    pending.extend(a.flush.remote() for a in actors)
    frames = [f for f in ray.get(pending) if len(f)]
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["user_id", "session_idx", "n_events", "start_us", "end_us",
                 "sum_value_e2"])
    # per-user emission-order numbering (sessions close in start order)
    out = out.sort_values(["user_id", "start_us"], kind="stable")
    out["session_idx"] = out.groupby("user_id").cumcount() + 1
    for a in actors:
        ray.kill(a)
    return out.reset_index(drop=True)
