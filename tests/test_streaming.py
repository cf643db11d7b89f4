"""Stateful streaming sessionizer must agree with the batch
sessionizer (q_sessionize) on the same event log."""

import pandas as pd
import pyarrow.parquet as pq


def test_streaming_sessionize_matches_batch(ray_session):
    from mmore_ray.pipelines.queries import q_sessionize
    from mmore_ray.stages.streaming import streaming_sessionize

    SF = "/root/testdata/sf0.001"
    events = pq.read_table(f"{SF}/events.parquet",
                           columns=["user_id", "ts", "value"]).to_pandas()
    got = streaming_sessionize(events, num_buckets=4, micro_batch=97)
    want = q_sessionize(SF).to_pandas()
    cols = ["user_id", "session_idx", "n_events", "start_us", "end_us",
            "sum_value_e2"]
    g = got[cols].sort_values(cols).reset_index(drop=True)
    w = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_streaming_sessionize_tiny_batches(ray_session):
    # micro-batch of 1 row: maximal state carry-over between calls
    from mmore_ray.stages.streaming import streaming_sessionize

    events = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                              "2024-01-01 01:30", "2024-01-01 00:05"]),
        "value": [1.0, 2.0, 3.0, 4.0],
    })
    out = streaming_sessionize(events, num_buckets=2, micro_batch=1)
    u1 = out[out.user_id == 1].sort_values("session_idx")
    assert list(u1.n_events) == [2, 1]  # 30-min gap splits at 01:30
    assert list(u1.session_idx) == [1, 2]
    assert out[out.user_id == 2].n_events.tolist() == [1]
