"""Edge-case tests for the as-of join, interval join and the exact
count-distinct / median aggregates — the cases the TPC-H-shaped oracle
data does not pin: equal-timestamp tie-breaks, intervals spanning two
bands, [start, end) boundary semantics, even-count median
interpolation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from mmore_ray.stages.groupby import grouped_count_distinct, grouped_median
from mmore_ray.stages.joins import asof_join, interval_agg_join

US = 1_000_000
# epoch-µs of a modern date: exercises the >2^53 territory where a
# float64 roundtrip would silently corrupt timestamps
T0 = 1_700_000_000 * US


def _ds(rows: dict, parallelism: int = 2):
    return ray.data.from_arrow(
        pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})
    ).repartition(parallelism)


def test_asof_join_tiebreak_and_inner(ray_session):
    left = _ds({
        "key": [1, 1, 2, 3],
        "us": [T0 + 10, T0 + 4, T0 + 10, T0 + 10],
        "lid": [100, 101, 102, 103],
    })
    right = _ds({
        "key": [1, 1, 1, 2],
        # key 1: two rows share us=T0+5 → tiebreak picks rid 8, not 7;
        # key 2's only row is AFTER the left row → left row dropped;
        # key 3 has no right rows at all → dropped (inner)
        "us": [T0 + 5, T0 + 5, T0 + 1, T0 + 20],
        "rid": [7, 8, 3, 9],
    })
    out = asof_join(left, right, by="key", on="us", left_cols=["lid"],
                    right_cols=["rid"], tiebreak="rid").to_pandas()
    got = dict(zip(out.lid, out.rid))
    assert got == {100: 8, 101: 3}
    assert out.us.dtype == np.int64 and set(out.us) == {T0 + 10, T0 + 4}


def test_asof_join_exact_match_included(ray_session):
    left = _ds({"key": [5], "us": [T0], "lid": [1]})
    right = _ds({"key": [5], "us": [T0], "rid": [42]})
    out = asof_join(left, right, by="key", on="us", left_cols=["lid"],
                    right_cols=["rid"], tiebreak="rid").to_pandas()
    assert list(out.rid) == [42]  # on ≤ on: equality qualifies


def test_interval_join_band_spanning_and_boundaries(ray_session):
    W = 100 * US
    # interval starts mid-band and spans into the next band: the point
    # in the second band must be counted exactly once; end is exclusive
    intervals = _ds({"iid": [1], "start": [T0 + 50 * US],
                     "end": [T0 + 150 * US]})
    points = _ds({
        "us": [T0 + 49 * US,   # before start → out
               T0 + 50 * US,   # == start → in (inclusive)
               T0 + 120 * US,  # second band → in, counted once
               T0 + 150 * US], # == end → out (exclusive)
        "v": [1, 10, 100, 1000],
    })
    out = interval_agg_join(points, intervals, point_on="us",
                            interval_id="iid", interval_start="start",
                            interval_end="end", sum_cols=["v"],
                            bucket_width=W).to_pandas()
    assert len(out) == 1
    assert int(out.n_points[0]) == 2 and int(out.v[0]) == 110


def test_interval_join_zero_point_interval_absent(ray_session):
    W = 100 * US
    intervals = _ds({"iid": [1, 2], "start": [T0, T0 + 1000 * US],
                     "end": [T0 + 10 * US, T0 + 1010 * US]})
    points = _ds({"us": [T0 + 5 * US], "v": [3]})
    out = interval_agg_join(points, intervals, point_on="us",
                            interval_id="iid", interval_start="start",
                            interval_end="end", sum_cols=["v"],
                            bucket_width=W).to_pandas()
    assert list(out.iid) == [1]  # inner: empty window 2 absent


def test_grouped_count_distinct_dup_heavy(ray_session):
    rng = np.random.default_rng(7)
    n = 20_000
    df = pd.DataFrame({"g": rng.integers(0, 3, n),
                       "x": rng.integers(0, 50, n)})
    ds = ray.data.from_pandas(df).repartition(8)
    out = (grouped_count_distinct(ds, ["g"], "x", out_col="n_x")
           .to_pandas().sort_values("g").reset_index(drop=True))
    want = (df.groupby("g")["x"].nunique().reset_index(name="n_x"))
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
    assert out.n_x.dtype == np.int64


def test_grouped_median_interpolation(ray_session):
    # group a: odd count → exact middle; group b: even count → mean of
    # the two middle values (7.5 → 750 integerized)
    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 4,
                       "x": [1.0, 9.0, 5.0, 3.0, 7.0,
                             5.0, 10.0, 20.0, 10.0]})
    ds = ray.data.from_pandas(df).repartition(3)
    out = (grouped_median(ds, ["g"], "x", out_col="m", scale=100)
           .to_pandas().sort_values("g").reset_index(drop=True))
    assert list(out.g) == ["a", "b"]
    assert list(out.m) == [500, 1000]
    # quantile_cont parity on a case with a genuine .5 interpolation
    df2 = pd.DataFrame({"g": ["c"] * 4, "x": [1.0, 6.0, 9.0, 2.0]})
    out2 = grouped_median(ray.data.from_pandas(df2), ["g"], "x",
                          out_col="m", scale=100).to_pandas()
    assert list(out2.m) == [400]  # (2 + 6) / 2


def test_hopping_window_replication_and_tumbling(ray_session):
    from mmore_ray.stages.groupby import hopping_window_agg

    STEP = 15 * 60 * US
    WIDTH = 4 * STEP
    # one row exactly ON the grid, one mid-step: each must appear in
    # exactly width/step = 4 windows; grid-aligned ts is included in
    # its own window (half-open [w, w+width))
    ds = _ds({"us": [T0 - (T0 % STEP), T0 - (T0 % STEP) + STEP // 2],
              "v": [1, 10]}, parallelism=1)
    out = hopping_window_agg(ds, ts_col="us", keys=[], sum_cols=["v"],
                             width=WIDTH, step=STEP).to_pandas()
    assert int(out.n_rows.sum()) == 8  # 2 rows × 4 windows
    assert (out.window_start_us % STEP == 0).all()
    both = out[out.n_rows == 2]
    assert len(both) == 4 and (both.v == 11).all()
    # tumbling = step == width: each row in exactly one window
    t = hopping_window_agg(ds, ts_col="us", keys=[], sum_cols=["v"],
                           width=STEP, step=STEP).to_pandas()
    assert int(t.n_rows.sum()) == 2


def test_asof_join_hot_key_skew(ray_session):
    """One key owns 95% of both sides (the mega-repo shape): the
    operator must stay correct — the whole hot key lands in one bucket
    and is handled by a single vectorized merge_asof."""
    rng = np.random.default_rng(11)
    n = 50_000
    key = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 40, n))
    l_us = T0 + rng.integers(0, 10_000, n) * US
    lid = np.arange(n)
    rk = np.where(rng.random(n) < 0.95, 7, rng.integers(0, 40, n))
    r_us = T0 + rng.integers(0, 10_000, n) * US
    rid = np.arange(n)
    left = _ds({"key": key, "us": l_us, "lid": lid}, parallelism=8)
    right = _ds({"key": rk, "us": r_us, "rid": rid}, parallelism=8)
    out = asof_join(left, right, by="key", on="us", left_cols=["lid"],
                    right_cols=["rid"], tiebreak="rid").to_pandas()

    lf = pd.DataFrame({"key": key, "us": l_us, "lid": lid}).sort_values("us",
                                                                        kind="stable")
    rf = pd.DataFrame({"key": rk, "us": r_us, "rid": rid}).sort_values(
        ["us", "rid"], kind="stable")
    want = pd.merge_asof(lf, rf, on="us", by="key",
                         direction="backward").dropna(subset=["rid"])
    assert len(out) == len(want)
    got = dict(zip(out.lid, out.rid))
    ref = dict(zip(want.lid, want.rid.astype(np.int64)))
    assert got == ref


def test_interval_join_long_interval_replication(ray_session):
    """An interval much longer than the band width replicates into many
    bands; its per-band partials must merge to one exact row."""
    W = 10 * US
    intervals = _ds({"iid": [5], "start": [T0], "end": [T0 + 1000 * US]},
                    parallelism=1)
    points = _ds({"us": [T0 + i * US for i in range(0, 1000, 7)],
                  "v": [1] * len(range(0, 1000, 7))}, parallelism=4)
    out = interval_agg_join(points, intervals, point_on="us",
                            interval_id="iid", interval_start="start",
                            interval_end="end", sum_cols=["v"],
                            bucket_width=W).to_pandas()
    assert len(out) == 1 and int(out.n_points[0]) == 143


def test_grouped_quantiles_sketch_error_bound(ray_session):
    from mmore_ray.stages.groupby import grouped_quantiles_sketch

    rng = np.random.default_rng(3)
    n = 120_000
    df = pd.DataFrame({"g": rng.integers(0, 4, n),
                       "x": rng.gamma(2.0, 1500.0, n)})
    LO, HI, BINS = 0.0, 30_000.0, 512
    ds = ray.data.from_pandas(df).repartition(8)
    out = (grouped_quantiles_sketch(ds, ["g"], "x", [0.5, 0.9, 0.99],
                                    lo=LO, hi=HI, bins=BINS)
           .to_pandas().sort_values("g").reset_index(drop=True))
    bound = (HI - LO) / BINS
    for g, grp in df.groupby("g"):
        row = out[out.g == g].iloc[0]
        for q, cname in [(0.5, "q05"), (0.9, "q09"), (0.99, "q099")]:
            exact = np.quantile(grp.x, q)
            assert abs(row[cname] - exact) <= bound + 1e-9, (
                g, q, row[cname], exact)


def test_grouped_quantiles_sketch_multi_key(ray_session):
    from mmore_ray.stages.groupby import grouped_quantiles_sketch

    df = pd.DataFrame({"a": [1, 1, 2, 2] * 50, "b": ["x", "y"] * 100,
                       "x": np.tile(np.arange(100.0), 2)})
    out = (grouped_quantiles_sketch(
        ray.data.from_pandas(df).repartition(4), ["a", "b"], "x", [0.5],
        lo=0.0, hi=100.0, bins=200).to_pandas())
    assert len(out) == 4
    for _, row in out.iterrows():
        exact = np.quantile(df[(df.a == row.a) & (df.b == row.b)].x, 0.5)
        assert abs(row.q05 - exact) <= 0.5 + 1e-9


def test_grouped_quantiles_sketch_ignores_nan(ray_session):
    """NaN values must be ignored (SQL quantile NULL semantics), not
    counted in the lowest bin where they'd drag every quantile to lo."""
    from mmore_ray.stages.groupby import grouped_quantiles_sketch

    vals = np.concatenate([np.full(50, np.nan),
                           np.linspace(40.0, 60.0, 100)])
    df = pd.DataFrame({"g": [1] * 150, "x": vals})
    out = grouped_quantiles_sketch(
        ray.data.from_pandas(df).repartition(3), ["g"], "x", [0.5],
        lo=0.0, hi=100.0, bins=200).to_pandas()
    assert abs(out.q05.iloc[0] - 50.0) <= 0.5 + 1e-9, out.q05.iloc[0]


def test_bucketed_ops_keep_null_key_group(ray_session):
    """SQL GROUP BY keeps the NULL group; pandas' default dropna would
    silently delete those rows from every bucketed aggregate."""
    from mmore_ray.stages.groupby import bucketed_sum, grouped_count_distinct

    df = pd.DataFrame({"k": ["a", None, None, "b"],
                       "v": np.array([1, 2, 3, 4], dtype=np.int64)})
    ds = ray.data.from_pandas(df).repartition(2)
    got = bucketed_sum(ds, ["k"], ["v"]).to_pandas()
    null_rows = got[got.k.isna()]
    assert len(null_rows) == 1 and null_rows.v.iloc[0] == 5, got

    cd = grouped_count_distinct(ds, ["k"], "v", "n").to_pandas()
    assert cd[cd.k.isna()].n.iloc[0] == 2, cd


def test_interval_join_malformed_interval_dropped(ray_session):
    """end < start (negative span) must not crash the replication —
    the interval contains no points by definition and is dropped."""
    import pandas as pd
    import ray as _ray

    from mmore_ray.stages.joins import interval_agg_join

    pts = pd.DataFrame({"ts": [5, 15], "v": [1, 2]})
    ivs = pd.DataFrame({"iid": [1, 2], "s": [0, 20], "e": [10, 10]})
    out = interval_agg_join(
        _ray.data.from_pandas(pts), _ray.data.from_pandas(ivs),
        point_on="ts", sum_cols=["v"], interval_id="iid",
        interval_start="s", interval_end="e", bucket_width=8).to_pandas()
    assert out.iid.tolist() == [1]  # the malformed interval 2 is gone
