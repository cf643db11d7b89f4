"""Property-based tests (hypothesis) for the aggregation/sort core —
the machinery every query rides on."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KEYS = st.sampled_from(["a", "b", "c", "dd", "e!", ""])


frames = st.lists(
    st.tuples(KEYS, st.integers(-10**9, 10**9)), min_size=0, max_size=200
)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=frames, buckets=st.sampled_from([1, 3, 16]))
def test_bucketed_sum_equals_pandas(ray_session, rows, buckets):
    ray = ray_session
    from mmore_ray.stages.groupby import bucketed_sum

    df = pd.DataFrame(rows, columns=["k", "v"]) if rows else \
        pd.DataFrame({"k": pd.Series(dtype=str), "v": pd.Series(dtype=np.int64)})
    df["v"] = df["v"].astype(np.int64)
    ds = ray.data.from_pandas(df) if len(df) else None
    if ds is None:
        return
    got = bucketed_sum(ds, ["k"], ["v"], num_buckets=buckets).to_pandas()
    want = df.groupby("k", as_index=False)["v"].sum()
    g = got.sort_values("k").reset_index(drop=True)
    w = want.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=300),
       k=st.sampled_from([1, 5, 50]))
def test_topk_equals_sort_head(ray_session, vals, k):
    ray = ray_session
    from mmore_ray.stages.groupby import topk

    df = pd.DataFrame({"x": np.array(vals, dtype=np.int64),
                       "i": np.arange(len(vals), dtype=np.int64)})
    got = topk(ray.data.from_pandas(df), ["x", "i"], k,
               descending=[True, False]).to_pandas()
    want = df.sort_values(["x", "i"], ascending=[False, True]).head(k)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


@settings(max_examples=30, deadline=None)
@given(counts=st.lists(
    st.tuples(st.text(alphabet="ABC", min_size=1, max_size=3),
              st.integers(1, 1000)),
    min_size=1, max_size=40, unique_by=lambda t: t[0]),
    parts=st.sampled_from([1, 4, 16]))
def test_sortwrite_boundaries_cover_and_order(counts, parts):
    from mmore_ray.stages.sortwrite import SEP, compute_boundaries

    key_counts = [((s, "P", s), float(c)) for s, c in counts]
    bounds = compute_boundaries(key_counts, parts)
    assert bounds == sorted(bounds)  # boundaries must be ordered
    # every key encodes to a position within [0, len(bounds)] — and a
    # later key never lands in an earlier partition
    enc = sorted(s + SEP + "P" + SEP + s + SEP for s, _ in counts)
    last = -1
    for e in enc:
        p = int(np.searchsorted(np.array(bounds), e, side="right"))
        assert p >= last
        last = p


@settings(max_examples=40, deadline=None)
@given(counts=st.lists(
    st.tuples(st.text(alphabet="ABC", min_size=1, max_size=3),
              st.integers(1, 2000)),
    min_size=1, max_size=25, unique_by=lambda t: t[0]),
    parts=st.sampled_from([2, 4, 8]))
def test_sortwrite_boundaries_balanced(counts, parts):
    """The load between consecutive cuts must never exceed ~2× the
    budget under UNIFORM within-key sha placement — the generalized
    form of the exact-multiple regression (a skipped cut hands the
    next partition a double budget)."""
    from mmore_ray.stages.sortwrite import SEP, compute_boundaries

    key_counts = [((s, "P", s), float(c)) for s, c in counts]
    bounds = np.array(compute_boundaries(key_counts, parts))
    total = sum(c for _, c in counts)
    budget = max(1.0, total / parts)
    # simulate rows: each key's count spread uniformly over sha space
    rows = []
    for s, c in counts:
        prefix = s + SEP + "P" + SEP + s + SEP
        rows.extend(prefix + format(int(i / c * 16**8), "08x")
                    for i in range(c))
    loads = np.bincount(
        np.searchsorted(bounds, np.array(rows), side="right"),
        minlength=len(bounds) + 1)
    # 2x slack: hex-cut granularity + the first/last partial partitions
    assert loads.max() <= 2 * budget + 1, (loads.tolist(), budget)


def test_sortwrite_boundaries_hot_key_exact_multiple():
    """Review regression: a hot key whose remainder is an exact
    multiple of the budget must still emit its end-of-key cut —
    otherwise the next partition absorbs a double budget and a trailing
    partition comes out empty (8/4 with budget 4 must cut 4/4/4, not
    4/8/0)."""
    from mmore_ray.stages.sortwrite import HI, SEP, compute_boundaries

    bounds = compute_boundaries(
        [(("a", "p", "o"), 8.0), (("z", "p", "o"), 4.0)], 3)
    pa_ = "a" + SEP + "p" + SEP + "o" + SEP
    assert bounds[0] == pa_ + "80000000"   # mid-key sha cut at 1/2
    assert bounds[1] == pa_ + HI           # the previously-missing cut
    # loads: 4 rows of 'a' below the sha cut, 4 above, 4 of 'z'
    rows = [pa_ + format(int(i / 8 * 16**8), "08x") for i in range(8)]
    rows += ["z" + SEP + "p" + SEP + "o" + SEP + "00000000"] * 4
    parts = np.searchsorted(np.array(bounds), np.array(rows), side="right")
    loads = np.bincount(parts, minlength=len(bounds) + 1)
    assert loads.max() == 4, loads.tolist()


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(st.integers(0, 40), st.integers(-10**6, 10**6)),
                     min_size=1, max_size=300),
       buckets=st.sampled_from([1, 4, 32]))
def test_bucketed_window_cumsum_equals_pandas(ray_session, rows, buckets):
    """bucketed_window must see every row of a partition in one bucket —
    a cumulative sum per key is exactly wrong otherwise."""
    ray = ray_session
    from mmore_ray.stages.groupby import bucketed_window

    df = pd.DataFrame(rows, columns=["k", "v"]).astype(np.int64)
    df["rid"] = np.arange(len(df), dtype=np.int64)  # deterministic order

    def window_fn(d):
        d = d.sort_values(["k", "rid"], kind="stable")
        return pd.DataFrame({
            "rid": d.rid.to_numpy(),
            "cum": d.groupby("k", sort=False)["v"].cumsum().to_numpy(),
        })

    got = (bucketed_window(ray.data.from_pandas(df), ["k"], window_fn,
                           num_buckets=buckets)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    want = df.sort_values(["k", "rid"], kind="stable")
    want = pd.DataFrame({
        "rid": want.rid.to_numpy(),
        "cum": want.groupby("k", sort=False)["v"].cumsum().to_numpy(),
    }).sort_values("rid").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(st.tuples(st.integers(0, 5), st.integers(0, 3),
                               st.integers(-10**6, 10**6)),
                     min_size=1, max_size=200))
def test_rollup_sum_levels(ray_session, rows):
    ray = ray_session
    from mmore_ray.stages.groupby import rollup_sum

    df = pd.DataFrame(rows, columns=["a", "b", "v"]).astype(np.int64)
    got = (rollup_sum(ray.data.from_pandas(df), ["a", "b"], ["v"],
                      num_buckets=4)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))

    finest = df.groupby(["a", "b"], as_index=False)["v"].sum()
    lvl1 = df.groupby(["a"], as_index=False)["v"].sum().assign(b=-1)
    grand = pd.DataFrame({"a": [-1], "b": [-1], "v": [df.v.sum()]})
    want = (pd.concat([finest, lvl1, grand], ignore_index=True)
            [["a", "b", "v"]].sort_values(["a", "b"])
            .reset_index(drop=True).astype(np.int64))
    pd.testing.assert_frame_equal(got.astype(np.int64), want)


def test_rollup_sum_single_level(ray_session):
    ray = ray_session
    from mmore_ray.stages.groupby import rollup_sum

    df = pd.DataFrame({"a": [1, 1, 2], "v": [10, 20, 5]}).astype(np.int64)
    got = (rollup_sum(ray.data.from_pandas(df), ["a"], ["v"], num_buckets=2)
           .to_pandas().sort_values("a").reset_index(drop=True))
    want = pd.DataFrame({"a": [-1, 1, 2], "v": [35, 30, 5]}).astype(np.int64)
    pd.testing.assert_frame_equal(got.astype(np.int64), want)


def test_hll_grouped_count_distinct_accuracy(ray_session):
    """HLL estimate within the p=11 error band (~2.3% stddev; assert
    5x that) and deterministic across bucketing layouts."""
    ray = ray_session
    import numpy as np
    from mmore_ray.stages.groupby import grouped_count_distinct_approx

    rng = np.random.default_rng(7)
    rows = []
    truth = {"a": 10, "b": 1000, "c": 40000}
    for g, n in truth.items():
        vals = rng.choice(n * 3, size=n, replace=False)  # n distinct
        rows.append(pd.DataFrame({
            "g": g,
            # duplicates: each value appears 1-3 times
            "v": np.repeat(vals, rng.integers(1, 4, size=n))[:2 * n],
        }))
    df = pd.concat(rows, ignore_index=True).sample(frac=1, random_state=1)
    df["v"] = df["v"].astype(np.int64)

    results = {}
    for nb in (2, 16):
        got = grouped_count_distinct_approx(
            ray.data.from_pandas(df), ["g"], "v", "approx_n",
            num_buckets=nb).to_pandas()
        results[nb] = got.set_index("g")["approx_n"].to_dict()

    # max-merge ⇒ identical result regardless of shuffle layout
    assert results[2] == results[16]
    for g, n in truth.items():
        exact = df[df.g == g]["v"].nunique()
        assert exact <= n * 2
        err = abs(results[16][g] - exact) / exact
        assert err < 0.12, (g, results[16][g], exact)


WORDS = st.sampled_from(["alpha", "beta", "gamma", "x", "yy", "zzz"])
TEXTS = st.lists(
    st.lists(WORDS, min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=20)


@settings(max_examples=50, deadline=None)
@given(texts=TEXTS, k=st.sampled_from([1, 2, 3, 5, 6, 8]))
def test_hashed_windows_matches_shingle_set(texts, k):
    """The vectorized window-hash kernel must agree with the per-row
    shingle_set definition: same per-doc distinct count (collisions
    aside — impossible over this tiny vocabulary), nondecreasing doc
    order, ≥1 window per doc, and process-stable determinism."""
    from mmore_ray.stages.dedup import _hashed_windows, shingle_set

    arr = pa.array(texts, pa.string())
    g1, idx1, _ = _hashed_windows(arr, k)
    g2, idx2, _ = _hashed_windows(arr, k)
    assert np.array_equal(g1, g2) and np.array_equal(idx1, idx2)
    assert len(g1) == len(idx1)
    assert (np.diff(idx1) >= 0).all()
    # every doc owns at least one window
    assert set(idx1.tolist()) == set(range(len(texts)))
    for d, text in enumerate(texts):
        distinct_hashes = len(set(g1[idx1 == d].tolist()))
        assert distinct_hashes == len(set(shingle_set(text, k)))


def test_window_constants_no_positional_cycling():
    """Swapping words at positions j and j+5 must NOT collide for
    k ≥ 6 — a cycled 5-constant table made such windows hash equal by
    construction, which broke the Jaccard pre-filter's no-false-
    negative property (the count c undercounted shared shingles)."""
    from mmore_ray.stages.dedup import _hashed_windows, _window_constants

    for k in (6, 8, 11):
        c = _window_constants(k)
        assert len(set(c.tolist())) == k  # all distinct, no cycle
    g1, _, _ = _hashed_windows(pa.array(["a b c d e f"], pa.string()), 6)
    g2, _, _ = _hashed_windows(pa.array(["f b c d e a"], pa.string()), 6)
    assert g1[0] != g2[0]


@settings(max_examples=25, deadline=None)
@given(texts=TEXTS)
def test_simhash_batch_matches_single(texts):
    """_simhash_batch over a batch must equal simhash64 per row (one
    hash family, two entry points)."""
    from mmore_ray.stages.dedup import _simhash_batch, simhash64

    batch = _simhash_batch(pa.array(texts, pa.string()))
    assert len(batch) == len(texts)
    for got, text in zip(batch.tolist(), texts):
        assert got == simhash64(text)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_scanner_n_occ_matches_sql_replace_formula(data):
    """The scan's per-surface occurrence count must equal the oracle's
    replace-based formula ``(len(c) - len(c.replace(s,''))) // len(s)``
    (left-to-right non-overlapping) for ANY content — including
    self-overlapping occurrences and different surfaces overlapping
    each other — and every surface present in the content must be
    reported with its true 1-based first position."""
    from mmore_ray.stages.mentions import MentionScanner

    alphabet = "ABCD"
    # substring-related surfaces ALLOWED: the trie yields the longest
    # match per position, prefix surfaces are credited at shared
    # starts, infix/suffix overlaps are found by the start+1 step
    surfaces = data.draw(st.lists(
        st.text(alphabet=alphabet, min_size=2, max_size=4),
        min_size=1, max_size=4, unique=True))
    content = data.draw(st.text(alphabet=alphabet, min_size=0, max_size=60))

    sc = MentionScanner(gazetteer=[(s, "X", f"K{i}")
                                   for i, s in enumerate(surfaces)])
    mentions, _ = sc._scan(content)
    got = {m["surface"]: (m["n_occ"], m["first_pos"]) for m in mentions}
    for s in surfaces:
        want = (len(content) - len(content.replace(s, ""))) // len(s)
        if want == 0:
            assert s not in got, (s, content)
        else:
            assert got[s][0] == want, (s, content, got[s][0], want)
            assert got[s][1] == content.find(s) + 1


@settings(max_examples=100, deadline=None)
@given(text=st.text(max_size=120))
def test_tag_words_matches_python_split(text):
    """The re2 whitespace class must count EXACTLY like
    len(text.split()) for arbitrary unicode (NBSP, U+2028, vertical
    tab, CJK space...)."""
    from mmore_ray.stages.taggers import tag_words

    t = pa.table({"text": pa.array([text], pa.string())})
    assert tag_words(t).column("word_count").to_pylist() == [
        len(text.split())]


@settings(max_examples=50, deadline=None)
@given(texts=st.lists(
    st.one_of(st.none(), st.text(alphabet=" abcdefghilmnorstuz的是了在",
                                 max_size=80)),
    min_size=1, max_size=30))
def test_detect_lang_batch_matches_per_row(texts):
    """Batch classifier == per-row classifier on every non-null row;
    null rows classify 'unknown' (never a confident language)."""
    from mmore_ray.stages.text_analysis import detect_lang, detect_lang_batch

    got = list(detect_lang_batch(pd.Series(texts, dtype=object)))
    for g, t in zip(got, texts):
        assert g == ("unknown" if t is None else detect_lang(t))


# -- repetition-signal kernels vs naive per-doc references ---------------

_word = st.text(alphabet="abcx", min_size=1, max_size=3)
_line = st.lists(_word, min_size=0, max_size=4).map(" ".join)
_doc = st.lists(_line, min_size=0, max_size=6).map("\n".join)


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.one_of(st.none(), _doc), min_size=1, max_size=8))
def test_repetition_stats_matches_naive(texts):
    import math

    import numpy as np
    import pandas as pd

    from mmore_ray.stages.text_analysis import repetition_stats

    out = repetition_stats(pd.DataFrame({"text": texts}))
    for i, t in enumerate(texts):
        lines = [ln for ln in (t or "").split("\n") if ln != ""]
        n = len(lines)
        d = len(set(lines))
        from collections import Counter
        c = Counter(lines)
        chars = sum(cnt * len(ln) for ln, cnt in c.items())
        dup = sum((cnt - 1) * len(ln) for ln, cnt in c.items())
        assert out["n_lines"][i] == n
        want_f = math.floor((n - d) / n * 10000 + 0.5) if n else 0
        assert out["dup_line_frac_e4"][i] == want_f
        want_c = math.floor(dup / chars * 10000 + 0.5) if chars else 0
        assert out["dup_line_char_frac_e4"][i] == want_c


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.one_of(st.none(),
              st.lists(_word, min_size=0, max_size=8).map(" ".join)),
    min_size=1, max_size=8))
def test_top_ngram_stats_matches_naive(texts):
    import math
    from collections import Counter

    import pandas as pd

    from mmore_ray.stages.text_analysis import top_ngram_stats

    out = top_ngram_stats(pd.DataFrame({"text": texts}), ns=(2, 3))
    for i, t in enumerate(texts):
        s = t or ""
        ws = s.split(" ")
        for n in (2, 3):
            grams = [" ".join(ws[j:j + n])
                     for j in range(len(ws) - n + 1)]
            col = f"top{n}gram_char_frac_e4"
            if not grams or not len(s):
                assert out[col][i] == 0
                continue
            c = Counter(grams)
            m = max(cnt * len(g) for g, cnt in c.items())
            assert out[col][i] == math.floor(m / len(s) * 10000 + 0.5)
