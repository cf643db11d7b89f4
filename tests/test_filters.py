"""Datatrove-ladder filter unit coverage (filters.py; reference
``filter/datatrove_wrapper.py:27-39`` FILTERS_MAP rows)."""

import pyarrow as pa

from mmore_ray.stages.filters import (
    ALL_FILTERS,
    gopher_quality_filter,
    length_filter,
    sampler_filter,
    unigram_logprob_filter,
    url_filter,
)


def _texts(*texts):
    return pa.table({"text": pa.array(list(texts), pa.string())})


def test_registry_covers_all_eleven():
    # the fasttext slot is filled by the trainable hashed-ngram
    # linear classifier (same model family, no .bin download needed)
    assert len(ALL_FILTERS) == 11


def test_url_filter_domains_parents_and_subwords():
    t = pa.table({"url": pa.array([
        "https://good.example.org/page",
        "https://bad.example.com/page",
        "https://sub.bad.example.com/x",   # parent-domain hit
        "http://ok.net/casino-bonus",      # subword hit
        "http://ok.net/fine",
    ])})
    fn = url_filter(blocked_domains={"bad.example.com"},
                    blocked_subwords=("casino",))
    kept = fn(t).column("url").to_pylist()
    assert kept == ["https://good.example.org/page", "http://ok.net/fine"]


def test_url_filter_userinfo_cannot_evade_blocklist():
    t = pa.table({"url": pa.array([
        "http://user@bad.example.com/x",       # userinfo trick
        "http://u:pw@bad.example.com:8080/y",  # + password + port
        "http://user@good.org/z",
    ])})
    fn = url_filter(blocked_domains={"bad.example.com"})
    assert fn(t).column("url").to_pylist() == ["http://user@good.org/z"]


def test_fasttext_like_filter_validates_inputs():
    import pytest

    from mmore_ray.stages.filters import fasttext_like_filter

    with pytest.raises(ValueError, match="pre-trained"):
        fasttext_like_filter("keep")
    with pytest.raises(ValueError, match="not among trained labels"):
        fasttext_like_filter("nope", train_texts=["a", "b"],
                             train_labels=["keep", "drop"])


def test_unigram_logprob_filter_threshold():
    table = {"the": -2.0, "cat": -3.0}
    fn = unigram_logprob_filter(table, min_avg_logprob=-4.0,
                                unknown_logprob=-9.0)
    t = _texts("the cat", "the zzz", "zzz qqq")
    # avgs: -2.5 (keep), -5.5 (drop), -9.0 (drop)
    assert fn(t).column("text").to_pylist() == ["the cat"]


def test_gopher_quality_composite_rules():
    good = "the " + "quick brown fox jumps over the lazy dog and " * 6
    short = "the cat sat"                      # < min_words
    symbols = ("# " * 30 + "the and is to ")   # symbol ratio + alpha ratio
    nostops = "zzz " * 60                      # no stopwords
    fn = gopher_quality_filter(min_words=20)
    kept = fn(_texts(good, short, symbols, nostops)).column("text").to_pylist()
    assert kept == [good]


def test_length_and_sampler_are_deterministic():
    t = pa.table({
        "text": pa.array(["one two three", "a b c d e f g"], pa.string()),
        "sample_id": pa.array(["x", "y"], pa.string()),
    })
    assert length_filter(4, 10)(t).num_rows == 1
    fn = sampler_filter(0.5)
    assert fn(t).num_rows == fn(t).num_rows  # stable across calls


def test_fasttext_like_classifier_filter(ray_session):
    """The hashed-ngram linear classifier must separate two simple
    classes, be deterministic, and filter batches by label prob."""
    import pyarrow as pa

    from mmore_ray.stages.filters import (
        HashingTextClassifier,
        fasttext_like_filter,
    )

    good = [f"the quick research paper discusses results {i}"
            for i in range(12)]
    spam = [f"buy cheap pills now click here winner {i}"
            for i in range(12)]
    clf = HashingTextClassifier().fit(good + spam,
                                      ["good"] * 12 + ["spam"] * 12)
    p = clf.predict_proba(["a research paper with results",
                           "click here to buy cheap pills"])
    gi = clf.labels.index("good")
    assert p[0, gi] > 0.8 and p[1, gi] < 0.2

    # deterministic across fresh instances
    clf2 = HashingTextClassifier().fit(good + spam,
                                       ["good"] * 12 + ["spam"] * 12)
    import numpy as np

    assert np.allclose(p, clf2.predict_proba(
        ["a research paper with results", "click here to buy cheap pills"]))

    fn = fasttext_like_filter("good", threshold=0.5, classifier=clf)
    batch = pa.table({"text": ["research results discussed",
                               "cheap pills winner click",
                               "the quick paper"]})
    kept = fn(batch).column("text").to_pylist()
    assert "cheap pills winner click" not in kept
    assert "research results discussed" in kept


def test_fasttext_like_via_yaml_registry(ray_session):
    from mmore_ray.config import build_stage

    fn = build_stage({
        "type": "filter/fasttext_like",
        "args": {
            "keep_label": "ok",
            "threshold": 0.5,
            "train_texts": ["alpha beta good text", "zzz spammy junk text"],
            "train_labels": ["ok", "bad"],
        },
    })
    import pyarrow as pa

    out = fn(pa.table({"text": ["alpha beta good", "zzz spammy junk"]}))
    assert out.num_rows == 1


def test_filters_tolerate_null_rows():
    """Null text/url rows must filter cleanly (drop or keep per each
    filter's empty-text behavior), never crash the batch task."""
    import pyarrow as pa

    from mmore_ray.stages.filters import (alpha_ratio_filter, length_filter,
                                          regex_filter, repetition_filter,
                                          url_filter)

    t = pa.table({"text": pa.array([None, "a good doc here", ""],
                                   pa.string())})
    assert length_filter(2, 10)(t).num_rows == 1
    assert alpha_ratio_filter(0.5)(t).num_rows == 1
    assert repetition_filter()(t).num_rows == 3  # no lines -> kept
    assert regex_filter("bad")(t).num_rows == 3  # null never matches
    u = pa.table({"url": pa.array([None, "http://ok.com/x"], pa.string())})
    assert url_filter({"evil.com"})(u).num_rows == 2


def test_fasttext_like_label_length_validation():
    import pytest

    from mmore_ray.stages.filters import fasttext_like_filter

    with pytest.raises(ValueError, match="one-to-one"):
        fasttext_like_filter("x", train_texts=["a b", "c d"])
    with pytest.raises(ValueError, match="one-to-one"):
        fasttext_like_filter("x", train_texts=["a b", "c d"],
                             train_labels=["x"])


def test_repetition_stats_semantics():
    """Hand-computed duplicate-line fractions: dup lines counted beyond
    first occurrence, chars weighted per repeat, empty lines excluded,
    null/newline-free text yields zeros."""
    import numpy as np
    import pandas as pd

    from mmore_ray.stages.text_analysis import repetition_stats

    df = pd.DataFrame({"text": [
        "aa\nbb\naa\n\naa",      # lines aa,bb,aa,aa -> 4 lines, 2 dups
        "xx yy\nzz",              # no dups
        "solo line no newline",   # 1 line, no dups
        None,                     # -> zeros
        "",                       # -> zeros
    ]})
    out = repetition_stats(df)
    assert out["n_lines"].tolist() == [4, 2, 1, 0, 0]
    # doc 0: (4-2)/4 = 0.5 ; dup chars = (3-1)*2 = 4 of 8 total
    assert out["dup_line_frac_e4"].tolist() == [5000, 0, 0, 0, 0]
    assert out["dup_line_char_frac_e4"].tolist() == [5000, 0, 0, 0, 0]
    assert all(out[c].dtype == np.int64 for c in out.columns)


def test_top_ngram_stats_semantics():
    """Hand-computed top-n-gram coverage.  Coverage is count×len over
    SLIDING windows, so overlapping occurrences each count and the
    fraction may exceed 1.0 (it measures repetition mass, not disjoint
    cover) — a specified property, mirrored exactly by the SQL
    oracle."""
    import numpy as np
    import pandas as pd

    from mmore_ray.stages.text_analysis import top_ngram_stats

    df = pd.DataFrame({"text": ["a b a b a", "x y z", None, "w"]})
    out = top_ngram_stats(df, ns=(2, 3))
    # doc0 2-grams: 'a b' x2 (cover 6), 'b a' x2 (cover 6) -> 6/9
    assert out["top2gram_char_frac_e4"].tolist()[0] == 6667
    # doc0 3-grams: 'a b a' x2 -> cover 10/9 (overlap counts twice)
    assert out["top3gram_char_frac_e4"].tolist()[0] == 11111
    # doc1: every 2-gram unique -> 5/5 = 1.0? 'x y' cover 3 of 5 chars
    assert out["top2gram_char_frac_e4"].tolist()[1] == 6000
    assert out["top2gram_char_frac_e4"].tolist()[2] == 0   # null text
    assert out["top2gram_char_frac_e4"].tolist()[3] == 0   # 1 word
    assert all(out[c].dtype == np.int64 for c in out.columns)


def test_rounding_op_order_parity_with_oracle():
    """57/800*10000 is 712.4999... in float64 divide-first order but
    712.5 exactly in multiply-first order — the SQL oracles must use
    the kernels' divide-first order or floor(x+0.5) disagrees."""
    import duckdb
    import numpy as np

    kern = int(np.floor(np.int64(57) / np.int64(800) * 10000 + 0.5))
    sql = duckdb.sql(
        "SELECT CAST(floor(57 * 1.0 / 800 * 10000.0 + 0.5) AS BIGINT)"
    ).fetchone()[0]
    wrong = duckdb.sql(
        "SELECT CAST(floor(57 * 10000.0 / 800 + 0.5) AS BIGINT)"
    ).fetchone()[0]
    assert kern == sql == 712 and wrong == 713
