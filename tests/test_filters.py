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


def test_registry_covers_ten_of_eleven():
    # only the fasttext classifier (a learned model) stays unmapped
    assert len(ALL_FILTERS) == 10


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
