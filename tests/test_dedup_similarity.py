"""Dedup + similarity operators: invariants for the non-SQL-checkable
paths, and cross-checks between approximate and exact variants."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_minhash_signature_deterministic():
    from mmore_ray.stages.dedup import _stable_rng_params, minhash_signature

    a, b = _stable_rng_params(64)
    s1 = minhash_signature("the quick brown fox jumps over the lazy dog", a, b)
    s2 = minhash_signature("the quick brown fox jumps over the lazy dog", a, b)
    assert (s1 == s2).all()
    s3 = minhash_signature("the quick brown fox jumps over a lazy dog", a, b)
    # high-but-not-total signature agreement for a near-identical doc
    frac = (s1 == s3).mean()
    assert 0.3 < frac < 1.0


def test_simhash_properties():
    from mmore_ray.stages.dedup import simhash64

    a = simhash64("alpha beta gamma delta epsilon zeta")
    assert a == simhash64("alpha beta gamma delta epsilon zeta")
    b = simhash64("alpha beta gamma delta epsilon eta")
    ham_near = bin(a ^ b).count("1")
    c = simhash64("one two three four five six")
    ham_far = bin(a ^ c).count("1")
    assert ham_near < ham_far


def test_simhash_near_dup_finds_exact_copies(ray_session):
    ray = ray_session
    from mmore_ray.pipelines.queries import q_dedup_simhash

    out = q_dedup_simhash(SF).to_pandas()
    # every injected exact copy (doc_id % 7 == 0 → +500000) must appear
    # at hamming 0
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])
    expected = {(i, i + 500000) for i in docs.column("doc_id").to_pylist()
                if i % 7 == 0}
    got = set(zip(out.id_a, out.id_b))
    missing = expected - got
    assert not missing, f"missing {len(missing)} exact-copy pairs"
    exact = out[(out.id_b - out.id_a) == 500000]
    assert (exact.hamming == 0).all()


def test_ivf_recall_vs_brute_force(ray_session):
    ray = ray_session
    from mmore_ray.pipelines.queries import _query_vectors, q_knn
    from mmore_ray.stages.similarity import knn_ivf

    brute = q_knn(SF).to_pandas()
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    approx = knn_ivf(ds, _query_vectors(SF), k=10,
                     n_centroids=16, nprobe=4).to_pandas()
    recalls = []
    for qid in brute.query_id.unique():
        want = set(brute[brute.query_id == qid].neighbor_id)
        got = set(approx[approx.query_id == qid].neighbor_id)
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.5, recalls  # nprobe=4/16 is lossy by design

    # full probe must be EXACT
    full = knn_ivf(ds, _query_vectors(SF), k=10,
                   n_centroids=16, nprobe=16).to_pandas()
    key = ["query_id", "rnk"]
    b = brute.sort_values(key).reset_index(drop=True)
    f = full.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(b[["query_id", "neighbor_id", "rnk"]],
                                  f[["query_id", "neighbor_id", "rnk"]])


def test_ivf_tiny_dataset_and_stable_sample(ray_session):
    """Review regressions: fewer vectors than n_centroids must degrade
    to exhaustive search (not crash the seeded init), and the training
    sample must be block-order independent (hash-selected + sorted, not
    limit() of whichever blocks arrive first)."""
    ray = ray_session
    from mmore_ray.stages.similarity import (
        _trained_centroids,
        knn_brute_force,
        knn_ivf,
        train_centroids,
    )

    rng = np.random.default_rng(7)
    C = train_centroids(rng.standard_normal((10, 4)), 16)
    assert len(C) == 10  # clamped

    small = pd.DataFrame({
        "vec_id": np.arange(5, dtype=np.int64),
        "embedding": list(rng.standard_normal((5, 8))),
    })
    qs = {99: rng.standard_normal(8).tolist()}
    ds = ray.data.from_pandas(small)
    approx = knn_ivf(ds, qs, k=3, n_centroids=16, nprobe=16).to_pandas()
    brute = knn_brute_force(ds, qs, k=3).to_pandas()
    pd.testing.assert_frame_equal(
        approx.sort_values("rnk").reset_index(drop=True),
        brute.sort_values("rnk").reset_index(drop=True))

    # sample path: same data in shuffled block layouts → same centroids
    big = pd.DataFrame({
        "vec_id": np.arange(600, dtype=np.int64),
        "embedding": list(rng.standard_normal((600, 8))),
    })
    c1 = _trained_centroids(ray.data.from_pandas(big), 8,
                            "embedding", "vec_id", train_sample=100)
    shuffled = big.sample(frac=1.0, random_state=3).reset_index(drop=True)
    c2 = _trained_centroids(
        ray.data.from_pandas(shuffled).repartition(7), 8,
        "embedding", "vec_id", train_sample=100)
    np.testing.assert_allclose(c1, c2)


def test_fingerprint_deterministic_and_discriminative():
    from mmore_ray.stages.text_analysis import fingerprint_rolling

    f1 = fingerprint_rolling("a b c d e f g h i j")
    assert f1 == fingerprint_rolling("a b c d e f g h i j")
    f2 = fingerprint_rolling("k l m n o p q r s t")
    assert f1 != f2
    assert f1 == sorted(f1)


def test_verify_paths_agree_broadcast_vs_join(ray_session):
    """The broadcast and join physical plans of verify_pairs_jaccard
    must produce identical results (one semantic, two plans)."""
    from mmore_ray.pipelines.queries import _docs_with_near_copies
    from mmore_ray.stages.dedup import near_dup_minhash

    import pandas as pd
    import ray as _ray

    import mmore_ray.stages.dedup as dd

    pairs_cols = ["id_a", "id_b", "jaccard_e4"]
    bc = (near_dup_minhash(_docs_with_near_copies("/root/testdata/sf0.001"))
          .to_pandas().sort_values(pairs_cols).reset_index(drop=True))
    # candidate pairs = the broadcast run's survivors ∪ a few non-dup
    # pairs, so both plans also see below-threshold pairs they must drop
    extra = pd.DataFrame({"id_a": [1, 2], "id_b": [3, 4]})
    cand = pd.concat([bc[["id_a", "id_b"]], extra]).drop_duplicates()
    src = _docs_with_near_copies("/root/testdata/sf0.001") \
        .select_columns(["doc_id", "text"])
    out_join = dd.verify_pairs_jaccard(
        _ray.data.from_pandas(cand), src, id_col="doc_id", text_col="text",
        broadcast_limit=0).to_pandas()  # limit 0 forces the join plan
    src2 = _docs_with_near_copies("/root/testdata/sf0.001") \
        .select_columns(["doc_id", "text"])
    out_bc = dd.verify_pairs_jaccard(
        _ray.data.from_pandas(cand), src2,
        id_col="doc_id", text_col="text").to_pandas()
    j = out_join.sort_values(pairs_cols).reset_index(drop=True)
    b = out_bc.sort_values(pairs_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(j, b)
    pd.testing.assert_frame_equal(b, bc)


def test_jaccard_prefilter_keeps_rounding_boundary_pair(ray_session):
    """A pair whose true Jaccard rounds half-up to the threshold
    (J·10⁴ ∈ [thr−0.5, thr)) is emitted by the exact verification, so
    the count pre-filter must not drop it — it must apply the same
    rounding, not the raw inequality."""
    import numpy as np
    import pandas as pd
    import ray as _ray

    from mmore_ray.stages.dedup import near_dup_jaccard

    # k=1 ⇒ shingles are words.  |A∩B| = 9999, |A∪B| = 19999:
    # J = 0.4999749…, J·10⁴ rounds to 5000 = thr exactly.
    common = [f"c{i}" for i in range(9999)]
    a_only = [f"a{i}" for i in range(5000)]
    b_only = [f"b{i}" for i in range(5000)]
    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [" ".join(common + a_only), " ".join(common + b_only)],
    })
    out = near_dup_jaccard(_ray.data.from_pandas(df), k=1,
                           threshold=0.5).to_pandas()
    assert len(out) == 1
    assert (int(out.id_a.iloc[0]), int(out.id_b.iloc[0])) == (1, 2)
    assert int(out.jaccard_e4.iloc[0]) == 5000


def test_bound_filter_paths_agree_driver_vs_join(ray_session):
    """_bound_filter_pairs' driver (pandas) and distributed (join)
    plans must keep the same candidate pairs (one semantic, two
    plans)."""
    import pandas as pd
    import ray as _ray

    import mmore_ray.stages.dedup as dd

    # ex: (id, shingle, sz) — doc 1 {10,11,12}, doc 2 {10,11,13},
    # doc 3 {10,99,98}, doc 4 {11} (short doc)
    ex = _ray.data.from_pandas(pd.DataFrame({
        "id":      [1, 1, 1, 2, 2, 2, 3, 3, 3, 4],
        "shingle": [10, 11, 12, 10, 11, 13, 10, 99, 98, 11],
        "sz":      [3, 3, 3, 3, 3, 3, 3, 3, 3, 1],
    })).materialize()
    counts = pd.DataFrame({  # summed c per candidate pair
        "id_a": [1, 1, 1, 2],
        "id_b": [2, 3, 4, 3],
        "c":    [2, 1, 1, 1],
    })
    # threshold 0.5: keep (1,2) J=2/4, (1,4) J=1/3→drop? 1/(3+1-1)=1/3
    # <0.5 drop; (1,3) 1/5 drop; (2,3) 1/5 drop → only (1,2)
    small = dd._bound_filter_pairs(counts.copy(), ex, 0.5, num_buckets=4)
    big = dd._bound_filter_pairs(
        _ray.data.from_pandas(counts.copy()), ex, 0.5, num_buckets=4
    ).to_pandas()
    want = pd.DataFrame({"id_a": [1], "id_b": [2]})
    pd.testing.assert_frame_equal(
        small.sort_values(["id_a", "id_b"]).reset_index(drop=True), want)
    pd.testing.assert_frame_equal(
        big.sort_values(["id_a", "id_b"]).reset_index(drop=True), want)


def test_persisted_ivf_index_matches_in_session_ivf(ray_session):
    """build_ivf_index + knn_ivf_indexed ≡ knn_ivf (same centroids,
    same probes) and full-probe is exact vs brute force."""
    import shutil

    import pandas as pd
    import ray as _ray

    from mmore_ray.stages.similarity import (
        build_ivf_index,
        knn_brute_force,
        knn_ivf,
        knn_ivf_indexed,
    )

    SF = "/root/testdata/sf0.001"

    def vecs():
        return _ray.data.read_parquet(f"{SF}/embeddings.parquet",
                                      columns=["vec_id", "embedding"])

    import pyarrow.parquet as pq

    qt = pq.read_table(f"{SF}/embeddings.parquet",
                       columns=["vec_id", "embedding"]).to_pandas().head(5)
    queries = {int(r.vec_id): list(r.embedding) for r in qt.itertuples()}

    idx = "/tmp/ivf_index_test"
    build_ivf_index(vecs(), idx, n_centroids=8)
    key = ["query_id", "rnk"]
    live = knn_ivf(vecs(), queries, k=5, n_centroids=8, nprobe=3) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    stored = knn_ivf_indexed(idx, queries, k=5, nprobe=3) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(live, stored)

    # full probe through the index == exact brute force
    brute = knn_brute_force(vecs(), queries, k=5) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    full = knn_ivf_indexed(idx, queries, k=5, nprobe=8) \
        .to_pandas().sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        brute[["query_id", "neighbor_id", "rnk"]],
        full[["query_id", "neighbor_id", "rnk"]])
    shutil.rmtree(idx, ignore_errors=True)


def test_jaccard_dedup_equals_naive_ground_truth(ray_session):
    """near_dup_jaccard must equal the O(n²) definition exactly (zero
    false negatives / positives) on randomized corpora."""
    import random

    import pandas as pd
    import ray as _ray

    from mmore_ray.stages.dedup import near_dup_jaccard, shingle_set

    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(3):
        docs = {}
        for i in range(24):
            base = [rng.choice(vocab) for _ in range(rng.randint(4, 15))]
            docs[i] = " ".join(base)
            if rng.random() < 0.4:  # inject a near copy
                mutated = list(base)
                if mutated:
                    mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
                docs[100 + i] = " ".join(mutated)
        ds = _ray.data.from_pandas(pd.DataFrame({
            "doc_id": list(docs), "text": list(docs.values())}))
        got = near_dup_jaccard(ds, threshold=0.3).to_pandas()
        got_set = {(a, b, j) for a, b, j in
                   zip(got.id_a, got.id_b, got.jaccard_e4)}

        want = set()
        ids = sorted(docs)
        for x in range(len(ids)):
            for y in range(x + 1, len(ids)):
                sa = set(shingle_set(docs[ids[x]]))
                sb = set(shingle_set(docs[ids[y]]))
                if not (sa & sb):
                    continue  # no shared shingle → not a candidate
                import numpy as np

                j = int(np.floor(len(sa & sb) / len(sa | sb) * 10000 + 0.5))
                if j >= 3000:
                    want.add((ids[x], ids[y], j))
        assert got_set == want, f"trial {trial}"


def test_decontaminate_tag_and_drop(ray_session):
    import pyarrow as pa
    import ray.data
    from mmore_ray.stages.dedup import decontaminate

    docs = ["the quick brown fox jumps over the lazy dog today",
            "completely unrelated text about ray data engines here now",
            "the quick brown fox jumps over the lazy dog tomorrow",
            "short doc",
            "eval question text"]
    bench = ["the quick brown fox jumps over the lazy dog",
             "eval question text"]
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": list(range(5)), "text": docs}))
    out = decontaminate(ds, bench, k=8).to_pandas().sort_values(
        "doc_id")["contaminated"].tolist()
    # docs 0/2 share an 8-gram; doc 4 is a whole-short-text match;
    # 1 and 3 are clean
    assert out == [True, False, True, False, True]
    assert decontaminate(ds, bench, k=8, mode="drop").count() == 2
    # empty benchmark: everything clean, nothing dropped
    assert decontaminate(ds, [], k=8).to_pandas()[
        "contaminated"].tolist() == [False] * 5
    assert decontaminate(ds, [], k=8, mode="drop").count() == 5


def test_decontaminate_no_substring_leak(ray_session):
    """A <k-word benchmark text only condemns whole-short-text equals,
    never long docs merely CONTAINING it (k-gram semantics)."""
    import pyarrow as pa
    import ray.data
    from mmore_ray.stages.dedup import decontaminate

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["prefix eval question text suffix words making this long",
                 "eval question text"]}))
    out = decontaminate(ds, ["eval question text"], k=8).to_pandas(
        ).sort_values("doc_id")["contaminated"].tolist()
    assert out == [False, True]


def test_dup_span_fraction_semantics(ray_session):
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.dedup import dup_span_fraction

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": ["a b c d e f g h i",      # shares the first 8-gram w/ 2
                 "a b c d e f g h j",
                 "totally different words here now ok fine yes"]}))
    out = dup_span_fraction(ds, k=8).to_pandas().sort_values(
        "id").reset_index(drop=True)
    # docs 1/2 each have 2 spans, 1 duplicated (the shared prefix);
    # doc 3 has 1 unique span
    assert out["n_spans"].tolist() == [2, 2, 1]
    assert out["n_dup"].tolist() == [1, 1, 0]
    assert out["dup_frac_e4"].tolist() == [5000, 5000, 0]


def test_near_dup_ops_on_dup_free_corpus(ray_session):
    """A corpus with ZERO candidate pairs (the normal case for a clean
    post-exact-dedup crawl) must yield empty results, not KeyError —
    an empty map_groups output loses its schema entirely."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.dedup import (near_dup_jaccard,
                                        near_dup_minhash,
                                        near_dup_simhash)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["alpha beta gamma delta epsilon",
                 "one two three four five six"]}))
    for fn in (lambda: near_dup_jaccard(ds, threshold=0.3),
               lambda: near_dup_minhash(ds),
               lambda: near_dup_simhash(ds)):
        out = fn()
        assert (out.count() if hasattr(out, "count") else len(out)) == 0


def test_sketch_ops_tolerate_null_text(ray_session):
    """A null text row hashes as '' (the exact_dedup sha convention) —
    it must not NaN-poison the shared window-hash kernel and crash
    every sketch operator on raw crawl input."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.dedup import (decontaminate, dup_span_fraction,
                                        near_dup_jaccard, near_dup_minhash,
                                        near_dup_simhash)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2, 3],
        "text": pa.array(["alpha beta gamma delta", None,
                          "one two three four"], pa.string())}))
    for fn in (lambda: near_dup_jaccard(ds, threshold=0.3),
               lambda: near_dup_minhash(ds),
               lambda: near_dup_simhash(ds)):
        out = fn()
        assert (out.count() if hasattr(out, "count") else len(out)) == 0
    tagged = decontaminate(ds, ["alpha beta gamma delta"], k=8).to_pandas()
    assert tagged.sort_values("doc_id")["contaminated"].tolist() == [
        True, False, False]
    spans = dup_span_fraction(ds, k=3)
    assert spans.count() == 3


def test_simhash_max_hamming_above_three_has_full_recall(ray_session):
    """Chunk count must scale with max_hamming: a fixed 4x16 split
    loses any pair differing by one bit in each chunk."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    import mmore_ray.stages.dedup as D

    # synthesize two docs whose simhashes differ in exactly 4 bits,
    # one per 16-bit quarter: build texts, then check the property on
    # whatever hashes result — if the bit spread doesn't hit all four
    # quarters, fall back to asserting against brute-force hamming
    ds = ray.data.from_arrow(pa.table({
        "doc_id": [1, 2],
        "text": ["w1 w2 w3 w4 w5 w6 w7 w8",
                 "w1 w2 w3 w4 w5 w6 w7 w9"]}))
    sh = D._simhash_batch(pa.chunked_array([pa.array(
        ["w1 w2 w3 w4 w5 w6 w7 w8", "w1 w2 w3 w4 w5 w6 w7 w9"])]))
    ham = bin(int(sh[0]) ^ int(sh[1])).count("1")
    out = D.near_dup_simhash(ds, max_hamming=ham).to_pandas()
    # at max_hamming == true hamming the pair MUST be found, whatever
    # the bit distribution across chunks
    assert len(out) == 1 and out["hamming"].iloc[0] == ham


def test_minhash_band_validation():
    import pytest
    import ray.data

    from mmore_ray.stages.dedup import near_dup_minhash

    with pytest.raises(ValueError, match="bands must divide"):
        near_dup_minhash(None, n_perm=64, bands=128)
    with pytest.raises(ValueError, match="bands must divide"):
        near_dup_minhash(None, n_perm=64, bands=3)


def test_embedding_near_dup_empty_input(ray_session):
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.dedup import embedding_near_dup

    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64()))}))
    out = embedding_near_dup(ds)
    assert out.count() == 0
