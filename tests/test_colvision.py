"""ColVision late-interaction operators: encoder determinism, MaxSim
spec parity with the reference's formula, self-match ranking, and the
index→retrieve roundtrip."""

import numpy as np
import pandas as pd


def test_patch_embedder_deterministic_and_shaped():
    from mmore_ray.stages.colvision import FakePatchEmbedder

    e = FakePatchEmbedder(dim=16, n_patches=4)
    p1 = e.embed_page(b"some page payload bytes here")
    p2 = FakePatchEmbedder(dim=16, n_patches=4).embed_page(
        b"some page payload bytes here")
    assert p1 == p2 and len(p1) == 4 and len(p1[0]) == 16
    for v in p1:
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
    q = e.embed_query("two tokens")
    assert len(q) == 2
    assert e.embed_query("") and len(e.embed_query("")) == 1


def test_maxsim_matches_reference_formula(ray_session):
    import ray as _ray

    from mmore_ray.stages.colvision import maxsim_retrieve

    rng = np.random.default_rng(3)
    pages = {i: rng.standard_normal((4, 8)) for i in range(20)}
    Q = {0: rng.standard_normal((3, 8)).tolist(),
         1: pages[7].tolist()}  # query 1 IS page 7's vectors
    df = pd.DataFrame({
        "page_id": list(pages),
        "patches": [p.tolist() for p in pages.values()],
    })
    out = maxsim_retrieve(_ray.data.from_pandas(df), Q, k=3).to_pandas()

    # reference formula (milvuscolvision.py:230): dot(Q, D.T).max(1).sum()
    for qid, qv in Q.items():
        Qm = np.asarray(qv)
        want = sorted(
            ((int(np.floor((Qm @ P.T).max(1).sum() * 10000 + 0.5)), -pid)
             for pid, P in pages.items()), reverse=True)[:3]
        got = out[out.query_id == qid].sort_values("rnk")
        assert [(s, -p) for s, p in
                zip(got.score_e4, got.page_id)] == want
    # the self-match page ranks first for query 1
    top1 = out[(out.query_id == 1) & (out.rnk == 1)].page_id.iloc[0]
    assert top1 == 7


def test_index_pages_roundtrip(ray_session, tmp_path):
    import ray as _ray

    from mmore_ray.stages.colvision import (
        FakePatchEmbedder,
        index_pages,
        maxsim_retrieve,
    )

    pages = pd.DataFrame({
        "page_id": [0, 1, 2],
        "payload": [b"alpha page", b"beta page", b"gamma page"],
    })
    out_dir = tmp_path / "colvision"
    index_pages(_ray.data.from_pandas(pages), out_dir)
    coll = _ray.data.read_parquet(str(out_dir))
    # query with page 1's own payload-derived vectors → rank 1 = page 1
    q = {0: FakePatchEmbedder().embed_page(b"beta page")}
    res = maxsim_retrieve(coll, q, k=2).to_pandas()
    assert res[res.rnk == 1].page_id.iloc[0] == 1

    # re-index into the same dir must REPLACE the index, not merge
    # stale rows with new ones (write_parquet appends unique files)
    pages_v2 = pd.DataFrame({"page_id": [7], "payload": [b"delta page"]})
    reindexed = index_pages(_ray.data.from_pandas(pages_v2), out_dir)
    assert set(reindexed.to_pandas().page_id) == {7}
