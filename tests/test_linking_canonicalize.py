"""EntityLinker / CanonicalRelabel / union-find unit coverage."""

import pyarrow as pa

from mmore_ray.stages.canonicalize import (
    CanonicalRelabel,
    build_canonical_map,
    distinct_pairs,
)
from mmore_ray.stages.linking import EntityLinker, trigram_jaccard


def test_entity_linker_stage():
    linker = EntityLinker(alias={"OBAMA": "BARACK OBAMA"})
    batch = pa.table({"entity_key": ["OBAMA", "UNKNOWN THING"]})
    out = linker(batch)
    assert out.column("kb_id").to_pylist() == ["BARACK OBAMA", "UNKNOWN THING"]
    scores = out.column("link_score").to_pylist()
    assert scores[1] == 1.0  # identity link
    assert 0.0 < scores[0] < 1.0


def test_trigram_jaccard_bounds():
    assert trigram_jaccard("ABC", "ABC") == 1.0
    assert trigram_jaccard("ABCDEF", "XYZUVW") == 0.0


def test_build_canonical_map_chains_and_components():
    pairs = [("ALPHABET INC", "GOOGLE LLC"), ("GOOGLE LLC", "GOOGLE LLC"),
             ("TOUR EIFFEL", "EIFFEL TOWER"), ("LONER", "LONER")]
    canon = build_canonical_map(pairs)
    assert canon["ALPHABET INC"] == "GOOGLE LLC"
    assert canon["GOOGLE LLC"] == "GOOGLE LLC"
    assert canon["TOUR EIFFEL"] == "EIFFEL TOWER"
    assert canon["LONER"] == "LONER"
    # two kb ids linked transitively → lexicographic min wins
    canon2 = build_canonical_map([("X", "KB B"), ("X", "KB A")])
    assert canon2["X"] == "KB A" and canon2["KB B"] == "KB A"


def test_canonical_relabel_stage():
    stage = CanonicalRelabel(canon={"A": "CANON_A"},
                             columns={"kb_id": "canonical"})
    out = stage(pa.table({"kb_id": ["A", "B"]}))
    assert out.column("canonical").to_pylist() == ["CANON_A", "B"]


def test_distinct_pairs_shuffle(ray_session):
    ray = ray_session
    ds = ray.data.from_items(
        [{"k": "a", "v": "x"}] * 50 + [{"k": "b", "v": "y"}] * 30)
    pairs = distinct_pairs(ds, "k", "v")
    assert sorted(pairs) == [("a", "x"), ("b", "y")]


def test_connected_components_basic(ray_session):
    ray = ray_session
    from mmore_ray.stages.canonicalize import connected_components

    t = pa.table({"src": pa.array([1, 2, 10, 20], pa.int64()),
                  "dst": pa.array([2, 3, 11, 20], pa.int64())})
    labels = connected_components(ray.data.from_arrow(t), "src", "dst")
    got = {r["node"]: r["label"] for r in labels.take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_large_cross_batch(ray_session):
    """CC on a graph whose components span blocks (shuffled edge order),
    large enough that a driver-side label map would be the anti-pattern
    the distributed path exists to avoid.  Labels never leave the
    cluster: correctness is asserted with a dataset-side aggregate."""
    import numpy as np
    import pyarrow.compute as pc

    ray = ray_session
    from mmore_ray.stages.canonicalize import connected_components

    rng = np.random.default_rng(7)
    src = np.arange(225_000, dtype=np.int64)
    src = src[(src + 1) % 8 != 0][:200_000]  # chains of 8 nodes
    dst = src + 1
    perm = rng.permutation(len(src))
    t = pa.table({"src": pa.array(src[perm]), "dst": pa.array(dst[perm])})
    labels = connected_components(
        ray.data.from_arrow(t).repartition(16), "src", "dst")

    def bad(b: pa.Table) -> pa.Table:
        exp = pc.multiply(pc.divide(b.column("node"), 8), 8)
        n = pc.sum(pc.cast(pc.not_equal(b.column("label"), exp),
                           pa.int64())).as_py() or 0
        return pa.table({"bad": pa.array([int(n)], pa.int64())})

    assert labels.count() == 225_000
    assert labels.map_batches(bad, batch_format="pyarrow").sum("bad") == 0


def test_connected_components_raises_when_not_converged(ray_session):
    import pytest

    ray = ray_session
    from mmore_ray.stages.canonicalize import connected_components

    # one long chain split so every edge lands in its own block — needs
    # several rounds; max_rounds=1 must raise, not silently mislabel
    t = pa.table({"src": pa.array(list(range(63)), pa.int64()),
                  "dst": pa.array(list(range(1, 64)), pa.int64())})
    ds = ray.data.from_arrow(t).repartition(32)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, "src", "dst", max_rounds=1)


def test_connected_components_labels_above_2_53(ray_session):
    """Pointer doubling must coalesce IN ARROW: routing nullable int64
    labels through pandas float64 corrupts any id above 2^53."""
    import pyarrow as pa
    import ray.data

    from mmore_ray.stages.canonicalize import connected_components

    base = 1 << 60  # not float64-representable neighborhood-exact
    edges = [(base + 1, base + 3), (base + 3, base + 5),
             (base + 10, base + 12)]
    ds = ray.data.from_arrow(pa.table({
        "id_a": pa.array([a for a, _ in edges], pa.int64()),
        "id_b": pa.array([b for _, b in edges], pa.int64())}))
    out = connected_components(ds, "id_a", "id_b").to_pandas()
    lab = dict(zip(out["node"], out["label"]))
    assert lab[base + 1] == lab[base + 3] == lab[base + 5] == base + 1
    assert lab[base + 10] == lab[base + 12] == base + 10
