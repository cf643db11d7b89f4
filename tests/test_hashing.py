"""Vector-hash parity: the buffer-sliced Arrow kernels must agree
byte-for-byte with the scalar forms, or shard layouts / lineage written
by one form would not resume under the other."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from mmore_ray.functions.hashing import (
    sha256_hex,
    sha256_of_string_array,
    stable_u64,
    stable_u64_of_string_array,
)

CASES = ["", "a", "héllo wörld", "x" * 10_000, "tab\there", "\x00nul"]


@pytest.mark.parametrize("typ", [pa.string(), pa.large_string()])
def test_stable_u64_vector_matches_scalar(typ):
    arr = pa.array(CASES, type=typ)
    got = stable_u64_of_string_array(arr)
    assert [int(v) for v in got] == [stable_u64(s) for s in CASES]


def test_stable_u64_nulls_hash_as_empty():
    arr = pa.array(["a", None, "", None], type=pa.string())
    got = [int(v) for v in stable_u64_of_string_array(arr)]
    assert got == [stable_u64("a"), stable_u64(""), stable_u64(""),
                   stable_u64("")]


def test_stable_u64_sliced_and_chunked():
    base = pa.array([f"row-{i}" for i in range(100)])
    sliced = base.slice(37, 25)
    got = [int(v) for v in stable_u64_of_string_array(sliced)]
    assert got == [stable_u64(f"row-{i}") for i in range(37, 62)]
    chunked = pa.chunked_array([base.slice(0, 10), base.slice(90, 10)])
    got = [int(v) for v in stable_u64_of_string_array(chunked)]
    assert got == [stable_u64(f"row-{i}")
                   for i in list(range(10)) + list(range(90, 100))]


def test_sha256_vector_matches_scalar_on_slice():
    base = pa.array(CASES * 3)
    sliced = base.slice(4, 9)
    assert sha256_of_string_array(sliced) == [
        sha256_hex(s) for s in (CASES * 3)[4:13]]


def test_shard_filter_partitions_exactly():
    """The vectorized _shard_filter must reproduce the scalar hash's
    shard assignment exactly (resume compatibility) and partition the
    corpus (disjoint + exhaustive)."""
    from mmore_ray.pipelines.kg import _shard_filter

    rows = [("repo%d" % (i % 7), "src/f%03d.py" % i) for i in range(200)]
    # null keys: the scalar form f-strings None as the literal "None" —
    # the vector form must land those rows in the SAME shard
    rows += [(None, "orphan.py"), ("repo0", None), (None, None)]
    batch = pa.table({
        "repo": pa.array([r for r, _ in rows], pa.string()),
        "path": pa.array([p for _, p in rows], pa.string()),
        "content": ["c%d" % i for i in range(len(rows))],
    })
    num_shards = 5
    seen = []
    for shard in range(num_shards):
        part = _shard_filter(shard, num_shards)(batch)
        for r, p in zip(part.column("repo").to_pylist(),
                        part.column("path").to_pylist()):
            assert stable_u64(f"{r}\x00{p}") % num_shards == shard
            seen.append((r, p))
    assert sorted(seen, key=str) == sorted(rows, key=str)
