"""Multimodal plumbing + indexer/retriever analogue tests."""

import numpy as np
import pyarrow as pa
import pytest


def _image_batch(n=6, sizes=((600, 600), (100, 100))):
    from mmore_ray.stages.multimodal import fake_image_bytes

    rows = []
    for i in range(n):
        w, h = sizes[i % len(sizes)]
        rows.append(fake_image_bytes(i, w, h))
    return pa.table({"image_id": list(range(n)),
                     "image_bytes": pa.array(rows, pa.binary())})


def test_image_pipeline_plumbing(ray_session):
    ray = ray_session
    from mmore_ray.stages.multimodal import (
        ImageFeatureExtractor,
        attach_image_meta,
        clean_image_filter,
    )

    ds = ray.data.from_arrow(_image_batch())
    out = (
        ds.map_batches(attach_image_meta, batch_format="pyarrow")
        .map_batches(clean_image_filter(min_side=512), batch_format="pyarrow")
        .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                     batch_size=4, concurrency=2)
    ).to_pandas()
    assert len(out) == 3  # small images dropped
    dims = {len(v) for v in out.image_features}
    assert dims == {16}
    # determinism: same payload → same features
    again = (
        ray.data.from_arrow(_image_batch())
        .map_batches(attach_image_meta, batch_format="pyarrow")
        .map_batches(clean_image_filter(min_side=512), batch_format="pyarrow")
        .map_batches(ImageFeatureExtractor, batch_format="pyarrow",
                     batch_size=4, concurrency=2)
    ).to_pandas()
    assert np.allclose(np.stack(out.sort_values("image_id").image_features),
                       np.stack(again.sort_values("image_id").image_features))


def test_real_decode_path_is_marked():
    from mmore_ray.stages.multimodal import ImageFeatureExtractor

    with pytest.raises(NotImplementedError):
        ImageFeatureExtractor(use_fake_decode=False)


def test_frame_sampler(ray_session):
    ray = ray_session
    from mmore_ray.stages.multimodal import FrameSampler

    ds = ray.data.from_arrow(pa.table({
        "video_bytes": pa.array([b"x" * 1000, b"y" * 77], pa.binary())}))
    out = ds.map_batches(FrameSampler, batch_format="pyarrow",
                         concurrency=1).to_pandas()
    assert all(len(f) == 4 for f in out.frames)


def test_index_and_retrieve_roundtrip(ray_session, tmp_path):
    ray = ray_session
    from mmore_ray.stages.embed import index_documents, retrieve

    docs = pa.table({
        "sample_id": [f"d{i}" for i in range(20)],
        "text": [f"document number {i} about topic {i % 3}" for i in range(20)],
    })
    index_documents(ray.data.from_arrow(docs), str(tmp_path / "coll"))

    hits = retrieve(str(tmp_path / "coll"),
                    "document number 7 about topic 1", k=3).to_pandas()
    assert len(hits) == 3
    # the exact matching doc must rank first (identical text → identical
    # dense vector, cosine 1.0, plus max sparse overlap)
    assert hits.sort_values("score", ascending=False).iloc[0].sample_id == "d7"


def test_rerank_and_get_by_ids(ray_session, tmp_path):
    ray = ray_session
    from mmore_ray.stages.embed import get_by_ids, index_documents, retrieve

    docs = pa.table({
        "sample_id": [f"d{i}" for i in range(15)],
        "text": [f"payload text number {i} topic {i % 3}" for i in range(15)],
    })
    index_documents(ray.data.from_arrow(docs), str(tmp_path / "c"))
    hits = retrieve(str(tmp_path / "c"), "payload text number 4 topic 1",
                    k=5, rerank=True).to_pandas()
    assert len(hits) == 5
    assert "rerank_score" in hits.columns
    assert hits.sort_values(["rerank_score", "score"],
                            ascending=False).iloc[0].sample_id == "d4"

    got = get_by_ids(str(tmp_path / "c"), ["d3", "d9"]).to_pandas()
    assert sorted(got.sample_id) == ["d3", "d9"]


def test_embedders_deterministic():
    from mmore_ray.stages.embed import FakeDenseEmbedder, FakeSparseEmbedder

    d1 = FakeDenseEmbedder().embed_one("hello world")
    d2 = FakeDenseEmbedder().embed_one("hello world")
    assert np.allclose(d1, d2) and abs(np.linalg.norm(d1) - 1) < 1e-9
    s1 = FakeSparseEmbedder().embed_one("a b b c")
    assert s1 == FakeSparseEmbedder().embed_one("a b b c")
    assert len(s1[0]) == len(s1[1]) <= 8


def test_audio_asr_pipeline_plumbing(ray_session):
    """Video → audio-track extraction → actor-pool ASR → text column
    (media_processor.py semantics; decode honestly faked)."""
    import pyarrow as pa

    ray = ray_session
    from mmore_ray.stages.multimodal import (
        AsrTranscriber,
        attach_audio_meta,
        extract_audio_track,
        fake_video_bytes,
    )

    rows = pa.table({
        "media_id": pa.array([0, 1, 2], pa.int64()),
        "video_bytes": pa.array([
            fake_video_bytes(0, seconds=10, transcript="hello from clip zero"),
            fake_video_bytes(1, seconds=20, transcript="second clip speech"),
            b"not-a-video",
        ], pa.binary()),
    })
    ds = ray.data.from_arrow(rows)
    out = (ds.map_batches(extract_audio_track, batch_format="pyarrow")
             .map_batches(attach_audio_meta, batch_format="pyarrow")
             .map_batches(AsrTranscriber, concurrency=1, batch_size=2,
                          batch_format="pyarrow")
             .to_pandas().sort_values("media_id"))
    assert out["text"].tolist() == [
        "hello from clip zero", "second clip speech", ""]
    assert [m["seconds"] for m in out["audio_meta"]] == [10, 20, 0]


def test_asr_replaces_existing_text_column():
    """Doc-pipeline batches already carry 'text' — the transcriber must
    REPLACE it, not append a duplicate field (every later
    batch.column('text') would raise)."""
    import pyarrow as pa

    from mmore_ray.stages.multimodal import AsrTranscriber, fake_audio_bytes

    batch = pa.table({
        "text": pa.array(["old caption"]),
        "audio_bytes": pa.array(
            [fake_audio_bytes(0, seconds=5, transcript="spoken words")],
            pa.binary()),
    })
    out = AsrTranscriber()(batch)
    assert out.column_names.count("text") == 1
    assert out.column("text").to_pylist() == ["spoken words"]


def test_asr_real_decode_path_is_marked():
    import pytest

    from mmore_ray.stages.multimodal import AsrTranscriber

    with pytest.raises(NotImplementedError):
        AsrTranscriber(use_fake_decode=False)


def test_media_processor_parses_fake_containers():
    from mmore_ray.stages.multimodal import fake_audio_bytes, fake_video_bytes
    from mmore_ray.stages.processors import (
        ATTACHMENT_TAG,
        MediaProcessor,
        dispatch,
        process_batch,
    )
    import pyarrow as pa
    import pytest

    assert dispatch("x/talk.mp3") is MediaProcessor
    assert dispatch("x/clip.mp4") is MediaProcessor

    aud = fake_audio_bytes(7, seconds=20, transcript="hello audio world")
    out = MediaProcessor.parse("talk.mp3", aud)
    assert out["text"] == "hello audio world"
    assert out["modalities"] == []

    vid = fake_video_bytes(9, seconds=30, transcript="video speech here")
    out = MediaProcessor.parse("clip.mp4", vid)
    lines = out["text"].split("\n")
    assert lines[0] == "video speech here"
    assert lines[1:] == [ATTACHMENT_TAG] * 3  # 30s / 10s sample rate
    assert out["modalities"] == [{"type": "image", "value": f"frame:{i}"}
                                 for i in range(3)]

    # real encoded media stays an honest stub
    with pytest.raises(NotImplementedError):
        MediaProcessor.parse("real.wav", b"RIFF....WAVEfmt ")

    # end-to-end through the batch dispatcher (payload latin-1 roundtrip)
    batch = pa.table({"file_path": ["d/clip.mp4"],
                      "content": [vid.decode("latin-1")]})
    res = process_batch(batch)
    assert res.column("processor_type").to_pylist() == ["MediaProcessor"]
    assert "video speech here" in res.column("text").to_pylist()[0]


def test_clean_image_variance_drops_flat_images(ray_session):
    """The reference's second clean_image criterion (grayscale variance
    < 100 → drop, process/utils.py:61-92) computed for real on the
    FAKEIMG grayscale plane: a constant 600x600 image is dropped even
    though its size passes, a random one of the same size survives."""
    from mmore_ray.stages.multimodal import (attach_image_meta,
                                             clean_image_filter,
                                             fake_image_bytes)

    t = pa.table({
        "image_id": [0, 1, 2],
        "image_bytes": pa.array(
            [fake_image_bytes(0, 600, 600),            # noisy: keep
             fake_image_bytes(1, 600, 600, fill=128),  # flat: drop
             fake_image_bytes(2, 100, 100)],           # small: drop
            pa.binary()),
    })
    ray = ray_session
    out = (ray.data.from_arrow(t)
           .map_batches(attach_image_meta, batch_format="pyarrow")
           .map_batches(clean_image_filter(min_side=512),
                        batch_format="pyarrow")).to_pandas()
    assert out.image_id.tolist() == [0]


def test_failed_reindex_preserves_old_collection(ray_session, tmp_path):
    """A re-index that fails (bad provider name) must leave the previous
    collection intact — the old index_documents rmtree'd the collection
    BEFORE provider resolution, so a typo'd env var destroyed it with
    nothing written (write-then-swap now)."""
    import pandas as pd
    import pytest
    import ray

    from mmore_ray.stages.embed import index_documents, retrieve

    docs = pd.DataFrame({"sample_id": ["a", "b"],
                         "text": ["alpha words", "beta words"]})
    coll = tmp_path / "coll"
    index_documents(ray.data.from_pandas(docs), str(coll))
    before = sorted(retrieve(str(coll), "alpha", k=2)
                    .to_pandas()["sample_id"])

    with pytest.raises(KeyError):
        index_documents(ray.data.from_pandas(docs), str(coll),
                        dense_provider="no-such-provider")
    after = sorted(retrieve(str(coll), "alpha", k=2)
                   .to_pandas()["sample_id"])
    assert after == before == ["a", "b"]


def test_reindex_with_empty_dataset_swaps_to_empty_collection(
        ray_session, tmp_path):
    """Ray writes no files (and no directory) for an empty dataset: the
    swap must still run — indexing zero docs yields an EMPTY collection,
    not a crash that strands or destroys the old one."""
    import pandas as pd
    import ray

    from mmore_ray.stages.embed import index_documents

    docs = pd.DataFrame({"sample_id": ["a"], "text": ["alpha words"]})
    coll = tmp_path / "coll"
    index_documents(ray.data.from_pandas(docs), str(coll))

    empty = ray.data.from_pandas(docs).filter(lambda r: False)
    index_documents(empty, str(coll))  # must not raise
    assert coll.is_dir()
    assert not list(coll.glob("*.parquet"))        # empty collection
    assert not (tmp_path / "coll.tmp").exists()    # tmp swapped away
