"""Multimodal actor-pool stage plumbing: image resize (real codecs),
audio features and video frame sampling (deterministic fake decode; the
real-codec path is an explicit NotImplementedError integration point)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from ieps_crawler_ray.sources.corpus import build_corpus_rows
from ieps_crawler_ray.stages.multimodal import (AUDIO_FEATURE_SCHEMA,
                                                VIDEO_FRAME_SCHEMA,
                                                AudioFeatureStage,
                                                ImageResizeStage,
                                                VideoFrameSampleStage)


def test_image_resize_stage_over_dataset(ray_session):
    corpus = build_corpus_rows(12)
    ds = rd.from_arrow(corpus).map_batches(
        ImageResizeStage, fn_constructor_kwargs={"target_w": 24,
                                                 "target_h": 16},
        batch_format="pyarrow", batch_size=4, concurrency=2)
    out = ds.to_pandas()
    assert len(out) == 12
    assert out["ok"].all()
    assert (out["w"] == 24).all() and (out["h"] == 16).all()
    from ieps_crawler_ray.functions import image_codec as ic
    img, fmt = ic.decode_image(out["thumb"].iloc[0])
    assert fmt == "png" and img.shape == (16, 24, 3)


def _payload_table(prefix, n):
    rng = np.random.default_rng(5)
    return pa.table({
        f"{prefix}_id": pa.array([f"{prefix}{i:04d}" for i in range(n)]),
        "bytes": pa.array([rng.bytes(100 + i) for i in range(n)],
                          pa.large_binary()),
    })


def test_audio_feature_stage_fake_codec(ray_session):
    t = _payload_table("audio", 10)
    ds = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=4,
        concurrency=2)
    out = ds.to_pandas()
    assert len(out) == 10
    assert all(len(f) == 8 for f in out["features"])
    # deterministic: same payload -> same features
    again = rd.from_arrow(t).map_batches(
        AudioFeatureStage, batch_format="pyarrow", batch_size=10,
        concurrency=1).to_pandas()
    assert np.allclose(np.stack(out.sort_values("audio_id")["features"]),
                       np.stack(again.sort_values("audio_id")["features"]))


def test_video_frame_sample_flatmap_shape(ray_session):
    t = _payload_table("video", 6)
    ds = rd.from_arrow(t).map_batches(
        VideoFrameSampleStage, batch_format="pyarrow", batch_size=3,
        concurrency=2)
    out = ds.to_pandas()
    assert len(out) >= 6           # >= one frame per video
    assert set(out.columns) == {f.name for f in VIDEO_FRAME_SCHEMA}
    from ieps_crawler_ray.functions import image_codec as ic
    img, fmt = ic.decode_image(out["frame"].iloc[0])
    assert fmt == "bmp" and img.shape == (12, 16, 3)


def test_real_codec_paths_are_explicit_stubs():
    with pytest.raises(NotImplementedError):
        AudioFeatureStage(codec="real")._decode(b"xx")
    with pytest.raises(NotImplementedError):
        list(VideoFrameSampleStage(codec="real")._frames(b"xx"))
    with pytest.raises(ValueError):
        AudioFeatureStage(codec="mp3")
