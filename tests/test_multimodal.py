"""Multimodal plumbing: schemas, batch shapes, real image decode;
audio/video behind the clearly-marked deterministic stubs."""

import numpy as np
import pytest

from mhtml_to_html_spark.images.synth import encode_image, synth_image
from mhtml_to_html_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = []
    for i in range(6):
        pixels = synth_image(i, 32, 24)
        rows.append((f"img_{i}", "image", bytearray(encode_image(pixels, "ppm")), {}))
    for i in range(3):
        rows.append((f"aud_{i}", "audio", bytearray(f"fake-audio-{i}".encode() * 50), {}))
    for i in range(3):
        rows.append((f"vid_{i}", "video", bytearray(f"fake-video-{i}".encode() * 50), {}))
    return spark.createDataFrame(
        rows, "media_id string, kind string, bytes binary, meta map<string,string>"
    )


@pytest.mark.spark
def test_feature_extraction_schema_and_values(media):
    feats = extract_features(media).collect()
    assert len(feats) == 12
    by_id = {r["media_id"]: r for r in feats}
    img = by_id["img_0"]
    assert (img["width"], img["height"], img["n_channels"]) == (32, 24, 3)
    assert len(img["features"]) == 16
    source = synth_image(0, 32, 24)
    assert abs(img["mean_luma"] - source.astype(np.float64).mean(axis=2).mean()) < 1e-6
    aud = by_id["aud_0"]
    assert aud["duration_ms"] == 1000 and aud["width"] is None
    vid = by_id["vid_0"]
    assert (vid["width"], vid["height"]) == (16, 16)


@pytest.mark.spark
def test_feature_extraction_deterministic(media):
    a = sorted(map(tuple, extract_features(media).collect()))
    b = sorted(map(tuple, extract_features(media).collect()))
    assert a == b


@pytest.mark.spark
def test_resize_images(media):
    out = {r["media_id"]: r for r in resize_images(media, 16, 12).collect()}
    assert set(out) == {f"img_{i}" for i in range(6)}
    row = out["img_2"]
    assert (row["width"], row["height"]) == (16, 12)
    raw = bytes(row["bytes"])
    pixels = np.frombuffer(raw, dtype=np.uint8, offset=4).reshape(12, 16, 3)
    # nearest-neighbour: every output pixel exists in the source
    source = synth_image(2, 32, 24)
    assert pixels[0, 0] in source.reshape(-1, 3)


@pytest.mark.spark
def test_frame_sampling_fanout(media):
    frames = sample_frames(media, 4).collect()
    assert len(frames) == 3 * 4
    for r in frames:
        assert r["media_id"].startswith("vid_")
        assert 0 <= r["frame_idx"] < 4
        assert len(bytes(r["bytes"])) == 4 + 16 * 16 * 3


def test_strict_mode_raises():
    from mhtml_to_html_spark.operators.multimodal import _decode_audio, _decode_video_frames

    with pytest.raises(NotImplementedError):
        _decode_audio(b"x", strict=True)
    with pytest.raises(NotImplementedError):
        list(_decode_video_frames(b"x", 1, strict=True))
