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


@pytest.mark.spark
def test_compressed_image_formats_through_features(spark):
    """PNG/GIF/JPEG media rows decode for real (strict mode: any stub
    fallback would raise), with the decoded geometry surfaced."""
    from mhtml_to_html_spark.media import encode_gif, encode_jpeg, encode_png

    rgb = synth_image(21, 20, 14)
    rows = [
        ("png", "image", bytearray(encode_png(rgb))),
        ("png_i", "image", bytearray(encode_png(rgb, interlace=True))),
        ("gif", "image", bytearray(encode_gif([rgb // 64 * 64]))),
        ("jpg", "image", bytearray(encode_jpeg(rgb, quality=90))),
    ]
    media = spark.createDataFrame(rows, "media_id string, kind string, bytes binary")
    out = {r["media_id"]: r for r in extract_features(media, strict=True).collect()}
    assert set(out) == {"png", "png_i", "gif", "jpg"}
    for r in out.values():
        assert (r["width"], r["height"], r["n_channels"]) == (20, 14, 3)
    # PNG is lossless: luma matches the source exactly
    want = rgb.astype(np.float64).mean()
    assert abs(out["png"]["mean_luma"] - want) < 1e-9
    assert abs(out["png_i"]["mean_luma"] - want) < 1e-9
    # JPEG is lossy but close at q90
    assert abs(out["jpg"]["mean_luma"] - want) < 3.0


@pytest.mark.spark
def test_animated_gif_is_a_video_source(spark):
    """Animated GIFs ride the video path: frame sampling honours the
    per-frame delays and duration is the delay sum."""
    from mhtml_to_html_spark.media import encode_gif

    frames = [synth_image(30 + k, 12, 10) // 64 * 64 for k in range(4)]
    gif = encode_gif(frames, delays_ms=[40, 50, 60, 70])
    media = spark.createDataFrame(
        [("g", "video", bytearray(gif))], "media_id string, kind string, bytes binary"
    )
    feats = extract_features(media, strict=True).collect()[0]
    assert feats["duration_ms"] == 40 + 50 + 60 + 70
    assert (feats["width"], feats["height"]) == (12, 10)
    sampled = sample_frames(media, 4, strict=True).collect()
    assert [r["frame_idx"] for r in sampled] == [0, 1, 2, 3]
    # frame k starts after the cumulative delays of earlier frames
    assert [r["ts_ms"] for r in sampled] == [0, 40, 90, 150]
    got = np.frombuffer(bytes(sampled[2]["bytes"]), dtype=np.uint8, offset=4).reshape(10, 12, 3)
    assert (got == frames[2]).all()


def test_to_rgb3_normalization():
    from mhtml_to_html_spark.operators.multimodal import _decode_image, _to_rgb3
    from mhtml_to_html_spark.media import encode_png

    rgb = synth_image(33, 8, 6)
    rgba = np.dstack([rgb, np.full((6, 8, 1), 77, np.uint8)])
    out = _decode_image(encode_png(rgba))
    assert out.shape == (6, 8, 4)
    assert (_to_rgb3(out) == rgb).all()
    gray = rgb[..., :1]
    out = _decode_image(encode_png(gray))
    assert out.shape == (6, 8, 1)
    assert (_to_rgb3(out)[..., 2] == gray[..., 0]).all()


@pytest.mark.spark
def test_image_pixel_quality_reasons(spark):
    """Each curation signal gates its intended payload; undecodable
    bytes reject the row instead of failing the batch."""
    import __spark_entry__ as entry
    from mhtml_to_html_spark.operators.multimodal import image_pixel_quality

    media = spark.createDataFrame(
        [(mid, bytearray(d)) for mid, d in entry._image_quality_corpus_rows()],
        "media_id string, bytes binary",
    )
    out = {
        r["media_id"]: r
        for r in image_pixel_quality(media, **entry._IMAGE_QUALITY_THRESHOLDS).collect()
    }
    want = {
        "good_noise": None,
        "tiny": "too_small",
        "banner": "bad_aspect",
        "flat": "low_entropy",
        "smooth_blur": "blurry",
        "overexposed": "washed_out",
        "grayscale": "monochrome",
        "corrupt": "undecodable",
    }
    for mid, reason in want.items():
        assert out[mid]["reject_reason"] == reason, mid
        assert out[mid]["keep"] is (reason is None)
    assert out["corrupt"]["width"] is None
    assert out["flat"]["entropy"] == 0.0  # not -0.0


@pytest.mark.spark
def test_dct_phash_near_dup_radius(spark):
    """The DCT hash keeps true variants (recompression, brightness,
    EXIF-rotated re-encode) within a small hamming radius while
    distinct images stay far — the property the banded near-dup join
    relies on."""
    import __spark_entry__ as entry

    rows = {r["media_id"]: r for r in entry.q_image_phash_dct(spark, None).collect()}
    for mid, r in rows.items():
        if "__" in mid:
            assert r["ham_dct"] <= 10, (mid, r["ham_dct"])
    # distinct bases are far apart under both hashes
    b0, b1 = rows["b0"], rows["b1"]
    far = bin((b0["phash_dct"] ^ b1["phash_dct"]) & ((1 << 64) - 1)).count("1")
    assert far >= 20, far
    # the rotated re-encode only collides BECAUSE orientation was
    # normalized: without the tag applied the stored pixels differ
    from mhtml_to_html_spark.images.synth import phash_dct64, synth_image
    from mhtml_to_html_spark.operators.multimodal import _decode_image, _to_rgb3

    base = synth_image(120, 64, 48)
    raw = _to_rgb3(_decode_image([d for m, _b, d in entry._phash_dct_corpus_rows() if m == "b0__rot"][0]))
    unoriented = bin(
        (phash_dct64(raw) ^ phash_dct64(base)) & ((1 << 64) - 1)
    ).count("1")
    assert unoriented > 10, unoriented
