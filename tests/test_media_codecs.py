"""Real WAV / Y4M codecs (media/codecs.py) and their multimodal
wiring: round-trip fidelity (PCM16 exactness, Y4M PSNR >= 40dB per the
input_hint gate) and the Spark operators decoding real payloads."""

import numpy as np
import pytest

from mhtml_to_html_spark.images.synth import psnr
from mhtml_to_html_spark.media import (
    decode_wav,
    decode_y4m,
    encode_wav,
    encode_y4m,
    synth_audio,
    synth_video,
)


def test_wav_round_trip_mono():
    samples = synth_audio(3, seconds=0.37)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and len(out) == len(samples)
    assert np.max(np.abs(out - samples)) <= 1.5 / 32767, "beyond PCM16 quantization"


def test_wav_round_trip_stereo():
    mono = synth_audio(7, seconds=0.2)
    stereo = np.stack([mono, -mono], axis=1)
    out, rate = decode_wav(encode_wav(stereo, 16000))
    assert rate == 16000 and out.shape == stereo.shape
    assert np.max(np.abs(out - stereo)) <= 1.5 / 32767


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"\x00" * 64)


def test_y4m_round_trip_psnr():
    frames = synth_video(5, n_frames=4, w=32, h=20)
    out, fps = decode_y4m(encode_y4m(frames, fps=25))
    assert fps == 25 and len(out) == 4
    for a, b in zip(frames, out):
        assert a.shape == b.shape
        assert psnr(a, b) >= 40.0, "YUV 8-bit round trip below the input_hint gate"


def test_y4m_rejects_unknown_colorspace():
    frames = synth_video(1, n_frames=1)
    data = encode_y4m(frames).replace(b"C444", b"C420")
    with pytest.raises(ValueError):
        decode_y4m(data)


@pytest.mark.spark
def test_features_and_frames_on_real_media(spark):
    """extract_features / sample_frames decode REAL WAV + Y4M payloads
    (strict=True: any stub fallback would raise)."""
    from mhtml_to_html_spark.operators.multimodal import (
        extract_features,
        sample_frames,
    )

    wav = encode_wav(synth_audio(11, seconds=0.41), 8000)
    vid_frames = synth_video(12, n_frames=6, w=24, h=16)
    y4m = encode_y4m(vid_frames, fps=25)
    media = spark.createDataFrame(
        [("a1", "audio", bytearray(wav)), ("v1", "video", bytearray(y4m))],
        "media_id string, kind string, bytes binary",
    )
    feats = {r["media_id"]: r for r in extract_features(media, strict=True).collect()}
    assert feats["a1"]["duration_ms"] == 410
    assert feats["v1"]["width"] == 24 and feats["v1"]["height"] == 16
    assert feats["v1"]["duration_ms"] == 240  # 6 frames / 25fps
    # the first Y4M frame's luma must round-trip through the real codec
    assert abs(
        feats["v1"]["mean_luma"] - vid_frames[0].astype(np.float64).mean(axis=2).mean()
    ) < 1.5

    frames = sample_frames(media, n_frames=3, strict=True).collect()
    assert [(r["frame_idx"], r["ts_ms"]) for r in frames] == [(0, 0), (1, 80), (2, 160)]
    assert all(r["width"] == 24 and r["height"] == 16 for r in frames)


@pytest.mark.spark
def test_strict_still_raises_on_compressed_formats(spark):
    """The honest seam stays: non-WAV/Y4M payloads under strict=True
    surface the missing-codec error instead of fake data."""
    from mhtml_to_html_spark.operators.multimodal import extract_features

    media = spark.createDataFrame(
        [("x", "audio", bytearray(b"\xff\xfbFAKE-MP3"))],
        "media_id string, kind string, bytes binary",
    )
    with pytest.raises(Exception, match="(?i)ffmpeg|NotImplemented"):
        extract_features(media, strict=True).collect()
