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


class TestImaAdpcm:
    """IMA ADPCM WAV (format 0x11) — real 4:1 compressed audio."""

    def test_round_trip_snr(self):
        import numpy as np

        from mhtml_to_html_spark.media.codecs import (
            decode_wav,
            encode_ima_adpcm_wav,
            synth_audio,
        )

        wave = synth_audio(3, seconds=0.8)
        out, rate = decode_wav(encode_ima_adpcm_wav(wave, 8000))
        assert rate == 8000
        assert len(out) >= len(wave)  # padded to whole blocks, never truncated
        n = len(wave)
        noise = wave.astype(np.float64) - out[:n].astype(np.float64)
        snr = 10 * np.log10((wave.astype(np.float64) ** 2).sum() / (noise**2).sum())
        assert snr > 15.0, snr

    def test_stereo_channels_independent(self):
        import numpy as np

        from mhtml_to_html_spark.media.codecs import (
            decode_wav,
            encode_ima_adpcm_wav,
            synth_audio,
        )

        left = synth_audio(5, seconds=0.3)
        right = synth_audio(6, seconds=0.3)
        out, _ = decode_wav(encode_ima_adpcm_wav(np.stack([left, right], axis=1), 8000))
        assert out.shape[1] == 2
        n = len(left)
        # each decoded channel correlates with ITS source, not the other
        cl = np.corrcoef(left, out[:n, 0])[0, 1]
        cx = np.corrcoef(left, out[:n, 1])[0, 1]
        assert cl > 0.95 and abs(cx) < 0.5

    def test_nibble_decoder_hand_vector(self):
        """Hand-computed IMA steps at index 0 (step 7): nibble 0b0111
        -> diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7 = 11, index += 8;
        nibble 0b1000 -> diff = 7>>3 = 0 subtracted, index -1 floored
        at 0."""
        from mhtml_to_html_spark.media.codecs import _ima_step

        assert _ima_step(0, 0, 0b0111) == (11, 8)
        assert _ima_step(100, 0, 0b1000) == (100, 0)
        # magnitude clamp at int16 bounds
        pred, _ = _ima_step(32767, 88, 0b0111)
        assert pred == 32767

    def test_unsupported_format_still_raises(self):
        import struct

        from mhtml_to_html_spark.media.codecs import decode_wav

        fmt = struct.pack("<HHIIHH", 6, 1, 8000, 8000, 1, 8)  # A-law
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        bad = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unsupported WAV format"):
            decode_wav(bad)


def test_y4m_chroma_subsampled_colorspaces():
    """C422/C420jpeg/Cmono decode bit-equal to an independent numpy
    replay of the mean-subsample + nearest-neighbour upsample math;
    C420mpeg2/C420paldv parse as 4:2:0 aliases (chroma siting washes
    out under nearest-neighbour replication)."""
    import numpy as np

    from mhtml_to_html_spark.media.codecs import (
        _rgb_to_yuv444,
        _yuv444_to_rgb,
        decode_y4m,
        encode_y4m,
        synth_video,
    )

    h, w = 12, 16
    frames = synth_video(7, n_frames=3, w=w, h=h)
    yuv = _rgb_to_yuv444(frames[0])

    def mean_sub(plane, fy, fx):
        sub = plane.astype(np.float64).reshape(h // fy, fy, w // fx, fx).mean((1, 3))
        sub = np.clip(np.rint(sub), 0, 255).astype(np.uint8)
        return np.repeat(np.repeat(sub, fy, axis=0), fx, axis=1)

    flat = np.full((h, w), 128, np.uint8)
    expected = {
        "C444": _yuv444_to_rgb(yuv),
        "C422": _yuv444_to_rgb(np.stack([yuv[0], mean_sub(yuv[1], 1, 2), mean_sub(yuv[2], 1, 2)])),
        "C420jpeg": _yuv444_to_rgb(np.stack([yuv[0], mean_sub(yuv[1], 2, 2), mean_sub(yuv[2], 2, 2)])),
        "Cmono": _yuv444_to_rgb(np.stack([yuv[0], flat, flat])),
    }
    for cs, exp in expected.items():
        out, fps = decode_y4m(encode_y4m(frames, fps=30, colorspace=cs))
        assert fps == 30 and len(out) == 3
        assert np.array_equal(out[0], exp), cs

    aliased = encode_y4m(frames, colorspace="C420jpeg").replace(
        b"C420jpeg", b"C420paldv", 1
    )
    out, _ = decode_y4m(aliased)
    assert np.array_equal(out[0], expected["C420jpeg"])


def test_y4m_odd_dims_rejected_for_subsampled():
    import pytest

    from mhtml_to_html_spark.media.codecs import encode_y4m, synth_video

    odd = synth_video(8, n_frames=1, w=15, h=11)
    with pytest.raises(ValueError, match="even"):
        encode_y4m(odd, colorspace="C420jpeg")
    with pytest.raises(ValueError, match="even"):
        encode_y4m(odd, colorspace="C422")
