"""Real audio/video codecs, numpy-only (no ffmpeg in the container).

- WAV: canonical RIFF/PCM16 mono|stereo encode/decode — byte-exact
  round-trip at int16 resolution.
- Y4M: YUV4MPEG2 with the C444 colorspace (one luma + two full-res
  chroma planes per frame) — the simplest REAL video container, used
  by ffmpeg/x264 as their uncompressed interchange format. RGB↔YUV is
  BT.601 full-range; the 8-bit quantization keeps round-trip PSNR
  well above the input_hint's 40dB gate.

These are the production codecs for the multimodal operators
(operators/multimodal.py): WAV/Y4M payloads decode for real; other
containers (mp3/mp4/...) still need ffmpeg and keep the honest stub
seam.
"""

from __future__ import annotations

import struct

import numpy as np


# --- WAV (RIFF PCM16) ---------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """float32 [-1,1] samples, shape (n,) or (n, channels) → PCM16 WAV."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype("<i2")
    payload = pcm.tobytes()
    block_align = channels * 2
    byte_rate = rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block_align, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV → (float32 samples shape (n,) or (n, ch), rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    pcm = np.frombuffer(payload, dtype="<i2")
    samples = (pcm.astype(np.float32) / 32767.0).reshape(-1, channels)
    return (samples[:, 0] if channels == 1 else samples), int(rate)


# --- Y4M (YUV4MPEG2, C444) ----------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"


def _rgb_to_yuv444(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.clip(np.rint(np.stack([y, u, v])), 0, 255).astype(np.uint8)


def _yuv444_to_rgb(yuv: np.ndarray) -> np.ndarray:
    y = yuv[0].astype(np.float64)
    u = yuv[1].astype(np.float64) - 128.0
    v = yuv[2].astype(np.float64) - 128.0
    r = y + 1.402 * v
    g = y - 0.344136 * u - 0.714136 * v
    b = y + 1.772 * u
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def encode_y4m(frames: list[np.ndarray], fps: int = 25) -> bytes:
    """RGB uint8 frames (h, w, 3), all same size → YUV4MPEG2 C444."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    out = [b"%s W%d H%d F%d:1 Ip A1:1 C444\n" % (_Y4M_MAGIC, w, h, fps)]
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("frame size mismatch")
        yuv = _rgb_to_yuv444(frame)
        out.append(b"FRAME\n")
        out.append(yuv.tobytes())  # Y plane, U plane, V plane
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int]:
    """YUV4MPEG2 C444 → (RGB uint8 frames, fps)."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = data.index(b"\n")
    header = data[len(_Y4M_MAGIC) : nl].decode("ascii").split()
    w = h = None
    fps = 25
    colorspace = "C420jpeg"
    for token in header:
        if token.startswith("W"):
            w = int(token[1:])
        elif token.startswith("H"):
            h = int(token[1:])
        elif token.startswith("F"):
            num, den = token[1:].split(":")
            fps = max(1, int(round(int(num) / int(den))))
        elif token.startswith("C"):
            colorspace = token
    if w is None or h is None:
        raise ValueError("Y4M missing dimensions")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    frames = []
    pos = nl + 1
    plane = w * h
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        pos = fnl + 1
        yuv = np.frombuffer(data, dtype=np.uint8, count=3 * plane, offset=pos).reshape(
            3, h, w
        )
        frames.append(_yuv444_to_rgb(yuv))
        pos += 3 * plane
    return frames, fps


# --- deterministic synthesis (corpus doubles with REAL payloads) ---------------


def synth_audio(media_id: int, seconds: float = 0.5, rate: int = 8000) -> np.ndarray:
    """Seeded mix of two sine tones + light noise, float32 [-1,1]."""
    rng = np.random.default_rng(90_000 + media_id)
    t = np.arange(int(seconds * rate)) / rate
    f1, f2 = rng.integers(100, 1200, size=2)
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.3 * np.sin(2 * np.pi * f2 * t)
    wave += 0.05 * rng.standard_normal(len(t))
    return np.clip(wave, -1, 1).astype(np.float32)


def synth_video(media_id: int, n_frames: int = 6, w: int = 24, h: int = 16) -> list[np.ndarray]:
    """Seeded moving-gradient frames (h, w, 3) uint8."""
    rng = np.random.default_rng(95_000 + media_id)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    frames = []
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n_frames):
        wave = (127 + 120 * np.sin(xx / 4 + i) * np.cos(yy / 5 + media_id)).astype(
            np.uint8
        )
        frames.append(((base.astype(np.uint16) + wave[..., None]) // 2).astype(np.uint8))
    return frames
