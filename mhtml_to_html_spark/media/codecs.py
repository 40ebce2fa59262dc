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
    """WAV → (float32 samples shape (n,) or (n, ch), rate). Handles
    PCM16 (format 1) and IMA ADPCM (format 0x11 — real 4:1 compressed
    audio, decoded by decode_ima_adpcm below)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = channels = None
    audio_fmt = None
    block_align = 0
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _brate, block_align = struct.unpack_from(
                "<HHIIH", body, 0
            )
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt == 1 and bits != 16:
                raise ValueError(f"unsupported PCM WAV (bits={bits})")
            if audio_fmt not in (1, 0x11):
                raise ValueError(f"unsupported WAV format {audio_fmt}")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 0x11:
        if block_align < 4 * channels:
            # a malformed fmt chunk (block_align=0) would otherwise
            # surface as ZeroDivisionError from the block math
            raise ValueError(f"bad IMA ADPCM block_align {block_align}")
        pcm = decode_ima_adpcm(payload, channels, block_align)
    else:
        pcm = np.frombuffer(payload, dtype="<i2").reshape(-1, channels)
    samples = pcm.astype(np.float32) / 32767.0
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


def encode_y4m(
    frames: list[np.ndarray], fps: int = 25, colorspace: str = "C444"
) -> bytes:
    """RGB uint8 frames (h, w, 3), all same size → YUV4MPEG2.

    colorspace: C444 (full chroma), C422 (2x1 mean-subsampled chroma,
    even width), C420jpeg (2x2, even dims), or Cmono (luma only)."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if colorspace in ("C420jpeg", "C420") and (w % 2 or h % 2):
        raise ValueError("4:2:0 Y4M needs even dimensions")
    if colorspace == "C422" and w % 2:
        raise ValueError("4:2:2 Y4M needs even width")
    out = [
        b"%s W%d H%d F%d:1 Ip A1:1 %s\n"
        % (_Y4M_MAGIC, w, h, fps, colorspace.encode("ascii"))
    ]
    for frame in frames:
        if frame.shape[:2] != (h, w):
            raise ValueError("frame size mismatch")
        yuv = _rgb_to_yuv444(frame)
        out.append(b"FRAME\n")
        if colorspace == "Cmono":
            out.append(yuv[0].tobytes())
        elif colorspace in ("C420jpeg", "C420"):
            out.append(yuv[0].tobytes())
            for c in (1, 2):
                sub = yuv[c].astype(np.float64).reshape(h // 2, 2, w // 2, 2)
                out.append(
                    np.clip(np.rint(sub.mean(axis=(1, 3))), 0, 255)
                    .astype(np.uint8)
                    .tobytes()
                )
        elif colorspace == "C422":
            out.append(yuv[0].tobytes())
            for c in (1, 2):
                sub = yuv[c].astype(np.float64).reshape(h, w // 2, 2)
                out.append(
                    np.clip(np.rint(sub.mean(axis=2)), 0, 255)
                    .astype(np.uint8)
                    .tobytes()
                )
        elif colorspace == "C444":
            out.append(yuv.tobytes())  # Y plane, U plane, V plane
        else:
            raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[list[np.ndarray], int]:
    """YUV4MPEG2 → (RGB uint8 frames, fps). Colorspaces: C444, C422,
    C420/C420jpeg/C420mpeg2/C420paldv (all upsampled nearest-neighbour
    — the chroma-siting variants differ only in sample placement,
    which nearest-neighbour replication washes out), Cmono."""
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
    plane = w * h
    if colorspace == "C444":
        chroma_shape = (h, w)
    elif colorspace == "C422":
        chroma_shape = (h, w // 2)
    elif colorspace in ("C420", "C420jpeg", "C420mpeg2", "C420paldv"):
        chroma_shape = (h // 2, w // 2)
    elif colorspace == "Cmono":
        chroma_shape = None
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    chroma_n = 0 if chroma_shape is None else chroma_shape[0] * chroma_shape[1]
    frame_bytes = plane + 2 * chroma_n
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if data[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed Y4M frame header")
        pos = fnl + 1
        raw = np.frombuffer(data, dtype=np.uint8, count=frame_bytes, offset=pos)
        if raw.size != frame_bytes:
            raise ValueError("truncated Y4M frame")
        y = raw[:plane].reshape(h, w)
        if chroma_shape is None:
            u = v = np.full((h, w), 128, dtype=np.uint8)
        else:
            u = raw[plane : plane + chroma_n].reshape(chroma_shape)
            v = raw[plane + chroma_n :].reshape(chroma_shape)
            u = np.repeat(np.repeat(u, h // chroma_shape[0], axis=0), w // chroma_shape[1], axis=1)
            v = np.repeat(np.repeat(v, h // chroma_shape[0], axis=0), w // chroma_shape[1], axis=1)
        frames.append(_yuv444_to_rgb(np.stack([y, u, v])))
        pos += frame_bytes
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


# --- IMA ADPCM (WAV format tag 0x11) -------------------------------------------
#
# Real compressed audio the container can decode without ffmpeg: 4:1
# compression, the IMA/DVI spec's step & index tables, block-aligned
# with a (predictor, step index) header per channel per block.

_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)

_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(predictor: int, index: int, nibble: int) -> tuple[int, int]:
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    if nibble & 8:
        predictor -= diff
    else:
        predictor += diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nibble & 7]))
    return predictor, index


def decode_ima_adpcm(payload: bytes, channels: int, block_align: int) -> np.ndarray:
    """IMA ADPCM data chunk → int16 PCM, shape (n, channels)."""
    out = [[] for _ in range(channels)]
    for boff in range(0, len(payload) - (len(payload) % block_align or 0), block_align):
        block = payload[boff : boff + block_align]
        if len(block) < 4 * channels:
            break
        preds = []
        idxs = []
        for c in range(channels):
            pred, idx = struct.unpack_from("<hB", block, 4 * c)[0], block[4 * c + 2]
            idx = min(idx, 88)
            preds.append(pred)
            idxs.append(idx)
            out[c].append(pred)  # the header predictor IS the first sample
        # after the headers: interleaved 4-byte (8-nibble) groups per channel
        pos = 4 * channels
        while pos + 4 * channels <= len(block):
            for c in range(channels):
                group = block[pos + 4 * c : pos + 4 * c + 4]
                for byte in group:
                    for nib in (byte & 0x0F, byte >> 4):
                        preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                        out[c].append(preds[c])
            pos += 4 * channels
    n = min(len(ch) for ch in out)
    pcm = np.stack([np.asarray(ch[:n], dtype=np.int16) for ch in out], axis=1)
    return pcm


def encode_ima_adpcm_wav(
    samples: np.ndarray, rate: int = 8000, samples_per_block: int = 505
) -> bytes:
    """float32 [-1,1] (n,) or (n, ch) → IMA ADPCM WAV (format 0x11)."""
    samples = np.asarray(samples, dtype=np.float64)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.clip(np.rint(samples * 32767.0), -32768, 32767).astype(np.int64)
    if n == 0:
        raise ValueError("no samples")
    # pad so every block is full: each block spans exactly per_block
    # samples (1 in the header + per_block-1 as nibbles)
    per_block = samples_per_block
    if (per_block - 1) % 8:
        raise ValueError("samples_per_block must be 1 + multiple of 8")
    pad = (-n) % per_block
    pcm = np.vstack([pcm, np.repeat(pcm[-1:], pad, axis=0)])
    n_padded = pcm.shape[0]
    block_align = 4 * channels + (per_block - 1) // 2 * channels
    idxs = [0] * channels
    blocks = []
    for start in range(0, n_padded, per_block):
        chunk = pcm[start : start + per_block]
        if chunk.shape[0] < per_block:
            break
        header = bytearray()
        preds = []
        for c in range(channels):
            pred = int(chunk[0, c])
            header += struct.pack("<hBB", pred, idxs[c], 0)
            preds.append(pred)
        nibbles = [[] for _ in range(channels)]
        for c in range(channels):
            for s in chunk[1:, c]:
                step = _IMA_STEP_TABLE[idxs[c]]
                diff = int(s) - preds[c]
                nib = 8 if diff < 0 else 0
                diff = abs(diff)
                mask = 4
                tmp = step
                for _ in range(3):
                    if diff >= tmp:
                        nib |= mask
                        diff -= tmp
                    tmp >>= 1
                    mask >>= 1
                preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                nibbles[c].append(nib)
        body = bytearray()
        for goff in range(0, len(nibbles[0]), 8):
            for c in range(channels):
                g = nibbles[c][goff : goff + 8]
                for k in range(0, 8, 2):
                    body.append(g[k] | (g[k + 1] << 4))
        blocks.append(bytes(header) + bytes(body))
    payload = b"".join(blocks)
    byte_rate = rate * block_align // per_block  # nominal
    fmt = struct.pack(
        "<HHIIHH", 0x11, channels, rate, byte_rate, block_align, 4
    ) + struct.pack("<HH", 2, per_block)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    fact = struct.pack("<I", n_padded)
    chunks += b"fact" + struct.pack("<I", len(fact)) + fact
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
