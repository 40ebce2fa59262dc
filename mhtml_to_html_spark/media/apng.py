"""APNG (animated PNG) codec — pure Python + numpy.

Decoder follows the APNG specification's compositing model: each
frame is a sub-raster drawn at (x_offset, y_offset) with
blend_op SOURCE (replace) or OVER (alpha composite), then the canvas
is carried to the next frame under dispose_op NONE / BACKGROUND
(clear the frame region) / PREVIOUS (revert the region). Every
frame's fdAT payloads concatenate to an independent zlib stream;
frame rasters reuse the still-PNG filter/unpack machinery
(media/png.py decode_raster). Output mirrors decode_gif: full-canvas
frames (RGBA) plus per-frame delays in ms.

The encoder writes 8-bit RGBA APNG (first frame as IDAT preceded by
its fcTL — part of the animation) with optional per-frame regions,
dispose and blend ops, for fixtures and the differential tests.

Reference parity: the reference carries animated images opaquely
(data URIs); frame decode exists for the engine's image/video axis
(frame sampling, per-frame phash).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .png import _CHANNELS, _iter_chunks, decode_raster

_SIG = b"\x89PNG\r\n\x1a\n"


def _to_rgba(px: np.ndarray) -> np.ndarray:
    c = px.shape[2]
    if c == 4:
        return px
    if c == 3:
        return np.dstack([px, np.full(px.shape[:2], 255, np.uint8)])
    if c == 2:
        gray = np.repeat(px[..., :1], 3, axis=2)
        return np.dstack([gray, px[..., 1:2]])
    gray = np.repeat(px[..., :1], 3, axis=2)
    return np.dstack([gray, np.full(px.shape[:2], 255, np.uint8)])


def decode_apng(data: bytes) -> tuple[list[np.ndarray], list[int]]:
    """APNG bytes → (full-canvas RGBA uint8 frames, delay ms per
    frame). Raises for still PNGs (no acTL) — callers route those to
    decode_png."""
    width = height = depth = ctype = None
    palette = None
    trns = None
    num_frames = None
    frames_ctl: list[dict] = []  # fcTL fields + collected data chunks
    default_image_data: list[bytes] = []
    default_in_anim = False
    for chunk, body in _iter_chunks(data):
        if chunk == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if interlace != 0:
                raise ValueError("interlaced APNG unsupported")
            if ctype not in _CHANNELS:
                raise ValueError(f"unknown PNG color type {ctype}")
        elif chunk == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif chunk == b"tRNS":
            trns = body
        elif chunk == b"acTL":
            num_frames = struct.unpack_from(">I", body, 0)[0]
        elif chunk == b"fcTL":
            (_seq, fw, fh, x0, y0, dnum, dden, dispose, blend) = struct.unpack(
                ">IIIIIHHBB", body
            )
            frames_ctl.append(
                {
                    "w": fw,
                    "h": fh,
                    "x": x0,
                    "y": y0,
                    "delay_ms": (dnum * 1000) // (dden or 100),
                    "dispose": dispose,
                    "blend": blend,
                    "data": [],
                }
            )
        elif chunk == b"IDAT":
            if frames_ctl:
                # an fcTL preceded IDAT: the default image is frame 0
                default_in_anim = True
                frames_ctl[-1]["data"].append(body)
            else:
                default_image_data.append(body)
        elif chunk == b"fdAT":
            if not frames_ctl:
                raise ValueError("fdAT before any fcTL")
            frames_ctl[-1]["data"].append(body[4:])  # strip sequence number
    if num_frames is None:
        raise ValueError("not an APNG (no acTL)")
    if width is None:
        raise ValueError("PNG missing IHDR")
    if len(frames_ctl) != num_frames:
        raise ValueError("APNG frame count mismatch")

    canvas = np.zeros((height, width, 4), dtype=np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    for i, ctl in enumerate(frames_ctl):
        fw, fh, x0, y0 = ctl["w"], ctl["h"], ctl["x"], ctl["y"]
        if x0 + fw > width or y0 + fh > height:
            raise ValueError("APNG frame region outside canvas")
        raw = zlib.decompress(b"".join(ctl["data"]))
        px = _to_rgba(decode_raster(raw, fw, fh, depth, ctype, palette, trns))
        dispose = ctl["dispose"]
        if i == 0 and dispose == 2:
            dispose = 1  # spec: PREVIOUS on the first frame acts as BACKGROUND
        snapshot = canvas[y0 : y0 + fh, x0 : x0 + fw].copy() if dispose == 2 else None
        region = canvas[y0 : y0 + fh, x0 : x0 + fw]
        blend = ctl["blend"]
        if i == 0:
            blend = 0  # spec: the first frame always blends as SOURCE
        if blend == 0:
            region[:] = px
        else:  # OVER
            fa = px[..., 3:].astype(np.float64) / 255.0
            ba = region[..., 3:].astype(np.float64) / 255.0
            oa = fa + ba * (1.0 - fa)
            safe = np.where(oa == 0.0, 1.0, oa)
            rgb = (
                px[..., :3].astype(np.float64) * fa
                + region[..., :3].astype(np.float64) * ba * (1.0 - fa)
            ) / safe
            region[..., :3] = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
            region[..., 3:] = np.clip(np.rint(oa * 255.0), 0, 255).astype(np.uint8)
        frames.append(canvas.copy())
        delays.append(ctl["delay_ms"])
        if dispose == 1:  # BACKGROUND: fully transparent black
            canvas[y0 : y0 + fh, x0 : x0 + fw] = 0
        elif dispose == 2:  # PREVIOUS
            canvas[y0 : y0 + fh, x0 : x0 + fw] = snapshot
    if not default_in_anim and not default_image_data:
        raise ValueError("APNG missing image data")
    return frames, delays


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_apng(
    frames: list[np.ndarray],
    delays_ms: list[int] | None = None,
    regions: list[tuple[int, int] | None] | None = None,
    dispose: list[int] | None = None,
    blend: list[int] | None = None,
) -> bytes:
    """RGB/RGBA uint8 frames → 8-bit RGBA APNG. frames[0] sets the
    canvas size and is written as the IDAT default image (fcTL first,
    so it is part of the animation). regions[i] = (x, y) places frame
    i's raster at an offset (its array supplies the sub-size);
    dispose/blend are per-frame op codes (defaults NONE / SOURCE,
    frame 0 always SOURCE per spec)."""
    frames = [_to_rgba(np.asarray(f, dtype=np.uint8)) for f in frames]
    h, w = frames[0].shape[:2]
    n = len(frames)
    delays_ms = delays_ms or [100] * n
    regions = regions or [None] * n
    dispose = dispose or [0] * n
    blend = blend or [0] * n

    def raster(px: np.ndarray) -> bytes:
        fh = px.shape[0]
        rows = np.concatenate(
            [np.zeros((fh, 1), np.uint8), px.reshape(fh, -1)], axis=1
        )
        return zlib.compress(rows.tobytes())

    out = bytearray(_SIG)
    out += _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
    out += _chunk(b"acTL", struct.pack(">II", n, 0))
    seq = 0
    for i, px in enumerate(frames):
        fh, fw = px.shape[:2]
        x0, y0 = regions[i] or (0, 0)
        if i == 0 and (fw != w or fh != h or (x0, y0) != (0, 0)):
            raise ValueError("frame 0 must cover the full canvas")
        out += _chunk(
            b"fcTL",
            struct.pack(
                ">IIIIIHHBB",
                seq, fw, fh, x0, y0, delays_ms[i], 1000, dispose[i], blend[i],
            ),
        )
        seq += 1
        payload = raster(px)
        if i == 0:
            out += _chunk(b"IDAT", payload)
        else:
            out += _chunk(b"fdAT", struct.pack(">I", seq) + payload)
            seq += 1
    out += _chunk(b"IEND", b"")
    return bytes(out)
