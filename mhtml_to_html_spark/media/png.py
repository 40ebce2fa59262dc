"""PNG codec — stdlib zlib + numpy, no Pillow.

Implements the PNG spec (RFC 2083 / W3C PNG 2nd ed.) far enough to
decode every still image a crawler meets in practice:

- bit depths 1/2/4/8/16 (16-bit planes are scaled to 8-bit output);
- color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
  6 (RGBA);
- all five scanline filters (None/Sub/Up/Average/Paeth);
- Adam7 interlacing;
- tRNS transparency for palette and opaque color types;
- chunk CRC verification (zlib.crc32).

The encoder exists so tests and the synthetic corpus can build real
PNG payloads deterministically; it writes 8-bit gray/RGB/RGBA/palette
with per-row filter 0 (encode correctness is NOT assumed by decoder
tests — those use hand-assembled chunk streams and spec vectors).

Reference parity: the reference inlines PNG parts as data URIs without
decoding (/root/reference/test/document.test.js:10-23); pixel decode
exists here because the engine's image axis (phash near-dup, caption
admission, feature extraction) needs pixels, not bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel, by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _iter_chunks(data: bytes):
    if data[: len(_SIGNATURE)] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIGNATURE)
    while pos + 8 <= len(data):
        length = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC on {ctype!r} chunk")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND")


def _unfilter(raw: bytes, width: int, height: int, bpp: int, row_bytes: int) -> np.ndarray:
    """Undo per-scanline filtering → (height, row_bytes) uint8.

    Filters None/Sub/Up are vectorized (Sub is a per-byte-lane modular
    cumsum); Average/Paeth recur on the left neighbour so they walk the
    row in bpp-wide numpy steps.
    """
    expected = height * (1 + row_bytes)
    if len(raw) < expected:
        raise ValueError("IDAT stream shorter than the image geometry")
    out = np.zeros((height, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=row_bytes, offset=pos + 1)
        pos += 1 + row_bytes
        if ftype == 0:
            recon = row.copy()
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp]
            # Sub is a per-byte-lane modular prefix sum; row_bytes is an
            # exact multiple of bpp (depth >= 8) or bpp == 1 (sub-byte)
            lanes = row.reshape(-1, bpp).astype(np.uint64)
            recon = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(-1)
        elif ftype == 2:  # Up
            recon = row + prev
        elif ftype == 3:  # Average
            recon = np.zeros(row_bytes, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.uint16)
            for x in range(0, row_bytes, bpp):
                seg = min(bpp, row_bytes - x)
                up = prev[x : x + seg].astype(np.uint16)
                val = (row[x : x + seg] + ((left[:seg] + up) >> 1)).astype(np.uint8)
                recon[x : x + seg] = val
                left[:seg] = val
        elif ftype == 4:  # Paeth
            recon = np.zeros(row_bytes, dtype=np.uint8)
            left = np.zeros(bpp, dtype=np.int32)
            upleft = np.zeros(bpp, dtype=np.int32)
            for x in range(0, row_bytes, bpp):
                seg = min(bpp, row_bytes - x)
                b = prev[x : x + seg].astype(np.int32)
                a, c = left[:seg], upleft[:seg]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                val = ((row[x : x + seg].astype(np.int32) + pred) % 256).astype(np.uint8)
                recon[x : x + seg] = val
                upleft[:seg] = b
                left[:seg] = val
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = recon
        prev = recon
    return out


def _unpack_samples(rows: np.ndarray, width: int, channels: int, depth: int) -> np.ndarray:
    """(h, row_bytes) filtered-out rows → (h, width, channels) uint8."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : width * channels].reshape(h, width, channels)
    if depth == 16:
        wide = rows[:, : width * channels * 2].reshape(h, width, channels, 2)
        return wide[..., 0]  # high byte == round(v / 257) near enough; spec-sanctioned scale
    # sub-byte depths: only valid for gray (type 0) and palette (type 3)
    bits = np.unpackbits(rows, axis=1)[:, : width * depth].reshape(h, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    idx = (bits.astype(np.uint16) * weights).sum(axis=2)
    return idx.astype(np.uint8)[..., None]


def _scale_to_8bit(values: np.ndarray, depth: int) -> np.ndarray:
    if depth >= 8:
        return values.astype(np.uint8)
    max_in = (1 << depth) - 1
    return ((values.astype(np.uint16) * 255 + max_in // 2) // max_in).astype(np.uint8)


def decode_raster(
    raw: bytes,
    width: int,
    height: int,
    depth: int,
    ctype: int,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
) -> np.ndarray:
    """One non-interlaced filtered raster → (h, w, channels) uint8
    (the per-frame primitive APNG shares with the still decoder)."""
    channels = _CHANNELS[ctype]
    bits_px = depth * channels
    bpp, row_bytes = max(1, bits_px // 8), (width * bits_px + 7) // 8
    rows = _unfilter(raw, width, height, bpp, row_bytes)
    samples = _unpack_samples(rows, width, channels, depth)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette image missing PLTE")
        idx = samples[..., 0]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return _scale_to_8bit(samples, depth)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, channels) uint8; channels is 1 (gray),
    2 (gray+alpha), 3 (RGB), or 4 (RGBA). Palette images expand to
    RGB (or RGBA when a tRNS chunk is present)."""
    width = height = depth = ctype = interlace = None
    palette = None
    trns = None
    idat = []
    for chunk, body in _iter_chunks(data):
        if chunk == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if comp != 0 or filt != 0:
                raise ValueError("unknown PNG compression/filter method")
            if ctype not in _CHANNELS:
                raise ValueError(f"unknown PNG color type {ctype}")
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"bad PNG bit depth {depth}")
            if depth < 8 and ctype not in (0, 3):
                raise ValueError(f"depth {depth} invalid for color type {ctype}")
        elif chunk == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif chunk == b"tRNS":
            trns = body
        elif chunk == b"IDAT":
            idat.append(body)
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    channels = _CHANNELS[ctype]

    def geometry(w: int) -> tuple[int, int]:
        """(bpp for filtering, row bytes) at width w."""
        bits_px = depth * channels
        return max(1, bits_px // 8), (w * bits_px + 7) // 8

    if interlace == 0:
        bpp, row_bytes = geometry(width)
        rows = _unfilter(raw, width, height, bpp, row_bytes)
        samples = _unpack_samples(rows, width, channels, depth)
    elif interlace == 1:
        samples = np.zeros((height, width, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            bpp, row_bytes = geometry(pw)
            span = ph * (1 + row_bytes)
            rows = _unfilter(raw[pos : pos + span], pw, ph, bpp, row_bytes)
            pos += span
            sub = _unpack_samples(rows, pw, channels, depth)
            samples[y0::dy, x0::dx] = sub
    else:
        raise ValueError(f"unknown PNG interlace method {interlace}")

    if ctype == 3:
        if palette is None:
            raise ValueError("palette image missing PLTE")
        idx = samples[..., 0]
        if idx.max(initial=0) >= len(palette):
            raise ValueError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return _scale_to_8bit(samples, depth)


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w) or (h, w, {1,2,3,4}) uint8 → PNG bytes (8-bit, filter 0
    per row; Adam7 when interlace=True)."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, channels = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def filt0(img: np.ndarray) -> bytes:
        ph, pw = img.shape[:2]
        rows = img.reshape(ph, pw * channels)
        return b"".join(b"\x00" + rows[y].tobytes() for y in range(ph))

    if interlace:
        body = b"".join(
            filt0(pixels[y0::dy, x0::dx])
            for x0, y0, dx, dy in _ADAM7
            if pixels[y0::dy, x0::dx].size
        )
    else:
        body = filt0(pixels)

    def chunk(ctag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctag
            + payload
            + struct.pack(">I", zlib.crc32(ctag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(body, 6))
        + chunk(b"IEND", b"")
    )
