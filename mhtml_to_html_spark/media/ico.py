"""ICO (favicon) codec — pure Python + numpy.

Decodes the LARGEST directory entry (the same selection rule as
media/probe.py): PNG-compressed entries route through the PNG
decoder; uncompressed DIB entries handle 32-bpp BGRA (alpha from the
channel) and 24-bpp BGR (alpha from the AND mask). Palettized DIB
entries (1/4/8-bpp) raise — modern favicons are PNG or 32-bpp, and a
clear error beats silently wrong colors.

The encoder writes PNG entries plus optional 32-bpp DIB entries for
fixtures. Reference parity: the reference inlines favicons as opaque
data URIs (lib/convert.js rel-icon handling); pixel decode exists for
the engine's image axis.
"""

from __future__ import annotations

import struct

import numpy as np

from .png import decode_png, encode_png

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _entries(data: bytes) -> list[tuple[int, int, int, int]]:
    """[(w, h, offset, size)] from the ICONDIR."""
    if data[:4] != b"\x00\x00\x01\x00":
        raise ValueError("not an ICO")
    count = int.from_bytes(data[4:6], "little")
    out = []
    for i in range(count):
        e = 6 + 16 * i
        w = data[e] or 256
        h = data[e + 1] or 256
        size, offset = struct.unpack_from("<II", data, e + 8)
        out.append((w, h, offset, size))
    return out


def decode_ico(data: bytes) -> np.ndarray:
    """ICO bytes → (h, w, 4) RGBA uint8 of the largest entry."""
    entries = _entries(data)
    if not entries:
        raise ValueError("empty ICO")
    w, h, offset, size = max(entries, key=lambda e: e[0] * e[1])
    body = data[offset : offset + size]
    if body[:8] == _PNG_MAGIC:
        px = decode_png(body)
        if px.shape[2] == 4:
            return px
        if px.shape[2] == 3:
            return np.dstack([px, np.full(px.shape[:2], 255, np.uint8)])
        gray = np.repeat(px[..., :1], 3, axis=2)
        alpha = px[..., 1:2] if px.shape[2] == 2 else np.full(px.shape[:2], 255, np.uint8)
        return np.dstack([gray, alpha])
    bisize, bw, bh2 = struct.unpack_from("<Iii", body, 0)
    bpp = struct.unpack_from("<H", body, 14)[0]
    compression = struct.unpack_from("<I", body, 16)[0]
    if compression != 0:
        raise ValueError(f"unsupported ICO DIB compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported ICO DIB bpp {bpp} (palettized favicon)")
    bh = bh2 // 2  # DIB height counts XOR + AND masks
    row = (bw * (bpp // 8) + 3) & ~3
    raster = np.frombuffer(body, np.uint8, count=row * bh, offset=bisize)
    raster = raster.reshape(bh, row)[::-1]  # bottom-up
    if bpp == 32:
        px = raster[:, : bw * 4].reshape(bh, bw, 4)
        return px[:, :, [2, 1, 0, 3]].copy()  # BGRA → RGBA
    rgb = raster[:, : bw * 3].reshape(bh, bw, 3)[:, :, ::-1]
    # AND mask: 1-bit rows padded to 32 bits, bottom-up; 1 = transparent
    mask_row = ((bw + 31) // 32) * 4
    mask_off = bisize + row * bh
    mask = np.frombuffer(body, np.uint8, count=mask_row * bh, offset=mask_off)
    bits = np.unpackbits(mask.reshape(bh, mask_row), axis=1)[:, :bw][::-1]
    alpha = np.where(bits == 1, 0, 255).astype(np.uint8)
    return np.dstack([rgb, alpha])


def encode_ico(images: list[np.ndarray], dib: bool = False) -> bytes:
    """RGB/RGBA uint8 arrays → ICO. PNG entries by default; dib=True
    writes 32-bpp BGRA DIB entries (with an all-opaque AND mask)."""
    blobs = []
    dims = []
    for px in images:
        px = np.asarray(px, dtype=np.uint8)
        h, w = px.shape[:2]
        if w > 256 or h > 256:
            raise ValueError("ICO entries cap at 256x256")
        dims.append((w, h))
        if not dib:
            blobs.append(encode_png(px))
            continue
        if px.ndim == 2 or px.shape[2] == 1:
            px = np.repeat(px.reshape(h, w, 1), 3, axis=2)
        if px.shape[2] == 3:
            px = np.dstack([px, np.full((h, w), 255, np.uint8)])
        bgra = px[:, :, [2, 1, 0, 3]][::-1]
        mask_row = ((w + 31) // 32) * 4
        header = struct.pack(
            "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, (w * 4 + mask_row) * h, 0, 0, 0, 0
        )
        blobs.append(header + bgra.tobytes() + b"\x00" * (mask_row * h))
    out = bytearray(b"\x00\x00\x01\x00" + struct.pack("<H", len(images)))
    offset = 6 + 16 * len(images)
    for (w, h), blob in zip(dims, blobs):
        out += bytes([w % 256, h % 256, 0, 0])
        out += struct.pack("<HHII", 1, 32, len(blob), offset)
        offset += len(blob)
    for blob in blobs:
        out += blob
    return bytes(out)
