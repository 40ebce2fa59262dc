"""EXIF metadata for JPEG payloads — pure stdlib struct + numpy.

Parses the APP1 "Exif" segment's TIFF structure (both byte orders,
IFD0 + the Exif sub-IFD) for the fields a crawl pipeline actually
uses: orientation, camera make/model, capture timestamp, declared
pixel dimensions. ``apply_orientation`` maps the 8 TIFF orientation
codes onto numpy flips/rotations so downstream pixel hashes (phash
near-dup) see the DISPLAYED image — rotated duplicates must collide.

The reference inlines JPEG parts without touching EXIF; this exists
for the engine's image axis, where orientation-normalized pixels are
a correctness matter for dedup.
"""

from __future__ import annotations

import struct

import numpy as np

# tag -> output name, for IFD0 and the Exif sub-IFD
_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",
    0x0132: "datetime",
}
_EXIF_TAGS = {
    0x9003: "datetime_original",
    0xA002: "pixel_x_dimension",
    0xA003: "pixel_y_dimension",
}
_EXIF_IFD_POINTER = 0x8769

# TIFF types: (size in bytes, struct code or None for ASCII/raw)
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _find_app1(data: bytes) -> bytes | None:
    """Return the Exif APP1 payload (after 'Exif\\0\\0') or None."""
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # scan starts: no more headers
            return None
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return body[6:]
        pos += 2 + seglen
    return None


def _read_ifd(tiff: bytes, offset: int, endian: str, wanted: dict) -> tuple[dict, int]:
    """Parse one IFD → ({name: value}, exif-sub-IFD offset or 0)."""
    out: dict = {}
    sub = 0
    if offset + 2 > len(tiff):
        return out, sub
    n = struct.unpack_from(endian + "H", tiff, offset)[0]
    for i in range(n):
        base = offset + 2 + 12 * i
        if base + 12 > len(tiff):
            break
        tag, typ, count = struct.unpack_from(endian + "HHI", tiff, base)
        size = _TYPE_SIZE.get(typ)
        if size is None:
            continue
        total = size * count
        if total <= 4:
            voff = base + 8
        else:
            voff = struct.unpack_from(endian + "I", tiff, base + 8)[0]
        if voff + total > len(tiff):
            continue
        if tag == _EXIF_IFD_POINTER and typ == 4:
            sub = struct.unpack_from(endian + "I", tiff, voff)[0]
            continue
        name = wanted.get(tag)
        if name is None:
            continue
        if typ == 2:  # ASCII, NUL-terminated
            out[name] = tiff[voff : voff + total].split(b"\x00")[0].decode(
                "ascii", "replace"
            )
        elif typ == 3:
            out[name] = struct.unpack_from(endian + "H", tiff, voff)[0]
        elif typ == 4:
            out[name] = struct.unpack_from(endian + "I", tiff, voff)[0]
    return out, sub


def parse_exif(data: bytes) -> dict:
    """JPEG bytes → EXIF fields ({} when no/invalid APP1). Keys:
    orientation (int 1-8), make, model, datetime, datetime_original,
    pixel_x_dimension, pixel_y_dimension — present only when set."""
    tiff = _find_app1(data)
    if tiff is None or len(tiff) < 8:
        return {}
    if tiff[:2] == b"II":
        endian = "<"
    elif tiff[:2] == b"MM":
        endian = ">"
    else:
        return {}
    if struct.unpack_from(endian + "H", tiff, 2)[0] != 42:
        return {}
    ifd0_off = struct.unpack_from(endian + "I", tiff, 4)[0]
    out, sub = _read_ifd(tiff, ifd0_off, endian, _IFD0_TAGS)
    if sub:
        more, _ = _read_ifd(tiff, sub, endian, _EXIF_TAGS)
        out.update(more)
    return out


def apply_orientation(pixels: np.ndarray, orientation: int) -> np.ndarray:
    """Map a TIFF orientation code (1-8) onto the stored pixels so the
    result is the image as DISPLAYED. Unknown codes pass through."""
    if orientation == 2:
        return pixels[:, ::-1]
    if orientation == 3:
        return pixels[::-1, ::-1]
    if orientation == 4:
        return pixels[::-1]
    if orientation == 5:  # transpose
        return pixels.transpose(1, 0, 2)
    if orientation == 6:  # rotate 90 clockwise
        return pixels.transpose(1, 0, 2)[:, ::-1]
    if orientation == 7:  # transverse
        return pixels.transpose(1, 0, 2)[::-1, ::-1]
    if orientation == 8:  # rotate 90 counter-clockwise
        return pixels.transpose(1, 0, 2)[::-1]
    return pixels


def build_exif_app1(
    orientation: int | None = None,
    make: str | None = None,
    model: str | None = None,
    datetime: str | None = None,
    little_endian: bool = True,
) -> bytes:
    """Minimal valid Exif APP1 segment (marker + length + payload) for
    the encoder and tests. Values that don't fit inline go to a value
    area after the IFD."""
    endian = "<" if little_endian else ">"
    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, value bytes)
    extra = bytearray()

    def add_short(tag: int, value: int):
        entries.append((tag, 3, 1, struct.pack(endian + "H", value) + b"\x00\x00"))

    def add_ascii(tag: int, value: str):
        raw = value.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    if make is not None:
        add_ascii(0x010F, make)
    if model is not None:
        add_ascii(0x0110, model)
    if orientation is not None:
        add_short(0x0112, orientation)
    if datetime is not None:
        add_ascii(0x0132, datetime)
    entries.sort(key=lambda e: e[0])  # TIFF requires ascending tag order

    ifd0_off = 8
    data_off = ifd0_off + 2 + 12 * len(entries) + 4
    body = bytearray()
    body += b"II" if little_endian else b"MM"
    body += struct.pack(endian + "HI", 42, ifd0_off)
    body += struct.pack(endian + "H", len(entries))
    for tag, typ, count, raw in entries:
        body += struct.pack(endian + "HHI", tag, typ, count)
        if len(raw) <= 4:
            body += raw.ljust(4, b"\x00")
        else:
            body += struct.pack(endian + "I", data_off + len(extra))
            extra += raw
    body += struct.pack(endian + "I", 0)  # no next IFD
    body += extra
    payload = b"Exif\x00\x00" + bytes(body)
    return struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
