"""Baseline TIFF decoder — pure Python + numpy.

Decodes the still-photo baseline subset: uncompressed (tag 259 = 1)
and PackBits (= 32773) strips, 8-bit grayscale / RGB / RGBA (extra
samples), palette-color (photometric 3), WhiteIsZero inversion
(photometric 0), both endiannesses, strip assembly via
StripOffsets/StripByteCounts/RowsPerStrip. LZW/JPEG-compressed TIFFs
raise a clear error (the probe in media/probe.py still sizes them).

Encoder writes uncompressed or PackBits strips for fixtures.

Reference parity: the reference carries image parts opaquely; TIFF
decode exists for the engine's image axis.
"""

from __future__ import annotations

import struct

import numpy as np


def _read_ifd_entries(data: bytes, endian: str):
    off = struct.unpack_from(endian + "I", data, 4)[0]
    count = struct.unpack_from(endian + "H", data, off)[0]
    tags: dict[int, list[int]] = {}
    for i in range(count):
        tag, typ, n = struct.unpack_from(endian + "HHI", data, off + 2 + 12 * i)
        vpos = off + 2 + 12 * i + 8
        size = {1: 1, 3: 2, 4: 4}.get(typ)
        if size is None:
            continue
        if size * n > 4:
            vpos = struct.unpack_from(endian + "I", data, vpos)[0]
        fmt = {1: "B", 3: "H", 4: "I"}[typ]
        tags[tag] = list(struct.unpack_from(endian + str(n) + fmt, data, vpos))
    return tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """PackBits (TIFF section 9): n in [0,127] → copy n+1 literal
    bytes; n in [-127,-1] → repeat next byte 1-n times; -128 no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i : i + b + 1]
            i += b + 1
        elif b > 128:
            out += data[i : i + 1] * (257 - b)
            i += 1
    if len(out) < expected:
        raise ValueError("truncated PackBits strip")
    return bytes(out[:expected])


def decode_tiff(data: bytes) -> np.ndarray:
    """Baseline TIFF bytes → (h, w, channels) uint8."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    tags = _read_ifd_entries(data, endian)
    try:
        w = tags[256][0]
        h = tags[257][0]
        offsets = tags[273]
        counts = tags[279]
    except KeyError as exc:
        raise ValueError(f"TIFF missing required tag {exc}")
    compression = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    spp = tags.get(277, [1])[0]
    bits = tags.get(258, [8] * spp)
    rows_per_strip = tags.get(278, [h])[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depth {bits}")
    if compression not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {compression} (needs libtiff)")

    raster = bytearray()
    expected_total = w * h * spp
    for i, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = data[off : off + cnt]
        if len(strip) != cnt:
            raise ValueError("truncated TIFF strip")
        rows = min(rows_per_strip, h - i * rows_per_strip)
        if compression == 32773:
            raster += _unpackbits(strip, w * rows * spp)
        else:
            raster += strip
    if len(raster) < expected_total:
        raise ValueError("TIFF raster short of width*height")
    px = np.frombuffer(bytes(raster), np.uint8, count=expected_total).reshape(
        h, w, spp
    )
    if photometric == 3:  # palette-color: ColorMap is 16-bit per channel
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        table = (np.array(cmap, np.uint32).reshape(3, n).T // 257).astype(np.uint8)
        idx = px[..., 0]
        if idx.max(initial=0) >= n:
            raise ValueError("TIFF palette index out of range")
        return table[idx].copy()
    if photometric == 0:  # WhiteIsZero
        px = 255 - px
    return px.copy()


def encode_tiff(pixels: np.ndarray, packbits: bool = False) -> bytes:
    """(h, w) gray or (h, w, 3/4) uint8 → little-endian baseline TIFF
    (single strip; PackBits when requested) — fixture builder."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        pixels = pixels[..., None]
    h, w, spp = pixels.shape
    if spp == 2:
        # 2-sample inline BitsPerSample would need two u16s in the
        # value slot, which the writer below does not emit
        raise ValueError("encode_tiff supports 1, 3, or 4 samples per pixel")
    raw = pixels.tobytes()
    if packbits:
        # row-aligned PackBits: literal runs capped at 128 bytes (valid,
        # if not maximally compressed)
        out = bytearray()
        row_bytes = w * spp
        for y in range(h):
            row = raw[y * row_bytes : (y + 1) * row_bytes]
            for i in range(0, len(row), 128):
                lit = row[i : i + 128]
                out += bytes([len(lit) - 1]) + lit
        strip = bytes(out)
        compression = 32773
    else:
        strip = raw
        compression = 1

    entries = []  # (tag, type, count, value)
    photometric = 1 if spp == 1 else 2
    entries.append((256, 4, 1, w))
    entries.append((257, 4, 1, h))
    entries.append((259, 3, 1, compression))
    entries.append((262, 3, 1, photometric))
    entries.append((277, 3, 1, spp))
    entries.append((278, 4, 1, h))
    entries.append((279, 4, 1, len(strip)))
    bits_off_needed = spp > 2

    header = b"II*\x00" + struct.pack("<I", 8)
    n_entries = len(entries) + 2  # + BitsPerSample + StripOffsets
    ifd_size = 2 + 12 * n_entries + 4
    extra_off = 8 + ifd_size
    extra = b""
    if bits_off_needed:
        bits_value = extra_off
        extra += struct.pack("<%dH" % spp, *([8] * spp))
    else:
        bits_value = None
    strip_off = extra_off + len(extra)

    all_entries = entries + [
        (258, 3, spp, bits_value if bits_off_needed else 8),
        (273, 4, 1, strip_off),
    ]
    all_entries.sort(key=lambda e: e[0])
    body = struct.pack("<H", n_entries)
    for tag, typ, cnt, val in all_entries:
        if typ == 3 and cnt == 1:
            packed = struct.pack("<HH", val, 0)
        elif typ == 3 and cnt <= 2:
            packed = struct.pack("<I", val)  # offset already
        else:
            packed = struct.pack("<I", val)
        body += struct.pack("<HHI", tag, typ, cnt) + packed
    body += struct.pack("<I", 0)
    return header + body + extra + strip
