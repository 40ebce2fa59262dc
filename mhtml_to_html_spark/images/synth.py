"""Deterministic image synthesis + uncompressed codecs + invariants.

No Pillow in the environment, so the corpus uses formats numpy can
round-trip exactly: PPM (P6), BMP (24-bit uncompressed), and raw RGB.
"Lossy" is a seeded quantization so the PSNR>=40dB invariant of
BASELINE.json input_hint is exercised without a JPEG codec. phash is a
64-bit average hash over an 8x8 grayscale downsample.

All functions are pure numpy and safe inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import struct

import numpy as np

_WORDS = (
    "amber basalt cedar delta ember fjord garnet harbor iris juniper "
    "kelp lagoon marble nectar onyx prairie quartz reef sierra tundra "
    "umber violet willow xenon yarrow zephyr"
).split()


def synth_image(image_id: int, w: int = 32, h: int = 24) -> np.ndarray:
    """Seeded RGB image (h, w, 3) uint8 — deterministic per image_id."""
    rng = np.random.default_rng(42 + image_id)
    base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    # add smooth structure so quantization produces a realistic PSNR.
    # The wave is separable: sin varies along x only, cos along y only,
    # so evaluate each transcendental once per row/column and broadcast
    # — bit-identical to the old full-grid mgrid form ((120*sin)*cos on
    # the same doubles in the same order) at O(w+h) instead of O(w*h)
    # trig calls (this sits inside the timed corpus-synthesis units)
    sin_x = 120 * np.sin(np.arange(w) / 5 + image_id)
    cos_y = np.cos(np.arange(h) / 7)
    wave = (127 + sin_x[None, :] * cos_y[:, None]).astype(np.uint8)
    return ((base.astype(np.uint16) + wave[..., None]) // 2).astype(np.uint8)


def caption_for(image_id: int, n_words: int = 6) -> str:
    rng = np.random.default_rng(10_000 + image_id)
    picks = rng.integers(0, len(_WORDS), size=n_words)
    return " ".join(_WORDS[i] for i in picks) + f" #{image_id}"


# --- PPM (P6) ----------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval, single whitespace, raster
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            pos = data.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(data[start:pos])
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError("unsupported maxval")
    raster = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3).copy()


# --- BMP (24-bit, bottom-up, BGR) --------------------------------------------


def encode_bmp(pixels: np.ndarray, bpp: int = 24) -> bytes:
    """(h, w, 3) RGB → BMP. bpp 24 (BGR), 32 (BGRA, opaque alpha), or
    8 (palette built from the distinct colors; caps at 256)."""
    h, w = pixels.shape[:2]
    pixels = pixels.astype(np.uint8)
    if bpp == 24:
        row_size = (w * 3 + 3) & ~3
        image_size = row_size * h
        header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0
        )
        bgr = pixels[::-1, :, ::-1]  # bottom-up, BGR
        rows = np.zeros((h, row_size), dtype=np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        return header + info + rows.tobytes()
    if bpp == 32:
        image_size = w * 4 * h
        header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 32, 0, image_size, 2835, 2835, 0, 0
        )
        bgra = np.dstack(
            [pixels[..., ::-1], np.full((h, w), 255, np.uint8)]
        )[::-1]
        return header + info + bgra.tobytes()
    if bpp == 8:
        flat = pixels.reshape(-1, 3)
        colors, idx = np.unique(flat, axis=0, return_inverse=True)
        if len(colors) > 256:
            raise ValueError("8-bpp BMP needs <= 256 distinct colors")
        row_size = (w + 3) & ~3
        image_size = row_size * h
        offset = 54 + 4 * len(colors)
        header = struct.pack("<2sIHHI", b"BM", offset + image_size, 0, 0, offset)
        info = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 8, 0, image_size, 2835, 2835, len(colors), 0
        )
        table = np.zeros((len(colors), 4), np.uint8)
        table[:, :3] = colors[:, ::-1]  # BGRX entries
        rows = np.zeros((h, row_size), dtype=np.uint8)
        rows[:, :w] = idx.reshape(h, w)[::-1].astype(np.uint8)
        return header + info + table.tobytes() + rows.tobytes()
    raise ValueError(f"unsupported bpp {bpp}")


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP → (h, w, 3) RGB uint8: 24-bpp BGR, 32-bpp BGRA (alpha
    dropped — BMP alpha is rarely meaningful), and 8-bpp palette;
    bottom-up and top-down (negative height) rows."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    bisize = struct.unpack_from("<I", data, 14)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression not in (0, 3):  # BI_RGB / BI_BITFIELDS (default masks)
        raise ValueError(f"unsupported BMP compression {compression}")
    ah = abs(h)
    if bpp == 24:
        row_size = (w * 3 + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=row_size * ah, offset=offset)
        out = rows.reshape(ah, row_size)[:, : w * 3].reshape(ah, w, 3)[:, :, ::-1]
    elif bpp == 32:
        rows = np.frombuffer(data, dtype=np.uint8, count=w * 4 * ah, offset=offset)
        out = rows.reshape(ah, w, 4)[:, :, [2, 1, 0]]
    elif bpp == 8:
        n_colors = struct.unpack_from("<I", data, 46)[0] or 256
        table = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=14 + bisize
        ).reshape(-1, 4)
        row_size = (w + 3) & ~3
        rows = np.frombuffer(data, dtype=np.uint8, count=row_size * ah, offset=offset)
        idx = rows.reshape(ah, row_size)[:, :w]
        if idx.max(initial=0) >= n_colors:
            raise ValueError("BMP palette index out of range")
        out = table[idx][:, :, [2, 1, 0]]
    else:
        raise ValueError(f"unsupported bpp {bpp}")
    if h > 0:
        out = out[::-1]
    return out.copy()


# --- raw / lossy / dispatch ---------------------------------------------------


def quantize_lossy(pixels: np.ndarray, step: int = 4) -> np.ndarray:
    """Seeded quantization standing in for a lossy codec; PSNR stays
    above the 40dB gate for step<=4."""
    q = (pixels.astype(np.int32) // step) * step + step // 2
    return np.clip(q, 0, 255).astype(np.uint8)


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "ppm":
        return encode_ppm(pixels)
    if fmt == "bmp":
        return encode_bmp(pixels)
    if fmt == "raw":
        h, w = pixels.shape[:2]
        return struct.pack("<HH", w, h) + pixels.astype(np.uint8).tobytes()
    if fmt == "lossy":
        return encode_ppm(quantize_lossy(pixels))
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt in ("ppm", "lossy"):
        return decode_ppm(data)
    if fmt == "bmp":
        return decode_bmp(data)
    if fmt == "raw":
        w, h = struct.unpack_from("<HH", data, 0)
        return np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=4).reshape(h, w, 3).copy()
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10 * np.log10(255.0**2 / mse))


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 grayscale downsample, bit = above mean.
    Returned as signed int64 (Spark LongType / input_hint phash:int64).

    Vectorized: block sums via an exact integer 2-D prefix sum (one
    cumsum instead of 64 sliced .mean() calls — this function sits in
    the synth/decode hot path)."""
    gray3 = pixels.astype(np.int64).sum(axis=2)  # 3x grayscale, exact
    h, w = gray3.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    prefix = np.zeros((h + 1, w + 1), dtype=np.int64)
    prefix[1:, 1:] = gray3.cumsum(0).cumsum(1)
    block_sums = (
        prefix[ys[1:, None], xs[None, 1:]]
        - prefix[ys[:-1, None], xs[None, 1:]]
        - prefix[ys[1:, None], xs[None, :-1]]
        + prefix[ys[:-1, None], xs[None, :-1]]
    )
    counts = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    cells = block_sums / (counts * 3.0)
    bits = (cells > cells.mean()).flatten()
    value = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # two's-complement into int64
    if value >= 1 << 63:
        value -= 1 << 64
    return value


_DCT32 = None


def _dct32_basis():
    global _DCT32
    if _DCT32 is None:
        k = np.arange(32)[:, None]
        n = np.arange(32)[None, :]
        # orthonormal DCT-II: row 0 scaled by sqrt(1/32), rows 1+ by sqrt(2/32)
        basis = np.cos(np.pi * (2 * n + 1) * k / 64.0)
        basis[0] *= np.sqrt(1.0 / 32.0)
        basis[1:] *= np.sqrt(2.0 / 32.0)
        _DCT32 = basis
    return _DCT32


def phash_dct64(pixels: np.ndarray) -> int:
    """64-bit perceptual DCT hash (the classic pHash): area-mean
    downsample to 32x32 grayscale (exact integer prefix sums, same
    resampler as phash64), orthonormal 2-D DCT, keep the top-left 8x8
    low-frequency block, bit = coefficient strictly above the median of
    the 63 non-DC coefficients (strict > is the deterministic
    tie-break). More robust than the average hash to recompression,
    gamma and local edits; signed int64 like phash64."""
    gray3 = pixels.astype(np.int64).sum(axis=2)
    h, w = gray3.shape
    prefix = np.zeros((h + 1, w + 1), dtype=np.int64)
    prefix[1:, 1:] = gray3.cumsum(0).cumsum(1)
    ys = (np.arange(33) * h) // 32
    xs = (np.arange(33) * w) // 32
    block_sums = (
        prefix[ys[1:, None], xs[None, 1:]]
        - prefix[ys[:-1, None], xs[None, 1:]]
        - prefix[ys[1:, None], xs[None, :-1]]
        + prefix[ys[:-1, None], xs[None, :-1]]
    )
    counts = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    cells = np.divide(
        block_sums,
        counts * 3.0,
        out=np.zeros((32, 32)),
        where=counts > 0,
    )
    # images smaller than 32px in a dimension leave empty cells: fill
    # from the nearest earlier non-empty row/col (deterministic)
    if (counts == 0).any():
        filled = cells.copy()
        for y in range(32):
            for x in range(32):
                if counts[y, x] == 0:
                    yy, xx = y, x
                    while yy > 0 and counts[yy, x] == 0:
                        yy -= 1
                    while xx > 0 and counts[y, xx] == 0:
                        xx -= 1
                    filled[y, x] = cells[yy, x] if counts[yy, x] else cells[y, xx]
        cells = filled
    basis = _dct32_basis()
    coef = basis @ cells @ basis.T
    low = coef[:8, :8].flatten()
    med = float(np.median(low[1:]))
    bits = low > med
    bits[0] = coef[0, 0] > med  # DC participates with the same rule
    value = int.from_bytes(np.packbits(bits).tobytes(), "big")
    if value >= 1 << 63:
        value -= 1 << 64
    return value
