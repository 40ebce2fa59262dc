"""Baseline JPEG codec — pure Python + numpy, no Pillow/libjpeg.

Implements ITU-T T.81 baseline sequential DCT with Huffman coding:

- decoder: SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/EOI marker parse, generic
  DHT-built Huffman tables (not assumed to be the Annex K defaults),
  0xFF00 byte unstuffing, restart-marker resync, dequantize + inverse
  zigzag + orthonormal-basis IDCT, nearest-neighbour chroma upsampling
  for any (h, v) sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0),
  JFIF full-range YCbCr -> RGB (ITU-T T.871), single-component
  grayscale;
- encoder: quality-scaled Annex K quantization tables (the libjpeg
  scaling law), Annex K Huffman tables, 4:4:4 or 4:2:0, optional
  restart intervals — used by tests and the synthetic corpus to build
  real payloads. Decoder tests do not trust the encoder: they include
  a hand-assembled DC-only stream with known output.

JPEG is lossy, so there is no bit round-trip; correctness is pinned by
hand vectors plus PSNR gates on encode->decode.

Reference parity: the reference carries image parts opaquely (data
URIs); pixel decode exists for the engine's image axis (phash,
caption admission, media features).
"""

from __future__ import annotations

import struct

import numpy as np

# --- shared tables --------------------------------------------------------------

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int32,
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: dct = A @ x @ A.T, idct = A.T @ X @ A
_A = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _A[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


# --- Huffman ---------------------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]):
    """(bits[1..16], values) → list of (code, length, value) canonically."""
    out = []
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((code, length, values[vi]))
            code += 1
            vi += 1
        code <<= 1
    return out


# LUT Huffman decode (the libjpeg technique): JPEG codes are at most
# 16 bits, so a 2^16-entry table keyed by the next 16 bits of the
# stream yields (value, code length) in one lookup. Tables are cached
# per (bits, values) signature — in a corpus virtually every file
# shares the Annex K tables, so the build cost amortizes to zero.
_LUT_CACHE: dict[tuple, tuple[bytes, bytes]] = {}


def _huff_lut(bits: list[int], values: list[int]) -> tuple[bytes, bytes]:
    key = (tuple(bits), tuple(values))
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        return cached
    val = bytearray(1 << 16)
    length = bytearray(1 << 16)  # 0 = invalid prefix
    code = 0
    vi = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            start = code << (16 - ln)
            span = 1 << (16 - ln)
            val[start : start + span] = bytes([values[vi]]) * span
            length[start : start + span] = bytes([ln]) * span
            code += 1
            vi += 1
        code <<= 1
    out = (bytes(val), bytes(length))
    _LUT_CACHE[key] = out
    return out


def _split_scan(data: bytes, pos: int) -> list[bytes]:
    """Entropy-coded data starting at pos → restart segments with the
    0xFF00 byte stuffing removed; stops at the first real marker."""
    segments = []
    cur = bytearray()
    i = pos
    n = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j < 0:
            cur += data[i:]
            break
        cur += data[i:j]
        nxt = data[j + 1] if j + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i = j + 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i = j + 2
        else:
            break  # terminating marker (EOI or next segment)
    segments.append(bytes(cur))
    return segments


# --- decoder ---------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (h, w, 3) RGB uint8 (or (h, w, 1) gray)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[bytes, bytes]] = {}
    frame = None  # (h, w, components[(cid, hs, vs, tq)])
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                off += 1
                if pq == 0:
                    tbl = np.frombuffer(body, dtype=np.uint8, count=64, offset=off)
                    off += 64
                else:
                    tbl = np.frombuffer(body, dtype=">u2", count=64, offset=off)
                    off += 128
                qtables[tq] = tbl.astype(np.int32)[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                values = list(body[off + 17 : off + 17 + n])
                htables[(tc, th)] = _huff_lut(bits, values)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-decodable)
            _prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for i in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"non-baseline JPEG (SOF marker 0xFF{marker:02X})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tables = {}
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_tables[cs] = (tt >> 4, tt & 0x0F)
            return _decode_scan(
                data, pos, frame, scan_tables, qtables, htables, restart_interval
            )
    raise ValueError("JPEG carries no scan")


def _decode_scan(data, pos, frame, scan_tables, qtables, htables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2x2 unsupported")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    segments = _split_scan(data, pos)
    n_comp = len(comps)
    # per-component decode products: zigzag coefficient rows + block origins
    zz_rows: list[list[list[int]]] = [[] for _ in comps]
    origins: list[list[tuple[int, int]]] = [[] for _ in comps]
    luts = [
        (htables[(0, scan_tables[cid][0])], htables[(1, scan_tables[cid][1])])
        for cid, _hs, _vs, _tq in comps
    ]

    def windows(seg: bytes) -> list[int]:
        """48-bit big-endian window starting at every byte offset —
        one numpy pass, then O(1) plain-int reads in the hot loop
        (a 16-bit peek or a <=16-bit receive at bit offset p lives
        entirely inside windows[p >> 3])."""
        arr = np.frombuffer(seg + b"\x00" * 8, dtype=np.uint8).astype(np.uint64)
        view = np.lib.stride_tricks.sliding_window_view(arr, 6)[: len(seg) + 3]
        weights = (1 << (np.arange(5, -1, -1, dtype=np.uint64) * 8)).astype(np.uint64)
        return (view * weights).sum(axis=1).tolist()

    # hot loop: locals only, precomputed bit windows
    seg_idx = 0
    w48 = windows(segments[0])
    nbits = len(segments[0]) * 8
    bitpos = 0
    preds = [0] * n_comp
    mcu_in_seg = 0

    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_seg == restart_interval:
                if bitpos > nbits:
                    raise ValueError("JPEG restart segment overran")
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                w48 = windows(segments[seg_idx])
                nbits = len(segments[seg_idx]) * 8
                bitpos = 0
                preds = [0] * n_comp
                mcu_in_seg = 0
            mcu_in_seg += 1
            for ci in range(n_comp):
                (dc_val, dc_len), (ac_val, ac_len) = luts[ci]
                _cid, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = [0] * 64
                        v16 = (w48[bitpos >> 3] >> (32 - (bitpos & 7))) & 0xFFFF
                        ln = dc_len[v16]
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        size = dc_val[v16]
                        bitpos += ln
                        if size:
                            mag = (
                                w48[bitpos >> 3] >> (48 - (bitpos & 7) - size)
                            ) & ((1 << size) - 1)
                            bitpos += size
                            preds[ci] += (
                                mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
                            )
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            v16 = (w48[bitpos >> 3] >> (32 - (bitpos & 7))) & 0xFFFF
                            ln = ac_len[v16]
                            if ln == 0:
                                raise ValueError("invalid JPEG Huffman code")
                            rs = ac_val[v16]
                            bitpos += ln
                            size = rs & 0x0F
                            if size == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC run past block end")
                            mag = (
                                w48[bitpos >> 3] >> (48 - (bitpos & 7) - size)
                            ) & ((1 << size) - 1)
                            bitpos += size
                            zz[k] = (
                                mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
                            )
                            k += 1
                        zz_rows[ci].append(zz)
                        origins[ci].append(((my * vs + by) * 8, (mx * hs + bx) * 8))
    if bitpos > nbits:
        raise ValueError("JPEG scan truncated")

    # batched dequantize + IDCT per component (one einsum instead of
    # two 8x8 matmuls per block)
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        plane = np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64)
        coefs = np.asarray(zz_rows[ci], dtype=np.int64)[:, _UNZIGZAG].reshape(-1, 8, 8)
        blocks = np.einsum(
            "ij,njk,kl->nil", _A.T, coefs * qtables[tq][None, :, :], _A
        ) + 128.0
        for (y0, x0), block in zip(origins[ci], blocks):
            plane[y0 : y0 + 8, x0 : x0 + 8] = block
        planes.append(plane)

    # upsample to full resolution and crop
    full = []
    for (cid, hs, vs, tq), plane in zip(comps, planes):
        up = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        full.append(up[:h, :w])
    out = np.stack(full, axis=-1)
    out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    if out.shape[-1] == 3:
        return _ycbcr_to_rgb(out)
    return out


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


# --- encoder ---------------------------------------------------------------------


class _BitWriter:
    __slots__ = ("out", "acc", "bits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | code
        self.bits += length
        while self.bits >= 8:
            byte = (self.acc >> (self.bits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.bits -= 8
        self.acc &= (1 << self.bits) - 1

    def flush(self):
        if self.bits:
            pad = 8 - self.bits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.bits = 0


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (size, size-bit code) per T.81 F.1.2.1.1."""
    if v == 0:
        return 0, 0
    size = abs(v).bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    quant: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    coef = _A @ (block - 128.0) @ _A.T
    q = np.rint(coef / quant).astype(np.int32)
    zz = q.reshape(-1)[_ZIGZAG]
    size, code = _magnitude(int(zz[0]) - pred)
    hc, hl = dc_codes[size]
    writer.write(hc, hl)
    if size:
        writer.write(code, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_codes[0xF0]  # ZRL
            writer.write(hc, hl)
            run -= 16
        size, code = _magnitude(v)
        hc, hl = ac_codes[(run << 4) | size]
        writer.write(hc, hl)
        writer.write(code, size)
        run = 0
    if last_nz < 63:
        hc, hl = ac_codes[0x00]  # EOB
        writer.write(hc, hl)
    return int(zz[0])


def _code_map(table: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    return {val: (code, length) for code, length, val in _canonical_codes(*table)}


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = plane.shape
    ph = -(-h // bh) * bh
    pw = -(-w // bw) * bw
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = True,
    restart_interval: int = 0,
    app1: bytes | None = None,
) -> bytes:
    """(h, w, 3) RGB or (h, w)/(h, w, 1) gray uint8 → baseline JFIF bytes.

    subsample=True writes 4:2:0 (2x2 luma blocks per MCU), else 4:4:4.
    restart_interval > 0 writes a DRI segment and RSTn markers every
    that many MCUs (exercises the decoder's resync path).
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2 or pixels.shape[-1] == 1
    if pixels.ndim == 3 and pixels.shape[-1] == 1:
        pixels = pixels[..., 0]
    h, w = pixels.shape[:2]
    ql = _scaled_quant(_Q_LUMA, quality)
    qc = _scaled_quant(_Q_CHROMA, quality)

    if gray:
        planes = [pixels.astype(np.float64)]
        samp = [(1, 1)]
        quants = [ql]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y = ycc[..., 0]
        if subsample:
            cpad = _pad_to(ycc[..., 1], 2, 2), _pad_to(ycc[..., 2], 2, 2)
            cb = cpad[0].reshape(-1, 2, cpad[0].shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cpad[1].reshape(-1, 2, cpad[1].shape[1] // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            cb, cr = ycc[..., 1], ycc[..., 2]
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        quants = [ql, qc, qc]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    padded = [
        _pad_to(p, mcus_y * vs * 8, mcus_x * hs * 8)[: mcus_y * vs * 8, : mcus_x * hs * 8]
        for p, (hs, vs) in zip(planes, samp)
    ]

    dc_maps = [_code_map(_HUFF_DC_LUMA)] + [_code_map(_HUFF_DC_CHROMA)] * (len(planes) - 1)
    ac_maps = [_code_map(_HUFF_AC_LUMA)] + [_code_map(_HUFF_AC_CHROMA)] * (len(planes) - 1)

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst_idx = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, ((hs, vs), plane) in enumerate(zip(samp, padded)):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        preds[ci] = _encode_block(
                            writer,
                            plane[y0 : y0 + 8, x0 : x0 + 8],
                            quants[ci],
                            preds[ci],
                            dc_maps[ci],
                            ac_maps[ci],
                        )
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    if app1 is not None:
        out += app1  # a complete APP1 segment (e.g. exif.build_exif_app1)
    out += seg(0xDB, b"\x00" + ql.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    if not gray:
        out += seg(0xDB, b"\x01" + qc.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hs, vs = samp[i]
        sof += struct.pack("BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, table) -> bytes:
        bits, values = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values))

    out += dht(0, 0, _HUFF_DC_LUMA) + dht(1, 0, _HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, _HUFF_DC_CHROMA) + dht(1, 1, _HUFF_AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
