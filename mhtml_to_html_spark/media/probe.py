"""Header-only image metadata probe — format + dimensions from the
container header, no pixel decode.

Scale rationale: curation and admission at 100 TB often need only
(fmt, w, h) — size gates, aspect-ratio gates, icon/thumbnail
detection, dimension-bucketed partitioning. A pixel decode reads and
entropy-decodes every byte of every image; this probe reads tens of
bytes. `operators.multimodal.image_meta` runs it as the mapInPandas
kernel so a metadata-only pass over an image corpus is I/O-bound, not
CPU-bound.

WebP is probe-only: all three container layouts carry dimensions at
fixed positions —

- ``VP8 `` (lossy): 3-byte frame tag, 3-byte start code 9D 01 2A,
  then 14-bit width and height in two little-endian uint16s;
- ``VP8L`` (lossless): signature byte 0x2F, then width-1 and
  height-1 as consecutive 14-bit fields of a little-endian uint32;
- ``VP8X`` (extended): 24-bit little-endian canvas width-1 at payload
  offset 4 and height-1 at offset 7

— so a crawler can size-gate WebP payloads even though pixel decode
would need libwebp (the documented codec seam in
operators/multimodal.py).

Reference parity: the reference carries image parts opaquely and
never sizes them (lib/convert.js data-URI inlining); the probe exists
for the engine's image axis.
"""

from __future__ import annotations

import struct

# JPEG markers that carry frame dimensions (SOF0-15 minus DHT/JPG/DAC)
_JPEG_SOF = frozenset(
    (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
)


def _probe_jpeg(data: bytes) -> tuple[int, int] | None:
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue
        if pos + 2 > n:
            return None
        seglen = struct.unpack_from(">H", data, pos)[0]
        if seglen < 2:
            return None  # corrupt length would loop forever
        if marker in _JPEG_SOF:
            if pos + 7 > n:
                return None
            h, w = struct.unpack_from(">HH", data, pos + 3)
            return w, h
        pos += seglen
    return None


def _probe_ppm(data: bytes) -> tuple[int, int] | None:
    fields: list[bytes] = []
    pos = 2
    n = len(data)
    while len(fields) < 2:
        while pos < n and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                return None
            pos = nl + 1
            continue
        start = pos
        while pos < n and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            return None
        fields.append(data[start:pos])
    try:
        return int(fields[0]), int(fields[1])
    except ValueError:
        return None


def _probe_webp(data: bytes) -> tuple[int, int] | None:
    if len(data) < 30:
        return None
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        # payload at 20: frame tag(3) + start code 9D 01 2A + dims
        if data[23:26] != b"\x9d\x01\x2a":
            return None
        w, h = struct.unpack_from("<HH", data, 26)
        return (w & 0x3FFF), (h & 0x3FFF)
    if fourcc == b"VP8L":
        if data[20] != 0x2F:
            return None
        bits = struct.unpack_from("<I", data, 21)[0]
        return (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1
    if fourcc == b"VP8X":
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        return w, h
    return None


def probe_image(data: bytes) -> tuple[str, int, int] | None:
    """(fmt, width, height) from container headers alone, or None when
    the payload is not a recognized image container. Never decodes
    pixels; reads O(header) bytes (JPEG walks marker segments to the
    first SOF, skipping entropy-coded data by declared length)."""
    if len(data) < 4:
        return None
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) < 24 or data[12:16] != b"IHDR":
            return None
        w, h = struct.unpack_from(">II", data, 16)
        return "png", w, h
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) < 10:
            return None
        w, h = struct.unpack_from("<HH", data, 6)
        return "gif", w, h
    if data[:2] == b"\xff\xd8":
        dims = _probe_jpeg(data)
        return ("jpeg", dims[0], dims[1]) if dims else None
    if data[:2] == b"P6":
        dims = _probe_ppm(data)
        return ("ppm", dims[0], dims[1]) if dims else None
    if data[:2] == b"BM":
        if len(data) < 26:
            return None
        w, h = struct.unpack_from("<ii", data, 18)
        return "bmp", abs(w), abs(h)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        dims = _probe_webp(data)
        return ("webp", dims[0], dims[1]) if dims else None
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        dims = _probe_tiff(data)
        return ("tiff", dims[0], dims[1]) if dims else None
    if len(data) >= 12 and data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            dims = _probe_bmff_image(data)
            return ("avif", dims[0], dims[1]) if dims else None
        if brand in (b"heic", b"heix", b"mif1"):
            dims = _probe_bmff_image(data)
            return ("heic", dims[0], dims[1]) if dims else None
        return None  # other ISO-BMFF (mp4...) is not a still image
    if data[:4] == b"\x00\x00\x01\x00":
        dims = _probe_ico(data)
        return ("ico", dims[0], dims[1]) if dims else None
    # the synthetic raw format: <HH dims + exactly w*h*3 RGB bytes
    w, h = struct.unpack_from("<HH", data, 0)
    if w > 0 and h > 0 and len(data) == 4 + w * h * 3:
        return "raw", w, h
    return None


def build_webp_container(kind: str, w: int, h: int) -> bytes:
    """Minimal WebP container carrying only the dimension-bearing
    header for the given chunk kind ('VP8 ', 'VP8L', 'VP8X') — fixture
    builder for tests and oracle corpora. The payload past the header
    is zeros (not decodable); the probe never reads past the header,
    which is the point."""
    if kind == "VP8 ":
        payload = (
            b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h) + b"\x00" * 10
        )
    elif kind == "VP8L":
        bits = (w - 1) | ((h - 1) << 14)
        payload = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
    elif kind == "VP8X":
        payload = (
            b"\x00\x00\x00\x00"
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
        )
    else:
        raise ValueError(f"unknown WebP chunk kind {kind!r}")
    chunk = kind.encode("ascii") + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --- audio ------------------------------------------------------------------------

# MPEG audio Layer III bitrate tables (kbps; index 0 = free, 15 = bad)
_MP3_BITRATE_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATE_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _skip_id3v2(data: bytes) -> int:
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = (
        ((data[6] & 0x7F) << 21)
        | ((data[7] & 0x7F) << 14)
        | ((data[8] & 0x7F) << 7)
        | (data[9] & 0x7F)
    )
    return 10 + size


def _probe_mp3(data: bytes):
    """Walk MPEG-audio Layer III frame headers (after any ID3v2 tag):
    (channels, sample_rate, duration_ms) from header arithmetic alone.
    Bails to None unless the sync resolves to a valid Layer III frame
    chain covering most of the payload (so arbitrary bytes that happen
    to contain 0xFFEx are not misread as audio)."""
    pos = _skip_id3v2(data)
    n = len(data)
    frames = 0
    samples = 0
    rate = None
    channels = None
    while pos + 4 <= n:
        b0, b1, b2, b3 = data[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break
        version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
        layer = (b1 >> 1) & 0x03  # 1 = Layer III
        if version == 1 or layer != 1:
            break
        bitrate_idx = (b2 >> 4) & 0x0F
        rate_idx = (b2 >> 2) & 0x03
        if bitrate_idx in (0, 15) or rate_idx == 3:
            break
        table = _MP3_BITRATE_V1 if version == 3 else _MP3_BITRATE_V2
        bitrate = table[bitrate_idx] * 1000
        this_rate = _MP3_RATES[version][rate_idx]
        padding = (b2 >> 1) & 0x01
        this_channels = 1 if ((b3 >> 6) & 0x03) == 3 else 2
        per_frame = 1152 if version == 3 else 576
        frame_len = (per_frame // 8) * bitrate // this_rate + padding
        if frame_len <= 4:
            break
        if rate is None:
            rate, channels = this_rate, this_channels
        frames += 1
        samples += per_frame
        pos += frame_len
    if frames == 0 or rate is None:
        return None
    if pos < n - 128:  # allow a trailing ID3v1 tag, nothing more
        return None
    return channels, rate, samples * 1000 // rate


def _probe_wav(data: bytes):
    """RIFF/WAVE fmt + data chunk walk: (channels, sample_rate,
    duration_ms) — duration from the header's avg-bytes-per-second, so
    it is exact for PCM and compressed (ADPCM) payloads alike."""
    pos = 12
    n = len(data)
    channels = rate = byte_rate = None
    data_len = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and clen >= 16:
            channels = int.from_bytes(data[pos + 10 : pos + 12], "little")
            rate = int.from_bytes(data[pos + 12 : pos + 16], "little")
            byte_rate = int.from_bytes(data[pos + 16 : pos + 20], "little")
        elif cid == b"data":
            data_len = clen
        pos += 8 + clen + (clen & 1)
    if not channels or not rate or not byte_rate or data_len is None:
        return None
    return channels, rate, data_len * 1000 // byte_rate


def probe_audio(data: bytes) -> tuple[str, int, int, int] | None:
    """(fmt, channels, sample_rate, duration_ms) from container/frame
    headers alone — WAV (incl. compressed payloads, via the header's
    byte rate) and MPEG Layer III (frame-header walk, ID3v2-aware).
    None for unrecognized payloads; never decodes samples."""
    if len(data) < 12:
        return None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        got = _probe_wav(data)
        return ("wav", *got) if got else None
    start = _skip_id3v2(data)
    if (
        len(data) >= start + 4
        and data[start] == 0xFF
        and (data[start + 1] & 0xE0) == 0xE0
    ):
        got = _probe_mp3(data)
        return ("mp3", *got) if got else None
    return None


def build_mp3_frames(
    n_frames: int,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    channels: int = 2,
    id3: bool = False,
) -> bytes:
    """Valid MPEG1 Layer III frame-header chain with zeroed payloads —
    fixture builder (probe-only, like the WebP containers: decode
    stays behind the codec seam)."""
    try:
        bidx = _MP3_BITRATE_V1.index(bitrate_kbps)
    except ValueError:
        raise ValueError(f"unsupported bitrate {bitrate_kbps}")
    ridx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    mode = 0xC0 if channels == 1 else 0x00
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    header = bytes([0xFF, 0xFB, (bidx << 4) | (ridx << 2), mode])
    frame = header + b"\x00" * (frame_len - 4)
    out = b""
    if id3:
        tag_body = b"\x00" * 30
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
             (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
        ) + tag_body
    return out + frame * n_frames


def _probe_tiff(data: bytes) -> tuple[int, int] | None:
    """Baseline TIFF IFD0 walk: ImageWidth (256) / ImageLength (257)."""
    if data[:4] == b"II*\x00":
        endian = "<"
    elif data[:4] == b"MM\x00*":
        endian = ">"
    else:
        return None
    try:
        off = struct.unpack_from(endian + "I", data, 4)[0]
        count = struct.unpack_from(endian + "H", data, off)[0]
        w = h = None
        for i in range(count):
            tag, typ = struct.unpack_from(endian + "HH", data, off + 2 + 12 * i)
            vpos = off + 2 + 12 * i + 8
            if typ == 3:  # SHORT
                val = struct.unpack_from(endian + "H", data, vpos)[0]
            elif typ == 4:  # LONG
                val = struct.unpack_from(endian + "I", data, vpos)[0]
            else:
                continue
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
        return (w, h) if w and h else None
    except struct.error:
        return None


def _iter_bmff_boxes(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        size = int.from_bytes(data[pos : pos + 4], "big")
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            size = int.from_bytes(data[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def _probe_bmff_image(data: bytes) -> tuple[int, int] | None:
    """AVIF/HEIC: walk meta → iprp → ipco for the first ispe
    (image spatial extents) property."""

    def find(pos, end, path):
        for btype, body, bend in _iter_bmff_boxes(data, pos, end):
            if btype == path[0]:
                if len(path) == 1:
                    return body, bend
                # meta is a FullBox: 4 bytes version/flags before children
                skip = 4 if btype == b"meta" else 0
                return find(body + skip, bend, path[1:])
        return None

    got = find(0, len(data), [b"meta", b"iprp", b"ipco"])
    if got is None:
        return None
    for btype, body, _bend in _iter_bmff_boxes(data, got[0], got[1]):
        if btype == b"ispe":
            w = int.from_bytes(data[body + 4 : body + 8], "big")
            h = int.from_bytes(data[body + 8 : body + 12], "big")
            return (w, h) if w and h else None
    return None


def _probe_ico(data: bytes) -> tuple[int, int] | None:
    """ICO directory: dimensions of the LARGEST entry (0 means 256)."""
    count = int.from_bytes(data[4:6], "little")
    if count == 0 or len(data) < 6 + 16 * count:
        return None
    best = None
    for i in range(count):
        e = 6 + 16 * i
        w = data[e] or 256
        h = data[e + 1] or 256
        if best is None or w * h > best[0] * best[1]:
            best = (w, h)
    return best


def probe_video(data: bytes) -> tuple[str, int, int, int] | None:
    """(fmt, width, height, duration_ms) from container headers — MP4
    (ISO-BMFF: mvhd duration, tkhd track extents) and YUV4MPEG2 (frame
    count x frame rate). None otherwise; never decodes samples."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        dur_ms = None
        w = h = None
        for btype, body, bend in _iter_bmff_boxes(data, 0, len(data)):
            if btype != b"moov":
                continue
            for ctype, cbody, cend in _iter_bmff_boxes(data, body, bend):
                if ctype == b"mvhd":
                    ver = data[cbody]
                    if ver == 1:
                        scale = int.from_bytes(data[cbody + 20 : cbody + 24], "big")
                        dur = int.from_bytes(data[cbody + 24 : cbody + 32], "big")
                    else:
                        scale = int.from_bytes(data[cbody + 12 : cbody + 16], "big")
                        dur = int.from_bytes(data[cbody + 16 : cbody + 20], "big")
                    if scale:
                        dur_ms = dur * 1000 // scale
                elif ctype == b"trak":
                    for ttype, tbody, tend in _iter_bmff_boxes(data, cbody, cend):
                        if ttype == b"tkhd":
                            ver = data[tbody]
                            base = tbody + (96 if ver == 1 else 84)
                            tw = int.from_bytes(data[base - 8 : base - 4], "big") >> 16
                            th = int.from_bytes(data[base - 4 : base], "big") >> 16
                            if tw and th:
                                w, h = tw, th
        if dur_ms is None and w is None:
            return None
        return ("mp4", w or 0, h or 0, dur_ms or 0)
    if data[:9] == b"YUV4MPEG2":
        nl = data.find(b"\n")
        if nl < 0:
            return None
        w = h = None
        fps_num, fps_den = 25, 1
        for token in data[9:nl].decode("ascii", "replace").split():
            if token.startswith("W"):
                w = int(token[1:])
            elif token.startswith("H"):
                h = int(token[1:])
            elif token.startswith("F"):
                num, den = token[1:].split(":")
                fps_num, fps_den = int(num), int(den)
        if not w or not h:
            return None
        n_frames = data.count(b"FRAME", nl)
        return ("y4m", w, h, n_frames * 1000 * fps_den // max(1, fps_num))
    return None


def _bmff_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_avif_header(w: int, h: int, brand: bytes = b"avif") -> bytes:
    """Minimal AVIF/HEIC header chain (ftyp + meta/iprp/ipco/ispe) —
    probe-only fixture; no coded image item."""
    ispe = _bmff_box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))
    meta = _bmff_box(
        b"meta", b"\x00\x00\x00\x00" + _bmff_box(b"iprp", _bmff_box(b"ipco", ispe))
    )
    return _bmff_box(b"ftyp", brand + b"\x00\x00\x00\x00" + brand + b"mif1") + meta


def build_mp4_header(
    w: int, h: int, duration_ms: int, timescale: int = 1000, version: int = 0
) -> bytes:
    """Minimal MP4 moov header (mvhd + one trak/tkhd) — probe-only
    fixture; no media data."""
    dur = duration_ms * timescale // 1000
    if version == 1:
        mvhd = _bmff_box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16 + struct.pack(">IQ", timescale, dur)
            + b"\x00" * 80,
        )
        tkhd = _bmff_box(
            b"tkhd",
            b"\x01\x00\x00\x00" + b"\x00" * 84 + struct.pack(">II", w << 16, h << 16),
        )
    else:
        mvhd = _bmff_box(
            b"mvhd",
            b"\x00\x00\x00\x00" + b"\x00" * 8 + struct.pack(">II", timescale, dur)
            + b"\x00" * 80,
        )
        tkhd = _bmff_box(
            b"tkhd",
            b"\x00\x00\x00\x00" + b"\x00" * 72 + struct.pack(">II", w << 16, h << 16),
        )
    return _bmff_box(b"ftyp", b"isom\x00\x00\x00\x00isom") + _bmff_box(
        b"moov", mvhd + _bmff_box(b"trak", tkhd)
    )


def _gif_animation(data: bytes):
    """Walk GIF blocks without LZW decode: (n_frames, duration_ms).
    Sub-blocks skip by their length bytes, so cost is O(blocks)."""
    if len(data) < 13:
        return None
    flags = data[10]
    pos = 13 + (3 * (2 << (flags & 0x07)) if flags & 0x80 else 0)
    n = len(data)
    frames = 0
    duration = 0
    pending_delay = 0
    try:
        while pos < n:
            b = data[pos]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension
                label = data[pos + 1]
                pos += 2
                if label == 0xF9 and data[pos] >= 4:
                    pending_delay = int.from_bytes(data[pos + 2 : pos + 4], "little") * 10
                while data[pos]:  # sub-blocks
                    pos += 1 + data[pos]
                pos += 1
            elif b == 0x2C:  # image descriptor
                frames += 1
                duration += pending_delay
                pending_delay = 0
                lflags = data[pos + 9]
                pos += 10 + (3 * (2 << (lflags & 0x07)) if lflags & 0x80 else 0)
                pos += 1  # LZW min code size
                while data[pos]:
                    pos += 1 + data[pos]
                pos += 1
            else:
                return None  # malformed block stream
    except IndexError:
        return None
    return (frames, duration) if frames else None


def probe_animation(data: bytes) -> tuple[int, int] | None:
    """(n_frames, duration_ms) for animated containers — GIF (block
    walk, no LZW decode), APNG (acTL + fcTL delays), animated WebP
    (ANMF chunk walk) — or None for still/unknown payloads."""
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_animation(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        n_frames = None
        duration = 0
        pos = 8
        n = len(data)
        while pos + 8 <= n:
            clen = int.from_bytes(data[pos : pos + 4], "big")
            ctype = data[pos + 4 : pos + 8]
            body = pos + 8
            if ctype == b"acTL":
                n_frames = int.from_bytes(data[body : body + 4], "big")
            elif ctype == b"fcTL":
                dnum = int.from_bytes(data[body + 20 : body + 22], "big")
                dden = int.from_bytes(data[body + 22 : body + 24], "big") or 100
                duration += dnum * 1000 // dden
            elif ctype == b"IEND":
                break
            pos = body + clen + 4
        return (n_frames, duration) if n_frames else None
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and data[12:16] == b"VP8X":
        frames = 0
        duration = 0
        pos = 12
        n = len(data)
        while pos + 8 <= n:
            fourcc = data[pos : pos + 4]
            clen = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body = pos + 8
            if fourcc == b"ANMF" and clen >= 16:
                frames += 1
                # frame duration: 24-bit LE at ANMF payload offset 12
                duration += int.from_bytes(data[body + 12 : body + 15], "little")
            pos = body + clen + (clen & 1)
        return (frames, duration) if frames else None
    return None
