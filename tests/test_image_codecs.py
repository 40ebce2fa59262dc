"""PNG / GIF / baseline-JPEG codecs (media/png.py, gif.py, jpeg.py).

Decoder correctness is pinned WITHOUT trusting the sibling encoder:
hand-assembled chunk/block/scan streams with spec-computed expected
pixels (PNG filters 1-4, Adam7; GIF LZW bit packing, transparency,
disposal; JPEG DC-only scans with hand-built Huffman tables). The
encoders are then pinned by encode->decode round-trips (bit-exact for
PNG/GIF, PSNR-gated for JPEG).

External vector: the ubiquitous 1x1 semi-transparent PNG that the
reference uses as its inline-image fixture
(/root/reference/test/document.test.js:10) decodes to a single
RGBA=(255,0,0,127) pixel.
"""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from mhtml_to_html_spark.media.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)
from mhtml_to_html_spark.images.synth import synth_image
from mhtml_to_html_spark.media.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)
from mhtml_to_html_spark.media.png import decode_png, encode_png


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


# --- PNG -----------------------------------------------------------------------


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(width, height, depth, ctype, raw, extra=b"", interlace=0) -> bytes:
    """Assemble a PNG from already-filtered raw scanline bytes."""
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


class TestPngHandVectors:
    def test_filter_sub(self):
        # RGB row [1,2,3, 10,20,30, 250,200,50]; Sub: recon[x]=raw[x]+recon[x-3]
        raw = b"\x01" + bytes([1, 2, 3, 10, 20, 30, 250, 200, 50])
        out = decode_png(_hand_png(3, 1, 8, 2, raw))
        assert out.tolist() == [[[1, 2, 3], [11, 22, 33], [(11 + 250) % 256, (22 + 200) % 256, 83]]]

    def test_filter_up(self):
        # row0 None [10,20,30]; row1 Up [5,250,7] -> [15, (20+250)%256, 37]
        raw = b"\x00" + bytes([10, 20, 30]) + b"\x02" + bytes([5, 250, 7])
        out = decode_png(_hand_png(1, 2, 8, 2, raw))
        assert out.tolist() == [[[10, 20, 30]], [[15, 14, 37]]]

    def test_filter_average(self):
        # gray width 3: row0 None [100, 110, 120];
        # row1 Average raw [10, 20, 30]:
        #   x0: 10 + (0 + 100)//2 = 60
        #   x1: 20 + (60 + 110)//2 = 105
        #   x2: 30 + (105 + 120)//2 = 142
        raw = b"\x00" + bytes([100, 110, 120]) + b"\x03" + bytes([10, 20, 30])
        out = decode_png(_hand_png(3, 2, 8, 0, raw))
        assert out[1, :, 0].tolist() == [60, 105, 142]

    def test_filter_paeth(self):
        # gray width 3: row0 None [50, 60, 70];
        # row1 Paeth raw [10, 20, 30]:
        #   x0: a=0,b=50,c=0 -> p=50, pa=50,pb=0 -> pred=b=50 -> 60
        #   x1: a=60,b=60,c=50 -> p=70, pa=10,pb=10,pc=20 -> pred=a=60 -> 80
        #   x2: a=80,b=70,c=60 -> p=90, pa=10,pb=20,pc=30 -> pred=a=80 -> 110
        raw = b"\x00" + bytes([50, 60, 70]) + b"\x04" + bytes([10, 20, 30])
        out = decode_png(_hand_png(3, 2, 8, 0, raw))
        assert out[1, :, 0].tolist() == [60, 80, 110]

    def test_palette_with_trns(self):
        plte = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 255, 0, 0, 0, 255]))
        trns = _png_chunk(b"tRNS", bytes([10, 200]))  # idx2 defaults to 255
        raw = b"\x00" + bytes([0, 1, 2])  # depth 8, one row of 3 indices
        out = decode_png(_hand_png(3, 1, 8, 3, raw, extra=plte + trns))
        assert out.tolist() == [[[255, 0, 0, 10], [0, 255, 0, 200], [0, 0, 255, 255]]]

    def test_gray_depth_1_2_4(self):
        # depth1, width 10: bits 1010101011 -> bytes 0b10101010, 0b11000000
        raw = b"\x00" + bytes([0b10101010, 0b11000000])
        out = decode_png(_hand_png(10, 1, 1, 0, raw))
        assert out[0, :, 0].tolist() == [255, 0] * 4 + [255, 255]
        # depth2, width 3: values 0,1,3 -> bits 00 01 11 xx -> 0b00011100
        raw = b"\x00" + bytes([0b00011100])
        out = decode_png(_hand_png(3, 1, 2, 0, raw))
        assert out[0, :, 0].tolist() == [0, 85, 255]
        # depth4, width 3: values 0, 8, 15 -> 0x08, 0xF0
        raw = b"\x00" + bytes([0x08, 0xF0])
        out = decode_png(_hand_png(3, 1, 4, 0, raw))
        assert out[0, :, 0].tolist() == [0, 136, 255]

    def test_gray_16bit_takes_high_byte(self):
        raw = b"\x00" + struct.pack(">HHH", 0x0000, 0x8040, 0xFFFF)
        out = decode_png(_hand_png(3, 1, 16, 0, raw))
        assert out[0, :, 0].tolist() == [0, 0x80, 0xFF]

    def test_adam7_hand_layout(self):
        # 2x2 gray: pass 1 -> (0,0); pass 6 -> (1,0); pass 7 -> (0,1),(1,1)
        raw = (
            b"\x00" + bytes([11])  # pass 1: 1x1
            + b"\x00" + bytes([22])  # pass 6: 1x1
            + b"\x00" + bytes([33, 44])  # pass 7: 2x1
        )
        out = decode_png(_hand_png(2, 2, 8, 0, raw, interlace=1))
        assert out[..., 0].tolist() == [[11, 22], [33, 44]]

    def test_reference_fixture_1x1(self):
        data = base64.b64decode(
            "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
            "AAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
        )
        out = decode_png(data)
        assert out.shape == (1, 1, 4)
        assert out.ravel().tolist() == [255, 0, 0, 127]

    def test_bad_crc_raises(self):
        good = encode_png(np.zeros((2, 2, 3), np.uint8))
        bad = bytearray(good)
        bad[-5] ^= 0xFF  # IEND CRC
        with pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(bad))

    def test_truncated_idat_raises(self):
        raw = b"\x00" + bytes([1, 2, 3])  # one row, but IHDR claims 2
        with pytest.raises(ValueError, match="shorter"):
            decode_png(_hand_png(1, 2, 8, 2, raw))


class TestPngRoundTrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("interlace", [False, True])
    def test_exact(self, channels, interlace):
        rng = np.random.default_rng(channels * 10 + interlace)
        for h, w in ((1, 1), (3, 5), (16, 16), (13, 7), (9, 33)):
            px = rng.integers(0, 256, size=(h, w, channels), dtype=np.uint8)
            out = decode_png(encode_png(px, interlace=interlace))
            assert out.shape == (h, w, channels)
            assert (out == px).all()

    def test_2d_input(self):
        px = np.arange(24, dtype=np.uint8).reshape(4, 6)
        out = decode_png(encode_png(px))
        assert (out[..., 0] == px).all()


# --- GIF -----------------------------------------------------------------------


def _pack_lsb(codes: list[tuple[int, int]]) -> bytes:
    """(code, width) list → LSB-first packed bytes (test-local; does
    not share code with the codec's writer)."""
    acc = bits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_wrap(w, h, palette: bytes, frames: list[bytes], extras: list[bytes] | None = None):
    """Assemble a GIF89a from raw (already sub-blocked) frame payloads."""
    depth = max(1, (len(palette) // 3).bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette
    for i, frame in enumerate(frames):
        if extras and extras[i]:
            out += extras[i]
        out += frame
    out.append(0x3B)
    return bytes(out)


def _gif_frame(left, top, w, h, min_code, lzw: bytes, interlace=False) -> bytes:
    out = bytearray(b"\x2c")
    out += struct.pack("<HHHHB", left, top, w, h, 0x40 if interlace else 0)
    out.append(min_code)
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


class TestGifHandVectors:
    def test_hand_packed_lzw_stream(self):
        # 2x2 indices [1, 1, 0, 2], min_code_size=2: clear=4, eoi=5,
        # width starts at 3. Reading 1,1 adds table entry #6; reading 0
        # adds #7, which fills the 3-bit space -> the NEXT codes (the
        # value 2 and EOI) are read at width 4.
        stream = _pack_lsb([(4, 3), (1, 3), (1, 3), (0, 3), (2, 4), (5, 4)])
        assert _lzw_decode(2, stream, 4) == bytes([1, 1, 0, 2])
        pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
        gif = _gif_wrap(2, 2, pal, [_gif_frame(0, 0, 2, 2, 2, stream)])
        frames, delays = decode_gif(gif)
        assert frames[0].tolist() == [
            [[0, 255, 0], [0, 255, 0]],
            [[255, 0, 0], [0, 0, 255]],
        ]

    def test_copy_code_quirk(self):
        # the code==len(table) case: CLEAR, 0, 6 where 6 == next code
        # decodes as prev + prev[0] = [0, 0]
        stream = _pack_lsb([(4, 3), (0, 3), (6, 3), (5, 3)])
        assert _lzw_decode(2, stream, 3) == bytes([0, 0, 0])

    def test_transparency_keeps_underlying_pixel(self):
        pal = bytes([10, 10, 10, 200, 200, 200, 0, 0, 0, 0, 0, 0])
        f1 = _lzw_encode(2, bytes([1, 1, 1, 1]))  # all light
        f2 = _lzw_encode(2, bytes([0, 2, 2, 2]))  # idx2 transparent
        gce = b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 2) + b"\x00"
        gif = _gif_wrap(
            2,
            2,
            pal,
            [_gif_frame(0, 0, 2, 2, 2, f1), _gif_frame(0, 0, 2, 2, 2, f2)],
            extras=[b"", gce],
        )
        frames, delays = decode_gif(gif)
        assert len(frames) == 2 and delays == [0, 50]
        # pixel 0 repainted dark; pixels 1-3 keep frame 1's light color
        assert frames[1].reshape(-1, 3).tolist() == [
            [10, 10, 10], [200, 200, 200], [200, 200, 200], [200, 200, 200],
        ]

    def test_disposal_restore_background(self):
        pal = bytes([1, 2, 3, 50, 60, 70, 0, 0, 0, 0, 0, 0])
        # frame 1 disposal=2 (restore bg idx0), frame 2 transparent everywhere
        gce1 = b"\x21\xf9\x04" + struct.pack("<BHB", (2 << 2), 0, 0) + b"\x00"
        gce2 = b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 0, 3) + b"\x00"
        f1 = _lzw_encode(2, bytes([1]))
        f2 = _lzw_encode(2, bytes([3]))
        gif = _gif_wrap(
            1,
            1,
            pal,
            [_gif_frame(0, 0, 1, 1, 2, f1), _gif_frame(0, 0, 1, 1, 2, f2)],
            extras=[gce1, gce2],
        )
        frames, _ = decode_gif(gif)
        assert frames[0].tolist() == [[[50, 60, 70]]]
        assert frames[1].tolist() == [[[1, 2, 3]]]  # bg restored, transparent keeps it

    def test_interlaced_rows(self):
        # 4x1 columns, interlaced: storage order is rows 0,2,1,3 -> pass order 0(8),2?
        # passes for h=4: p1 rows 0; p3 rows 2; p4 rows 1,3
        pal = bytes([0, 0, 0, 255, 255, 255, 7, 7, 7, 9, 9, 9])
        rows = bytes([0, 2, 1, 3])  # stored pass-sequential
        stream = _lzw_encode(2, rows)
        gif = _gif_wrap(1, 4, pal, [_gif_frame(0, 0, 1, 4, 2, stream, interlace=True)])
        frames, _ = decode_gif(gif)
        # display rows get palette indices 0,1,2,3 -> channel-0 values
        idx_back = frames[0][:, 0, 0]
        assert [int(v) for v in idx_back] == [0, 255, 7, 9]


class TestGifRoundTrip:
    def test_exact_and_animated(self):
        rng = np.random.default_rng(11)
        pal = rng.integers(0, 256, size=(31, 3), dtype=np.uint8)
        for il in (False, True):
            for h, w in ((1, 1), (5, 9), (16, 16), (33, 13)):
                img = pal[rng.integers(0, len(pal), size=(h, w))]
                frames, _ = decode_gif(encode_gif([img], interlace=il))
                assert len(frames) == 1 and (frames[0] == img).all()
        imgs = [pal[rng.integers(0, len(pal), size=(8, 10))] for _ in range(4)]
        frames, delays = decode_gif(encode_gif(imgs, delays_ms=[40, 50, 60, 70]))
        assert delays == [40, 50, 60, 70]
        for got, want in zip(frames, imgs):
            assert (got == want).all()

    def test_lzw_identity_through_table_reset(self):
        rng = np.random.default_rng(5)
        data = bytes(rng.integers(0, 8, size=120_000, dtype=np.uint8))
        assert _lzw_decode(3, _lzw_encode(3, data), len(data)) == data

    def test_not_a_gif(self):
        with pytest.raises(ValueError, match="not a GIF"):
            decode_gif(b"PNG89a" + b"\x00" * 20)


# --- JPEG ----------------------------------------------------------------------


def _jpeg_seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _hand_jpeg_gray(scan: bytes, quant_flat: int, w: int = 8, h: int = 8) -> bytes:
    """Minimal 1-component baseline JPEG: flat quant table, 1-bit DC
    table (code '0' -> size 0, code '10' -> size 2), 1-bit AC table
    (code '0' -> EOB)."""
    out = bytearray(b"\xff\xd8")
    out += _jpeg_seg(0xDB, b"\x00" + bytes([quant_flat] * 64))
    out += _jpeg_seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    dc_bits = [1, 1] + [0] * 14  # '0' -> values[0]=0, '10' -> values[1]=2
    out += _jpeg_seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes([0, 2]))
    ac_bits = [1] + [0] * 15  # '0' -> EOB
    out += _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
    out += _jpeg_seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


class TestJpegHandVectors:
    def test_dc_zero_block_is_flat_128(self):
        # scan bits: DC size 0 ('0') + EOB ('0') -> pad to 0b00111111
        out = decode_jpeg(_hand_jpeg_gray(bytes([0b00111111]), quant_flat=16))
        assert out.shape == (8, 8, 1)
        assert (out == 128).all()

    def test_dc_only_flat_level(self):
        # DC size 2 ('10') + magnitude '10' (EXTEND(2,2)=+2) + EOB '0':
        # bits 10 10 0 -> 0b10100111. DC coef = 2*16 = 32;
        # IDCT of DC-only: 32/8 = +4 -> flat 132.
        out = decode_jpeg(_hand_jpeg_gray(bytes([0b10100111]), quant_flat=16))
        assert (out == 132).all()

    def test_negative_dc(self):
        # magnitude '01' -> EXTEND(1,2) = 1 - 4 + 1 = -2 -> flat 124
        out = decode_jpeg(_hand_jpeg_gray(bytes([0b10010111]), quant_flat=16))
        assert (out == 124).all()

    def test_dimension_crop(self):
        # 5x3 declared size still decodes one padded block, cropped
        out = decode_jpeg(_hand_jpeg_gray(bytes([0b00111111]), 16, w=5, h=3))
        assert out.shape == (3, 5, 1)

    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n\x1a\n")

    def test_lossless_sof_rejected(self):
        bad = bytearray(encode_jpeg(np.zeros((8, 8, 3), np.uint8)))
        sof = bad.find(b"\xff\xc0")
        bad[sof + 1] = 0xC3  # lossless sequential: unsupported coding
        with pytest.raises(ValueError, match="unsupported JPEG coding"):
            decode_jpeg(bytes(bad))


class TestJpegRoundTrip:
    def _smooth(self, h=48, w=64):
        yy, xx = np.mgrid[0:h, 0:w]
        return np.stack(
            [xx * 255 // max(1, w - 1), yy * 255 // max(1, h - 1), (xx + yy) * 255 // (h + w - 2)],
            axis=-1,
        ).astype(np.uint8)

    def test_444_high_quality(self):
        img = self._smooth()
        out = decode_jpeg(encode_jpeg(img, quality=95, subsample=False))
        assert out.shape == img.shape
        assert psnr(img, out) >= 45

    def test_420_smooth(self):
        img = self._smooth()
        out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
        assert psnr(img, out) >= 38

    def test_noise_image_psnr_monotone_in_quality(self):
        from mhtml_to_html_spark.images.synth import synth_image

        img = synth_image(5, 32, 24)
        p = [
            psnr(img, decode_jpeg(encode_jpeg(img, quality=q, subsample=False)))
            for q in (50, 75, 95)
        ]
        assert p[0] < p[1] < p[2]
        assert p[2] >= 30

    def test_odd_sizes_and_gray(self):
        rng = np.random.default_rng(2)
        for h, w in ((1, 1), (7, 9), (17, 13), (8, 24)):
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
            assert out.shape == (h, w, 3)
        gray = rng.integers(0, 256, size=(12, 10), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(gray, quality=92))
        assert out.shape == (12, 10, 1)
        assert psnr(gray, out[..., 0]) >= 25

    @pytest.mark.parametrize("interval", [1, 2, 3, 7])
    def test_restart_markers_do_not_change_pixels(self, interval):
        img = self._smooth(32, 48)
        for sub in (True, False):
            base = decode_jpeg(encode_jpeg(img, quality=88, subsample=sub))
            rst = decode_jpeg(
                encode_jpeg(img, quality=88, subsample=sub, restart_interval=interval)
            )
            assert (base == rst).all()

    def test_byte_stuffing_survives(self):
        # high-entropy content reliably produces 0xFF bytes in the scan
        rng = np.random.default_rng(99)
        img = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8)
        data = encode_jpeg(img, quality=99, subsample=False)
        out = decode_jpeg(data)
        assert out.shape == img.shape
        assert psnr(img, out) >= 25


# --- progressive JPEG (SOF2) -----------------------------------------------------


class TestJpegProgressiveHandVectors:
    def test_dc_first_plus_refine_known_pixels(self):
        """Hand-assembled two-scan progressive gray 8x8: DC-first at
        Al=1 (diff=3 -> coef 6) then a DC refinement bit (-> coef 7);
        flat quant 16 makes every pixel 128 + 7*16/8 = 142. The refine
        scan's only byte is 0xFF, so it also pins byte unstuffing."""
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
            + _jpeg_seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
            + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))
            + b"\x7f"
            + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))
            + b"\xff\x00"
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert out.shape == (8, 8, 1)
        assert np.unique(out).tolist() == [142]

    def test_dc_only_progressive_without_ac_scans_decodes(self):
        """A progressive file may legally end after DC scans: AC
        coefficients stay zero (DC-only preview)."""
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
            + _jpeg_seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
            + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
            + b"\x7f"
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert np.unique(out).tolist() == [134]  # 128 + 3*16/8

    def test_mixed_dc_ac_band_rejected(self):
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
            + _jpeg_seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
            + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 5, 0x00]))
            + b"\x7f\xff\xd9"
        )
        with pytest.raises(ValueError, match="mixes DC and AC"):
            decode_jpeg(data)

    def test_multicomponent_ac_scan_rejected(self):
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(
                0xC2, bytes([8, 0, 8, 0, 8, 3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0])
            )
            + _jpeg_seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([2]))
            + _jpeg_seg(0xDA, bytes([2, 1, 0x00, 2, 0x00, 1, 63, 0x00]))
            + b"\x7f\xff\xd9"
        )
        with pytest.raises(ValueError, match="single-component"):
            decode_jpeg(data)

    def test_progressive_without_any_scan_rejected(self):
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
            + b"\xff\xd9"
        )
        with pytest.raises(ValueError, match="no scan"):
            decode_jpeg(data)


class TestJpegProgressiveDifferential:
    """Baseline and progressive encodings carry the SAME quantized
    coefficients, so their decodes must be bit-equal — a correctness
    gate on every scan kind without trusting either encoder alone."""

    @pytest.mark.parametrize(
        "seed,w,h,subsample,quality",
        [
            (1, 24, 16, True, 85),
            (2, 17, 13, False, 85),
            (3, 40, 33, True, 85),
            (8, 33, 29, True, 5),
            (9, 21, 19, False, 100),
        ],
    )
    def test_bit_equal_to_baseline(self, seed, w, h, subsample, quality):
        img = synth_image(seed, w, h)
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsample=subsample)
        )
        assert np.array_equal(base, prog)

    def test_grayscale(self):
        img = synth_image(5, 30, 22)[..., 0]
        base = decode_jpeg(encode_jpeg(img, quality=70))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=70))
        assert np.array_equal(base, prog)

    def test_restart_intervals_inside_every_scan_kind(self):
        img = synth_image(6, 50, 38)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsample=True, restart_interval=3)
        )
        assert np.array_equal(base, prog)

    def test_flat_image_exercises_eobn_runs(self):
        """An all-flat image makes every AC band empty: EOB runs span
        whole scans (EOBn symbols with r > 0 plus extra bits)."""
        flat = np.full((64, 80, 3), 128, np.uint8)
        base = decode_jpeg(encode_jpeg(flat, quality=85))
        prog = decode_jpeg(encode_jpeg_progressive(flat, quality=85))
        assert np.array_equal(base, prog)

    def test_noise_exercises_zrl_and_dense_refinement(self):
        rng = np.random.default_rng(7)
        noise = rng.integers(0, 256, (41, 57, 3), np.uint8)
        base = decode_jpeg(encode_jpeg(noise, quality=95, subsample=False))
        prog = decode_jpeg(
            encode_jpeg_progressive(noise, quality=95, subsample=False)
        )
        assert np.array_equal(base, prog)

    def test_deep_successive_approximation_script(self):
        """Non-interleaved DC scans, Al=3 AC first pass, chained
        refinements 3->2->1->0, two DC refinement passes."""
        script = [
            ((0,), 0, 0, 0, 2), ((1,), 0, 0, 0, 2), ((2,), 0, 0, 0, 2),
            ((0,), 1, 63, 0, 3), ((1,), 1, 63, 0, 3), ((2,), 1, 63, 0, 3),
            ((0,), 0, 0, 2, 1), ((1,), 0, 0, 2, 1), ((2,), 0, 0, 2, 1),
            ((0,), 0, 0, 1, 0), ((1,), 0, 0, 1, 0), ((2,), 0, 0, 1, 0),
            ((0,), 1, 63, 3, 2), ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
            ((1,), 1, 63, 3, 2), ((1,), 1, 63, 2, 1), ((1,), 1, 63, 1, 0),
            ((2,), 1, 63, 3, 2), ((2,), 1, 63, 2, 1), ((2,), 1, 63, 1, 0),
        ]
        for subsample in (True, False):
            img = synth_image(11, 37, 26)
            base = decode_jpeg(encode_jpeg(img, quality=75, subsample=subsample))
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    img, quality=75, subsample=subsample, scans=script
                )
            )
            assert np.array_equal(base, prog)

    def test_split_spectral_bands_with_restarts(self):
        script = [
            ((0, 1, 2), 0, 0, 0, 1),
            ((0,), 1, 2, 0, 1), ((0,), 3, 9, 0, 1), ((0,), 10, 63, 0, 1),
            ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
            ((0, 1, 2), 0, 0, 1, 0),
            ((0,), 1, 2, 1, 0), ((0,), 3, 9, 1, 0), ((0,), 10, 63, 1, 0),
        ]
        img = synth_image(12, 44, 31)
        base = decode_jpeg(encode_jpeg(img, quality=85))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, scans=script, restart_interval=2)
        )
        assert np.array_equal(base, prog)

    def test_truncated_progressive_raises(self):
        img = synth_image(13, 25, 18)
        data = encode_jpeg_progressive(img, quality=85)
        with pytest.raises(ValueError):
            decode_jpeg(data[: len(data) // 2] + b"\xff\xd9")

    def test_half_integer_quantization_tie(self):
        """Regression: the progressive encoder's batched DCT must use
        broadcast matmul, not einsum — einsum's reduction order
        produced 18.5 vs matmul's 18.500000000000007 at an exact
        half-integer quantization tie, flipping np.rint and breaking
        the bit-equality gate (found by fuzzing; this replays the
        failing draw: 37x20 gray noise at q86)."""
        rng = np.random.default_rng(123)
        img = None
        for trial in range(20):
            w = int(rng.integers(1, 70))
            h = int(rng.integers(1, 70))
            q = int(rng.integers(1, 101))
            sub = bool(rng.integers(0, 2))
            gray = bool(rng.integers(0, 4) == 0)
            img = rng.integers(0, 256, (h, w) if gray else (h, w, 3), np.uint8)
            int(rng.choice([0, 1, 3]))
            if trial == 19:
                assert (w, h, q, gray) == (37, 20, 86, True)
        base = decode_jpeg(encode_jpeg(img, quality=86, subsample=False))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=86, subsample=False))
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("mode", ["444", "422", "420"])
    def test_explicit_subsampling_modes(self, mode):
        """4:2:2 (2x1 luma sampling) exercises the decoder's
        rectangular-MCU path that neither bool mode reaches."""
        img = synth_image(21, 45, 34)
        base = decode_jpeg(encode_jpeg(img, quality=88, subsample=mode))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=88, subsample=mode))
        assert np.array_equal(base, prog)
        assert base.shape == (34, 45, 3)

    def test_422_odd_width_with_restarts(self):
        img = synth_image(22, 31, 17)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsample="422", restart_interval=2))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsample="422", restart_interval=3)
        )
        assert np.array_equal(base, prog)


class TestJpegMultiscanSequential:
    """Multi-scan SEQUENTIAL files (one non-interleaved baseline scan
    per component, T.81 A.2) decode through the coefficient store and
    must be bit-equal to the interleaved single-scan encoding."""

    @pytest.mark.parametrize("mode", ["444", "422", "420"])
    def test_bit_equal_to_single_scan(self, mode):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_multiscan

        for w, h in ((24, 16), (31, 17), (1, 1)):
            img = synth_image(31, w, h)
            single = decode_jpeg(encode_jpeg(img, quality=85, subsample=mode))
            multi = decode_jpeg(encode_jpeg_multiscan(img, quality=85, subsample=mode))
            assert np.array_equal(single, multi)

    def test_restart_intervals(self):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_multiscan

        img = synth_image(33, 40, 26)
        single = decode_jpeg(encode_jpeg(img, quality=85))
        multi = decode_jpeg(
            encode_jpeg_multiscan(img, quality=85, restart_interval=2)
        )
        assert np.array_equal(single, multi)

    def test_grayscale_single_component_scan(self):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_multiscan

        g = synth_image(32, 20, 15)[..., 0]
        assert np.array_equal(
            decode_jpeg(encode_jpeg(g, quality=80)),
            decode_jpeg(encode_jpeg_multiscan(g, quality=80)),
        )


from hypothesis import given, settings
from hypothesis import strategies as st


class TestJpegDifferentialFuzz:
    """Property: every encoder layout of the same pixels at the same
    quality/subsampling decodes bit-equal (they all carry the same
    quantized coefficients). This is the gate that caught the
    einsum-vs-matmul rint tie."""

    @staticmethod
    def _image(draw, st):
        w = draw(st.integers(1, 48))
        h = draw(st.integers(1, 48))
        gray = draw(st.booleans())
        seed = draw(st.integers(0, 2**31))
        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, (h, w) if gray else (h, w, 3), np.uint8)

    @settings(max_examples=30, deadline=None)
    @given(st.data())
    def test_all_layouts_bit_equal(self, data):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_multiscan

        img = self._image(data.draw, st)
        q = data.draw(st.integers(1, 100))
        mode = data.draw(st.sampled_from(["444", "422", "420"]))
        ri = data.draw(st.sampled_from([0, 1, 3]))
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=mode))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=q, subsample=mode, restart_interval=ri)
        )
        multi = decode_jpeg(
            encode_jpeg_multiscan(img, quality=q, subsample=mode, restart_interval=ri)
        )
        assert np.array_equal(base, prog)
        assert np.array_equal(base, multi)


class TestJpegAdobeCmyk:
    """4-component Adobe JPEGs (APP14): CMYK (transform 0) and YCCK
    (transform 2), stored inverted, composited to RGB the way
    libjpeg/browsers do (rgb = inverted_cmy * k / 255)."""

    def test_hand_vector_dc_only_cmyk(self):
        """Flat 8x8 planes via hand-built DC diffs (3,2,2,3), quant 16:
        planes (134,132,132,134) -> rgb = rint(cmy*k/255) = (70,69,69)."""
        data = (
            b"\xff\xd8"
            + _jpeg_seg(0xEE, b"Adobe" + b"\x00\x65\x00\x00\x00\x00\x00")
            + _jpeg_seg(0xDB, b"\x00" + bytes([16] * 64))
            + _jpeg_seg(
                0xC0,
                bytes([8, 0, 8, 0, 8, 4])
                + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0, 4, 0x11, 0]),
            )
            + _jpeg_seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
            + _jpeg_seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
            + _jpeg_seg(
                0xDA, bytes([4, 1, 0x00, 2, 0x00, 3, 0x00, 4, 0x00, 0, 63, 0])
            )
            # per comp: DC code '0' + diff bits + AC EOB code '0'
            # 0 11 0 | 0 10 0 | 0 10 0 | 0 11 0 -> 0x64 0x46
            + bytes([0b01100100, 0b01000110])
            + b"\xff\xd9"
        )
        out = decode_jpeg(data)
        assert out.shape == (8, 8, 3)
        assert np.unique(out.reshape(-1, 3), axis=0).tolist() == [[70, 69, 69]]

    @pytest.mark.parametrize("transform", [0, 2])
    def test_round_trip_psnr_vs_exact_composite(self, transform):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_cmyk

        rgbish = synth_image(51, 33, 26)
        k = synth_image(52, 33, 26)[..., 0]
        cmyk = np.dstack([rgbish, k])
        expected = np.clip(
            np.rint(
                rgbish.astype(np.float64) * k[..., None].astype(np.float64) / 255.0
            ),
            0,
            255,
        ).astype(np.uint8)
        out = decode_jpeg(encode_jpeg_cmyk(cmyk, quality=97, transform=transform))
        assert out.shape == (26, 33, 3)
        assert psnr(expected, out) >= 40

    def test_pipeline_dims_via_probe(self):
        from mhtml_to_html_spark.media.jpeg import encode_jpeg_cmyk
        from mhtml_to_html_spark.media.probe import probe_image

        cmyk = np.dstack([synth_image(53, 15, 11), synth_image(54, 15, 11)[..., 0]])
        assert probe_image(encode_jpeg_cmyk(cmyk)) == ("jpeg", 15, 11)
