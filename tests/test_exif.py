"""EXIF parse + orientation normalization (media/exif.py).

Parser pinned against hand-assembled TIFF structures (both byte
orders, inline and offset values); orientation codes pinned by the
dedup property that matters: storing rotated/flipped pixels with the
compensating tag displays back to the original image.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from mhtml_to_html_spark.images.synth import synth_image
from mhtml_to_html_spark.media import encode_jpeg
from mhtml_to_html_spark.media.exif import (
    apply_orientation,
    build_exif_app1,
    parse_exif,
)


class TestParse:
    @pytest.mark.parametrize("little_endian", [True, False])
    def test_round_trip_all_fields(self, little_endian):
        app1 = build_exif_app1(
            orientation=6,
            make="ACME",
            model="Cam 9000",
            datetime="2024:01:02 03:04:05",
            little_endian=little_endian,
        )
        jp = encode_jpeg(synth_image(1, 16, 12), app1=app1)
        e = parse_exif(jp)
        assert e == {
            "make": "ACME",
            "model": "Cam 9000",
            "orientation": 6,
            "datetime": "2024:01:02 03:04:05",
        }

    def test_no_exif(self):
        assert parse_exif(encode_jpeg(synth_image(1, 8, 8))) == {}
        assert parse_exif(b"\x89PNG\r\n\x1a\n") == {}

    def test_hand_assembled_big_endian_inline_short(self):
        # TIFF header MM + 42 + IFD at 8; one entry: orientation=3,
        # SHORT count 1, value inline left-justified
        tiff = (
            b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">H", 3) + b"\x00\x00"
            + struct.pack(">I", 0)
        )
        payload = b"Exif\x00\x00" + tiff
        app1 = struct.pack(">BBH", 0xFF, 0xE1, len(payload) + 2) + payload
        jp = encode_jpeg(synth_image(2, 8, 8), app1=app1)
        assert parse_exif(jp) == {"orientation": 3}

    def test_truncated_and_garbage_tolerated(self):
        good = build_exif_app1(orientation=6, make="LONGMAKERNAME INC")
        jp = bytearray(encode_jpeg(synth_image(3, 8, 8), app1=good))
        # corrupt the TIFF magic: parser must return {} not raise
        idx = bytes(jp).find(b"Exif\x00\x00") + 6
        jp[idx : idx + 2] = b"XX"
        assert parse_exif(bytes(jp)) == {}


class TestOrientation:
    def test_identity_and_unknown(self):
        a = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
        assert apply_orientation(a, 1) is a
        assert apply_orientation(a, 0) is a
        assert apply_orientation(a, 9) is a

    @pytest.mark.parametrize(
        "code,store",
        [
            (2, lambda img: img[:, ::-1]),  # displayed was mirrored
            (3, lambda img: img[::-1, ::-1]),
            (4, lambda img: img[::-1]),
            (5, lambda img: img.transpose(1, 0, 2)),
            (6, lambda img: img.transpose(1, 0, 2)[::-1]),  # stored = rot90 CCW
            (7, lambda img: img.transpose(1, 0, 2)[::-1, ::-1]),
            (8, lambda img: img.transpose(1, 0, 2)[:, ::-1]),  # stored = rot90 CW
        ],
    )
    def test_compensating_tag_restores_display(self, code, store):
        """A camera stores sensor pixels + the tag saying how to show
        them: applying the tag to the stored array must reproduce the
        displayed image — the property phash dedup depends on."""
        img = np.arange(2 * 5 * 3, dtype=np.uint8).reshape(2, 5, 3)
        stored = store(img)
        assert (apply_orientation(stored, code) == img).all(), code

    def test_displayed_dims_swap_for_rotations(self):
        img = np.zeros((4, 9, 3), np.uint8)
        for code in (5, 6, 7, 8):
            assert apply_orientation(img, code).shape == (9, 4, 3)
        for code in (1, 2, 3, 4):
            assert apply_orientation(img, code).shape == (4, 9, 3)
