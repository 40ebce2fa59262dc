"""APNG codec (media/apng.py): compositing model (SOURCE/OVER blends,
NONE/BACKGROUND/PREVIOUS disposal), per-frame zlib streams, fcTL
delays, still-PNG compatibility of the default image, and the frame
sampler integration."""

from __future__ import annotations

import numpy as np
import pytest

from mhtml_to_html_spark.images.synth import synth_image
from mhtml_to_html_spark.media.apng import decode_apng, encode_apng
from mhtml_to_html_spark.media.png import decode_png, encode_png


def test_full_frame_source_round_trip():
    frames = [synth_image(70 + i, 20, 14) for i in range(3)]
    out, delays = decode_apng(encode_apng(frames, delays_ms=[30, 50, 70]))
    assert delays == [30, 50, 70]
    for got, exp in zip(out, frames):
        assert np.array_equal(got[..., :3], exp)
        assert (got[..., 3] == 255).all()


def test_default_image_decodes_as_still_png():
    """A still decoder must see frame 0 (the IDAT default image) and
    ignore the animation chunks."""
    frames = [synth_image(73, 12, 9), synth_image(74, 12, 9)]
    data = encode_apng(frames)
    assert np.array_equal(decode_png(data)[..., :3], frames[0])


def test_over_blend_and_dispose_previous():
    base = np.zeros((8, 8, 4), np.uint8)
    base[..., :3] = 10
    base[..., 3] = 255
    patch = np.zeros((4, 4, 4), np.uint8)
    patch[..., 0] = 200
    patch[..., 3] = 128
    data = encode_apng(
        [base, patch, patch],
        delays_ms=[10, 10, 10],
        regions=[None, (2, 2), (0, 0)],
        dispose=[0, 2, 0],  # frame 1 reverts its region afterwards
        blend=[0, 1, 0],  # frame 1 composites OVER
    )
    out, _ = decode_apng(data)
    fa = 128 / 255
    exp_r = round((200 * fa + 10 * (1 - fa)) / (fa + (1 - fa)))
    assert out[1][3, 3, 0] == exp_r and out[1][3, 3, 3] == 255
    # PREVIOUS restored the base under frame 1's region...
    assert (out[2][2:6, 4:6, 0] == 10).all()
    # ...and frame 2 drew SOURCE (alpha replaced) at the origin
    assert (out[2][0:4, 0:4, 3] == 128).all()


def test_dispose_background_clears_region():
    base = np.full((6, 6, 3), 99, np.uint8)
    patch = np.full((2, 2, 3), 200, np.uint8)
    data = encode_apng(
        [base, patch, patch],
        regions=[None, (1, 1), (4, 4)],
        dispose=[0, 1, 0],  # frame 1's region clears to transparent
    )
    out, _ = decode_apng(data)
    assert (out[2][1:3, 1:3] == 0).all()  # cleared, fully transparent
    assert (out[2][4:6, 4:6, 0] == 200).all()


def test_first_frame_previous_acts_as_background():
    base = np.full((4, 4, 3), 50, np.uint8)
    nxt = np.full((4, 4, 3), 70, np.uint8)
    data = encode_apng([base, nxt], dispose=[2, 0])
    out, _ = decode_apng(data)
    assert (out[1][..., 0] == 70).all()


def test_still_png_raises():
    with pytest.raises(ValueError, match="acTL"):
        decode_apng(encode_png(synth_image(75, 8, 8)))


def test_frame_region_outside_canvas_rejected():
    base = np.full((4, 4, 3), 1, np.uint8)
    patch = np.full((3, 3, 3), 2, np.uint8)
    data = encode_apng([base, patch], regions=[None, (2, 2)])
    with pytest.raises(ValueError, match="outside"):
        decode_apng(data)


def test_sample_frames_apng():
    from mhtml_to_html_spark.operators.multimodal import _decode_video_frames

    frames = [synth_image(76 + i, 10, 8) for i in range(4)]
    data = encode_apng(frames, delays_ms=[20, 30, 40, 50])
    got = list(_decode_video_frames(data, 4, strict=True))
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert [g[1] for g in got] == [0, 20, 50, 90]  # cumulative starts
    for (_i, _ts, px), exp in zip(got, frames):
        assert np.array_equal(px[..., :3], exp)
