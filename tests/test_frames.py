"""A frame does not always hold a document; converting a tracking
pixel as markup would destroy it. Ported from
/root/reference/test/frames.test.js."""

import base64
import re

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import convert_page
from tests.helpers.mhtml_builder import concat_bytes, encode_single_byte_charset

BOUNDARY = "----=_B"
LOCATION = "https://example.invalid/"
CONTENT_ID = "<frame-1@mhtml.blink>"
FRAME_LOCATION = "https://example.invalid/frame"
GIF = bytes([0x47, 0x49, 0x46, 0x38, 0x39, 0x61, 0x01, 0x00, 0x01, 0x00, 0x80, 0xFF, 0x00, 0x3B])
GIF_B64 = base64.b64encode(GIF).decode()

IFRAME = f'<iframe src="cid:{CONTENT_ID[1:-1]}"></iframe>'


def build(markup, content_type=None, body="", transfer_encoding="8bit"):
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n<html><body>{markup}</body></html>\r\n",
        f"--{BOUNDARY}\r\n",
        "" if content_type is None else f"Content-Type: {content_type}\r\n",
        f"Content-Transfer-Encoding: {transfer_encoding}\r\nContent-ID: {CONTENT_ID}\r\n",
        f"Content-Location: {FRAME_LOCATION}\r\n\r\n",
        body,
        f"\r\n--{BOUNDARY}--\r\n",
    )


def convert_raw(raw):
    return convert_page(parse_mhtml(raw))


def test_document_frame_inlined_as_srcdoc():
    result = convert_raw(build(IFRAME, "text/html", "<html><body><p>INNER</p></body></html>"))
    assert re.search(r"srcdoc=", result.data), "the frame was not inlined"
    assert "INNER" in result.data


def test_image_frame_becomes_data_uri():
    result = convert_raw(build(IFRAME, "image/gif", GIF_B64, "base64"))
    assert "GIF89a" not in result.data, "the bytes of the image were parsed as markup"
    assert not re.search(r"srcdoc=", result.data), "an image was inlined as a document"
    assert f'src="data:image/gif;base64,{GIF_B64}"' in result.data


def test_diverted_frame_keeps_original_url():
    result = convert_raw(build(IFRAME, "image/gif", GIF_B64, "base64"))
    assert f'data-original-src="cid:{CONTENT_ID[1:-1]}"' in result.data


def test_mislabeled_stream_frame_still_converted():
    result = convert_raw(
        build(IFRAME, "application/octet-stream", "<html><body><p>INNER</p></body></html>")
    )
    assert re.search(r"srcdoc=", result.data), "a mislabeled document was inlined as raw data"
    assert "INNER" in result.data


def test_untyped_frame_converted_as_document():
    result = convert_raw(build(IFRAME, None, "<html><body><p>INNER</p></body></html>"))
    assert re.search(r"srcdoc=", result.data)
    assert "INNER" in result.data


def test_base64_frame_decoded_with_meta_charset():
    inner = "Привет"
    frame_doc = concat_bytes(
        '<html><head><meta charset="windows-1251"></head><body><p>',
        encode_single_byte_charset(inner, "windows-1251"),
        "</p></body></html>",
    )
    body = base64.b64encode(frame_doc).decode()
    result = convert_raw(build(IFRAME, "text/html", body, "base64"))
    assert re.search(r"srcdoc=", result.data), "the frame was not inlined"
    assert inner in result.data, "the frame was not decoded with its charset"


def test_object_image_inlined_as_data_uri():
    result = convert_raw(
        build(
            f'<object data="cid:{CONTENT_ID[1:-1]}"></object>',
            "image/gif",
            GIF_B64,
            "base64",
        )
    )
    assert "data:image/gif;base64," in result.data
    assert "GIF89a" not in result.data
