"""Convert-level recovery: synthesized index pages, rejection errors,
anomaly reporting. The convert()-dependent half of
/root/reference/test/malformed.test.js."""

import base64

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import (
    INDEX_PAGE_NOT_FOUND,
    SYNTHESIZED_INDEX_ANOMALY,
    convert_page,
)
from tests.helpers.mhtml_builder import concat_bytes, encode_single_byte_charset

PNG = "iVBORw0KGgo="
DOCUMENT = "<html><body><p>RECOVERED</p></body></html>"


def single_part(content_type, body, transfer_encoding="8bit"):
    return concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        f"------=_B\r\nContent-Type: {content_type}\r\nContent-Transfer-Encoding: {transfer_encoding}\r\n",
        f"Content-Location: https://e/thing\r\n\r\n{body}\r\n------=_B--\r\n",
    )


def test_image_only_archive_becomes_page():
    result = convert_page(parse_mhtml(single_part("image/png", PNG, "base64")))
    assert f'<img src="data:image/png;base64,{PNG}">' in result.data


def test_text_only_archive_becomes_pre_page():
    result = convert_page(parse_mhtml(single_part("text/plain", "Hello World")))
    assert "<pre>Hello World</pre>" in result.data


def test_base64_text_decoded_before_showing():
    body = base64.b64encode(b"Hello World").decode()
    result = convert_page(parse_mhtml(single_part("text/plain", body, "base64")))
    assert "<pre>Hello World</pre>" in result.data


def test_base64_text_with_charset():
    raw = base64.b64encode(encode_single_byte_charset("Привет", "windows-1251")).decode()
    result = convert_page(
        parse_mhtml(single_part("text/plain; charset=windows-1251", raw, "base64"))
    )
    assert "<pre>Привет</pre>" in result.data


def test_text_looking_like_markup_escaped():
    result = convert_page(parse_mhtml(single_part("text/plain", "a <b>&amp; c")))
    assert "&lt;b&gt;" in result.data
    assert "<b>" not in result.data


def test_nothing_presentable_rejected():
    with pytest.raises(ValueError, match=INDEX_PAGE_NOT_FOUND):
        convert_page(parse_mhtml(single_part("application/octet-stream", "AQID")))


def test_real_document_preferred_over_synthesis():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n",
        f"Content-Location: https://e/i.png\r\n\r\n{PNG}\r\n",
        "------=_B\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: https://e/\r\n\r\n{DOCUMENT}\r\n------=_B--\r\n",
    )
    result = convert_page(parse_mhtml(raw))
    assert "RECOVERED" in result.data, "the page was passed over for the image"


def test_plain_html_converted_with_title():
    result = convert_page(
        parse_mhtml(
            concat_bytes("<html><head><title>PLAIN</title></head><body>x</body></html>")
        )
    )
    assert result.title == "PLAIN"


def test_whitespace_only_file_rejected():
    with pytest.raises(ValueError, match=INDEX_PAGE_NOT_FOUND):
        convert_page(parse_mhtml(concat_bytes("  \r\n\t\r\n  ")))


def test_appledouble_sidecar_rejected():
    raw = concat_bytes(
        bytes([0x00, 0x05, 0x16, 0x07, 0x00, 0x02, 0x00, 0x00]),
        "Mac OS X        ",
        bytes([0x00, 0x02, 0x00, 0x00]),
    )
    with pytest.raises(ValueError, match=INDEX_PAGE_NOT_FOUND):
        convert_page(parse_mhtml(raw))


def test_synthesized_index_reported():
    result = convert_page(parse_mhtml(single_part("image/png", PNG, "base64")))
    assert {"type": SYNTHESIZED_INDEX_ANOMALY, "id": "https://e/thing"} in result.anomalies


def test_clean_archive_reports_nothing():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: https://e/\r\n\r\n{DOCUMENT}\r\n------=_B--\r\n",
    )
    result = convert_page(parse_mhtml(raw))
    assert result.anomalies == []


def test_converting_twice_is_identical():
    raw = single_part("text/html", DOCUMENT)
    first = convert_page(parse_mhtml(raw)).data
    second = convert_page(parse_mhtml(raw)).data
    assert first == second
