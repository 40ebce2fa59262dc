"""Convert-level charset invariants: decoded content reaches the page
and no stale declaration survives. The convert()-dependent half of
/root/reference/test/charset.test.js."""

import re

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import convert_page
from tests.test_charset import (
    BOUNDARY,
    CHARSETS,
    DECLARATIONS,
    ENCODINGS,
    HELLO,
    LOCATION,
    REPLACEMENT,
    WORLD,
    build,
)
from tests.helpers.mhtml_builder import concat_bytes, encode_single_byte_charset


@pytest.mark.parametrize("encoding", list(ENCODINGS))
@pytest.mark.parametrize("declaration", list(DECLARATIONS))
@pytest.mark.parametrize("charset", CHARSETS)
def test_converted_page_decoded_and_clean(charset, declaration, encoding):
    result = convert_page(parse_mhtml(build(charset, declaration, encoding)))
    assert HELLO in result.data, "the title was not decoded"
    assert WORLD in result.data, "the body was not decoded"
    assert REPLACEMENT not in result.data, "decoded with the wrong charset"
    assert not re.search(r"charset=(koi8-r|windows-1251)", result.data, re.I), (
        "a stale charset declaration was left behind"
    )


def test_every_declaration_removed_not_just_first():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="windows-1251"\r\n',
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        '<html><head><meta http-equiv="Content-Type" content="text/html; charset=windows-1251">',
        '<meta http-equiv="content-type" name="other" content="text/html; charset=windows-1251">',
        "</head><body><p>",
        encode_single_byte_charset(HELLO, "windows-1251"),
        f"</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    result = convert_page(parse_mhtml(raw))
    assert HELLO in result.data
    assert not re.search(r"charset=windows-1251", result.data, re.I)


def test_meta_charset_plus_http_equiv_leaves_nothing():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\n",
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        '<html><head><meta charset="windows-1251">',
        '<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">',
        "</head><body><p>",
        encode_single_byte_charset(HELLO, "windows-1251"),
        f"</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    result = convert_page(parse_mhtml(raw))
    assert HELLO in result.data
    assert not re.search(r"windows-1251", result.data, re.I)


def test_utf8_meta_injected_once():
    raw = build("windows-1251", "meta-charset", "8bit")
    result = convert_page(parse_mhtml(raw))
    assert result.data.count('<meta charset="utf-8">') == 1
