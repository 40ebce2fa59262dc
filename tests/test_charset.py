"""Legacy-codepage documents must survive whatever transfer encoding
carries them, wherever the charset is declared. Case matrix ported from
/root/reference/test/charset.test.js (parse-level assertions; the
declaration-removal invariants belong to the rewrite stage)."""

import struct

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from tests.helpers.mhtml_builder import (
    concat_bytes,
    encode_base64_body,
    encode_quoted_printable_body,
    encode_single_byte_charset,
    resources_of,
)

BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
LOCATION = "https://example.invalid/page.htm"
CHARSETS = ["koi8-r", "windows-1251"]
HELLO = "Привет"
WORLD = "Мир"
REPLACEMENT = "�"

ENCODINGS = {
    "8bit": lambda data: data,
    "quoted-printable": encode_quoted_printable_body,
    "base64": encode_base64_body,
    "binary": lambda data: data,
}

DECLARATIONS = {
    "meta-http-equiv": lambda cs: f'<META http-equiv="Content-Type" content="text/html; charset={cs}">',
    "meta-charset": lambda cs: f'<meta charset="{cs}">',
    "part-header": lambda cs: "",
}


def build(charset: str, declaration: str, encoding: str) -> bytes:
    document = concat_bytes(
        '<!DOCTYPE html PUBLIC "-//W3C//DTD HTML 4.0 Transitional//EN">\r\n<HTML><HEAD><TITLE>',
        encode_single_byte_charset(HELLO, charset),
        f"</TITLE>\r\n{DECLARATIONS[declaration](charset)}\r\n</HEAD>\r\n<BODY><P>",
        encode_single_byte_charset(WORLD, charset),
        "</P></BODY></HTML>",
    )
    part_charset = f';\r\n\tcharset="{charset}"' if declaration == "part-header" else ""
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related;\r\n\tboundary="{BOUNDARY}";\r\n\ttype="text/html"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html{part_charset}\r\n",
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )


@pytest.mark.parametrize("encoding", list(ENCODINGS))
@pytest.mark.parametrize("declaration", list(DECLARATIONS))
@pytest.mark.parametrize("charset", CHARSETS)
def test_cyrillic_matrix(charset, declaration, encoding):
    result = parse_mhtml(build(charset, declaration, encoding))
    page = resources_of(result)[LOCATION]
    assert page.text is not None
    assert HELLO in page.text, "the title was not decoded"
    assert WORLD in page.text, "the body was not decoded"
    assert REPLACEMENT not in page.text, "decoded with the wrong charset"
    assert page.charset == charset


MULTI_BYTE = [
    ("shift_jis", bytes([0x93, 0xFA, 0x96, 0x7B, 0x8C, 0xEA]), "日本語"),
    ("euc-jp", bytes([0xC6, 0xFC, 0xCB, 0xDC]), "日本"),
    ("gb2312", bytes([0xD6, 0xD0, 0xCE, 0xC4]), "中文"),
    ("big5", bytes([0xA4, 0xA4, 0xA4, 0xE5]), "中文"),
    ("euc-kr", bytes([0xC7, 0xD1, 0xB1, 0xB9]), "한국"),
    (
        "iso-2022-jp",
        bytes([0x1B, 0x24, 0x42, 0x46, 0x7C, 0x4B, 0x5C, 0x1B, 0x28, 0x42]),
        "日本",
    ),
]


@pytest.mark.parametrize("encoding", list(ENCODINGS))
@pytest.mark.parametrize("charset,raw_bytes,text", MULTI_BYTE, ids=[m[0] for m in MULTI_BYTE])
def test_cjk_matrix(charset, raw_bytes, text, encoding):
    document = concat_bytes(
        "<html><head><title>", raw_bytes, "</title></head><body><p>", raw_bytes, "</p></body></html>"
    )
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="{charset}"\r\n',
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    page = resources_of(parse_mhtml(raw))[LOCATION]
    assert text in page.text, f"the body was not decoded as {charset}"
    assert REPLACEMENT not in page.text, "decoded with the wrong charset"


def test_mislabeled_base64_part_stays_byte_exact():
    # some writers give every part a text/* type; decoding such a part
    # as text would corrupt it
    jpeg = bytes([0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46, 0x49, 0x46, 0x00, 0x01, 0xFF, 0xDB])
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f'Content-Location: {LOCATION}\r\n\r\n<html><body><img src="photo.jpg"></body></html>\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; name=photo.jpg\r\nContent-Transfer-Encoding: base64\r\n",
        "Content-Location: https://example.invalid/photo.jpg\r\n\r\n",
        encode_base64_body(jpeg),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    res = resources_of(parse_mhtml(raw))["https://example.invalid/photo.jpg"]
    assert res.transfer_encoding == "base64", "a mislabeled binary part was decoded as text"
    assert res.data == jpeg


def test_encoded_part_keeps_declared_charset():
    # the bytes were not transcoded, so relabeling them utf-8 would lie
    text = encode_single_byte_charset("Привет", "windows-1251")
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html\r\nContent-Transfer-Encoding: 8bit\r\n",
        f'Content-Location: {LOCATION}\r\n\r\n<html><body><img src="t.txt"></body></html>\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/plain; charset="windows-1251"\r\nContent-Transfer-Encoding: base64\r\n',
        "Content-Location: https://example.invalid/t.txt\r\n\r\n",
        encode_base64_body(text),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    res = resources_of(parse_mhtml(raw))["https://example.invalid/t.txt"]
    assert res.transfer_encoding == "base64"
    assert 'charset="windows-1251"' in res.content_type, "the declared charset was relabeled"
    assert res.data == text


def _encode_utf16(value: str, little_endian: bool) -> bytes:
    fmt = "<H" if little_endian else ">H"
    out = struct.pack(fmt, 0xFEFF)
    for ch in value:
        out += struct.pack(fmt, ord(ch))
    return out


def _page_linking_stylesheet(stylesheet_headers: str, stylesheet_body: bytes) -> bytes:
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n",
        '<html><head><link rel="stylesheet" href="s.css"></head><body>x</body></html>\r\n',
        f"--{BOUNDARY}\r\n{stylesheet_headers}\r\n",
        "Content-Location: https://example.invalid/s.css\r\n\r\n",
        stylesheet_body,
        f"\r\n--{BOUNDARY}--\r\n",
    )


@pytest.mark.parametrize("little_endian", [True, False], ids=["little-endian", "big-endian"])
def test_utf16_stylesheet_decoded_by_bom(little_endian):
    result = parse_mhtml(
        _page_linking_stylesheet("Content-Type: text/css", _encode_utf16("p{color:red}", little_endian))
    )
    sheet = resources_of(result)["https://example.invalid/s.css"]
    assert "p{color:red}" in sheet.text, "the stylesheet was not decoded with its BOM"
    assert REPLACEMENT not in sheet.text, "the mark itself was read as text"
    assert "\u0000" not in sheet.text, "the sheet was read one byte at a time"


def test_bom_outranks_declared_charset():
    result = parse_mhtml(
        _page_linking_stylesheet(
            'Content-Type: text/css; charset="windows-1251"', _encode_utf16("p{color:red}", True)
        )
    )
    sheet = resources_of(result)["https://example.invalid/s.css"]
    assert "p{color:red}" in sheet.text, "the declared charset was preferred over the mark"


def test_bom_outranks_charset_rule():
    result = parse_mhtml(
        _page_linking_stylesheet(
            "Content-Type: text/css", _encode_utf16('@charset "koi8-r";p{color:red}', True)
        )
    )
    sheet = resources_of(result)["https://example.invalid/s.css"]
    assert "p{color:red}" in sheet.text, "the sheet was read again with the charset it named"
    assert "@charset" not in sheet.text, "the rule was left in the output"


def test_unknown_charset_falls_back_to_utf8():
    raw = concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="x-not-a-real-charset"\r\n',
        f"Content-Transfer-Encoding: 8bit\r\nContent-Location: {LOCATION}\r\n\r\n",
        f"<html><body><p>plain ascii</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    page = resources_of(parse_mhtml(raw))[LOCATION]
    assert "plain ascii" in page.text


def test_meta_charset_rereads_raw_bytes():
    # no part-header charset: the first decode is UTF-8 and mangles the
    # cyrillic; the meta charset asks for a re-read of the raw bytes
    raw = build("windows-1251", "meta-charset", "base64")
    page = resources_of(parse_mhtml(raw))[LOCATION]
    assert HELLO in page.text
    assert page.charset == "windows-1251"


CP1251_HELLO = "Привет"


def _doc_archive(head_html: str, body_bytes: bytes) -> bytes:
    header = (
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_M"\r\n\r\n'
        "------=_M\r\nContent-Type: text/html\r\n"
        "Content-Transfer-Encoding: 8bit\r\nContent-Location: https://e/m\r\n\r\n"
    ).encode("latin-1")
    return (
        header
        + f"<html><head>{head_html}</head><body><p>".encode("latin-1")
        + body_bytes
        + b"</p></body></html>\r\n------=_M--\r\n"
    )


def test_meta_charset_inside_comment_is_ignored():
    """The reference scans the parsed DOM (parse.js:423-460): a
    commented-out declaration must not drive the re-read."""
    raw = _doc_archive(
        '<!-- <meta charset="koi8-r"> --><meta charset="windows-1251">',
        CP1251_HELLO.encode("cp1251"),
    )
    result = parse_mhtml(raw)
    assert CP1251_HELLO in result.parts[0].text
    assert result.parts[0].charset == "windows-1251"


def test_meta_charset_inside_script_is_ignored():
    raw = _doc_archive(
        "<script>document.write('<meta charset=\"koi8-r\">')</script>"
        '<meta charset="windows-1251">',
        CP1251_HELLO.encode("cp1251"),
    )
    result = parse_mhtml(raw)
    assert CP1251_HELLO in result.parts[0].text
    assert result.parts[0].charset == "windows-1251"


def test_meta_after_unclosed_comment_is_swallowed():
    """An unclosed comment swallows the rest of the document in a DOM
    parse — a declaration after it must not count."""
    raw = _doc_archive(
        '<!-- broken comment <meta charset="koi8-r">',
        "ascii only".encode("ascii"),
    )
    result = parse_mhtml(raw)
    assert result.parts[0].charset in (None, "utf-8")
