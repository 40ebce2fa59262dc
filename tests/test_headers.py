"""Raw non-ASCII header bytes are recovered with the document charset;
RFC 2047 encoded words decode with same-charset merging. Ported from
/root/reference/test/headers.test.js (parse-level: the reference
surfaces these through page-info JSON-LD; we assert on the parsed
header map + decode_mime_header directly)."""

import base64

import pytest

from mhtml_to_html_spark.mime import decode_mime_header, parse_mhtml
from tests.helpers.mhtml_builder import (
    concat_bytes,
    encode_base64_body,
    encode_quoted_printable_body,
    encode_single_byte_charset,
    encode_utf8,
)

BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
LOCATION = "http://example.invalid/p.htm"
CHARSETS = ["koi8-r", "windows-1251"]
SAVED = "Сохранено"
TITLE = "Архитектура"
REPLACEMENT = "�"

ENCODINGS = {
    "8bit": lambda d: d,
    "quoted-printable": encode_quoted_printable_body,
    "base64": encode_base64_body,
}


def build(charset, declared_in="the part", encoding="8bit", ascii_from=False, folded=False):
    title = encode_single_byte_charset(TITLE, charset)
    meta = (
        f'<META http-equiv="Content-Type" content="text/html; charset={charset}">'
        if declared_in == "a meta"
        else ""
    )
    document = concat_bytes(
        f"<html><head>{meta}<title>", title, "</title></head><body><p>body</p></body></html>"
    )
    if ascii_from:
        from_header = concat_bytes("From: <Saved by Microsoft Internet Explorer 5>\r\n")
    else:
        tail = " Microsoft\r\n\tInternet Explorer 5>\r\n" if folded else " Microsoft Internet Explorer 5>\r\n"
        from_header = concat_bytes("From: <", encode_single_byte_charset(SAVED, charset), tail)
    subject_b64 = base64.b64encode(title).decode("ascii")
    return concat_bytes(
        from_header,
        f"Subject: =?{charset}?B?{subject_b64}?=\r\n",
        "Date: Fri, 31 Mar 2006 19:25:16 +0400\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related;\r\n\tboundary="{BOUNDARY}";\r\n\ttype="text/html"\r\n\r\n',
        f"--{BOUNDARY}\r\nContent-Type: text/html",
        f';\r\n\tcharset="{charset}"' if declared_in == "the part" else "",
        f"\r\nContent-Transfer-Encoding: {encoding}\r\nContent-Location: {LOCATION}\r\n\r\n",
        ENCODINGS[encoding](document),
        f"\r\n--{BOUNDARY}--\r\n",
    )


@pytest.mark.parametrize("encoding", list(ENCODINGS))
@pytest.mark.parametrize("declared_in", ["the part", "a meta"])
@pytest.mark.parametrize("charset", CHARSETS)
def test_raw_header_bytes_recovered(charset, declared_in, encoding):
    result = parse_mhtml(build(charset, declared_in, encoding))
    assert result.headers["from"] == f"<{SAVED} Microsoft Internet Explorer 5>"
    assert decode_mime_header(result.headers["subject"]) == TITLE


def test_folded_header_recovered_as_whole():
    result = parse_mhtml(build("koi8-r", folded=True))
    value = result.headers["from"]
    assert SAVED in value, f"lost the raw bytes: {value}"
    assert "Internet Explorer 5" in value, f"lost the continuation line: {value}"


def test_ascii_header_untouched():
    result = parse_mhtml(build("koi8-r", ascii_from=True))
    assert result.headers["from"] == "<Saved by Microsoft Internet Explorer 5>"
    assert decode_mime_header(result.headers["subject"]) == TITLE


def test_utf8_document_leaves_headers_alone():
    raw = concat_bytes(
        "From: <Saved by Microsoft Internet Explorer 5>\r\nSubject: plain\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="utf-8"\r\nContent-Transfer-Encoding: 8bit\r\n',
        f"Content-Location: {LOCATION}\r\n\r\n",
        encode_utf8(f"<html><head><title>{TITLE}</title></head><body><p>body</p></body></html>"),
        f"\r\n--{BOUNDARY}--\r\n",
    )
    result = parse_mhtml(raw)
    assert result.headers["from"] == "<Saved by Microsoft Internet Explorer 5>"
    assert result.headers["subject"] == "plain"


def test_unrepairable_bytes_do_not_break_parsing():
    # 0x80 0x81 is invalid UTF-8 and the document declares UTF-8
    raw = concat_bytes(
        "From: <",
        bytes([0x80, 0x81]),
        ">\r\nMIME-Version: 1.0\r\n",
        f'Content-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f'--{BOUNDARY}\r\nContent-Type: text/html; charset="utf-8"\r\nContent-Transfer-Encoding: 8bit\r\n',
        f"Content-Location: {LOCATION}\r\n\r\n<html><body><p>body</p></body></html>\r\n--{BOUNDARY}--\r\n",
    )
    result = parse_mhtml(raw)
    assert REPLACEMENT in result.headers["from"]


# --- RFC 2047 encoded-word semantics (decode_mime_header directly) ----------


def qp_word(raw: bytes, charset: str) -> str:
    return f"=?{charset}?Q?" + "".join(f"={b:02X}" for b in raw) + "?="


def b64_word(raw: bytes, charset: str) -> str:
    return f"=?{charset}?B?{base64.b64encode(raw).decode('ascii')}?="


SPLIT = "イオン"
SPLIT_BYTES = SPLIT.encode("utf-8")


@pytest.mark.parametrize("word", [qp_word, b64_word], ids=["quoted-printable", "base64"])
def test_character_split_across_two_words(word):
    # the cut falls inside the second character: neither word decodes alone
    subject = word(SPLIT_BYTES[:5], "utf-8") + " " + word(SPLIT_BYTES[5:], "utf-8")
    assert decode_mime_header(subject) == SPLIT


def test_character_split_across_three_words():
    subject = " ".join(
        qp_word(chunk, "utf-8") for chunk in [SPLIT_BYTES[:4], SPLIT_BYTES[4:5], SPLIT_BYTES[5:]]
    )
    assert decode_mime_header(subject) == SPLIT


def test_adjacent_words_different_charsets():
    subject = (
        b64_word(encode_single_byte_charset(SAVED, "koi8-r"), "koi8-r")
        + " "
        + b64_word(encode_single_byte_charset(TITLE, "windows-1251"), "windows-1251")
    )
    assert decode_mime_header(subject) == SAVED + TITLE


def test_text_around_and_between_words_preserved():
    word = b64_word(SPLIT.encode("utf-8"), "utf-8")
    assert decode_mime_header(f"before {word} after") == f"before {SPLIT} after"


def test_single_encoded_word():
    assert decode_mime_header(b64_word(TITLE.encode("utf-8"), "utf-8")) == TITLE


def test_malformed_word_left_verbatim():
    assert decode_mime_header("=?utf-8?B?no-terminator") == "=?utf-8?B?no-terminator"


@pytest.mark.parametrize("subject", ["cut =?utf-8", "cut =?utf-8?B"])
def test_cut_off_word_left_verbatim(subject):
    assert decode_mime_header(subject) == subject


def test_unusable_base64_keeps_value_as_text():
    assert decode_mime_header("=?utf-8?B?%%%?=") == "%%%"
