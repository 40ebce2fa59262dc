"""Archives that break the rules: none may crash — either the file is
recovered or it degrades predictably. Parse-level port of
/root/reference/test/malformed.test.js (the data-URI/synthesized-page
assertions belong to the rewrite stage)."""

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.mime.splitter import (
    MISLABELED_DOCUMENT_ANOMALY,
    MISSING_DELIMITERS_ANOMALY,
    UNDECODABLE_BASE64_ANOMALY,
    UNUSED_BOUNDARY_ANOMALY,
)
from tests.helpers.mhtml_builder import concat_bytes, encode_base64_body, resources_of

LOCATION = "https://example.invalid/a"
DOCUMENT = "<html><body><p>RECOVERED</p></body></html>"


def document(boundary, location=LOCATION):
    return (
        f"--{boundary}\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n"
        f"Content-Location: {location}\r\n\r\n{DOCUMENT}\r\n"
    )


def build(declared, used=None, closing=True):
    used = used or declared
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{declared}"\r\n\r\n',
        document(used),
        f"--{used}--\r\n" if closing else "",
    )


def no_boundary(body):
    return concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_NEVER"\r\n\r\n', body
    )


def test_declared_boundary_not_used_is_recovered():
    result = parse_mhtml(build("----=_DECLARED", "----=_ACTUAL"))
    page = resources_of(result)[LOCATION]
    assert b"RECOVERED" in page.data, "the document was lost"
    assert result.anomalies == [{"type": UNUSED_BOUNDARY_ANOMALY}]


def test_boundary_never_appears_body_read_on_its_own():
    result = parse_mhtml(
        no_boundary(f"Content-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n")
    )
    assert b"RECOVERED" in resources_of(result)[LOCATION].data
    assert result.anomalies == [{"type": MISSING_DELIMITERS_ANOMALY}]


def test_markup_body_with_no_headers_read_as_document():
    result = parse_mhtml(no_boundary(DOCUMENT))
    assert any(b"RECOVERED" in p.data for p in result.parts)
    assert result.index is not None


def test_headers_running_into_text_keep_first_line():
    result = parse_mhtml(
        no_boundary("Content-Type: text/plain\r\nfirst line of the text\r\nsecond line")
    )
    data = result.parts[0].data
    assert b"first line of the text" in data, "the line after the headers was eaten"
    assert b"second line" in data


def test_folded_header_in_leftover_body_understood():
    result = parse_mhtml(
        no_boundary(
            f'Content-Type: text/html;\r\n\tcharset="utf-8"\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n'
        )
    )
    assert b"RECOVERED" in resources_of(result)[LOCATION].data


def test_leftover_body_that_is_not_a_document_kept():
    result = parse_mhtml(
        no_boundary("Content-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n\r\niVBORw0KGgo=\r\n")
    )
    assert result.parts[0].data == b"\x89PNG\r\n\x1a\n"
    assert result.index is None


def test_body_neither_markup_nor_headers_has_no_index():
    result = parse_mhtml(no_boundary(concat_bytes(bytes([0x00, 0x01, 0x02]), " rubbish\r\n")))
    assert result.index is None  # convert raises "Index page not found"


def test_single_part_archive_takes_type_from_top_headers():
    raw = concat_bytes(
        f"MIME-Version: 1.0\r\nContent-Type: text/html; charset=utf-8\r\nContent-Location: {LOCATION}\r\n\r\n",
        DOCUMENT,
    )
    result = parse_mhtml(raw)
    assert b"RECOVERED" in resources_of(result)[LOCATION].data
    assert result.index == LOCATION


def test_empty_boundary_parameter_still_gives_document():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary=""\r\n\r\n',
        f"--\r\nContent-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n----\r\n",
    )
    result = parse_mhtml(raw)
    assert any(b"RECOVERED" in p.data for p in result.parts), "the document was lost"


def test_regex_characters_in_boundary_matched_literally():
    result = parse_mhtml(build("a.*b[c]+d"))
    assert b"RECOVERED" in resources_of(result)[LOCATION].data


def test_maximum_length_boundary():
    result = parse_mhtml(build("a" * 70))
    assert b"RECOVERED" in resources_of(result)[LOCATION].data


def test_file_ending_on_blank_line_keeps_part():
    raw = concat_bytes(
        'MIME-Version: 1.0\nContent-Type: multipart/related; boundary="----=_B"\n\n',
        f"------=_B\nContent-Type: text/html\nContent-Location: {LOCATION}\n\n",
    )
    result = parse_mhtml(raw)
    assert len(result.parts) == 1, "the part was dropped"
    assert result.index == LOCATION


def test_nested_multipart_cut_after_inner_headers():
    raw = concat_bytes(
        'MIME-Version: 1.0\nContent-Type: multipart/related;\n\tboundary="----=_OUTER"\n\n',
        '------=_OUTER\nContent-Type: multipart/alternative;\n\tboundary="----=_INNER"\n\n',
        '------=_INNER\nContent-Type: text/html;\n\tcharset="x-user-defined"\n',
        "Content-Transfer-Encoding: quoted-printable\n\n",
    )
    result = parse_mhtml(raw)
    assert result.index is not None, "the innermost part was lost"
    assert any(p.content_type and p.content_type.startswith("text/html") for p in result.parts)


def test_file_cut_mid_part_keeps_what_it_had():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html; charset=utf-8\r\nContent-Transfer-Encoding: 8bit\r\n",
        f"Content-Location: {LOCATION}\r\n\r\n<html><body><p>TRUNCATED",
    )
    result = parse_mhtml(raw)
    assert b"TRUNCATED" in resources_of(result)[LOCATION].data


def test_plain_html_file_converted_as_document():
    result = parse_mhtml(
        concat_bytes(
            '<html xmlns:o="urn:schemas-microsoft-com:office:office"><head>\r\n',
            '<meta http-equiv="Content-Type" content="text/html; charset=windows-1252">\r\n',
            "<title>PLAIN</title></head><body><p>RECOVERED</p></body></html>\r\n",
        )
    )
    assert result.anomalies == [{"type": MISLABELED_DOCUMENT_ANOMALY}]
    assert "RECOVERED" in result.parts[0].text
    assert result.index is not None


def test_leading_whitespace_does_not_hide_plain_html():
    result = parse_mhtml(concat_bytes("\r\n  \r\n<html><body><p>RECOVERED</p></body></html>"))
    assert result.anomalies == [{"type": MISLABELED_DOCUMENT_ANOMALY}]
    assert b"RECOVERED" in result.parts[0].data


def test_bom_does_not_hide_plain_html():
    result = parse_mhtml(
        concat_bytes(bytes([0xEF, 0xBB, 0xBF]), "<html><body><p>RECOVERED</p></body></html>")
    )
    assert result.anomalies == [{"type": MISLABELED_DOCUMENT_ANOMALY}]
    assert "RECOVERED" in result.parts[0].text


def _utf16(text: str, little_endian: bool) -> bytes:
    import struct

    fmt = "<H" if little_endian else ">H"
    out = struct.pack(fmt, 0xFEFF)
    for ch in text:
        out += struct.pack(fmt, ord(ch))
    return out


def test_utf16_plain_html_recognized_and_decoded():
    for little_endian in (True, False):
        result = parse_mhtml(_utf16("<html><body><p>RECOVERED</p></body></html>", little_endian))
        assert result.anomalies == [{"type": MISLABELED_DOCUMENT_ANOMALY}]
        assert "RECOVERED" in result.parts[0].text, "lost behind its byte order mark"


def _single_part(content_type, body, transfer_encoding="8bit"):
    return concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        f"------=_B\r\nContent-Type: {content_type}\r\nContent-Transfer-Encoding: {transfer_encoding}\r\n",
        f"Content-Location: https://e/thing\r\n\r\n{body}\r\n------=_B--\r\n",
    )


def test_false_base64_declaration_read_as_is():
    result = parse_mhtml(_single_part("text/html", DOCUMENT, "base64"))
    part = result.parts[0]
    assert DOCUMENT.encode() == part.data, "the document was lost behind its false declaration"
    assert {"type": UNDECODABLE_BASE64_ANOMALY, "id": "https://e/thing"} in result.anomalies


def test_undecodable_base64_reports_part():
    result = parse_mhtml(_single_part("text/html", "@@ not base64 @@", "base64"))
    assert result.anomalies == [
        {"type": UNDECODABLE_BASE64_ANOMALY, "id": "https://e/thing"}
    ]


def test_headerless_part_still_gets_id():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        f"------=_B\r\nContent-Type: text/html\r\nContent-Location: {LOCATION}\r\n\r\n{DOCUMENT}\r\n",
        "------=_B\r\n\r\nno headers here\r\n------=_B--\r\n",
    )
    resources = resources_of(parse_mhtml(raw))
    assert len(resources) == 2, "the headerless part was lost"
    assert "_0" in resources


def test_duplicate_content_id_resolves_consistently():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-Location: https://e/index\r\n\r\n",
        '<html><body><iframe src="cid:dup"></iframe></body></html>\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-ID: <dup>\r\nContent-Location: https://e/one\r\n\r\n",
        "<html><body>FIRST</body></html>\r\n",
        "------=_B\r\nContent-Type: text/html\r\nContent-ID: <dup>\r\nContent-Location: https://e/two\r\n\r\n",
        "<html><body>SECOND</body></html>\r\n------=_B--\r\n",
    )
    first = resources_of(parse_mhtml(raw))["<dup>"].part_id
    second = resources_of(parse_mhtml(raw))["<dup>"].part_id
    assert first == second, "the same archive resolved differently twice"
    # resources map is first-wins: the first <dup> part holds the key
    assert first == "https://e/one"


def test_part_addressed_by_cid_and_location():
    raw = concat_bytes(
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n',
        "------=_B\r\nContent-Type: text/html\r\nContent-Location: https://e/index\r\n\r\n",
        '<html><body><img src="https://e/p.png"><iframe src="cid:both"></iframe></body></html>\r\n',
        "------=_B\r\nContent-Type: image/png\r\nContent-Transfer-Encoding: base64\r\n",
        "Content-ID: <both>\r\nContent-Location: https://e/p.png\r\n\r\niVBORw0KGgo=\r\n------=_B--\r\n",
    )
    resources = resources_of(parse_mhtml(raw))
    assert resources["https://e/p.png"] is resources["<both>"]


def test_clean_archive_reports_nothing():
    result = parse_mhtml(build("----=_B"))
    assert result.anomalies == [], "parsing reported an anomaly"
