"""RFC 2046 5.1.1: the line break in front of a boundary delimiter
belongs to the delimiter, not the body. Case table ported from
/root/reference/test/boundary.test.js."""

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from tests.helpers.mhtml_builder import DEFAULT_BOUNDARY as BOUNDARY, concat_bytes
from tests.helpers.mhtml_builder import resources_of

LOCATION = "https://example.invalid/r"


def build(body: str, eol: str = "\r\n") -> bytes:
    return concat_bytes(
        f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
        f"--{BOUNDARY}{eol}Content-Type: application/octet-stream{eol}",
        f"Content-Transfer-Encoding: 8bit{eol}Content-Location: {LOCATION}{eol}{eol}",
        body,
        f"{eol}--{BOUNDARY}--{eol}",
    )


BODIES = [
    ("no trailing line break", "AB", "AB"),
    ("really ends with CRLF", "AB\r\n", "AB\r\n"),
    ("really ends with two CRLF", "AB\r\n\r\n", "AB\r\n\r\n"),
    ("interior blank line", "A\r\n\r\nB", "A\r\n\r\nB"),
    ("single line break", "\r\n", "\r\n"),
    ("empty body", "", ""),
]


@pytest.mark.parametrize("name,body,expected", BODIES, ids=[b[0] for b in BODIES])
def test_body_round_trip(name, body, expected):
    res = resources_of(parse_mhtml(build(body)))
    assert LOCATION in res, "the part was not found"
    assert res[LOCATION].data == expected.encode("latin-1")


def test_lf_only_document_keeps_body():
    res = resources_of(parse_mhtml(build("AB", "\n")))
    assert res[LOCATION].data == b"AB"


def test_lf_only_document_keeps_trailing_lf_of_body():
    res = resources_of(parse_mhtml(build("AB\n", "\n")))
    assert res[LOCATION].data == b"AB\n"


def test_line_merely_starting_with_boundary_is_body():
    body = f"A\r\n--{BOUNDARY}xyz\r\nB"
    res = resources_of(parse_mhtml(build(body)))
    assert res[LOCATION].data == body.encode("latin-1")
