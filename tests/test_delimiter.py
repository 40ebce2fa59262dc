"""Which lines count as a boundary delimiter. Ported from
/root/reference/test/delimiter.test.js."""

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from tests.helpers.mhtml_builder import resources_of

BOUNDARY = "----=_P"


def header(boundary, eol="\r\n"):
    return f'MIME-Version: 1.0{eol}Content-Type: multipart/related; boundary="{boundary}"{eol}{eol}'


def part(boundary, location, body, eol="\r\n"):
    return (
        f"--{boundary}{eol}Content-Type: application/octet-stream{eol}"
        f"Content-Transfer-Encoding: 8bit{eol}"
        f"Content-Location: {location}{eol}{eol}{body}{eol}"
    )


def document(boundary, parts, closing=None, eol="\r\n"):
    if closing is None:
        closing = f"--{boundary}--\r\n"
    return header(boundary, eol) + "".join(parts) + closing


def body_of(resources, location):
    assert location in resources, f"the part {location} was not found"
    return resources[location].data


def parse_resources(raw: str):
    return resources_of(parse_mhtml(raw.encode("latin-1")))


def test_transport_padding_after_delimiter():
    res = parse_resources(
        header(BOUNDARY)
        + f"--{BOUNDARY}  \t\r\nContent-Type: application/octet-stream\r\nContent-Transfer-Encoding: 8bit\r\n"
        + f"Content-Location: https://e/a\r\n\r\nA\r\n--{BOUNDARY}--  \r\n"
    )
    assert body_of(res, "https://e/a") == b"A"


def test_inner_boundary_extending_outer_does_not_truncate():
    outer, inner = "----=_A", "----=_A_1"
    res = parse_resources(
        document(
            outer,
            [
                part(outer, "https://e/first", "FIRST"),
                f'--{outer}\r\nContent-Type: multipart/alternative; boundary="{inner}"\r\n\r\n'
                + part(inner, "https://e/inner", "INNER")
                + f"--{inner}--\r\n",
                part(outer, "https://e/last", "LAST"),
            ],
        )
    )
    assert body_of(res, "https://e/first") == b"FIRST"
    assert body_of(res, "https://e/last") == b"LAST", "parts after a nested multipart are lost"


def test_boundary_with_suffix_is_content():
    body = f"X\r\n--{BOUNDARY}suffix\r\nY"
    res = parse_resources(document(BOUNDARY, [part(BOUNDARY, "https://e/a", body)]))
    assert body_of(res, "https://e/a") == body.encode("latin-1")


def test_boundary_mid_line_is_content():
    body = f"X --{BOUNDARY} Y"
    res = parse_resources(document(BOUNDARY, [part(BOUNDARY, "https://e/a", body)]))
    assert body_of(res, "https://e/a") == body.encode("latin-1")


def test_short_boundary_does_not_match_lookalikes():
    body = "----AB\r\n---A\r\nZ"
    res = parse_resources(document("--A", [part("--A", "https://e/a", body)]))
    assert body_of(res, "https://e/a") == body.encode("latin-1")


def test_lf_only_delimiters():
    res = parse_resources(
        document(BOUNDARY, [part(BOUNDARY, "https://e/a", "A", "\n")], f"--{BOUNDARY}--\n", "\n")
    )
    assert body_of(res, "https://e/a") == b"A"


def test_every_part_of_plain_multipart_found():
    res = parse_resources(
        document(
            BOUNDARY,
            [
                part(BOUNDARY, "https://e/a", "A"),
                part(BOUNDARY, "https://e/b", "B"),
                part(BOUNDARY, "https://e/c", "C"),
            ],
        )
    )
    assert [body_of(res, f"https://e/{n}") for n in "abc"] == [b"A", b"B", b"C"]


def test_glued_delimiter_still_splits():
    # WebKit writes the delimiter immediately after the markup
    res = parse_resources(
        header(BOUNDARY)
        + f"--{BOUNDARY}\r\nContent-Type: application/octet-stream\r\nContent-Transfer-Encoding: 8bit\r\n"
        + f"Content-Location: https://e/a\r\n\r\n<p>A</p>--{BOUNDARY}\r\n"
        + "Content-Type: application/octet-stream\r\nContent-Transfer-Encoding: 8bit\r\n"
        + f"Content-Location: https://e/b\r\n\r\n<p>B</p>--{BOUNDARY}--\r\n"
    )
    assert body_of(res, "https://e/a") == b"<p>A</p>"
    assert body_of(res, "https://e/b") == b"<p>B</p>"


LAST_PART_HEADER = (
    header(BOUNDARY)
    + f"--{BOUNDARY}\r\nContent-Type: application/octet-stream\r\nContent-Transfer-Encoding: 8bit\r\n"
    + "Content-Location: https://e/a\r\n\r\n"
)

ENDINGS = [
    ("closing delimiter on its own line", f"LAST\r\n--{BOUNDARY}--\r\n"),
    ("closing delimiter with no trailing line break", f"LAST\r\n--{BOUNDARY}--"),
    ("no closing delimiter at all", "LAST\r\n"),
    ("no closing delimiter and no trailing line break", "LAST"),
]


@pytest.mark.parametrize("name,raw", ENDINGS, ids=[e[0] for e in ENDINGS])
def test_last_part_parsed_at_eof(name, raw):
    res = parse_resources(LAST_PART_HEADER + raw)
    assert body_of(res, "https://e/a") == b"LAST"
