"""All five transfer encodings round-trip byte-exactly in one shared
document. Ported from /root/reference/test/transfer-encoding.test.js."""

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from tests.helpers.mhtml_builder import concat_bytes, resources_of

BOUNDARY = "----=_B"

CASES = [
    ("7bit", "7bit", "AB", "AB"),
    ("8bit", "8bit", "AB", "AB"),
    ("binary", "binary", "AB", "AB"),
    ("base64", "base64", "QUI=", "AB"),
    ("quoted-printable", "quoted-printable", "AB", "AB"),
    ("8bit interior line break", "8bit", "A\r\nB", "A\r\nB"),
    ("quoted-printable soft line break", "quoted-printable", "A=\r\nB", "AB"),
    ("8bit empty body", "8bit", "", ""),
]

RAW = concat_bytes(
    f'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="{BOUNDARY}"\r\n\r\n',
    *[
        f"--{BOUNDARY}\r\nContent-Type: application/octet-stream\r\n"
        f"Content-Transfer-Encoding: {encoding}\r\nContent-Location: https://e/r{i}\r\n\r\n{body}\r\n"
        for i, (_, encoding, body, _e) in enumerate(CASES)
    ],
    f"--{BOUNDARY}--\r\n",
)

RESOURCES = resources_of(parse_mhtml(RAW))


@pytest.mark.parametrize(
    "index,name,expected",
    [(i, c[0], c[3]) for i, c in enumerate(CASES)],
    ids=[c[0] for c in CASES],
)
def test_round_trip(index, name, expected):
    resource = RESOURCES.get(f"https://e/r{index}")
    assert resource is not None, "the part was not found"
    assert resource.data == expected.encode("latin-1")
