"""How a reference in the document is matched against a part of the
archive. Case tables ported from /root/reference/test/urls.test.js."""

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.resolve import resolve_reference
from tests.helpers.mhtml_builder import resources_of

BOUNDARY = "----=_B"
DOCUMENT_LOCATION = "https://e/dir/page.html"
PNG = "iVBORw0KGgo="
PNG_BYTES = b"\x89PNG\r\n\x1a\n"


def build(reference, location=None, content_id=None, document_location=DOCUMENT_LOCATION, parts=()):
    image = "\r\n".join(
        [
            f"--{BOUNDARY}",
            "Content-Type: image/png",
            "Content-Transfer-Encoding: base64",
            *([] if location is None else [f"Content-Location: {location}"]),
            *([] if content_id is None else [f"Content-ID: {content_id}"]),
            "",
            PNG,
        ]
    )
    return "\r\n".join(
        [
            "MIME-Version: 1.0",
            f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
            "",
            f"--{BOUNDARY}",
            "Content-Type: text/html; charset=utf-8",
            "Content-Transfer-Encoding: 8bit",
            f"Content-Location: {document_location}",
            "",
            f'<html><body><img src="{reference}"></body></html>',
            image,
            *parts,
            f"--{BOUNDARY}--",
            "",
        ]
    ).encode("utf-8")


def matches(reference, location=None, content_id=None):
    result = parse_mhtml(build(reference, location, content_id))
    resources = resources_of(result)
    found = resolve_reference(resources, reference, DOCUMENT_LOCATION)
    return found is not None and found.data == PNG_BYTES


MATCHING = [
    ("plain relative reference", "i.png", "https://e/dir/i.png"),
    ("relative Content-Location", "i.png", "i.png"),
    ("dot segments in the Content-Location", "i.png", "https://e/dir/sub/../i.png"),
    ("dot segments in the reference", "sub/../i.png", "https://e/dir/i.png"),
    ("explicit default port", "i.png", "https://e:443/dir/i.png"),
    ("upper case host", "i.png", "https://E/dir/i.png"),
    ("space encoded on both sides", "my%20image.png", "https://e/dir/my%20image.png"),
    ("space written raw in the Content-Location", "my%20image.png", "https://e/dir/my image.png"),
    ("space written raw on both sides", "my image.png", "https://e/dir/my image.png"),
    ("non-ASCII written raw on both sides", "café.png", "https://e/dir/café.png"),
    ("non-ASCII encoded in the reference only", "caf%C3%A9.png", "https://e/dir/café.png"),
    ("Cyrillic encoded in the reference only", "%D1%84.png", "https://e/dir/ф.png"),
    ("same query on both sides", "i.png?v=2", "https://e/dir/i.png?v=2"),
]


@pytest.mark.parametrize("name,reference,location", MATCHING, ids=[m[0] for m in MATCHING])
def test_matching(name, reference, location):
    assert matches(reference, location), f"{reference} did not find {location}"


NOT_MATCHING = [
    # a fragment selects a place inside a resource
    ("fragment the part does not carry", "i.png#icon", "https://e/dir/i.png"),
    # a query is part of the address
    ("query the part does not carry", "i.png?v=2", "https://e/dir/i.png"),
    # percent escapes are case-insensitive in RFC 3986, but the URL
    # parser does not normalize them
    ("escapes differing only in case", "a%2Fb.png", "https://e/dir/a%2fb.png"),
]


@pytest.mark.parametrize("name,reference,location", NOT_MATCHING, ids=[m[0] for m in NOT_MATCHING])
def test_deliberately_not_matching(name, reference, location):
    assert not matches(reference, location), f"behaviour changed for {reference}"


def test_cid_reference_finds_part_by_content_id():
    assert matches("cid:x@y", None, "<x@y>")


def test_location_is_identity_even_with_content_id():
    result = parse_mhtml(build("i.png", "https://e/dir/i.png", "<x@y>"))
    resources = resources_of(result)
    assert "https://e/dir/i.png" in resources, "the part is not keyed by its location"
    assert "<x@y>" in resources, "the part is not reachable by its Content-ID"
    assert resources["https://e/dir/i.png"] is resources["<x@y>"]
    assert resources["https://e/dir/i.png"].part_id == "https://e/dir/i.png"


def test_address_stored_as_references_resolve():
    result = parse_mhtml(build("i.png", "https://E:443/dir/sub/../i.png"))
    resources = resources_of(result)
    assert "https://e/dir/i.png" in resources, "the address was not normalized"
    assert "https://E:443/dir/sub/../i.png" in resources, "the as-written address is unreachable"


def test_first_of_two_parts_sharing_address_wins():
    raw = "\r\n".join(
        [
            "MIME-Version: 1.0",
            f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
            "",
            f"--{BOUNDARY}",
            "Content-Type: text/html; charset=utf-8",
            "Content-Transfer-Encoding: 8bit",
            f"Content-Location: {DOCUMENT_LOCATION}",
            "",
            '<html><body><img src="i.png"></body></html>',
            f"--{BOUNDARY}",
            "Content-Type: text/plain",
            "Content-Transfer-Encoding: 8bit",
            "Content-Location: https://e/dir/i.png",
            "",
            "FIRST",
            f"--{BOUNDARY}",
            "Content-Type: text/plain",
            "Content-Transfer-Encoding: 8bit",
            "Content-Location: https://e/dir/i.png",
            "",
            "SECOND",
            f"--{BOUNDARY}--",
            "",
        ]
    ).encode("utf-8")
    resources = resources_of(parse_mhtml(raw))
    assert resources["https://e/dir/i.png"].data == b"FIRST"
