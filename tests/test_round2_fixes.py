"""Round-2 parity fixes pinned by tests.

- embedded-MHTML index REPLACEMENT (parse.js:171: the embedded
  archive's index unconditionally replaces the outer one);
- WHATWG x-user-defined decoding (0x80-0xFF → U+F780-F7FF);
- trailing-dot hosts preserved (new URL().href keeps them);
- CSS url() found-path stores the rewritten stylesheet bytes so
  nested rewrites survive inlining (convert.js:721-726).
"""

import base64
import re

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.mime.kernels import decode_string
from mhtml_to_html_spark.operators.convert import convert_page
from mhtml_to_html_spark.urlnorm import canonicalize_url, normalize_location
from tests.helpers.page_builder import ORIGIN, page, resource

OUTER = "----=_O"
INNER = "----=_I"


def _archive(parts, boundary=OUTER):
    return (
        "\r\n".join(
            [
                "MIME-Version: 1.0",
                f'Content-Type: multipart/related; boundary="{boundary}"',
                "",
                *parts,
                f"--{boundary}--",
                "",
            ]
        )
    ).encode("utf-8")


def _part(location, content_type, body, boundary=OUTER):
    return "\r\n".join(
        [
            f"--{boundary}",
            f"Content-Type: {content_type}",
            "Content-Transfer-Encoding: 8bit",
            f"Content-Location: {location}",
            "",
            body,
        ]
    )


def _embedded_container(inner_parts):
    inner_body = "\r\n".join([*inner_parts, f"--{INNER}--"])
    return "\r\n".join(
        [
            f"--{OUTER}",
            f'Content-Type: multipart/alternative; boundary="{INNER}"',
            "",
            inner_body,
        ]
    )


# --- embedded index replacement (parse.js:171) ------------------------------


def test_embedded_index_replaces_outer_document():
    raw = _archive(
        [
            _part("https://e/outer", "text/html", "<html>OUTER</html>"),
            _embedded_container(
                [_part("https://e/inner", "text/html", "<html>INNER</html>", INNER)]
            ),
        ]
    )
    result = parse_mhtml(raw)
    assert result.index == "https://e/inner"


def test_embedded_archive_without_document_clears_index():
    raw = _archive(
        [
            _part("https://e/outer", "text/html", "<html>OUTER</html>"),
            _embedded_container([_part("https://e/x.txt", "text/plain", "T", INNER)]),
        ]
    )
    result = parse_mhtml(raw)
    assert result.index is None


def test_document_after_empty_embedded_archive_claims_index():
    raw = _archive(
        [
            _part("https://e/outer", "text/html", "<html>OUTER</html>"),
            _embedded_container([_part("https://e/x.txt", "text/plain", "T", INNER)]),
            _part("https://e/late", "text/html", "<html>LATE</html>"),
        ]
    )
    result = parse_mhtml(raw)
    assert result.index == "https://e/late"


def test_document_before_embedded_with_document_is_not_index():
    raw = _archive(
        [
            _embedded_container(
                [_part("https://e/inner", "text/html", "<html>INNER</html>", INNER)]
            ),
            _part("https://e/late", "text/html", "<html>LATE</html>"),
        ]
    )
    result = parse_mhtml(raw)
    # the embedded archive's document is the index; the later outer
    # document must not displace it (index set only while None)
    assert result.index == "https://e/inner"


# --- x-user-defined (WHATWG custom table) ------------------------------------


def test_x_user_defined_maps_high_bytes_to_private_use():
    data = bytes([0x41, 0x80, 0xFF])
    assert decode_string(data, "x-user-defined") == "A" + chr(0xF780) + chr(0xF7FF)


def test_x_user_defined_ascii_passthrough():
    assert decode_string(b"hello", "x-user-defined") == "hello"


# --- trailing-dot hosts -------------------------------------------------------


def test_trailing_dot_host_preserved():
    assert normalize_location("http://example.com./x") == "http://example.com./x"
    assert canonicalize_url("http://example.com./x") == "http://example.com./x"


def test_trailing_dot_and_bare_host_stay_distinct():
    assert canonicalize_url("http://example.com./") != canonicalize_url(
        "http://example.com/"
    )


# --- nested stylesheet inlined via url() keeps rewrites -----------------------


def test_css_url_to_stylesheet_inlines_rewritten_bytes():
    png_b64 = (
        "iVBORw0KGgoAAAABSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDw"
        "AEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    parts = [
        resource(f"{ORIGIN}/outer.css", "text/css", "p{background:url(inner.css)}"),
        resource(f"{ORIGIN}/inner.css", "text/css", "q{background:url(i.png)}"),
        resource(f"{ORIGIN}/i.png", "image/png", png_b64, "base64"),
    ]
    data = convert_page(
        parse_mhtml(page(head='<link rel="stylesheet" href="outer.css">', parts=parts))
    ).data
    style = re.search(r"<style[^>]*>([\s\S]*?)</style>", data).group(1)
    m = re.search(r"url\(data:text/css[^;]*;base64,([A-Za-z0-9+/=]+)\)", style)
    assert m, "inner stylesheet was not inlined as a data URI"
    inner = base64.b64decode(m.group(1)).decode("utf-8")
    assert "data:image/png;base64," in inner, (
        "nested url() rewrite was dropped — stale part bytes were inlined"
    )
