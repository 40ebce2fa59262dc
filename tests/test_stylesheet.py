"""Every URL inside a stylesheet comes back as a data URI plus a
comment recording where it came from. Ported from
/root/reference/test/stylesheet.test.js."""

import re

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import convert_page
from tests.helpers.page_builder import ORIGIN, page, resource

PNG_BASE64 = (
    "iVBORw0KGgoAAAABSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
PNG_URI = f"data:image/png;base64,{PNG_BASE64}"
IMAGE_PART = resource(f"{ORIGIN}/i.png", "image/png", PNG_BASE64, "base64")
LINK = '<link rel="stylesheet" href="s.css">'


def stylesheet(body, location=f"{ORIGIN}/s.css"):
    return resource(location, "text/css", body)


def style_of(**options):
    data = convert_page(parse_mhtml(page(**options))).data
    m = re.search(r"<style[^>]*>([\s\S]*?)</style>", data)
    return m.group(1) if m else None


def head_of(**options):
    return re.search(
        r"<head[^>]*>[\s\S]*</head>", convert_page(parse_mhtml(page(**options))).data
    ).group(0)


def test_linked_stylesheet_becomes_style_element():
    assert style_of(head=LINK, parts=[stylesheet("p{color:red}")]) == "p{color:red}"


def test_media_carried_over():
    head = head_of(
        head='<link rel="stylesheet" media="print" href="s.css">',
        parts=[stylesheet("p{color:red}")],
    )
    assert re.search(r'<style[^>]*media="print"', head)


def test_original_url_recorded():
    head = head_of(head=LINK, parts=[stylesheet("p{color:red}")])
    assert f'data-original-href="{ORIGIN}/s.css"' in head


def test_url_inlined_with_comment():
    style = style_of(head=LINK, parts=[stylesheet("p{background:url(i.png)}"), IMAGE_PART])
    assert PNG_URI in style, "the image was not inlined"
    assert f"/* original URL: {ORIGIN}/i.png */" in style, "the original URL was not recorded"


def test_unmatched_url_keeps_address():
    style = style_of(head=LINK, parts=[stylesheet("p{background:url(gone.png)}")])
    assert f"{ORIGIN}/gone.png" in style


@pytest.mark.parametrize(
    "rule",
    ["@import url(other.css);", '@import "other.css";', '@import "other.css" screen;'],
    ids=["url()", "bare-string", "string-with-media"],
)
def test_import_inlined(rule):
    style = style_of(
        head=LINK,
        parts=[stylesheet(rule), stylesheet("p{color:blue}", f"{ORIGIN}/other.css")],
    )
    assert "data:text/css;base64," in style, "the imported sheet was not inlined"


def test_import_with_media_query_keeps_tail():
    style = style_of(
        head=LINK,
        parts=[stylesheet('@import "other.css" screen;'), stylesheet("p{color:blue}", f"{ORIGIN}/other.css")],
    )
    assert re.search(r"data:text/css;base64,[A-Za-z0-9+/=]+\) screen;", style)


def test_import_unmatched_keeps_address():
    style = style_of(head=LINK, parts=[stylesheet('@import "gone.css";')])
    assert f"{ORIGIN}/gone.css" in style


def test_import_chain_followed():
    style = style_of(
        head=LINK,
        parts=[
            stylesheet("@import url(a.css);"),
            stylesheet("@import url(b.css);", f"{ORIGIN}/a.css"),
            stylesheet("p{color:green}", f"{ORIGIN}/b.css"),
        ],
    )
    assert "data:text/css;base64," in style


def test_self_import_terminates():
    style = style_of(head=LINK, parts=[stylesheet("@import url(s.css);p{color:red}")])
    assert isinstance(style, str) and len(style) > 0


def test_broken_import_left_alone():
    style = style_of(head=LINK, parts=[stylesheet("@import;p{color:red}")])
    assert "p{color:red}" in style


def test_data_uri_in_css_untouched():
    style = style_of(head=LINK, parts=[stylesheet(f"p{{background:url({PNG_URI})}}")])
    assert PNG_URI in style
    assert "original URL" not in style, "a data URI has no original URL to record"


def test_url_inside_comment_untouched():
    style = style_of(head=LINK, parts=[stylesheet("/* url(i.png) */ p{color:red}")])
    assert "/* url(i.png) */" in style


def test_inline_style_element_rewritten():
    style = style_of(
        head="<style>p{background:url(i.png)}</style>",
        parts=[IMAGE_PART],
    )
    assert PNG_URI in style


def test_style_attribute_rewritten():
    data = convert_page(
        parse_mhtml(page(body='<p style="background:url(i.png)">x</p>', parts=[IMAGE_PART]))
    ).data
    assert PNG_URI in data
