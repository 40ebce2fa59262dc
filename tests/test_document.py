"""What the converter does to the document: every rewritten reference,
removed element, and head injection. Ported from
/root/reference/test/document.test.js."""

import re

import pytest

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import convert_page
from tests.helpers.page_builder import DOCUMENT_LOCATION, ORIGIN, page, resource

PNG_BASE64 = (
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
)
PNG_URI = f"data:image/png;base64,{PNG_BASE64}"
IMAGE_LOCATION = f"{ORIGIN}/i.png"


def image_part(location=IMAGE_LOCATION):
    return resource(location, "image/png", PNG_BASE64, "base64")


def convert_options(enable_scripts=False, **options):
    return convert_page(parse_mhtml(page(**options)), enable_scripts=enable_scripts)


def data_of(**options):
    return convert_options(**options).data


def body_of(**options):
    return re.search(r"<body[^>]*>[\s\S]*</body>", data_of(**options)).group(0)


def head_of(**options):
    return re.search(r"<head[^>]*>[\s\S]*</head>", data_of(**options)).group(0)


def test_image_inlined_with_original_url():
    body = body_of(body='<img src="i.png">', parts=[image_part()])
    assert f'src="{PNG_URI}"' in body, "the image was not inlined"
    assert 'data-original-src="i.png"' in body, "the original URL was dropped"


@pytest.mark.parametrize("tag", ["audio", "video", "source"])
def test_media_src_inlined(tag):
    body = body_of(body=f'<{tag} src="i.png"></{tag}>', parts=[image_part()])
    assert PNG_URI in body, f"the src of {tag} was not inlined"


def test_script_src_inlined_when_scripts_enabled():
    result = convert_options(
        enable_scripts=True, body='<script src="i.png"></script>', parts=[image_part()]
    )
    assert PNG_URI in result.data


def test_image_input_inlined_text_input_alone():
    body = body_of(
        body='<input type="image" src="i.png"><input type="text" src="i.png">',
        parts=[image_part()],
    )
    assert body.count(PNG_URI) == 1, "only the image input should be inlined"


@pytest.mark.parametrize("tag", ["table", "td", "th"])
def test_background_attribute_inlined(tag):
    markup = (
        '<table background="i.png"><tr><td>x</td></tr></table>'
        if tag == "table"
        else f'<table><tr><{tag} background="i.png">x</{tag}></tr></table>'
    )
    assert PNG_URI in data_of(body=markup, parts=[image_part()])


def test_base_element_changes_resolution_and_is_removed():
    data = data_of(
        head='<base href="https://other.example/assets/">',
        body='<img src="i.png">',
        parts=[image_part("https://other.example/assets/i.png")],
    )
    assert PNG_URI in data, "the reference did not resolve against the base"
    assert not re.search(r"<base", data, re.I), "the base element was left in the document"


def test_unmatched_reference_kept_absolute():
    body = body_of(body='<img src="missing.png">')
    assert f'src="{ORIGIN}/missing.png"' in body


def test_unfound_resources_reported():
    result = convert_options(
        body=f'<img src="missing.png"><img src="i.png"><img src="{PNG_URI}">',
        parts=[image_part()],
    )
    assert result.unfound_resources == [f"{ORIGIN}/missing.png"]
    complete = convert_options(body='<img src="i.png">', parts=[image_part()])
    assert complete.unfound_resources == []


def test_data_uri_left_as_is():
    body = body_of(body=f'<img src="{PNG_URI}">')
    assert f'src="{PNG_URI}"' in body
    assert "data-original-src" not in body


def test_self_link_keeps_fragment():
    body = body_of(body=f'<a href="{DOCUMENT_LOCATION}#section">a</a><a href="/other">b</a>')
    assert 'href="#section"' in body, "the same-page link was not shortened"
    assert f'href="{ORIGIN}/other"' in body, "the other link was not made absolute"


def test_tracking_and_integrity_removed():
    body = body_of(body='<a href="/x" ping="https://tracker.example/p">a</a>')
    assert "ping=" not in body
    data = data_of(
        head='<link rel="stylesheet" href="s.css" integrity="sha384-abc">',
        parts=[resource(f"{ORIGIN}/s.css", "text/css", "p{color:red}")],
    )
    assert "integrity" not in data


def test_event_handlers_removed_unless_enabled():
    body = body_of(body='<p onclick="boom()" onmouseover="boom()">x</p>')
    assert "onclick" not in body
    enabled = convert_options(
        enable_scripts=True, body='<p onclick="boom()" onmouseover="boom()">x</p>'
    ).data
    assert "onclick" in enabled


def test_scripts_removed_but_json_ld_stays():
    head = '<script>boom()</script><script type="application/ld+json">{"@type":"Thing"}</script>'
    removed = data_of(head=head)
    assert "boom()" not in removed, "a script survived"
    assert '"@type":"Thing"' in removed, "the JSON-LD block was removed"
    enabled = convert_options(enable_scripts=True, head=head).data
    assert "boom()" in enabled


def test_script_text_escaped_once():
    result = convert_options(
        enable_scripts=True,
        head='<meta charset="utf-8">',
        body='<script>document.write("<img src=x />");</script>',
    )
    assert "document.write" in result.data
    assert "\\\\/>" not in result.data, "the self-closing marker was escaped twice"


def test_dropped_invalid_attribute_leaves_no_gap():
    body = body_of(body='<p a="1" "x" b="2">first</p><p c="3" "y">second</p>')
    assert "  " not in body, "a dropped attribute left a gap"
    assert " >" not in body


def test_template_shadow_root_renamed_and_converted():
    data = data_of(
        body='<div><template shadowmode="open"><img src="i.png"></template></div>',
        parts=[image_part()],
    )
    assert 'shadowrootmode="open"' in data
    assert 'shadowmode="open"' not in data
    assert PNG_URI in data, "a reference inside the template was not inlined"


def test_refresh_and_existing_policy_removed():
    head = head_of(
        head='<meta http-equiv="refresh" content="0;url=https://elsewhere.example/">'
        '<meta http-equiv="Content-Security-Policy" content="default-src *">'
    )
    assert "refresh" not in head
    assert "default-src *" not in head


def test_policy_added_scripts_gated():
    assert re.search(r"content-security-policy", head_of(), re.I)
    assert "script-src 'none'" in data_of()
    enabled = convert_options(enable_scripts=True).data
    assert "script-src 'self' 'unsafe-inline' data:" in enabled


def test_head_starts_with_utf8():
    assert re.match(r'^<head><meta charset="utf-8">', head_of())


def test_canonical_link_added_or_kept():
    assert f'rel="canonical" href="{DOCUMENT_LOCATION}"' in data_of()
    data = data_of(head='<link rel="canonical" href="https://canonical.example/">')
    assert data.count("canonical") == 2
    assert "https://canonical.example/" in data


def test_title_from_head_first_wins():
    result = convert_options(head="<title>FIRST</title><title>SECOND</title>")
    assert result.title == "FIRST"


def test_title_outside_head_not_reported():
    result = convert_options(body="<svg><title>NOT THE PAGE TITLE</title></svg>")
    assert result.title is None


def test_favicons_reported_and_inlined():
    result = convert_options(
        head='<link rel="icon" href="i.png" type="image/png" sizes="16x16" media="(min-width: 0px)">',
        parts=[image_part()],
    )
    assert len(result.favicons) == 1
    favicon = result.favicons[0]
    assert favicon["href"] == PNG_URI
    assert favicon["type"] == "image/png"
    assert favicon["sizes"] == "16x16"
    assert favicon["originalHref"] == IMAGE_LOCATION
    assert PNG_URI in result.data


def test_shortcut_icon_reported():
    result = convert_options(head='<link rel="shortcut icon" href="i.png">', parts=[image_part()])
    assert len(result.favicons) == 1


def test_hints_dropped():
    head = head_of(head='<link rel="preload prefetch" href="/a"><link rel="dns-prefetch" href="/b">')
    assert "preload" not in head and "dns-prefetch" not in head
    assert "/a" not in head and "/b" not in head


def test_stylesheet_rel_case_insensitive():
    head = head_of(
        head='<link rel="STYLESHEET" href="s.css">',
        parts=[resource(f"{ORIGIN}/s.css", "text/css", "p{color:red}")],
    )
    assert "p{color:red}" in head
