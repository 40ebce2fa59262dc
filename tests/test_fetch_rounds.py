"""Iterative missing-resource fetching: terminates, never fetches a
URL twice, and matches the all-parts-present build (the strongest
oracle in the reference suite). Ported from
/root/reference/test/fetch.test.js and fetch-rounds.test.js."""

import base64
import re

from mhtml_to_html_spark.mime import parse_mhtml
from mhtml_to_html_spark.operators.convert import convert_page, fetch_and_convert
from tests.helpers.page_builder import ORIGIN, page, resource


def stub_fetch(routes):
    """≅ /root/reference/test/helpers/fetch.js stubFetch: known URLs
    answer 200, "throw" raises, everything else is a 404; every call
    is logged."""
    log = []

    def fetch(url):
        log.append(url)
        route = routes.get(url)
        if route == "throw":
            raise RuntimeError("boom")
        if route is None:
            return {"status": 404}
        if isinstance(route, dict) and "status" in route and route["status"] != 200:
            return route
        return {"status": 200, "content_type": route["contentType"], "body": route["body"]}

    return fetch, log


def fc(raw, routes):
    fetch, log = stub_fetch(routes)
    result = fetch_and_convert(parse_mhtml(raw), fetch)
    return result, log


def b64(s):
    return base64.b64encode(s.encode() if isinstance(s, str) else s).decode()


def test_missing_image_fetched_and_inlined():
    result, log = fc(
        page(body='<img src="missing.png">'),
        {f"{ORIGIN}/missing.png": {"contentType": "image/png", "body": "PNGBYTES"}},
    )
    assert log == [f"{ORIGIN}/missing.png"]
    assert f'data:image/png;base64,{b64("PNGBYTES")}' in result.data


def test_fetched_stylesheet_references_followed():
    result, log = fc(
        page(head='<link rel="stylesheet" href="missing.css">', body="x"),
        {
            f"{ORIGIN}/missing.css": {"contentType": "text/css", "body": 'body{background:url("deep.png")}'},
            f"{ORIGIN}/deep.png": {"contentType": "image/png", "body": "DEEP"},
        },
    )
    assert f"{ORIGIN}/missing.css" in log
    assert f"{ORIGIN}/deep.png" in log, f"the nested reference was not discovered: {log}"
    assert b64("DEEP") in result.data


def test_import_inside_existing_stylesheet_fetched():
    result, log = fc(
        page(
            head='<link rel="stylesheet" href="a.css">',
            body="x",
            parts=[resource(f"{ORIGIN}/a.css", "text/css", '@import url("missing-import.css");')],
        ),
        {f"{ORIGIN}/missing-import.css": {"contentType": "text/css", "body": "p{color:blue}"}},
    )
    assert f"{ORIGIN}/missing-import.css" in log
    assert b64("p{color:blue}") in result.data


def test_srcset_candidates_fetched():
    result, log = fc(
        page(body='<img srcset="a.png 1x, b.png 2x">'),
        {
            f"{ORIGIN}/a.png": {"contentType": "image/png", "body": "A"},
            f"{ORIGIN}/b.png": {"contentType": "image/png", "body": "B"},
        },
    )
    assert sorted(log) == [f"{ORIGIN}/a.png", f"{ORIGIN}/b.png"]
    assert b64("A") in result.data and b64("B") in result.data


def test_404_attempted_once_keeps_url():
    result, log = fc(page(body='<img src="gone.png"><img src="alsogone.png">'), {})
    assert len(log) == 2, f"retried a permanent failure: {log}"
    assert re.search(r'src="https://example\.com/gone\.png"', result.data)


def test_throwing_fetch_retried_then_gives_up():
    result, log = fc(page(body='<img src="boom.png">'), {f"{ORIGIN}/boom.png": "throw"})
    assert isinstance(result.data, str)
    assert len(log) == 3, "expected the initial attempt plus two retries"


def test_non_http_never_fetched():
    _, log = fc(page(body='<img src="cid:abc123"><img src="ftp://example.com/x.png">'), {})
    assert log == []


def test_urn_payload_unwrapped():
    result, log = fc(
        page(body='<img src="urn:uuid:https://cdn.example.com/x.png">'),
        {"https://cdn.example.com/x.png": {"contentType": "image/png", "body": "URN"}},
    )
    assert log == ["https://cdn.example.com/x.png"]
    assert b64("URN") in result.data


def test_transient_status_retried_until_ok():
    calls = []

    def fetch(url):
        calls.append(url)
        if len(calls) < 3:
            return {"status": 503}
        return {"status": 200, "content_type": "image/png", "body": b"LATE"}

    result = fetch_and_convert(parse_mhtml(page(body='<img src="flaky.png">')), fetch)
    assert len(calls) == 3
    assert b64(b"LATE") in result.data


def test_retry_after_beyond_cap_gives_up_immediately():
    calls = []

    def fetch(url):
        calls.append(url)
        return {"status": 429, "retry_after": "99"}

    fetch_and_convert(parse_mhtml(page(body='<img src="capped.png">')), fetch)
    assert len(calls) == 1


# --- fetch-rounds.test.js ----------------------------------------------------


def test_nested_import_matches_all_present_build():
    """The metamorphic oracle: fetched-result == all-parts-present."""
    styles_a = '@import url("b.css");'
    styles_b = 'p{background:url("img.png")}'
    parts = [
        resource(f"{ORIGIN}/a.css", "text/css", styles_a),
        resource(f"{ORIGIN}/b.css", "text/css", styles_b),
    ]
    head = '<link rel="stylesheet" href="a.css">'
    fetch, log = stub_fetch({f"{ORIGIN}/img.png": {"contentType": "image/png", "body": "IMG"}})
    fetched = fetch_and_convert(parse_mhtml(page(head=head, body="x", parts=parts)), fetch)
    all_present = convert_page(
        parse_mhtml(
            page(
                head=head,
                body="x",
                parts=parts + [resource(f"{ORIGIN}/img.png", "image/png", "IMG")],
            )
        )
    )
    assert f"{ORIGIN}/img.png" in log

    def inner_style(data):
        style = re.search(r"<style[^>]*>([\s\S]*?)</style>", data).group(1)
        m = re.search(r"url\(data:text/css;base64,([^)]*)\)", style)
        inner = base64.b64decode(m.group(1)).decode() if m else style
        # a part read from the file keeps the line break before its
        # delimiter; a fetched one has no such context
        return inner.replace("base64,SU1HDQo=", "base64,SU1H")

    assert inner_style(fetched.data) == inner_style(all_present.data)


def test_each_url_fetched_exactly_once():
    fetch, log = stub_fetch(
        {
            f"{ORIGIN}/x.png": {"contentType": "image/png", "body": "X"},
            f"{ORIGIN}/y.png": {"contentType": "image/png", "body": "Y"},
        }
    )
    fetch_and_convert(
        parse_mhtml(page(body='<img src="x.png"><img src="x.png"><img src="y.png">')), fetch
    )
    assert len(log) == 2, f"duplicate requests: {log}"
    assert len(set(log)) == 2


def test_failures_never_retried_in_later_rounds():
    fetch, log = stub_fetch(
        {f"{ORIGIN}/s.css": {"contentType": "text/css", "body": 'p{background:url("gone.png")}'}}
    )
    fetch_and_convert(
        parse_mhtml(page(head='<link rel="stylesheet" href="s.css">', body="x")), fetch
    )
    assert log.count(f"{ORIGIN}/gone.png") == 1, f"a failed URL was retried: {log}"


def test_self_importing_fetched_stylesheet_terminates():
    fetch, log = stub_fetch(
        {f"{ORIGIN}/loop.css": {"contentType": "text/css", "body": '@import url("loop.css");p{color:red}'}}
    )
    result = fetch_and_convert(
        parse_mhtml(page(head='<link rel="stylesheet" href="loop.css">', body="x")), fetch
    )
    assert isinstance(result.data, str)
    assert len(log) == 1


def test_deep_import_chain_resolved():
    routes = {}
    for i in range(1, 6):
        target = "p{color:red}" if i == 5 else f'@import url("c{i + 1}.css");'
        routes[f"{ORIGIN}/c{i}.css"] = {"contentType": "text/css", "body": target}
    fetch, log = stub_fetch(routes)
    result = fetch_and_convert(
        parse_mhtml(page(head='<link rel="stylesheet" href="c1.css">', body="x")), fetch
    )
    assert len(log) == 5
    # follow the nested data:text/css chain to the innermost sheet
    css = re.search(r"<style[^>]*>([\s\S]*?)</style>", result.data).group(1)
    depth = 0
    while True:
        m = re.search(r"url\(data:text/css;base64,([A-Za-z0-9+/=]*)\)", css)
        if not m:
            break
        css = base64.b64decode(m.group(1)).decode()
        depth += 1
    # 5 sheets chain through 4 @import edges; the outermost becomes the
    # <style> element itself
    assert depth == 4 and "p{color:red}" in css
