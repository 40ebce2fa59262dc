"""srcset candidates and descriptors must survive the round trip.
Parser-level port of /root/reference/test/srcset.test.js (the data-URI
inlining assertions belong to the rewrite stage; here the candidates
are resolved with a mapping function, mirroring the rewrite walk)."""

from mhtml_to_html_spark.mime.srcset import Candidate, parse_srcset, serialize_srcset


def rewrite(srcset: str, mapping: dict[str, str]) -> str:
    candidates = parse_srcset(srcset)
    for c in candidates:
        c.url = mapping.get(c.url, c.url)
    return serialize_srcset(candidates)


def test_width_descriptors_survive():
    assert rewrite("a.png 1w, b.png 2w", {"a.png": "A", "b.png": "B"}) == "A 1w, B 2w"


def test_density_descriptors_survive():
    assert rewrite("a.png 1x, b.png 2x", {"a.png": "A", "b.png": "B"}) == "A 1x, B 2x"


def test_density_of_zero_survives():
    # the spec only rejects densities below zero; a falsy check used to
    # drop the descriptor
    assert rewrite("a.png 0x, b.png 2x", {"a.png": "A", "b.png": "B"}) == "A 0x, B 2x"


def test_width_and_height_survive_together():
    assert rewrite("a.png 100w 50h", {"a.png": "A"}) == "A 100w 50h"


def test_invalid_descriptor_kept_as_written():
    assert rewrite("a.png 5q", {"a.png": "A"}) == "A 5q"


def test_parenthesized_descriptor_kept_whole():
    assert rewrite("a.png calc(1x + 1x)", {"a.png": "A"}) == "A calc(1x + 1x)"


def test_candidate_without_descriptor():
    assert rewrite("a.png", {"a.png": "A"}) == "A"


def test_unmapped_candidate_keeps_address():
    assert rewrite("a.png 1x, gone.png 2x", {"a.png": "A"}) == "A 1x, gone.png 2x"


def test_url_containing_comma_not_split():
    assert rewrite("a,b.png 1x", {"a,b.png": "A"}) == "A 1x"


def test_extra_whitespace_tolerated():
    assert rewrite("  a.png   1x  ,\n  b.png   2x  ", {"a.png": "A", "b.png": "B"}) == "A 1x, B 2x"


def test_same_candidate_twice_rewritten_both_times():
    assert rewrite("a.png 1x, a.png 2x", {"a.png": "A"}) == "A 1x, A 2x"


def test_trailing_comma_on_url():
    assert parse_srcset("a.png, b.png 2x")[0].url == "a.png"


def test_fractional_density_formats_like_js():
    assert serialize_srcset([Candidate(url="a", d=0.5)]) == "a 0.5x"
    assert serialize_srcset([Candidate(url="a", d=2.0)]) == "a 2x"


def test_parse_fields():
    c = parse_srcset("img.png 100w")[0]
    assert (c.url, c.w, c.d, c.h, c.descriptors) == ("img.png", 100, None, None, None)
    c = parse_srcset("img.png 1.5x")[0]
    assert c.d == 1.5
