"""Generated ids must be stable: the same input converts to the same
bytes every time. Ported from /root/reference/test/ids.test.js."""

from mhtml_to_html_spark.mime import parse_mhtml
from tests.helpers.mhtml_builder import resources_of

BOUNDARY = "----=_B"


def part(headers, body):
    return "\r\n".join([f"--{BOUNDARY}", *headers, "", body])


def build(parts):
    return "\r\n".join(
        [
            "MIME-Version: 1.0",
            f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
            "",
            *parts,
            f"--{BOUNDARY}--",
            "",
        ]
    ).encode("utf-8")


def document(body):
    return part(["Content-Type: text/html; charset=utf-8", "Content-Transfer-Encoding: 8bit"], body)


def image(body):
    return part(["Content-Type: image/png", "Content-Transfer-Encoding: 8bit"], body)


def ids_of(raw):
    return list(resources_of(parse_mhtml(raw)).keys())


def test_anonymous_parts_get_sequential_ids():
    raw = build([document("<html><body>a</body></html>"), image("P1"), image("P2")])
    assert ids_of(raw) == ["_0", "_1", "_2"]


def test_repeated_parses_identical():
    raw = build([document("<html><body>a</body></html>"), image("P")])
    runs = {",".join(ids_of(raw)) for _ in range(5)}
    assert len(runs) == 1, f"ids varied between runs: {runs}"


def test_generated_id_never_collides_with_location():
    raw = build(
        [
            part(
                [
                    "Content-Type: text/html; charset=utf-8",
                    "Content-Transfer-Encoding: 8bit",
                    "Content-Location: _0",
                ],
                "<html><body>a</body></html>",
            ),
            image("P"),
        ]
    )
    ids = ids_of(raw)
    assert len(ids) == 2
    assert len(set(ids)) == 2, f"duplicate ids: {ids}"
    assert "_0" in ids, "the declared Content-Location was overwritten"


def test_many_anonymous_parts_unique():
    raw = build([document("<html><body>a</body></html>")] + [image(f"P{i}") for i in range(50)])
    ids = ids_of(raw)
    assert len(ids) == 51
    assert len(set(ids)) == 51


def test_string_and_bytes_input_same_ids():
    raw = build([document("<html><body>a</body></html>"), image("P")])
    assert ids_of(raw) == list(resources_of(parse_mhtml(raw.decode("utf-8"))).keys())
