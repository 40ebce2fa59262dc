"""One-page archive builder (≅ /root/reference/test/helpers/page.js)."""

BOUNDARY = "----=_B"
ORIGIN = "https://example.com"
DOCUMENT_LOCATION = f"{ORIGIN}/"


def resource(location, content_type, body, transfer_encoding="8bit"):
    return "\r\n".join(
        [
            f"--{BOUNDARY}",
            f"Content-Type: {content_type}",
            f"Content-Transfer-Encoding: {transfer_encoding}",
            f"Content-Location: {location}",
            "",
            body,
        ]
    )


def page(head="", body="", parts=()):
    document = resource(
        DOCUMENT_LOCATION,
        "text/html; charset=utf-8",
        f"<html><head>{head}</head><body>{body}</body></html>",
    )
    return "\r\n".join(
        [
            "MIME-Version: 1.0",
            f'Content-Type: multipart/related; boundary="{BOUNDARY}"',
            "",
            document,
            *parts,
            f"--{BOUNDARY}--",
            "",
        ]
    ).encode("utf-8")
