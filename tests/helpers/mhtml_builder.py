"""In-memory MHTML fixture builders.

Python re-expression of the reference's test builders
(/root/reference/test/helpers/mhtml.js): everything is bytes, so a
test can place any byte sequence in a header or body — which is what
distinguishes a transfer-encoding bug from a charset bug. Single-byte
charset encoders invert the decoder the platform provides (here:
Python codecs), keeping the tests honest against the same mapping the
library uses.
"""

from __future__ import annotations

import base64
import re

CRLF = "\r\n"
DEFAULT_BOUNDARY = "----=_NextPart_000_0000_01C654E0.7F0AD5A0"
_BASE64_LINE_LENGTH = 76

_single_byte_tables: dict[str, dict[str, int]] = {}


def encode_latin1(value: str) -> bytes:
    """One byte per code unit (charCodeAt & 0xFF)."""
    return bytes(ord(c) & 0xFF for c in value)


def encode_utf8(value: str) -> bytes:
    return value.encode("utf-8")


def encode_single_byte_charset(value: str, charset: str) -> bytes:
    """Encode via the inverse of the platform decoder's byte→char table."""
    from mhtml_to_html_spark.mime.kernels import _resolve_codec

    table = _single_byte_tables.get(charset)
    if table is None:
        codec = _resolve_codec(charset)
        table = {}
        for byte in range(0x100):
            ch = bytes([byte]).decode(codec, errors="replace")
            table.setdefault(ch, byte)
        _single_byte_tables[charset] = table
    out = bytearray()
    for ch in value:
        byte = table.get(ch)
        if byte is None:
            raise ValueError(f"{ch!r} cannot be encoded in {charset}")
        out.append(byte)
    return bytes(out)


def concat_bytes(*values) -> bytes:
    """Strings are encoded as Latin-1; bytes and int lists pass through."""
    parts = []
    for value in values:
        if isinstance(value, str):
            parts.append(encode_latin1(value))
        elif isinstance(value, (bytes, bytearray)):
            parts.append(bytes(value))
        else:
            parts.append(bytes(value))
    return b"".join(parts)


def encode_base64_body(data, line_length: int = _BASE64_LINE_LENGTH) -> str:
    encoded = base64.b64encode(concat_bytes(data)).decode("ascii")
    if line_length:
        encoded = re.sub(f"(.{{{line_length}}})", rf"\1{CRLF}", encoded)
    return encoded


def encode_quoted_printable_body(data) -> str:
    out = []
    for byte in concat_bytes(data):
        if byte == 0x3D or byte > 0x7E:
            out.append(f"={byte:02X}")
        else:
            out.append(chr(byte))
    return "".join(out)


def part(
    *,
    content_type: str | None = None,
    transfer_encoding: str | None = None,
    location: str | None = None,
    content_id: str | None = None,
    headers: dict | None = None,
    body="",
    encode=None,
    eol: str = CRLF,
    boundary: str = DEFAULT_BOUNDARY,
) -> bytes:
    """Build one part (≅ reference part(), mhtml.js:99-122)."""
    header_lines = []
    if content_type is not None:
        header_lines.append(f"Content-Type: {content_type}")
    if transfer_encoding is not None:
        header_lines.append(f"Content-Transfer-Encoding: {transfer_encoding}")
    if location is not None:
        header_lines.append(f"Content-Location: {location}")
    if content_id is not None:
        header_lines.append(f"Content-ID: {content_id}")
    for name, value in (headers or {}).items():
        header_lines.append(f"{name}: {value}")
    encoded_body = encode(body) if encode else body
    return concat_bytes(
        f"--{boundary}{eol}",
        (eol.join(header_lines) + eol) if header_lines else "",
        eol,
        encoded_body,
    )


def mhtml_doc(
    *,
    headers=None,
    parts=(),
    boundary: str = DEFAULT_BOUNDARY,
    preamble=None,
    closing: bool = True,
    eol: str = CRLF,
    content_type: str | None = None,
) -> bytes:
    """Build a whole archive (≅ reference mhtml(), mhtml.js:126-138)."""
    default_ct = f'multipart/related;{eol}\tboundary="{boundary}";{eol}\ttype="text/html"'
    if headers is None:
        header_bytes = concat_bytes(
            f"MIME-Version: 1.0{eol}Content-Type: {content_type or default_ct}{eol}"
        )
    else:
        header_bytes = concat_bytes(headers)
    pieces = [header_bytes, eol]
    if preamble is not None:
        pieces += [preamble, eol, eol]
    for item in parts:
        pieces += [item, eol]
    if closing:
        pieces.append(f"--{boundary}--{eol}")
    return concat_bytes(*pieces)


def resources_of(result):
    """Rebuild the multi-key first-wins resources map from part records
    (the reference's `resources`, parse.js:280-293) for test lookups."""
    resources = {}
    for p in result.parts:
        for key, _kind in p.keys:
            resources.setdefault(key, p)
    return resources
