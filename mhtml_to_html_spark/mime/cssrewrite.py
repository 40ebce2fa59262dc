"""Targeted CSS rewriter (P14/W20): url() and @import, nothing else.

The reference vendors css-tree and re-generates the whole sheet; the
only nodes it ever touches are Url values and @import preludes
(/root/reference/lib/convert.js:695-768), so this module rewrites
exactly those tokens surgically and leaves every other byte of the
sheet as written — same semantics, and a parse failure simply cannot
lose the sheet (the passthrough the reference implements via
try/catch).

The scanner respects comments and strings, so a ``url(`` inside either
is never rewritten.
"""

from __future__ import annotations

import re
from collections.abc import Callable

_URL_OPEN_RE = re.compile(r"url\(", re.IGNORECASE)
_IMPORT_RE = re.compile(r"@import\b", re.IGNORECASE)


def _skip_comment(text: str, i: int) -> int:
    end = text.find("*/", i + 2)
    return len(text) if end == -1 else end + 2


def _skip_string(text: str, i: int) -> int:
    quote = text[i]
    i += 1
    while i < len(text):
        if text[i] == "\\":
            i += 2
            continue
        if text[i] == quote:
            return i + 1
        i += 1
    return i


def _read_url_token(text: str, i: int) -> tuple[str, int] | None:
    """At ``url(``: return (raw inner value unquoted, end index past ')')."""
    j = i + 4
    n = len(text)
    while j < n and text[j] in " \t\r\n\f":
        j += 1
    if j < n and text[j] in "\"'":
        quote = text[j]
        k = j + 1
        buf = []
        while k < n and text[k] != quote:
            if text[k] == "\\" and k + 1 < n:
                buf.append(text[k + 1])
                k += 2
                continue
            buf.append(text[k])
            k += 1
        k += 1  # past quote
        while k < n and text[k] in " \t\r\n\f":
            k += 1
        if k < n and text[k] == ")":
            return "".join(buf), k + 1
        return None
    # unquoted: up to ')' (no unescaped parens/space allowed by the grammar)
    k = j
    buf = []
    while k < n and text[k] != ")":
        if text[k] == "\\" and k + 1 < n:
            buf.append(text[k + 1])
            k += 2
            continue
        buf.append(text[k])
        k += 1
    if k < n:
        return "".join(buf).strip(), k + 1
    return None


def rewrite_css(
    text: str,
    replace_url: Callable[[str], str | None],
    replace_import: Callable[[str], str | None] | None = None,
) -> str:
    """Rewrite url() tokens and @import preludes.

    ``replace_url(path)`` returns the full replacement for the whole
    ``url(...)`` token (or None to leave it verbatim);
    ``replace_import(path)`` likewise for the @import prelude's url or
    string component (media-query tails are preserved).
    """
    out = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "/" and text[i : i + 2] == "/*":
            end = _skip_comment(text, i)
            out.append(text[i:end])
            i = end
            continue
        if ch in "\"'":
            end = _skip_string(text, i)
            out.append(text[i:end])
            i = end
            continue
        if ch == "@" and _IMPORT_RE.match(text, i) and replace_import is not None:
            # prelude runs to ';' or '{'; first component is url() or a string
            j = i + len("@import")
            seg_end = j
            while seg_end < n and text[seg_end] not in ";{":
                if text[seg_end] in "\"'":
                    seg_end = _skip_string(text, seg_end)
                    continue
                seg_end += 1
            prelude = text[j:seg_end]
            replaced = _rewrite_import_prelude(prelude, replace_import)
            if replaced is not None:
                out.append("@import" + replaced)
            else:
                out.append(text[i:seg_end])
            i = seg_end
            continue
        if (ch in "uU") and _URL_OPEN_RE.match(text, i) and _is_token_start(text, i):
            token = _read_url_token(text, i)
            if token is not None:
                path, end = token
                replacement = replace_url(path)
                if replacement is not None:
                    out.append(replacement)
                    i = end
                    continue
            out.append(ch)
            i += 1
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _is_token_start(text: str, i: int) -> bool:
    return i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "-_")


def _rewrite_import_prelude(prelude: str, replace_import) -> str | None:
    stripped_idx = 0
    n = len(prelude)
    while stripped_idx < n and prelude[stripped_idx] in " \t\r\n\f":
        stripped_idx += 1
    if stripped_idx >= n:
        return None  # broken "@import;" imports nothing and is left alone
    lead = prelude[:stripped_idx]
    rest = prelude[stripped_idx:]
    if rest[:1] in "\"'":
        end = _skip_string(rest, 0)
        path = rest[1 : end - 1]
        tail = rest[end:]
    elif _URL_OPEN_RE.match(rest):
        token = _read_url_token(rest, 0)
        if token is None:
            return None
        path, end = token
        tail = rest[end:]
    else:
        return None  # neither url nor string: imports nothing, left alone
    replacement = replace_import(path)
    if replacement is None:
        return None
    return f"{lead}{replacement}{tail}"
