"""WHATWG srcset attribute parser/serializer (P11/P12).

Implements the spec algorithm
(https://html.spec.whatwg.org/multipage/images.html#parse-a-srcset-attribute)
with the reference's one deliberate deviation
(/root/reference/lib/srcset-parser.js:330-334): a candidate whose
descriptors fail validation keeps them VERBATIM instead of being
dropped — this parser rewrites attributes rather than selecting an
image, and dropping the candidate would lose its URL from the
rewritten attribute.

Pure function over a string → trivially vectorizable with Series.map
inside the rewrite UDF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

_SPACES = " \t\n\f\r"
# matched with Pattern.match(value, pos): anchoring is positional, so
# no '^' (it would anchor to the string start, not to pos)
_LEADING_SPACES = re.compile(r"[ \t\n\r\f]+")
_LEADING_COMMAS_OR_SPACES = re.compile(r"[, \t\n\r\f]+")
_LEADING_NOT_SPACES = re.compile(r"[^ \t\n\r\f]+")
_TRAILING_COMMAS = re.compile(r",+$")
_NON_NEGATIVE_INT = re.compile(r"^\d+$")
# valid floating-point number: no leading '+', decimal point needs a digit after
_FLOAT = re.compile(r"^-?(?:[0-9]+|[0-9]*\.[0-9]+)(?:[eE][+-]?[0-9]+)?$")


@dataclass
class Candidate:
    url: str
    w: int | None = None
    d: float | None = None
    h: int | None = None
    descriptors: list[str] | None = None  # verbatim, on parse error


def parse_srcset(value: str) -> list[Candidate]:
    pos = 0
    n = len(value)
    candidates: list[Candidate] = []

    def collect(regex: re.Pattern) -> str | None:
        nonlocal pos
        m = regex.match(value, pos)
        if m:
            pos = m.end()
            return m.group(0)
        return None

    while True:
        collect(_LEADING_COMMAS_OR_SPACES)
        if pos >= n:
            return candidates
        url = collect(_LEADING_NOT_SPACES) or ""
        descriptors: list[str] = []
        if url.endswith(","):
            url = _TRAILING_COMMAS.sub("", url)
        else:
            # descriptor tokenizer
            collect(_LEADING_SPACES)
            current = ""
            state = "in descriptor"
            while True:
                c = value[pos] if pos < n else ""
                if state == "in descriptor":
                    if c and c in _SPACES:
                        if current:
                            descriptors.append(current)
                            current = ""
                            state = "after descriptor"
                    elif c == ",":
                        pos += 1
                        if current:
                            descriptors.append(current)
                        break
                    elif c == "(":
                        current += c
                        state = "in parens"
                    elif c == "":
                        if current:
                            descriptors.append(current)
                        break
                    else:
                        current += c
                elif state == "in parens":
                    if c == ")":
                        current += c
                        state = "in descriptor"
                    elif c == "":
                        descriptors.append(current)
                        break
                    else:
                        current += c
                else:  # after descriptor
                    if c and c in _SPACES:
                        pass
                    elif c == "":
                        break
                    else:
                        state = "in descriptor"
                        pos -= 1
                pos += 1
        candidates.append(_parse_descriptors(url, descriptors))


def _parse_descriptors(url: str, descriptors: list[str]) -> Candidate:
    error = False
    w = d = h = None
    for desc in descriptors:
        last = desc[-1:] if desc else ""
        head = desc[:-1]
        if _NON_NEGATIVE_INT.match(head) and last == "w":
            if w or d is not None:
                error = True
            iv = int(head)
            if iv == 0:
                error = True
            else:
                w = iv
        elif _FLOAT.match(head) and last == "x":
            # d compared against None: the spec allows a density of zero
            if w or d is not None or h:
                error = True
            fv = float(head)
            if fv < 0:
                error = True
            else:
                d = fv
        elif _NON_NEGATIVE_INT.match(head) and last == "h":
            if h or d is not None:
                error = True
            iv = int(head)
            if iv == 0:
                error = True
            else:
                h = iv
        else:
            error = True
    if error:
        return Candidate(url=url, descriptors=list(descriptors))
    return Candidate(url=url, w=w, d=d, h=h)


def _js_num(value: float) -> str:
    """JS Number#toString: integral floats have no decimal point."""
    if value == int(value) and abs(value) < 1e21:
        return str(int(value))
    return repr(value)


def serialize_srcset(candidates: list[Candidate]) -> str:
    out = []
    for c in candidates:
        descriptors = list(c.descriptors) if c.descriptors else []
        if c.w:
            descriptors.append(f"{c.w}w")
        if c.h:
            descriptors.append(f"{c.h}h")
        if c.d is not None:
            descriptors.append(f"{_js_num(c.d)}x")
        out.append(" ".join([c.url] + descriptors))
    return ", ".join(out)
