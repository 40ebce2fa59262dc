"""Page conversion: the rewrite walk (W1–W21) over a parsed archive.

Pure-Python per-archive kernel mirroring the reference's convert
(/root/reference/lib/convert.js:234-659): one BFS walk rewrites every
reference to a data URI, strips active content, inlines stylesheets,
converts frames recursively, and injects the head metadata. Spark
parallelizes across archives (operators/pages.py); the walk itself is
data-local, exactly like the split stage.
"""

from __future__ import annotations

import base64
import json
import re
import urllib.parse
from dataclasses import dataclass, field

from ..mime.cssrewrite import rewrite_css
from ..mime.dom import Document, Element, Text, parse_html
from ..mime.kernels import (
    decode_base64_checked,
    decode_mime_header,
    decode_string,
    get_charset,
    is_image,
    is_media,
    is_plain_text,
    is_stylesheet,
)
from ..mime.splitter import ParseResult, ParsedPart
from ..mime.srcset import parse_srcset, serialize_srcset
from ..urlnorm import resolve_path
from .resolve import get_resource

INDEX_PAGE_NOT_FOUND = "Index page not found"
SYNTHESIZED_INDEX_ANOMALY = "index-synthesized"
ORIGINAL_PREFIX = "data-original-"
_EVENT_HANDLER_RE = re.compile(r"^on[a-z]+$")
_REL_REMOVED_RE = re.compile(
    r"\b(preconnect|prerender|dns-prefetch|preload|prefetch|manifest|modulepreload)\b"
)
_CID_RE = re.compile(r"^<.+>$")
DEFAULT_CSP = (
    "default-src 'none'; connect-src 'self' data:; font-src 'self' data:; "
    "img-src 'self' data:; style-src 'self' 'unsafe-inline' data:; "
    "frame-src 'self' data:; media-src 'self' data:; object-src 'self' data:; "
)
JS_ENABLED_CSP = "script-src 'self' 'unsafe-inline' data:;"
JS_DISABLED_CSP = "script-src 'none';"


@dataclass
class PageResult:
    data: str
    title: str | None
    favicons: list[dict]
    unfound_resources: list[str]
    anomalies: list[dict] = field(default_factory=list)


def build_maps(result: ParseResult) -> tuple[dict, dict]:
    """resources (first-wins multi-key) + frames (last-writer by cid),
    the reference's two registries (parse.js:280-293)."""
    resources: dict[str, ParsedPart] = {}
    frames: dict[str, ParsedPart] = {}
    for part in result.parts:
        if part.content_id is not None:
            frames[part.content_id] = part
        for key, _kind in part.keys:
            resources.setdefault(key, part)
    return resources, frames


def _page_text(part: ParsedPart) -> str:
    """The document text of a part (the reference's resource.data once
    it has been decoded for display); for parts kept encoded, our data
    already holds the decoded payload."""
    if part.text is not None:
        return part.text
    return decode_string(part.data, get_charset(part.content_type))


def _media_type(content_type: str | None) -> str:
    """RFC 2397 scrub: no whitespace, parameter quotes dropped
    (util.js:508-512)."""
    if not content_type:
        return ""
    return re.sub(r"\s+", "", content_type.replace('"', ""))


def resource_uri(part: ParsedPart) -> str:
    return f"data:{_media_type(part.content_type)};base64," + base64.b64encode(
        part.data
    ).decode("ascii")


def _escape_text(value: str) -> str:
    return value.replace("&", "&amp;").replace("<", "&lt;")


@dataclass
class _SynthPart:
    """createDocument's stand-in resource (convert.js:663-679)."""

    part_id: str
    content_type: str
    text: str
    data: bytes = b""
    transfer_encoding: str | None = None
    content_id: str | None = None


def _create_document(resources: dict):
    for part in resources.values():
        if is_image(part.content_type):
            return _SynthPart(
                part_id=part.part_id,
                content_type="text/html",
                text=f'<html><body><img src="{resource_uri(part)}"></body></html>',
            )
        if is_plain_text(part.content_type):
            text = _page_text(part)
            return _SynthPart(
                part_id=part.part_id,
                content_type="text/html",
                text=f"<html><body><pre>{_escape_text(text)}</pre></body></html>",
            )
    return None


def _set_attribute(element: Element, attr: str, new_value: str | None):
    """data-original-<attr> provenance unless the value was a data URI
    or unchanged (convert.js:685-693)."""
    value = element.get_attribute(attr)
    if value and not value.startswith("data:") and value != new_value:
        element.set_attribute(ORIGINAL_PREFIX + attr, value)
    if new_value is not None:
        element.set_attribute(attr, new_value)


def _page_info(headers: dict, index: str) -> dict:
    info = {
        "@context": "https://schema.org",
        "@type": "WebPage",
        "url": index,
        "name": decode_mime_header(headers.get("subject")),
        "dateCreated": headers.get("date"),
        "additionalProperty": {
            "@type": "PropertyValue",
            "name": "savedBy",
            "value": decode_mime_header(headers.get("from")),
        },
    }
    # JSON.stringify drops undefined members; mirror that for absent headers
    return {k: v for k, v in info.items() if v is not None}


def convert_page(
    result: ParseResult,
    enable_scripts: bool = False,
) -> PageResult:
    resources, frames = build_maps(result)
    # dict-as-ordered-set: reporting order is insertion order, like the
    # reference's Set (a plain Python set would hash-randomize across
    # worker processes)
    unfound: dict[str, None] = {}
    anomalies = list(result.anomalies)
    page = _convert(
        resources,
        frames,
        result.index,
        None,
        result.headers,
        unfound,
        enable_scripts,
        anomalies,
    )
    return page


def _convert(
    resources: dict,
    frames: dict,
    index: str | None,
    frame_part_id: str | None,
    headers: dict | None,
    unfound: dict,
    enable_scripts: bool,
    anomalies: list,
) -> PageResult:
    resource = resources.get(index) if index is not None else None
    if resource is None:
        resource = _create_document(resources)
        if resource is None:
            raise ValueError(INDEX_PAGE_NOT_FOUND)
        index = resource.part_id
        anomalies = anomalies + [{"type": SYNTHESIZED_INDEX_ANOMALY, "id": index}]
    base = resource.part_id
    document = parse_html(_page_text(resource))

    base_element_list = document.get_elements_by_tag_name("base")
    if base_element_list:
        base_element = base_element_list[0]
        href = base_element.get_attribute("href")
        if href:
            base = resolve_path(href, base)
        base_element.remove()

    resource.used = True
    canonical_link = None
    stylesheets: dict = {}
    removed: list = []
    favicons: list[dict] = []
    title: str | None = None

    def resolve_ref(resolved_id, raw_id, found, not_found, descend=None, resource_override=None):
        """resolveReference in rewrite mode (convert.js:776-792)."""
        part = (
            resource_override
            if resource_override is not None
            else get_resource(resources, resolved_id, raw_id)
        )
        if part is not None:
            if descend:
                descend(part)
            part.used = True
            found(part)
        else:
            unfound.setdefault(resolved_id)
            not_found()

    def rewrite_stylesheet(part, sheet_base) -> str:
        """replaceStylesheetUrls with the per-document memo + cycle
        breaker (convert.js:695-768)."""
        if part is not None and getattr(part, "part_id", None) is not None:
            memo = stylesheets.get(part.part_id)
            if memo is not None:
                return memo.get("data", _sheet_text(part))
            stylesheets[part.part_id] = {}
        text = _sheet_text(part)
        rewritten = _rewrite_css_text(text, sheet_base)
        if part is not None and getattr(part, "part_id", None) is not None:
            stylesheets[part.part_id]["data"] = rewritten
        return rewritten

    def _sheet_text(part) -> str:
        if isinstance(part, dict):
            return part["data"]
        return _page_text(part)

    def _rewrite_css_text(text: str, sheet_base: str) -> str:
        def replace_url(path: str):
            if path.startswith("data:"):
                return None
            resolved = resolve_path(path, sheet_base)
            out: list[str] = []

            def found(part):
                if is_stylesheet(part.content_type):
                    inner = rewrite_stylesheet(part, _stylesheet_base(part))
                    part.text = inner
                    # resource_uri encodes part.data — store the rewritten
                    # sheet as UTF-8 bytes so nested url()/@import rewrites
                    # survive inlining (convert.js:721-726 updates
                    # resource.data before the data-URI is built)
                    part.data = inner.encode("utf-8")
                out.append(f"/* original URL: {resolved} */ url({resource_uri(part)})")

            def not_found():
                out.append(f"/* original URL: {resolved} */ url({resolved})")

            resolve_ref(resolved, path, found, not_found)
            return out[0]

        def replace_import(path: str):
            if path.startswith("data:"):
                return None
            resolved = resolve_path(path, sheet_base)
            out: list[str] = []

            def descend(part):
                part.text = rewrite_stylesheet(part, _stylesheet_base(part))

            def found(part):
                sheet_b64 = base64.b64encode(_sheet_text(part).encode("utf-8")).decode("ascii")
                out.append(
                    f" /* original URL: {resolved} */ url(data:text/css;base64,{sheet_b64})"
                )

            def not_found():
                out.append(f" /* original URL: {resolved} */ url({resolved})")

            resolve_ref(resolved, path, found, not_found, descend=descend)
            return out[0]

        return rewrite_css(text, replace_url, replace_import)

    def _stylesheet_base(part) -> str:
        sheet_base = part.part_id
        if sheet_base.startswith("cid:"):
            if index is not None and _CID_RE.match(index):
                return frame_part_id or index
            return index
        return sheet_base

    # -- the BFS walk (convert.js:288-604) --------------------------------
    nodes: list = [document]
    idx = 0
    while idx < len(nodes):
        parent = nodes[idx]
        idx += 1
        parent_tag = parent.tag if isinstance(parent, Element) else None
        for child in list(parent.children):
            tag = child.tag if isinstance(child, Element) else None
            href = src = None
            if isinstance(child, Element):
                href = child.get_attribute("href")
                if href:
                    href = resolve_path(href, base)
                src = child.get_attribute("src")
                if src:
                    src = resolve_path(src, base)
                style = child.get_attribute("style")
                if style:
                    child.set_attribute("style", _rewrite_css_text(style, base))
                if child.get_attribute("integrity") is not None:
                    child.remove_attribute("integrity")
                if not enable_scripts:
                    for name in list(child.get_attribute_names()):
                        if _EVENT_HANDLER_RE.match(name.lower()):
                            child.remove_attribute(name)

            if tag == "link" and href:
                rel = child.get_attribute("rel")
                if rel:
                    rel = rel.lower()
                    rel_tokens = re.split(r"\s+", rel.strip())
                    if "stylesheet" in rel_tokens:
                        holder: dict = {}

                        def descend(part, holder=holder):
                            holder["sheet"] = rewrite_stylesheet(part, _stylesheet_base(part))

                        def found(part, child=child, href=href, rel_tokens=rel_tokens, holder=holder):
                            part.text = holder.get("sheet", "")
                            part.data = part.text.encode("utf-8")
                            media = child.get_attribute("media")
                            if child.get_attribute("title") or "alternate" in rel_tokens:
                                # style-set member: stays a link
                                sheet_b64 = base64.b64encode(part.text.encode("utf-8")).decode("ascii")
                                _set_attribute(
                                    child, "href", f"data:text/css;base64,{sheet_b64}"
                                )
                            else:
                                style_el = document.create_element("style")
                                if media:
                                    style_el.set_attribute("media", media)
                                if not href.startswith("data:"):
                                    style_el.set_attribute(ORIGINAL_PREFIX + "href", href)
                                style_el.append_child(document.create_text_node(part.text))
                                child.replace_with(style_el)

                        def not_found(child=child, href=href):
                            _set_attribute(child, "href", href)

                        resolve_ref(href, child.get_attribute("href"), found, not_found, descend=descend)
                    elif "icon" in rel:
                        media = child.get_attribute("media")
                        ftype = child.get_attribute("type")
                        sizes = child.get_attribute("sizes")

                        def found(part, child=child, href=href, media=media, ftype=ftype, sizes=sizes):
                            uri = resource_uri(part)
                            _set_attribute(child, "href", uri)
                            favicons.append(
                                {"href": uri, "media": media, "type": ftype, "sizes": sizes, "originalHref": href}
                            )

                        def not_found(child=child, href=href, media=media, ftype=ftype, sizes=sizes):
                            _set_attribute(child, "href", href)
                            favicons.append({"href": href, "media": media, "type": ftype, "sizes": sizes})

                        resolve_ref(href, child.get_attribute("href"), found, not_found)
                    elif rel == "canonical":
                        canonical_link = child
                    rel_value = _REL_REMOVED_RE.sub("", rel).strip()
                    rel_value = re.sub(r"\s+", " ", rel_value)
                    if rel_value:
                        child.set_attribute("rel", rel_value)
                    else:
                        removed.append(child)
            elif tag == "style":
                rewritten = _rewrite_css_text(child.text_content, base)
                style_el = document.create_element("style")
                media = child.get_attribute("media")
                if media:
                    style_el.set_attribute("media", media)
                el_title = child.get_attribute("title")
                if el_title:
                    style_el.set_attribute("title", el_title)
                style_el.append_child(document.create_text_node(rewritten))
                child.replace_with(style_el)
            elif tag in ("img", "audio", "video", "source", "script"):
                if src:
                    resolve_ref(
                        src,
                        child.get_attribute("src"),
                        lambda part, child=child: _set_attribute(child, "src", resource_uri(part)),
                        lambda child=child, src=src: _set_attribute(child, "src", src),
                    )
                if tag in ("img", "source"):
                    srcset = child.get_attribute("srcset")
                    if srcset:
                        candidates = parse_srcset(srcset)
                        for cand in candidates:
                            c_resolved = resolve_path(cand.url, base)

                            def found(part, cand=cand):
                                cand.url = resource_uri(part)

                            def not_found(cand=cand, c_resolved=c_resolved):
                                cand.url = c_resolved

                            resolve_ref(c_resolved, cand.url, found, not_found)
                        _set_attribute(child, "srcset", serialize_srcset(candidates))
                elif tag == "script":
                    stype = child.get_attribute("type")
                    stype = stype.lower() if stype else None
                    if not enable_scripts and (not stype or stype != "application/ld+json"):
                        removed.append(child)
            elif tag in ("body", "table", "td", "th"):
                background = child.get_attribute("background")
                if background and not background.startswith("data:"):
                    b_resolved = resolve_path(background, base)
                    resolve_ref(
                        b_resolved,
                        background,
                        lambda part, child=child: _set_attribute(child, "background", resource_uri(part)),
                        lambda child=child, b=b_resolved: _set_attribute(child, "background", b),
                    )
            elif tag == "input":
                itype = child.get_attribute("type")
                if itype and itype.lower() == "image" and src:
                    resolve_ref(
                        src,
                        child.get_attribute("src"),
                        lambda part, child=child: _set_attribute(child, "src", resource_uri(part)),
                        lambda child=child, src=src: _set_attribute(child, "src", src),
                    )
            elif tag in ("iframe", "frame", "embed", "object"):
                attr = "data" if tag == "object" else "src"
                if tag == "object":
                    src = child.get_attribute("data")
                    if src:
                        src = resolve_path(src, base)
                if src:
                    if src.startswith("cid:"):
                        frame_id = f"<{src.split('cid:', 1)[1]}>"
                        frame_res = frames.get(frame_id)
                    else:
                        frame_id = src
                        frame_res = get_resource(resources, src, child.get_attribute(attr))
                    if frame_res is not None and not (
                        tag in ("embed", "object") or is_media(frame_res.content_type)
                    ):
                        sub_resources = dict(resources)
                        sub_resources[frame_id] = frame_res
                        sub = _convert(
                            sub_resources,
                            frames,
                            frame_id,
                            frame_res.part_id,
                            None,
                            unfound,
                            enable_scripts,
                            [],
                        )
                        frame_res.used = True
                        if tag == "iframe":
                            _set_attribute(child, "src", None)
                            child.remove_attribute("src")
                            child.set_attribute("srcdoc", sub.data)
                        else:
                            _set_attribute(
                                child,
                                attr,
                                "data:text/html," + urllib.parse.quote(sub.data, safe="~()*!.'"),
                            )
                    else:
                        resolve_ref(
                            src,
                            None,
                            lambda part, child=child, attr=attr: _set_attribute(child, attr, resource_uri(part)),
                            lambda child=child, attr=attr, src=src: _set_attribute(child, attr, src),
                            resource_override=frame_res,
                        )
            elif tag in ("a", "area"):
                if href:
                    short = _self_link_fragment(child.get_attribute("href"), base)
                    child.set_attribute("href", short if short is not None else href)
                child.remove_attribute("ping")
            elif tag == "meta":
                http_equiv = child.get_attribute("http-equiv")
                if http_equiv and http_equiv.lower() in ("refresh", "content-security-policy"):
                    removed.append(child)
                # every charset declaration goes, not just the first: the
                # document is inlined as UTF-8 and a survivor would lie
                # about the text around it (parse.js:588-599 — the
                # reference removes them at parse time; the walk is the
                # equivalent seam here)
                elif http_equiv and http_equiv.lower() == "content-type":
                    removed.append(child)
                elif child.get_attribute("charset"):
                    removed.append(child)
            elif tag == "template":
                shadowmode = child.get_attribute("shadowmode")
                if shadowmode is not None:
                    child.remove_attribute("shadowmode")
                    child.set_attribute("shadowrootmode", shadowmode)
            elif (
                tag == "title"
                and parent_tag == "head"
                and title is None
                and child.text_content
            ):
                title = child.text_content
            nodes.append(child)

    for node in removed:
        node.remove()
    head = document.head
    if canonical_link is None and head is not None:
        link = document.create_element("link")
        link.set_attribute("rel", "canonical")
        link.set_attribute("href", index)
        head.append_child(link)
    if head is not None:
        csp_meta = document.create_element("meta")
        csp_meta.set_attribute("http-equiv", "content-security-policy")
        csp_meta.set_attribute(
            "content", DEFAULT_CSP + (JS_ENABLED_CSP if enable_scripts else JS_DISABLED_CSP)
        )
        head.prepend(csp_meta)
        charset_meta = document.create_element("meta")
        charset_meta.set_attribute("charset", "utf-8")
        head.prepend(charset_meta)
        if headers is not None:
            info = document.create_element("script")
            info.set_attribute("type", "application/ld+json")
            info.append_child(
                document.create_text_node(json.dumps(_page_info(headers, index), indent=2))
            )
            head.first_child.after(info)

    unfound_ids = [u for u in unfound if not u.startswith("data:")]
    return PageResult(
        data=document.serialize(),
        title=title,
        favicons=favicons,
        unfound_resources=unfound_ids,
        anomalies=anomalies,
    )


def collect_missing(result: ParseResult, enable_scripts: bool = False) -> list[str]:
    """Collect-mode walk (F2): the references the archive cannot
    satisfy, in deterministic order. Runs the rewrite walk on a scratch
    copy — ``unfound`` IS the missing set, including CSS url()s and
    references nested stylesheets expose (the reference's descend runs
    in both walks, convert.js:776-781)."""
    import copy

    from ..urlnorm import is_fetchable

    scratch = copy.deepcopy(result)
    page = convert_page(scratch, enable_scripts=enable_scripts)
    return sorted(u for u in page.unfound_resources if is_fetchable(u))


def _fetch_with_reference_retries(fetch, url: str, max_retries: int):
    """The reference retry loop (convert.js:165-200): transient =
    429/5xx/throw; Retry-After honored with the 5s cap; exponential
    backoff (virtual time); maxRetries attempts beyond the first."""
    from ..frontier.fixtures import backoff_delay_ms, is_transient, retry_delay_ms

    attempt = 0
    while True:
        delay = None
        try:
            response = fetch(url)
            status = response.get("status", 200)
            if 200 <= status < 300:
                return response
            if not is_transient(status):
                return None
            delay = retry_delay_ms(response, attempt)
        except Exception:
            delay = backoff_delay_ms(attempt)
        if delay is None or attempt >= max_retries:
            return None
        attempt += 1


DEFAULT_MAX_PARALLEL_REQUESTS = 16  # convert.js:110


def http_fetch(url: str) -> dict:
    """Production fetch for ``--fetch-missing-resources`` (the
    reference CLI uses the platform fetch, mod.js:17,41-46): stdlib
    urllib, response shaped for :func:`fetch_and_convert`. Non-2xx
    comes back as a status dict so the retry loop can classify it."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=30) as resp:
            return {
                "status": getattr(resp, "status", 200),
                "content_type": resp.headers.get("Content-Type"),
                "body": resp.read(),
            }
    except urllib.error.HTTPError as err:
        headers = err.headers or {}
        return {
            "status": err.code,
            "content_type": headers.get("Content-Type"),
            "body": b"",
            "retry_after": headers.get("Retry-After"),
        }


def _fetch_pool(missing: list[str], fetch, max_retries: int, max_parallel: int) -> dict:
    """The bounded worker pool (F3, convert.js:148-163): N workers
    share one cursor; the cap holds through retries; 0/-5 fall back to
    one worker. Responses come back keyed by URL, so merge order stays
    the round's missing order (deterministic) whatever the completion
    order."""
    import threading

    from ..urlnorm import unwrap_urn

    count_workers = max(1, min(max_parallel, len(missing)))
    cursor = {"i": 0}
    lock = threading.Lock()
    responses: dict[str, dict | None] = {}

    def worker():
        while True:
            with lock:
                i = cursor["i"]
                if i >= len(missing):
                    return
                cursor["i"] = i + 1
            url = missing[i]
            responses[url] = _fetch_with_reference_retries(fetch, unwrap_urn(url), max_retries)

    if count_workers == 1:
        worker()
    else:
        threads = [threading.Thread(target=worker) for _ in range(count_workers)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    return responses


def fetch_and_convert(
    result: ParseResult,
    fetch,
    enable_scripts: bool = False,
    max_retries: int = 2,
    max_parallel_requests: int = DEFAULT_MAX_PARALLEL_REQUESTS,
) -> PageResult:
    """The round fixpoint (F1, convert.js:129-146): collect missing →
    minus the deny-list → fetch via the bounded pool → merge → repeat;
    the final pass rewrites. ``fetch(url)`` returns {status,
    content_type, body, retry_after?} or raises."""
    from ..mime.kernels import is_document as _is_doc
    from ..mime.kernels import is_stylesheet as _is_css
    from ..mime.kernels import is_text as _is_text

    failed: list[str] = []
    while True:
        missing = [u for u in collect_missing(result, enable_scripts) if u not in failed]
        if not missing:
            break
        responses = _fetch_pool(missing, fetch, max_retries, max_parallel_requests)
        for url in missing:
            response = responses.get(url)
            if response is None:
                failed.append(url)
                continue
            content_type = response.get("content_type") or "application/octet-stream"
            body = response.get("body", b"")
            if isinstance(body, str):
                body = body.encode("utf-8")
            part = ParsedPart(
                seq=len(result.parts),
                part_id=url,
                written_id=None,
                content_id=None,
                content_location=url,
                content_type=content_type,
                transfer_encoding=None,
                data=body,
                text=(
                    decode_string(body, get_charset(content_type))
                    if (_is_doc(content_type) or _is_css(content_type) or _is_text(content_type))
                    else None
                ),
                charset=get_charset(content_type),
                is_index=False,
            )
            result.parts.append(part)
    return convert_page(result, enable_scripts=enable_scripts)


def _self_link_fragment(raw_href: str, base: str) -> str | None:
    """Anchor equal to the base minus fragment → keep only #frag
    (convert.js:564-579)."""
    try:
        resolved = urllib.parse.urljoin(base, raw_href)
        split = urllib.parse.urlsplit(resolved)
        frag = split.fragment
        without = urllib.parse.urlunsplit((split.scheme, split.netloc, split.path, split.query, ""))
        if without == base and frag:
            return "#" + frag
    except ValueError:
        pass
    return None
