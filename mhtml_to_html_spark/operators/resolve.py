"""Reference → resource resolution (the equi-join key discipline).

Pure-Python kernel for the lookup the reference does per reference
(/root/reference/lib/convert.js:794-808): by resolved id, else by the
reference as written, else ``cid:x`` → ``<x>``. Fragments and queries
are deliberately significant — no fuzzy matching (an SVG sprite is
addressed as sprite.svg#icon once per icon).

The Spark-side equivalent is an exact-string equi-join of the
references table against the multi-key registry (operators/registry.py);
the cid/raw fallbacks are extra key rows per part, not fuzzy joins.
"""

from __future__ import annotations

from ..urlnorm import resolve_path

CID_PROTOCOL = "cid:"


def get_resource(resources: dict, resource_id: str | None, raw_id: str | None = None):
    """Exact lookup with the reference's 3-tier fallback."""
    resource = resources.get(resource_id)
    if resource is None and raw_id is not None:
        resource = resources.get(raw_id)
    if resource is None and resource_id and resource_id.startswith(CID_PROTOCOL):
        resource = resources.get(f"<{resource_id[len(CID_PROTOCOL):]}>")
    return resource


def resolve_reference(resources: dict, reference: str, base: str | None):
    """Resolve a document reference against the registry: the reference
    is resolved with the URL parser; the archive stored addresses the
    way such references resolve, so the two meet on exact strings."""
    resolved = resolve_path(reference, base)
    return get_resource(resources, resolved, reference)
