from .canonical import (  # noqa: F401
    normalize_location,
    resolve_path,
    canonicalize_url,
    url_host,
    is_fetchable,
    unwrap_urn,
)
