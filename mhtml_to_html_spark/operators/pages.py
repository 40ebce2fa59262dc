"""Archives → pages: the full conversion as a Spark stage.

parse + rewrite are fused into one mapInPandas pass (the reference
caches the parse-time DOM on the resource so conversion never
re-parses, lib/util.js:341-358 — fusing the stages gives the same
property structurally: nothing materializes between them, and Catalyst
cannot see inside UDFs anyway)."""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame

PAGES_SCHEMA = (
    "archive_id string, data string, title string, favicons string, "
    "unfound array<string>, anomaly_types array<string>, n_bytes long, error string"
)


def _convert_batches(
    batches,
    enable_scripts: bool = False,
    fetch_missing: bool = False,
    fetch=None,
):
    import json

    import pandas as pd

    from ..mime.splitter import parse_mhtml
    from .convert import convert_page, fetch_and_convert, http_fetch

    if fetch_missing and fetch is None:
        fetch = http_fetch

    for pdf in batches:
        rows = []
        for archive_id, content in zip(pdf["archive_id"], pdf["content"]):
            row = {
                "archive_id": archive_id,
                "data": None,
                "title": None,
                "favicons": None,
                "unfound": None,
                "anomaly_types": None,
                "n_bytes": None,
                "error": None,
            }
            try:
                result = parse_mhtml(bytes(content))
                if fetch_missing:
                    page = fetch_and_convert(result, fetch, enable_scripts=enable_scripts)
                else:
                    page = convert_page(result, enable_scripts=enable_scripts)
                row.update(
                    data=page.data,
                    title=page.title,
                    favicons=json.dumps(page.favicons),
                    unfound=sorted(page.unfound_resources),
                    anomaly_types=[a["type"] for a in page.anomalies],
                    n_bytes=len(page.data.encode("utf-8")),
                )
            except Exception as exc:  # per-archive error isolation (mod.js:71-74)
                row["error"] = str(exc)
            rows.append(row)
        yield pd.DataFrame(
            rows,
            columns=[
                "archive_id", "data", "title", "favicons", "unfound",
                "anomaly_types", "n_bytes", "error",
            ],
        )


def convert_archives(
    archives: DataFrame,
    enable_scripts: bool = False,
    fetch_missing: bool = False,
    fetch=None,
) -> DataFrame:
    """(archive_id, content) → one page row per archive; a broken
    archive yields an error row instead of failing the batch.

    ``enable_scripts`` / ``fetch_missing`` mirror the reference CLI's
    ``--enable-scripts`` / ``--fetch-missing-resources`` (mod.js:16-17,
    43-46); ``fetch`` is the fetch callable for the missing-resource
    rounds (defaults to :func:`..operators.convert.http_fetch`) and
    must be picklable (module-level)."""
    fn = functools.partial(
        _convert_batches,
        enable_scripts=enable_scripts,
        fetch_missing=fetch_missing,
        fetch=fetch,
    )
    return archives.select("archive_id", "content").mapInPandas(fn, schema=PAGES_SCHEMA)
