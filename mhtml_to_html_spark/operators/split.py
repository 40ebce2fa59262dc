"""Archive → parts: the Spark payload stage.

``split_archives`` runs the per-archive state machine
(mime/splitter.py) inside ``mapInPandas``: the parse is data-local per
archive; Spark parallelizes across archives — the reference pipeline is
embarrassingly parallel at the archive grain, which is what makes the
>=0.8 scaling-efficiency target attainable (SURVEY.md §3.2).

Design notes for 100 TB:
- one pass, one output table; headers ride along as per-archive columns
  (dictionary-encoded in Parquet, negligible overhead) so no second
  scan of the raw bytes is ever needed;
- the UDF is Arrow-batched; all per-row Python is amortized per archive
  (the input_hint bans per-row Python over parts);
- downstream relational ops (registry, reference join, image extract)
  read only the columns they need — column pruning reaches the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

PARTS_SCHEMA = (
    "archive_id string, seq int, part_id string, written_id string, "
    "content_id string, content_location string, content_type string, "
    "transfer_encoding string, data binary, text string, charset string, "
    "is_index boolean, is_embedded_container boolean, "
    "anomaly_types array<string>, "
    "index_id string, header_from string, header_subject string, header_date string, "
    "n_parts int"
)

_COLUMNS = [
    "archive_id", "seq", "part_id", "written_id", "content_id",
    "content_location", "content_type", "transfer_encoding", "data",
    "text", "charset", "is_index", "is_embedded_container",
    "anomaly_types", "index_id", "header_from",
    "header_subject", "header_date", "n_parts",
]


def _split_batches(batches):
    import pandas as pd

    from ..mime.splitter import parse_mhtml

    for pdf in batches:
        # dict-of-lists: one Arrow column build instead of 20 dict
        # lookups per row
        cols: dict[str, list] = {name: [] for name in _COLUMNS}
        for archive_id, content in zip(pdf["archive_id"], pdf["content"]):
            result = parse_mhtml(bytes(content))
            archive_anoms = [a["type"] for a in result.anomalies if "id" not in a]
            headers = result.headers
            for part in result.parts:
                cols["archive_id"].append(archive_id)
                cols["seq"].append(part.seq)
                cols["part_id"].append(part.part_id)
                cols["written_id"].append(part.written_id)
                cols["content_id"].append(part.content_id)
                cols["content_location"].append(part.content_location)
                cols["content_type"].append(part.content_type)
                cols["transfer_encoding"].append(part.transfer_encoding)
                cols["data"].append(part.data)
                cols["text"].append(part.text)
                cols["charset"].append(part.charset)
                cols["is_index"].append(part.part_id == result.index and part.is_index)
                cols["is_embedded_container"].append(part.is_embedded_container)
                cols["anomaly_types"].append(
                    [a["type"] for a in part.anomalies]
                    + (archive_anoms if part.seq == 0 else [])
                )
                cols["index_id"].append(result.index)
                cols["header_from"].append(headers.get("from"))
                cols["header_subject"].append(headers.get("subject"))
                cols["header_date"].append(headers.get("date"))
                cols["n_parts"].append(len(result.parts))
        yield pd.DataFrame(cols, columns=_COLUMNS)


def split_archives(archives: DataFrame) -> DataFrame:
    """(archive_id, content) → one row per MIME part, document order."""
    return archives.select("archive_id", "content").mapInPandas(
        _split_batches, schema=PARTS_SCHEMA
    )
