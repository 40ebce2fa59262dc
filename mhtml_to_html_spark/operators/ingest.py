"""End-to-end ingest: crawled archives → snapshot-managed image table.

The north-star pipeline in one call: split → extract image+caption
pairs (exact input_hint schema) → append a snapshot to the catalog
(Iceberg layout in miniature; binds to real Iceberg when jars exist —
plans/catalog.py). Each ingest is a new immutable snapshot with
per-file row lineage, so downstream training jobs can pin a snapshot
id and re-runs are additive, never destructive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.catalog import SnapshotCatalog
from .images_extract import extract_images
from .split import split_archives

IMAGES_TABLE = "images"


def ingest_images(archives: DataFrame, catalog: SnapshotCatalog, round_idx: int | None = None) -> int:
    """archives → images snapshot; returns the snapshot id."""
    images = extract_images(split_archives(archives)).select(
        "image_id",
        F.col("bytes"),
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        "fmt",
        "caption",
        F.col("phash").cast("long").alias("phash"),
    )
    n_ok = images.count()
    snapshot_id = catalog.write_snapshot(
        {IMAGES_TABLE: images}, metrics={"images": n_ok}, round_idx=round_idx
    )
    return snapshot_id


def read_images(spark, catalog: SnapshotCatalog, snapshot_id: int | None = None) -> DataFrame:
    """Load the image table at a snapshot (time travel); latest by default."""
    if snapshot_id is None:
        manifest = catalog.latest()
        if manifest is None:
            raise ValueError("catalog holds no snapshots")
        snapshot_id = manifest["snapshot_id"]
    return catalog.load_table(spark, snapshot_id, IMAGES_TABLE)
