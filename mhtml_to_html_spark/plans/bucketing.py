"""Bucketed tables: co-located joins with no exchange.

At 100 TB the biggest recurring cost is re-shuffling the same fact
table on the same key for every join. Bucketing pays the shuffle ONCE
at write time: both sides stored bucketed (and sorted) on the join
key join with zero Exchange — the physical plan goes straight to
SortMergeJoin over the pre-clustered buckets.

Spark's bucketing rides the session catalog (``saveAsTable``), which
in local mode lives in ``spark-warehouse/`` — the same mechanism a
production metastore uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) on ``bucket_cols`` — the
    one-time shuffle that co-locates every future join on those keys."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a managed-table location can outlive its metadata (e.g. a killed
    # session); saveAsTable refuses to reuse it, so clear the leftover
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table.lower()}", ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
