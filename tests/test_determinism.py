"""Determinism under parallelism: the same input must give identical
results whatever the partitioning — the reference's outputs are
byte-stable across runs (ids.test.js, malformed.test.js:249-264), and
Spark shuffle order is where that property usually dies (SURVEY §4)."""

import pytest

from mhtml_to_html_spark.operators.registry import registry_keys, select_index
from mhtml_to_html_spark.operators.split import split_archives
from mhtml_to_html_spark.sources.corpus import archives_df


def _registry_rows(spark, partitions, shuffle_partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        parts = split_archives(archives_df(spark, 10, 3, partitions=partitions))
        keys = sorted(
            tuple(r) for r in registry_keys(parts).select("archive_id", "key", "part_id").collect()
        )
        index = sorted(tuple(r) for r in select_index(parts).collect())
        return keys, index
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


@pytest.mark.spark
def test_registry_partition_invariant(spark):
    a = _registry_rows(spark, partitions=1, shuffle_partitions=1)
    b = _registry_rows(spark, partitions=7, shuffle_partitions=13)
    assert a == b, "first-wins results changed with the partitioning"


@pytest.mark.spark
def test_duplicate_keys_first_wins_under_shuffle(spark):
    """Adversarial case: many parts share one location across several
    input partitions; the winner must always be the lowest seq."""
    from pyspark.sql import Row

    doc = "<html><body>x</body></html>"
    parts_markup = []
    for i in range(40):
        parts_markup.append(
            f"------=_B\r\nContent-Type: text/plain\r\nContent-Transfer-Encoding: 8bit\r\n"
            f"Content-Location: https://e/shared.txt\r\n\r\nBODY{i}\r\n"
        )
    raw = (
        'MIME-Version: 1.0\r\nContent-Type: multipart/related; boundary="----=_B"\r\n\r\n'
        "------=_B\r\nContent-Type: text/html\r\nContent-Location: https://e/\r\n\r\n"
        + doc
        + "\r\n"
        + "".join(parts_markup)
        + "------=_B--\r\n"
    ).encode()
    df = spark.createDataFrame([Row(archive_id="arc", content=bytearray(raw))]).repartition(8)
    for shuffle in (1, 16):
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        keys = registry_keys(split_archives(df))
        row = keys.filter("key = 'https://e/shared.txt'").collect()
        assert len(row) == 1
        assert row[0]["seq"] == 1, "the first part did not win"
    spark.conf.set("spark.sql.shuffle.partitions", "8")
