"""Column helpers agree with the Python kernels byte-for-byte."""

import pytest

from mhtml_to_html_spark.functions import (
    charset_of,
    ct_is_document,
    ct_is_media,
    data_uri,
    is_fetchable_col,
    media_type_of,
)
from mhtml_to_html_spark.mime.kernels import get_charset, is_document, is_media


CASES = [
    "text/html; charset=utf-8",
    "TEXT/HTML",
    "application/xhtml+xml",
    "image/png",
    "font/woff2",
    "text/plain; charset=\"windows-1251\"",
    "multipart/related; boundary=x",
    None,
]


@pytest.mark.spark
def test_predicates_match_kernels(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "content_type string")
    rows = df.select(
        "content_type",
        ct_is_document().alias("doc"),
        ct_is_media().alias("media"),
        charset_of().alias("cs"),
    ).collect()
    for row in rows:
        ct = row["content_type"]
        assert row["doc"] == is_document(ct)
        assert row["media"] == is_media(ct)
        assert row["cs"] == get_charset(ct)


@pytest.mark.spark
def test_data_uri_and_media_type(spark):
    df = spark.createDataFrame(
        [('text/plain; charset="windows-1251"', bytearray(b"hello"))],
        "content_type string, data binary",
    )
    row = df.select(
        media_type_of().alias("mt"), data_uri().alias("uri")
    ).collect()[0]
    assert row["mt"] == "text/plain;charset=windows-1251"
    assert row["uri"] == "data:text/plain;charset=windows-1251;base64,aGVsbG8="


@pytest.mark.spark
def test_fetchable(spark):
    df = spark.createDataFrame(
        [("https://e/x",), ("HTTP://e",), ("urn:a:b",), ("cid:x",), ("data:text/plain,hi",), ("page.html",)],
        "url string",
    )
    got = [r["f"] for r in df.select(is_fetchable_col().alias("f")).collect()]
    assert got == [True, True, True, False, False, False]
