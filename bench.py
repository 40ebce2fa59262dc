"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Includes the north-rule payload stage (archives → split → decoded
image+caption rows) at corpus scale, the training-data operators, and
the relational skeleton at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_BENCH_ARCHIVES = int(os.environ.get("SPARK_GRAFT_BENCH_ARCHIVES", "3000"))
IMAGES_PER = 3


def make_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("mhtml-to-html-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(CPUS) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def bench_mhtml_pages(spark):
    """Full archive → page conversion (parse + rewrite walk fused)."""
    from mhtml_to_html_spark.operators.pages import convert_archives
    from mhtml_to_html_spark.sources.corpus import archives_df

    n_parts = int(CPUS) * 2
    n = max(N_BENCH_ARCHIVES // 4, 500)
    pages = convert_archives(archives_df(spark, n, IMAGES_PER, partitions=n_parts))
    ok = pages.filter("error is null and data is not null").count()
    return n, ok


def bench_frontier(spark):
    """Crawl throughput: fetch (scripted) + decode, politeness + dedup."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    seeds = [f"https://host{h}.example.com/seed/{i}" for h in range(150) for i in range(2)]
    res = crawl_spark(
        spark, seeds, max_rounds=3, host_budget=24, collect_order=False,
        decode_payload=True, fanout=6, n_hosts=150,
    )
    return sum(m["fetched"] for m in res.metrics)


def bench_mhtml_decode(spark, sf_dir):
    """The payload stage: synth archives → split → extract images with
    captions; count forces full decode of every part."""
    from mhtml_to_html_spark.operators.images_extract import extract_images
    from mhtml_to_html_spark.operators.split import split_archives
    from mhtml_to_html_spark.sources.corpus import archives_df

    n_parts = int(CPUS) * 2
    archives = archives_df(spark, N_BENCH_ARCHIVES, IMAGES_PER, partitions=n_parts)
    parts = split_archives(archives)
    images = extract_images(parts)
    return images.filter("caption is not null").count()


def main():
    import __spark_entry__ as entrymod

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")

    queries = entrymod.queries()

    # steady-state protocol: spin up every Python worker + JIT the UDF
    # serialization path BEFORE timing (worker spinup dominates the
    # first ~30s of a fresh session and is a constant, not a rate; the
    # scaling bench warms the same way)
    def _noop(batches):
        for pdf in batches:
            yield pdf

    spark.range(int(CPUS) * 8).repartition(int(CPUS) * 4).mapInPandas(
        _noop, schema="id long"
    ).count()
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    crawl_spark(
        spark,
        [f"https://warm{i}.example.net/w" for i in range(int(CPUS) * 4)],
        max_rounds=1,
        host_budget=4,
        collect_order=False,
        decode_payload=True,
    )
    bench_names = [
        "pricing_summary",
        "top_customers",
        "running_window",
        "per_key_topk",
        "dedup_exact",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "text_quality",
        "text_langid",
        "sim_cosine_topk",
        "sim_lsh_topk",
    ]
    timings = {}
    total = 0.0
    for name in bench_names:
        start = time.perf_counter()
        df = queries[name](spark, SF_DIR)
        n = df.count()
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed

    start = time.perf_counter()
    n_images = bench_mhtml_decode(spark, SF_DIR)
    decode_sec = time.perf_counter() - start
    timings["mhtml_decode"] = round(decode_sec, 3)
    total += decode_sec
    # each decoded image+caption pair stands for one fetched+decoded URL
    urls_per_sec = n_images / decode_sec if decode_sec else 0.0

    start = time.perf_counter()
    n_pages, n_pages_ok = bench_mhtml_pages(spark)
    pages_sec = time.perf_counter() - start
    timings["mhtml_pages"] = round(pages_sec, 3)
    total += pages_sec

    start = time.perf_counter()
    n_crawled = bench_frontier(spark)
    crawl_sec = time.perf_counter() - start
    timings["frontier_crawl"] = round(crawl_sec, 3)
    total += crawl_sec

    result = {
        "metric": "headline queries + MHTML decode wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "mhtml_archives": N_BENCH_ARCHIVES,
        "decoded_images": n_images,
        "decode_urls_per_sec": round(urls_per_sec, 1),
        "pages_converted": n_pages_ok,
        "pages_per_sec": round(n_pages_ok / pages_sec, 1) if pages_sec else 0.0,
        "crawled_urls": n_crawled,
        "crawl_urls_per_sec": round(n_crawled / crawl_sec, 1) if crawl_sec else 0.0,
        "cpus": int(CPUS),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
