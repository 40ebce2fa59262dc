"""spark-submit entry point: the frontier crawl as a packaged job.

    python scripts/make_pyfiles.py   # builds dist/mhtml_to_html_spark.zip
    spark-submit --master local[N] \
        --py-files dist/mhtml_to_html_spark.zip \
        scripts/crawl_job.py --seeds 200 --rounds 3 --checkpoint /tmp/crawl_ckpt

This is the north-rule launch shape ("runs via spark-submit --py-files
at N and 4N executors"); on a real cluster only --master changes.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, default=200)
    parser.add_argument("--rounds", type=int, default=3)
    parser.add_argument("--budget", type=int, default=16)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--robots", action="store_true")
    parser.add_argument(
        "--recrawl-budget", type=int, default=0,
        help="per-host stalest-page revisits when the frontier drains (0 = off)",
    )
    parser.add_argument(
        "--debt-boost", action="store_true",
        help="hosts that overflowed the politeness budget last round get up to 2x budget",
    )
    parser.add_argument(
        "--streaming", action="store_true",
        help=(
            "drive the crawl through the STREAMING politeness gate "
            "(applyInPandasWithState feeder loop; requires --checkpoint, "
            "which becomes the job's work dir; --resume continues from "
            "the latest completed round)"
        ),
    )
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mhtml-frontier-crawl").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    seeds = [f"https://host{i % 97}.example.com/seed/{i}" for i in range(args.seeds)]
    start = time.perf_counter()

    if args.streaming:
        if not args.checkpoint:
            parser.error("--streaming requires --checkpoint (the work dir)")
        from mhtml_to_html_spark.streaming.feeder import stream_crawl_job

        res = stream_crawl_job(
            spark,
            seeds,
            args.checkpoint,
            max_rounds=args.rounds,
            host_budget=args.budget,
            use_robots=args.robots,
            resume=args.resume,
        )
        wall = time.perf_counter() - start
        fetched = sum(m["fetched"] for m in res["rounds"])
        print(
            json.dumps(
                {
                    "mode": "streaming",
                    "fetched": fetched,
                    "wall_s": round(wall, 2),
                    "urls_per_sec": round(fetched / wall, 1) if wall else None,
                    "rounds": res["rounds"],
                    "fixpoint": res["fixpoint"],
                }
            )
        )
        spark.stop()
        return

    result = crawl_spark(
        spark,
        seeds,
        max_rounds=args.rounds,
        host_budget=args.budget,
        checkpoint_dir=args.checkpoint,
        resume=args.resume,
        use_robots=args.robots,
        recrawl_budget=args.recrawl_budget,
        debt_boost=args.debt_boost,
        collect_order=False,
        decode_payload=True,
    )
    wall = time.perf_counter() - start
    fetched = sum(m["fetched"] for m in result.metrics)
    print(
        json.dumps(
            {
                "fetched": fetched,
                "wall_s": round(wall, 2),
                "urls_per_sec": round(fetched / wall, 1) if wall else None,
                "rounds": result.metrics,
                "snapshots": result.snapshots,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
