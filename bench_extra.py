"""Optimization-round instrumentation (guide §1): per-unit isolation
with the noop sink, explain("formatted") capture, and subset timing.

NOT the measured bench — ``bench.py`` stays frozen. This file exists so
plan claims in OPTIMIZATION_r06.md are reproducible:

    python bench_extra.py plans                 # dump plans to plans/r06/
    python bench_extra.py time q1 q2 ...        # noop-sink timing, min of N
    python bench_extra.py time all              # every declared bench unit

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_BENCH_REPEATS,
BENCH_EXTRA_SUFFIX (plan file suffix, default "before").
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

BENCH_NAMES = [
    "pricing_summary",
    "top_customers",
    "running_window",
    "per_key_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_quality",
    "text_langid",
    "text_repetition",
    "docs_curate",
    "sim_cosine_topk",
    "sim_lsh_topk",
]


def formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    from bench import make_spark, pruneproof

    import __spark_entry__ as entrymod

    mode = sys.argv[1] if len(sys.argv) > 1 else "plans"
    names = sys.argv[2:] or BENCH_NAMES
    if names == ["all"]:
        names = BENCH_NAMES
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")

    spark = make_spark()
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    if mode == "plans":
        outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = queries[name](spark, SF_DIR)
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(formatted_plan(df))
            print(f"wrote {path}")
    elif mode == "time":
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
        # warm pass (worker spinup + page cache), then interleaved repeats
        for name in names:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            noop(queries[name](spark, SF_DIR))
        best: dict[str, float] = {}
        for _ in range(repeats):
            for name in names:
                spark.sparkContext.setJobDescription(f"time:{name}")
                t0 = time.perf_counter()
                noop(queries[name](spark, SF_DIR))
                dt = time.perf_counter() - t0
                best[name] = min(best.get(name, 1e9), dt)
        for name in names:
            print(f"{name}: {best[name]:.3f}s (noop, min of {repeats})")
    elif mode == "timeforce":
        # the frozen bench's own action (pruneproof) for apples-to-apples
        repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
        for name in names:
            pruneproof(queries[name](spark, SF_DIR)).collect()
        best = {}
        for _ in range(repeats):
            for name in names:
                spark.sparkContext.setJobDescription(f"force:{name}")
                t0 = time.perf_counter()
                pruneproof(queries[name](spark, SF_DIR)).collect()
                dt = time.perf_counter() - t0
                best[name] = min(best.get(name, 1e9), dt)
        for name in names:
            print(f"{name}: {best[name]:.3f}s (pruneproof, min of {repeats})")
    else:
        raise SystemExit(f"unknown mode {mode}")
    spark.stop()


if __name__ == "__main__":
    main()
