"""Hardware-ceiling control for the 8-vs-32 scaling pair.

The scaling bench (scripts/bench_scaling.py) measures the whole Spark
job at local[8] vs local[32]. Per-task profiling (round 5) showed the
fetch stage's tasks are uniformly ~11% slower at 32-way than at 8-way
on this host — every task, tightly clustered, with identical work.
That is either (a) Spark overhead that appears only at full width, or
(b) the machine itself: 32 concurrent copies of the per-URL kernel
cannot run at 4x the aggregate throughput of 8 copies (shared L3 /
memory bandwidth / VM co-tenancy).

This script decides between (a) and (b) with NO Spark involved: plain
multiprocessing.Pool runs the IDENTICAL per-URL kernel the fetch UDF
runs (scripted fetch double + full MHTML decode of the same synthetic
archives, same payload_images/payload_scale as bench_scaling.py), at
8 and at 32 workers, interleaved. Per-core retention =
(throughput_32 / throughput_8) / 4. Whatever retention this prints is
the HARDWARE ceiling for the Spark job's CPU-bound fraction — Spark
cannot scale the decode better than the bare machine does.

Run: python scripts/bench_core_ceiling.py [--reps N]
Prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PAYLOAD_IMAGES = 8  # keep in lockstep with bench_scaling.BASE_PARAMS
PAYLOAD_SCALE = 3
DECODES_PER_TASK = 40


def _kernel(seed: int) -> int:
    """The fetch UDF's per-URL CPU work (spark_frontier._fetch_batches):
    scripted fetch + full MHTML decode. No sleep — the hold scales
    perfectly by construction; the CPU part is what contends."""
    from mhtml_to_html_spark.frontier.fixtures import fetch_with_retries
    from mhtml_to_html_spark.frontier.seenset import url_hash64
    from mhtml_to_html_spark.mime.splitter import parse_mhtml
    from mhtml_to_html_spark.sources.corpus import build_archive

    n = 0
    for i in range(DECODES_PER_TASK):
        key = f"https://host{seed % 97}.example.com/seed/{seed}/{i}"
        status, attempts, _delay = fetch_with_retries(key)
        h64 = url_hash64(key)
        if status == "ok":
            parse_mhtml(build_archive(h64 % 64, PAYLOAD_IMAGES, PAYLOAD_SCALE))
            n += 1
    return n


def run_at(workers: int, tasks: int) -> dict:
    with mp.Pool(workers) as pool:
        pool.map(_kernel, range(workers))  # warm: imports + allocator
        start = time.perf_counter()
        done = sum(pool.map(_kernel, range(1000, 1000 + tasks)))
        wall = time.perf_counter() - start
    return {
        "workers": workers,
        "wall_s": round(wall, 2),
        "decodes": done,
        "decodes_per_sec": round(done / wall, 1),
    }


def main() -> None:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3
    # same total work at both widths; whole number of waves at both
    tasks = 32 * 4
    best: dict[int, dict] = {}
    for _ in range(reps):
        for w in (8, 32):
            r = run_at(w, tasks)
            r["loadavg"] = round(os.getloadavg()[0], 2)
            print(json.dumps(r), flush=True)
            if w not in best or r["wall_s"] < best[w]["wall_s"]:
                best[w] = r
    retention = round((best[32]["decodes_per_sec"] / best[8]["decodes_per_sec"]) / 4, 3)
    print(
        json.dumps(
            {
                "metric": "bare-multiprocessing per-core retention, 8 -> 32 workers, "
                "identical per-URL kernel (fetch double + MHTML decode)",
                "best_8": best[8],
                "best_32": best[32],
                "per_core_retention": retention,
                "note": "this is the hardware ceiling for the Spark job's "
                "CPU-bound fraction on this host; no Spark involved",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
