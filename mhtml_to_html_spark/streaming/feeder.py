"""Streaming feeder loop as a production job (round-3 verdict item 5).

The round-based discovery feedback that the oracle harness drives
inline (``q_frontier_stream``) packaged as a RESUMABLE job: each round
materializes the current frontier into the stream source directory,
runs ONE ``availableNow`` pass of the streaming politeness gate
(``stream_frontier_fetch`` — applyInPandasWithState; its checkpoint
carries every host's seen set across passes AND process restarts),
then derives the next frontier from the gate's output — deferred rows
re-queue first, then ok rows discover children in fetch order (the
batch crawl's collecting walk, ``lib/convert.js:129-146`` round-loop
semantics).

Durability contract:
- the GATE state (per-host seen sets, fetch totals) lives in the
  structured-streaming checkpoint — exactly-once admission survives
  any crash;
- the FEEDER state (pending frontier + discovery counter) persists
  per round under ``work_dir/feeder`` (frontier as parquet, counters
  as json); ``resume=True`` continues from the latest COMPLETED
  round. A crash between the streaming commit and the feeder-state
  write replays one gate pass on resume: the seen state dedups every
  already-fetched key (nothing is refetched — the exactly-once
  contract holds), only the round attribution of that tail can shift,
  the standard at-least-once feeder window.

Scale shape: the driver holds only the pending frontier handles and
per-round counters; fetch, dedup, and politeness all happen inside
the stateful operator. At 10^10 URLs the frontier rows live as
parquet between rounds (they already do here) and the per-host state
rows stay bounded via the gate's Bloom graduation knob.

Ordering parity with the batch crawl oracle (byte-for-byte, same
seeds and budget) is pinned by tests/test_streaming.py, including a
mid-crawl restart.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_FRONTIER_SCHEMA = "url string, depth int, disc_seq long"
_ORDER_KEYS = ("round", "pos", "url", "depth", "status", "attempts")


def _state_meta_path(work_dir: str) -> str:
    return f"{work_dir}/feeder/latest.json"


def stream_crawl_job(
    spark: SparkSession,
    seeds: list[str],
    work_dir: str,
    max_rounds: int = 6,
    host_budget: int = 8,
    fanout: int = 3,
    n_hosts: int = 7,
    use_robots: bool = False,
    resume: bool = False,
    stop_after_round: int | None = None,
    fetcher: str = "double",
    discover: str = "scripted",
    pass_timeout_s: int = 600,
) -> dict:
    """Run the streaming crawl to fixpoint (or ``max_rounds``);
    returns ``{"rounds": [...], "fixpoint": bool, "next_round": int}``
    with one metrics dict per executed round. ``stop_after_round``
    stops cleanly after that many NEW rounds (the mid-crawl restart
    test's hook); call again with ``resume=True`` to continue."""
    from ..frontier.fixtures import children_of, host_rank
    from ..urlnorm import is_fetchable, unwrap_urn
    from .frontier import stream_frontier_fetch

    src, sink, ckpt = f"{work_dir}/src", f"{work_dir}/sink", f"{work_dir}/ckpt"
    meta_path = _state_meta_path(work_dir)

    if resume and os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        start_round, disc = int(meta["round"]) + 1, int(meta["disc"])
        pending = meta["frontier"]
        rows = (
            [tuple(r) for r in spark.read.parquet(pending).collect()]
            if pending
            else []
        )
    else:
        start_round, disc, rows = 0, 0, []
        for u in seeds:
            if is_fetchable(u):
                rows.append((unwrap_urn(u), 0, disc))
                disc += 1

    metrics = []
    executed = 0
    r = start_round
    while r < max_rounds and rows:
        if stop_after_round is not None and executed >= stop_after_round:
            break
        spark.createDataFrame(rows, _FRONTIER_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

        feeder_round = r

        def to_sink(df, batch_id, _r=feeder_round):
            # one subdirectory per round: the per-round read below and
            # any later order collection scan only what they need (a
            # single growing directory would make round N re-scan all
            # N-1 earlier rounds — quadratic I/O over the crawl)
            df.withColumn("feeder_round", F.lit(_r)).coalesce(1).write.mode(
                "append"
            ).parquet(f"{sink}/r{_r:06d}")

        q = (
            stream_frontier_fetch(
                spark.readStream.schema(_FRONTIER_SCHEMA).parquet(src),
                host_budget=host_budget,
                use_robots=use_robots,
                fetcher=fetcher,
                discover=discover,
            )
            .writeStream.foreachBatch(to_sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(pass_timeout_s):
            # committing feeder state off a partially-written sink
            # would silently drop the in-flight URLs forever (they are
            # already in the gate's seen state) — fail loudly instead
            q.stop()
            raise RuntimeError(
                f"streaming pass for round {feeder_round} exceeded "
                f"{pass_timeout_s}s; feeder state NOT committed — "
                "re-run with resume=True (the gate checkpoint dedups)"
            )

        out = spark.read.parquet(f"{sink}/r{feeder_round:06d}").collect()
        # blocked rows (use_robots) are reported once and join the seen
        # set but get NO crawl-order position and do not count as
        # fetched — the batch oracle's semantics
        fetched = sorted(
            (row for row in out if row["status"] not in ("deferred", "blocked")),
            key=lambda row: (row["depth"], host_rank(row["host"]), row["disc_seq"]),
        )
        # next frontier: deferred re-queue first (they keep their
        # original disc_seq — first-discovery-wins), then children of
        # ok fetches in fetch order, the collecting walk
        rows = [
            (row["url"], row["depth"], row["disc_seq"])
            for row in out
            if row["status"] == "deferred"
        ]
        for row in fetched:
            if row["status"] == "ok":
                # discover="parse": links came out of the fetched
                # bytes inside the gate (already eligibility-filtered
                # in document order); otherwise the scripted world
                kids = (
                    list(row["children"] or [])
                    if discover == "parse"
                    else children_of(row["key"], fanout, n_hosts)
                )
                for child in kids:
                    # children enter raw (the gate unwraps urns
                    # itself); only seeds pre-unwrap, mirroring the
                    # batch crawl's seed injection
                    if is_fetchable(child):
                        rows.append((child, row["depth"] + 1, disc))
                        disc += 1
        metrics.append(
            {
                "round": feeder_round,
                "fetched": len(fetched),
                "ok": sum(1 for row in fetched if row["status"] == "ok"),
                "failed": sum(1 for row in fetched if row["status"] == "failed"),
                "deferred": sum(1 for row in out if row["status"] == "deferred"),
                "blocked": sum(1 for row in out if row["status"] == "blocked"),
                "discovered": disc,
            }
        )

        # COMMIT POINT: persist the feeder state for this round
        frontier_path = ""
        if rows:
            frontier_path = f"{work_dir}/feeder/frontier_round_{feeder_round}"
            spark.createDataFrame(rows, _FRONTIER_SCHEMA).coalesce(1).write.mode(
                "overwrite"
            ).parquet(frontier_path)
        os.makedirs(f"{work_dir}/feeder", exist_ok=True)
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"round": feeder_round, "disc": disc, "frontier": frontier_path}, fh)
        os.replace(tmp, meta_path)

        executed += 1
        r += 1

    return {"rounds": metrics, "fixpoint": not rows, "next_round": r}


def stream_crawl_order(spark: SparkSession, work_dir: str) -> list[dict]:
    """Full crawl ordering from the job's sink — the batch crawl's
    test-contract shape [(round, pos, url, depth, status, attempts)],
    byte-comparable to ``crawl_oracle(...).order``. A test/debug
    collect, not part of the job's steady-state path."""
    from ..frontier.fixtures import host_rank

    out = spark.read.parquet(f"{work_dir}/sink/r*").collect()
    order = []
    for r in sorted({row["feeder_round"] for row in out}):
        fetched = sorted(
            (
                row
                for row in out
                if row["feeder_round"] == r
                and row["status"] not in ("deferred", "blocked")
            ),
            key=lambda row: (row["depth"], host_rank(row["host"]), row["disc_seq"]),
        )
        for pos, row in enumerate(fetched):
            order.append(
                dict(
                    zip(
                        _ORDER_KEYS,
                        (r, pos, row["key"], row["depth"], row["status"], row["attempts"]),
                    )
                )
            )
    return order
