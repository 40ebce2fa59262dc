"""Distributed URL frontier: driver fixpoint loop over DataFrames.

Each round (the Spark shape of SURVEY.md §3.3):

    frontier ──canonicalize──▶ dedup-first (window on key)
             ──bloom prune + exact anti-join──▶ new candidates
             ──salted repartitionByRange + secondary sort──▶ priority
             ──per-host budget window──▶ fetch_now / deferred
             ──fetch UDF (scripted double, retry/backoff)──▶ results
             ──explode children──▶ discovered
    seen/failed/metrics updated; snapshot checkpoint; repeat.

Determinism contract: every "first" and every position is derived from
explicit columns (depth, host_rank, disc_seq) — the pure-Python oracle
(oracle.py) replays the same semantics and the outputs must match
byte-for-byte (tests/test_frontier.py).

Scale notes:
- the seen-set probe is bloom-pruned (``bloom_filter_agg`` /
  ``might_contain``) so at 10^10 URLs the exact anti-join only sees
  the maybe-seen sliver; the exact join keeps the crawl
  false-positive-free (a bloom hit never silently drops a URL);
- the priority queue is repartitionByRange on (depth, host_rank,
  salt) + sortWithinPartitions: ranges keep the global order readable
  per partition, the salt splits hot hosts (skew);
- the global fetch position exists only for the ordering contract; the
  crawl itself needs order only WITHIN host (politeness) and the
  priority ranges, so nothing at scale ever single-partitions except
  the tiny per-round fetch manifest.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import SnapshotCatalog

_FRONTIER_SCHEMA = "url string, depth int, disc_seq long"
_CANON_SCHEMA = (
    "url string, depth int, disc_seq long, key string, host string, host_rank int, h64 long"
)
_FETCH_SCHEMA = (
    "key string, depth int, disc_seq long, pos long, status string, attempts int, "
    "delay_ms long, h64 long"
)
_CHILD_SCHEMA = "parent_pos long, child_idx int, url string, depth int"


def _canonicalize_batches(batches):
    import pandas as pd

    from ..urlnorm import canonicalize_url, url_host
    from .fixtures import host_rank
    from .seenset import url_hash64

    for pdf in batches:
        keys = [canonicalize_url(u) for u in pdf["url"]]
        hosts = [url_host(k) or "" for k in keys]
        h64s = [url_hash64(k) for k in keys]
        yield pd.DataFrame(
            {
                "url": pdf["url"],
                "depth": pdf["depth"],
                "disc_seq": pdf["disc_seq"],
                "key": keys,
                "host": hosts,
                "host_rank": [host_rank(h) for h in hosts],
                "h64": [h - (1 << 64) if h >= 1 << 63 else h for h in h64s],
            }
        )


_BLOOM_BITS = 1 << 20


def _partial_bloom_batches(batches):
    """Per-partition counting-Bloom build over h64 keys → one blob row
    per batch; the driver merges blobs by saturating counter add."""
    import pandas as pd

    from .seenset import CountingBloom

    bloom = CountingBloom(_BLOOM_BITS, 4)
    saw = False
    for pdf in batches:
        for h in pdf["h64"]:
            bloom.add(int(h) & 0xFFFFFFFFFFFFFFFF)
            saw = True
    if saw:
        yield pd.DataFrame({"blob": [bloom.to_bytes()]})
    else:
        yield pd.DataFrame({"blob": pd.Series([], dtype=object)})


def build_bloom_distributed(seen_all: DataFrame):
    """Distributed counting-Bloom over the seen set: partial filters
    per partition, merged on the driver (counters add, saturating).
    At 10^10 keys this is the shard-build loop of the north_rule's
    partitioned structure; here shards collapse into one broadcastable
    blob."""
    import numpy as np

    from .seenset import CountingBloom

    blobs = seen_all.select("h64").mapInPandas(
        _partial_bloom_batches, schema="blob binary"
    ).collect()
    merged = CountingBloom(_BLOOM_BITS, 4)
    for row in blobs:
        part = CountingBloom.from_bytes(bytes(row["blob"]))
        total = merged.counts.astype(np.uint16) + part.counts.astype(np.uint16)
        merged.counts = np.minimum(total, 255).astype(np.uint8)
    return merged


def _probe_bloom_batches_factory(bloom_blob: bytes):
    def probe(batches):
        import numpy as np
        import pandas as pd

        from .seenset import CountingBloom, url_hash64

        bloom = CountingBloom.from_bytes(bloom_blob)
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(maybe_seen=pd.Series([], dtype=bool))
                continue
            hs = np.array([url_hash64(k) for k in pdf["key"]], dtype=np.uint64)
            yield pdf.assign(maybe_seen=bloom.might_contain_many(hs))

    return probe


def _robots_batches(batches):
    """Robots 'fetch' for newly met hosts → cache rows (deterministic
    double; production swaps in an HTTP robots.txt fetch)."""
    import pandas as pd

    from .fixtures import robots_rules

    for pdf in batches:
        rules = [robots_rules(h) for h in pdf["host"]]
        yield pd.DataFrame(
            {
                "host": pdf["host"],
                "disallow": [r["disallow"] for r in rules],
                "crawl_delay_level": [r["crawl_delay_level"] for r in rules],
            }
        )


def _fetch_batches(
    batches,
    decode_payload: bool = False,
    payload_images: int = 2,
    payload_scale: int = 1,
    hold_ms: int = 0,
):
    import functools as _ft
    import time as _t

    import pandas as pd

    from .fixtures import fetch_with_retries
    from .seenset import url_hash64

    if decode_payload:
        from ..mime.splitter import parse_mhtml
        from ..sources.corpus import build_archive

        # corpus synthesis stands in for the network body; production
        # never pays it, so amortize it per worker over a bounded pool
        # of distinct archives (the DECODE runs per URL, uncached —
        # that is the measured work)
        cached_build = _ft.lru_cache(maxsize=64)(build_archive)

    for pdf in batches:
        rows = []
        for key, depth, disc_seq, pos in zip(pdf["key"], pdf["depth"], pdf["disc_seq"], pdf["pos"]):
            status, attempts, delay_ms = fetch_with_retries(key)
            h64 = url_hash64(key)
            if hold_ms:
                # per-attempt service-time hold, the reference's own
                # benchmarking technique (test/concurrency.test.js:56-63)
                _t.sleep(attempts * hold_ms / 1000.0)
            if decode_payload and status == "ok":
                # the fetched body IS an MHTML archive: run the payload
                # stage inline (north-rule metric: URLs fetched+DECODED)
                parse_mhtml(cached_build(h64 % 64, payload_images, payload_scale))
            rows.append(
                {
                    "key": key,
                    "depth": int(depth),
                    "disc_seq": int(disc_seq),
                    "pos": int(pos),
                    "status": status,
                    "attempts": attempts,
                    "delay_ms": delay_ms,
                    # signed two's-complement so the value fits LongType
                    "h64": h64 - (1 << 64) if h64 >= 1 << 63 else h64,
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["key", "depth", "disc_seq", "pos", "status", "attempts", "delay_ms", "h64"],
        )


def _children_batches(batches, fanout: int = 3, n_hosts: int = 7):
    import pandas as pd

    from ..urlnorm import is_fetchable
    from .fixtures import children_of

    for pdf in batches:
        rows = []
        for pos, key, depth in zip(pdf["pos"], pdf["key"], pdf["depth"]):
            for j, child in enumerate(children_of(key, fanout, n_hosts)):
                if is_fetchable(child):
                    rows.append(
                        {
                            "parent_pos": int(pos),
                            "child_idx": j,
                            "url": child,
                            "depth": int(depth) + 1,
                        }
                    )
        yield pd.DataFrame(rows, columns=["parent_pos", "child_idx", "url", "depth"])


@dataclass
class SparkCrawlResult:
    order: list[dict] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    failed: set[str] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)
    metrics: list[dict] = field(default_factory=list)
    snapshots: list[int] = field(default_factory=list)


def crawl_spark(
    spark: SparkSession,
    seeds: list[str],
    max_rounds: int = 6,
    host_budget: int = 8,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    salt_buckets: int = 4,
    collect_order: bool = True,
    decode_payload: bool = False,
    fanout: int = 3,
    n_hosts: int = 7,
    payload_images: int = 2,
    payload_scale: int = 1,
    hold_ms: int = 0,
    use_robots: bool = False,
    range_partition_threshold: int = 50_000,
    verbose: bool = False,
) -> SparkCrawlResult:
    """Run the crawl to fixpoint (or ``max_rounds``); optionally
    checkpoint each round to ``checkpoint_dir`` and resume from the
    latest snapshot there."""
    from ..urlnorm import is_fetchable, unwrap_urn

    result = SparkCrawlResult()
    catalog = SnapshotCatalog(checkpoint_dir) if checkpoint_dir else None

    empty_seen = spark.createDataFrame([], "key string, h64 long")
    start_round = 0
    disc_total = 0

    empty_robots = spark.createDataFrame(
        [], "host string, disallow string, crawl_delay_level int"
    )
    if resume and catalog is not None and catalog.latest() is not None:
        manifest = catalog.latest()
        snap = manifest["snapshot_id"]
        frontier = catalog.load_table(spark, snap, "frontier")
        seen = catalog.load_table(spark, snap, "seen")
        failed = catalog.load_table(spark, snap, "failed")
        start_round = manifest["round"] + 1
        disc_total = manifest["metrics"]["disc_total"]
        order_acc = catalog.load_table(spark, snap, "order")
        result.metrics = manifest["metrics"].get("rounds", [])
        if use_robots:
            robots_cache = catalog.load_table(spark, snap, "robots")
            blocked = catalog.load_table(spark, snap, "blocked")
        else:
            robots_cache = empty_robots
            blocked = empty_seen
    else:
        rows = []
        for url in seeds:
            if is_fetchable(url):
                rows.append((unwrap_urn(url), 0, disc_total))
                disc_total += 1
        frontier = spark.createDataFrame(rows, _FRONTIER_SCHEMA)
        seen = empty_seen
        failed = empty_seen
        order_acc = spark.createDataFrame(
            [], "round int, pos long, url string, depth int, status string, attempts int"
        )
        robots_cache = empty_robots
        blocked = empty_seen

    # driver-held incremental counting-Bloom over seen ∪ failed: each
    # round adds only the newly fetched keys (budget-bounded, tiny); on
    # resume it is rebuilt distributed from the checkpointed state
    from .seenset import CountingBloom

    bloom = CountingBloom(_BLOOM_BITS, 4)
    have_seen = start_round > 0
    if have_seen:
        rebuilt_from = seen.unionByName(failed)
        if use_robots:
            rebuilt_from = rebuilt_from.unionByName(blocked)
        bloom = build_bloom_distributed(rebuilt_from)
    expected_frontier = frontier.count()

    for round_idx in range(start_round, max_rounds):
        # 1. canonicalize + host metadata (one vectorized UDF pass)
        canon = frontier.mapInPandas(_canonicalize_batches, schema=_CANON_SCHEMA)

        # 2. within-round first-discovery dedup: deterministic min_by on
        #    the explicit disc_seq (never dropDuplicates — shuffle-order
        #    unstable). min_by aggregates map-side, so only one row per
        #    key reaches the shuffle — cheaper than a window sort at
        #    frontier scale.
        deduped = (
            canon.groupBy("key")
            .agg(
                F.min_by(
                    F.struct("url", "depth", "disc_seq", "host", "host_rank", "h64"), "disc_seq"
                ).alias("first")
            )
            .select("first.url", "first.depth", "first.disc_seq", "key", "first.host", "first.host_rank", "first.h64")
        )

        # 3. seen/failed pruning: the counting-Bloom prunes (definitely
        #    new URLs skip the shuffle entirely); the exact anti-join
        #    verifies the maybe-seen sliver, keeping the crawl
        #    false-positive-free
        if have_seen:
            seen_all = seen.unionByName(failed)
            if use_robots:
                seen_all = seen_all.unionByName(blocked)
            probed = deduped.mapInPandas(
                _probe_bloom_batches_factory(bloom.to_bytes()),
                schema=_CANON_SCHEMA + ", maybe_seen boolean",
            )
            definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
            verified_new = maybe.join(seen_all.select("key"), "key", "left_anti")
            candidates = definite_new.unionByName(verified_new)
        else:
            candidates = deduped

        # 3b. robots gate: the cache table grows by the round's newly
        #     met hosts ('fetched' via the deterministic double), then a
        #     broadcast join classifies candidates; disallowed URLs go
        #     to the permanent blocked set
        n_blocked = 0
        if use_robots:
            new_hosts = (
                candidates.select("host").distinct().join(robots_cache, "host", "left_anti")
            )
            fetched_rules = new_hosts.mapInPandas(
                _robots_batches, schema="host string, disallow string, crawl_delay_level int"
            )
            robots_cache = robots_cache.unionByName(fetched_rules).localCheckpoint(eager=True)
            with_rules = candidates.join(F.broadcast(robots_cache), "host", "left")
            path = F.regexp_replace(F.col("key"), "^[a-zA-Z]+://[^/]+", "")
            allowed = F.col("disallow").isNull() | ~path.startswith(F.col("disallow"))
            with_rules = with_rules.withColumn("allowed", allowed).localCheckpoint(eager=True)
            newly_blocked = with_rules.filter(~F.col("allowed")).select("key", "h64")
            n_blocked = newly_blocked.count()
            blocked = blocked.unionByName(newly_blocked)
            for row in newly_blocked.collect():
                bloom.add(row["h64"] & 0xFFFFFFFFFFFFFFFF)
            candidates = with_rules.filter(F.col("allowed")).drop("allowed", "disallow")

        # 4. priority queue: salted range partitioning + secondary sort
        #    (the physical order); politeness + positions derive from
        #    the same explicit (depth, host_rank, disc_seq) columns.
        #    repartitionByRange costs a sampling pass over the input, so
        #    it is applied adaptively: only once the frontier is big
        #    enough that range-clustered partitions pay for themselves
        #    (at 10^10 that is every round; at test scale it would be
        #    pure overhead). The LOGICAL order never depends on it —
        #    the windows sort on the same explicit keys.
        if expected_frontier >= range_partition_threshold:
            salt = (F.xxhash64("key") % salt_buckets).cast("int")
            prioritized = candidates.withColumn("salt", salt).repartitionByRange(
                max(spark.sparkContext.defaultParallelism, 4),
                "depth",
                "host_rank",
                "salt",
            ).sortWithinPartitions("depth", "host_rank", "disc_seq").drop("salt")
        else:
            prioritized = candidates

        # 5. politeness: per-host budget, overflow deferred to next
        #    round. Materialize ONCE — everything downstream (fetch
        #    manifest, deferred frontier, counts) derives from this
        #    single evaluation of the round pipeline.
        import time as _time

        _t0 = _time.perf_counter()
        w_host = Window.partitionBy("host").orderBy("depth", "host_rank", "disc_seq")
        budgeted = prioritized.withColumn("host_pos", F.row_number().over(w_host))
        if use_robots:
            # token-bucket crawl delay: the robots crawl-delay level
            # scales each host's per-round refill
            budget_col = F.greatest(
                F.lit(1), F.floor(F.lit(host_budget) / (F.col("crawl_delay_level") + 1))
            )
        else:
            budget_col = F.lit(host_budget)
        budgeted = budgeted.withColumn("token_budget", budget_col)
        budgeted = budgeted.localCheckpoint(eager=True)
        _t1 = _time.perf_counter()
        if budgeted.limit(1).count() == 0:
            break
        fetch_now = budgeted.filter(F.col("host_pos") <= F.col("token_budget"))
        deferred = budgeted.filter(F.col("host_pos") > F.col("token_budget")).select(
            "url", "depth", "disc_seq"
        )

        # 6. global fetch position (ordering-contract artifact; the
        #    per-round fetch manifest is budget×hosts rows, tiny)
        w_global = Window.orderBy("depth", "host_rank", "disc_seq")
        manifest_df = fetch_now.withColumn("pos", F.row_number().over(w_global) - 1)

        # 7. fetch (scripted double, retry/backoff inside the UDF) —
        #    repartition the manifest so the politeness-bounded fetch
        #    set spreads across every core, then materialize once
        fetch_fn = functools.partial(
            _fetch_batches,
            decode_payload=decode_payload,
            payload_images=payload_images,
            payload_scale=payload_scale,
            hold_ms=hold_ms,
        )
        # 4 waves of tasks per slot: hash partitioning is only
        # approximately even, and with one wave the slowest partition
        # IS the stage time — finer tasks cut the straggler tail
        n_par = max(spark.sparkContext.defaultParallelism, 4) * 4
        fetched = (
            manifest_df.select("key", "depth", "disc_seq", "pos")
            .repartition(n_par, "key")
            .mapInPandas(fetch_fn, schema=_FETCH_SCHEMA)
        )
        fetched = fetched.localCheckpoint(eager=True)
        _t2 = _time.perf_counter()

        # 8. link discovery from ok fetches; disc_seq continues the
        #    global counter in (parent_pos, child_idx) order
        ok = fetched.filter(F.col("status") == "ok")
        children_fn = functools.partial(_children_batches, fanout=fanout, n_hosts=n_hosts)
        children = ok.select("pos", "key", "depth").mapInPandas(
            children_fn, schema=_CHILD_SCHEMA
        )
        w_child = Window.orderBy("parent_pos", "child_idx")
        discovered = children.withColumn(
            "disc_seq", (F.row_number().over(w_child) - 1 + F.lit(disc_total)).cast("long")
        ).select("url", "depth", "disc_seq")

        # 9. state updates: the round's fetch rows are budget-bounded,
        #    so they come to the driver for metrics, order accounting
        #    and the incremental bloom add — one collect, no extra jobs
        fetch_rows = fetched.select(
            "pos", "key", "depth", "status", "attempts", "delay_ms", "h64"
        ).collect()
        new_seen = ok.select("key", "h64")
        new_failed = fetched.filter(F.col("status") != "ok").select("key", "h64")
        seen = seen.unionByName(new_seen)
        failed = failed.unionByName(new_failed)
        for row in fetch_rows:
            bloom.add(row["h64"] & 0xFFFFFFFFFFFFFFFF)
        have_seen = True

        round_order = fetched.select(
            F.lit(round_idx).alias("round"),
            "pos",
            F.col("key").alias("url"),
            "depth",
            "status",
            "attempts",
        )
        order_acc = order_acc.unionByName(round_order)

        n_fetched = len(fetch_rows)
        n_ok = sum(1 for r in fetch_rows if r["status"] == "ok")
        n_deferred = budgeted.filter(F.col("host_pos") > F.col("token_budget")).count()
        n_discovered = discovered.count()
        disc_total += n_discovered
        expected_frontier = n_deferred + n_discovered
        round_metrics = {
            "round": round_idx,
            "fetched": n_fetched,
            "ok": n_ok,
            "failed": n_fetched - n_ok,
            "attempts": sum(r["attempts"] for r in fetch_rows),
            "deferred": n_deferred,
            "blocked": n_blocked,
            "virtual_delay_ms": sum(r["delay_ms"] for r in fetch_rows),
        }
        result.metrics.append(round_metrics)
        if verbose:
            print(
                f"round {round_idx}: pipeline={_t1 - _t0:.2f}s fetch={_t2 - _t1:.2f}s "
                f"post={_time.perf_counter() - _t2:.2f}s fetched={n_fetched}",
                flush=True,
            )

        frontier = deferred.unionByName(discovered)

        # 10. checkpoint: snapshot cuts lineage AND makes the crawl
        #     resumable with per-partition manifest lineage; without a
        #     catalog, `budgeted`/`fetched` are already materialized so
        #     the next round's lineage stays one round deep
        if catalog is not None:
            tables = {
                "frontier": frontier,
                "seen": seen,
                "failed": failed,
                "order": order_acc,
            }
            if use_robots:
                tables["robots"] = robots_cache
                tables["blocked"] = blocked
            snap = catalog.write_snapshot(
                tables,
                metrics={"rounds": result.metrics, "disc_total": disc_total, **round_metrics},
                round_idx=round_idx,
            )
            result.snapshots.append(snap)
            frontier = catalog.load_table(spark, snap, "frontier")
            seen = catalog.load_table(spark, snap, "seen")
            failed = catalog.load_table(spark, snap, "failed")
            order_acc = catalog.load_table(spark, snap, "order")
            if use_robots:
                robots_cache = catalog.load_table(spark, snap, "robots")
                blocked = catalog.load_table(spark, snap, "blocked")

    if collect_order:
        for row in order_acc.orderBy("round", "pos").collect():
            result.order.append(
                {
                    "round": row["round"],
                    "pos": row["pos"],
                    "url": row["url"],
                    "depth": row["depth"],
                    "status": row["status"],
                    "attempts": row["attempts"],
                }
            )
        result.seen = {r["key"] for r in seen.select("key").collect()}
        result.failed = {r["key"] for r in failed.select("key").collect()}
        if use_robots:
            result.blocked = {r["key"] for r in blocked.select("key").collect()}
    return result
