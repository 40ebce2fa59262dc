"""Distributed URL frontier: driver fixpoint loop over DataFrames.

Each round (the Spark shape of SURVEY.md §3.3):

    [drained? recrawl injection: stalest-per-host revisits re-enter;
     their keys DELETED from the exact seen table + hybrid filter]
    frontier ──canonicalize──▶ dedup-first (min_by on key)
             ──sharded bloom+cuckoo prune + exact anti-join──▶ new candidates
             ──salted repartitionByRange + secondary sort──▶ priority
             ──per-host budget window (+ opt-in politeness-debt boost,
               robots token-bucket)──▶ fetch_now / deferred
             ──fetch UDF (scripted double, retry/backoff)──▶ results
             ──explode children──▶ discovered
    seen/failed/metrics updated; snapshot checkpoint; repeat.

Determinism contract: every "first" and every position is derived from
explicit columns (depth, host_rank, disc_seq) — the pure-Python oracle
(oracle.py) replays the same semantics and the outputs must match
byte-for-byte (tests/test_frontier.py).

Scale notes (no single-partition exchange, no driver-held state):
- the seen-set is the north_rule's partitioned counting-Bloom +
  cuckoo-filter hybrid, kept as a DataFrame of shard-blob rows
  (seenset.py structures serialized per shard). Updates fold new keys
  into their shard via cogroup-applyInPandas (one task per shard);
  probes co-partition candidates with their shard's blob the same way
  — the filter is never broadcast, never driver-held, and rides
  snapshots as ordinary binary rows, so 10^10-key sizing (~10 GiB of
  filter) never needs one machine. The exact key table stays the
  source of truth: a filter false positive never drops a URL (exact
  anti-join verifies the maybe-seen sliver), and because neither
  structure has false negatives, a seen URL is never refetched;
- the priority queue is repartitionByRange on (depth, host_rank,
  salt) + sortWithinPartitions: ranges keep the global order readable
  per partition, the salt splits hot hosts (skew);
- global fetch positions and discovery sequence numbers are assigned
  by indexing.assign_global_index (two-pass zipWithIndex trick over
  range-partitioned data) once the frontier passes the same adaptive
  threshold as the range partitioner — above it a partitionless
  window would funnel budget×hosts (or fanout×fetched) rows through
  one task; below it the rows are few by definition and the window is
  cheaper. Both paths produce the identical logical order and both are
  pinned to the oracle by tests;
- per-round metrics are one agg; nothing per-row ever reaches the
  driver (the test-contract order collection at the very end is the
  only exception, and ``collect_order=False`` turns it off).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.catalog import SnapshotCatalog
from .indexing import assign_global_index

_FRONTIER_SCHEMA = "url string, depth int, disc_seq long"
_CANON_SCHEMA = (
    "url string, depth int, disc_seq long, key string, host string, host_rank int, h64 long"
)
_FETCH_SCHEMA = (
    "key string, host string, depth int, disc_seq long, pos long, status string, "
    "attempts int, delay_ms long, h64 long, children array<string>"
)
_SEEN_SCHEMA = "key string, h64 long, host string, fetched_round int"
_SHARD_BLOB_SCHEMA = "shard int, bloom binary, cuckoo binary"


def _canonicalize_batches(batches):
    import pandas as pd

    from ..urlnorm import canonicalize_url, url_host
    from .fixtures import host_rank
    from .seenset import url_hash64

    for pdf in batches:
        keys = [canonicalize_url(u) for u in pdf["url"]]
        hosts = [url_host(k) or "" for k in keys]
        h64s = [url_hash64(k) for k in keys]
        out = {
            "url": pdf["url"],
            "depth": pdf["depth"],
            "disc_seq": pdf["disc_seq"],
            "key": keys,
            "host": hosts,
            "host_rank": [host_rank(h) for h in hosts],
            "h64": [h - (1 << 64) if h >= 1 << 63 else h for h in h64s],
        }
        if "revisit" in pdf.columns:  # recrawl manifests (streaming gate)
            out["revisit"] = pdf["revisit"]
        yield pd.DataFrame(out)


# --- sharded seen-set as a DataFrame of shard blobs ---------------------------
#
# The north_rule's partitioned counting-Bloom + cuckoo-filter hybrid,
# kept WHERE a 10^10-key structure must live: as rows, one per shard,
# co-partitioned with the keys that probe and update it. Nothing is
# ever broadcast or driver-held — at 10^10 URLs the full filter is
# ~10 GiB and only exists as the union of its shard rows (which is
# also how it rides snapshots: ordinary binary columns in parquet).
#
# shard = h64 % n_shards with n_shards a power of two, so the JVM
# pmod over the SIGNED h64 and Python's unsigned modulo agree
# (2^64 ≡ 0 mod 2^k).


def _shard_col(n_shards: int):
    return F.pmod(F.col("h64"), F.lit(n_shards)).cast("int")


def _seenset_merge_fn(bloom_bits: int, cuckoo_buckets: int):
    """Cogroup(shard): (existing blob row | ∅) × (new h64 rows | ∅) →
    updated blob row. Work per task is one shard's blob + its adds."""

    def merge(key, blob_pdf, adds_pdf):
        import pandas as pd

        from .seenset import CountingBloom, CuckooFilter

        if len(blob_pdf):
            bloom = CountingBloom.from_bytes(bytes(blob_pdf["bloom"].iloc[0]))
            cuckoo = CuckooFilter.from_bytes(bytes(blob_pdf["cuckoo"].iloc[0]))
        else:
            bloom = CountingBloom(bloom_bits, 4)
            cuckoo = CuckooFilter(cuckoo_buckets)
        for h in adds_pdf["h64"]:
            h = int(h) & 0xFFFFFFFFFFFFFFFF
            bloom.add(h)
            cuckoo.add(h)
        return pd.DataFrame(
            [{"shard": int(key[0]), "bloom": bloom.to_bytes(), "cuckoo": cuckoo.to_bytes()}]
        )

    return merge


def seenset_merge(seenset_df: DataFrame, adds: DataFrame, n_shards: int,
                  bloom_bits: int, cuckoo_buckets: int) -> DataFrame:
    """Fold an ``h64`` column into the shard-blob table (lazy)."""
    keyed = adds.select("h64").withColumn("shard", _shard_col(n_shards))
    return (
        seenset_df.groupby("shard")
        .cogroup(keyed.groupby("shard"))
        .applyInPandas(_seenset_merge_fn(bloom_bits, cuckoo_buckets), schema=_SHARD_BLOB_SCHEMA)
    )


def _seenset_probe_fn(out_schema_cols):
    """Cogroup(shard): candidates × blob row → candidates + maybe_seen.
    Vectorized Bloom reject first; cuckoo verify only on the
    Bloom-positive sliver. No blob → shard has never seen a key."""

    def probe(key, cand_pdf, blob_pdf):
        import numpy as np
        import pandas as pd

        from .seenset import CountingBloom, CuckooFilter

        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=out_schema_cols)
        if len(blob_pdf) == 0:
            return cand_pdf.assign(maybe_seen=False)
        bloom = CountingBloom.from_bytes(bytes(blob_pdf["bloom"].iloc[0]))
        cuckoo = CuckooFilter.from_bytes(bytes(blob_pdf["cuckoo"].iloc[0]))
        hs = cand_pdf["h64"].to_numpy(dtype=np.int64).astype(np.uint64)
        maybe = bloom.might_contain_many(hs)
        hit_idx = np.where(maybe)[0]
        for j in hit_idx:
            maybe[j] = cuckoo.contains(int(hs[j]))
        return cand_pdf.assign(maybe_seen=maybe)

    return probe


def seenset_probe(candidates: DataFrame, seenset_df: DataFrame, n_shards: int) -> DataFrame:
    """candidates (with h64) → + ``maybe_seen`` boolean; one task per
    shard, each holding exactly one blob and its co-partitioned keys."""
    keyed = candidates.withColumn("shard", _shard_col(n_shards))
    cols = keyed.columns + ["maybe_seen"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in keyed.schema.fields
    ) + ", maybe_seen boolean"
    return (
        keyed.groupby("shard")
        .cogroup(seenset_df.groupby("shard"))
        .applyInPandas(_seenset_probe_fn(cols), schema=schema)
        .drop("shard")
    )


def _seenset_remove_fn():
    """Cogroup(shard): (blob row | ∅) × (h64 rows to delete) → updated
    blob row. Deletion is WHY the Bloom side counts: a plain bitset
    Bloom cannot forget, a counting one decrements; the cuckoo filter
    deletes its fingerprint. Recrawl uses this to re-admit exactly the
    revisited keys through the normal exactly-once machinery."""

    def remove(key, blob_pdf, dels_pdf):
        import pandas as pd

        from .seenset import CountingBloom, CuckooFilter

        if not len(blob_pdf):
            return pd.DataFrame(columns=["shard", "bloom", "cuckoo"])
        bloom = CountingBloom.from_bytes(bytes(blob_pdf["bloom"].iloc[0]))
        cuckoo = CuckooFilter.from_bytes(bytes(blob_pdf["cuckoo"].iloc[0]))
        for h in dels_pdf["h64"]:
            h = int(h) & 0xFFFFFFFFFFFFFFFF
            bloom.remove(h)
            cuckoo.remove(h)
        return pd.DataFrame(
            [{"shard": int(key[0]), "bloom": bloom.to_bytes(), "cuckoo": cuckoo.to_bytes()}]
        )

    return remove


def seenset_remove(seenset_df: DataFrame, dels: DataFrame, n_shards: int) -> DataFrame:
    """Delete an ``h64`` column from the shard-blob table (lazy): same
    co-partitioned cogroup shape as :func:`seenset_merge`."""
    keyed = dels.select("h64").withColumn("shard", _shard_col(n_shards))
    return (
        seenset_df.groupby("shard")
        .cogroup(keyed.groupby("shard"))
        .applyInPandas(_seenset_remove_fn(), schema=_SHARD_BLOB_SCHEMA)
    )


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


def extract_links(body: bytes) -> list[str]:
    """Anchor URLs of a fetched archive's index document — the
    real-crawl discovery path (the reference's collecting walk over
    the converted page, lib/convert.js:129-146): parse the MHTML,
    take the index document (already charset-decoded by the splitter
    cascade), resolve every <a href> against its Content-Location,
    keep the fetchable ones in document order, first occurrence wins.
    Runs inside the fetch UDF on bytes already in memory — no second
    pass over the corpus."""
    import urllib.parse

    from ..mime.dom import Element, parse_html
    from ..mime.splitter import parse_mhtml
    from ..urlnorm import is_fetchable

    try:
        res = parse_mhtml(body)
    except Exception:
        return []
    index = next((part for part in res.parts if part.is_index), None)
    if index is None or not index.text:
        return []
    base = index.content_location or ""
    try:
        doc = parse_html(index.text)
    except Exception:
        return []
    out: list[str] = []
    seen_local: set[str] = set()
    stack = [doc]
    while stack:
        node = stack.pop()
        kids = getattr(node, "children", None) or []
        for child in reversed(kids):
            stack.append(child)
        if isinstance(node, Element) and node.tag == "a":
            href = node.get_attribute("href")
            if not href:
                continue
            try:
                absu = urllib.parse.urljoin(base, href)
            except Exception:
                continue
            if absu and is_fetchable(absu) and absu not in seen_local:
                seen_local.add(absu)
                out.append(absu)
    return out


def _fetch_batches(
    batches,
    decode_payload: bool = False,
    payload_images: int = 2,
    payload_scale: int = 1,
    hold_ms: int = 0,
    fetcher: str = "double",
    http_timeout: float = 10.0,
    discover: str = "scripted",
    fanout: int = 3,
    n_hosts: int = 7,
):
    import functools as _ft
    import time as _t

    import pandas as pd

    from ..urlnorm import is_fetchable
    from .fixtures import children_of, fetch_with_retries
    from .seenset import url_hash64

    if fetcher == "http":
        from .httpclient import fetch_url_with_retries
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
        for key, host, depth, disc_seq, pos in zip(
            pdf["key"], pdf["host"], pdf["depth"], pdf["disc_seq"], pdf["pos"]
        ):
            body = b""
            if fetcher == "http":
                # the production seam: real sockets, same retry
                # contract/code as the double (frontier/httpclient.py)
                status, attempts, delay_ms, _ct, body = fetch_url_with_retries(
                    key, timeout=http_timeout
                )
            else:
                status, attempts, delay_ms = fetch_with_retries(key)
            h64 = url_hash64(key)
            if hold_ms:
                # per-attempt service-time hold, the reference's own
                # benchmarking technique (test/concurrency.test.js:56-63)
                _t.sleep(attempts * hold_ms / 1000.0)
            if decode_payload and status == "ok":
                # the fetched body IS an MHTML archive: run the payload
                # stage inline (north-rule metric: URLs fetched+DECODED).
                # With the real client the REAL bytes are decoded; the
                # double synthesizes a stand-in body
                if fetcher == "http" and body:
                    parse_mhtml(body)
                else:
                    parse_mhtml(cached_build(h64 % 64, payload_images, payload_scale))
            children: list[str] = []
            if discover == "parse" and status == "ok" and body:
                # real-crawl discovery: links come from the fetched
                # bytes, not the scripted children_of world
                children = extract_links(body)
            elif discover == "scripted" and status == "ok":
                # scripted discovery rides the same fetch pass (one
                # Python stage per round instead of two); eligibility
                # filtering here preserves document order, which is
                # all the (parent_pos, child_idx) contract needs
                children = [
                    c for c in children_of(key, fanout, n_hosts) if is_fetchable(c)
                ]
            rows.append(
                {
                    "key": key,
                    "host": host,
                    "depth": int(depth),
                    "disc_seq": int(disc_seq),
                    "pos": int(pos),
                    "status": status,
                    "attempts": attempts,
                    "delay_ms": delay_ms,
                    # signed two's-complement so the value fits LongType
                    "h64": h64 - (1 << 64) if h64 >= 1 << 63 else h64,
                    "children": children,
                }
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "key", "host", "depth", "disc_seq", "pos", "status", "attempts",
                "delay_ms", "h64", "children",
            ],
        )


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
    collect_order: bool = False,
    decode_payload: bool = False,
    fanout: int = 3,
    n_hosts: int = 7,
    payload_images: int = 2,
    payload_scale: int = 1,
    hold_ms: int = 0,
    use_robots: bool = False,
    range_partition_threshold: int = 50_000,
    seen_shards: int = 8,
    seen_bloom_bits: int = 1 << 18,
    seen_cuckoo_buckets: int = 1 << 13,
    probe_threshold: int = 20_000,
    robots_broadcast_threshold: int = 100_000,
    robots_flatten_every: int = 8,
    recrawl_budget: int = 0,
    max_recrawls: int = 1,
    debt_boost: bool = False,
    verbose: bool = False,
    fetcher: str = "double",
    http_timeout: float = 10.0,
    discover: str = "scripted",
    fetch_rows_per_task: int = 24,
) -> SparkCrawlResult:
    """Run the crawl to fixpoint (or ``max_rounds``); optionally
    checkpoint each round to ``checkpoint_dir`` and resume from the
    latest snapshot there.

    Seen-set sizing: the hybrid filters are an accelerator, never the
    source of truth, so undersizing degrades the prune (more rows pay
    the exact anti-join) without ever corrupting the crawl. Size
    ``seen_bloom_bits`` ≈ 10× expected keys per shard and
    ``seen_cuckoo_buckets`` ≈ expected keys per shard / 3.8 (4-slot
    buckets at ~95% load); at 10^10 URLs that is ~1.25 GiB of Bloom
    counters across e.g. 1024 shards — the structure only ever exists
    as shard rows co-partitioned with their keys, so nothing needs one
    machine to hold (or broadcast) the whole filter."""
    from ..urlnorm import is_fetchable, unwrap_urn

    if discover == "parse" and fetcher != "http":
        # the scripted double carries no body, so parse-discovery would
        # silently crawl nothing past the seeds
        raise ValueError('discover="parse" requires fetcher="http"')

    assert seen_shards & (seen_shards - 1) == 0, "seen_shards must be a power of two"

    result = SparkCrawlResult()
    catalog = SnapshotCatalog(checkpoint_dir) if checkpoint_dir else None

    # seen carries (host, fetched_round) for the recrawl scheduler;
    # failed/blocked are permanent deny-lists and stay (key, h64)
    empty_seen = spark.createDataFrame([], _SEEN_SCHEMA)
    empty_keys = spark.createDataFrame([], "key string, h64 long")
    start_round = 0
    disc_total = 0
    resumed_recrawls_done = 0

    empty_robots = spark.createDataFrame(
        [], "host string, disallow string, crawl_delay_level int"
    )
    empty_debt = spark.createDataFrame([], "host string, debt long")
    debt_df = empty_debt
    seenset_df = spark.createDataFrame([], _SHARD_BLOB_SCHEMA)
    # seen keys fetched since the last blob merge (lazy union of
    # checkpointed per-round outputs): the hybrid filter is an
    # ACCELERATOR that only pays for itself once the probe actually
    # runs (seen_total >= probe_threshold), so folding every round's
    # adds into the shard blobs before that point is a pure
    # shuffle+checkpoint tax — one cogroup per round for nothing
    seen_pending = None
    seenset_loaded = False
    if resume and catalog is not None and catalog.latest() is not None:
        manifest = catalog.latest()
        snap = manifest["snapshot_id"]
        frontier = catalog.load_table(spark, snap, "frontier")
        seen = catalog.load_table(spark, snap, "seen")
        # pre-recrawl snapshots lack (host, fetched_round): null-fill
        # (additive schema evolution, same rule the catalog applies)
        if "host" not in seen.columns:
            seen = seen.withColumn("host", F.lit(None).cast("string"))
        if "fetched_round" not in seen.columns:
            seen = seen.withColumn("fetched_round", F.lit(None).cast("int"))
        failed = catalog.load_table(spark, snap, "failed")
        start_round = manifest["round"] + 1
        disc_total = manifest["metrics"]["disc_total"]
        resumed_recrawls_done = int(manifest["metrics"].get("recrawls_done", 0))
        order_acc = catalog.load_table(spark, snap, "order")
        result.metrics = manifest["metrics"].get("rounds", [])
        if use_robots:
            robots_cache = catalog.load_table(spark, snap, "robots")
            blocked = catalog.load_table(spark, snap, "blocked")
        else:
            robots_cache = empty_robots
            blocked = empty_keys
        try:
            seenset_df = catalog.load_table(spark, snap, "seenset")
            seenset_loaded = True
        except Exception:
            pass  # pre-seenset snapshot: rebuilt below
        if debt_boost:
            try:
                debt_df = catalog.load_table(spark, snap, "debt")
            except Exception:
                debt_df = empty_debt  # pre-debt snapshot: no boost info
    else:
        rows = []
        for url in seeds:
            if is_fetchable(url):
                rows.append((unwrap_urn(url), 0, disc_total))
                disc_total += 1
        frontier = spark.createDataFrame(rows, _FRONTIER_SCHEMA)
        seen = empty_seen
        failed = empty_keys
        order_acc = spark.createDataFrame(
            [], "round int, pos long, url string, depth int, status string, attempts int"
        )
        robots_cache = empty_robots
        blocked = empty_keys

    # the politeness backlog (deferred rows) is carried CANONICALIZED
    # between rounds: a row that cleared admission once (canon + dedup
    # + seen prune + robots) never re-pays it. At 10^10-URL scale a
    # throttled host's whole queue would otherwise recycle through the
    # canonicalize UDF, the dedup shuffle, the filter probe and the
    # rules join on EVERY round — O(backlog × rounds) admission work
    # for rows whose verdict cannot change (deferred keys cannot enter
    # seen/failed/blocked while they wait, and robots rules per host
    # are immutable once cached).
    pend_cols = ["url", "depth", "disc_seq", "key", "host", "host_rank", "h64"]
    if use_robots:
        pend_cols.append("crawl_delay_level")
    empty_pending = spark.createDataFrame(
        [], _CANON_SCHEMA + (", crawl_delay_level int" if use_robots else "")
    )
    pending = empty_pending
    n_pending = 0

    have_seen = start_round > 0
    if have_seen and not seenset_loaded:
        # pre-seenset checkpoint: rebuild the hybrid distributed from
        # the exact key tables (one cogroup pass, one task per shard)
        rebuilt_from = seen.select("key", "h64").unionByName(failed)
        if use_robots:
            rebuilt_from = rebuilt_from.unionByName(blocked)
        seenset_df = seenset_merge(
            seenset_df, rebuilt_from, seen_shards, seen_bloom_bits, seen_cuckoo_buckets
        ).localCheckpoint(eager=True)
    expected_frontier = frontier.count()
    seen_total = sum(m["fetched"] + m.get("blocked", 0) for m in result.metrics)
    n_par = max(spark.sparkContext.defaultParallelism, 4)
    # the injection budget must survive resume: a resumed crawl that
    # forgot its past injections would exceed max_recrawls and diverge
    # from both the oracle and the uninterrupted run
    recrawls_done = resumed_recrawls_done if start_round > 0 else 0
    robots_large = False
    robots_chain_len = 0
    n_debt_hosts = 0
    # resume: one count() seeds the incremental robots-host counter
    n_robots_hosts = robots_cache.count() if use_robots and start_round > 0 else 0

    for round_idx in range(start_round, max_rounds):
        # 0. recrawl injection: when the frontier drains with rounds
        #    left, re-enqueue each host's ``recrawl_budget`` stalest
        #    seen pages (plan_recrawl's manifest — per-host top-N, no
        #    global sort) at depth 0 with fresh disc_seq assigned in
        #    (host, rank) order. The revisited keys are REMOVED from
        #    the exact seen table AND the hybrid filter first — the
        #    counting-Bloom decrements, the cuckoo deletes its
        #    fingerprint (deletion is why the Bloom counts) — so the
        #    unchanged exactly-once machinery re-admits exactly them.
        #    Same adaptive index rule as steps 4/6 (hosts×budget rows
        #    can be huge at 10^7 hosts).
        n_recrawled = 0
        if expected_frontier == 0 and recrawl_budget > 0 and recrawls_done < max_recrawls:
            revisits = plan_recrawl(
                seen.select("key", "host", "fetched_round"),
                host_budget=recrawl_budget,
                current_round=round_idx,
            )
            if seen_total >= range_partition_threshold:
                revisits, n_recrawled = assign_global_index(
                    revisits,
                    ["host", "rk"],
                    out_col="rseq",
                    start=disc_total,
                    num_partitions=n_par,
                    return_count=True,
                )
            else:
                w_r = Window.orderBy("host", "rk")
                revisits = revisits.withColumn(
                    "rseq",
                    (F.row_number().over(w_r) - 1 + F.lit(disc_total)).cast("long"),
                )
                revisits = revisits.localCheckpoint(eager=True)
                n_recrawled = revisits.count()
            if n_recrawled:
                removed_h64 = seen.join(
                    revisits.select("key"), "key", "left_semi"
                ).select("h64")
                if seen_pending is not None:
                    # fold deferred adds first so the removal sees
                    # every key (stays lazy — the checkpoint below
                    # materializes merge+remove in one pass)
                    seenset_df = seenset_merge(
                        seenset_df, seen_pending, seen_shards,
                        seen_bloom_bits, seen_cuckoo_buckets,
                    )
                    seen_pending = None
                seenset_df = seenset_remove(
                    seenset_df, removed_h64, seen_shards
                ).localCheckpoint(eager=True)
                seen = seen.join(
                    revisits.select("key"), "key", "left_anti"
                ).localCheckpoint(eager=True)
                frontier = revisits.select(
                    F.col("key").alias("url"),
                    F.lit(0).cast("int").alias("depth"),
                    F.col("rseq").cast("long").alias("disc_seq"),
                )
                disc_total += n_recrawled
                expected_frontier = n_recrawled
                seen_total = max(0, seen_total - n_recrawled)
            recrawls_done += 1
        if expected_frontier == 0:
            break

        # 1. canonicalize + host metadata (one vectorized UDF pass) —
        #    over the FRESH rows only (seeds/discoveries/recrawls); the
        #    deferred backlog is already canonical and rejoins at step 4
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

        # 3. seen/failed pruning: the sharded Bloom+cuckoo hybrid prunes
        #    (definitely-new URLs skip the anti-join entirely); the
        #    exact anti-join verifies the maybe-seen sliver, keeping the
        #    crawl false-positive-free. The probe co-partitions
        #    candidates with the shard blobs — nothing is broadcast.
        #    Below ``probe_threshold`` seen keys the filter accelerates
        #    nothing (the exact anti-join is already a small-table
        #    join), so the prune stage is skipped — the filter is an
        #    accelerator by contract, never the source of truth.
        if have_seen:
            seen_all = seen.select("key", "h64").unionByName(failed)
            if use_robots:
                seen_all = seen_all.unionByName(blocked)
            if seen_total >= probe_threshold:
                probed = seenset_probe(deduped, seenset_df, seen_shards)
                definite_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
                maybe = probed.filter(F.col("maybe_seen")).drop("maybe_seen")
                verified_new = maybe.join(seen_all.select("key"), "key", "left_anti")
                candidates = definite_new.unionByName(verified_new)
            else:
                candidates = deduped.join(seen_all.select("key"), "key", "left_anti")
        else:
            candidates = deduped
        if n_pending:
            # first-discovery vs the backlog is ONE anti-join: a
            # pending row's disc_seq is strictly smaller than any
            # fresh discovery's (the counter is monotone), so the
            # pending row always wins
            candidates = candidates.join(pending.select("key"), "key", "left_anti")

        # 3b. robots gate: the cache table grows by the round's newly
        #     met hosts ('fetched' via the deterministic double), then a
        #     join classifies candidates; disallowed URLs go to the
        #     permanent blocked set. The cache grows with every host
        #     ever met, so the join is ADAPTIVE like the index/range
        #     steps: broadcast while the cache is small, plain hash
        #     join on `host` once it passes the threshold (at 10^7-10^8
        #     hosts a forced broadcast is a multi-GB executor OOM; the
        #     hash join's exchange is then reused by the step-5
        #     politeness window, which partitions by host anyway).
        n_blocked = 0
        newly_blocked = None
        if use_robots:
            # the new-hosts count below and step 5's politeness
            # materialization BOTH consume the candidate pipeline; cut
            # it once (lazily — the count materializes it) so robots-on
            # rounds don't re-evaluate dedup + seen-prune + explode per
            # consumer. This was the dominant robots-on overhead after
            # the round-5 crawl-loop speedups shrank everything else.
            candidates = candidates.localCheckpoint(eager=False)
            new_hosts = (
                candidates.select("host").distinct().join(robots_cache, "host", "left_anti")
            )
            # materialize only the NEW hosts' rules (O(new), usually
            # tiny after round 1) and union them in lazily: the old
            # shape re-checkpointed the WHOLE cache every round — an
            # O(known-hosts) copy per round that dominated the
            # robots-on overhead. The union chain stays shallow
            # (one checkpointed piece per round) and snapshots flatten
            # it when checkpointing is on.
            # lazy checkpoint: the count right below materializes it
            fetched_rules = new_hosts.mapInPandas(
                _robots_batches, schema="host string, disallow string, crawl_delay_level int"
            ).localCheckpoint(eager=False)
            n_new_hosts = fetched_rules.count()
            if n_new_hosts:
                robots_cache = robots_cache.unionByName(fetched_rules)
                n_robots_hosts += n_new_hosts
                robots_chain_len += 1
                if robots_chain_len >= robots_flatten_every:
                    # bound the cache's lineage: the per-round shallow
                    # union (one checkpointed piece per round) keeps
                    # the steady-state cost O(new hosts), but with
                    # snapshots off a long crawl would deepen the plan
                    # linearly (r5 watch item). Folding the union into
                    # one lazy checkpoint every ``robots_flatten_every``
                    # rounds caps plan depth at O(K) for an amortized
                    # O(hosts/K) copy per round — the next robots join
                    # materializes it in the job it already runs.
                    robots_cache = robots_cache.localCheckpoint(eager=False)
                    robots_chain_len = 0
            # the cache only grows, so once it crosses the threshold
            # the hash join latches; the counter is incremental — no
            # per-round count() over the cache
            if not robots_large and n_robots_hosts > robots_broadcast_threshold:
                robots_large = True
            robots_side = robots_cache if robots_large else F.broadcast(robots_cache)
            path = F.regexp_replace(F.col("key"), "^[a-zA-Z]+://[^/]+", "")
            allowed = F.col("disallow").isNull() | ~path.startswith(F.col("disallow"))
            # the allowed/blocked classification RIDES the round's one
            # politeness materialization (step 5's budgeted checkpoint
            # + bcounts agg) instead of paying its own checkpoint and
            # count jobs per round — the robots-on overhead was
            # dominated by those extra driver jobs, not by the join
            candidates = (
                candidates.join(robots_side, "host", "left")
                .withColumn("allowed", allowed)
                .drop("disallow")
            )
        if n_pending:
            # the backlog rejoins here, past the admission stages it
            # already cleared (allowed by construction; its immutable
            # crawl_delay_level rode along when it was deferred)
            candidates = candidates.unionByName(
                pending.withColumn("allowed", F.lit(True)) if use_robots else pending
            )

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
                n_par,
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
        if debt_boost:
            # politeness-debt boost: hosts whose queue overflowed LAST
            # round get base + min(debt, base) this round (bounded 2x).
            # The debt table only holds overflowed hosts — tiny in the
            # common case (broadcast), hash join on `host` above the
            # threshold where its exchange feeds the politeness window
            # n_debt_hosts came out of LAST round's politeness agg —
            # no extra count() job (resume conservatively broadcasts:
            # the table holds only overflowed hosts)
            if n_debt_hosts > robots_broadcast_threshold:
                debt_side = debt_df
            else:
                debt_side = F.broadcast(debt_df)
            prioritized = prioritized.join(debt_side, "host", "left")
        # blocked rows (allowed=false) ride the same exchange but rank
        # in their own window partition, so they never consume budget
        w_host = (
            Window.partitionBy("host", "allowed") if use_robots else Window.partitionBy("host")
        ).orderBy("depth", "host_rank", "disc_seq")
        budgeted = prioritized.withColumn("host_pos", F.row_number().over(w_host))
        if use_robots:
            # token-bucket crawl delay: the robots crawl-delay level
            # scales each host's per-round refill
            budget_col = F.greatest(
                F.lit(1), F.floor(F.lit(host_budget) / (F.col("crawl_delay_level") + 1))
            )
        else:
            budget_col = F.lit(host_budget)
        if debt_boost:
            budget_col = budget_col + F.least(
                F.coalesce(F.col("debt"), F.lit(0)), budget_col
            )
        budgeted = budgeted.withColumn("token_budget", budget_col)
        # lazy: the bcounts agg right below materializes (and persists)
        # it in the same job; fetch_now/deferred then read the blocks
        budgeted = budgeted.localCheckpoint(eager=False)
        _t1 = _time.perf_counter()
        # ONE agg answers "is the frontier drained?", the deferred
        # count, the debt-host count AND (robots) the blocked count —
        # separate driver jobs otherwise
        allowed_col = F.col("allowed") if use_robots else F.lit(True)
        ok_rows = allowed_col
        bcounts = budgeted.agg(
            F.sum(ok_rows.cast("long")).alias("n"),
            F.sum(
                (ok_rows & (F.col("host_pos") <= F.col("token_budget"))).cast("long")
            ).alias("fetchable"),
            F.count_distinct(
                F.when(
                    ok_rows & (F.col("host_pos") > F.col("token_budget")), F.col("host")
                )
            ).alias("debt_hosts"),
            F.sum((~ok_rows).cast("long")).alias("blocked"),
        ).collect()[0]
        n_debt_hosts = int(bcounts["debt_hosts"] or 0)
        n_blocked = int(bcounts["blocked"] or 0)
        if use_robots and n_blocked:
            newly_blocked = budgeted.filter(~F.col("allowed")).select("key", "h64")
            blocked = blocked.unionByName(newly_blocked)
        if int(bcounts["n"] or 0) == 0:
            # zero-fetch round (every frontier row deduped away): no
            # metrics row, same as the oracle — the next iteration
            # either injects a recrawl or terminates at the top break
            expected_frontier = 0
            # debt_df deliberately NOT recomputed on this path: the
            # oracle updates debt only when candidates exist, and an
            # empty-round overwrite would clear a nonzero backlog
            continue
        if debt_boost:
            # next round's debt = this round's per-host overflow counts
            # (computed after the zero-candidate exit so the control
            # flow matches the oracle's `if not candidates: continue`)
            debt_df = (
                budgeted.filter(ok_rows & (F.col("host_pos") > F.col("token_budget")))
                .groupBy("host")
                .agg(F.count("*").alias("debt"))
                .localCheckpoint(eager=True)
            )
        n_deferred = int(bcounts["n"]) - int(bcounts["fetchable"] or 0)
        fetch_now = budgeted.filter(ok_rows & (F.col("host_pos") <= F.col("token_budget")))
        deferred = budgeted.filter(
            ok_rows & (F.col("host_pos") > F.col("token_budget"))
        ).select(*pend_cols)

        # 6. global fetch position (ordering contract). Above the same
        #    adaptive threshold as step 4, a distributed two-pass index
        #    over (depth, host_rank, disc_seq) — at budget×hosts rows
        #    per round a partitionless window would single-task the
        #    whole manifest. Below it the manifest is small by
        #    definition and the window is cheaper (same logical order
        #    either way; tests force both paths against the oracle).
        use_dist_index = expected_frontier >= range_partition_threshold
        manifest_cols = fetch_now.select("key", "host", "depth", "host_rank", "disc_seq")
        if use_dist_index:
            manifest_df = assign_global_index(
                manifest_cols,
                ["depth", "host_rank", "disc_seq"],
                out_col="pos",
                num_partitions=n_par,
            )
        else:
            w_global = Window.orderBy("depth", "host_rank", "disc_seq")
            manifest_df = manifest_cols.withColumn(
                "pos", (F.row_number().over(w_global) - 1).cast("long")
            )

        # 7. fetch (scripted double, retry/backoff inside the UDF) —
        #    repartition the manifest so the politeness-bounded fetch
        #    set spreads across every core, then materialize once
        fetch_fn = functools.partial(
            _fetch_batches,
            decode_payload=decode_payload,
            payload_images=payload_images,
            payload_scale=payload_scale,
            hold_ms=hold_ms,
            fetcher=fetcher,
            http_timeout=http_timeout,
            discover=discover,
            fanout=fanout,
            n_hosts=n_hosts,
        )
        # Fetch partitioning is ADAPTIVE to the round's manifest size.
        # Two opposing costs: the straggler tail of the stage is
        # O(task size) (hold+decode are per-row costs), so finer tasks
        # bound it tighter — but every mapInPandas task pays a fixed
        # Python-worker/Arrow round-trip (~10-20ms), so at small
        # manifests extra waves are pure scheduling overhead (a fixed
        # 8-waves-per-slot policy put ~1 row in each of 256 tasks at
        # toy rounds and cost the round-4 bench 16.3s → 24s; the
        # round-5 bisect pinned it to exactly that commit). Policy:
        # enough partitions that a task holds ~fetch_rows_per_task
        # rows, never fewer than one wave (all slots busy once there
        # is enough work), capped at 8 waves per slot — at 10^10-URL
        # rounds the cap binds and the behavior is the old fine-wave
        # insurance; at toy rounds the floor binds and tasks stay fat
        # enough to amortize their fixed cost.
        n_fetchable = int(bcounts["fetchable"] or 0)
        n_fetch_parts = min(
            n_par * 8, max(n_par, -(-n_fetchable // fetch_rows_per_task))
        )
        # Distribution WITHIN the stage: keyless ROUND-ROBIN, not hash
        # and (since r6) not range. Hash placement is binomial — at
        # ~100 rows/task the row count swings ±10% and the slowest
        # task sets the stage tail (~5s of the 32-core wall at 36k
        # URLs; the round-5 fix). Range-striping on pos fixed that but
        # paid a per-round SAMPLING JOB over the manifest
        # (repartitionByRange bounds come from a sample pass) — ~0.4s
        # of the 3-round bench. Round-robin gives the identical
        # equal-rows-per-task property (each parent partition deals
        # its rows cyclically, so every task holds total/n ±1) with no
        # sampling pass; the mandatory local sort-before-repartition
        # (SPARK-23207, retry determinism) is over the slim manifest
        # rows only. Per-row costs (attempts, decode) are uncorrelated
        # with placement, so task times still concentrate; fetch
        # results carry explicit pos, so placement never affects the
        # ordering contract (parity suites pin it byte-for-byte).
        fetched = (
            manifest_df.select("key", "host", "depth", "disc_seq", "pos")
            .repartition(n_fetch_parts)
            .mapInPandas(fetch_fn, schema=_FETCH_SCHEMA)
        )
        # lazy: the stats agg below is the first action over the
        # fetched rows — it materializes the checkpoint in the SAME
        # job it runs in (an eager checkpoint would be a whole extra
        # driver job per round; job latency is width-independent, so
        # saved jobs raise N-vs-4N efficiency directly)
        fetched = fetched.localCheckpoint(eager=False)
        if n_fetch_parts > n_par:
            # The fine wave partitioning exists for the fetch stage
            # only; the ~dozen downstream jobs that re-read the slim
            # checkpoint each round (children explode, seen update,
            # metrics agg, ...) would inherit all n_fetch_parts
            # partitions and pay a fixed per-task cost apiece — at 4N
            # width that overhead is WIDTH-INDEPENDENT (~same seconds
            # at 8 and 32 cores), which is exactly what caps scaling
            # efficiency. coalesce is narrow (no shuffle, no extra
            # stage): each downstream task just reads several
            # checkpoint blocks.
            fetched = fetched.coalesce(n_par)

        # 8. round metrics: this agg is the ACTION that materializes
        #    the lazy fetch checkpoint — fetch stage + counter fold run
        #    as one driver job, and n_children rides along so the
        #    window-path discovery below never pays its own count job
        stats = fetched.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("status") == "ok", 1).otherwise(0)).alias("ok"),
            F.sum("attempts").alias("attempts"),
            F.sum("delay_ms").alias("delay_ms"),
            F.sum(F.size("children")).alias("n_children"),
        ).collect()[0]
        n_fetched = int(stats["n"] or 0)
        n_ok = int(stats["ok"] or 0)
        _t2 = _time.perf_counter()

        # 9. link discovery from ok fetches; disc_seq continues the
        #    global counter in (parent_pos, child_idx) order — same
        #    distributed index assignment (fanout×fetched rows is the
        #    bigger of the two per-round orderings). Children — parsed
        #    from the fetched bodies or scripted, both already
        #    eligibility-filtered in document order — are emitted by
        #    the fetch UDF itself: one JVM-side posexplode, never a
        #    second Python pass over the round.
        ok = fetched.filter(F.col("status") == "ok")
        children = ok.select(
            "pos", "depth", F.posexplode("children").alias("child_idx", "url")
        ).select(
            F.col("pos").alias("parent_pos"),
            F.col("child_idx").cast("int").alias("child_idx"),
            "url",
            (F.col("depth") + 1).cast("int").alias("depth"),
        )
        if use_dist_index:
            discovered, n_discovered = assign_global_index(
                children,
                ["parent_pos", "child_idx"],
                out_col="disc_seq",
                start=disc_total,
                num_partitions=n_par,
                return_count=True,
            )
            discovered = discovered.select("url", "depth", "disc_seq")
        else:
            w_child = Window.orderBy("parent_pos", "child_idx")
            discovered = children.withColumn(
                "disc_seq",
                (F.row_number().over(w_child) - 1 + F.lit(disc_total)).cast("long"),
            ).select("url", "depth", "disc_seq")
            # the window path's discovery count comes from the stats
            # agg (sum of children sizes) — the exact posexplode row
            # count, no dedicated count job
            n_discovered = int(stats["n_children"] or 0)

        # 10. state updates — all distributed: the hybrid seen-set via
        #    a per-shard cogroup fold (one task per shard, work = blob
        #    + its adds); no per-row collect anywhere
        new_seen = ok.select(
            "key", "h64", "host", F.lit(round_idx).cast("int").alias("fetched_round")
        )
        new_failed = fetched.filter(F.col("status") != "ok").select("key", "h64")
        seen = seen.unionByName(new_seen)
        failed = failed.unionByName(new_failed)
        seen_adds = fetched.select("h64")
        if use_robots and n_blocked:
            seen_adds = seen_adds.unionByName(newly_blocked.select("h64"))
        seen_pending = (
            seen_adds
            if seen_pending is None
            else seen_pending.unionByName(seen_adds)
        )
        seen_total += n_fetched + n_blocked
        if seen_total >= probe_threshold or catalog is not None:
            # the next round WILL probe (or a snapshot must carry a
            # consistent filter): fold everything pending in ONE
            # cogroup pass and cut lineage. Below the threshold the
            # pending union just rides along — the probe gate at step
            # 3 shares this exact seen_total condition, so a probe can
            # never observe an unfolded filter
            # lazy: the next round's probe (or the snapshot write) is
            # the first consumer and materializes the fold then; an
            # eager job here would serialize every shard blob twice
            seenset_df = seenset_merge(
                seenset_df, seen_pending, seen_shards, seen_bloom_bits,
                seen_cuckoo_buckets,
            ).localCheckpoint(eager=False)
            seen_pending = None
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

        disc_total += n_discovered
        expected_frontier = n_deferred + n_discovered
        round_metrics = {
            "round": round_idx,
            "fetched": n_fetched,
            "ok": n_ok,
            "failed": n_fetched - n_ok,
            "attempts": int(stats["attempts"] or 0),
            "deferred": n_deferred,
            "blocked": n_blocked,
            "virtual_delay_ms": int(stats["delay_ms"] or 0),
            "recrawled": n_recrawled,
        }
        result.metrics.append(round_metrics)
        if verbose:
            print(
                f"round {round_idx}: pipeline={_t1 - _t0:.2f}s fetch={_t2 - _t1:.2f}s "
                f"post={_time.perf_counter() - _t2:.2f}s fetched={n_fetched}",
                flush=True,
            )

        # fresh rows next round = discoveries only; the deferred
        # backlog stays canonical in `pending`
        frontier = discovered
        pending = deferred
        n_pending = n_deferred

        # 11. checkpoint: snapshot cuts lineage AND makes the crawl
        #     resumable with per-partition manifest lineage; the hybrid
        #     seen-set rides along as ordinary binary rows (one per
        #     shard), so resume never rebuilds it. Without a catalog,
        #     `budgeted`/`fetched` are already materialized so the next
        #     round's lineage stays one round deep.
        if catalog is not None:
            tables = {
                # the snapshot keeps the original (url, depth,
                # disc_seq) frontier contract: backlog rows are
                # written uncanonical and re-canonicalize once on
                # reload — deterministic, so resume stays byte-exact
                "frontier": frontier.unionByName(
                    pending.select("url", "depth", "disc_seq")
                ),
                "seen": seen,
                "failed": failed,
                "order": order_acc,
                "seenset": seenset_df,
            }
            if use_robots:
                tables["robots"] = robots_cache
                tables["blocked"] = blocked
            if debt_boost:
                tables["debt"] = debt_df
            snap = catalog.write_snapshot(
                tables,
                metrics={
                    "rounds": result.metrics,
                    "disc_total": disc_total,
                    "recrawls_done": recrawls_done,
                    **round_metrics,
                },
                round_idx=round_idx,
            )
            result.snapshots.append(snap)
            frontier = catalog.load_table(spark, snap, "frontier")
            pending = empty_pending
            n_pending = 0
            seen = catalog.load_table(spark, snap, "seen")
            failed = catalog.load_table(spark, snap, "failed")
            order_acc = catalog.load_table(spark, snap, "order")
            seenset_df = catalog.load_table(spark, snap, "seenset")
            if use_robots:
                robots_cache = catalog.load_table(spark, snap, "robots")
                blocked = catalog.load_table(spark, snap, "blocked")
            if debt_boost:
                debt_df = catalog.load_table(spark, snap, "debt")

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


def plan_recrawl(
    seen: DataFrame, host_budget: int = 3, current_round: int | None = None
) -> DataFrame:
    """Recrawl manifest: given the seen table (key, host,
    fetched_round), pick each host's ``host_budget`` stalest pages for
    revisit — (key, host, fetched_round, age, rk) ordered oldest-first
    per host, ties by key (reference fetch order is deterministic;
    revisit order must be too).

    Shape at scale: one hash-partitioned per-host window whose rank
    filter Spark rewrites to a per-partition top-N (window group
    limit) — no host's full history is sorted beyond the budget, and
    there is no global sort anywhere. ``current_round`` defaults to
    max(fetched_round)+1 computed as a broadcast scalar."""
    from pyspark.sql import Window

    if current_round is None:
        now = seen.agg((F.max("fetched_round") + 1).alias("_now"))
        aged = seen.crossJoin(F.broadcast(now))
    else:
        aged = seen.withColumn("_now", F.lit(int(current_round)))
    w = Window.partitionBy("host").orderBy(F.col("fetched_round").asc(), F.col("key").asc())
    return (
        aged.withColumn("age", (F.col("_now") - F.col("fetched_round")).cast("long"))
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= host_budget)
        .select("key", "host", F.col("fetched_round").cast("long").alias("fetched_round"), "age", "rk")
    )
