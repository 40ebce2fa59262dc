"""Crawl-ordering equality: the Spark frontier must reproduce the
pure-Python oracle byte-for-byte — fetch sequence, seen-set, failed
set — under the same seeds and politeness budget (BASELINE.json
north_rule), and resume from a checkpoint to the identical state."""

import pytest

from mhtml_to_html_spark.frontier.fixtures import fetch_with_retries, seed_urls
from mhtml_to_html_spark.frontier.oracle import crawl_oracle

SEEDS = seed_urls(5, 3)
MAX_ROUNDS = 4
BUDGET = 6


@pytest.fixture(scope="module")
def oracle_result():
    return crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET)


def test_oracle_deterministic(oracle_result):
    again = crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET)
    assert again.order == oracle_result.order
    assert again.seen == oracle_result.seen
    assert again.failed == oracle_result.failed


def test_oracle_exactly_once(oracle_result):
    urls = [o["url"] for o in oracle_result.order]
    assert len(urls) == len(set(urls)), "a URL was fetched twice"


def test_oracle_retry_budget(oracle_result):
    assert all(o["attempts"] <= 3 for o in oracle_result.order)
    # transient outcomes exist in the mix
    assert any(o["attempts"] > 1 for o in oracle_result.order)
    assert any(o["status"] == "failed" for o in oracle_result.order)


def test_politeness_budget(oracle_result):
    from mhtml_to_html_spark.urlnorm import url_host

    per_round_host: dict = {}
    for o in oracle_result.order:
        key = (o["round"], url_host(o["url"]))
        per_round_host[key] = per_round_host.get(key, 0) + 1
    assert max(per_round_host.values()) <= BUDGET


def test_retry_after_cap_gives_up_immediately():
    # find a fixture URL scripted with Retry-After > 5000ms
    from mhtml_to_html_spark.frontier.fixtures import fetch_double

    url = next(
        f"https://capped{i}.example.com/x"
        for i in range(500)
        if fetch_double(f"https://capped{i}.example.com/x", 0).get("retry_after") == "99"
    )
    status, attempts, delay = fetch_with_retries(url)
    assert status == "failed" and attempts == 1 and delay == 0


@pytest.mark.spark
def test_spark_matches_oracle(spark, oracle_result, tmp_path):
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    res = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        checkpoint_dir=str(tmp_path / "ckpt"),
        collect_order=True,
    )
    assert res.order == oracle_result.order, "crawl ordering diverged from the oracle"
    assert res.seen == oracle_result.seen
    assert res.failed == oracle_result.failed
    assert [
        {k: m[k] for k in ("round", "fetched", "ok", "failed", "attempts", "deferred")}
        for m in res.metrics
    ] == [
        {k: m[k] for k in ("round", "fetched", "ok", "failed", "attempts", "deferred")}
        for m in oracle_result.metrics
    ]


@pytest.mark.spark
def test_spark_matches_oracle_with_range_partitioning(spark, oracle_result):
    """The salted repartitionByRange physical path (forced on) must not
    change the logical crawl order."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    res = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        range_partition_threshold=0,
        collect_order=True,
    )
    assert res.order == oracle_result.order
    assert res.seen == oracle_result.seen
    assert res.failed == oracle_result.failed


def test_oracle_robots_blocks_and_throttles():
    res = crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET, use_robots=True)
    plain = crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET)
    # robots world fetches no blocked URL and respects per-host budgets
    assert res.blocked.isdisjoint(res.seen | res.failed)
    assert res.order != plain.order or res.blocked == set()


@pytest.mark.spark
def test_spark_matches_oracle_with_robots(spark, tmp_path):
    """Robots gate + token-bucket crawl delay: Spark must match the
    oracle's ordering, seen/failed/blocked sets, and survive resume."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    oracle = crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET, use_robots=True)
    res = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        use_robots=True,
        checkpoint_dir=str(tmp_path / "robots_ckpt"),
        collect_order=True,
    )
    assert res.order == oracle.order
    assert res.seen == oracle.seen
    assert res.failed == oracle.failed
    assert res.blocked == oracle.blocked
    # resume mid-crawl reproduces the same world
    ckpt2 = str(tmp_path / "robots_resume")
    crawl_spark(
        spark, SEEDS, max_rounds=2, host_budget=BUDGET, use_robots=True,
        checkpoint_dir=ckpt2, collect_order=False,
    )
    resumed = crawl_spark(
        spark, SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET, use_robots=True,
        checkpoint_dir=ckpt2, resume=True, collect_order=True,
    )
    assert resumed.order == oracle.order
    assert resumed.blocked == oracle.blocked


@pytest.mark.spark
def test_spark_resume_from_checkpoint(spark, oracle_result, tmp_path):
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    ckpt = str(tmp_path / "resume_ckpt")
    # run only the first 2 rounds, then resume for the rest
    partial = crawl_spark(
        spark, SEEDS, max_rounds=2, host_budget=BUDGET, checkpoint_dir=ckpt, collect_order=False
    )
    assert partial.snapshots, "no snapshot written"
    resumed = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        checkpoint_dir=ckpt,
        resume=True,
        collect_order=True,
    )
    assert resumed.order == oracle_result.order, "resumed crawl diverged"
    assert resumed.seen == oracle_result.seen
    assert resumed.failed == oracle_result.failed


@pytest.mark.spark
def test_spark_matches_oracle_with_forced_probe_path(spark, oracle_result):
    """The sharded Bloom+cuckoo probe path (forced on at any size) must
    not change the crawl: exactly-once, ordering, seen/failed all
    byte-identical to the oracle."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    res = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        probe_threshold=0,
        collect_order=True,
    )
    assert res.order == oracle_result.order
    assert res.seen == oracle_result.seen
    assert res.failed == oracle_result.failed


@pytest.mark.spark
def test_saturated_filters_never_drop_urls(spark, oracle_result):
    """The false-positive-free contract: with absurdly undersized
    filters (every probe answers maybe-seen) the exact anti-join still
    keeps the crawl byte-identical — the filter is an accelerator,
    never the source of truth."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    res = crawl_spark(
        spark,
        SEEDS,
        max_rounds=MAX_ROUNDS,
        host_budget=BUDGET,
        probe_threshold=0,
        seen_shards=2,
        seen_bloom_bits=64,
        seen_cuckoo_buckets=8,
        collect_order=True,
    )
    assert res.order == oracle_result.order
    assert res.seen == oracle_result.seen
    assert res.failed == oracle_result.failed


@pytest.mark.spark
def test_plan_recrawl_budget_and_staleness(spark):
    """Recrawl planner: per-host budget respected, stalest first,
    deterministic tie-break, and the rank filter plans as a window
    group limit (per-partition top-N, no full per-host sort)."""
    from pyspark.sql import functions as F

    from mhtml_to_html_spark.frontier.spark_frontier import plan_recrawl
    from test_plans import plan_of

    rows = [
        (f"https://a.example.com/{i}", "a.example.com", i % 3) for i in range(9)
    ] + [("https://b.example.com/0", "b.example.com", 7)]
    seen = spark.createDataFrame(rows, "key string, host string, fetched_round long")
    got = plan_recrawl(seen, host_budget=2).collect()
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host["a.example.com"]) == 2
    assert len(by_host["b.example.com"]) == 1
    # stalest (round 0) first for host a, tie by key: /0 then /3
    a = sorted(by_host["a.example.com"], key=lambda r: r["rk"])
    assert [r["key"] for r in a] == ["https://a.example.com/0", "https://a.example.com/3"]
    assert a[0]["age"] == 8  # now = max(7)+1, fetched_round 0
    plan = plan_of(plan_recrawl(seen, host_budget=2))
    assert "WindowGroupLimit" in plan


@pytest.mark.spark
def test_robots_cache_flatten_preserves_parity(spark):
    """The periodic robots-cache lineage flatten (r6: bound the shallow
    union chain at ``robots_flatten_every`` pieces) must not change one
    byte of the crawl: force a flatten every round and compare against
    the oracle."""
    from mhtml_to_html_spark.frontier.spark_frontier import crawl_spark

    oracle = crawl_oracle(SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET, use_robots=True)
    res = crawl_spark(
        spark, SEEDS, max_rounds=MAX_ROUNDS, host_budget=BUDGET,
        use_robots=True, collect_order=True, robots_flatten_every=1,
    )
    assert res.order == oracle.order
    assert res.seen == oracle.seen
    assert res.blocked == oracle.blocked
