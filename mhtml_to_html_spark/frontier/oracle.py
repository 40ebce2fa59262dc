"""Pure-Python crawl oracle — the byte-for-byte ordering contract.

Semantics transcribed from the reference scheduler
(/root/reference/lib/convert.js:129-228) and extended per the
north_rule:

- round fixpoint: discovered links minus (seen ∪ failed) form the next
  round (F1); termination when the frontier drains;
- exactly-once per canonical URL across all rounds (R6; seen-set keyed
  on canonicalize_url);
- within-round dedup keeps the FIRST discovery (addMissingResource,
  convert.js:810-814);
- fetch eligibility: http/https/urn only; urn payload unwrapped (U6);
- priority order within a round: (depth, host_rank, discovery_seq) —
  the north-rule salted priority queue's logical order;
- politeness: at most ``host_budget`` fetches per host per round;
  overflow is DEFERRED to the next round (token-bucket crawl delay in
  round units);
- retries: transient = 429/5xx/throw; exponential 500·2^n capped 5s;
  Retry-After honored, > cap ⇒ immediate give-up; max 2 retries (F4);
- failures enter a deny-list and are never re-attempted (F5);
- recrawl (optional, ``recrawl_budget > 0``): when the frontier drains
  with rounds left, each host's ``recrawl_budget`` stalest seen pages
  (oldest ``fetched_round`` first, ties by key) re-enter the frontier
  at depth 0 with fresh discovery sequence numbers assigned in
  (host asc, rank asc) order; the revisited keys are REMOVED from the
  seen set first (the counting-Bloom/cuckoo hybrid supports deletion —
  this is why the Bloom counts), so the normal exactly-once machinery
  re-admits exactly them. At most ``max_recrawls`` injections.

The Spark frontier must reproduce ``order`` (the fetch sequence),
``seen`` and ``failed`` exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..urlnorm import canonicalize_url, is_fetchable, unwrap_urn, url_host
from .fixtures import (
    children_of,
    fetch_with_retries,
    host_rank,
    host_token_budget,
    robots_allows,
)


@dataclass
class CrawlResult:
    order: list[dict] = field(default_factory=list)  # fetch sequence
    seen: set[str] = field(default_factory=set)
    failed: set[str] = field(default_factory=set)
    blocked: set[str] = field(default_factory=set)  # robots-disallowed
    metrics: list[dict] = field(default_factory=list)  # per round
    seen_rounds: dict = field(default_factory=dict)  # key -> round fetched ok


def crawl_oracle(
    seeds: list[str],
    max_rounds: int = 6,
    host_budget: int = 8,
    max_retries: int = 2,
    fanout: int = 3,
    n_hosts: int = 7,
    use_robots: bool = False,
    recrawl_budget: int = 0,
    max_recrawls: int = 1,
    debt_boost: bool = False,
) -> CrawlResult:
    result = CrawlResult()
    # politeness-debt boost (opt-in): a host whose queue overflowed the
    # budget last round (deferred > 0) gets budget + min(debt, budget)
    # this round — backlogs of hot hosts clear up to 2x faster, still
    # bounded, and the rule is a pure function of last round's counts
    debt: dict[str, int] = {}
    # frontier rows: (url, depth, disc_seq) — disc_seq is the global
    # discovery counter, the deterministic tiebreaker
    frontier: list[tuple[str, int, int]] = []
    disc = 0
    for url in seeds:
        if is_fetchable(url):
            frontier.append((unwrap_urn(url), 0, disc))
            disc += 1

    recrawls_done = 0
    for round_idx in range(max_rounds):
        n_recrawled = 0
        if not frontier and recrawl_budget > 0 and recrawls_done < max_recrawls:
            # revisit manifest: per host, the stalest seen pages
            # (fetched_round asc, key asc), rank <= budget; re-enqueued
            # at depth 0 with disc_seq assigned in (host, rank) order
            by_host: dict[str, list[str]] = {}
            for key in result.seen:
                by_host.setdefault(url_host(key) or "", []).append(key)
            revisits: list[str] = []
            for host in sorted(by_host):
                ranked = sorted(
                    by_host[host], key=lambda k: (result.seen_rounds[k], k)
                )[:recrawl_budget]
                revisits.extend(ranked)
            for key in revisits:
                result.seen.discard(key)
                del result.seen_rounds[key]
                frontier.append((key, 0, disc))
                disc += 1
            n_recrawled = len(revisits)
            recrawls_done += 1
        if not frontier:
            break
        # within-round first-discovery dedup on the canonical key,
        # skipping seen & failed
        candidates: list[tuple[str, str, int, int]] = []  # (key, url, depth, seq)
        in_round: set[str] = set()
        blocked_this_round = 0
        for url, depth, seq in frontier:
            key = canonicalize_url(url)
            if (
                key in result.seen
                or key in result.failed
                or key in result.blocked
                or key in in_round
            ):
                continue
            if use_robots and not robots_allows(url_host(key) or "", key):
                if key not in result.blocked:
                    result.blocked.add(key)
                    blocked_this_round += 1
                continue
            in_round.add(key)
            candidates.append((key, url, depth, seq))
        if not candidates:
            # every frontier row deduped away (all seen/failed/blocked):
            # a zero-fetch round — no metrics row; the next iteration
            # either injects a recrawl or terminates
            frontier = []
            continue
        # priority order: (depth, host_rank, discovery_seq)
        candidates.sort(key=lambda c: (c[2], host_rank(url_host(c[0]) or ""), c[3]))
        # politeness: first `host_budget` per host fetch this round
        per_host: dict[str, int] = {}
        fetch_now: list[tuple[str, str, int, int]] = []
        deferred: list[tuple[str, int, int]] = []
        new_debt: dict[str, int] = {}
        for key, url, depth, seq in candidates:
            host = url_host(key) or ""
            budget = host_token_budget(host, host_budget) if use_robots else host_budget
            if debt_boost:
                budget += min(debt.get(host, 0), budget)
            n = per_host.get(host, 0)
            if n < budget:
                per_host[host] = n + 1
                fetch_now.append((key, url, depth, seq))
            else:
                deferred.append((url, depth, seq))
                new_debt[host] = new_debt.get(host, 0) + 1
        debt = new_debt

        discovered: list[tuple[str, int, int]] = []
        n_ok = n_failed = n_attempts = total_delay = 0
        for pos, (key, url, depth, seq) in enumerate(fetch_now):
            status, attempts, delay_ms = fetch_with_retries(key, max_retries)
            n_attempts += attempts
            total_delay += delay_ms
            result.order.append(
                {
                    "round": round_idx,
                    "pos": pos,
                    "url": key,
                    "depth": depth,
                    "status": status,
                    "attempts": attempts,
                }
            )
            if status == "ok":
                result.seen.add(key)
                result.seen_rounds[key] = round_idx
                n_ok += 1
                for child in children_of(key, fanout, n_hosts):
                    if is_fetchable(child):
                        discovered.append((child, depth + 1, disc))
                        disc += 1
            else:
                result.failed.add(key)
                n_failed += 1
        result.metrics.append(
            {
                "round": round_idx,
                "fetched": len(fetch_now),
                "ok": n_ok,
                "failed": n_failed,
                "attempts": n_attempts,
                "deferred": len(deferred),
                "blocked": blocked_this_round,
                "virtual_delay_ms": total_delay,
                "recrawled": n_recrawled,
            }
        )
        frontier = deferred + discovered
    return result
