"""robots.txt parsing + matching (RFC 9309 + the de-facto extensions).

The crawl's deterministic double (fixtures.robots_rules) stands in for
the NETWORK; this module is the production parser the cache rows come
from when a real robots.txt body exists: user-agent group selection
(longest product-token match, ``*`` fallback), allow/disallow with
longest-path-match precedence (allow wins ties, per RFC 9309 §2.2.2),
``$`` end anchors and ``*`` wildcards, and the de-facto
``Crawl-delay``. Pure Python (usable inside pandas UDFs); rules
compile once per robots body and are cached.

Reference parity note: the reference has no robots support at all —
this implements the north_rule's "per-host politeness scheduler with
…robots.txt caching" requirement; semantics follow RFC 9309 and the
Googlebot documentation, not any reference file.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from functools import lru_cache


@dataclass
class RobotsRules:
    """One user-agent group's rules, match-ready."""

    rules: list[tuple[bool, str]] = field(default_factory=list)  # (allow, pattern)
    crawl_delay: float | None = None

    def allows(self, path: str) -> bool:
        """Longest-match wins; allow wins length ties (RFC 9309
        §2.2.2); no match → allowed."""
        if not path.startswith("/"):
            path = "/" + path
        best_len = -1
        best_allow = True
        for allow, pattern in self.rules:
            m = _match_len(pattern, path)
            if m is None:
                continue
            plen = len(pattern)
            if plen > best_len or (plen == best_len and allow and not best_allow):
                best_len = plen
                best_allow = allow
        return best_allow


@lru_cache(maxsize=4096)
def _pattern_re(pattern: str) -> re.Pattern:
    # '*' matches any run (incl. empty); '$' anchors the end; anything
    # else is literal. An unanchored pattern is a prefix match.
    parts = []
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    for piece in body.split("*"):
        parts.append(re.escape(piece))
    regex = ".*".join(parts)
    return re.compile(regex + ("$" if anchored else ""))


def _match_len(pattern: str, path: str) -> int | None:
    if not pattern:
        return None
    return len(pattern) if _pattern_re(pattern).match(path) else None


def parse_robots_txt(body: str, user_agent: str = "mhtml-spark-crawler") -> RobotsRules:
    """Parse a robots.txt body and select the group for ``user_agent``
    (longest case-insensitive product-token match; ``*`` fallback).
    Malformed lines are skipped, comments stripped, BOM tolerated —
    robots files in the wild are messy and a parse failure must never
    block a crawl (fail-open is the universal crawler convention)."""
    ua = user_agent.lower()
    groups: dict[str, RobotsRules] = {}
    current_agents: list[str] = []
    seen_rule_since_agent = True
    for raw_line in body.replace("﻿", "").splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field_name, _, value = line.partition(":")
        field_name = field_name.strip().lower()
        value = value.strip()
        if field_name == "user-agent":
            if seen_rule_since_agent:
                current_agents = []
                seen_rule_since_agent = False
            agent = value.lower()
            current_agents.append(agent)
            groups.setdefault(agent, RobotsRules())
        elif field_name in ("allow", "disallow"):
            seen_rule_since_agent = True
            for agent in current_agents:
                if field_name == "disallow" and not value:
                    continue  # empty Disallow = allow all (no rule)
                groups[agent].rules.append((field_name == "allow", value))
        elif field_name == "crawl-delay":
            seen_rule_since_agent = True
            for agent in current_agents:
                try:
                    groups[agent].crawl_delay = float(value)
                except ValueError:
                    pass
    # group selection: longest product token contained in our UA
    best: tuple[int, RobotsRules] | None = None
    for agent, rules in groups.items():
        if agent == "*":
            continue
        if agent in ua and (best is None or len(agent) > best[0]):
            best = (len(agent), rules)
    if best is not None:
        return best[1]
    return groups.get("*", RobotsRules())
