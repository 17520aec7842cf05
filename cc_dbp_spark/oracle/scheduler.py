"""Single-threaded pure-Python reference crawl scheduler — the oracle.

This is the executable SPEC of one scheduling round. The Spark job in
``cc_dbp_spark.operators.frontier`` must reproduce, for every round:

* the exact set and ORDER of scheduled URLs (crawl ordering),
* the final URL-seen set (first occurrence wins),
* span-sequence equality on every emitted document.

Semantics mirror the reference's deterministic-batch design (test
pattern: differential fast-vs-naive oracle,
``nlp/src/test/.../parse/TestGazetteerMatcher.java:65-136``):

Round r:
  1. candidates = seeds (r=0) or outlinks of docs fetched in r-1
     (kind='link' spans -> media_ref, depth = src_depth + 1).
  2. canonicalize; aggregate per canonical URL: depth=min,
     link_count=#occurrences; merge into carried frontier
     (depth=min, link_count+=new).
  3. drop URLs already in the seen set (exact membership, the
     reference's Set.contains semantics, CreateTsvDataset.java:64).
  4. robots filter (RFC-9309 longest-match): the longest matching
     prefix among deny+allow decides, ties -> allow, no match ->
     allowed; dropped = permanent.
  5. politeness: credit[host] += round_budget_s;
     k = floor(credit/delay); schedule top-k per host ordered by
     (priority DESC, pseudoRandomFromString(url) ASC, url ASC);
     credit -= scheduled*delay.
  6. scheduled URLs enter the seen set (round_seen=r) whether or not
     the fetch finds a document; fetched docs' outlinks feed r+1.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from cc_dbp_spark.functions.parity import pseudo_random_from_string
from cc_dbp_spark.functions.priority import priority_score
from cc_dbp_spark.functions.urlnorm import canonicalize_py, host_py, pathq_py
from cc_dbp_spark.operators.robots import is_allowed as robots_allowed


@dataclass
class CrawlConfig:
    round_budget_s: float = 10.0
    default_crawl_delay_s: float = 1.0
    max_rounds: int = 10


@dataclass
class OracleState:
    frontier: dict = field(default_factory=dict)  # url -> {depth, link_count, round_added}
    seen: dict = field(default_factory=dict)  # url -> round_seen
    credit: dict = field(default_factory=dict)  # host -> float
    schedule_log: list = field(default_factory=list)  # (round, position, url)
    audit: list = field(default_factory=list)  # per (round, host) dicts
    emitted: list = field(default_factory=list)  # (round, url, spans)


def _allowed(url: str, rules: dict) -> bool:
    # match on path INCLUDING query, mirroring the engine's pathq_col
    host, path = host_py(url), pathq_py(url)
    rule = rules.get(host)
    if rule is None:
        return True
    return robots_allowed(path, rule["deny_prefixes"], rule["allow_prefixes"])


def run_oracle(
    seeds: list[str],
    docs_by_url: dict[str, list[dict]],
    robots: list[dict],
    cfg: CrawlConfig = CrawlConfig(),
) -> OracleState:
    """Run the full crawl; docs_by_url maps canonical URL -> spans list."""
    rules = {r["host"]: r for r in robots}
    st = OracleState()
    candidates: list[tuple[str, int]] = [(u, 0) for u in seeds]  # (raw_url, depth)

    for rnd in range(cfg.max_rounds):
        # 1-2. canonicalize + aggregate
        agg: dict[str, dict] = {}
        for raw, depth in candidates:
            u = canonicalize_py(raw)
            a = agg.setdefault(u, {"depth": depth, "link_count": 0})
            a["depth"] = min(a["depth"], depth)
            a["link_count"] += 1
        if rnd == 0:
            for a in agg.values():
                a["link_count"] = 0  # seeds carry no in-links

        for u, a in agg.items():
            if u in st.seen:
                continue
            f = st.frontier.get(u)
            if f is None:
                st.frontier[u] = {
                    "depth": a["depth"],
                    "link_count": a["link_count"],
                    "round_added": rnd,
                }
            else:
                f["depth"] = min(f["depth"], a["depth"])
                f["link_count"] += a["link_count"]

        if not st.frontier:
            break

        # 4. robots
        denied = [u for u in st.frontier if not _allowed(u, rules)]
        denied_by_host: dict[str, int] = {}
        for u in denied:
            denied_by_host[host_py(u)] = denied_by_host.get(host_py(u), 0) + 1
            del st.frontier[u]

        # 5. politeness + priority top-k per host
        by_host: dict[str, list[str]] = {}
        for u in st.frontier:
            by_host.setdefault(host_py(u), []).append(u)

        scheduled: list[str] = []
        hosts_sorted = sorted(set(by_host) | set(denied_by_host))
        for host in hosts_sorted:
            urls = by_host.get(host, [])
            delay = rules.get(host, {}).get("crawl_delay_s", cfg.default_crawl_delay_s)
            # a rules dict straight from parse_robots_body carries None
            # for missing/invalid Crawl-delay — substitute the default
            # exactly as Spark's _budget_cols null-coalesce does
            if delay is None or delay <= 0:
                delay = cfg.default_crawl_delay_s
            st.credit[host] = st.credit.get(host, 0.0) + cfg.round_budget_s
            k = int(math.floor(st.credit[host] / delay))
            if urls and k > 0:
                pr = priority_score(
                    [st.frontier[u]["depth"] for u in urls],
                    [st.frontier[u]["link_count"] for u in urls],
                )
                tie = pseudo_random_from_string(urls)
                order = sorted(
                    range(len(urls)), key=lambda i: (-pr[i], tie[i], urls[i])
                )
                take = [urls[i] for i in order[:k]]
            else:
                take = []
            st.credit[host] -= len(take) * delay
            scheduled.extend(take)
            st.audit.append(
                {
                    "round": rnd,
                    "host": host,
                    "candidates": len(urls),
                    "denied": denied_by_host.get(host, 0),
                    "scheduled": len(take),
                    "deferred": max(0, len(urls) - len(take)),
                }
            )

        # global deterministic order of the fetch batch:
        # host ASC already (hosts_sorted), within host by the top-k order.
        for pos, u in enumerate(scheduled):
            st.schedule_log.append((rnd, pos, u))

        # 6. fetch + seen + outlinks
        candidates = []
        for u in scheduled:
            st.seen[u] = rnd
            spans = docs_by_url.get(u)
            depth = st.frontier[u]["depth"]
            del st.frontier[u]
            if spans is not None:
                st.emitted.append((rnd, u, spans))
                for s in spans:
                    if s["kind"] == "link" and s["media_ref"]:
                        candidates.append((s["media_ref"], depth + 1))

        if not scheduled and not candidates:
            break
    return st
