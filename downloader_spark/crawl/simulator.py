"""Single-node reference-path crawl simulator.

The executable specification of the wave semantics in plans/wave.py,
written in plain Python over in-memory dicts. The north-rule parity
gate (BASELINE.json): given the same seed list + politeness budget, the
Spark engine must produce the IDENTICAL crawl ordering (wave, url,
rank), URL-seen set, per-url status, and byte-identical extracted text.
Tested in tests/test_crawl_parity.py.

Shares the exact row functions with the Spark path — extract_page,
canonicalize_url, parse_robots, is_path_allowed, cfg.budget_for_delay,
and (when cfg.pagerank_every > 0) pagerank_fixedpoint_py, the integer
fixed-point PageRank that matches the Spark operator bit-exact — so
any divergence is a WAVE-LOGIC bug, never a row-function one.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.urlnorm import canonicalize_url
from ..functions.urlquality import url_keep_py
from ..htmlx.convert import extract_page
from ..operators.graph import pagerank_fixedpoint_py
from ..plans.crawlconfig import CrawlConfig
from ..plans.politeness import is_path_allowed, parse_robots


@dataclass
class SimResult:
    schedule: list[tuple[int, str, int, str]] = field(default_factory=list)
    # (wave, host, rank, url) for every SELECTED url, in selection order
    statuses: dict[str, str] = field(default_factory=dict)  # url -> final status
    texts: dict[str, str] = field(default_factory=dict)  # url -> extracted text
    headers: dict[str, dict | None] = field(default_factory=dict)  # url -> custom_headers at fetch
    seen: set[str] = field(default_factory=set)
    wave_counts: list[dict] = field(default_factory=list)


def _path_of(url: str) -> str:
    rest = url.split("://", 1)[1]
    slash = rest.find("/")
    return rest[slash:] if slash >= 0 else "/"


def simulate_crawl(
    pages: dict[str, tuple[bytes, str]],
    seeds: list[str],
    cfg: CrawlConfig,
    max_waves: int = 10,
) -> SimResult:
    """pages: url -> (html_bytes, content_type)."""
    res = SimResult()
    url_gate = cfg.resolved_url_filter() if cfg.url_filter else None

    # robots dim (plans/politeness.build_robots_dim equivalent)
    robots: dict[str, tuple[int | None, list[str]]] = {}
    for url, (body, _ct) in pages.items():
        if url.endswith("/robots.txt"):
            host = url.split("://", 1)[1].split("/", 1)[0]
            robots[host] = parse_robots(body.decode("utf-8", errors="ignore"))

    # frontier: url -> [host, depth, score, attempt, custom_headers]
    frontier: dict[str, list] = {}
    for s in seeds:
        url_in, hdrs = (s, None) if isinstance(s, str) else (s[0], dict(s[1]) if s[1] else None)
        c = canonicalize_url(url_in)
        if not c.valid:
            res.statuses[url_in] = "invalid"
            continue
        if c.url not in frontier:
            frontier[c.url] = [c.host, 0, cfg.score_base, 0, hdrs]

    # rank-informed priority (cfg.pagerank_every): edges accumulate from
    # every fetched page's valid canonical links; ranks refresh on the
    # engine's schedule and stay deliberately stale between refreshes
    edges: set[tuple[str, str]] = set()
    pr: dict[str, int] = {}

    for wave in range(1, max_waves + 1):
        if not frontier:
            break
        if (
            cfg.pagerank_every
            and wave > 1
            and (wave - 1) % cfg.pagerank_every == 0
            and edges
        ):
            pr = pagerank_fixedpoint_py(edges, iters=cfg.pagerank_iters)
        counts = {
            "wave": wave,
            "n_frontier_in": len(frontier),
            "n_denied": 0,
            "n_ok": 0,
            "n_missing_retry": 0,
            "n_failed": 0,
            "n_too_large": 0,
            "n_discovered": 0,
        }

        unseen = {u: v for u, v in frontier.items() if u not in res.seen}
        counts["n_unseen"] = len(unseen)

        # politeness: deny disallowed paths (terminal), budget per host
        allowed: dict[str, list] = {}
        for url, row in unseen.items():
            host = row[0]
            delay, disallow = robots.get(host, (None, []))
            if not is_path_allowed(_path_of(url), disallow):
                res.statuses[url] = "robots_denied"
                res.seen.add(url)
                counts["n_denied"] += 1
            else:
                allowed[url] = row

        # per-host priority selection (score desc, depth asc, url asc)
        by_host: dict[str, list[str]] = {}
        for url, (host, _d, _s, _a, _h) in allowed.items():
            by_host.setdefault(host, []).append(url)

        def sel_key(u: str) -> tuple:
            base = (-allowed[u][2], allowed[u][1], u)  # score desc, depth, url
            return ((-pr.get(u, 0),) + base) if cfg.pagerank_every else base

        selected: list[tuple[str, int]] = []  # (url, rank)
        for host in by_host:
            delay, _ = robots.get(host, (None, []))
            budget = cfg.budget_for_delay(delay)
            cand = sorted(by_host[host], key=sel_key)
            for rank, url in enumerate(cand[:budget], start=1):
                selected.append((url, rank))
        if cfg.max_urls_per_wave is not None:
            selected.sort(key=lambda ur: sel_key(ur[0]))
            selected = selected[: cfg.max_urls_per_wave]
        for url, rank in selected:
            res.schedule.append((wave, allowed[url][0], rank, url))

        # fetch + extract + discover
        discovered: dict[str, list] = {}
        retries: dict[str, list] = {}
        for url, _rank in selected:
            host, depth, score, attempt, hdrs = allowed[url]
            res.headers[url] = hdrs
            page = pages.get(url)
            if page is None:
                if attempt + 1 >= cfg.max_attempts:
                    res.statuses[url] = "failed"
                    res.seen.add(url)
                    counts["n_failed"] += 1
                else:
                    retries[url] = [host, depth, score, attempt + 1, hdrs]
                    res.statuses[url] = "missing_retry"
                    counts["n_missing_retry"] += 1
                continue
            html, ctype = page
            if len(html) > cfg.max_content_bytes:
                res.statuses[url] = "too_large"
                res.seen.add(url)
                counts["n_too_large"] += 1
                continue
            ex = extract_page(
                html, ctype, url, with_links=True, link_cap=cfg.max_links_per_page
            )
            res.statuses[url] = "ok"
            res.texts[url] = ex.text
            res.seen.add(url)
            counts["n_ok"] += 1
            if cfg.pagerank_every:
                # mirror the engine's links table: EVERY valid canonical
                # link of a fetched page, regardless of the depth bound
                for link in ex.links:
                    c = canonicalize_url(link)
                    if c.valid:
                        edges.add((url, c.url))
            if depth + 1 <= cfg.max_depth:
                for link in ex.links:
                    c = canonicalize_url(link)
                    if not c.valid:
                        continue
                    # pre-frontier URL quality gate (engine mirror:
                    # plans/wave.py discovered filter — invariant 2).
                    # Applied AFTER the links-table edge capture above:
                    # rank flows through low-quality nodes, they just
                    # never enter the frontier.
                    if url_gate is not None and not url_keep_py(
                        c.url, c.host, *url_gate
                    ):
                        continue
                    d = depth + 1
                    s = cfg.score_for_depth(d)
                    prev = discovered.get(c.url)
                    if prev is None:
                        discovered[c.url] = [c.host, d, s, 0, None]
                    else:
                        # min depth → max score (same dedupe as the engine)
                        if d < prev[1]:
                            discovered[c.url] = [c.host, d, s, 0, None]

        # next frontier: deferred ∪ retries ∪ (discovered − seen)
        selected_urls = {u for u, _ in selected}
        next_frontier: dict[str, list] = {}
        for url, row in allowed.items():
            if url not in selected_urls:
                next_frontier[url] = row
        for url, row in retries.items():
            next_frontier[url] = row
        n_disc = 0
        for url, row in discovered.items():
            if url in res.seen:
                continue
            n_disc += 1
            prev = next_frontier.get(url)
            if prev is None:
                next_frontier[url] = row
            else:
                # groupBy url: first(host), min(depth), max(score),
                # max(attempt), first non-null custom_headers
                next_frontier[url] = [
                    prev[0],
                    min(prev[1], row[1]),
                    max(prev[2], row[2]),
                    max(prev[3], row[3]),
                    prev[4] if prev[4] is not None else row[4],
                ]
        counts["n_discovered"] = n_disc
        counts["n_frontier_out"] = len(next_frontier)
        counts["n_seen_out"] = len(res.seen)
        res.wave_counts.append(counts)
        frontier = next_frontier

    return res
