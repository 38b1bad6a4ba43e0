"""Streaming crawl frontier (streaming/crawl.py): the self-feeding
availableNow drain loop must fetch EXACTLY the simulator's ok-set with
byte-identical extracted text, honor robots deny rules, per-host
crawl-delay budgets and the depth bound, and resume from its
checkpoint after an interrupted loop."""

import os

import pytest
from pyspark.sql import functions as F

from downloader_spark.crawl.simulator import simulate_crawl
from downloader_spark.plans.crawlconfig import CrawlConfig
from downloader_spark.sources.pagegen import generate_web_graph
from downloader_spark.streaming.crawl import streaming_crawl

MAX_DEPTH = 2

# generous budgets → politeness never rations, only robots DENIES;
# the reachable allowed set within max_depth is the spec
GENEROUS = CrawlConfig(
    wave_seconds=10**6, max_per_host_per_wave=10**6,
    max_urls_per_wave=10**9, max_depth=MAX_DEPTH,
)


def _read_results(spark, results_dir):
    return spark.read.option("recursiveFileLookup", "true").parquet(results_dir)


@pytest.fixture(scope="module")
def web(spark):
    pages_df = generate_web_graph(spark, n_hosts=6, pages_per_host=10, seed=7)
    rows = pages_df.collect()
    page_map = {r["url"]: (bytes(r["html"]), r["content_type"]) for r in rows}
    seeds = [f"http://site{h:04d}.example/p/0" for h in range(6)]
    return pages_df, page_map, seeds


@pytest.fixture(scope="module")
def sim_ok(web):
    _, page_map, seeds = web
    sim = simulate_crawl(page_map, seeds, GENEROUS, max_waves=MAX_DEPTH + 2)
    return {u: sim.texts[u] for u, st in sim.statuses.items() if st == "ok"}


@pytest.mark.parametrize("mode", ["bloom", "cuckoo"])
def test_streaming_crawl_matches_simulator(spark, tmp_path, web, sim_ok, mode):
    pages_df, _page_map, seeds = web
    stats = streaming_crawl(
        spark, str(tmp_path / f"sc_{mode}"), pages_df, seeds,
        max_depth=MAX_DEPTH, seen_filter=mode,
        max_links_per_page=CrawlConfig().max_links_per_page, cfg=GENEROUS,
    )
    got = {
        r["url"]: r["text"] for r in _read_results(spark, stats["results_dir"]).collect()
    }
    assert stats["n_fetched"] == len(got)  # no url fetched twice
    assert got == sim_ok, (
        f"streaming({mode}) fetched {len(got)} vs sim {len(sim_ok)}; "
        f"missing={sorted(set(sim_ok) - set(got))[:3]} "
        f"extra={sorted(set(got) - set(sim_ok))[:3]}"
    )
    # drains ≈ depth levels + the final empty drain
    assert 2 <= stats["drains"] <= MAX_DEPTH + 2


def test_streaming_crawl_resumes_from_checkpoint(spark, tmp_path, web, sim_ok):
    """Interrupt the loop after ONE drain (only the seeds fetched);
    re-invoking on the same work_dir must resume from the checkpoint —
    already-fetched urls are NOT re-emitted (exactly-once carries over)
    and the final fetched set still equals the simulator's."""
    pages_df, _page_map, seeds = web
    wd = str(tmp_path / "sc_resume")
    first = streaming_crawl(
        spark, wd, pages_df, seeds, max_depth=MAX_DEPTH, max_drains=1,
        max_links_per_page=CrawlConfig().max_links_per_page, cfg=GENEROUS,
    )
    assert 0 < first["n_fetched"] < len(sim_ok)  # interrupted mid-crawl
    second = streaming_crawl(
        spark, wd, pages_df, seeds, max_depth=MAX_DEPTH,
        max_links_per_page=CrawlConfig().max_links_per_page, cfg=GENEROUS,
    )
    rows = _read_results(spark, second["results_dir"]).collect()
    got = {r["url"]: r["text"] for r in rows}
    assert len(rows) == len(got), "a url was fetched twice across the restart"
    assert got == sim_ok


def test_streaming_crawl_replayed_batch_is_idempotent(spark, tmp_path, web, sim_ok):
    """foreachBatch is at-least-once: simulate a crash AFTER a batch's
    writes landed but BEFORE the streaming checkpoint committed, by
    deleting the checkpoint's commit record for the last batch. The
    resumed loop replays that batch — the marker + per-batch overwrite
    must keep the results free of duplicates (ADVICE r4: the appends
    previously duplicated rows and double-counted n_fetched)."""
    pages_df, _page_map, seeds = web
    wd = str(tmp_path / "sc_replay")
    streaming_crawl(
        spark, wd, pages_df, seeds, max_depth=MAX_DEPTH, max_drains=1,
        max_links_per_page=CrawlConfig().max_links_per_page, cfg=GENEROUS,
    )
    commits = os.path.join(wd, "ckpt", "commits")
    last = max((f for f in os.listdir(commits) if f.isdigit()), key=int)
    os.remove(os.path.join(commits, last))  # checkpoint forgets batch N
    crc = os.path.join(commits, f".{last}.crc")  # ChecksumFs sidecar —
    if os.path.exists(crc):  # left behind, it blocks the re-commit rename
        os.remove(crc)
    second = streaming_crawl(
        spark, wd, pages_df, seeds, max_depth=MAX_DEPTH,
        max_links_per_page=CrawlConfig().max_links_per_page, cfg=GENEROUS,
    )
    rows = _read_results(spark, second["results_dir"]).collect()
    got = {r["url"]: r["text"] for r in rows}
    assert len(rows) == len(got), "replayed batch duplicated result rows"
    assert got == sim_ok


def test_streaming_crawl_enforces_host_budget(spark, tmp_path):
    """20 seeds on ONE Crawl-delay-5 host with wave_seconds=30: the
    per-host budget is exactly 6 urls per drain (the batch engine's
    throttle-parity case) — every fetching drain takes 6 except the
    final remainder, over-budget urls are requeued (never dropped), and
    the full set is eventually fetched in simulator-identical order."""
    n, host = 20, "slow.example"
    cfg = CrawlConfig(wave_seconds=30)  # delay 5 → budget 30//5 = 6
    rows = [
        (f"http://{host}/robots.txt", b"User-agent: *\nCrawl-delay: 5\n", "text/plain")
    ] + [
        (
            f"http://{host}/p/{i:03d}",
            f"<html><body><p>slow host page {i} body words</p></body></html>".encode(),
            "text/html",
        )
        for i in range(n)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary, content_type string")
    page_map = {r[0]: (r[1], r[2]) for r in rows}
    seeds = [f"http://{host}/p/{i:03d}" for i in range(n)]
    stats = streaming_crawl(
        spark, str(tmp_path / "thr"), pages, seeds, max_depth=0, cfg=cfg
    )
    sim = simulate_crawl(page_map, seeds, cfg, max_waves=10)
    sim_texts = {u: sim.texts[u] for u, st in sim.statuses.items() if st == "ok"}
    got = {
        r["url"]: r["text"] for r in _read_results(spark, stats["results_dir"]).collect()
    }
    assert got == sim_texts and len(got) == n
    # per-batch subdirectories expose the per-drain schedule
    per_drain = []
    for d in sorted(os.listdir(stats["results_dir"]), key=lambda s: int(s[1:])):
        c = spark.read.parquet(os.path.join(stats["results_dir"], d)).count()
        if c:
            per_drain.append(c)
    assert per_drain == [6, 6, 6, 2], per_drain


def test_streaming_crawl_validates_mode(spark, tmp_path, web):
    pages_df, _pm, seeds = web
    with pytest.raises(ValueError, match="seen_filter"):
        streaming_crawl(spark, str(tmp_path / "x"), pages_df, seeds,
                        seen_filter="blom")


def test_streaming_crawl_releases_checkpoint_blocks(spark, tmp_path, web):
    """Per-drain localCheckpoints must be freed (a long crawl runs many
    drains — the cache-accumulation class ADVICE r2/r3 flagged in
    other operators)."""
    pages_df, _pm, seeds = web

    def n_persistent() -> int:
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    before = n_persistent()
    streaming_crawl(spark, str(tmp_path / "sc_mem"), pages_df, seeds, max_depth=1)
    assert n_persistent() <= before


def test_streaming_crawl_url_filter_matches_simulator(spark, tmp_path, web):
    """The r6 pre-frontier URL gate in the DRAIN LOOP: with a blocklist
    naming a real generated host, the streaming fetch set must equal
    the simulator's gated ok-set — the seed on the blocked host is
    still fetched (seeds bypass the gate), its discovered same-host
    links are not."""
    pages_df, page_map, seeds = web
    cfg = CrawlConfig(
        wave_seconds=10**6, max_per_host_per_wave=10**6,
        max_urls_per_wave=10**9, max_depth=MAX_DEPTH,
        url_filter=True, url_blocklist=("site0002.example",),
        url_word_weights=(("/p/3", 5),), url_score_block=5,
    )
    sim = simulate_crawl(page_map, seeds, cfg, max_waves=MAX_DEPTH + 2)
    gated_ok = {u: sim.texts[u] for u, st in sim.statuses.items() if st == "ok"}
    ungated = simulate_crawl(page_map, seeds, GENEROUS, max_waves=MAX_DEPTH + 2)
    ungated_ok = {u for u, st in ungated.statuses.items() if st == "ok"}
    assert set(gated_ok) < ungated_ok, "gate must actually drop fetches"
    assert "http://site0002.example/p/0" in gated_ok  # the seed bypasses

    stats = streaming_crawl(
        spark, str(tmp_path / "sc_urlf"), pages_df, seeds,
        max_depth=MAX_DEPTH, cfg=cfg,
    )
    rows = _read_results(spark, stats["results_dir"]).collect()
    got = {r["url"]: r["text"] for r in rows}
    assert got == gated_ok
    for u in got:
        host = u.split("://", 1)[1].split("/", 1)[0]
        if host == "site0002.example":
            assert u == "http://site0002.example/p/0", u
        assert "/p/3" not in u or u in set(seeds), u
