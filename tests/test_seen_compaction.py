"""Seen-table compaction: the append-only union must stay semantically
identical through a compaction cycle, and the crawl must keep working."""

from pyspark.sql import functions as F

from downloader_spark.plans.crawlconfig import CrawlConfig
from downloader_spark.plans.wave import CrawlEngine
from downloader_spark.sources.pagegen import generate_web_graph


def test_compaction_preserves_seen_and_crawl(spark, tmp_path):
    cfg = CrawlConfig(
        wave_seconds=10,
        max_per_host_per_wave=3,
        max_depth=2,
        seen_compact_every=2,  # force compaction nearly every wave
        bloom_min_seen=1,
    )
    pages = generate_web_graph(spark, n_hosts=5, pages_per_host=8, seed=3)
    eng = CrawlEngine(spark, str(tmp_path / "wh"), pages, cfg)
    seeds = [f"http://site{h:04d}.example/p/0" for h in range(5)]
    eng.init(seeds)

    seen_progression = []
    for w in range(1, 5):
        m = eng.run_wave(w)
        urls = {r["url"] for r in eng.read_seen().collect()}
        # metadata total must equal the actual distinct union
        assert len(urls) == m.n_seen_out
        # monotone growth, no losses through compaction
        if seen_progression:
            assert seen_progression[-1] <= urls
        seen_progression.append(urls)

    # compaction actually happened (snapshot history was collapsed)
    assert len(eng.wh.snapshots("seen")) <= 3
    # a crawled url is never re-scheduled after compaction
    res = eng.all_results().filter(F.col("rank").isNotNull())
    per_url = res.groupBy("url").count().filter("count > 1")
    rescheduled = per_url.join(
        res.filter("status = 'ok'").select("url").distinct(), "url", "inner"
    )
    assert rescheduled.count() == 0
