"""Streaming crawl frontier — the wave engine's loop run through
Structured Streaming's stateful machinery (the T7 axis taken from
"windows + sessions + stateful seen" to a full self-feeding crawl).

Design: the frontier is a DIRECTORY of parquet files. Each *drain* is
one ``Trigger.AvailableNow`` pass over the files appended since the
last checkpoint:

    readStream(frontier_dir)
      → stateful seen filter (Bloom bitmap or cuckoo table per bucket,
        in the state store — streaming/stateful.py; extra columns like
        depth ride through)
      → foreachBatch:
          canonicalize → robots allow gate (same politeness dim +
          predicate as the batch engine) → static pages join → ONE
          Arrow extract pass → results appended, discovered links
          (depth+1, bounded) written BACK into frontier_dir

The files foreachBatch writes during drain N are exactly what drain
N+1 picks up — the self-feeding loop a crawl is — and the loop
terminates when a drain schedules nothing new. Both the processed-file
log and the seen state live in the checkpoint, so a killed loop
resumes exactly where it stopped (same exactly-once contract the
seen-filter restart tests pin).

Scale notes: the frontier stream carries only (url, depth) rows; the
100 TB pages corpus is on the STATIC side of a stream-static join
(never shuffled by the stream); the seen state is one bitmap/table row
per bucket — bounded, not per-URL; and each drain is one incremental
micro-batch, so cost is O(new frontier), the same invariant the batch
wave engine holds. The batch engine remains the production path (exact
wave semantics, overlapped commit chains, resume-from-snapshot);
this demonstrates the same crawl expressed through checkpointed
streaming state, and its fetched set + texts are pinned against the
simulator in tests/test_streaming_crawl.py.

No reference counterpart (the reference crawls per-request in asyncio,
batch.py:274-355 is its closest batch notion); the streaming shape is
the public Structured Streaming file-source + foreachBatch pattern.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize_udf, make_crawl_extract_udf
from ..plans.crawlconfig import CrawlConfig
from ..plans.politeness import build_robots_dim, with_politeness

FRONTIER_SCHEMA = "url string, depth int"


def streaming_crawl(
    spark: SparkSession,
    work_dir: str,
    pages: DataFrame,
    seeds: list[str],
    max_depth: int = 2,
    seen_filter: str = "bloom",
    num_buckets: int = 8,
    bits_per_bucket: int = 1 << 17,
    table_rows: int = 1 << 12,
    max_links_per_page: int = 20,
    max_drains: int = 64,
) -> dict:
    """Run the self-feeding drain loop to frontier exhaustion; returns
    ``{"drains": n, "n_fetched": n, "results_dir": path}``. Results are
    appended parquet rows (url, depth, text, n_links)."""
    if seen_filter not in ("bloom", "cuckoo"):
        raise ValueError(f"seen_filter must be 'bloom' or 'cuckoo', got {seen_filter!r}")
    from .stateful import streaming_seen_filter, streaming_seen_filter_cuckoo

    frontier_dir = os.path.join(work_dir, "frontier")
    results_dir = os.path.join(work_dir, "results")
    ckpt_dir = os.path.join(work_dir, "ckpt")
    os.makedirs(frontier_dir, exist_ok=True)

    cfg = CrawlConfig()  # only the politeness dim/broadcast flags are used
    robots = build_robots_dim(pages).cache()
    robots.count()
    pages_side = pages.select(
        "url", "html", F.col("content_type").alias("_ct")
    ).cache()
    extract = make_crawl_extract_udf(max_links_per_page)

    # seed file: canonicalize driver-side via one tiny job (depth 0)
    seeds_df = (
        spark.createDataFrame([(s,) for s in seeds], "raw string")
        .select(canonicalize_udf("raw").alias("c"))
        .filter("c.valid")
        .select(F.col("c.url_canonical").alias("url"), F.lit(0).alias("depth"))
        .distinct()
    )
    seeds_df.write.mode("append").parquet(frontier_dir)

    stats = {"drains": 0, "n_fetched": 0}
    drain_fetch = {"n": 0}

    def handle(batch_df: DataFrame, _bid: int) -> None:
        from ..operators.dedup import _ckpt_tracked, _drop_ckpt

        fresh = batch_df.filter("first_seen").select("url", "depth")
        canon = fresh.select(
            "url", "depth", canonicalize_udf("url").alias("c")
        ).select("url", "depth", F.col("c.host").alias("host"))
        pol = with_politeness(canon, robots, cfg)
        allowed = pol.filter("allowed").select("url", "depth")
        fetched = allowed.join(pages_side, "url").withColumn(
            "ex", extract("url", "html", "_ct")
        )
        # ONE extract pass feeds both writes; TRACKED checkpoint so the
        # blocks are freed after the writes — a long crawl runs many
        # drains, and untracked localCheckpoints would accumulate
        # executor storage for the loop's lifetime (DataFrame.unpersist
        # is a no-op on checkpointed frames)
        out, ckpt_ids = _ckpt_tracked(
            fetched.select(
                "url", "depth",
                F.col("ex.text").alias("text"),
                F.size("ex.links").alias("n_links"),
                F.col("ex.links").alias("_links"),
            )
        )
        try:
            n = out.count()
            drain_fetch["n"] += n
            stats["n_fetched"] += n
            out.drop("_links").write.mode("append").parquet(results_dir)
            if max_depth > 0:
                discovered = (
                    out.filter(F.col("depth") < max_depth)
                    .select(F.explode("_links").alias("raw"), (F.col("depth") + 1).alias("depth"))
                    .select(canonicalize_udf("raw").alias("c"), "depth")
                    .filter("c.valid")
                    .groupBy(F.col("c.url_canonical").alias("url"))
                    .agg(F.min("depth").alias("depth"))
                )
                # the seen filter dedups against history; write even known
                # urls — they cost one probe each next drain
                discovered.write.mode("append").parquet(frontier_dir)
        finally:
            _drop_ckpt(out, ckpt_ids)

    for _ in range(max_drains):
        stream = spark.readStream.schema(FRONTIER_SCHEMA).parquet(frontier_dir)
        if seen_filter == "bloom":
            filtered = streaming_seen_filter(
                stream, num_buckets=num_buckets, bits_per_bucket=bits_per_bucket
            )
        else:
            filtered = streaming_seen_filter_cuckoo(
                stream, num_buckets=num_buckets, table_rows=table_rows
            )
        drain_fetch["n"] = 0
        q = (
            filtered.writeStream.foreachBatch(handle)
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        stats["drains"] += 1
        if drain_fetch["n"] == 0:
            break
    robots.unpersist()
    pages_side.unpersist()
    stats["results_dir"] = results_dir
    return stats
