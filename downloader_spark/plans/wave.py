"""Crawl-wave engine: frontier → politeness plan → fetch-join →
extract → discover → snapshot commits (SURVEY §3 "rebuild equivalent").

One wave ≙ one reference batch job (routes/batch.py:274-355): the
frontier is scheduled under per-host politeness budgets, "fetched" by
joining the pages table (S1 — the sandbox's deterministic stand-in for
the network), converted by the vectorized extract UDF (C1-C4), and the
discovered out-links are merged back into the frontier. Every wave
commits immutable snapshots (results, seen, frontier, metrics) — the
engine resumes mid-crawl from any snapshot (north rule).

Scale notes (the parts that matter at 10^10 URLs):
- priority selection is a per-host window rank, computed TWO-PHASE:
  a salted partial rank caps any single partition's rows at
  budget×salt_buckets for hot hosts, then the exact rank runs on the
  survivors (skew defense; SURVEY §4.1);
- the URL-seen check is Bloom-prefiltered: definitely-unseen rows skip
  the exact anti-join shuffle entirely (SURVEY §4.2);
- the pages join shuffles on url; Spark's runtime Bloom filter + AQE
  handle the rest (session defaults in session.py);
- statuses/retries are DATA (attempt column, T3), never task retries.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.udfs import canonicalize_udf, crawl_extract_udf
from ..sources.snapshots import SnapshotWarehouse
from .bloom import bloom_maybe_seen, build_bloom
from .crawlconfig import CrawlConfig
from .politeness import build_robots_dim, with_politeness

FRONTIER_SCHEMA = "url string, host string, depth int, score int, attempt int"
SEEN_SCHEMA = "url string"

_RESULT_COLS = [
    "wave",
    "url",
    "host",
    "depth",
    "rank",
    "status",
    "text",
    "markdown",
    "needs_render",
    "needs_js_render",
    "n_links",
]


@dataclass
class WaveMetrics:
    wave: int
    n_frontier_in: int
    n_unseen: int
    n_denied: int
    n_scheduled: int
    n_ok: int
    n_missing_retry: int
    n_failed: int
    n_discovered: int
    n_frontier_out: int
    n_seen_out: int


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        pages: DataFrame,
        cfg: CrawlConfig | None = None,
    ) -> None:
        self.spark = spark
        self.wh = SnapshotWarehouse(warehouse_dir)
        self.cfg = cfg or CrawlConfig()
        if "content_type" not in pages.columns:
            pages = pages.withColumn("content_type", F.lit("text/html"))
        self.pages = pages.select("url", "html", "content_type")

    # -- bootstrap -----------------------------------------------------------
    def init(self, seeds: list[str]) -> None:
        """Seed the frontier (wave 0 state). Invalid seeds are recorded
        as results rows with status 'invalid' (reference validate→400
        analog, download.py:137-148)."""
        cfg = self.cfg
        seed_df = self.spark.createDataFrame([(s,) for s in seeds], "url string")
        canon = seed_df.withColumn("c", canonicalize_udf("url")).select("url", "c.*")
        valid = (
            canon.filter("valid")
            .select(
                F.col("url_canonical").alias("url"),
                "host",
                F.lit(0).alias("depth"),
                F.lit(cfg.score_base).alias("score"),
                F.lit(0).alias("attempt"),
            )
            .dropDuplicates(["url"])
        )
        invalid = canon.filter("NOT valid").select(
            F.lit(0).alias("wave"),
            F.col("url"),
            F.lit("").alias("host"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("int").alias("rank"),
            F.lit("invalid").alias("status"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("markdown"),
            F.lit(False).alias("needs_render"),
            F.lit(False).alias("needs_js_render"),
            F.lit(0).alias("n_links"),
        )
        frontier = valid.repartition(
            self._n_shuffle(), F.pmod(F.xxhash64("host"), F.lit(cfg.num_host_buckets))
        )
        self.wh.commit(frontier, "frontier", wave=0)
        self.wh.commit(
            self.spark.createDataFrame([], SEEN_SCHEMA), "seen", wave=0
        )
        robots = build_robots_dim(self.pages)
        self.wh.commit(robots, "robots", wave=0)
        if invalid.isEmpty():
            return
        self.wh.commit(invalid, "results", wave=0, extra={"kind": "seed_invalid"})

    def _n_shuffle(self) -> int:
        return int(self.spark.conf.get("spark.sql.shuffle.partitions", "32"))

    @property
    def next_wave(self) -> int:
        """Resume point: one past the last committed metrics wave."""
        snaps = self.wh.snapshots("metrics")
        return (snaps[-1]["wave"] + 1) if snaps else 1

    # -- one wave --------------------------------------------------------------
    def run_wave(self, wave: int) -> WaveMetrics:
        cfg, spark, wh = self.cfg, self.spark, self.wh

        frontier = wh.read(spark, "frontier")
        n_frontier_in = wh.snapshots("frontier")[-1]["n_rows"]
        seen = wh.read(spark, "seen")
        n_seen_in = wh.snapshots("seen")[-1]["n_rows"]
        robots = wh.read(spark, "robots")

        # 1. URL-seen: Bloom prefilter, exact anti-join for the maybes
        if cfg.use_bloom and n_seen_in > 0:
            bloom = build_bloom(
                seen,
                num_buckets=cfg.bloom_num_buckets,
                bits_per_bucket=cfg.bloom_bits_per_bucket,
                num_hashes=cfg.bloom_num_hashes,
            )
            probed = bloom_maybe_seen(
                frontier,
                bloom,
                num_buckets=cfg.bloom_num_buckets,
                bits_per_bucket=cfg.bloom_bits_per_bucket,
                num_hashes=cfg.bloom_num_hashes,
            )
            definitely_new = probed.filter(~F.col("maybe_seen")).drop("maybe_seen")
            maybes = probed.filter("maybe_seen").drop("maybe_seen")
            unseen = definitely_new.unionByName(
                maybes.join(seen, "url", "left_anti")
            )
        else:
            unseen = frontier.join(seen, "url", "left_anti")
        unseen = unseen.persist()
        n_unseen = unseen.count()

        # 2. politeness: robots allow/deny + per-host budget
        pol = with_politeness(unseen, robots, cfg)
        denied = pol.filter(~F.col("allowed"))
        allowed = pol.filter("allowed")

        # 3. two-phase priority rank (salt caps hot-host partitions)
        order = [F.desc("score"), F.asc("depth"), F.asc("url")]
        salted = allowed.withColumn(
            "_salt", F.pmod(F.xxhash64("url"), F.lit(cfg.salt_buckets))
        )
        w1 = Window.partitionBy("host", "_salt").orderBy(*order)
        survivors = (
            salted.withColumn("_prank", F.row_number().over(w1))
            .filter(F.col("_prank") <= F.col("budget"))
            .drop("_salt", "_prank")
        )
        w2 = Window.partitionBy("host").orderBy(*order)
        ranked = survivors.withColumn("rank", F.row_number().over(w2))
        selected = ranked.filter(F.col("rank") <= F.col("budget")).drop("budget", "allowed")
        selected = selected.persist()

        # 4. fetch = join pages (S1 stand-in); extract via Arrow UDF
        fetched = selected.join(self.pages, "url", "left")
        extracted = fetched.withColumn(
            "ex", crawl_extract_udf("url", "html", "content_type")
        ).persist()

        ok = extracted.filter(F.col("html").isNotNull()).select(
            F.lit(wave).alias("wave"),
            "url",
            "host",
            "depth",
            "rank",
            F.lit("ok").alias("status"),
            F.col("ex.text").alias("text"),
            F.col("ex.markdown").alias("markdown"),
            F.col("ex.needs_render").alias("needs_render"),
            F.col("ex.needs_js_render").alias("needs_js_render"),
            F.size("ex.links").alias("n_links"),
            F.col("ex.links").alias("links"),
        )
        missing = extracted.filter(F.col("html").isNull()).select(
            "url", "host", "depth", "score", "rank", "attempt"
        )
        retry = missing.filter(F.col("attempt") + 1 < cfg.max_attempts)
        failed = missing.filter(F.col("attempt") + 1 >= cfg.max_attempts)

        def as_result(df: DataFrame, status: str) -> DataFrame:
            return df.select(
                F.lit(wave).alias("wave"),
                "url",
                "host",
                "depth",
                F.col("rank") if "rank" in df.columns else F.lit(None).cast("int").alias("rank"),
                F.lit(status).alias("status"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("markdown"),
                F.lit(False).alias("needs_render"),
                F.lit(False).alias("needs_js_render"),
                F.lit(0).alias("n_links"),
            )

        denied_res = as_result(denied.withColumn("rank", F.lit(None).cast("int")), "robots_denied")
        retry_res = as_result(retry, "missing_retry")
        failed_res = as_result(failed, "failed")
        results = ok.drop("links").unionByName(denied_res).unionByName(retry_res).unionByName(failed_res)

        res_snap = wh.commit(results, "results", wave=wave)
        status_counts = {
            r["status"]: r["n"]
            for r in wh.read(spark, "results", res_snap)
            .groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

        # 5. discover links → canonical, valid, depth-bounded; dedupe
        #    within the wave by url (min depth → max score, same rule as
        #    the simulator's in-wave merge)
        discovered = (
            ok.select("depth", F.explode("links").alias("raw_url"))
            .filter(F.col("depth") + 1 <= cfg.max_depth)
            .withColumn("c", canonicalize_udf("raw_url"))
            .filter("c.valid")
            .select(
                F.col("c.url_canonical").alias("url"),
                F.col("c.host").alias("host"),
                (F.col("depth") + 1).alias("depth"),
            )
            .groupBy("url")
            .agg(F.first("host").alias("host"), F.min("depth").alias("depth"))
            .withColumn(
                "score",
                F.greatest(
                    F.lit(0), F.lit(cfg.score_base) - F.lit(cfg.score_decay) * F.col("depth")
                ).cast("int"),
            )
            .withColumn("attempt", F.lit(0))
        )

        # 6. seen ∪= terminal outcomes (ok, denied, failed)
        terminal = (
            ok.select("url")
            .unionByName(denied.select("url"))
            .unionByName(failed.select("url"))
        )
        new_seen = seen.unionByName(terminal).dropDuplicates(["url"])
        seen_snap = wh.commit(new_seen, "seen", wave=wave)
        n_seen_out = wh.snapshots("seen")[-1]["n_rows"]

        # 7. next frontier = deferred ∪ retries ∪ (discovered − seen),
        #    deduped by url (min depth → max score; max attempt wins)
        deferred = unseen.join(selected.select("url"), "url", "left_anti").join(
            denied.select("url"), "url", "left_anti"
        ).select("url", "host", "depth", "score", "attempt")
        retry_front = retry.select(
            "url", "host", "depth", "score", (F.col("attempt") + 1).alias("attempt")
        )
        discovered_new = discovered.join(
            wh.read(spark, "seen", seen_snap), "url", "left_anti"
        ).persist()
        n_discovered = discovered_new.count()
        frontier_out = (
            deferred.unionByName(retry_front)
            .unionByName(discovered_new)
            .groupBy("url")
            .agg(
                F.first("host").alias("host"),
                F.min("depth").alias("depth"),
                F.max("score").alias("score"),
                F.max("attempt").alias("attempt"),
            )
            .repartition(
                self._n_shuffle(),
                F.pmod(F.xxhash64("host"), F.lit(cfg.num_host_buckets)),
            )
        )
        wh.commit(frontier_out, "frontier", wave=wave)
        n_frontier_out = wh.snapshots("frontier")[-1]["n_rows"]

        metrics = WaveMetrics(
            wave=wave,
            n_frontier_in=n_frontier_in,
            n_unseen=n_unseen,
            n_denied=status_counts.get("robots_denied", 0),
            n_scheduled=status_counts.get("ok", 0)
            + status_counts.get("missing_retry", 0)
            + status_counts.get("failed", 0),
            n_ok=status_counts.get("ok", 0),
            n_missing_retry=status_counts.get("missing_retry", 0),
            n_failed=status_counts.get("failed", 0),
            n_discovered=n_discovered,
            n_frontier_out=n_frontier_out,
            n_seen_out=n_seen_out,
        )
        mdf = spark.createDataFrame([vars(metrics)])
        wh.commit(mdf, "metrics", wave=wave)

        unseen.unpersist()
        selected.unpersist()
        extracted.unpersist()
        discovered_new.unpersist()
        return metrics

    # -- loop ----------------------------------------------------------------
    def run(self, max_waves: int = 10) -> list[WaveMetrics]:
        out = []
        wave = self.next_wave
        for w in range(wave, wave + max_waves):
            if self.wh.snapshots("frontier")[-1]["n_rows"] == 0:
                break
            out.append(self.run_wave(w))
        return out

    # -- reads ------------------------------------------------------------------
    def all_results(self) -> DataFrame:
        """Union of every results snapshot (the full crawl log)."""
        snaps = self.wh.snapshots("results")
        dfs = [self.wh.read(self.spark, "results", s["id"]) for s in snaps]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out
