"""SparkSession factory with the engine's scale-oriented defaults.

Tuned for the crawl workload (BASELINE.json): AQE on (runtime skew-join
splitting for hot hosts), runtime Bloom filters (accelerates the
frontier⟕pages join), Arrow batches sized for HTML payloads, and
shuffle partitions sized to the local core count — on a real cluster
these come from spark-submit conf instead.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "downloader-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # deterministic timestamp semantics regardless of host TZ (the
        # DuckDB oracle computes on naive wall-clock values)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # sort+limit compiles to TakeOrderedAndProject, which ALLOCATES
        # a top-K structure of size = the limit — an "effectively
        # uncapped" wave budget like max_urls_per_wave=10^9 kills the
        # JVM outright (reproduced). Above this threshold Spark falls
        # back to full sort + GlobalLimit, which is O(1) memory per
        # partition and the right plan for huge caps anyway.
        .config("spark.sql.execution.topKSortFallbackThreshold", "10000000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # HTML rows are large (~KBs); smaller Arrow batches keep the
        # Python-worker RSS bounded at 100 TB page sizes
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
        # 16g cap (not a reservation): the multi-GB bloom-probe bench
        # section OOMs an 8g heap in local mode where driver ≡ executors
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # JVM unified-logging warnings (gc,alloc under pressure) print
        # to STDOUT by default — they would corrupt the one-JSON-line
        # contract bench.py has with the driver; route them to stderr
        .config("spark.driver.extraJavaOptions", "-Xlog:all=warning:stderr:uptime")
        # saveAsTable target (bucketed pages corpus, sources/bucketed.py)
        # — keep managed-table files out of the repo working directory
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark-graft-warehouse"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
