#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also measures the crawl-pipeline throughput metric from BASELINE.json
(pages fetched-and-converted/sec) and, with --scaling, the two-cluster
stand-in: the same extract job at local[8] vs local[32] with scaling
efficiency (driver instruction; BASELINE.md "Rebuild targets").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "lang_profile",
    "token_counts",
    "quality_score",
    "dedup_exact",
    "batch_summary",
    "exec_history_page",
    "priority_topk",
    "response_histogram",
    "health_score",
    "accept_dispatch",
    "url_validate",
    "seen_antijoin",
    "fetch_join",
    "wave_metrics",
    "extract_lang_profile",
]


def _run_queries(spark, names, sf_dir):
    from downloader_spark.queries import Q

    times = {}
    for name in names:
        t0 = time.monotonic()
        df = Q[name](spark, sf_dir)
        n = df.count()  # force full execution
        times[name] = round(time.monotonic() - t0, 4)
        assert n >= 0
    return times


def _extract_throughput(spark, sf_dir):
    """Pages fetched-and-converted/sec over the documents-derived pages
    table (the BASELINE.json primary metric at sandbox scale)."""
    from pyspark.sql import functions as F

    from downloader_spark.functions.udfs import extract_udf
    from downloader_spark.sources.pagegen import pages_from_documents

    pages = pages_from_documents(spark, sf_dir).cache()
    n_pages = pages.count()  # materialize generation outside the timed window
    t0 = time.monotonic()
    out = (
        pages.withColumn("ex", extract_udf("url", "html", F.lit("text/html")))
        .agg(F.sum(F.length(F.col("ex.text"))).alias("chars"))
        .collect()
    )
    dt = time.monotonic() - t0
    pages.unpersist()
    return n_pages, dt, int(out[0]["chars"] or 0)


def _session(cores):
    from downloader_spark.session import get_spark

    return get_spark(app_name=f"bench-{cores}", cores=cores,
                     shuffle_partitions=max(cores, 8))


def main() -> None:
    scaling = "--scaling" in sys.argv

    spark = _session(CPUS)
    t_all0 = time.monotonic()
    qtimes = _run_queries(spark, HEADLINE, SF_DIR)
    total = round(time.monotonic() - t_all0, 4)
    n_pages, ex_dt, _chars = _extract_throughput(spark, SF_DIR)
    pages_per_sec = round(n_pages / ex_dt, 2) if ex_dt else 0.0

    result = {
        "metric": "headline query wall-clock + pages converted/sec",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "cpus": CPUS,
        "pages_converted_per_sec": pages_per_sec,
        "n_pages": n_pages,
    }

    if scaling:
        spark.stop()
        lo_cores, hi_cores = 8, 32
        rates = {}
        for cores in (lo_cores, hi_cores):
            s = _session(cores)
            n, dt, _ = _extract_throughput(s, SF_DIR)
            rates[cores] = n / dt if dt else 0.0
            s.stop()
        eff = (rates[hi_cores] / rates[lo_cores]) / (hi_cores / lo_cores)
        result["scaling"] = {
            f"local[{lo_cores}]_pages_per_sec": round(rates[lo_cores], 2),
            f"local[{hi_cores}]_pages_per_sec": round(rates[hi_cores], 2),
            "efficiency": round(eff, 4),
        }
    else:
        spark.stop()

    print(json.dumps(result))


if __name__ == "__main__":
    main()
