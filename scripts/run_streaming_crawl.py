#!/usr/bin/env python
"""Streaming-crawl driver for spark-submit deployment — the
Structured-Streaming counterpart of run_crawl.py (T7 demo path; the
batch wave engine remains the production crawl):

    zip -r downloader_spark.zip downloader_spark
    spark-submit --py-files downloader_spark.zip \
        scripts/run_streaming_crawl.py --work-dir /data/stream_crawl \
        --seeds seeds.txt --max-depth 2 --seen-filter cuckoo

Each drain is one availableNow pass; the loop terminates when a drain
schedules nothing new. Killing and re-running with the same --work-dir
resumes from the checkpoint (exactly-once; tested in
tests/test_streaming_crawl.py). Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--pages", default=None, help="parquet path of the pages table")
    ap.add_argument("--seeds", default=None, help="file with one url per line")
    ap.add_argument("--synthetic-hosts", type=int, default=100)
    ap.add_argument("--synthetic-pages-per-host", type=int, default=40)
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--max-drains", type=int, default=64)
    ap.add_argument("--seen-filter", choices=["bloom", "cuckoo"], default="bloom")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from downloader_spark.streaming.crawl import streaming_crawl

    spark = SparkSession.builder.appName("downloader-spark-streaming-crawl").getOrCreate()

    if args.pages:
        pages = spark.read.parquet(args.pages)
    else:
        from downloader_spark.sources.pagegen import generate_web_graph

        pages = generate_web_graph(
            spark, n_hosts=args.synthetic_hosts,
            pages_per_host=args.synthetic_pages_per_host,
        )
    if args.seeds:
        with open(args.seeds) as fh:
            seeds = [ln.strip() for ln in fh if ln.strip()]
    else:
        seeds = [
            f"http://site{h:04d}.example/p/0"
            for h in range(min(args.synthetic_hosts, 50))
        ]

    stats = streaming_crawl(
        spark, args.work_dir, pages, seeds,
        max_depth=args.max_depth, seen_filter=args.seen_filter,
        max_drains=args.max_drains,
    )
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
