#!/usr/bin/env python
"""One-off 10×-scale crawl evidence run (round-2 VERDICT #6).

Generates a ~1M-page web graph (10,000 hosts × ~100 pages Zipf) and
runs 5 waves with the default config (bloom_probe='auto'), recording
per-wave wall-clock and frontier throughput. Results are transcribed
into BASELINE.md ("10×-scale crawl evidence"); the per-round bench
carries the smaller always-run variant (bench._wave_scale_curve at
120k pages).

Usage: python scripts/evidence_crawl_10x.py [n_hosts] [pages_per_host]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _session, _wave_scale_curve  # noqa: E402


def main() -> None:
    n_hosts = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    pages_per_host = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _session(cpus)
    out = _wave_scale_curve(
        spark, n_hosts=n_hosts, pages_per_host=pages_per_host,
        seeds_per_host=4, waves=5,
    )
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
