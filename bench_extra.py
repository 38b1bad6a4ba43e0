#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN for
driver measurement — this file carries the working numbers cited in
OPTIMIZATION_r*.md).

Usage:
  python bench_extra.py [--sf DIR] [--runs N] [--plans OUTDIR] q1 q2 ...

Per query: builds Q[name](spark, sf_dir) and times the same
count+xxhash64 aggregate bench.py uses (forces every output column),
best-of-N. With --plans, also writes <OUTDIR>/<name>.txt containing
df.explain("formatted") for the query.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--rerun-below", type=float, default=5.0)
    ap.add_argument("--plans", default=None, help="directory for explain('formatted') dumps")
    ap.add_argument("--plans-only", action="store_true", help="skip timing, just dump plans")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from downloader_spark.operators.dedup import release_result
    from downloader_spark.queries import Q
    from downloader_spark.session import get_spark

    spark = get_spark(
        app_name="bench-extra", cores=args.cpus,
        shuffle_partitions=max(args.cpus, 8),
    )

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in args.names:
            df = Q[name](spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            release_result(df)
        if args.plans_only:
            spark.stop()
            return

    def once(name: str) -> float:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        t0 = time.monotonic()
        df = Q[name](spark, args.sf)
        out = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("h"),
        ).collect()
        dt = time.monotonic() - t0
        assert out[0]["n"] >= 0
        release_result(df)
        spark.sparkContext.setJobDescription(None)
        return dt

    results = {}
    for name in args.names:
        best = once(name)
        samples = [best]
        for _ in range(args.runs - 1):
            if best >= args.rerun_below:
                break
            cur = once(name)
            samples.append(cur)
            best = min(best, cur)
        results[name] = (round(best, 4), [round(s, 4) for s in samples])
        print(f"{name}: best={best:.4f} samples={samples}", flush=True)

    print("TOTAL best:", round(sum(v[0] for v in results.values()), 4))
    spark.stop()


if __name__ == "__main__":
    main()
