"""IVF nprobe→recall curve at sf0.1 (ANN scale-trade evidence).

The driver-oracled query runs nprobe == n_centroids (exhaustive ≡
brute force — the oracle config). This measures what partial probing
buys and costs: build ONE index over the sf0.1 embeddings, take every
20th vector as a query, and sweep nprobe, reporting top-k recall vs
the exact brute-force answer plus probe wall-clock. Recorded in
BASELINE.md §round-4.

Usage: python scripts/evidence_ivf_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from downloader_spark.session import get_spark  # noqa: E402
from downloader_spark.operators.similarity import (  # noqa: E402
    build_ivf_index,
    cosine_topk,
    ivf_probe,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
K = 10
N_CENTROIDS = 64


def pairs(df):
    return {(r["query_id"], r["cand_id"]) for r in df.collect()}


def main():
    spark = get_spark("ivf-recall-evidence")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).persist()
    n_q = queries.count()

    t0 = time.monotonic()
    exact = pairs(cosine_topk(emb, queries, k=K).select("query_id", "cand_id"))
    wall_exact = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    index = build_ivf_index(emb, n_centroids=N_CENTROIDS, iters=3)
    build_sec = round(time.monotonic() - t0, 2)

    curve = []
    for nprobe in (1, 2, 4, 8, 16, N_CENTROIDS):
        t0 = time.monotonic()
        got = pairs(
            ivf_probe(index, queries, k=K, nprobe=nprobe)
            .select("query_id", "cand_id")
        )
        wall = round(time.monotonic() - t0, 2)
        curve.append({
            "nprobe": nprobe,
            "recall": round(len(got & exact) / max(len(exact), 1), 4),
            "probe_sec": wall,
        })
    index.close()
    queries.unpersist()
    print(json.dumps({
        "sf": SF_DIR, "k": K, "n_centroids": N_CENTROIDS,
        "n_queries": n_q, "n_exact_pairs": len(exact),
        "wall_exact_bruteforce_sec": wall_exact,
        "build_sec": build_sec, "curve": curve,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
