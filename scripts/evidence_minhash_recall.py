"""Multi-row-band MinHash recall evidence at sf0.1 (VERDICT r3 #7).

The driver-oracled minhash query runs the recall-SATURATED config
(single-row bands: miss prob (1-J)^num_hashes, effectively exact —
CLAUDE.md invariant 5). The config a 100 TB run would use trades that
recall for far smaller buckets: multi-row bands (r = num_hashes/bands),
candidate detection prob 1-(1-J^r)^bands. This script MEASURES that
trade on the sf0.1 corpus with near-dups seeded across a spread of
similarities, against the saturated config as ground truth:

  seeded copies: every 9th doc re-added with every p-th word dropped,
  p cycling {7, 9, 12, 15, 20, 30} by doc_id — shingle-level Jaccard
  lands ~0.35-0.85, straddling the 0.5 threshold from both sides.

Prints one JSON line: ground-truth pair count, found count, recall,
and wall-clock for both configs. Recorded in BASELINE.md §round-4.

Usage: python scripts/evidence_minhash_recall.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from downloader_spark.session import get_spark  # noqa: E402
from downloader_spark.operators.dedup import minhash_verified_pairs  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
DROP_PERIODS = [7, 9, 12, 15, 20, 30]


def seeded_corpus(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    words = F.split(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " ")
    period = F.element_at(
        F.array(*[F.lit(p) for p in DROP_PERIODS]),
        (F.col("doc_id") % len(DROP_PERIODS) + 1).cast("int"),
    )
    perturbed = F.concat_ws(
        " ", F.filter(words, lambda w, i: (i % period) != 0)
    )
    copies = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), perturbed.alias("text")
    )
    return docs.unionByName(copies)


def run(spark, corpus, num_hashes, bands):
    t0 = time.monotonic()
    pairs = minhash_verified_pairs(
        corpus, "doc_id", F.col("text"), num_hashes=num_hashes, bands=bands,
        shingle_k=3, threshold=0.5,
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    return got, round(time.monotonic() - t0, 2)


def main():
    spark = get_spark("minhash-recall-evidence")
    corpus = seeded_corpus(spark).persist()
    n_docs = corpus.count()
    truth, wall_exact = run(spark, corpus, num_hashes=64, bands=64)
    found, wall_scale = run(spark, corpus, num_hashes=64, bands=16)
    extra = found - truth  # both verify exact Jaccard → should be empty
    print(json.dumps({
        "sf": SF_DIR,
        "n_docs": n_docs,
        "config_truth": "64 hashes / 64 bands (single-row, saturated)",
        "config_scale": "64 hashes / 16 bands (r=4)",
        "n_truth_pairs": len(truth),
        "n_found": len(found & truth),
        "n_extra": len(extra),
        "recall": round(len(found & truth) / max(len(truth), 1), 4),
        "wall_truth_sec": wall_exact,
        "wall_scale_sec": wall_scale,
    }))
    corpus.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
