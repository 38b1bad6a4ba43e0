"""Bucketed pages corpus: co-located fetch joins.

At 100 TB the pages table is the giant side of every wave's fetch join
(plans/wave.py). Writing it ONCE bucketed by ``url`` lets every
subsequent join read bucket-aligned files and skip the pages-side
shuffle entirely — Spark shuffles only the (small) frontier side to
match the bucket count. This is the standard warehouse deployment shape
(the reference has no analog: it re-fetches over HTTP; here the corpus
is a table, so co-location is a one-time write decision).

Plan contract (tests/test_plan_shapes.py): joining a bucketed pages
table on ``url`` produces NO Exchange above the pages scan — only the
frontier side shuffles.

Requires a session catalog (in-memory is fine) and
``spark.sql.sources.v1BucketingEnabled`` semantics (on by default);
``spark.sql.warehouse.dir`` decides where bucket files land.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_pages(
    pages: DataFrame,
    table: str = "pages_bucketed",
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """One-time (or per-snapshot-compaction) bucketed write. ``buckets``
    should match the expected fetch-join parallelism at the deployment's
    scale — at 100 TB think thousands, sized so a bucket's pages fit an
    executor's scan budget."""
    (
        pages.write.mode(mode)
        .bucketBy(buckets, "url")
        .sortBy("url")
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed_pages(spark: SparkSession, table: str = "pages_bucketed") -> DataFrame:
    """Catalog read — carries the bucketing spec the join planner needs
    (a plain ``spark.read.parquet`` of the same files would NOT: bucket
    metadata lives in the catalog, not the footers)."""
    return spark.table(table)
