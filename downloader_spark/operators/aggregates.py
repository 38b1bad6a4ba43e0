"""Aggregation operators (SURVEY §2.6): batch summary, metrics
histogram, health score — all native partial+final hash aggregation
(map-side combine is free; no shuffling of raw rows beyond group keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference fixed histogram bucket bounds (metrics.py:47-53, 72-81)
HISTOGRAM_BUCKETS = [0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0]


def batch_summary(
    df: DataFrame, group_cols: list[str], success: Column
) -> DataFrame:
    """Reference batch summary (routes/batch.py:325-353): total,
    successful, failed, success_rate (0 when empty — groupBy groups are
    never empty so the 0-guard is structural)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("total_requests"),
        F.sum(success.cast("int")).cast("long").alias("successful"),
        F.sum((~success).cast("int")).cast("long").alias("failed"),
        F.round(F.avg(success.cast("double")) * 100.0, 4).alias("success_rate"),
    )


def cumulative_histogram(df: DataFrame, value: Column) -> DataFrame:
    """Prometheus-style cumulative bucket counts over a value column
    (reference metrics.py:72-81,114-117); single wide row — exact ints."""
    aggs = [
        F.sum((value <= F.lit(b)).cast("int")).cast("long").alias(f"le_{str(b).replace('.', '_')}")
        for b in HISTOGRAM_BUCKETS
    ]
    aggs.append(F.count(F.lit(1)).alias("le_inf"))
    return df.agg(*aggs)


def health_score(
    df: DataFrame, group_cols: list[str], is_error: Column, resp_time: Column
) -> DataFrame:
    """Reference health formula (metrics.py:247-293):
    100 − min(30, 2·max(0, err%−5)) − min(25, 10·max(0, avg_rt−1s));
    bands healthy ≥80 / degraded ≥60 / unhealthy."""
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.avg(is_error.cast("double")) * 100.0).alias("_err_pct"),
        F.avg(resp_time).alias("_avg_rt"),
    )
    err_penalty = F.least(F.lit(30.0), 2.0 * F.greatest(F.lit(0.0), F.col("_err_pct") - 5.0))
    rt_penalty = F.least(F.lit(25.0), 10.0 * F.greatest(F.lit(0.0), F.col("_avg_rt") - 1.0))
    scored = agg.withColumn("health", F.round(100.0 - err_penalty - rt_penalty, 4))
    return scored.select(
        *group_cols,
        "n",
        F.round("_err_pct", 4).alias("error_pct"),
        F.round("_avg_rt", 4).alias("avg_rt"),
        "health",
        F.when(F.col("health") >= 80, F.lit("healthy"))
        .when(F.col("health") >= 60, F.lit("degraded"))
        .otherwise(F.lit("unhealthy"))
        .alias("band"),
    )
