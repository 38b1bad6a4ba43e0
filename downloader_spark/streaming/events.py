"""Streaming operators over an unbounded events/pages feed.

The reference's only unbounded source is the cron trigger
(scheduler/service.py:96-101); the rebuild's streaming surface covers
the standard crawl-telemetry needs: watermarked windowed aggregation
and stateful per-key sessionization. Batch-equivalent semantics are
tested with ``Trigger.AvailableNow`` over file sources
(tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_events_stream(spark, path: str, schema) -> DataFrame:
    """File-based streaming source (parquet dir); at production scale
    this is the Kafka/queue topic of fetch results."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling/sliding window counts + value stats per event_type with
    late-data handling via watermark (T7 rebuild)."""
    win = (
        F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    )
    # watermarks require TIMESTAMP (file sources may yield TIMESTAMP_NTZ)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sessionize(
    stream: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Session windows per user (native session_window — state handled
    by Spark's streaming state store)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, gap)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_available_now(stream_df: DataFrame, checkpoint: str, mode: str = "complete"):
    """Drain everything currently available (the wave-coalescing trigger
    — reference misfire coalesce=True analog, config.py:325-341) into an
    in-memory table; returns the query after awaiting termination."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName("stream_out")
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
