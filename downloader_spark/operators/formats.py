"""Multi-format fan-out (SURVEY §2.3 C7, §2.1 S5/S6).

Reference: ``process_multiple_formats`` (content_processor.py:412-548)
converts ONE fetched page into N requested formats in parallel and
collects failures into an ``errors: {mime: message}`` map keyed by
``_format_to_mime_type`` (content_processor.py:32-49).

Spark design: a single scan computes the extract struct once, then the
formats are projected per row and exploded — no re-fetch, no re-parse
(the reference's one-fetch-N-tasks pattern becomes one-scan-N-rows).
Browser-bound formats (pdf — S5) are carried as typed error rows with
``error_type='unsupported_format'`` rather than dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# content_processor.py:32-49
FORMAT_TO_MIME = {
    "text": "text/plain",
    "markdown": "text/markdown",
    "html": "text/html",
    "json": "application/json",
    "raw": "application/octet-stream",
    "pdf": "application/pdf",
}

SUPPORTED = ("text", "markdown", "html", "json", "raw")


def _payload_for(fmt: str):
    """Payload column per format, given columns url/html/ex (extract
    struct). Mirrors the reference's per-format handlers
    (content_processor.py:187-409)."""
    if fmt == "text":
        return F.col("ex.text"), F.lit(None).cast("string")
    if fmt == "markdown":
        return F.col("ex.markdown"), F.lit(None).cast("string")
    if fmt == "html":
        # handle_html_response: decoded html (render decision is a flag)
        return F.decode("html", "UTF-8"), F.lit(None).cast("string")
    if fmt == "json":
        payload = F.to_json(
            F.struct(
                F.lit(True).alias("success"),
                F.col("url").alias("url"),
                F.length("html").alias("size"),
                F.base64("html").alias("content"),
            )
        )
        return payload, F.lit(None).cast("string")
    if fmt == "raw":
        return F.base64("html"), F.lit(None).cast("string")
    if fmt == "pdf":  # S5: browser-bound, not rebuilt
        return F.lit(None).cast("string"), F.lit("unsupported_format")
    return F.lit(None).cast("string"), F.lit("unknown_format")


def multi_format_results(
    extracted: DataFrame, formats_col: str = "formats"
) -> DataFrame:
    """Fan one extracted page row out into one row per requested format.

    ``extracted`` needs columns url, html (binary), ex (extract struct)
    and ``formats_col`` (array<string>). Order-preserving dedupe of the
    requested formats is the caller's concern (see P5 multi_accept)."""
    entries = []
    for fmt in FORMAT_TO_MIME:
        payload, err = _payload_for(fmt)
        entries.append(
            F.struct(
                F.lit(fmt).alias("format"),
                F.lit(FORMAT_TO_MIME[fmt]).alias("mime"),
                payload.alias("payload"),
                err.alias("error_type"),
            )
        )
    all_formats = F.array(*entries)
    requested = F.filter(
        all_formats, lambda e: F.array_contains(F.col(formats_col), e["format"])
    )
    return (
        extracted.withColumn("_fmt", F.explode(requested))
        .select(
            "url",
            F.col("_fmt.format").alias("format"),
            F.col("_fmt.mime").alias("mime"),
            F.col("_fmt.payload").alias("payload"),
            F.col("_fmt.error_type").alias("error_type"),
        )
    )


def format_error_map(fanout: DataFrame) -> DataFrame:
    """Per-url ``errors {mime: error_type}`` map — the reference's
    errors dict (content_processor.py:520-538)."""
    errs = fanout.filter(F.col("error_type").isNotNull())
    return errs.groupBy("url").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("mime", "error_type")))
        ).alias("errors")
    )
