"""The engine's only two vectorized UDFs (SURVEY §2.10).

Everything else is native Spark SQL; these cross the JVM↔Python
boundary once per Arrow batch (input_hint: "no per-row Python").

- ``extract_udf(url, html, content_type) → struct(...)`` — the per-row
  crawl payload (reference content_converter.py:441-552 + D1/D2 flags).
- ``canonicalize_udf(url) → struct(...)`` — P1+P2 validation +
  canonical frontier key (reference validation.py:28-268).

Return types are built as explicit ``StructType`` (not DDL strings) so
the module imports without an active SparkSession.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from ..htmlx.convert import extract_page
from .urlnorm import canonicalize_url, validate_url

EXTRACT_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("markdown", StringType()),
        StructField("body_text_len", IntegerType()),
        StructField("has_content_container", BooleanType()),
        StructField("is_error_page", BooleanType()),
        StructField("needs_render", BooleanType()),
        StructField("needs_js_render", BooleanType()),
    ]
)

CRAWL_EXTRACT_SCHEMA = StructType(
    EXTRACT_SCHEMA.fields + [StructField("links", ArrayType(StringType()))]
)

CANON_SCHEMA = StructType(
    [
        StructField("url_canonical", StringType()),
        StructField("host", StringType()),
        StructField("valid", BooleanType()),
        StructField("reason", StringType()),
    ]
)

_EXTRACT_COLS = [f.name for f in EXTRACT_SCHEMA.fields]
_CANON_COLS = [f.name for f in CANON_SCHEMA.fields]


@pandas_udf(EXTRACT_SCHEMA)
def extract_udf(
    url: pd.Series, html: pd.Series, content_type: pd.Series
) -> pd.DataFrame:
    rows = []
    for u, h, ct in zip(url, html, content_type):
        if h is None:
            rows.append(("", "", 0, False, False, False, False))
            continue
        r = extract_page(bytes(h), ct or "", u or "")
        f = r.flags
        rows.append(
            (
                r.text,
                r.markdown,
                f.body_text_len,
                f.has_content_container,
                f.is_error_page,
                f.needs_render,
                f.needs_js_render,
            )
        )
    return pd.DataFrame(rows, columns=_EXTRACT_COLS)


_CRAWL_COLS = [f.name for f in CRAWL_EXTRACT_SCHEMA.fields]


def make_crawl_extract_udf(max_links: int = 64):
    """extract_udf + out-link discovery (one parse per page), with the
    link cap taken from engine config (CrawlConfig.max_links_per_page)."""

    @pandas_udf(CRAWL_EXTRACT_SCHEMA)
    def crawl_extract(
        url: pd.Series, html: pd.Series, content_type: pd.Series
    ) -> pd.DataFrame:
        rows = []
        for u, h, ct in zip(url, html, content_type):
            if h is None:
                rows.append(("", "", 0, False, False, False, False, []))
                continue
            r = extract_page(
                bytes(h), ct or "", u or "", with_links=True, link_cap=max_links
            )
            f = r.flags
            rows.append(
                (
                    r.text,
                    r.markdown,
                    f.body_text_len,
                    f.has_content_container,
                    f.is_error_page,
                    f.needs_render,
                    f.needs_js_render,
                    list(r.links),
                )
            )
        return pd.DataFrame(rows, columns=_CRAWL_COLS)

    return crawl_extract


crawl_extract_udf = make_crawl_extract_udf()


@pandas_udf(CANON_SCHEMA)
def canonicalize_udf(url: pd.Series) -> pd.DataFrame:
    rows = []
    for u in url:
        c = canonicalize_url(u)
        rows.append((c.url, c.host, c.valid, c.reason))
    return pd.DataFrame(rows, columns=_CANON_COLS)


@pandas_udf(CANON_SCHEMA)
def validate_udf(url: pd.Series) -> pd.DataFrame:
    """Reference-minimal normalization (no canonical extensions) — used
    by parity tests against the reference's validate_url behavior."""
    rows = []
    for u in url:
        c = validate_url(u)
        rows.append((c.url, c.host, c.valid, c.reason))
    return pd.DataFrame(rows, columns=_CANON_COLS)
