"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship crawl-extraction query on sf0.001 — synthesize
pages from the documents table (BASELINE.json input_hint schema), run
the vectorized extract UDF, and profile extracted text per language.

queries()/oracle_sql(): one entry per implemented operator from
SURVEY.md §2 (see downloader_spark/queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from downloader_spark.queries import Q

    return Q["extract_lang_profile"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from downloader_spark.queries import Q

    return dict(Q)


def oracle_sql() -> dict[str, str]:
    from downloader_spark.queries import ORACLE

    # resolved(): generated oracles are stored as callables and built
    # on access (plain dict(ORACLE) would leak the raw callable)
    return ORACLE.resolved()
