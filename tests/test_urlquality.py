"""URL quality gate (functions/urlquality.py): suffix-set semantics,
literal-array vs dim-table-join blocklist equivalence, keyword score
arithmetic, and threshold behavior. The oracle parity is covered by
tests/test_driver_contract.py (url_quality_filter)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from downloader_spark.functions.urlquality import (
    BLOCK_DOMAINS,
    URL_SCORE_BLOCK,
    URL_WORD_WEIGHTS,
    domain_blocked_col,
    host_of,
    host_suffixes,
    url_quality,
    url_spam_score,
)

URLS = [
    (0, "http://site.example.com/articles/1"),
    (1, "http://badsource.example/page"),
    (2, "http://cdn.badsource.example/x"),
    (3, "http://deep.sub.badsource.example/y"),
    (4, "http://notbadsource.example/z"),  # no dot boundary: NOT blocked
    (5, "http://host.net/casino"),
    (6, "http://host.net/free-deal-offer"),
    (7, "http://host.net/torrent-download-free"),
    (8, "http://news.example.org/winner-profile"),
    (9, "https://x.org:8080/casino"),  # port stripped from host
    (10, "not-a-url"),
]


@pytest.fixture(scope="module")
def urls_df(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def test_host_and_suffixes(spark, urls_df):
    rows = {
        r["id"]: (r["h"], r["s"])
        for r in urls_df.select(
            "id",
            host_of(F.col("url")).alias("h"),
            host_suffixes(host_of(F.col("url"))).alias("s"),
        ).collect()
    }
    assert rows[0][0] == "site.example.com"
    assert rows[0][1] == ["site.example.com", "example.com", "com"]
    assert rows[9][0] == "x.org"  # port excluded
    assert rows[10][0] == ""  # no scheme → empty host


def test_literal_and_join_blocklists_agree(spark, urls_df):
    lit = {
        r["id"]: r["b"]
        for r in urls_df.select(
            "id", domain_blocked_col(host_of(F.col("url"))).alias("b")
        ).collect()
    }
    domains = spark.createDataFrame(
        [(d,) for d in BLOCK_DOMAINS], "domain string"
    )
    joined = {
        r["id"]: r["domain_blocked"]
        for r in url_quality(urls_df, "id", domains_df=domains).collect()
    }
    assert lit == joined
    assert lit[1] and lit[2] and lit[3]  # exact, sub, deep-sub
    assert not lit[4]  # "notbadsource.example" is NOT under the domain
    assert not lit[0] and not lit[10]


def test_spam_score_exact(spark, urls_df):
    got = {
        r["id"]: r["s"]
        for r in urls_df.select(
            "id", url_spam_score(F.col("url")).alias("s")
        ).collect()
    }
    w = URL_WORD_WEIGHTS
    assert got[5] == w["casino"]
    assert got[6] == w["free"] + w["deal"] + w["offer"]
    assert got[7] == w["torrent"] + w["download"] + w["free"]
    assert got[8] == w["win"]  # substring hit inside "winner"
    assert got[0] == 0


def test_keep_decision(spark, urls_df):
    out = {r["id"]: r["url_keep"] for r in url_quality(urls_df, "id").collect()}
    # blocked domains drop regardless of score
    assert not out[1] and not out[2] and not out[3]
    # strict word alone blocks; soft-only stays
    assert not out[5]
    assert out[6]
    # medium+soft combination hits the threshold exactly
    assert URL_WORD_WEIGHTS["torrent"] + URL_WORD_WEIGHTS["download"] + \
        URL_WORD_WEIGHTS["free"] >= URL_SCORE_BLOCK
    assert not out[7]
    assert out[8] and out[0] and out[10]
