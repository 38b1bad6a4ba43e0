"""CCNet-style perplexity filter (functions/lm.py): training
determinism, hand-computed smoothing, the COALESCE cascade, exact
bucket boundaries, and Spark ≡ single-node-scorer parity. The DuckDB
value-exact check rides test_driver_contract (lm_perplexity)."""

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from conftest import SF_SMALL

from downloader_spark.functions.lm import (
    MICRO,
    bucket_py,
    default_lm,
    score_nll_py,
    score_perplexity,
    train_bigram_lm,
)

TINY = ["a b a", "b a"]


def test_training_is_deterministic():
    m1, m2 = train_bigram_lm(TINY), train_bigram_lm(list(TINY))
    assert m1 == m2
    # and the cached build-time model is self-consistent
    d1, d2 = default_lm(), default_lm()
    assert d1 is d2
    assert d1["V"] == len(d1["vocab"]) + 1


def test_hand_computed_addone_smoothing():
    # c1: a=3 b=2; c2: (a,b)=1 (b,a)=2; V = 2 vocab + 1 unk = 3
    m = train_bigram_lm(TINY)
    assert m["V"] == 3

    def lp(num, den):
        return round(-math.log(num / den) * MICRO)

    assert m["pair_lp"][("a", "b")] == lp(2, 6)  # (1+1)/(3+3)
    assert m["pair_lp"][("b", "a")] == lp(3, 5)  # (2+1)/(2+3)
    assert m["ctx_lp"]["a"] == lp(1, 6)
    assert m["ctx_lp"]["b"] == lp(1, 5)
    assert m["oov_lp"] == lp(1, 3)


def test_scoring_cascade_and_buckets():
    m = train_bigram_lm(TINY)
    pair, ctx, oov = m["pair_lp"], m["ctx_lp"], m["oov_lp"]
    # observed pair path
    assert score_nll_py(m, "a b a") == (2, pair[("a", "b")] + pair[("b", "a")])
    # seen context, unseen continuation -> ctx
    assert score_nll_py(m, "a c") == (1, ctx["a"])
    # unseen context -> oov constant
    assert score_nll_py(m, "z z") == (1, oov)
    # normalization: case/whitespace collapse
    assert score_nll_py(m, "  A   B\na ") == score_nll_py(m, "a b a")
    # training terciles: means sorted [510826, 804719]
    assert m["th_head"] == score_nll_py(m, "b a")[1]
    assert m["th_tail"] == score_nll_py(m, "a b a")[1] // 2
    # bucket boundaries are inclusive (<=) and exact
    assert bucket_py(m, 0, 0) == "empty"
    assert bucket_py(m, 1, m["th_head"]) == "head"
    assert bucket_py(m, 1, m["th_head"] + 1) == "middle"
    assert bucket_py(m, 1, m["th_tail"]) == "middle"
    assert bucket_py(m, 1, m["th_tail"] + 1) == "tail"
    assert bucket_py(m, *score_nll_py(m, "z z z")) == "tail"


@pytest.mark.usefixtures("spark")
def test_spark_matches_python_scorer(spark):
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text")
        .limit(30)
    )
    seeded = docs.unionByName(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + 1000).alias("doc_id"),
            F.regexp_replace("text", "[a-z]", "7").alias("text"),  # OOV flood
        )
    ).unionByName(
        spark.createDataFrame(
            [(9001, ""), (9002, "word"), (9003, "   ")],
            "doc_id long, text string",
        )
    )
    rows = score_perplexity(seeded).collect()
    m = default_lm()
    assert rows
    buckets = set()
    for r in rows:
        n, s = score_nll_py(m, r["text"])
        assert (r["n_bigrams"], r["nll_micro"]) == (n, s), r["doc_id"]
        assert r["ppl_bucket"] == bucket_py(m, n, s)
        expect_mean = round(s / (n * float(MICRO)), 6) if n else 0.0
        assert r["mean_nll"] == pytest.approx(expect_mean, abs=0)
        buckets.add(r["ppl_bucket"])
    # the seeded frame exercises the whole surface
    assert "empty" in buckets and "tail" in buckets
    assert buckets & {"head", "middle"}
