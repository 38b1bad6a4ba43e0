"""Hashed-ngram quality classifier (functions/classifier.py): training
determinism, seed-vs-junk separation on train AND held-out data, the
Python/Spark scorer parity, and the engine-portable bucket hash."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from downloader_spark.functions.classifier import (
    N_BUCKETS,
    bucket_py,
    default_classifier,
    junk_docs,
    label_py,
    score_quality,
    score_quality_py,
    train_quality_classifier,
)
from downloader_spark.functions.sketch import md5_60bit


def _seed_texts(n=None):
    import pyarrow.parquet as pq

    texts = [
        t or ""
        for t in pq.read_table(
            "/root/testdata/sf0.001/documents.parquet", columns=["text"]
        )
        .column("text")
        .to_pylist()
    ]
    return texts[:n] if n else texts


def test_training_is_deterministic():
    pos = _seed_texts(40)
    neg = junk_docs(40)
    m1 = train_quality_classifier(pos, neg, epochs=30)
    m2 = train_quality_classifier(pos, neg, epochs=30)
    assert m1["w_micro"] == m2["w_micro"]
    assert m1["bias_micro"] == m2["bias_micro"]


def test_separates_seed_from_junk_train_and_heldout():
    m = default_classifier()
    pos_train = _seed_texts()
    neg_train = junk_docs(len(pos_train))

    def acc(texts, want):
        ok = sum(
            1 for t in texts if label_py(m, *score_quality_py(m, t)) == want
        )
        return ok / len(texts)

    assert acc(pos_train, "keep") >= 0.98
    assert acc(neg_train, "drop") >= 0.98
    # held-out: sf0.01 docs (same template family, unseen ids) and
    # junk indices the training never saw
    import pyarrow.parquet as pq

    pos_held = [
        t or ""
        for t in pq.read_table(
            "/root/testdata/sf0.01/documents.parquet", columns=["text"]
        )
        .column("text")
        .to_pylist()
    ]
    neg_held = junk_docs(3 * len(pos_train))[len(pos_train) :]
    assert acc(pos_held, "keep") >= 0.95
    assert acc(neg_held, "drop") >= 0.95


def test_empty_and_whitespace_docs_label_empty():
    m = default_classifier()
    for t in ("", "   ", " \n\t "):
        n, s = score_quality_py(m, t)
        assert (n, s) == (0, 0)
        assert label_py(m, n, s) == "empty"


def test_bucket_hash_matches_spark(spark):
    words = ["the", "buy cheap", "casino", "Document 7", "über", ""]
    df = spark.createDataFrame([(w,) for w in words], "g string")
    got = {
        r["g"]: r["b"]
        for r in df.select(
            "g", (md5_60bit(F.col("g")) % N_BUCKETS).alias("b")
        ).collect()
    }
    for w in words:
        assert got[w] == bucket_py(w), w


def test_spark_scorer_matches_python(spark):
    m = default_classifier()
    texts = _seed_texts(15) + junk_docs(9) + ["", "   "]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = score_quality(df, model=m).collect()
    assert len(rows) == len(texts)
    for r in rows:
        n, s = score_quality_py(m, texts[r["doc_id"]])
        assert (r["n_grams"], r["score_micro"]) == (n, s), r["doc_id"]
        assert r["quality_label"] == label_py(m, n, s)


def test_quantized_weights_are_nontrivial():
    m = default_classifier()
    assert m["n_train"] >= 20
    assert len(m["w_micro"]) > 100
    assert any(v > 0 for v in m["w_micro"].values())
    assert any(v < 0 for v in m["w_micro"].values())
