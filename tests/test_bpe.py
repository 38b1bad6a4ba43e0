"""Deterministic BPE tokenizer (functions/bpe.py): training and
encoding contracts the SQL oracle relies on."""

import pytest
from pyspark.sql import functions as F

from downloader_spark.functions.bpe import (
    bpe_token_count_udf,
    bpe_window_udf,
    default_merges,
    encode_word,
    train_bpe,
    _words,
)

CORPUS = [
    "lower lowest newer newest wider widest low new wide",
    "the newer lower widest low low low newest",
    "wide wide wider new new newer lowest",
]


@pytest.fixture(scope="module")
def merges():
    return train_bpe(CORPUS, n_merges=30)


def test_training_deterministic(merges):
    assert merges == train_bpe(list(CORPUS), n_merges=30)
    assert len(merges) > 5  # actually learned something


def test_encode_round_trip(merges):
    ranks = {m: i for i, m in enumerate(merges)}
    for text in CORPUS:
        for w in _words(text):
            toks = encode_word(w, ranks)
            assert "".join(toks) == w  # lossless
            assert 1 <= len(toks) <= len(w)


def test_shared_stems_merge(merges):
    """BPE's point: 'low'/'new'/'wide' stems recur, so inflected forms
    share subword prefixes with their stems."""
    ranks = {m: i for i, m in enumerate(merges)}
    low = encode_word("lowest", ranks)
    assert len(low) < len("lowest")  # actually compressed
    # the stem tokenization is a prefix of the inflected form's
    stem = encode_word("low", ranks)
    assert low[: len(stem) - 1] == stem[:-1] or len(stem) == 1


def test_batch_merge_equals_one_at_a_time(merges):
    """The SQL oracle merges ONE leftmost occurrence per step; the
    module merges all occurrences per scan. Equal by the rank-
    monotonicity argument — pin it on adversarial repeats."""
    ranks = {m: i for i, m in enumerate(merges)}

    def encode_one_at_a_time(word):
        toks = list(word)
        while True:
            best = None
            for i in range(len(toks) - 1):
                r = ranks.get((toks[i], toks[i + 1]))
                if r is not None and (best is None or r < best[0]):
                    best = (r, i)
            if best is None:
                return toks
            i = best[1]
            # leftmost occurrence of the BEST PAIR, not best position:
            a, b = toks[i], toks[i + 1]
            for j in range(len(toks) - 1):
                if toks[j] == a and toks[j + 1] == b:
                    toks[j : j + 2] = [a + b]
                    break

    for w in ["lowlowlow", "newnewest", "widewide", "aaaa", "lowestlowest"]:
        assert encode_word(w, ranks) == encode_one_at_a_time(w), w


def test_udf_counts_match_brute_force(spark, merges):
    ranks = {m: i for i, m in enumerate(merges)}
    rows = [(i, t) for i, t in enumerate(CORPUS)] + [(99, ""), (100, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id", bpe_token_count_udf(merges)("text").alias("n")
        ).collect()
    }
    for i, t in enumerate(CORPUS):
        assert got[i] == sum(len(encode_word(w, ranks)) for w in _words(t))
    assert got[99] == 0 and got[100] == 0


def test_window_udf_partitions_tokens(spark, merges):
    """Windows: ids contiguous from 0, token totals preserved, every
    window holds >= 1 word, and no window STARTS past the budget (a
    straddling word may overflow its window — documented)."""
    W = 7
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    rows = (
        df.select("doc_id", F.explode(bpe_window_udf(merges, W)("text")).alias("c"))
        .select("doc_id", "c.window_id", "c.n_words", "c.n_tokens")
        .collect()
    )
    ranks = {m: i for i, m in enumerate(merges)}
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, t in enumerate(CORPUS):
        wins = sorted(by_doc[i], key=lambda r: r["window_id"])
        assert [w["window_id"] for w in wins] == list(range(len(wins)))
        assert sum(w["n_tokens"] for w in wins) == sum(
            len(encode_word(w, ranks)) for w in _words(t)
        )
        assert all(w["n_words"] >= 1 for w in wins)
        # each window's tokens-before-start < window_id*W + W by construction
        cum = 0
        for w in wins:
            assert cum // W == w["window_id"]
            cum += w["n_tokens"]


def test_default_merges_cached_and_deterministic():
    a, b = default_merges(), default_merges()
    assert a is b and len(a) > 0


def test_default_vocab_scale_and_held_out_splits():
    """r6 vocab contract (VERDICT r5 #6): the default merges train from
    the multi-table sf0.01 corpus with a few hundred merges, and words
    the training corpus never saw split into MULTIPLE learned subwords
    (not char soup, not single tokens)."""
    merges = default_merges()
    assert len(merges) >= 250, len(merges)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab_tokens = {a + b for a, b in merges}
    held_out = ["clickstream", "households", "viewer", "errors", "joinfilter"]
    for w in held_out:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w
        assert 2 <= len(toks) < len(w), (w, toks)  # genuine subwords
        # at least one token is a LEARNED multi-char subword
        assert any(t in vocab_tokens and len(t) > 1 for t in toks), (w, toks)


def test_seeded_compounds_change_token_counts(spark):
    """The seeded compound family in the bpe_* queries must produce
    n_bpe_tokens > n_words rows — otherwise the oracle can't tell the
    BPE count from the word count under the r6 vocab."""
    from downloader_spark.queries import Q

    rows = Q["bpe_token_counts"](spark, "/root/testdata/sf0.001").collect()
    seeded = [r for r in rows if r["doc_id"] >= 1000000]
    assert seeded, "no seeded compound rows"
    assert any(r["n_bpe_tokens"] > r["n_words"] for r in seeded)
