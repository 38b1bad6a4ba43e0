"""Arrow fast path ≡ native HOF path for the Gopher repetition pack
(functions/repetition_arrow.py vs functions/text.with_repetition):
bit-exact equality of all 13 features + 13 flags + repetition_pass
over a crafted adversarial battery and the sf0.01 documents corpus.
The native path stays the semantic reference the DuckDB oracles pin
(CLAUDE.md invariant 8); this suite is what licenses the queries to
run the fast path."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from downloader_spark.functions.repetition_arrow import (
    repetition_features_py,
    with_repetition_arrow,
)
from downloader_spark.functions.text import (
    REPETITION_FEATURES,
    REPETITION_FLAGS,
    with_repetition,
)

DOCS = "/root/testdata/sf0.01/documents.parquet"

BATTERY = [
    "",
    " ",
    "\n",
    "\n\n\n",
    "one",
    "a b a b a b a b",
    "the cat sat on the mat the cat sat on the mat",
    "line1\nline2\nline1\nline3\nline1",
    "para one\n\npara two\n\npara one\n\npara three",
    "x " * 50,
    "a b c d e f g h i j " * 6,  # long dup 10-grams, overlapping windows
    "w1 w2 w3 w4 w5 unique1 w1 w2 w3 w4 w5 unique2 w1 w2 w3 w4 w5",
    "tab\tsep\ttab\tsep words",
    "trailing newline\n",
    "  leading spaces and  double  spaces  ",
    "UPPER case UPPER case UPPER case",
    "répét itïon répét itïon unicode tèxt répét itïon",
    "a\n\nb\n\n\nc\n\n\n\nd",  # odd-count newline runs: regex \n\n leftmost
    "self overlap self overlap self overlap self",
    "z y x w v u t s r q p o n m l k j i h g f e d c b a",  # all unique
]

ALL_COLS = REPETITION_FEATURES + REPETITION_FLAGS + ["repetition_pass"]


def _rows_as_reprs(df, id_col, cols):
    out = {}
    for r in df.select(id_col, *cols).collect():
        out[r[id_col]] = tuple(repr(r[c]) for c in cols)
    return out


def _assert_identical(spark, df, id_col, cols):
    nat = _rows_as_reprs(with_repetition(df, "text"), id_col, cols)
    arr = _rows_as_reprs(with_repetition_arrow(df, "text"), id_col, cols)
    assert nat.keys() == arr.keys()
    for k in nat:
        if nat[k] != arr[k]:
            diffs = [
                (c, a, b) for c, a, b in zip(cols, nat[k], arr[k]) if a != b
            ]
            raise AssertionError(f"doc {k}: {diffs}")


def test_battery_bit_exact(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BATTERY)], "doc_id long, text string"
    )
    _assert_identical(spark, df, "doc_id", ALL_COLS)


def test_null_text_matches(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "a b a b a b")], "doc_id long, text string"
    )
    _assert_identical(spark, df, "doc_id", ALL_COLS)


def test_corpus_bit_exact(spark):
    df = spark.read.parquet(DOCS).select("doc_id", "text")
    _assert_identical(spark, df, "doc_id", ALL_COLS)


def test_subset_features_match(spark):
    sub = ["dup_line_frac", "top_2gram_char_frac", "dup_5gram_char_frac"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(BATTERY)], "doc_id long, text string"
    )
    nat = _rows_as_reprs(with_repetition(df, "text", features=sub), "doc_id", sub)
    arr = _rows_as_reprs(
        with_repetition_arrow(df, "text", features=sub), "doc_id", sub
    )
    assert nat == arr
    # subset output must NOT include the composite (matches native)
    cols = with_repetition_arrow(df, "text", features=sub).columns
    assert "repetition_pass" not in cols


def test_python_mirror_direct():
    # spot-check the pure-Python layer without Spark: known values
    t = "a b a b"  # 4 tokens, top-2gram "a b" count 2, len 3 → 6/7
    feats = dict(
        zip(
            REPETITION_FEATURES,
            repetition_features_py(t, REPETITION_FEATURES),
        )
    )
    assert feats["top_2gram_char_frac"] == round(6 / 7, 6)
    assert feats["dup_line_frac"] == 0.0
    # dup-gram window union: "x x x x x x" all 5-grams dup → full cover
    t2 = "x x x x x x"
    feats2 = dict(
        zip(
            REPETITION_FEATURES,
            repetition_features_py(t2, REPETITION_FEATURES),
        )
    )
    assert feats2["dup_5gram_char_frac"] == 1.0
