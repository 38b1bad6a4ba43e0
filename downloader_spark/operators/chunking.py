"""Training-window chunking — the doc→sample step a pretraining data
pipeline runs after cleaning/dedup (split each document into fixed-size
overlapping token windows; downstream packing/tokenization consumes the
windows). No reference-repo counterpart (instructed training-pipeline
addition); the recipe is the public fixed-stride context-window split.

Scale shape: ONE projection computes the token split (split-once
contract — an inline split inside the transform lambda re-inlines per
window, the 14× bug class of operators/dedup.shingles_of_words), one
posexplode over the window-start sequence, everything else native
column work on the exploded rows. No shuffle at all: chunking is
embarrassingly row-parallel, the output partitioning inherits the
input's, and a 100 TB corpus chunks at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens_of


def chunk_token_windows(
    df: DataFrame,
    id_col: str,
    text: Column,
    window: int = 128,
    stride: int = 64,
) -> DataFrame:
    """One row per (doc, window): ``window_id`` (0-based, = start /
    stride), ``n_tokens`` (short for tail windows), ``window_text``
    (the tokens re-joined with single spaces — tokens are the
    whitespace split of lower(trim(text)), the same normalization the
    fingerprint/shingle family uses). Start positions are 0, stride,
    2·stride, … ≤ max(n_tokens-1, 0), so every token is covered, tail
    windows may be shorter than ``window``, and an empty document
    yields exactly one empty window (its token array is [''])."""
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokens_of(text).alias("_toks")
    )
    n = F.size(F.col("_toks"))
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = toks.select(
        "doc_id", "_toks", F.explode(starts).alias("_start")
    )
    win = F.slice(F.col("_toks"), F.col("_start") + 1, window)
    return exploded.select(
        "doc_id",
        (F.col("_start") / stride).cast("long").alias("window_id"),
        F.size(win).cast("long").alias("n_tokens"),
        F.concat_ws(" ", win).alias("window_text"),
    )
