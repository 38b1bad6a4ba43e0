"""Arrow fast path for the Gopher repetition pack — a pandas-UDF
recompute of functions/text.with_repetition that is VALUE-IDENTICAL to
the native interpreted-HOF implementation (pinned bit-for-bit by
tests/test_repetition_arrow.py over a crafted battery AND the sf0.01
corpus), at a fraction of its per-document constant (the r5 verdict's
named "2-5× lever": the native path's per-row cost is ~10 ms/doc of
interpreted HOF evaluation; a Python dict/Counter pass over the same
token arrays is ~10-20× cheaper per row and arrives Arrow-batched).

The NATIVE implementation remains the semantic reference — the DuckDB
oracles (gopher_quality / webtext_pipeline*, CLAUDE.md invariant 8)
recompute ITS definition relationally, and this module's contract is
equality with it, expression by expression:

- tokens: split(trim(lower(text)), '\\s+') — Java semantics exactly:
  trim strips ONLY ASCII spaces (0x20), \\s is the ASCII class
  [ \\t\\n\\x0b\\f\\r], and split keeps leading/trailing empties
  (Spark passes limit -1).
- lines/paras: raw-text regex split on '\\n' / '\\n\\n' (leftmost,
  non-overlapping — identical to str.split for these literals).
- every numerator is an exact integer; denominators are exact ints
  cast to double; the only float op is the final division.
- rounding mirrors Spark's Round on DoubleType: BigDecimal.valueOf
  (SHORTEST decimal repr of the double — Python repr, same
  shortest-round-trip contract) → setScale(6, HALF_UP) → double.

Like every gram feature in this repo, grams are token-SLICE tuples,
never concatenated strings (tokens cannot contain whitespace, so tuple
equality ≡ joined-string equality — CLAUDE.md invariant 8), and the
count-≥-2 guard applies to top-n-gram char fractions.

Scale design: row-parallel, zero shuffle, one ArrowEvalPython node;
the per-batch work is pure CPython over small per-doc lists. At 100 TB
this is the same embarrassingly parallel shape as the native path —
the lever is the per-doc constant, not the plan.
"""

from __future__ import annotations

import re
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from .text import (
    GOPHER_REPETITION_THRESHOLDS,
    REPETITION_FEATURES,
    REPETITION_FLAGS,
)

# Java \s — ASCII only (Python \s would also eat unicode whitespace)
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")
_NL = re.compile(r"\n")
_NLNL = re.compile(r"\n\n")
_Q6 = Decimal("0.000001")


def _round6(x: float) -> float:
    """Spark Round(DoubleType, 6): BigDecimal.valueOf(x) (shortest
    repr) → setScale(6, HALF_UP) → doubleValue."""
    return float(Decimal(repr(x)).quantize(_Q6, rounding=ROUND_HALF_UP))


def _toks_py(text: str) -> list[str]:
    # lower(): CPython's str.lower mirrors JVM String.toLowerCase for
    # ASCII/BMP-common text (everything the corpora and tests cover);
    # exotic code points with version/locale-sensitive case mappings
    # are OUTSIDE the pinned bit-exactness scope (ADVICE r6) — the
    # battery in tests/test_repetition_arrow.py is the contract.
    return _JAVA_WS.split(text.lower().strip(" "))


def _cover_from_starts_py(toks: list[str], starts: list[int], n: int) -> int:
    """Exact mirror of text._cover_from_starts: union coverage of
    [s, s+n) token windows in the collapsed text — per window, chars of
    the not-yet-covered suffix + its internal spaces + a boundary space
    when the window overlaps previous coverage."""
    end = 0
    cov = 0
    for s in starts:
        lo = max(s, end)
        hi = s + n
        if hi > lo:
            seg = sum(len(toks[i]) for i in range(lo, hi))
            cov += seg + (hi - lo - 1) + (1 if lo > s else 0)
        end = max(end, hi)
    return cov


def repetition_features_py(
    text: str | None, wanted: list[str]
) -> list[float | None]:
    """All requested repetition features for ONE document, in ``wanted``
    order — the exact-arithmetic mirror of the native column
    expressions (None text → all-None, like the native path's
    null-propagating splits)."""
    if text is None:
        # mirror the native null semantics exactly: line/para features
        # propagate null (size(split(null)) is null), but the gram
        # features come out 0.0 — size(null) >= n is null, so
        # _gram_structs takes its empty-array branch, the run-max/
        # coverage aggregates yield 0, and greatest(length(null), 1)
        # skips the null → 0 / 1 = 0.0
        return [
            None if f.startswith(("dup_line", "dup_para")) else 0.0
            for f in wanted
        ]
    nchars = float(max(len(text), 1))
    out: dict[str, float] = {}
    need_lines = any(f.startswith("dup_line") for f in wanted)
    need_paras = any(f.startswith("dup_para") for f in wanted)
    if need_lines:
        lines = _NL.split(text)
        if "dup_line_frac" in wanted:
            out["dup_line_frac"] = _round6(
                (len(lines) - len(set(lines))) / float(max(len(lines), 1))
            )
        if "dup_line_char_frac" in wanted:
            out["dup_line_char_frac"] = _round6(
                (sum(map(len, lines)) - sum(map(len, set(lines)))) / nchars
            )
    if need_paras:
        paras = _NLNL.split(text)
        if "dup_para_frac" in wanted:
            out["dup_para_frac"] = _round6(
                (len(paras) - len(set(paras))) / float(max(len(paras), 1))
            )
        if "dup_para_char_frac" in wanted:
            out["dup_para_char_frac"] = _round6(
                (sum(map(len, paras)) - sum(map(len, set(paras)))) / nchars
            )
    gram_ns = [n for n in (2, 3, 4) if f"top_{n}gram_char_frac" in wanted]
    dup_ns = [n for n in (5, 6, 7, 8, 9, 10) if f"dup_{n}gram_char_frac" in wanted]
    if gram_ns or dup_ns:
        toks = _toks_py(text)
        for n in gram_ns:
            best = 0
            if len(toks) >= n:
                counts = Counter(
                    tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                for g, c in counts.items():
                    if c >= 2:
                        cover = c * (sum(map(len, g)) + n - 1)
                        if cover > best:
                            best = cover
            out[f"top_{n}gram_char_frac"] = _round6(best / nchars)
        for n in dup_ns:
            cov = 0
            if len(toks) >= n:
                grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                counts = Counter(grams)
                starts = [p for p, g in enumerate(grams) if counts[g] >= 2]
                cov = _cover_from_starts_py(toks, starts, n)
            out[f"dup_{n}gram_char_frac"] = _round6(cov / nchars)
    return [out[f] for f in wanted]


def with_repetition_arrow(df, text_col: str = "text", features=None):
    """Drop-in replacement for text.with_repetition (same columns, same
    values, same subset semantics): one Arrow-batched pandas UDF
    computes the feature struct per row; flags and the composite
    ``repetition_pass`` stay native expressions over its fields."""
    wanted = (
        list(features) if features is not None else list(REPETITION_FEATURES)
    )
    unknown = set(wanted) - set(REPETITION_FEATURES)
    if unknown:
        raise ValueError(f"unknown repetition features: {sorted(unknown)}")
    from pyspark.sql.functions import pandas_udf

    schema = StructType([StructField(f, DoubleType()) for f in wanted])

    @pandas_udf(schema)
    def feats(texts: pd.Series) -> pd.DataFrame:
        rows = [repetition_features_py(t, wanted) for t in texts]
        return pd.DataFrame(rows, columns=wanted, dtype=object)

    out = df.withColumn("_rep", feats(F.col(text_col)))
    out = out.withColumns({f: F.col("_rep")[f] for f in wanted}).drop("_rep")
    th = GOPHER_REPETITION_THRESHOLDS
    flags = {
        flag: F.col(feat) > F.lit(th[f"max_{feat}"])
        for feat, flag in zip(REPETITION_FEATURES, REPETITION_FLAGS)
        if feat in wanted
    }
    out = out.withColumns(flags)
    if set(wanted) != set(REPETITION_FEATURES):
        return out
    rep_fail = None
    for flag in REPETITION_FLAGS:
        rep_fail = F.col(flag) if rep_fail is None else (rep_fail | F.col(flag))
    return out.withColumn("repetition_pass", ~rep_fail)
