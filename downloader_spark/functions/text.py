"""Text-analysis column functions for training-data pipelines.

All NATIVE Spark SQL expressions (JVM-side, codegen-friendly) — no UDFs:
language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish subword
estimate), and document fingerprinting (shingled rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets (public common words); enough
# for a deterministic n-gram-style heuristic, not a real classifier.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "une"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "para"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (with multiplicity) over tokens."""
    toks = _tokens(text)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    return out


def detect_lang(text: Column) -> Column:
    """argmax over lang_scores, ties broken alphabetically (first lang);
    'und' when nothing matches."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
            for lang in sorted(LANG_MARKERS)
        ]
    )
    max_score = F.array_max(F.transform(pairs, lambda p: p["score"]))
    winner = F.array_min(F.filter(pairs, lambda p: p["score"] == max_score))["lang"]
    return F.when(max_score <= 0, F.lit("und")).otherwise(winner)


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for blank)."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def subword_estimate(text: Column) -> Column:
    """BPE-ish token estimate without a vocab: words + ceil(chars/4)
    blend — the standard ~4-chars-per-token heuristic, deterministic."""
    words = token_count(text).cast("double")
    chars = F.length(text).cast("double")
    return F.ceil((words * 0.4) + (chars / 4.0) * 0.6).cast("long")


def quality_features(text: Column) -> dict[str, Column]:
    """Length/punct/stopword ratio features (each ∈ [0,1] rounded)."""
    n = F.greatest(F.length(text), F.lit(1)).cast("double")
    toks = _tokens(text)
    n_toks = F.greatest(F.size(toks), F.lit(1)).cast("double")
    all_markers = sorted({m for ms in LANG_MARKERS.values() for m in ms})
    marker_arr = F.array(*[F.lit(m) for m in all_markers])
    stop_hits = F.size(
        F.filter(toks, lambda t: F.array_contains(marker_arr, t))
    ).cast("double")
    return {
        "punct_ratio": F.round(
            F.length(F.regexp_replace(text, r"[^.!?,;:]", "")) / n, 6
        ),
        "digit_ratio": F.round(F.length(F.regexp_replace(text, r"[^0-9]", "")) / n, 6),
        "upper_ratio": F.round(F.length(F.regexp_replace(text, r"[^A-Z]", "")) / n, 6),
        "stopword_ratio": F.round(stop_hits / n_toks, 6),
        "mean_word_len": F.round(
            F.aggregate(
                F.transform(toks, lambda t: F.length(t).cast("double")),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / n_toks,
            6,
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite [0,100] quality score: rewards stopword presence and
    moderate word length, penalizes digit/punct floods. Deterministic,
    documented weights — a filterable signal, not a model."""
    f = quality_features(text)
    score = (
        F.lit(50.0)
        + 100.0 * F.least(f["stopword_ratio"], F.lit(0.4))
        - 80.0 * F.greatest(f["digit_ratio"] - 0.2, F.lit(0.0))
        - 80.0 * F.greatest(f["punct_ratio"] - 0.15, F.lit(0.0))
        + 10.0 * F.least(f["mean_word_len"], F.lit(8.0)) / 8.0
    )
    return F.round(F.greatest(F.lit(0.0), F.least(F.lit(100.0), score)), 4)


def tokens_of(text: Column) -> Column:
    """Whitespace token array (lower, trim, split on \\s+) — the split
    fingerprint64_of_words expects. Materialize in its OWN projection
    before any HOF references it (see fingerprint64_of_words)."""
    return _tokens(text)


def fingerprint64_of_words(toks: Column, k: int = 8) -> Column:
    """Order-sensitive 64-bit document fingerprint over an
    ALREADY-SPLIT token array: xxhash64 over the sequence of k-word
    shingle hashes (a rolling-hash analog that stays native: hash each
    shingle, then hash the concatenated hash string).

    ``toks`` must be a materialized column (a prior projection), never
    the split expression inline: an expression referenced inside a
    ``transform`` lambda is re-inlined PER ARRAY ELEMENT, so the inline
    form recomputes lower+trim+split over the full text once per
    shingle — measured 3.7× slower (4.06 s vs 1.09 s) on the sf0.1
    fingerprint_groups workload, hash-identical output. Mirrors
    operators/dedup.shingles_of_words."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k)))
    )
    return F.xxhash64(F.concat_ws(",", F.transform(shingle_hashes, lambda h: h.cast("string"))))


def fingerprint64(text: Column, k: int = 8) -> Column:
    """Compat/spec form over raw text (carries the inline-lambda
    recompute); hot paths must split once via tokens_of and call
    fingerprint64_of_words — same output, ~3.7× faster at sf0.1."""
    return fingerprint64_of_words(_tokens(text), k)
