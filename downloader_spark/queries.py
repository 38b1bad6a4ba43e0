"""Driver-contract queries: each SURVEY §2 operator exposed as a
(spark_fn, oracle_sql) pair over the /root/testdata tables.

Column names are aliased identically on both sides (the driver's
compare sorts columns by name and hashes values). Float aggregates are
rounded; BIGINT sums are cast explicitly in DuckDB (its SUM(BIGINT)
returns HUGEINT, Spark's returns LONG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.aggregates import (
    HISTOGRAM_BUCKETS,
    batch_summary,
    cumulative_histogram,
    health_score,
)
from .operators.dedup import exact_dup_groups
from .operators.topk import history_page, per_key_topk

Q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}


class _LazyOracleDict(dict):
    """Oracle registry whose values may be ZERO-ARG CALLABLES, resolved
    and cached on first item access — a generated oracle (lm_perplexity
    trains the LM / reads parquet to build its VALUES tables) must not
    run at module import for every process that merely imports the
    query registry (crawl runs, bench sections, unrelated tests).
    NOTE: ``dict(ORACLE)`` would bypass ``__getitem__`` (CPython copies
    the concrete dict storage) and leak the raw callable — use
    ``resolved()`` or per-key access."""

    def __getitem__(self, k):
        v = super().__getitem__(k)
        if callable(v):
            v = v()
            super().__setitem__(k, v)
        return v

    # every value-returning accessor routes through __getitem__ so the
    # lazy contract can't be bypassed (ADVICE r5: .get()/.values()/
    # .items() used to hand back the raw callable)
    def get(self, k, default=None):
        try:
            return self[k]
        except KeyError:
            return default

    def values(self):
        return [self[k] for k in self]

    def items(self):
        return [(k, self[k]) for k in self]

    def resolved(self) -> dict[str, str]:
        return {k: self[k] for k in self}


ORACLE: _LazyOracleDict = _LazyOracleDict()


def _q(name: str, oracle: str | Callable[[], str] | None = None):
    def deco(fn):
        Q[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session parallelism before
    per-row-HEAVY map work (r7). The sf fixtures are single-row-group
    parquet files, so a scan is ONE partition and every pre-exchange
    projection (regex, HOFs, Arrow UDFs, gram explodes) otherwise runs
    on one core — measured 19 s single-task vs ~2 s spread for the
    extract UDF at sf1.0. Only applied where the map work dominates
    the ~0.2 s shuffle it costs; at production scale scans yield
    thousands of partitions and callers would drop this (the
    repartition constant is the session's core count, not a magic
    number)."""
    return df.repartition(spark.sparkContext.defaultParallelism)


def _spread_if_big(
    spark: SparkSession, df: DataFrame, sf_dir: str,
    table: str = "documents", min_mb: int = 4,
) -> DataFrame:
    """_spread gated on the source table's file size (guide §2: derive
    scale-dependent partitioning from input size, not a constant). For
    BORDERLINE per-row work — cheap enough that the ~0.2 s shuffle
    outweighs it at sf0.1 (measured quality_score 0.30 → 0.55-0.77 s
    there) but single-core-bound at sf1.0+ (1.8 → 0.5 s) — spread only
    once the input outgrows ``min_mb``. Clearly-heavy paths (UDFs,
    gram explodes, multi-regex flag packs) use _spread unconditionally:
    they win at every fixture scale."""
    import os

    path = os.path.join(sf_dir, f"{table}.parquet")
    try:
        # single-file fixtures: the size IS the table size; directory
        # or remote layouts: assume big (a multi-file table usually
        # already scans parallel anyway — the repartition is harmless)
        size = (1 << 40) if os.path.isdir(path) else os.path.getsize(path)
    except OSError:
        size = 1 << 40
    if size >= min_mb * (1 << 20):
        return _spread(spark, df)
    return df


# ---------------------------------------------------------------------------
# Flagship + document/text analytics
# ---------------------------------------------------------------------------

@_q(
    "lang_profile",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def q_lang_profile(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@_q(
    "token_counts",
    """
    SELECT doc_id,
           CASE WHEN TRIM(text) = '' THEN 0
                ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END AS n_tokens
    FROM documents
    """,
)
def q_token_counts(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), r"\s+"))
    )
    return docs.select("doc_id", toks.alias("n_tokens"))


@_q(
    "quality_score",
    """
    SELECT doc_id,
           ROUND(LEN(regexp_replace(text, '[^.!?]', '', 'g')) * 1.0
                 / GREATEST(n_chars, 1), 6) AS punct_ratio,
           ROUND(LEN(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                 / GREATEST(n_chars, 1), 6) AS digit_ratio,
           CASE WHEN n_chars >= 200 THEN 'long'
                WHEN n_chars >= 50 THEN 'medium' ELSE 'short' END AS length_band
    FROM documents
    """,
)
def q_quality_score(spark, sf_dir):
    docs = _spread_if_big(spark, _t(spark, sf_dir, "documents"), sf_dir)
    denom = F.greatest("n_chars", F.lit(1))
    punct = F.length(F.regexp_replace("text", r"[^.!?]", ""))
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    return docs.select(
        "doc_id",
        F.round(punct / denom, 6).alias("punct_ratio"),
        F.round(digits / denom, 6).alias("digit_ratio"),
        F.when(F.col("n_chars") >= 200, "long")
        .when(F.col("n_chars") >= 50, "medium")
        .otherwise("short")
        .alias("length_band"),
    )


@_q(
    "gopher_quality",
    r"""
    WITH seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, repeat('#', 40) || ' ' || text
        FROM documents WHERE doc_id % 20 = 0
      UNION ALL SELECT doc_id + 2000000,
        '- ' || replace(substr(text, 1, 60), ' ', chr(10) || '- ')
        FROM documents WHERE doc_id % 30 = 0
      UNION ALL SELECT doc_id + 3000000,
        substr(text, 1, 40) || '...' || chr(10) || substr(text, 41, 40) || '...'
        FROM documents WHERE doc_id % 40 = 0
      UNION ALL SELECT doc_id + 4000000, regexp_replace(text, '[a-z]', '7', 'g')
        FROM documents WHERE doc_id % 25 = 0
      UNION ALL SELECT doc_id + 5000000,
        repeat(substr(text, 1, 50) || chr(10), 7) || substr(text, 1, 50)
        FROM documents WHERE doc_id % 35 = 0
      UNION ALL SELECT doc_id + 6000000,
        repeat(substr(text, 1, 80) || chr(10) || chr(10), 3) || substr(text, 1, 80)
        FROM documents WHERE doc_id % 45 = 0
      UNION ALL SELECT doc_id + 7000000, repeat(substr(text, 1, 12) || ' ', 40)
        FROM documents WHERE doc_id % 50 = 0
    ), base AS (
      SELECT doc_id, text,
        split(text, chr(10)) AS lines,
        split(text, chr(10) || chr(10)) AS paras,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_words
      FROM seeded
    ), topg AS (
      SELECT doc_id, n, MAX(c * length(g)) AS cover FROM (
        SELECT doc_id, n, g, COUNT(*) AS c FROM (
          SELECT doc_id, ns.n AS n,
            unnest(list_transform(range(1, greatest(len(w) - ns.n + 2, 1)),
                   i -> array_to_string(list_slice(w, i, i + ns.n - 1), ' '))) AS g
          FROM base, (SELECT unnest([2, 3, 4]) AS n) ns
        ) GROUP BY doc_id, n, g
      ) WHERE c >= 2 GROUP BY doc_id, n
    ), dupg AS (
      -- 0-based start positions of n-grams occurring >= 2 times
      SELECT doc_id, n, i FROM (
        SELECT doc_id, n, i, g, COUNT(*) OVER (PARTITION BY doc_id, n, g) AS c
        FROM (
          SELECT doc_id, ns.n AS n,
            unnest(range(0, greatest(len(w) - ns.n + 1, 0))) AS i,
            unnest(list_transform(range(1, greatest(len(w) - ns.n + 2, 1)),
                   j -> array_to_string(list_slice(w, j, j + ns.n - 1), ' '))) AS g
          FROM base, (SELECT unnest([5, 6, 7, 8, 9, 10]) AS n) ns
        )
      ) WHERE c >= 2
    ), covtok AS (
      -- union of [i, i+n) token windows: token t covered once; the
      -- space before t counts when one window spans t-1 and t (off>0)
      SELECT doc_id, n, i + off AS t,
             MAX(CASE WHEN off > 0 THEN 1 ELSE 0 END) AS gapcov
      FROM dupg, (SELECT unnest(range(0, 10)) AS off) o
      WHERE off < n
      GROUP BY doc_id, n, i + off
    ), toklen AS (
      SELECT doc_id, unnest(range(0, len(w))) AS t,
             unnest(list_transform(w, x -> len(x))) AS tlen
      FROM base
    ), dupcov AS (
      SELECT c.doc_id, c.n, CAST(SUM(tl.tlen) + SUM(c.gapcov) AS BIGINT) AS cov
      FROM covtok c JOIN toklen tl ON c.doc_id = tl.doc_id AND c.t = tl.t
      GROUP BY c.doc_id, c.n
    ), feat AS (
      SELECT doc_id, n_words,
        ROUND(list_sum(list_transform(w, x -> len(x))) * 1.0
              / greatest(len(w), 1), 6) AS mean_word_len,
        ROUND(len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
              OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•')))
              * 1.0 / greatest(len(lines), 1), 6) AS bullet_line_ratio,
        ROUND(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
              OR ends_with(rtrim(l), '…')))
              * 1.0 / greatest(len(lines), 1), 6) AS ellipsis_line_ratio,
        ROUND(( (length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3.0
              + (length(text) - length(replace(text, '…', ''))) )
              / greatest(n_words, 1), 6) AS symbol_word_ratio,
        ROUND(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0
              / greatest(n_words, 1), 6) AS alpha_word_ratio,
        ROUND((len(lines) - len(list_distinct(lines))) * 1.0
              / greatest(len(lines), 1), 6) AS dup_line_frac,
        ROUND((len(paras) - len(list_distinct(paras))) * 1.0
              / greatest(len(paras), 1), 6) AS dup_para_frac,
        ROUND((list_sum(list_transform(lines, x -> len(x)))
              - list_sum(list_transform(list_distinct(lines), x -> len(x)))) * 1.0
              / greatest(length(text), 1), 6) AS dup_line_char_frac,
        ROUND((list_sum(list_transform(paras, x -> len(x)))
              - list_sum(list_transform(list_distinct(paras), x -> len(x)))) * 1.0
              / greatest(length(text), 1), 6) AS dup_para_char_frac,
        ROUND(COALESCE(t2.cover, 0) * 1.0 / greatest(length(text), 1), 6)
              AS top_2gram_char_frac,
        ROUND(COALESCE(t3.cover, 0) * 1.0 / greatest(length(text), 1), 6)
              AS top_3gram_char_frac,
        ROUND(COALESCE(t4.cover, 0) * 1.0 / greatest(length(text), 1), 6)
              AS top_4gram_char_frac,
        ROUND(COALESCE(c5.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_5gram_char_frac,
        ROUND(COALESCE(c6.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_6gram_char_frac,
        ROUND(COALESCE(c7.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_7gram_char_frac,
        ROUND(COALESCE(c8.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_8gram_char_frac,
        ROUND(COALESCE(c9.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_9gram_char_frac,
        ROUND(COALESCE(c10.cov, 0) * 1.0 / greatest(length(text), 1), 6)
              AS dup_10gram_char_frac
      FROM base
      LEFT JOIN (SELECT doc_id, cover FROM topg WHERE n = 2) t2 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cover FROM topg WHERE n = 3) t3 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cover FROM topg WHERE n = 4) t4 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 5) c5 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 6) c6 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 7) c7 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 8) c8 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 9) c9 USING (doc_id)
      LEFT JOIN (SELECT doc_id, cov FROM dupcov WHERE n = 10) c10 USING (doc_id)
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           bullet_line_ratio, ellipsis_line_ratio, symbol_word_ratio,
           alpha_word_ratio,
           (n_words < 50) AS too_few_words,
           (n_words > 100000) AS too_many_words,
           (mean_word_len < 3.0 OR mean_word_len > 10.0) AS word_len_out,
           (symbol_word_ratio > 0.1) AS symbol_heavy,
           (bullet_line_ratio > 0.9) AS bullet_heavy,
           (ellipsis_line_ratio > 0.3) AS ellipsis_heavy,
           (alpha_word_ratio < 0.8) AS low_alpha,
           NOT (n_words < 50 OR n_words > 100000 OR mean_word_len < 3.0
                OR mean_word_len > 10.0 OR symbol_word_ratio > 0.1
                OR bullet_line_ratio > 0.9 OR ellipsis_line_ratio > 0.3
                OR alpha_word_ratio < 0.8) AS gopher_pass,
           dup_line_frac, dup_para_frac, dup_line_char_frac,
           dup_para_char_frac, top_2gram_char_frac, top_3gram_char_frac,
           top_4gram_char_frac, dup_5gram_char_frac, dup_6gram_char_frac,
           dup_7gram_char_frac, dup_8gram_char_frac, dup_9gram_char_frac,
           dup_10gram_char_frac,
           (dup_line_frac > 0.30) AS dup_line_heavy,
           (dup_para_frac > 0.30) AS dup_para_heavy,
           (dup_line_char_frac > 0.20) AS dup_line_char_heavy,
           (dup_para_char_frac > 0.20) AS dup_para_char_heavy,
           (top_2gram_char_frac > 0.20) AS top_2gram_heavy,
           (top_3gram_char_frac > 0.18) AS top_3gram_heavy,
           (top_4gram_char_frac > 0.16) AS top_4gram_heavy,
           (dup_5gram_char_frac > 0.15) AS dup_5gram_heavy,
           (dup_6gram_char_frac > 0.14) AS dup_6gram_heavy,
           (dup_7gram_char_frac > 0.13) AS dup_7gram_heavy,
           (dup_8gram_char_frac > 0.12) AS dup_8gram_heavy,
           (dup_9gram_char_frac > 0.11) AS dup_9gram_heavy,
           (dup_10gram_char_frac > 0.10) AS dup_10gram_heavy,
           NOT (dup_line_frac > 0.30 OR dup_para_frac > 0.30
                OR dup_line_char_frac > 0.20 OR dup_para_char_frac > 0.20
                OR top_2gram_char_frac > 0.20 OR top_3gram_char_frac > 0.18
                OR top_4gram_char_frac > 0.16 OR dup_5gram_char_frac > 0.15
                OR dup_6gram_char_frac > 0.14 OR dup_7gram_char_frac > 0.13
                OR dup_8gram_char_frac > 0.12 OR dup_9gram_char_frac > 0.11
                OR dup_10gram_char_frac > 0.10) AS repetition_pass
    FROM feat ORDER BY doc_id
    """,
)
def q_gopher_quality(spark, sf_dir):
    """Gopher/MassiveText quality rule-pack (VERDICT r3 #5 content
    rules + VERDICT r4 #1 REPETITION rules): published thresholds over
    native columns — word count, mean word length, bullet/ellipsis
    line ratios, symbol-to-word ratio, alpha-word fraction (Rae et al.
    §A1.1 content section), PLUS duplicate-line/paragraph fractions (by
    occurrence and character mass) and top-{2,3,4}-gram character
    fractions (§A1.1 repetition section, Table A1 thresholds) — with
    AND dup-{5..10}-gram char-coverage fractions (the section's third
    family: union of repeated n-gram occurrences, overlap counted
    once) — with
    per-rule flags and the composite gopher_pass / repetition_pass.
    The corpus is clean word soup, so SEVEN pathological doc families
    are SEEDED from the real text (symbol flood, bullet explosion,
    ellipsis-terminated lines, digits-for-letters, repeated lines,
    repeated paragraphs, n-gram flood) — every rule fires on its
    family and the oracle recomputes all features + flags."""
    from .functions.repetition_arrow import with_repetition_arrow
    from .functions.text import (
        REPETITION_FEATURES,
        REPETITION_FLAGS,
        gopher_features,
        gopher_flags,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    seeded = (
        docs.unionByName(
            docs.filter(d % 20 == 0).select(
                (d + 1000000).alias("doc_id"),
                F.concat(F.lit("#" * 40 + " "), "text").alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 30 == 0).select(
                (d + 2000000).alias("doc_id"),
                F.concat(
                    F.lit("- "),
                    F.replace(F.substring("text", 1, 60), F.lit(" "), F.lit("\n- ")),
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 40 == 0).select(
                (d + 3000000).alias("doc_id"),
                F.concat(
                    F.substring("text", 1, 40), F.lit("...\n"),
                    F.substring("text", 41, 40), F.lit("..."),
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 25 == 0).select(
                (d + 4000000).alias("doc_id"),
                F.regexp_replace("text", "[a-z]", "7").alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 35 == 0).select(
                (d + 5000000).alias("doc_id"),
                F.concat(
                    F.repeat(F.concat(F.substring("text", 1, 50), F.lit("\n")), 7),
                    F.substring("text", 1, 50),
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 45 == 0).select(
                (d + 6000000).alias("doc_id"),
                F.concat(
                    F.repeat(F.concat(F.substring("text", 1, 80), F.lit("\n\n")), 3),
                    F.substring("text", 1, 80),
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 50 == 0).select(
                (d + 7000000).alias("doc_id"),
                F.repeat(F.concat(F.substring("text", 1, 12), F.lit(" ")), 40).alias(
                    "text"
                ),
            )
        )
    )
    # spread the per-row HOF work: the sf fixture is ONE small parquet
    # file (1 scan partition per union branch); at production scale the
    # scan already yields thousands of partitions and this is ~free
    seeded = seeded.repartition(spark.sparkContext.defaultParallelism)
    # token/line arrays materialized ONCE (r7): features and flags
    # together reference the token array six times and the line array
    # four times, and inline split expressions re-inline per reference
    from .functions.text import _tokens

    seeded = seeded.select(
        "doc_id", "text",
        _tokens(F.col("text")).alias("_gtoks"),
        F.split(F.col("text"), "\n").alias("_glines"),
    )
    feats = gopher_features(F.col("text"), F.col("_gtoks"), F.col("_glines"))
    return (
        # Arrow fast path — bit-exact vs functions/text.with_repetition
        # (the oracle's semantic reference), pinned corpus-wide by
        # tests/test_repetition_arrow.py; measured 4.5x on this query's
        # per-doc constant
        with_repetition_arrow(seeded)
        .select(
            "doc_id",
            *[
                feats[k].alias(k)
                for k in (
                    "n_words", "mean_word_len", "bullet_line_ratio",
                    "ellipsis_line_ratio", "symbol_word_ratio",
                    "alpha_word_ratio",
                )
            ],
            gopher_flags(
                F.col("text"), F.col("_gtoks"), F.col("_glines")
            ).alias("_fl"),
            *REPETITION_FEATURES,
            *REPETITION_FLAGS,
            "repetition_pass",
        )
        .select(
            "doc_id", "n_words", "mean_word_len", "bullet_line_ratio",
            "ellipsis_line_ratio", "symbol_word_ratio", "alpha_word_ratio",
            "_fl.*",
            *REPETITION_FEATURES,
            *REPETITION_FLAGS,
            "repetition_pass",
        )
        .orderBy("doc_id")
    )


@_q(
    "dedup_exact",
    """
    SELECT digest, n_dups, keeper FROM (
      SELECT md5(text) AS digest,
             CAST(COUNT(*) AS BIGINT) AS n_dups,
             MIN(doc_id) AS keeper
      FROM documents GROUP BY md5(text)
    ) ORDER BY n_dups DESC, keeper LIMIT 100
    """,
)
def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        exact_dup_groups(docs, "doc_id", F.col("text"))
        .orderBy(F.desc("n_dups"), "keeper")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Crawl-semantics operators on the events table (job/metrics analogs)
# ---------------------------------------------------------------------------

@_q(
    "batch_summary",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS total_requests,
           CAST(SUM(CASE WHEN value > 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS successful,
           CAST(SUM(CASE WHEN value > 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS failed,
           ROUND(AVG(CASE WHEN value > 1.0 THEN 1.0 ELSE 0.0 END) * 100.0, 4) AS success_rate
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_batch_summary(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return batch_summary(ev, ["event_type"], F.col("value") > 1.0).orderBy("event_type")


@_q(
    "exec_history_page",
    """
    SELECT event_id, ts, event_type FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 100
    """,
)
def q_exec_history_page(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    return history_page(ev, "ts", limit=100, tiebreak="event_id")


@_q(
    "priority_topk",
    """
    SELECT user_id, event_id, value, rnk FROM (
      SELECT user_id, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY value DESC, ts, event_id) AS rnk
      FROM events
    ) WHERE rnk <= 3
    """,
)
def q_priority_topk(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return per_key_topk(
        ev,
        ["user_id"],
        [F.desc("value"), F.asc("ts"), F.asc("event_id")],
        k=3,
    ).select("user_id", "event_id", "value", "rnk")


_HIST_SQL_COLS = ",\n".join(
    f"CAST(SUM(CASE WHEN value <= {b} THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS le_{str(b).replace('.', '_')}"
    for b in HISTOGRAM_BUCKETS
)


@_q(
    "response_histogram",
    f"SELECT {_HIST_SQL_COLS}, CAST(COUNT(*) AS BIGINT) AS le_inf FROM events",
)
def q_response_histogram(spark, sf_dir):
    return cumulative_histogram(_t(spark, sf_dir, "events"), F.col("value"))


@_q(
    "health_score",
    """
    SELECT shard, n, error_pct, avg_rt, health,
           CASE WHEN health >= 80 THEN 'healthy'
                WHEN health >= 60 THEN 'degraded'
                ELSE 'unhealthy' END AS band
    FROM (
      SELECT shard, n, ROUND(err_pct, 4) AS error_pct, ROUND(art, 4) AS avg_rt,
             ROUND(100.0
               - LEAST(30.0, 2.0 * GREATEST(0.0, err_pct - 5.0))
               - LEAST(25.0, 10.0 * GREATEST(0.0, art - 1.0)), 4) AS health
      FROM (
        SELECT user_id % 16 AS shard,
               CAST(COUNT(*) AS BIGINT) AS n,
               AVG(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) * 100.0 AS err_pct,
               AVG(value) AS art
        FROM events GROUP BY user_id % 16
      )
    ) ORDER BY shard
    """,
)
def q_health_score(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumn("shard", F.col("user_id") % 16)
    return health_score(
        ev, ["shard"], F.col("event_type") == "error", F.col("value")
    ).orderBy("shard")


@_q(
    "accept_dispatch",
    """
    WITH hdr AS (
      SELECT event_id,
             CASE event_type
               WHEN 'signup' THEN 'text/html,application/json'
               WHEN 'click' THEN 'application/pdf'
               WHEN 'error' THEN 'text/x-markdown;q=0.9'
               WHEN 'view' THEN '*/*'
               ELSE 'application/json' END AS accept
      FROM events
    )
    SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT CASE
        WHEN accept LIKE '%text/plain%' THEN 'text'
        WHEN accept LIKE '%text/html%' THEN 'html'
        WHEN accept LIKE '%text/markdown%' OR accept LIKE '%text/x-markdown%' THEN 'markdown'
        WHEN accept LIKE '%application/pdf%' THEN 'pdf'
        WHEN accept LIKE '%application/json%' THEN 'json'
        ELSE 'raw' END AS fmt
      FROM hdr
    ) GROUP BY fmt ORDER BY fmt
    """,
)
def q_accept_dispatch(spark, sf_dir):
    """P4 first-match-wins dispatch (content_processor.py:52-78)."""
    ev = _t(spark, sf_dir, "events")
    accept = (
        F.when(F.col("event_type") == "signup", "text/html,application/json")
        .when(F.col("event_type") == "click", "application/pdf")
        .when(F.col("event_type") == "error", "text/x-markdown;q=0.9")
        .when(F.col("event_type") == "view", "*/*")
        .otherwise("application/json")
    )
    fmt = (
        F.when(accept.contains("text/plain"), "text")
        .when(accept.contains("text/html"), "html")
        .when(
            accept.contains("text/markdown") | accept.contains("text/x-markdown"),
            "markdown",
        )
        .when(accept.contains("application/pdf"), "pdf")
        .when(accept.contains("application/json"), "json")
        .otherwise("raw")
    )
    return (
        ev.select(fmt.alias("fmt"))
        .groupBy("fmt")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("fmt")
    )


@_q(
    "url_validate",
    """
    WITH urls AS (
      SELECT doc_id,
             CASE doc_id % 6
               WHEN 0 THEN 'http://example' || doc_id || '.com/page'
               WHEN 1 THEN 'example' || doc_id || '.org/path'
               WHEN 2 THEN 'file:///etc/passwd'
               WHEN 3 THEN 'ftp://files' || doc_id || '.net/x'
               WHEN 4 THEN 'http://192.168.' || (doc_id % 256) || '.1/admin'
               ELSE 'http://bad|host' || doc_id || '.com/x' END AS url
      FROM documents
    ), norm AS (
      SELECT doc_id, url,
             CASE WHEN regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
                  THEN url ELSE 'http://' || url END AS u
      FROM urls
    ), parts AS (
      SELECT doc_id, url, u,
             lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
             regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1) AS authority
      FROM norm
    )
    SELECT doc_id, url,
           CASE
             WHEN scheme = 'file' THEN 'file_scheme'
             WHEN scheme NOT IN ('http', 'https') THEN 'non_http_scheme'
             WHEN authority = '' THEN 'no_hostname'
             WHEN NOT regexp_matches(authority, '^[a-zA-Z0-9._:-]+$') THEN 'bad_hostname'
             WHEN regexp_matches(authority, '^(127\\.|10\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.|192\\.168\\.|169\\.254\\.|0\\.|224\\.)')
                  OR lower(authority) IN ('localhost', 'localhost.localdomain', 'ip6-localhost')
                  THEN 'ssrf_blocked'
             ELSE '' END AS reason
    FROM parts
    """,
)
def q_url_validate(spark, sf_dir):
    """P1+P2 as native columns (regexp only — the SQL-expressible slice
    of validation.py:28-87,229-268; full semantics live in
    canonicalize_udf and are pinned by tests/test_urlnorm.py)."""
    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 6
    url = (
        F.when(m == 0, F.concat(F.lit("http://example"), "doc_id", F.lit(".com/page")))
        .when(m == 1, F.concat(F.lit("example"), "doc_id", F.lit(".org/path")))
        .when(m == 2, F.lit("file:///etc/passwd"))
        .when(m == 3, F.concat(F.lit("ftp://files"), "doc_id", F.lit(".net/x")))
        .when(
            m == 4,
            F.concat(F.lit("http://192.168."), F.col("doc_id") % 256, F.lit(".1/admin")),
        )
        .otherwise(F.concat(F.lit("http://bad|host"), "doc_id", F.lit(".com/x")))
    )
    df = docs.select("doc_id", url.alias("url"))
    u = F.when(
        F.col("url").rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), F.col("url")
    ).otherwise(F.concat(F.lit("http://"), "url"))
    df = df.withColumn("u", u)
    scheme = F.lower(F.regexp_extract("u", r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    authority = F.regexp_extract("u", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
    df = df.withColumn("scheme", scheme).withColumn("authority", authority)
    private_re = (
        r"^(127\.|10\.|172\.(1[6-9]|2[0-9]|3[01])\.|192\.168\.|169\.254\.|0\.|224\.)"
    )
    reason = (
        F.when(F.col("scheme") == "file", "file_scheme")
        .when(~F.col("scheme").isin("http", "https"), "non_http_scheme")
        .when(F.col("authority") == "", "no_hostname")
        .when(~F.col("authority").rlike(r"^[a-zA-Z0-9._:-]+$"), "bad_hostname")
        .when(
            F.col("authority").rlike(private_re)
            | F.lower("authority").isin(
                "localhost", "localhost.localdomain", "ip6-localhost"
            ),
            "ssrf_blocked",
        )
        .otherwise("")
    )
    return df.select("doc_id", "url", reason.alias("reason"))


@_q(
    "seen_antijoin",
    """
    SELECT d.doc_id, d.lang FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents s
      WHERE s.source IN ('src0', 'src1', 'src2') AND s.doc_id = d.doc_id
    )
    """,
)
def q_seen_antijoin(spark, sf_dir):
    """URL-seen dedup core: frontier ANTI seen (SURVEY §2.5)."""
    docs = _t(spark, sf_dir, "documents")
    seen = docs.filter(F.col("source").isin("src0", "src1", "src2")).select("doc_id")
    return docs.join(seen, "doc_id", "left_anti").select("doc_id", "lang")


@_q(
    "cuckoo_seen_filter",
    """
    SELECT 'http://' || source || '.example/doc/' || doc_id AS url,
           true AS maybe_seen
    FROM documents
    WHERE doc_id % 2 = 0 AND doc_id % 4 <> 0
    ORDER BY url
    """,
)
def q_cuckoo_seen_filter(spark, sf_dir):
    """Cuckoo URL-seen filter (north rule: "bloom/cuckoo"), exercised
    end-to-end through its DELETION capability: build over the even-doc
    urls, REMOVE the doc_id%4==0 members, probe every doc url, and
    return the verdicts for the KEPT members (doc_id%2==0 ∧ %4≠0). The
    cuckoo no-false-negative invariant makes every returned verdict
    provably true — a hard oracle over build+remove+probe (the same
    invariant-oracle pattern as simhash identical-text). FP rate on
    unseen urls and exact deletion behavior are pinned by
    tests/test_cuckoo.py (hash-dependent — not SQL-expressible)."""
    from .plans.cuckoo import (
        build_cuckoo,
        cuckoo_maybe_seen_cogroup,
        cuckoo_remove,
    )

    geo = dict(num_buckets=4, table_rows=1 << 12, slots_per_row=4)
    docs = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example/doc/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        "doc_id",
    )
    seen = docs.filter(F.col("doc_id") % 2 == 0).select("url")
    deletions = docs.filter(F.col("doc_id") % 4 == 0).select("url")
    filt = cuckoo_remove(build_cuckoo(seen, **geo), deletions, **geo)
    probed = cuckoo_maybe_seen_cogroup(docs, filt, **geo)
    return (
        probed.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") % 4 != 0))
        .select("url", "maybe_seen")
        .orderBy("url")
    )


@_q(
    "fetch_join",
    """
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment ORDER BY segment
    """,
)
def q_fetch_join(spark, sf_dir):
    """frontier⟕pages analog: fact⟕dim with the dim broadcast."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("segment")
    )


@_q(
    "wave_metrics",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_wave_metrics(spark, sf_dir):
    """Per-wave rollup shape (TPC-H Q1 analog): partial+final hash agg."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").cast("long").alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Extraction pipeline (non-SQL-expressible → rows-only driver check;
# byte-level correctness is pinned by tests/test_extract_parity.py)
# ---------------------------------------------------------------------------

@_q(
    "extract_lang_profile",
    """
    WITH chunks AS (
      SELECT doc_id, lang, coalesce(text, '') AS t,
             'Document ' || doc_id AS title
      FROM documents
    ), cs AS (
      SELECT doc_id, lang, title,
             CASE WHEN t = '' THEN ['']
                  ELSE list_transform(
                    generate_series(1, CAST(ceil(len(t) / 240.0) AS INT)),
                    i -> substring(t, (i - 1) * 240 + 1, 240))
             END AS chunks
      FROM chunks
    ), per AS (
      SELECT lang,
             trim(regexp_replace(
               title || ' ' || array_to_string(chunks, ' '),
               '\\s+', ' ', 'g')) AS etext,
             18 + len(title)
                + list_sum(list_transform(chunks, c -> len(trim(c)))) AS body_len
      FROM cs
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(len(etext)) AS BIGINT) AS total_text_chars,
           CAST(SUM(CASE WHEN body_len >= 100 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_needs_render
    FROM per GROUP BY lang ORDER BY lang
    """,
)
def q_extract_lang_profile(spark, sf_dir):
    """Flagship: pages → Arrow extract UDF → per-lang profile.

    ORACLED since r3: pages_from_documents wraps each document's text
    into <p> blocks of 240-char slices under an 'Document {id}' h1, and
    the extractor's plaintext rule for that shape is exactly
    trim(collapse_ws(title ⊕ ' ' ⊕ chunks joined by ' ')) — so DuckDB
    can rebuild the extracted text per page from documents.parquet
    alone, and D1 (needs_render) reduces to the body-text-length
    threshold (container is constant in the template, error class never
    present): body_len = len('nav bar')+len('footer text')+len(title)
    + Σ len(trim(chunk)) ≥ 100 (MIN_BODY_TEXT_THRESHOLD,
    htmlx/convert.py:39). Verified char-exact per page against
    extract_page on the full sf0.01 corpus before wiring. The oracle is
    intentionally coupled to the pagegen template — changing the
    template must update it (CLAUDE.md invariant 7)."""
    from .functions.udfs import extract_udf
    from .sources.pagegen import pages_from_documents

    # spread the extract UDF across cores (r7): the sf fixture is ONE
    # parquet file → one scan partition, so the whole corpus was parsed
    # by a single Python worker (measured 19 s single-task vs ~2 s
    # spread at sf1.0); at production scale the scan already yields
    # thousands of partitions and this is ~free
    pages = pages_from_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    ex = pages.withColumn(
        "ex", extract_udf("url", "html", F.lit("text/html"))
    )
    return (
        ex.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length("ex.text")).cast("long").alias("total_text_chars"),
            F.sum(F.col("ex.needs_render").cast("int")).cast("long").alias("n_needs_render"),
        )
        .orderBy("lang")
    )


@_q(
    "url_canonicalize",
    """
    WITH urls AS (
      SELECT doc_id,
             CASE doc_id % 5
               WHEN 0 THEN 'HTTP://Example' || doc_id || '.COM:80/a?b=2&a=1#frag'
               WHEN 1 THEN 'example' || doc_id || '.org/path/'
               WHEN 2 THEN 'https://site' || doc_id || '.net:443/x'
               WHEN 3 THEN 'file:///etc/passwd'
               ELSE 'http://10.0.0.' || (doc_id % 256) || '/x' END AS url
      FROM documents
    ), norm AS (
      SELECT doc_id, url,
             CASE WHEN regexp_matches(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://')
                  THEN url ELSE 'http://' || url END AS u
      FROM urls
    ), parts AS (
      SELECT doc_id, url, u,
             lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
             lower(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             regexp_extract(u, '^[^?#]*\\?([^#]*)', 1) AS query
      FROM norm
    ), hp AS (
      SELECT *,
             CASE WHEN contains(auth, ':')
                  THEN regexp_extract(auth, '^([^:]*)', 1) ELSE auth END AS hostp,
             CASE WHEN regexp_matches(auth, ':[0-9]+$')
                  THEN CAST(regexp_extract(auth, ':([0-9]+)$', 1) AS INT)
                  ELSE NULL END AS port
      FROM parts
    ), cls AS (
      SELECT *,
             CASE
               WHEN scheme = 'file' THEN 'file_scheme'
               WHEN scheme NOT IN ('http', 'https') THEN 'non_http_scheme'
               WHEN hostp = '' THEN 'no_hostname'
               WHEN NOT regexp_matches(hostp, '^[a-zA-Z0-9._-]+$') THEN 'bad_hostname'
               WHEN regexp_matches(hostp, '^[0-9.]+$')
                    AND regexp_matches(hostp, '^127\\.') THEN 'ssrf_loopback'
               WHEN regexp_matches(hostp, '^[0-9.]+$')
                    AND regexp_matches(hostp,
                        '^(10\\.|192\\.168\\.|172\\.(1[6-9]|2[0-9]|3[01])\\.)')
                    THEN 'ssrf_private'
               ELSE '' END AS reason
      FROM hp
    )
    SELECT doc_id, url,
           CASE WHEN reason <> '' THEN '' ELSE
             scheme || '://' || hostp ||
             CASE WHEN port IS NULL
                    OR (scheme = 'http' AND port = 80)
                    OR (scheme = 'https' AND port = 443)
                  THEN '' ELSE ':' || port END ||
             CASE WHEN path = '' THEN '/' ELSE path END ||
             CASE WHEN query = '' THEN ''
                  ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END
           END AS url_canonical,
           CASE WHEN reason <> '' THEN '' ELSE hostp END AS host,
           reason = '' AS valid,
           reason
    FROM cls
    """,
)
def q_url_canonicalize(spark, sf_dir):
    """P1 canonicalization through the full canonicalize_udf (lowercase
    scheme+host, strip default port, drop fragment, sort query params,
    collapse empty path — urlnorm.py:137-171), oracled by a DuckDB
    string-transform mirror covering the SQL-expressible slice these
    generated inputs exercise; the full python semantics (IPv6
    brackets, bad ports, every SSRF category) stay pinned by
    tests/test_urlnorm.py."""
    from .functions.udfs import canonicalize_udf

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 5
    raw = (
        F.when(m == 0, F.concat(F.lit("HTTP://Example"), "doc_id", F.lit(".COM:80/a?b=2&a=1#frag")))
        .when(m == 1, F.concat(F.lit("example"), "doc_id", F.lit(".org/path/")))
        .when(m == 2, F.concat(F.lit("https://site"), "doc_id", F.lit(".net:443/x")))
        .when(m == 3, F.lit("file:///etc/passwd"))
        .otherwise(F.concat(F.lit("http://10.0.0."), F.col("doc_id") % 256, F.lit("/x")))
    )
    df = docs.select("doc_id", raw.alias("url"))
    return df.withColumn("c", canonicalize_udf("url")).select(
        "doc_id", "url", "c.url_canonical", "c.host", "c.valid", "c.reason"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

# embeddings.parquet vector width at every SF (TESTDATA contract) —
# passed as a constant so query builders run no driver actions
EMB_DIM = 64

# Exact brute-force top-5 by cosine for every 100th vector — shared by
# embedding_knn (broadcast nested loop), embedding_knn_ivf
# (exhaustive-probe IVF) and embedding_knn_lsh (recall-saturated LSH):
# all three must produce exactly this.
_KNN_ORACLE = """
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qvec FROM embeddings
      WHERE vec_id % 100 = 0
    ), scored AS (
      SELECT q.query_id, e.vec_id AS cand_id,
             ROUND(
               list_sum(list_transform(list_zip(e.embedding, q.qvec),
                        x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(e.embedding,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(q.qvec,
                        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cosine
      FROM embeddings e, q WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, cand_id, cosine, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, cand_id) AS rnk
      FROM scored
    ) WHERE rnk <= 5
"""


@_q("embedding_knn", _KNN_ORACLE)
def q_embedding_knn(spark, sf_dir):
    """Brute-force exact ANN baseline (broadcast queries × candidate
    scan; native higher-order-function dot products)."""
    from .operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries_df, k=5)


@_q("embedding_knn_ivf", _KNN_ORACLE)
def q_embedding_knn_ivf(spark, sf_dir):
    """IVF top-k probing EVERY inverted list (nprobe == n_centroids):
    provably equal to brute force — the oracle proves the k-means
    assignment partitions the candidate set losslessly. The approximate
    configuration (nprobe < n_centroids, the actual scale path) is
    pinned by tests/test_similarity_text.py recall bounds."""
    from .operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(
        emb, queries_df, k=5, n_centroids=8, nprobe=8, iters=2
    )


@_q("embedding_knn_ivf2", _KNN_ORACLE)
def q_embedding_knn_ivf2(spark, sf_dir):
    """TWO-LEVEL IVF (coarse -> sub centroid tree, r5) probing every
    coarse cell and every list (wprobe = n_coarse, nprobe = all):
    provably equal to brute force — proves the tree assignment
    (cell·n_sub + sub) partitions the candidate set losslessly, same
    contract as embedding_knn_ivf. The tree's purpose is the
    list-count scale path (n_coarse + n_sub distances per vector
    instead of the flat k matmul — 2·√k at the √N lists a 10^9-vector
    corpus wants); the approximate configuration (wprobe < n_coarse)
    is pinned by tests/test_similarity_text.py recall bounds."""
    from .operators.similarity import ivf2_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf2_topk(
        emb, queries_df, k=5, n_coarse=4, n_sub=2, wprobe=4, nprobe=8,
        iters=2,
    )


@_q("embedding_knn_lsh", _KNN_ORACLE)
def q_embedding_knn_lsh(spark, sf_dir):
    """LSH-bucketed approximate variant (the 100 TB scale path), run in
    its ORACLE-VERIFIABLE configuration: few planes + many
    OR-amplification tables drive candidate recall to ~1
    (miss ≈ (1−p²)^L per true pair, p = 1−θ/π), so the LSH top-k equals
    the brute-force top-k and the exact-knn oracle is a hard check on
    the whole pipeline — bucketing, scoring, and ranking (same
    verification pattern as minhash_near_dups' single-row bands). The
    scale configuration flips the trade (more planes, fewer tables →
    smaller buckets, recall < 1) and is pinned by
    tests/test_similarity_text.py."""
    from .operators.similarity import lsh_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(
        emb, queries_df, dim=EMB_DIM, k=5, n_planes=2, n_tables=24
    )


# ---------------------------------------------------------------------------
# Near-dup dedup family — each emits a DuckDB-checkable invariant:
# exact text-level Jaccard (minhash/ngram) or exact-text equality
# (simhash); the hash-internal values stay pinned by pytest recomputes.
# ---------------------------------------------------------------------------

# Exact word-3-gram Jaccard ≥ 0.5 over all document pairs sharing a
# gram — mirrors shingles() in operators/dedup.py (lowercase, collapse
# whitespace, distinct k-grams, whole-text fallback below k words).
_JACCARD_ORACLE = """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, t, string_split(t, ' ') AS w FROM norm
    ), grams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' ')))
             ELSE [t] END AS gs
      FROM toks
    ), ex AS (
      SELECT doc_id, len(gs) AS n, unnest(gs) AS g FROM grams
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             COUNT(*) AS n_common,
             ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b
      FROM ex a JOIN ex b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(n_common * 1.0 / (n_a + n_b - n_common), 6) AS jaccard
    FROM pairs
    WHERE ROUND(n_common * 1.0 / (n_a + n_b - n_common), 6) >= 0.5
"""


@_q(
    "near_dup_components",
    f"""
    WITH RECURSIVE jp AS ({_JACCARD_ORACLE}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM jp
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM jp
    ),
    reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    )
    SELECT node, MIN(label) AS keeper FROM reach GROUP BY node ORDER BY node
    """,
)
def q_near_dup_components(spark, sf_dir):
    """Dedup DECISION stage: connected components over the exact-Jaccard
    near-dup pair graph — keeper = min doc_id reachable through edges
    (keep one doc per component, drop the rest). Spark: iterative
    min-label propagation (operators/dedup.connected_keepers); oracle:
    DuckDB recursive-CTE reachability over the same pair set — a hard
    check that the distributed propagation converges to true
    components, chains included (A~B~C without A~C)."""
    from .operators.dedup import connected_keepers, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", F.col("text"), k=3, threshold=0.5)
    return connected_keepers(pairs).orderBy("node")


@_q(
    "repeated_ngrams",
    """
    WITH norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, string_split(t, ' ') AS w FROM norm
    ), occ AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= 3 THEN
               list_transform(generate_series(1, len(w) - 2),
                              i -> array_to_string(w[i:i+2], ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS g
      FROM toks
    ), freq AS (
      SELECT g FROM (SELECT DISTINCT doc_id, g FROM occ)
      GROUP BY g HAVING COUNT(*) >= 2
    ), s AS (
      SELECT occ.doc_id,
             COUNT(*) AS n_occ,
             COUNT(DISTINCT occ.g) AS n_grams
      FROM occ JOIN freq ON occ.g = freq.g GROUP BY occ.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.n_occ, 0) AS BIGINT) AS n_rep_occurrences,
           CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_rep_grams
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
    """,
)
def q_repeated_ngrams(spark, sf_dir):
    """Span-level dedup primitive (C4/RefinedWeb-style): per document,
    occurrences + distinct count of word 3-grams shared with ≥2 other
    documents. Spark hashes grams to longs before the shuffle; the
    oracle recomputes over gram STRINGS — equality holds modulo 64-bit
    hash collisions (~(n_grams)²/2⁶⁴, vanishing at oracle scale), the
    same argument the minhash family's oracle rests on."""
    from .operators.dedup import repeated_ngram_stats

    docs = _t(spark, sf_dir, "documents")
    return repeated_ngram_stats(docs, "doc_id", F.col("text"), n=3, min_df=2)


@_q(
    "hll_distinct",
    """
    WITH urls AS (
      SELECT 'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) AS u
      FROM documents
      UNION ALL
      SELECT 'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) FROM documents
      UNION ALL
      SELECT 'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/'
             || CAST(doc_id AS VARCHAR) FROM documents WHERE doc_id % 2 = 0
    ), hashed AS (
      SELECT CAST('0x' || substr(md5(u), 1, 15) AS BIGINT) AS h FROM urls
    ), rho_t AS (
      SELECT CAST(h % 256 AS INT) AS register_id,
             CASE WHEN (h // 256) % 4294967296 = 0 THEN 33
                  ELSE CAST(log2(((h // 256) % 4294967296)
                                 & -((h // 256) % 4294967296)) AS INT) + 1
             END AS rho
      FROM hashed
    ), regs AS (
      SELECT r.register_id, CAST(COALESCE(mx.max_rho, 0) AS INT) AS max_rho
      FROM (SELECT unnest(generate_series(0, 255)) AS register_id) r
      LEFT JOIN (SELECT register_id, MAX(rho) AS max_rho
                 FROM rho_t GROUP BY register_id) mx
      USING (register_id)
    ), agg AS (
      SELECT SUM(CASE WHEN max_rho = 0 THEN CAST(8589934592 AS BIGINT)
                      ELSE CAST(1 AS BIGINT) << (33 - max_rho) END) AS harmonic_s,
             SUM(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END) AS n_zero_registers,
             string_agg(CAST(max_rho AS VARCHAR), ',' ORDER BY register_id)
               AS registers_csv
      FROM regs
    )
    SELECT registers_csv,
           CAST(harmonic_s AS BIGINT) AS harmonic_s,
           CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
           ROUND(CASE WHEN n_zero_registers > 0
                       AND 404351522913636.8 / harmonic_s <= 640.0
                      THEN 256.0 * ln(256.0 / n_zero_registers)
                      ELSE 404351522913636.8 / harmonic_s END, 4) AS est_distinct
    FROM agg
    """,
)
def q_hll_distinct(spark, sf_dir):
    """Deterministic HyperLogLog distinct-URL sketch with a FULL
    external oracle — registers, harmonic denominator, zero count and
    the bias-corrected estimate all recomputed by DuckDB (Spark's
    built-in approx_count_distinct can never be value-verified; this
    sketch hashes with the engine-portable md5_60bit and does all
    register math in exact integers). Input: documents-derived urls
    duplicated 2.5× — the sketch must see through multiplicity."""
    from .functions.sketch import hll_estimate, hll_registers, md5_60bit

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    u = F.concat(
        F.lit("http://h"), (F.col("doc_id") % 37).cast("string"),
        F.lit(".example/p/"), F.col("doc_id").cast("string"),
    ).alias("u")
    urls = (
        docs.select(u)
        .unionByName(docs.select(u))
        .unionByName(docs.filter(F.col("doc_id") % 2 == 0).select(u))
    )
    regs = hll_registers(urls, F.col("u"), m=256, hasher=md5_60bit)
    csv = regs.agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("register_id", "max_rho"))),
                lambda x: x["max_rho"].cast("string"),
            ),
            ",",
        ).alias("registers_csv")
    )
    return csv.crossJoin(hll_estimate(regs, m=256))


@_q(
    "link_pagerank",
    """
    WITH params AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM documents),
    ej AS (
      SELECT doc_id AS s,
             unnest(generate_series(0, CAST(doc_id % 3 AS INT))) AS j
      FROM documents
    ), edges AS (
      SELECT s, (s * 31 + j * 97 + 7) % (SELECT nn FROM params) AS d FROM ej
    ), deg AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS dg FROM edges GROUP BY s
    ), r0 AS (
      SELECT doc_id AS node, CAST(1000000000 AS BIGINT) // (SELECT nn FROM params) AS r
      FROM documents
    ), it1 AS (
      SELECT d.doc_id AS node,
             (15 * CAST(1000000000 AS BIGINT)) // (100 * (SELECT nn FROM params))
             + (85 * COALESCE(c.inn, 0)) // 100 AS r
      FROM documents d LEFT JOIN (
        SELECT e.d AS node, SUM(r0.r // deg.dg) AS inn
        FROM edges e JOIN r0 ON e.s = r0.node JOIN deg ON e.s = deg.s
        GROUP BY e.d
      ) c ON d.doc_id = c.node
    ), it2 AS (
      SELECT d.doc_id AS node,
             (15 * CAST(1000000000 AS BIGINT)) // (100 * (SELECT nn FROM params))
             + (85 * COALESCE(c.inn, 0)) // 100 AS r
      FROM documents d LEFT JOIN (
        SELECT e.d AS node, SUM(it1.r // deg.dg) AS inn
        FROM edges e JOIN it1 ON e.s = it1.node JOIN deg ON e.s = deg.s
        GROUP BY e.d
      ) c ON d.doc_id = c.node
    ), it3 AS (
      SELECT d.doc_id AS node,
             (15 * CAST(1000000000 AS BIGINT)) // (100 * (SELECT nn FROM params))
             + (85 * COALESCE(c.inn, 0)) // 100 AS r
      FROM documents d LEFT JOIN (
        SELECT e.d AS node, SUM(it2.r // deg.dg) AS inn
        FROM edges e JOIN it2 ON e.s = it2.node JOIN deg ON e.s = deg.s
        GROUP BY e.d
      ) c ON d.doc_id = c.node
    )
    SELECT node, CAST(r AS BIGINT) AS rank_micro FROM it3 ORDER BY node
    """,
)
def q_link_pagerank(spark, sf_dir):
    """Fixed-point PageRank (3 power iterations, damping 0.85) over a
    deterministic pseudo-random link graph seeded from doc_ids (1-3
    out-edges per doc). Integer micro-unit arithmetic makes the ranks
    BIT-EXACT under any partitioning, so the oracle unrolls the same
    three iterations in SQL and value-matches — an iterative
    DataFrame-loop operator with a hard external oracle (the
    connected_keepers per-round-checkpoint machinery keeps the loop's
    plan and cache O(1))."""
    from .operators.graph import pagerank_fixedpoint

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()
    edges = docs.select(
        F.col("doc_id").alias("src"),
        F.explode(
            F.sequence(F.lit(0), (F.col("doc_id") % 3).cast("int"))
        ).alias("j"),
    ).select(
        "src", ((F.col("src") * 31 + F.col("j") * 97 + 7) % n).alias("dst")
    )
    return (
        pagerank_fixedpoint(edges, iters=3, damping_pct=85)
        .select("node", "rank_micro")
        .orderBy("node")
    )


@_q(
    "crawl_reconcile",
    """
    WITH planned AS (
      SELECT doc_id, CAST(doc_id % 7 AS INT) AS priority
      FROM documents WHERE doc_id % 3 = 0
    ), fetched AS (
      SELECT doc_id, CAST(doc_id % 5 AS INT) AS attempts
      FROM documents WHERE doc_id % 4 = 0
    )
    SELECT COALESCE(p.doc_id, f.doc_id) AS doc_id,
           p.priority, f.attempts,
           CASE WHEN p.doc_id IS NULL THEN 'fetched_only'
                WHEN f.doc_id IS NULL THEN 'planned_only'
                ELSE 'both' END AS reconcile
    FROM planned p FULL OUTER JOIN fetched f ON p.doc_id = f.doc_id
    ORDER BY doc_id
    """,
)
def q_crawl_reconcile(spark, sf_dir):
    """Planned-vs-fetched reconciliation — the crawl-ops audit query —
    as a FULL OUTER join (the one join type the suite didn't exercise:
    inner/left/anti/semi/broadcast are covered elsewhere). Both sides
    shuffle on the key; at 10^10 URLs this is the same co-partitioned
    merge the seen set uses."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    planned = docs.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", (F.col("doc_id") % 7).cast("int").alias("priority")
    )
    fetched = docs.filter(F.col("doc_id") % 4 == 0).select(
        "doc_id", (F.col("doc_id") % 5).cast("int").alias("attempts")
    )
    p, f_ = planned.alias("p"), fetched.alias("f")
    return (
        p.join(f_, F.col("p.doc_id") == F.col("f.doc_id"), "full_outer")
        .select(
            F.coalesce("p.doc_id", "f.doc_id").alias("doc_id"),
            "priority", "attempts",
            F.when(F.col("p.doc_id").isNull(), "fetched_only")
            .when(F.col("f.doc_id").isNull(), "planned_only")
            .otherwise("both")
            .alias("reconcile"),
        )
        .orderBy("doc_id")
    )


@_q(
    "corpus_rollup",
    """
    SELECT source, lang,
           CAST(GROUPING(source, lang) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY CUBE (source, lang)
    """,
)
def q_corpus_rollup(spark, sf_dir):
    """Multi-dimensional corpus accounting via CUBE(source, lang) —
    every (source×lang), per-source, per-lang and grand-total rollup in
    ONE pass (Spark expands grouping sets map-side; one shuffle, not
    four queries — the way a 100 TB corpus dashboard should be fed).
    grouping_id disambiguates aggregated-NULL from data-NULL; both
    engines encode the same (source, lang) bit order."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.cube("source", "lang")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .select("source", "lang", "gid", "n_docs", "total_chars", "max_chars")
        .orderBy("gid", "source", "lang")
    )


@_q(
    "source_mix",
    r"""
    WITH keyed AS (
      SELECT doc_id, source,
             substr(md5(CAST(doc_id AS VARCHAR) || ':' || source || ':mix'), 1, 8)
               AS sample_key
      FROM documents
    )
    SELECT doc_id, source, sample_key FROM keyed
    WHERE (source = 'src0')
       OR (source = 'src1' AND sample_key < '80000000')
       OR (source = 'src2' AND sample_key < '40000000')
       OR (source NOT IN ('src0', 'src1', 'src2') AND sample_key < '20000000')
    ORDER BY doc_id
    """,
)
def q_source_mix(spark, sf_dir):
    """Deterministic data-mixing sampler: src0 keeps 100%, src1 50%,
    src2 25%, every other source 12.5% — decided by an md5 hash key so
    the mixture is reproducible and ANY engine can recompute
    membership (the oracle re-derives the kept set exactly, not just
    its size). Pure per-row native work: no shuffle, pushes into the
    scan."""
    from .operators.sampling import source_mix_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return source_mix_sample(
        docs, "doc_id", "source",
        rates={"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.125,
    ).select("doc_id", "source", "sample_key").orderBy("doc_id")


@_q(
    "decontaminate",
    r"""
    WITH norm AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ), eval_words AS (
      SELECT w[5:20] AS ew FROM norm WHERE doc_id % 100 = 0
    ), eval_grams AS (
      SELECT DISTINCT g FROM (
        SELECT unnest(CASE WHEN len(ew) >= 8 THEN
            list_transform(generate_series(1, len(ew) - 7),
                           i -> array_to_string(ew[i:i+7], ' '))
          ELSE CAST([] AS VARCHAR[]) END) AS g
        FROM eval_words
      )
    ), doc_grams AS (
      SELECT DISTINCT doc_id, g FROM (
        SELECT doc_id, unnest(CASE WHEN len(w) >= 8 THEN
            list_transform(generate_series(1, len(w) - 7),
                           i -> array_to_string(w[i:i+7], ' '))
          ELSE CAST([] AS VARCHAR[]) END) AS g
        FROM norm
      )
    ), hits AS (
      SELECT doc_id, COUNT(*) AS n
      FROM doc_grams JOIN eval_grams USING (g) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(hits.n, 0) AS BIGINT) AS n_shared_grams,
           COALESCE(hits.n, 0) > 0 AS contaminated
    FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
    ORDER BY d.doc_id
    """,
)
def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3/Llama-report recipe): flag
    training docs sharing ≥1 distinct word 8-gram with an eval set.
    The eval set is SEEDED as a 16-word slice (words 5..20) of every
    100th document — those source docs must flag contaminated; word
    soup makes organic 8-gram collisions essentially impossible. Spark
    joins on xxhash64 gram longs (eval side AQE-broadcast, corpus
    never shuffles); the oracle joins gram STRINGS — the usual
    collision argument."""
    from .operators.dedup import contamination_stats, words_of

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = docs.filter(F.col("doc_id") % 100 == 0).select(
        "doc_id",
        F.concat_ws(" ", F.slice(words_of(F.col("text")), 5, 16)).alias("etext"),
    )
    return contamination_stats(
        _spread(spark, docs), "doc_id", F.col("text"), eval_df, F.col("etext"), n=8
    ).orderBy("doc_id")


@_q(
    "drop_repeated_spans",
    """
    WITH seeded AS (
      SELECT doc_id,
        substr(text, 1, 80) || chr(10) ||
        CASE doc_id % 3 WHEN 0 THEN 'Subscribe to our newsletter for daily updates'
                        WHEN 1 THEN 'All rights reserved - copyright notice'
                        ELSE 'Click here to accept cookies and continue' END
        || chr(10) || substr(text, 81, 100) ||
        CASE WHEN doc_id % 50 = 0
             THEN chr(10) || 'Limited time offer act now' ELSE '' END AS text
      FROM documents
    ), lines AS (
      SELECT doc_id,
             generate_subscripts(split(text, chr(10)), 1) AS pos,
             unnest(split(text, chr(10))) AS line
      FROM seeded
    ), normed AS (
      SELECT doc_id, pos, line,
             lower(trim(regexp_replace(line, '\\s+', ' ', 'g'))) AS norm
      FROM lines
    ), freq AS (
      SELECT norm FROM (
        SELECT norm, COUNT(DISTINCT doc_id) AS df FROM normed
        WHERE norm <> '' AND len(string_split(norm, ' ')) >= 3
        GROUP BY norm
      ) WHERE df >= 2
    ), flagged AS (
      SELECT n.doc_id, n.pos, n.line,
             (n.norm <> '' AND len(string_split(n.norm, ' ')) >= 3
              AND f.norm IS NOT NULL) AS dropme
      FROM normed n LEFT JOIN freq f ON n.norm = f.norm
    )
    SELECT doc_id,
      COALESCE(string_agg(CASE WHEN NOT dropme THEN line END,
                          chr(10) ORDER BY pos), '') AS cleaned_text,
      CAST(SUM(CASE WHEN NOT dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_lines,
      CAST(SUM(CASE WHEN dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_lines
    FROM flagged GROUP BY doc_id ORDER BY doc_id
    """,
)
def q_drop_repeated_spans(spark, sf_dir):
    """Span-REMOVAL policy (C4/RefinedWeb line-dedup action on top of
    the repeated-span stats — VERDICT r3 #3). Documents are single-line
    word soup, so the query SEEDS a 3-4-line variant per doc: two
    substr slices of the real text around an injected boilerplate line
    (3 variants by doc_id%3, each in ~167 docs) plus a rarer planted
    line in every 50th doc. The operator must drop exactly the planted
    boilerplate (doc-frequency ≥ 2 over normalized lines, ≥ 3 words)
    and keep the substr lines; the oracle recomputes the full cleaned
    text CHAR-EXACT per doc. Spark groups line frequencies by
    xxhash64(norm); the oracle uses norm strings — same hash-collision
    argument as the gram family."""
    from .operators.dedup import drop_repeated_spans

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bp = (
        F.when(F.col("doc_id") % 3 == 0,
               F.lit("Subscribe to our newsletter for daily updates"))
        .when(F.col("doc_id") % 3 == 1,
              F.lit("All rights reserved - copyright notice"))
        .otherwise(F.lit("Click here to accept cookies and continue"))
    )
    text2 = F.concat(
        F.substring("text", 1, 80), F.lit("\n"), bp, F.lit("\n"),
        F.substring("text", 81, 100),
        F.when(F.col("doc_id") % 50 == 0,
               F.lit("\nLimited time offer act now")).otherwise(F.lit("")),
    )
    seeded = _spread(spark, docs.select("doc_id", text2.alias("text")))
    return drop_repeated_spans(
        seeded, "doc_id", F.col("text"), min_df=2, min_words=3
    ).orderBy("doc_id")


def _webtext_seeded_corpus(spark, sf_dir):
    """(docs, multiline, corpus) for the webtext pipeline family —
    the multiline boilerplate injection plus the five pathological
    seeded branches (verbatim copies, symbol-heavy, bullet-soup,
    digits-for-letters, repeated-line). Kept in LOCKSTEP with
    _WEBTEXT_CORE_SQL's corpus CTE (CLAUDE.md invariant 8)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    bp = (
        F.when(d % 3 == 0, F.lit("Subscribe to our newsletter for daily updates"))
        .when(d % 3 == 1, F.lit("All rights reserved - copyright notice"))
        .otherwise(F.lit("Click here to accept cookies and continue"))
    )
    multiline = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80), F.lit("\n"), bp, F.lit("\n"),
            F.substring("text", 81, 100),
        ).alias("text"),
    )
    corpus = (
        multiline
        .unionByName(
            multiline.filter(d % 25 == 0)
            .select((d + 5000000).alias("doc_id"), "text")
        )
        .unionByName(
            docs.filter(d % 20 == 0).select(
                (d + 1000000).alias("doc_id"),
                F.concat(F.lit("#" * 40 + " "), "text").alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 30 == 0).select(
                (d + 2000000).alias("doc_id"),
                F.concat(
                    F.lit("- "),
                    F.replace(F.substring("text", 1, 60), F.lit(" "), F.lit("\n- ")),
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 25 == 0).select(
                (d + 4000000).alias("doc_id"),
                F.regexp_replace("text", "[a-z]", "7").alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 35 == 0).select(
                (d + 6000000).alias("doc_id"),
                F.concat(
                    F.repeat(F.concat(F.substring("text", 1, 50), F.lit("\n")), 7),
                    F.substring("text", 1, 50),
                ).alias("text"),
            )
        )
    )
    return docs, multiline, corpus


def _webtext_gate(spark, corpus):
    """Gopher gate stage shared by the webtext pipeline family: content
    rules plus the three length-robust repetition rules (see
    q_webtext_pipeline's docstring for why the length gate and the
    top-3/4-gram rules are deliberately not applied here)."""
    from .functions.repetition_arrow import with_repetition_arrow
    from .functions.text import _tokens, gopher_flags

    # spread the per-row HOF gate work across cores (single-file toy
    # fixture -> one scan partition per union branch; free at scale)
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
    # token/line arrays materialized once for the flag HOFs (r7 — the
    # shingles_of_words inline-reuse rule; same expressions)
    corpus = corpus.select(
        "doc_id", "text",
        _tokens(F.col("text")).alias("_gtoks"),
        F.split(F.col("text"), "\n").alias("_glines"),
    )
    fl = gopher_flags(F.col("text"), F.col("_gtoks"), F.col("_glines"))
    return (
        # Arrow fast path, bit-exact vs text.with_repetition (pinned by
        # tests/test_repetition_arrow.py) — the oracle SQL is unchanged
        with_repetition_arrow(
            corpus.withColumn("_fl", fl),
            features=["dup_line_frac", "dup_para_frac", "top_2gram_char_frac"],
        )
        .filter(
            ~F.col("_fl.word_len_out") & ~F.col("_fl.symbol_heavy")
            & ~F.col("_fl.bullet_heavy") & ~F.col("_fl.ellipsis_heavy")
            & ~F.col("_fl.low_alpha")
            & ~F.col("dup_line_heavy") & ~F.col("dup_para_heavy")
            & ~F.col("top_2gram_heavy")
        )
        .select("doc_id", "text")
    )


def _webtext_survivors(spark, gated):
    """drop_repeated_spans + exact dedup on cleaned text → one row per
    distinct cleaned_text with n_tokens > 0 (the `survivors` CTE of
    _WEBTEXT_CORE_SQL). Returns (survivors_df, ckpt_ids): the gate is
    materialized once via tracked checkpoint and FREED here; the
    survivors frame is checkpoint-materialized and its ids returned so
    the caller can free it after its own result materializes."""
    from .operators.dedup import _ckpt_tracked, _drop_ckpt, drop_repeated_spans

    gated, gate_ids = _ckpt_tracked(gated)
    cleaned = drop_repeated_spans(
        gated, "doc_id", F.col("text"), min_df=3, min_words=3
    )
    collapsed = F.trim(F.regexp_replace("cleaned_text", r"\s+", " "))
    survivors = (
        cleaned.groupBy("cleaned_text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count(F.lit(1)).cast("long").alias("n_exact_dups"),
            F.min("n_dropped_lines").alias("n_dropped_lines"),
        )
        .select(
            "doc_id", "cleaned_text", "n_exact_dups", "n_dropped_lines",
            # collapse-first count (NOT token_count): cleaned text can
            # END with '\n' (last kept line empty) and Spark's trim()
            # strips only spaces, so split('\s+') would keep a trailing
            # empty token — collapse whitespace first, like the oracle
            F.when(collapsed == "", F.lit(0))
            .otherwise(F.size(F.split(collapsed, " ")))
            .cast("long")
            .alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)  # drop fully-scrubbed docs
    )
    survivors, surv_ids = _ckpt_tracked(survivors)
    _drop_ckpt(gated, gate_ids)  # free the gate blocks immediately
    return survivors, surv_ids


# Shared SQL core for the webtext pipeline family: seeded corpus →
# Gopher gate (content + length-robust repetition rules) →
# drop_repeated_spans → exact dedup on cleaned text, ending in a
# `survivors` CTE. `{extra_corpus}` lets the fuzzy variant seed
# additional near-verbatim families; the base pipeline replaces it
# with ''. WITH RECURSIVE is inert for the base tail and required by
# the fuzzy tail's reachability CTE.
_WEBTEXT_CORE_SQL = r"""
    WITH RECURSIVE multiline AS (
      SELECT doc_id,
        substr(text, 1, 80) || chr(10) ||
        CASE doc_id % 3 WHEN 0 THEN 'Subscribe to our newsletter for daily updates'
                        WHEN 1 THEN 'All rights reserved - copyright notice'
                        ELSE 'Click here to accept cookies and continue' END
        || chr(10) || substr(text, 81, 100) AS text
      FROM documents
    ), corpus AS (
      SELECT doc_id, text FROM multiline
      UNION ALL SELECT doc_id + 5000000, text FROM multiline WHERE doc_id % 25 = 0
      UNION ALL SELECT doc_id + 1000000, repeat('#', 40) || ' ' || text
        FROM documents WHERE doc_id % 20 = 0
      UNION ALL SELECT doc_id + 2000000,
        '- ' || replace(substr(text, 1, 60), ' ', chr(10) || '- ')
        FROM documents WHERE doc_id % 30 = 0
      UNION ALL SELECT doc_id + 4000000, regexp_replace(text, '[a-z]', '7', 'g')
        FROM documents WHERE doc_id % 25 = 0
      UNION ALL SELECT doc_id + 6000000,
        repeat(substr(text, 1, 50) || chr(10), 7) || substr(text, 1, 50)
        FROM documents WHERE doc_id % 35 = 0{extra_corpus}
    ), feat AS (
      SELECT doc_id, text,
        split(text, chr(10)) AS lines,
        split(text, chr(10) || chr(10)) AS paras,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
        CASE WHEN trim(text) = '' THEN 0
             ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_words
      FROM corpus
    ), top2 AS (
      SELECT doc_id, MAX(c * length(g)) AS cover FROM (
        SELECT doc_id, g, COUNT(*) AS c FROM (
          SELECT doc_id,
            unnest(list_transform(range(1, greatest(len(w) - 2 + 2, 1)),
                   i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS g
          FROM feat
        ) GROUP BY doc_id, g
      ) WHERE c >= 2 GROUP BY doc_id
    ), gated AS (
      SELECT doc_id, text FROM feat
      LEFT JOIN top2 USING (doc_id)
      WHERE NOT (
        ROUND((len(lines) - len(list_distinct(lines))) * 1.0
              / greatest(len(lines), 1), 6) > 0.30
        OR ROUND((len(paras) - len(list_distinct(paras))) * 1.0
              / greatest(len(paras), 1), 6) > 0.30
        OR ROUND(COALESCE(top2.cover, 0) * 1.0
              / greatest(length(text), 1), 6) > 0.20
      ) AND NOT (
        ROUND(list_sum(list_transform(w, x -> len(x))) * 1.0
              / greatest(len(w), 1), 6) < 3.0
        OR ROUND(list_sum(list_transform(w, x -> len(x))) * 1.0
              / greatest(len(w), 1), 6) > 10.0
        OR ROUND(( (length(text) - length(replace(text, '#', '')))
              + (length(text) - length(replace(text, '...', ''))) / 3.0
              + (length(text) - length(replace(text, '…', ''))) )
              / greatest(n_words, 1), 6) > 0.1
        OR ROUND(len(list_filter(lines, l -> starts_with(ltrim(l), '- ')
              OR starts_with(ltrim(l), '* ') OR starts_with(ltrim(l), '•')))
              * 1.0 / greatest(len(lines), 1), 6) > 0.9
        OR ROUND(len(list_filter(lines, l -> ends_with(rtrim(l), '...')
              OR ends_with(rtrim(l), '…')))
              * 1.0 / greatest(len(lines), 1), 6) > 0.3
        OR ROUND(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) * 1.0
              / greatest(n_words, 1), 6) < 0.8
      )
    ), lines2 AS (
      SELECT doc_id,
             generate_subscripts(split(text, chr(10)), 1) AS pos,
             unnest(split(text, chr(10))) AS line
      FROM gated
    ), normed AS (
      SELECT doc_id, pos, line,
             lower(trim(regexp_replace(line, '\s+', ' ', 'g'))) AS norm
      FROM lines2
    ), freq AS (
      SELECT norm FROM (
        SELECT norm, COUNT(DISTINCT doc_id) AS df FROM normed
        WHERE norm <> '' AND len(string_split(norm, ' ')) >= 3
        GROUP BY norm
      ) WHERE df >= 3
    ), flagged AS (
      SELECT n.doc_id, n.pos, n.line,
             (n.norm <> '' AND len(string_split(n.norm, ' ')) >= 3
              AND f.norm IS NOT NULL) AS dropme
      FROM normed n LEFT JOIN freq f ON n.norm = f.norm
    ), cleaned AS (
      SELECT doc_id,
        COALESCE(string_agg(CASE WHEN NOT dropme THEN line END,
                            chr(10) ORDER BY pos), '') AS cleaned_text,
        CAST(SUM(CASE WHEN dropme THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_lines
      FROM flagged GROUP BY doc_id
    ), survivors AS (
      SELECT * FROM (
        SELECT MIN(doc_id) AS doc_id,
               cleaned_text,
               CAST(COUNT(*) AS BIGINT) AS n_exact_dups,
               MIN(n_dropped_lines) AS n_dropped_lines,
               CAST(CASE WHEN trim(cleaned_text) = '' THEN 0
                    ELSE len(string_split(trim(regexp_replace(cleaned_text,
                         '\s+', ' ', 'g')), ' ')) END AS BIGINT) AS n_tokens
        FROM cleaned GROUP BY cleaned_text
      ) WHERE n_tokens > 0
    )
"""


@_q(
    "webtext_pipeline",
    _WEBTEXT_CORE_SQL.replace("{extra_corpus}", "")
    + """
    SELECT doc_id, cleaned_text, n_exact_dups, n_dropped_lines, n_tokens
    FROM survivors ORDER BY doc_id
    """,
)
def q_webtext_pipeline(spark, sf_dir):
    """END-TO-END training-data pipeline composition — the round-4
    operators chained the way a real corpus run chains them:
    (1) Gopher gate — content rules (word-length band, symbol/bullet/
    ellipsis ratios, alpha fraction; the length gate is deliberately
    not applied: the synthetic docs are all short) PLUS the r5
    repetition rules (duplicate-line/paragraph fraction and top-2-gram
    character fraction; the top-3/4-gram rules are skipped for the
    same shortness reason — a single repeated 4-gram trips them on a
    ~50-word doc) — removing the seeded pathological families;
    (2) drop_repeated_spans over the
    survivors (boilerplate line removal, doc-freq computed POST-gate);
    (3) exact dedup on the CLEANED text (boilerplate removal first
    turns near-identical docs identical — the order matters and the
    seeded +5M verbatim copies prove it: they merge into their
    originals, n_exact_dups=2); final token count per survivor. One
    oracle recomputes the whole chain char-exact. The gate is
    MATERIALIZED once (tracked checkpoint inside _webtext_survivors):
    drop_repeated_spans consumes it in two subtrees and the 5-way
    union under HOF-heavy gopher features would evaluate twice (plan
    showed 20 parquet scans)."""
    _docs, _multiline, corpus = _webtext_seeded_corpus(spark, sf_dir)
    gated = _webtext_gate(spark, corpus)
    survivors, surv_ids = _webtext_survivors(spark, gated)
    # small survivor table — TRACKED so a long-lived caller can free it
    # via operators.dedup.release_result once consumed (ADVICE r4);
    # already checkpoint-materialized, so orderBy is plan-only on top
    out = survivors.orderBy("doc_id")
    out._ckpt_ids = surv_ids
    return out


# Near-verbatim seeded families for the fuzzy pipeline: every 15th
# multiline doc re-unioned with two words appended INLINE to its last
# line (and a second variant on every 45th) — appended inline so the
# extra words survive span removal (a standalone appended LINE would
# have doc-frequency ≥ 3 and be dropped, collapsing the variant back
# into an exact dup). After cleaning, variant vs source differ by two
# trailing words: 3-gram Jaccard ≈ (n-2)/n ≥ 0.8 on ~15-word docs —
# near-verbatim, NOT verbatim, so only the fuzzy stage can merge them.
_FUZZY_EXTRA_CORPUS_SQL = """
      UNION ALL SELECT doc_id + 7000000, text || ' revised edition'
        FROM multiline WHERE doc_id % 15 = 0
      UNION ALL SELECT doc_id + 8000000, text || ' second printing'
        FROM multiline WHERE doc_id % 45 = 0"""

_FUZZY_KEEPERS_SQL = r"""
    , snorm AS (
      SELECT doc_id, trim(regexp_replace(lower(cleaned_text), '\s+', ' ', 'g')) AS t
      FROM survivors
    ), stoks AS (
      SELECT doc_id, t, string_split(t, ' ') AS w FROM snorm
    ), sgrams AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3 THEN
               list_distinct(list_transform(generate_series(1, len(w) - 2),
                             i -> array_to_string(w[i:i+2], ' ')))
             ELSE [t] END AS gs
      FROM stoks
    ), sex AS (
      SELECT doc_id, len(gs) AS n, unnest(gs) AS g FROM sgrams
    ), jp AS (
      SELECT id_a, id_b FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS n_common,
               ANY_VALUE(a.n) AS n_a, ANY_VALUE(b.n) AS n_b
        FROM sex a JOIN sex b ON a.g = b.g AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      ) WHERE ROUND(n_common * 1.0 / (n_a + n_b - n_common), 6) >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM jp
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM jp
    ), reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ), comp AS (
      SELECT node, MIN(label) AS keeper FROM reach GROUP BY node
    ), merged AS (
      SELECT COALESCE(c.keeper, s.doc_id) AS keeper, s.doc_id, s.cleaned_text,
             s.n_exact_dups, s.n_dropped_lines, s.n_tokens
      FROM survivors s LEFT JOIN comp c ON s.doc_id = c.node
    ), fkeep AS (
      SELECT keeper AS doc_id,
             min_by(cleaned_text, doc_id) AS cleaned_text,
             CAST(COUNT(*) AS BIGINT) AS n_fuzzy_variants,
             CAST(SUM(n_exact_dups) AS BIGINT) AS n_docs_total,
             min_by(n_dropped_lines, doc_id) AS n_dropped_lines,
             min_by(n_tokens, doc_id) AS n_tokens
      FROM merged GROUP BY keeper
    )"""

_FUZZY_TAIL_SQL = _FUZZY_KEEPERS_SQL + """
    SELECT doc_id, cleaned_text, n_fuzzy_variants, n_docs_total,
           n_dropped_lines, n_tokens
    FROM fkeep ORDER BY doc_id
    """


def _materialize(sql: str, *ctes: str) -> str:
    """Mark the named CTE DEFINITIONS ``AS MATERIALIZED`` (first
    occurrence = the definition; references don't match the pattern).
    DuckDB INLINES multiply-referenced CTEs, so a pipeline CTE chain
    referenced k times re-evaluates k times — measured 448 s → 1.3 s on
    the webtext_to_shards oracle. Semantically a no-op."""
    for cte in ctes:
        sql = sql.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return sql


@_q(
    "webtext_pipeline_fuzzy",
    _materialize(
        _WEBTEXT_CORE_SQL.replace("{extra_corpus}", _FUZZY_EXTRA_CORPUS_SQL)
        + _FUZZY_TAIL_SQL,
        "survivors", "fkeep",
    ),
)
def q_webtext_pipeline_fuzzy(spark, sf_dir):
    """The flagship pipeline with the FUZZY doc-level dedup stage the
    public webtext recipes (RefinedWeb §3, Gopher A1.2, FineWeb) run
    after exact dedup — VERDICT r5 #1: gate → span removal → exact
    dedup → MinHash-LSH candidates verified by exact shingle Jaccard
    (minhash_verified_pairs) → connected components
    (connected_keepers) → keep one doc per component. The corpus adds
    seeded NEAR-verbatim families (two words appended inline) that
    exact dedup cannot merge; with single-row bands (32/32) LSH recall
    at J ≥ 0.5 is 1−(1−J)^32 ≥ 1−2.4e-10, so the output equals an
    exact all-pairs recompute and the DuckDB oracle re-runs the WHOLE
    chain — gate, cleaning, exact dedup, Jaccard pairs, recursive-CTE
    reachability — char-exact per keeper. Per component: keeper = min
    doc_id, n_fuzzy_variants = exact-survivors merged, n_docs_total =
    raw docs absorbed (exact + fuzzy). Scale shape: the fuzzy stage
    runs on exact-dedup SURVIVORS only (already checkpoint-
    materialized, orders of magnitude smaller than the corpus at
    100 TB), candidates are LSH-bucketed (never all-pairs), and
    components converge in O(log diameter) pointer-jumping rounds."""
    keepers = _fuzzy_keepers(spark, sf_dir)
    out = keepers.orderBy("doc_id")
    out._ckpt_ids = keepers._ckpt_ids
    return out


def _fuzzy_keepers(spark, sf_dir):
    """Shared fuzzy-dedup keeper stage (q_webtext_pipeline_fuzzy body):
    checkpoint-materialized keeper table with ``_ckpt_ids`` attached —
    the full pipeline (q_webtext_pipeline_full) scores it further."""
    from .operators.dedup import (
        _ckpt_tracked,
        _drop_ckpt,
        connected_keepers,
        minhash_verified_pairs,
    )

    _docs, multiline, corpus = _webtext_seeded_corpus(spark, sf_dir)
    d = F.col("doc_id")
    corpus = corpus.unionByName(
        multiline.filter(d % 15 == 0).select(
            (d + 7000000).alias("doc_id"),
            F.concat("text", F.lit(" revised edition")).alias("text"),
        )
    ).unionByName(
        multiline.filter(d % 45 == 0).select(
            (d + 8000000).alias("doc_id"),
            F.concat("text", F.lit(" second printing")).alias("text"),
        )
    )
    gated = _webtext_gate(spark, corpus)
    survivors, surv_ids = _webtext_survivors(spark, gated)
    pairs = minhash_verified_pairs(
        survivors, "doc_id", F.col("cleaned_text"),
        num_hashes=32, bands=32, shingle_k=3, threshold=0.5,
    )
    comp = connected_keepers(pairs)
    merged = survivors.join(comp, survivors["doc_id"] == comp["node"], "left").select(
        F.coalesce("keeper", survivors["doc_id"]).alias("keeper"),
        survivors["doc_id"].alias("sdoc_id"),
        "cleaned_text", "n_exact_dups", "n_dropped_lines", "n_tokens",
    )
    out = (
        merged.groupBy("keeper")
        .agg(
            F.min_by("cleaned_text", "sdoc_id").alias("cleaned_text"),
            F.count(F.lit(1)).cast("long").alias("n_fuzzy_variants"),
            F.sum("n_exact_dups").cast("long").alias("n_docs_total"),
            F.min_by("n_dropped_lines", "sdoc_id").alias("n_dropped_lines"),
            F.min_by("n_tokens", "sdoc_id").alias("n_tokens"),
        )
        .select(
            F.col("keeper").alias("doc_id"), "cleaned_text",
            "n_fuzzy_variants", "n_docs_total", "n_dropped_lines", "n_tokens",
        )
    )
    out, out_ids = _ckpt_tracked(out)
    out._ckpt_ids = out_ids
    _drop_ckpt(survivors, surv_ids)
    return out


def _full_scoring_ctes() -> str:
    """The LM + classifier scoring CTE chain over the fuzzy keeper set
    (ends at ``kscored``) — shared by the webtext_pipeline_full oracle
    and the webtext_to_shards oracle, generated from the SAME cached
    model dicts the Spark path broadcasts."""
    from .functions.classifier import classifier_sql_ctes, default_classifier
    from .functions.lm import default_lm, lm_sql_ctes

    mlm = default_lm()
    mc = default_classifier()
    B, bias = mc["n_buckets"], mc["bias_micro"]
    return rf"""
    , {lm_sql_ctes(mlm)},
    {classifier_sql_ctes(mc)},
    knorm AS (
      SELECT doc_id,
             trim(regexp_replace(lower(cleaned_text), '\s+', ' ', 'g')) AS t
      FROM fkeep
    ),
    kw AS (SELECT doc_id, string_split(t, ' ') AS ws FROM knorm WHERE t <> ''),
    kbg AS (
      SELECT doc_id, list_extract(ws, g) AS a, list_extract(ws, g + 1) AS b
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS g FROM kw)
    ),
    ksc AS (
      SELECT doc_id, COALESCE(p.lp_ab, c.lp_a, {mlm["oov_lp"]}) AS lp
      FROM kbg LEFT JOIN lm_pair p ON kbg.a = p.a AND kbg.b = p.b
               LEFT JOIN lm_ctx c ON kbg.a = c.a
    ),
    kagg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(lp) AS BIGINT) AS nll_micro
      FROM ksc GROUP BY doc_id
    ),
    kuni AS (SELECT doc_id, unnest(ws) AS g FROM kw),
    kbgg AS (
      SELECT doc_id, list_extract(ws, i) || ' ' || list_extract(ws, i + 1) AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM kw)
    ),
    kgrams AS (SELECT * FROM kuni UNION ALL SELECT * FROM kbgg),
    kcsc AS (
      SELECT doc_id, COALESCE(w, 0) AS w
      FROM (SELECT doc_id,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % {B} AS bucket
            FROM kgrams)
      LEFT JOIN clf_w USING (bucket)
    ),
    kcagg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(w) AS BIGINT) AS score_micro
      FROM kcsc GROUP BY doc_id
    ),
    kscored AS (
      SELECT f.doc_id, f.n_fuzzy_variants, f.n_docs_total, f.n_tokens,
             CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 'empty'
                  WHEN nll_micro <= {mlm["th_head"]} * n_bigrams THEN 'head'
                  WHEN nll_micro <= {mlm["th_tail"]} * n_bigrams THEN 'middle'
                  ELSE 'tail'
             END AS ppl_bucket,
             CASE WHEN COALESCE(n_grams, 0) = 0 THEN 'empty'
                  WHEN score_micro + {bias} * n_grams >= 0 THEN 'keep'
                  ELSE 'drop'
             END AS quality_label
      FROM fkeep f LEFT JOIN kagg USING (doc_id) LEFT JOIN kcagg USING (doc_id)
    )
    """


def _webtext_full_oracle_sql() -> str:
    """Oracle for webtext_pipeline_full: the ENTIRE public-recipe
    stack recomputed relationally — seeded corpus → Gopher gate → span
    removal → exact dedup → fuzzy MinHash dedup (recursive-CTE
    components) → CCNet perplexity buckets → DCLM classifier keep/drop
    — with the LM and classifier model tables generated from the SAME
    cached dicts the Spark path broadcasts (zero cross-engine float
    math; functions/lm.py + functions/classifier.py)."""
    return _materialize(
        _WEBTEXT_CORE_SQL.replace("{extra_corpus}", _FUZZY_EXTRA_CORPUS_SQL)
        + _FUZZY_KEEPERS_SQL
        + _full_scoring_ctes()
        + """
    SELECT doc_id, n_fuzzy_variants, n_docs_total, n_tokens,
           ppl_bucket, quality_label,
           (quality_label = 'keep' AND ppl_bucket <> 'tail') AS kept
    FROM kscored ORDER BY doc_id
    """,
        "survivors", "fkeep", "kw",
    )


@_q("webtext_pipeline_full", _webtext_full_oracle_sql)  # lazy: trains models
def q_webtext_pipeline_full(spark, sf_dir):
    """The COMPLETE public-recipe webtext stack in one query — what
    RefinedWeb/Gopher/DCLM actually run end-to-end: Gopher rule gate →
    repeated-span removal → exact dedup → fuzzy MinHash doc-level
    dedup → CCNet LM perplexity bucketing (head/middle/tail) → DCLM
    hashed-ngram classifier keep/drop; ``kept`` = classifier keep AND
    not perplexity-tail (the standard final filter). Every stage is
    the already-oracled operator; scores are exact integer sums so the
    oracle matches bit-for-bit. Scale shape: scoring runs only on
    fuzzy-dedup KEEPERS (checkpoint-materialized, corpus-magnitudes
    smaller than the input); both model tables broadcast."""
    from .functions.classifier import score_quality
    from .functions.lm import score_perplexity

    keepers = _fuzzy_keepers(spark, sf_dir)
    scored = score_quality(
        score_perplexity(keepers, text_col="cleaned_text"),
        text_col="cleaned_text",
    )
    out = scored.select(
        "doc_id", "n_fuzzy_variants", "n_docs_total", "n_tokens",
        "ppl_bucket", "quality_label",
        (
            (F.col("quality_label") == "keep")
            & (F.col("ppl_bucket") != "tail")
        ).alias("kept"),
    ).orderBy("doc_id")
    out._ckpt_ids = keepers._ckpt_ids
    return out


def _webtext_shards_oracle_sql() -> str:
    """Oracle for webtext_to_shards: the full-pipeline oracle's CTE
    chain (gate → spans → exact → fuzzy → LM → classifier → kept)
    extended with the BPE recursive-CTE encoder over the KEPT docs'
    cleaned text and the token-pack prefix-sum layout — the whole
    corpus→trainable-shards path recomputed relationally in one
    statement. Encoder/merge tables from the same cached vocab the
    Spark UDF broadcasts (functions/bpe.default_merges); shard/order
    hashes are md5 so DuckDB recomputes them exactly."""
    from .functions.bpe import default_merges, merges_sql_values

    sql = (
        _WEBTEXT_CORE_SQL.replace("{extra_corpus}", _FUZZY_EXTRA_CORPUS_SQL)
        + _FUZZY_KEEPERS_SQL
        + _full_scoring_ctes()
        + r"""
    , tpmerges(rank, a, b, ab) AS (
      VALUES {values}
    ), tpsrc AS (
      SELECT f.doc_id, f.cleaned_text AS text
      FROM fkeep f JOIN kscored s USING (doc_id)
      WHERE s.quality_label = 'keep' AND s.ppl_bucket <> 'tail'
    ), tpbase AS (
      SELECT doc_id,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      FROM tpsrc
    ), tpwords(w) AS (
      SELECT DISTINCT unnest(w) FROM tpbase
    ), tpenc(w, step, s) AS (
      SELECT w, 0,
        ' ' || array_to_string(list_transform(range(1, len(w) + 1),
                                              i -> substr(w, i, 1)), ' ') || ' '
      FROM tpwords WHERE w <> ''
      UNION ALL
      SELECT w, step + 1,
        substr(s, 1, pos - 1) || ' ' || ab || ' ' || substr(s, pos + len(a) + len(b) + 3)
      FROM (
        SELECT e.w, e.step, e.s,
               min_by(m.a, m.rank) AS a, min_by(m.b, m.rank) AS b,
               min_by(m.ab, m.rank) AS ab,
               instr(e.s, ' ' || min_by(m.a, m.rank) || ' '
                     || min_by(m.b, m.rank) || ' ') AS pos
        FROM tpenc e JOIN tpmerges m ON instr(e.s, ' ' || m.a || ' ' || m.b || ' ') > 0
        GROUP BY e.w, e.step, e.s
      )
    ), tpwordtok AS (
      SELECT w, len(string_split(trim(s), ' ')) AS n_tok
      FROM (SELECT w, max_by(s, step) AS s FROM tpenc GROUP BY w)
    ), tpocc AS (
      SELECT doc_id, unnest(w) AS word FROM tpbase
    ), tpagg AS (
      SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS nt
      FROM tpocc JOIN tpwordtok ON tpocc.word = tpwordtok.w GROUP BY doc_id
    ), tpassigned AS (
      SELECT doc_id, nt,
             CAST('0x' || substr(md5(doc_id || ':pack'), 1, 15) AS BIGINT)
               % 8 AS shard_id,
             CAST('0x' || substr(md5(doc_id || ':ord:pack'), 1, 15) AS BIGINT)
               AS ord
      FROM tpagg WHERE nt > 0
    ), tplaid AS (
      SELECT shard_id, doc_id, nt,
             CAST(COALESCE(SUM(nt) OVER (PARTITION BY shard_id
                  ORDER BY ord, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS _before
      FROM tpassigned
    ), tppieces AS (
      SELECT shard_id, doc_id, _before, nt,
             unnest(generate_series(_before // 256, (_before + nt - 1) // 256))
               AS seq_id
      FROM tplaid
    )
    SELECT shard_id, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(greatest(seq_id * 256, _before) - _before AS BIGINT) AS doc_pos,
           CAST(greatest(seq_id * 256, _before) - seq_id * 256 AS BIGINT)
             AS start_offset,
           CAST(least((seq_id + 1) * 256, _before + nt)
                - greatest(seq_id * 256, _before) AS BIGINT) AS n_tokens,
           greatest(seq_id * 256, _before) = _before AS is_doc_start,
           least((seq_id + 1) * 256, _before + nt) = _before + nt AS is_doc_end
    FROM tppieces ORDER BY shard_id, seq_id, start_offset, doc_id
    """.replace("{values}", merges_sql_values(default_merges()))
    )
    # fkeep/kw sit under tpsrc, kscored AND the scoring chain —
    # measured 448 s inlined → 1.3 s materialized
    return _materialize(
        sql, "survivors", "fkeep", "kw", "kscored", "tpsrc", "tpbase"
    )


@_q("webtext_to_shards", _webtext_shards_oracle_sql)  # lazy: trains models
def q_webtext_to_shards(spark, sf_dir):
    """The capstone composition — raw corpus to TRAINABLE SHARDS in one
    query: the complete public-recipe pipeline (Gopher gate → span
    removal → exact dedup → fuzzy MinHash dedup → CCNet perplexity →
    DCLM classifier; q_webtext_pipeline_full's kept set) feeding the
    GPT-style concatenate-and-chop packing step (BPE token counts →
    hash shard assignment → deterministic shuffle → fixed 256-token
    sequences with split-doc boundary metadata). The oracle recomputes
    ALL stages relationally, including the BPE encoder as a recursive
    CTE and the pack layout via prefix sums. Scale shape: packing runs
    only on pipeline keepers; the pack itself is one window per shard
    over (doc, token-count) rows — the text never re-shuffles."""
    from .functions.bpe import bpe_token_count_udf, default_merges
    from .functions.classifier import score_quality
    from .functions.lm import score_perplexity
    from .operators.packing import pack_token_shards

    keepers = _fuzzy_keepers(spark, sf_dir)
    scored = score_quality(
        score_perplexity(keepers, text_col="cleaned_text"),
        text_col="cleaned_text",
    )
    kept = scored.filter(
        (F.col("quality_label") == "keep") & (F.col("ppl_bucket") != "tail")
    ).select("doc_id", "cleaned_text")
    counts = kept.select(
        "doc_id", bpe_token_count_udf(default_merges())("cleaned_text").alias("nt")
    )
    out = pack_token_shards(
        counts, "doc_id", "nt", n_shards=8, seq_len=256
    ).orderBy("shard_id", "seq_id", "start_offset", "doc_id")
    out._ckpt_ids = keepers._ckpt_ids
    return out


@_q("minhash_near_dups", _JACCARD_ORACLE)
def q_minhash_near_dups(spark, sf_dir):
    """MinHash-LSH candidates verified by EXACT shingle Jaccard — with
    single-row bands the candidate recall at J ≥ 0.5 is 1−(1−J)^32
    (≥ 1−2.4e-10), so the output equals an exact all-pairs recompute
    and the DuckDB oracle is a hard check on the whole LSH pipeline."""
    from .operators.dedup import minhash_verified_pairs

    docs = _t(spark, sf_dir, "documents")
    return minhash_verified_pairs(
        docs, "doc_id", F.col("text"), num_hashes=32, bands=32,
        shingle_k=3, threshold=0.5,
    ).orderBy("id_a", "id_b")


@_q(
    "simhash_near_dups",
    """
    WITH seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0
    ), norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      FROM seeded
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS INT) AS hamming
    FROM norm a JOIN norm b ON a.t = b.t AND a.doc_id < b.doc_id
    """,
)
def q_simhash_near_dups(spark, sf_dir):
    """SimHash candidates (Hamming ≤ 3 via 16-bit-block pigeonhole)
    restricted to the DuckDB-checkable invariant: identical normalized
    texts ALWAYS collide (identical shingle multiset → identical
    simhash → hamming 0 → same blocks). Every 25th document is unioned
    back verbatim so the invariant checks real pairs (the corpus has no
    organic exact dups at sf0.01). Hamming-distance values for
    non-identical pairs stay pinned by tests/test_dedup.py against a
    pure-python simhash recompute."""
    from .operators.dedup import simhash_near_dups

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    pairs = simhash_near_dups(seeded, "doc_id", F.col("text"), max_hamming=3)
    norm = seeded.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")).alias("t"),
    )
    return (
        pairs.join(norm.select(F.col("doc_id").alias("id_a"), F.col("t").alias("ta")), "id_a")
        .join(norm.select(F.col("doc_id").alias("id_b"), F.col("t").alias("tb")), "id_b")
        .filter(F.col("ta") == F.col("tb"))
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    )


@_q("ngram_jaccard_dups", _JACCARD_ORACLE)
def q_ngram_jaccard_dups(spark, sf_dir):
    """Exact word-3-gram Jaccard via inverted-index join (hashed grams,
    stop-gram guard inert at this scale: max df 500 < max_df 1000)."""
    from .operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", F.col("text"), k=3, threshold=0.5).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# Text analysis (native column functions)
# ---------------------------------------------------------------------------

from .functions.text import LANG_MARKERS as _LANG_MARKERS

_LANG_SQL_SCORES = ", ".join(
    "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), "
    f"x -> x IN ({', '.join(repr(m) for m in sorted(set(_LANG_MARKERS[lang])))}))) AS s_{lang}"
    for lang in ["de", "en", "es", "fr"]
)


@_q(
    "detect_lang_counts",
    f"""
    WITH scores AS (
      SELECT doc_id, {_LANG_SQL_SCORES} FROM documents
    ), best AS (
      SELECT doc_id,
             GREATEST(s_de, s_en, s_es, s_fr) AS m,
             CASE
               WHEN GREATEST(s_de, s_en, s_es, s_fr) <= 0 THEN 'und'
               WHEN s_de = GREATEST(s_de, s_en, s_es, s_fr) THEN 'de'
               WHEN s_en = GREATEST(s_de, s_en, s_es, s_fr) THEN 'en'
               WHEN s_es = GREATEST(s_de, s_en, s_es, s_fr) THEN 'es'
               ELSE 'fr' END AS detected
      FROM scores
    )
    SELECT detected, CAST(COUNT(*) AS BIGINT) AS n
    FROM best GROUP BY detected ORDER BY detected
    """,
)
def q_detect_lang_counts(spark, sf_dir):
    # tokens materialized in their own projection (r7): the inline form
    # re-ran lower+trim+regexp-split once per language filter lambda —
    # the shingles_of_words rule applied to the lang scorer
    from .functions.text import _tokens, detect_lang_from_tokens

    docs = _spread(spark, _t(spark, sf_dir, "documents").select("text"))
    return (
        docs.select(_tokens(F.col("text")).alias("_toks"))
        .select(detect_lang_from_tokens(F.col("_toks")).alias("detected"))
        .groupBy("detected")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("detected")
    )


@_q(
    "text_stats",
    """
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
           CAST(CEIL(
             (CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) * 0.4
             + (length(text) / 4.0) * 0.6) AS BIGINT) AS est_subwords
    FROM documents
    """,
)
def q_text_stats(spark, sf_dir):
    from .functions.text import subword_estimate, token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        subword_estimate(F.col("text")).alias("est_subwords"),
    )


@_q(
    "doc_fingerprints",
    r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_tokens
      FROM documents
    )
    SELECT doc_id,
           md5(array_to_string(
             list_transform(
               generate_series(1, greatest(len(w) - 8, 0) + 1),
               i -> md5(array_to_string(w[i:i+7], ' '))
             ), ',')) AS fingerprint,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM toks ORDER BY doc_id
    """,
)
def q_doc_fingerprints(spark, sf_dir):
    """Rolling-shingle document fingerprints, md5-chained so DuckDB
    recomputes the VALUES exactly (r1-r3 emitted raw xxhash64 — the
    suite's one no_oracle query; xxhash64 has no DuckDB equivalent.
    The 64-bit form fingerprint64_of_words stays the pipeline-internal
    fingerprint, pinned by fingerprint_groups' oracled grouping
    invariant + tests/test_similarity_text.py). Split-once projection:
    tokens referenced inside the transform lambda re-inline per
    shingle otherwise (3.7× measured at sf0.1 — VERDICT r3 #1)."""
    from .functions.text import fingerprint_md5_of_words, token_count, tokens_of

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tokens_of(F.col("text")).alias("_toks"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    ).select(
        "doc_id",
        fingerprint_md5_of_words(F.col("_toks")).alias("fingerprint"),
        "n_tokens",
    ).orderBy("doc_id")


@_q(
    "token_windows",
    r"""
    WITH toks AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      FROM documents
    ), starts AS (
      SELECT doc_id, w,
             unnest(generate_series(0, greatest(len(w) - 1, 0), 8)) AS start
      FROM toks
    )
    SELECT doc_id,
           CAST(start // 8 AS BIGINT) AS window_id,
           CAST(len(w[start+1 : start+16]) AS BIGINT) AS n_tokens,
           array_to_string(w[start+1 : start+16], ' ') AS window_text
    FROM starts ORDER BY doc_id, window_id
    """,
)
def q_token_windows(spark, sf_dir):
    """Training-window chunking: 16-token windows at stride 8 (50%
    overlap) over every document — the doc→sample step before packing;
    tail windows short, every token covered. Shuffle-free row-parallel
    explode; the oracle recomputes window text char-exact."""
    from .operators.chunking import chunk_token_windows

    docs = _t(spark, sf_dir, "documents")
    return chunk_token_windows(
        docs, "doc_id", F.col("text"), window=16, stride=8
    ).orderBy("doc_id", "window_id")


@_q(
    "pii_redact",
    r"""
    WITH seeded AS (
      SELECT doc_id, text ||
        CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)
             || '@example.com now' ELSE '' END ||
        CASE WHEN doc_id % 7 = 0 THEN ' call +1415555'
             || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        CASE WHEN doc_id % 11 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
             || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END AS text
      FROM documents
    )
    SELECT doc_id,
      CAST(len(regexp_extract_all(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '\+[0-9]{7,15}')) AS BIGINT) AS n_phone,
      CAST(len(regexp_extract_all(text,
        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}')) AS BIGINT) AS n_ipv4,
      regexp_replace(regexp_replace(regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\+[0-9]{7,15}', '<PHONE>', 'g'),
        '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS redacted
    FROM seeded ORDER BY doc_id
    """,
)
def q_pii_redact(spark, sf_dir):
    """PII scrubbing (emails → <EMAIL>, +intl phones → <PHONE>, IPv4 →
    <IP>) with per-kind counts — patterns restricted to the Java-regex
    ∩ RE2 common dialect so the oracle recomputes the redacted text
    char-exact. The corpus is clean word soup, so emails / phones /
    IPs are SEEDED deterministically from doc_id (moduli 5/7/11 with
    doc_id-derived locals) before scrubbing."""
    from .functions.text import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    seeded_text = F.concat(
        F.col("text"),
        F.when(d % 5 == 0, F.concat(
            F.lit(" contact user"), d.cast("string"), F.lit("@example.com now")
        )).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.concat(
            F.lit(" call +1415555"), F.lpad((d % 10000).cast("string"), 4, "0")
        )).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.concat(
            F.lit(" from 10.0."), (d % 256).cast("string"), F.lit("."),
            ((d * 7) % 256).cast("string"),
        )).otherwise(F.lit("")),
    )
    base = _spread(spark, docs.select("doc_id", seeded_text.alias("text")))
    counts = pii_counts(F.col("text"))
    return base.select(
        "doc_id",
        *[c.alias(k) for k, c in counts.items()],
        redact_pii(F.col("text")).alias("redacted"),
    ).orderBy("doc_id")


@_q(
    "fingerprint_groups",
    """
    WITH seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 25 = 0
    )
    SELECT MIN(doc_id) AS keeper, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM seeded GROUP BY md5(text) ORDER BY keeper
    """,
)
def q_fingerprint_groups(spark, sf_dir):
    """DuckDB-checkable invariant for fingerprint64: the grouping it
    induces must equal grouping by exact text (identical text → same
    fingerprint by construction; distinct texts collide with prob
    ~n²/2⁶⁴). Every 25th doc is unioned back verbatim so groups with
    n_docs > 1 exist (no organic exact dups at sf0.01)."""
    from .functions.text import fingerprint64_of_words, tokens_of

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.unionByName(
        docs.filter(F.col("doc_id") % 25 == 0).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    )
    # spread BEFORE the token projection so the split itself runs
    # distributed (r7; a post-projection repartition would still do
    # the heavy map work in the single scan task)
    seeded = _spread(spark, seeded).select(
        "doc_id", tokens_of(F.col("text")).alias("_toks")
    )  # split once
    return (
        seeded.groupBy(fingerprint64_of_words(F.col("_toks")).alias("_fp"))
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
        )
        .select("keeper", "n_docs")
        .orderBy("keeper")
    )


# ---------------------------------------------------------------------------
# Set ops / date / json / array-map scalar surface
# ---------------------------------------------------------------------------

@_q(
    "frontier_setops",
    """
    SELECT doc_id FROM (
      SELECT doc_id FROM documents WHERE lang = 'en'
      UNION
      SELECT doc_id FROM documents WHERE source = 'src1'
    )
    EXCEPT
    SELECT doc_id FROM documents WHERE n_chars < 50
    """,
)
def q_frontier_setops(spark, sf_dir):
    """Frontier merge/remove semantics: union + except (SURVEY §2.8)."""
    docs = _t(spark, sf_dir, "documents")
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    src1 = docs.filter(F.col("source") == "src1").select("doc_id")
    small = docs.filter(F.col("n_chars") < 50).select("doc_id")
    return en.union(src1).distinct().exceptAll(small.distinct())


@_q(
    "event_daily",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY day, event_type
    """,
)
def q_event_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


@_q(
    "windowed_counts",
    """
    SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
)
def q_windowed_counts(spark, sf_dir):
    """Tumbling-window agg — same function the streaming path uses
    (streaming/events.windowed_event_counts), run on a bounded input."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@_q(
    "sliding_counts",
    """
    WITH k AS (
      SELECT ts, value, unnest(generate_series(0, 1)) AS shift
      FROM events
    )
    SELECT CAST(to_timestamp((CAST(FLOOR(epoch(ts) / 10800) AS BIGINT) - shift)
                             * 10800) AS TIMESTAMP) AS window_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM k GROUP BY 1 ORDER BY window_start
    """,
)
def q_sliding_counts(spark, sf_dir):
    """SLIDING windows (6 h window, 3 h slide — overlapping, unlike
    windowed_counts' tumbling buckets): each event lands in exactly 2
    windows. Spark expands window membership map-side before one hash
    agg; the oracle derives the same 2 window starts per event from
    epoch arithmetic (slide-aligned starts at k·10800 s)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(F.col("win.start").alias("window_start"), "n", "sum_value")
        .orderBy("window_start")
    )


@_q(
    "batch_validate",
    """
    SELECT doc_id AS batch_id,
           CAST(doc_id % 71 AS INT) AS n_urls,
           CASE WHEN doc_id % 71 < 1 THEN 'rejected_empty'
                WHEN doc_id % 71 > 50 THEN 'rejected_too_many'
                ELSE 'accepted' END AS status
    FROM documents
    """,
)
def q_batch_validate(spark, sf_dir):
    """P6 batch-request guard (1..50 urls, reference
    models/responses.py:44 + tests/api/test_batch_validation.py) as a
    typed status column over synthetic batch sizes 0..70."""
    from .operators.formats import batch_request_status

    docs = _t(spark, sf_dir, "documents")
    n_urls = (F.col("doc_id") % 71).cast("int")
    return docs.select(
        F.col("doc_id").alias("batch_id"),
        n_urls.alias("n_urls"),
        batch_request_status(n_urls).alias("status"),
    )


@_q(
    "user_sessions",
    """
    WITH o AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts >= lag(ts) OVER w + INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 4) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def q_user_sessions(spark, sf_dir):
    """Gap-based sessionization (streaming/events.sessionize run on a
    bounded input — native session_window, T7): a session extends while
    events arrive within the 30-min gap; end = last event + gap. The
    DuckDB mirror derives the same sessions via lag + cumulative sum —
    a hard check that session_window's [start, last+gap) semantics
    match the standard SQL formulation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "sum_value",
        )
    )


@_q(
    "politeness_budgets",
    """
    WITH f AS (
      SELECT doc_id,
             source || '-' || (doc_id % 97) || '.example' AS host,
             doc_id % 97 AS hn,
             CASE WHEN doc_id % 4 = 0 THEN '/private/' ELSE '/p/' END
               || doc_id AS path
      FROM documents
    )
    SELECT 'http://' || host || path AS url, host,
           NOT (hn % 5 <> 0 AND hn % 3 = 0
                AND starts_with(path, '/private/')) AS allowed,
           CAST(CASE
             WHEN (CASE WHEN hn % 5 = 0 THEN 1 ELSE hn % 7 END) <= 0 THEN 30
             ELSE GREATEST(1, LEAST(30,
                  CAST(FLOOR(30.0 / (CASE WHEN hn % 5 = 0 THEN 1 ELSE hn % 7 END)) AS INT)))
           END AS INT) AS budget
    FROM f
    """,
)
def q_politeness_budgets(spark, sf_dir):
    """T5 politeness through the REAL with_politeness operator (robots
    allow/deny + per-host token budget = min(cap, wave_seconds/delay),
    reference docs/features/downloader-core.md:39-50): hosts, delays,
    and disallow rules synthesized deterministically from documents;
    hosts with hn%5==0 have no robots row (default-allow, default
    delay), hn%3==0 hosts disallow /private/."""
    from .plans.crawlconfig import CrawlConfig
    from .plans.politeness import with_politeness

    docs = _t(spark, sf_dir, "documents")
    hn = (F.col("doc_id") % 97).alias("hn")
    host = F.concat(
        "source", F.lit("-"), (F.col("doc_id") % 97).cast("string"), F.lit(".example")
    )
    path = F.concat(
        F.when(F.col("doc_id") % 4 == 0, "/private/").otherwise("/p/"),
        F.col("doc_id").cast("string"),
    )
    frontier = docs.select(
        F.concat(F.lit("http://"), host, path).alias("url"),
        host.alias("host"),
        F.lit(0).alias("depth"),
        F.lit(100).alias("score"),
        F.lit(0).alias("attempt"),
    )
    hosts = docs.select("source", hn).distinct()
    robots = hosts.filter(F.col("hn") % 5 != 0).select(
        F.concat(
            "source", F.lit("-"), F.col("hn").cast("string"), F.lit(".example")
        ).alias("host"),
        (F.col("hn") % 7).cast("int").alias("crawl_delay"),
        F.when(F.col("hn") % 3 == 0, F.array(F.lit("/private/")))
        .otherwise(F.array().cast("array<string>"))
        .alias("disallow"),
        F.lit(True).alias("has_robots"),
    )
    cfg = CrawlConfig(wave_seconds=30, max_per_host_per_wave=30, default_crawl_delay=1)
    return with_politeness(frontier, robots, cfg).select(
        "url", "host", "allowed", "budget"
    )


@_q(
    "json_envelope",
    """
    SELECT doc_id,
           to_json(struct_pack(success := TRUE, doc_id := doc_id,
                               size := n_chars, lang := lang)) AS envelope,
           to_base64(encode(substr(text, 1, 32))) AS content_b64
    FROM documents
    """,
)
def q_json_envelope(spark, sf_dir):
    """C6 JSON+base64 envelope (content_processor.py:187-207) — fully
    native to_json(struct)+base64 (unchunked, matching the reference's
    b64encode — Spark's base64() MIME-chunks past 57 bytes)."""
    from .operators.formats import _b64

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.lit(True).alias("success"),
                F.col("doc_id").alias("doc_id"),
                F.col("n_chars").alias("size"),
                F.col("lang").alias("lang"),
            )
        ).alias("envelope"),
        _b64(F.encode(F.substring("text", 1, 32), "UTF-8")).alias("content_b64"),
    )


@_q(
    "multi_accept",
    """
    WITH hdr AS (
      SELECT doc_id,
             CASE doc_id % 4
               WHEN 0 THEN 'text/html, application/json;q=0.9, text/html'
               WHEN 1 THEN 'text/markdown;q=0.8, text/plain, text/markdown'
               WHEN 2 THEN 'application/pdf, */*;q=0.1'
               ELSE 'application/json' END AS accept
      FROM documents
    ), exploded AS (
      SELECT doc_id, u.pos, u.fmt FROM (
        SELECT doc_id,
               unnest(list_transform(regexp_split_to_array(accept, ','),
                      (x, i) -> struct_pack(
                        pos := i,
                        fmt := CASE lower(trim(regexp_replace(x, ';.*$', '')))
                          WHEN 'text/plain' THEN 'text'
                          WHEN 'text/html' THEN 'html'
                          WHEN 'text/markdown' THEN 'markdown'
                          WHEN 'text/x-markdown' THEN 'markdown'
                          WHEN 'application/pdf' THEN 'pdf'
                          WHEN 'application/json' THEN 'json'
                          END))) AS u
        FROM hdr
      ) WHERE u.fmt IS NOT NULL
    ), first_pos AS (
      SELECT doc_id, fmt, MIN(pos) AS pos FROM exploded GROUP BY doc_id, fmt
    )
    SELECT doc_id, fmt,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS BIGINT) AS ord
    FROM first_pos
    """,
)
def q_multi_accept(spark, sf_dir):
    """P5 multi-accept parse → FORMAT TOKENS: split, strip ;q params,
    map exact media types to formats, drop unsupported (the */* row),
    dedupe preserving first-occurrence order — the full
    parse_accept_headers semantics (content_processor.py:81-140)."""
    from .operators.formats import parse_accepts

    docs = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 4
    accept = (
        F.when(m == 0, "text/html, application/json;q=0.9, text/html")
        .when(m == 1, "text/markdown;q=0.8, text/plain, text/markdown")
        .when(m == 2, "application/pdf, */*;q=0.1")
        .otherwise("application/json")
    )
    return docs.select(
        "doc_id", F.posexplode(parse_accepts(accept)).alias("pos0", "fmt")
    ).select("doc_id", "fmt", (F.col("pos0") + 1).cast("long").alias("ord"))


# ---------------------------------------------------------------------------
# Multimodal plumbing (rows-only; codec stubbed per environment)
# ---------------------------------------------------------------------------

@_q(
    "media_frames",
    """
    WITH media AS (
      SELECT vec_id AS media_id,
             CAST(vec_id % 9000 + 1000 AS BIGINT) AS duration_ms,
             array_to_string(list_transform(embedding,
               x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                         AS VARCHAR)), ',') AS s
      FROM embeddings
    ), frames AS (
      SELECT media_id, s,
             unnest(generate_series(0, duration_ms - 1, 1000)) AS frame_ts_ms
      FROM media
    )
    SELECT media_id, CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms,
           md5(substring(s,
             CAST((frame_ts_ms // 1000) * 7 % greatest(length(s) - 15, 1)
                  AS BIGINT) + 1, 16)) AS frame_digest
    FROM frames ORDER BY media_id, frame_ts_ms
    """,
)
def q_media_frames(spark, sf_dir):
    """Frame-sampling over the synthetic media corpus: one row per
    (media, 1000 ms timestamp) via sample_frames_plan's native
    sequence-explode, each frame's payload slice digested (the decode
    of the slice is the stubbed codec step — the PLUMBING is what a
    video pipeline needs: row explosion bounded by duration, slices
    addressed inside the payload, no Python). Payloads are the
    integer-quantized strings DuckDB rebuilds exactly, so the oracle
    recomputes every frame digest."""
    from .multimodal import sample_frames_plan, synth_media_from_embeddings

    media = synth_media_from_embeddings(spark, sf_dir)
    frames = sample_frames_plan(media, every_ms=1000)
    s = F.decode(F.col("payload"), "UTF-8")
    pos = (
        (F.col("frame_ts_ms") / 1000).cast("long") * 7
        % F.greatest(F.length(s) - 15, F.lit(1))
    ).cast("long") + 1
    return frames.select(
        "media_id",
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        F.md5(F.encode(F.substring(s, pos, 16), "UTF-8")).alias("frame_digest"),
    ).orderBy("media_id", "frame_ts_ms")


@_q(
    "media_features",
    """
    WITH media AS (
      SELECT vec_id AS media_id,
             CASE CAST(vec_id % 3 AS INT)
               WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
             END AS media_type,
             array_to_string(list_transform(embedding,
               x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)
                         AS VARCHAR)), ',') AS s
      FROM embeddings
    ), b AS (
      SELECT media_id, media_type, length(s) AS n_bytes,
             list_transform(generate_series(1, length(s)),
                            i -> ascii(substring(s, i, 1))) AS bl
      FROM media
    )
    SELECT media_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes,
           CAST(list_sum(bl) AS BIGINT) AS byte_sum,
           ROUND(list_sum(bl) * 1.0 / n_bytes, 6) AS byte_mean,
           array_to_string(list_transform(generate_series(0, 15),
             bin -> CAST(len(list_filter(bl, x -> x // 16 = bin))
                         AS VARCHAR)), ',') AS hist
    FROM b
    """,
)
def q_media_features(spark, sf_dir):
    """Multimodal byte-feature plumbing with a HARD oracle (round-2
    VERDICT Missing #5): the synthetic payload is integer-quantized so
    DuckDB can rebuild the exact bytes and recompute length, byte sum
    and the 16-bin histogram as exact integers (byte_mean re-derived
    natively so both engines round the same way). byte_entropy stays
    UDF-only, pinned by the python-recompute test — float log2 isn't
    bit-stable across engines."""
    from .multimodal import media_features_udf, synth_media_from_embeddings

    media = synth_media_from_embeddings(spark, sf_dir)
    return media_features_udf(media).select(
        "media_id",
        F.col("meta.media_type").alias("media_type"),
        "n_bytes",
        "byte_sum",
        F.round(F.col("byte_sum") / F.col("n_bytes"), 6).alias("byte_mean"),
        F.concat_ws(
            ",", F.transform("histogram", lambda x: x.cast("string"))
        ).alias("hist"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup + multi-format fan-out + UA sanitize
# ---------------------------------------------------------------------------

# Exact all-pairs cosine ≥ 0.9 over the SEEDED corpus (every 50th
# vector re-unioned with a deterministic +0.25 perturbation on its
# first component, cosine ≈ 0.99 to its source, so the check runs on
# REAL pairs) — shared by embedding_near_dups (exact path) and
# embedding_near_dups_lsh (recall-saturated LSH): both must equal it.
_NEAR_DUP_ORACLE = """
    WITH base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), seeded AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x + 0.25 ELSE x END)
      FROM base WHERE vec_id % 50 = 0
    ), scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(
               list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
                * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS cosine
      FROM seeded a JOIN seeded b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM scored WHERE cosine >= 0.9
    """


def _seeded_near_dup_corpus(spark, sf_dir):
    """embeddings ∪ deterministic perturbations of every 50th vector —
    the corpus both near-dup query variants (and their shared oracle)
    run on. The raw synthetic corpus is near-orthogonal and would
    verify an empty pair set (the round-1 vacuous-oracle bug)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = emb.filter(F.col("vec_id") % 50 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: F.when(i == 0, x + F.lit(0.25)).otherwise(x),
        ).alias("embedding"),
    )
    return emb.unionByName(pert)


@_q("embedding_near_dups", _NEAR_DUP_ORACLE)
def q_embedding_near_dups(spark, sf_dir):
    """Exact embedding near-dup pairs (cosine ≥ 0.9), opting in to the
    size-guarded O(n²) verify baseline (exact=True) over the seeded
    corpus. The LSH path is the scale default
    (embedding_near_dups_lsh, same oracle)."""
    from .operators.similarity import embedding_near_dups

    return embedding_near_dups(
        _seeded_near_dup_corpus(spark, sf_dir), threshold=0.9, exact=True
    )


@_q("embedding_near_dups_lsh", _NEAR_DUP_ORACLE)
def q_embedding_near_dups_lsh(spark, sf_dir):
    """LSH-bucketed near-dups (the scale default) in the
    ORACLE-VERIFIABLE configuration: at threshold 0.9 a true pair has
    per-plane collision p = 1−acos(0.9)/π ≥ 0.857, so with 4 planes ×
    8 OR-amplified tables the miss probability per pair is
    (1−p⁴)^8 ≤ 4·10⁻³ at the seeded pairs' actual cosine (≈0.99:
    ≤ 2·10⁻⁶) — the LSH output equals the exact pair set and the same
    all-pairs oracle verifies candidate generation, scoring and
    thresholding end-to-end. At 100 TB the trade flips (more planes →
    smaller buckets, recall < 1, pinned by tests)."""
    from .operators.similarity import embedding_near_dups

    return embedding_near_dups(
        _seeded_near_dup_corpus(spark, sf_dir),
        threshold=0.9,
        dim=EMB_DIM,
        n_planes=4,
        n_tables=8,
    )


def _urlq_oracle_sql() -> str:
    """Oracle for url_quality_filter, interpolating the SAME constants
    (functions/urlquality.BLOCK_DOMAINS / URL_WORD_WEIGHTS /
    URL_SCORE_BLOCK) the Spark side uses — lockstep by construction.
    The suffix-join blocklist is recomputed as its relational
    equivalent: host = d OR host ends with '.' || d."""
    from .functions.urlquality import (
        BLOCK_DOMAINS,
        URL_SCORE_BLOCK,
        URL_WORD_WEIGHTS,
    )

    blocked_rows = ", ".join(f"('{d}')" for d in BLOCK_DOMAINS)
    score = " + ".join(
        f"CASE WHEN contains(lower(url), '{w}') THEN {URL_WORD_WEIGHTS[w]} "
        "ELSE 0 END"
        for w in sorted(URL_WORD_WEIGHTS)
    )
    return f"""
    WITH urls AS (
      SELECT doc_id, CASE doc_id % 7
        WHEN 0 THEN 'http://site' || doc_id || '.example.com/articles/' || doc_id
        WHEN 1 THEN 'http://badsource.example/page' || doc_id
        WHEN 2 THEN 'http://cdn' || doc_id || '.badsource.example/x'
        WHEN 3 THEN 'http://host' || doc_id || '.net/casino/jackpot'
        WHEN 4 THEN 'http://host' || doc_id || '.org/free-deal-offer'
        WHEN 5 THEN 'http://dl' || doc_id || '.example.net/torrent-download-free'
        ELSE 'http://news' || doc_id || '.example.org/winner-profile'
      END AS url FROM documents
    ), blocked(domain) AS (VALUES {blocked_rows}),
    h AS (
      SELECT doc_id, url,
             lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)', 1)) AS host,
             CAST({score} AS INTEGER) AS spam_score
      FROM urls
    )
    SELECT doc_id, url, host,
           EXISTS (SELECT 1 FROM blocked b
                   WHERE h.host = b.domain
                      OR ends_with(h.host, '.' || b.domain)) AS domain_blocked,
           spam_score,
           (NOT EXISTS (SELECT 1 FROM blocked b
                        WHERE h.host = b.domain
                           OR ends_with(h.host, '.' || b.domain))
            AND spam_score < {URL_SCORE_BLOCK}) AS url_keep
    FROM h
    """


@_q("url_quality_filter", _urlq_oracle_sql)  # callable: resolved lazily
def q_url_quality_filter(spark, sf_dir):
    """RefinedWeb-style URL gate (§3.1: domain blocklist + weighted URL
    keyword score) over seven seeded URL families: clean, blocked
    domain, subdomain-of-blocked, strict keywords (casino/jackpot),
    soft-only (free-deal-offer, kept), medium+soft combination
    (torrent-download-free, blocked at threshold), and a benign
    substring hit ('win' ⊂ winner, kept). Runs the SCALE path: the
    blocklist as a broadcast dim table joined on the exploded host
    dot-suffix set (functions/urlquality.blocklist_hits) — the oracle
    recomputes it as host = d OR ends_with(host, '.'||d)."""
    from .functions.urlquality import BLOCK_DOMAINS, url_quality

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    sid = d.cast("string")
    m = d % 7
    url = (
        F.when(m == 0, F.concat(F.lit("http://site"), sid, F.lit(".example.com/articles/"), sid))
        .when(m == 1, F.concat(F.lit("http://badsource.example/page"), sid))
        .when(m == 2, F.concat(F.lit("http://cdn"), sid, F.lit(".badsource.example/x")))
        .when(m == 3, F.concat(F.lit("http://host"), sid, F.lit(".net/casino/jackpot")))
        .when(m == 4, F.concat(F.lit("http://host"), sid, F.lit(".org/free-deal-offer")))
        .when(m == 5, F.concat(F.lit("http://dl"), sid, F.lit(".example.net/torrent-download-free")))
        .otherwise(F.concat(F.lit("http://news"), sid, F.lit(".example.org/winner-profile")))
    )
    df = docs.select("doc_id", url.alias("url"))
    domains = spark.createDataFrame(
        [(x,) for x in BLOCK_DOMAINS], "domain string"
    )
    return url_quality(df, "doc_id", domains_df=domains)


def _semdedup_oracle_sql() -> str:
    """Oracle for semantic_dedup, generated from the SAME cached
    build-time centroids the Spark query broadcasts (the lm/classifier
    pattern — they agree by construction). Recomputes the WHOLE
    pipeline relationally: integer micro-unit quantization →
    exact-BIGINT nearest-centroid assignment (ORDER BY d, cl ties
    match np.argmin's first-occurrence rule) → within-cluster cosine
    pairs → recursive-CTE connected components → keep-the-outlier
    keeper pick (lowest cos-to-centroid, ties to lowest vec_id)."""
    from .operators.semdedup import (
        centroids_sql_values,
        default_semdedup_centroids,
    )

    values = centroids_sql_values(default_semdedup_centroids())
    return f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), seeded AS (
      SELECT vec_id, v FROM base
      UNION ALL
      SELECT vec_id + 1000000,
             list_transform(v, (x, i) -> CASE WHEN i = 1 THEN x + 0.25 ELSE x END)
      FROM base WHERE vec_id % 50 = 0
    ), vm AS (
      SELECT vec_id, v,
             list_transform(v, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS m
      FROM seeded
    ), cent(cl, cm) AS (VALUES {values}),
    dist AS (
      SELECT vec_id, cl,
             list_sum(list_transform(list_zip(m, cm),
                                     p -> (p[1] - p[2]) * (p[1] - p[2]))) AS d
      FROM vm CROSS JOIN cent
    ), assign AS (
      SELECT vec_id, cl AS cluster FROM (
        SELECT vec_id, cl,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
        FROM dist) WHERE rn = 1
    ), withc AS (
      SELECT s.vec_id, a.cluster, s.v,
             ROUND(
               list_sum(list_transform(list_zip(s.v,
                 list_transform(c.cm, x -> x / 1000000.0)), p -> p[1] * p[2]))
               / (sqrt(list_sum(list_transform(s.v, x -> x * x)))
                * sqrt(list_sum(list_transform(c.cm,
                    x -> (x / 1000000.0) * (x / 1000000.0))))), 6) AS cos_centroid
      FROM seeded s JOIN assign a USING (vec_id) JOIN cent c ON c.cl = a.cluster
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM withc a JOIN withc b
        ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE ROUND(
        list_sum(list_transform(list_zip(a.v, b.v), x -> x[1] * x[2]))
        / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) >= 0.9
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    )
    SELECT w.vec_id, w.cluster,
           COALESCE(c.component, w.vec_id) AS component,
           w.cos_centroid,
           (ROW_NUMBER() OVER (
              PARTITION BY COALESCE(c.component, w.vec_id)
              ORDER BY w.cos_centroid, w.vec_id) = 1) AS keep
    FROM withc w LEFT JOIN comp c ON c.node = w.vec_id
    ORDER BY w.vec_id
    """


@_q("semantic_dedup", _semdedup_oracle_sql)  # callable: resolved lazily
def q_semantic_dedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the seeded near-dup corpus:
    k-means-cluster the embeddings (build-time integer-micro centroids,
    operators/semdedup.default_semdedup_centroids), pair only WITHIN
    clusters at cosine ≥ 0.9, keep one member per duplicate component —
    the one farthest from its centroid (lowest cos_centroid, ties by
    id). Assignment is exact BIGINT arithmetic in both engines; the
    oracle recomputes assignment, pairing, components and the keeper
    pick end-to-end from the same centroid literals."""
    from .operators.semdedup import default_semdedup_centroids, semantic_dedup

    res = semantic_dedup(
        spark,
        _seeded_near_dup_corpus(spark, sf_dir),
        default_semdedup_centroids(),
        threshold=0.9,
    )
    out = res.orderBy("vec_id")
    out._ckpt_ids = res._ckpt_ids  # release hook survives the orderBy
    return out


@_q(
    "multi_format_fanout",
    """
    WITH pages AS (
      SELECT doc_id,
             'http://' || source || '.example/doc/' || doc_id AS url,
             '<html><head><title>Doc ' || doc_id
               || '</title></head><body><article><h1>Doc ' || doc_id
               || '</h1><p>'
               || replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),
                          '>', '&gt;')
               || '</p></article></body></html>' AS html
      FROM documents
    ), fan AS (
      SELECT doc_id, url, html,
             unnest(CASE doc_id % 3
               WHEN 0 THEN ['text', 'markdown']
               WHEN 1 THEN ['json', 'raw', 'pdf']
               ELSE ['html', 'text'] END) AS format
      FROM pages
    )
    SELECT url, format,
           CASE format
             WHEN 'text' THEN 'text/plain'
             WHEN 'markdown' THEN 'text/markdown'
             WHEN 'html' THEN 'text/html'
             WHEN 'json' THEN 'application/json'
             WHEN 'raw' THEN 'application/octet-stream'
             WHEN 'pdf' THEN 'application/pdf' END AS mime,
           CASE WHEN format = 'pdf' THEN 'unsupported_format' END AS error_type,
           CASE format
             WHEN 'html' THEN CAST(length(html) AS INT)
             WHEN 'raw' THEN CAST(length(to_base64(encode(html))) AS INT)
             WHEN 'json' THEN CAST(length(
               '{"success":true,"url":"' || url || '","size":'
               || octet_length(encode(html)) || ',"content":"'
               || to_base64(encode(html)) || '"}') AS INT)
             END AS payload_len,
           format <> 'pdf' AS has_payload
    FROM fan
    """,
)
def q_multi_format_fanout(spark, sf_dir):
    """C7: one scan → N format payloads per page + typed error rows for
    browser-bound formats (pdf). Pages are built from documents with a
    NATIVE html template so DuckDB can mirror the fan-out structure and
    the html/json/raw payload lengths exactly; text/markdown payload
    bytes go through the extract UDF (has_payload proves they
    materialize) and their exact values are pinned by the byte-parity
    extraction tests — not SQL-expressible."""
    from .functions.udfs import extract_udf
    from .operators.formats import multi_format_results

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    esc = F.replace(
        F.replace(
            F.replace(F.col("text"), F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    html_str = F.concat(
        F.lit("<html><head><title>Doc "), did,
        F.lit("</title></head><body><article><h1>Doc "), did,
        F.lit("</h1><p>"), esc, F.lit("</p></article></body></html>"),
    )
    url = F.concat(F.lit("http://"), "source", F.lit(".example/doc/"), did)
    m = F.col("doc_id") % 3
    formats = (
        F.when(m == 0, F.array(F.lit("text"), F.lit("markdown")))
        .when(m == 1, F.array(F.lit("json"), F.lit("raw"), F.lit("pdf")))
        .otherwise(F.array(F.lit("html"), F.lit("text")))
    )
    pages = docs.select(
        url.alias("url"),
        F.encode(html_str, "UTF-8").alias("html"),
        formats.alias("formats"),
    ).repartition(spark.sparkContext.defaultParallelism)
    # ^ r7: single-file fixture scan = one partition = one Python
    # worker parsing every page (same fix as extract_lang_profile)
    extracted = pages.withColumn("ex", extract_udf("url", "html", F.lit("text/html")))
    return multi_format_results(extracted).select(
        "url", "format", "mime", "error_type",
        F.when(
            F.col("format").isin("html", "json", "raw"), F.length("payload")
        ).otherwise(F.lit(None).cast("int")).alias("payload_len"),
        F.col("payload").isNotNull().alias("has_payload"),
    )


@_q(
    "ua_sanitize",
    """
    SELECT doc_id,
           substr(regexp_replace(source || '<bot>/' || doc_id || '?x',
                                 '[^a-zA-Z0-9_\\s\\-\\.\\(\\)/;:,]', '', 'g'),
                  1, 200) AS ua
    FROM documents
    """,
)
def q_ua_sanitize(spark, sf_dir):
    """P3: User-Agent scrub (validation.py:271-287) as native columns.
    Character class spelled [a-zA-Z0-9_] instead of \\w so Spark (Java
    regex) and DuckDB (RE2) agree on unicode semantics."""
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat("source", F.lit("<bot>/"), "doc_id", F.lit("?x"))
    ua = F.substring(
        F.regexp_replace(raw, r"[^a-zA-Z0-9_\s\-\.\(\)/;:,]", ""), 1, 200
    )
    return docs.select("doc_id", ua.alias("ua"))


# ---------------------------------------------------------------------------
# Percentiles (A3 p95) + paging with offset (O1)
# ---------------------------------------------------------------------------

@_q(
    "response_p95",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.50), 4) AS p50,
           ROUND(quantile_cont(value, 0.95), 4) AS p95,
           ROUND(quantile_cont(value, 0.99), 4) AS p99,
           ROUND(MIN(value), 4) AS min_v,
           ROUND(MAX(value), 4) AS max_v,
           ROUND(AVG(value), 4) AS avg_v
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_response_p95(spark, sf_dir):
    """A3 p95 tracking (metrics.py:47-53): exact interpolated
    percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`); at 100 TB
    swap to `percentile_approx` (single-pass sketch) — the exact form is
    the oracle-able contract."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.50)), 4).alias("p50"),
            F.round(F.percentile("value", F.lit(0.95)), 4).alias("p95"),
            F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
            F.round(F.min("value"), 4).alias("min_v"),
            F.round(F.max("value"), 4).alias("max_v"),
            F.round(F.avg("value"), 4).alias("avg_v"),
        )
        .orderBy("event_type")
    )


@_q(
    "exec_history_offset",
    """
    SELECT event_id, ts, event_type FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 50 OFFSET 100
    """,
)
def q_exec_history_offset(spark, sf_dir):
    """O1 ZREVRANGE paging with start offset (storage.py:112-133)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "event_type")
    return history_page(ev, "ts", limit=50, offset=100, tiebreak="event_id")


@_q(
    "json_props_stats",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def q_json_props_stats(spark, sf_dir):
    """JSON scalar extraction (SURVEY §2.8 json family): parse the
    props JSON payload natively (get_json_object ≡ json_extract)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.sum(k).cast("long").alias("sum_k"),
            F.max(k).cast("long").alias("max_k"),
            F.count(k).cast("long").alias("n_with_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer queries (VERDICT r4 #5): real subword counts, auditable.
# The vocab is trained ONCE at import (functions/bpe.default_merges —
# deterministic BPE over the sf0.001 fixture corpus) and embedded as a
# literal VALUES CTE in the oracle, which re-runs the ENCODER itself as
# a recursive SQL loop: per step, each still-reducible word applies its
# lowest-rank applicable merge to the leftmost occurrence (equivalent
# to batch merging — any merge involving a merged token has a later
# rank). The Spark side is an Arrow-batched pandas UDF with a
# distinct-word cache; the oracle encodes DISTINCT words only and
# joins counts back to occurrences — same O(vocab) shape.
# ---------------------------------------------------------------------------

def _bpe_seeded_docs(spark, sf_dir):
    """documents ∪ compound-word variants of every 10th doc (spaces
    removed from the first 40 chars) — Spark mirror of the seeded CTE
    in _bpe_oracle_common (invariant-8 lockstep)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    compact = F.concat(
        F.replace(F.substring("text", 1, 40), F.lit(" "), F.lit("")),
        F.expr("substring(text, 41)"),
    )
    seeded = docs.unionByName(
        docs.filter(d % 10 == 0).select(
            (d + 1000000).alias("doc_id"), compact.alias("text")
        )
    )
    # spread before the Arrow BPE encoder (r7: single-row-group scan
    # would otherwise push every doc through ONE Python worker)
    return _spread(spark, seeded)


def _bpe_oracle_common() -> str:
    from .functions.bpe import default_merges, merges_sql_values

    # seeded compound-word family: the sf0.01-trained vocab (r6) gives
    # every frequent fixture word a single token — realistic BPE — so
    # every 10th doc is re-unioned with its first 40 chars' spaces
    # REMOVED, creating held-out compounds the encoder must split into
    # multiple learned subwords; without them the oracle could not
    # distinguish the BPE count from the word count.
    return r"""
    WITH RECURSIVE merges(rank, a, b, ab) AS (
      VALUES {values}
    ), seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             replace(substr(text, 1, 40), ' ', '') || substr(text, 41)
      FROM documents WHERE doc_id % 10 = 0
    ), base AS (
      SELECT doc_id, text,
        string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS w
      FROM seeded
    ), words(w) AS (
      SELECT DISTINCT unnest(w) FROM base
    ), enc(w, step, s) AS (
      SELECT w, 0,
        ' ' || array_to_string(list_transform(range(1, len(w) + 1),
                                              i -> substr(w, i, 1)), ' ') || ' '
      FROM words WHERE w <> ''
      UNION ALL
      SELECT w, step + 1,
        substr(s, 1, pos - 1) || ' ' || ab || ' ' || substr(s, pos + len(a) + len(b) + 3)
      FROM (
        SELECT e.w, e.step, e.s,
               min_by(m.a, m.rank) AS a, min_by(m.b, m.rank) AS b,
               min_by(m.ab, m.rank) AS ab,
               instr(e.s, ' ' || min_by(m.a, m.rank) || ' '
                     || min_by(m.b, m.rank) || ' ') AS pos
        FROM enc e JOIN merges m ON instr(e.s, ' ' || m.a || ' ' || m.b || ' ') > 0
        GROUP BY e.w, e.step, e.s
      )
    ), wordtok AS (
      SELECT w, len(string_split(trim(s), ' ')) AS n_tok
      FROM (SELECT w, max_by(s, step) AS s FROM enc GROUP BY w)
    )
    """.replace("{values}", merges_sql_values(default_merges()))


# oracle registered as a ZERO-ARG CALLABLE (resolved lazily by
# _LazyOracleDict): _bpe_oracle_common() trains the vocab from the
# fixture parquet — that must not run at module import (ADVICE r5).
# n_words tests emptiness of the COLLAPSED string, not raw trim():
# DuckDB trim strips only spaces, so a '\n'-only doc would otherwise
# count 1 word vs Spark's 0 (the invariant-8 trailing-'\n' class).
@_q(
    "bpe_token_counts",
    lambda: _bpe_oracle_common()
    + r"""
    , occ AS (
      SELECT doc_id, unnest(w) AS word FROM base
    ), agg AS (
      SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS n_bpe_tokens
      FROM occ JOIN wordtok ON occ.word = wordtok.w GROUP BY doc_id
    )
    SELECT base.doc_id,
           CAST(CASE WHEN trim(regexp_replace(text, '\s+', ' ', 'g')) = ''
                THEN 0 ELSE len(w) END AS BIGINT) AS n_words,
           COALESCE(agg.n_bpe_tokens, 0) AS n_bpe_tokens
    FROM base LEFT JOIN agg USING (doc_id) ORDER BY base.doc_id
    """,
)
def q_bpe_token_counts(spark, sf_dir):
    """Per-document REAL subword token counts from the build-time BPE
    vocab (functions/bpe.py) next to the whitespace word count — the
    unit training-data budgets are actually stated in (the chars/4
    `subword_estimate` heuristic remains for vocabulary-free use).
    Oracle re-runs the encoder in recursive SQL from the literal merge
    table. The r6 vocab trains from the full sf0.01 textual surface
    (functions/bpe.py DEFAULT_VOCAB_SOURCES), so frequent fixture words
    are single tokens — the seeded compound family (spaces removed from
    the first 40 chars of every 10th doc) supplies held-out words whose
    multi-subword encodings the oracle genuinely checks."""
    from .functions.bpe import bpe_token_count_udf, default_merges

    docs = _bpe_seeded_docs(spark, sf_dir)
    collapsed = F.trim(F.regexp_replace("text", r"\s+", " "))
    n_words = (
        F.when(collapsed == "", F.lit(0))
        .otherwise(F.size(F.split(collapsed, " ")))
        .cast("long")
    )
    bpe_count = bpe_token_count_udf(default_merges())
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        bpe_count("text").alias("n_bpe_tokens"),
    ).orderBy("doc_id")


@_q(
    "bpe_token_windows",
    lambda: _bpe_oracle_common()
    + r"""
    , pos AS (
      SELECT doc_id, generate_subscripts(w, 1) AS i, unnest(w) AS word FROM base
    ), cum AS (
      SELECT doc_id, i, n_tok,
        COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
      FROM pos JOIN wordtok ON pos.word = wordtok.w
    )
    SELECT doc_id, CAST(before // 64 AS INT) AS window_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM cum GROUP BY doc_id, window_id ORDER BY doc_id, window_id
    """,
)
def q_bpe_token_windows(spark, sf_dir):
    """Fixed-token-budget chunking in REAL BPE tokens (window = 64): a
    word joins the chunk its first token falls in — deterministic,
    prefix-sum expressible, shuffle-free (one pandas-UDF pass +
    explode). Complements `token_windows`' fixed word stride. Shares
    bpe_token_counts' seeded compound family so window boundaries are
    genuinely token-driven (not word-driven) under the r6 vocab."""
    from .functions.bpe import bpe_window_udf, default_merges

    docs = _bpe_seeded_docs(spark, sf_dir)
    win = bpe_window_udf(default_merges(), 64)
    return (
        docs.select("doc_id", F.explode(win("text")).alias("c"))
        .select(
            "doc_id",
            F.col("c.window_id").alias("window_id"),
            F.col("c.n_words").alias("n_words"),
            F.col("c.n_tokens").alias("n_tokens"),
        )
        .orderBy("doc_id", "window_id")
    )


# oracle: per-doc token totals from the recursive-CTE encoder, then the
# ENTIRE packing recompute — md5 shard assignment, md5-ordered
# intra-shard layout, prefix sums, fixed-length chop — in plain SQL.
@_q(
    "token_pack_shards",
    lambda: _bpe_oracle_common()
    + r"""
    , occ AS (
      SELECT doc_id, unnest(w) AS word FROM base
    ), agg AS (
      SELECT doc_id, CAST(SUM(n_tok) AS BIGINT) AS nt
      FROM occ JOIN wordtok ON occ.word = wordtok.w GROUP BY doc_id
    ), assigned AS (
      SELECT doc_id, nt,
             CAST('0x' || substr(md5(doc_id || ':pack'), 1, 15) AS BIGINT)
               % 8 AS shard_id,
             CAST('0x' || substr(md5(doc_id || ':ord:pack'), 1, 15) AS BIGINT)
               AS ord
      FROM agg WHERE nt > 0
    ), laid AS (
      SELECT shard_id, doc_id, nt,
             CAST(COALESCE(SUM(nt) OVER (PARTITION BY shard_id
                  ORDER BY ord, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS _before
      FROM assigned
    ), pieces AS (
      SELECT shard_id, doc_id, _before, nt,
             unnest(generate_series(_before // 256, (_before + nt - 1) // 256))
               AS seq_id
      FROM laid
    )
    SELECT shard_id, CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(greatest(seq_id * 256, _before) - _before AS BIGINT) AS doc_pos,
           CAST(greatest(seq_id * 256, _before) - seq_id * 256 AS BIGINT)
             AS start_offset,
           CAST(least((seq_id + 1) * 256, _before + nt)
                - greatest(seq_id * 256, _before) AS BIGINT) AS n_tokens,
           greatest(seq_id * 256, _before) = _before AS is_doc_start,
           least((seq_id + 1) * 256, _before + nt) = _before + nt AS is_doc_end
    FROM pieces ORDER BY shard_id, seq_id, start_offset, doc_id
    """,
)
def q_token_pack_shards(spark, sf_dir):
    """Corpus→training-shards packing (VERDICT r5 #2): BPE-count every
    doc (seeded compound family included), hash-assign docs to 8
    shards, lay them out in a deterministic md5-ordered shuffle, and
    chop into exact 256-token sequences with split-doc boundary
    metadata (operators/packing.py — the GPT-style concatenate-and-
    chop step between 'cleaned corpus' and 'trainable batches'). The
    oracle recomputes sequence/shard assignment via prefix sums over
    the recursive-CTE encoder's token totals; exact every-token-in-
    exactly-one-slot coverage is pinned by tests/test_packing.py."""
    from .functions.bpe import bpe_token_count_udf, default_merges
    from .operators.packing import pack_token_shards

    docs = _bpe_seeded_docs(spark, sf_dir)
    counts = docs.select(
        "doc_id", bpe_token_count_udf(default_merges())("text").alias("nt")
    )
    return pack_token_shards(
        counts, "doc_id", "nt", n_shards=8, seq_len=256
    ).orderBy("shard_id", "seq_id", "start_offset", "doc_id")


@_q(
    "hll_wave_merge",
    """
    WITH urls AS (
      SELECT CAST(doc_id % 5 AS INT) AS wave,
             'http://h' || CAST(doc_id % 37 AS VARCHAR) || '.example/p/'
             || CAST(doc_id % 200 AS VARCHAR) AS u
      FROM documents
    ), hashed AS (
      SELECT wave, CAST('0x' || substr(md5(u), 1, 15) AS BIGINT) AS h FROM urls
    ), rho_t AS (
      SELECT wave, CAST(h % 256 AS INT) AS register_id,
             CASE WHEN (h // 256) % 4294967296 = 0 THEN 33
                  ELSE CAST(log2(((h // 256) % 4294967296)
                                 & -((h // 256) % 4294967296)) AS INT) + 1
             END AS rho
      FROM hashed
    ), rid AS (
      SELECT unnest(generate_series(0, 255)) AS register_id
    ), regs AS (
      SELECT w.wave, rid.register_id, CAST(COALESCE(mx.max_rho, 0) AS INT) AS max_rho
      FROM (SELECT DISTINCT wave FROM urls) w CROSS JOIN rid
      LEFT JOIN (SELECT wave, register_id, MAX(rho) AS max_rho
                 FROM rho_t GROUP BY wave, register_id) mx
        ON mx.wave = w.wave AND mx.register_id = rid.register_id
    ), union_regs AS (
      -- the merged row recomputed DIRECTLY over the union (never via
      -- the per-wave sketches): the driver's hash match against
      -- Spark's elementwise-max merge IS the lossless-merge proof
      SELECT -1 AS wave, rid.register_id, CAST(COALESCE(mx.max_rho, 0) AS INT) AS max_rho
      FROM rid
      LEFT JOIN (SELECT register_id, MAX(rho) AS max_rho
                 FROM rho_t GROUP BY register_id) mx USING (register_id)
    ), agg AS (
      SELECT wave,
        SUM(CASE WHEN max_rho = 0 THEN CAST(8589934592 AS BIGINT)
                 ELSE CAST(1 AS BIGINT) << (33 - max_rho) END) AS harmonic_s,
        SUM(CASE WHEN max_rho = 0 THEN 1 ELSE 0 END) AS n_zero_registers
      FROM (SELECT * FROM regs UNION ALL SELECT * FROM union_regs) GROUP BY wave
    )
    SELECT CAST(wave AS INT) AS wave,
           CAST(harmonic_s AS BIGINT) AS harmonic_s,
           CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
           ROUND(CASE WHEN n_zero_registers > 0
                       AND 404351522913636.8 / harmonic_s <= 640.0
                      THEN 256.0 * ln(256.0 / n_zero_registers)
                      ELSE 404351522913636.8 / harmonic_s END, 4) AS est_distinct
    FROM agg ORDER BY wave
    """,
)
def q_hll_wave_merge(spark, sf_dir):
    """The wave-metrics distinct-discovered surface (VERDICT r4 #6),
    externally audited: documents-derived urls partitioned into 5
    'waves' with heavy cross-wave repetition (url keyed by doc_id%200),
    one HLL sketch per wave (grouped registers, engine-portable
    md5_60bit hasher), estimates per wave PLUS the wave=-1 running
    estimate from the elementwise-max MERGE of the per-wave sketches —
    exactly what CrawlEngine.distinct_discovered_estimate does over
    the metrics table. The oracle recomputes the merged row directly
    over the union, so the value match proves merge ≡ sketch-of-union."""
    from .functions.sketch import hll_estimate_by, hll_registers_by, md5_60bit

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    d = F.col("doc_id")
    urls = docs.select(
        (d % 5).cast("int").alias("wave"),
        F.concat(
            F.lit("http://h"), (d % 37).cast("string"),
            F.lit(".example/p/"), (d % 200).cast("string"),
        ).alias("u"),
    )
    regs = hll_registers_by(urls, F.col("u"), ["wave"], m=256, hasher=md5_60bit)
    merged_regs = (
        regs.groupBy("register_id")
        .agg(F.max("max_rho").cast("int").alias("max_rho"))
        .withColumn("wave", F.lit(-1).cast("int"))
    )
    return (
        hll_estimate_by(regs, ["wave"], m=256)
        .unionByName(hll_estimate_by(merged_regs, ["wave"], m=256))
        .orderBy("wave")
    )


def _lm_oracle_sql() -> str:
    """Oracle for lm_perplexity, generated from the SAME cached model
    dict the Spark path broadcasts (functions/lm.py default_lm) — every
    log probability is one shared integer in micro-nats, so scores are
    exact BIGINT sums on both engines (zero cross-engine float math).
    The seeded families and the model tables must stay in lockstep with
    q_lm_perplexity (CLAUDE.md invariant 8 class)."""
    from .functions.lm import default_lm, lm_sql_ctes

    m = default_lm()
    return rf"""
    WITH seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000, regexp_replace(text, '[a-z]', '7', 'g')
        FROM documents WHERE doc_id % 25 = 0
      UNION ALL SELECT doc_id + 2000000, repeat(substr(text, 1, 50) || ' ', 7)
        FROM documents WHERE doc_id % 35 = 0
    ),
    {lm_sql_ctes(m)},
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM seeded
    ),
    w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm),
    bg AS (
      SELECT doc_id, list_extract(ws, g) AS a, list_extract(ws, g + 1) AS b
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS g FROM w)
    ),
    sc AS (
      SELECT doc_id, COALESCE(p.lp_ab, c.lp_a, {m["oov_lp"]}) AS lp
      FROM bg LEFT JOIN lm_pair p ON bg.a = p.a AND bg.b = p.b
              LEFT JOIN lm_ctx c ON bg.a = c.a
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(lp) AS BIGINT) AS nll_micro
      FROM sc GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           COALESCE(nll_micro, 0) AS nll_micro,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 0.0
                ELSE ROUND(nll_micro / (n_bigrams * 1000000.0), 6)
           END AS mean_nll,
           CASE WHEN COALESCE(n_bigrams, 0) = 0 THEN 'empty'
                WHEN nll_micro <= {m["th_head"]} * n_bigrams THEN 'head'
                WHEN nll_micro <= {m["th_tail"]} * n_bigrams THEN 'middle'
                ELSE 'tail'
           END AS ppl_bucket
    FROM seeded s LEFT JOIN agg USING (doc_id) ORDER BY doc_id
    """


@_q("lm_perplexity", _lm_oracle_sql)  # callable: resolved lazily on access
def q_lm_perplexity(spark, sf_dir):
    """CCNet-style LM perplexity filter (Wenzek et al. 2020): score
    every document with the build-time add-one bigram LM and bucket
    into head/middle/tail by the training-tercile thresholds — the
    quality-filter family public webtext recipes run after dedup.
    Two pathological families are SEEDED so all buckets + the OOV
    cascade fire: digits-for-letters (every word OOV -> constant-lp
    tail) and a repeated in-domain phrase (low-ppl head). Scores are
    exact integer micro-nat sums (functions/lm.py), so the oracle
    matches bit-for-bit; the mean is one shared IEEE division."""
    from .functions.lm import score_perplexity

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    seeded = docs.unionByName(
        docs.filter(d % 25 == 0).select(
            (d + 1000000).alias("doc_id"),
            F.regexp_replace("text", "[a-z]", "7").alias("text"),
        )
    ).unionByName(
        docs.filter(d % 35 == 0).select(
            (d + 2000000).alias("doc_id"),
            F.repeat(
                F.concat(F.substring("text", 1, 50), F.lit(" ")), 7
            ).alias("text"),
        )
    )
    return (
        score_perplexity(_spread(spark, seeded))
        .select("doc_id", "n_bigrams", "nll_micro", "mean_nll", "ppl_bucket")
        .orderBy("doc_id")
    )


def _clf_oracle_sql() -> str:
    """Oracle for quality_classifier, generated from the SAME cached
    model dict the Spark path broadcasts (functions/classifier.
    default_classifier) — every weight is one shared integer in
    micro-units and the bucket hash is the engine-portable md5 prefix,
    so scores are exact BIGINT sums on both engines. The seeded junk
    families interpolate the SAME word-list constants the query uses
    (CLAUDE.md invariant 8 class)."""
    from .functions.classifier import (
        BOILER_WORDS,
        SPAM_WORDS,
        classifier_sql_ctes,
        default_classifier,
    )

    m = default_classifier()
    spam = " ".join(SPAM_WORDS)
    boiler = " ".join(BOILER_WORDS)
    B, bias = m["n_buckets"], m["bias_micro"]
    return rf"""
    WITH seeded AS (
      SELECT doc_id, text FROM documents
      UNION ALL SELECT doc_id + 1000000,
        repeat('{spam} v' || CAST(doc_id % 7 AS VARCHAR) || ' ', 3)
        FROM documents WHERE doc_id % 20 = 0
      UNION ALL SELECT doc_id + 2000000, repeat('{boiler} ', 4)
        FROM documents WHERE doc_id % 30 = 0
      UNION ALL SELECT doc_id + 3000000, '   '
        FROM documents WHERE doc_id % 100 = 0
    ),
    {classifier_sql_ctes(m)},
    norm AS (
      SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
      FROM seeded
    ),
    w AS (SELECT doc_id, string_split(t, ' ') AS ws FROM norm WHERE t <> ''),
    uni AS (SELECT doc_id, unnest(ws) AS g FROM w),
    bg AS (
      SELECT doc_id, list_extract(ws, i) || ' ' || list_extract(ws, i + 1) AS g
      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM w)
    ),
    grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bg),
    sc AS (
      SELECT doc_id, COALESCE(w, 0) AS w
      FROM (SELECT doc_id,
                   CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) % {B} AS bucket
            FROM grams)
      LEFT JOIN clf_w USING (bucket)
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(w) AS BIGINT) AS score_micro
      FROM sc GROUP BY doc_id
    )
    SELECT s.doc_id,
           COALESCE(n_grams, 0) AS n_grams,
           COALESCE(score_micro, 0) AS score_micro,
           CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
                ELSE ROUND((score_micro + {bias} * n_grams)
                           / (n_grams * 1000000.0), 6)
           END AS mean_score,
           CASE WHEN COALESCE(n_grams, 0) = 0 THEN 'empty'
                WHEN score_micro + {bias} * n_grams >= 0 THEN 'keep'
                ELSE 'drop'
           END AS quality_label
    FROM seeded s LEFT JOIN agg USING (doc_id) ORDER BY doc_id
    """


@_q("quality_classifier", _clf_oracle_sql)  # callable: resolved lazily
def q_quality_classifier(spark, sf_dir):
    """DCLM/fastText-style hashed-ngram quality classifier (Joulin et
    al. 2016; Li et al. 2024): score every document with the build-time
    linear model (seed corpus vs generated junk) and keep/drop by the
    exact integer decision rule — the model-based quality axis public
    pipelines run next to the CCNet perplexity filter (lm_perplexity).
    Two junk families are SEEDED so both decision sides + the hashed
    OOV path fire: keyword-stuffed spam and boilerplate chrome (the
    word lists are shared constants with the training negatives); a
    whitespace-only family exercises the 'empty' label. Scores are
    exact integer micro-unit sums over md5-bucketed grams
    (functions/classifier.py), so the oracle matches bit-for-bit."""
    from .functions.classifier import BOILER_WORDS, SPAM_WORDS, score_quality

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    spam = " ".join(SPAM_WORDS)
    boiler = " ".join(BOILER_WORDS)
    seeded = (
        docs.unionByName(
            docs.filter(d % 20 == 0).select(
                (d + 1000000).alias("doc_id"),
                F.repeat(
                    F.concat(
                        F.lit(spam + " v"),
                        (d % 7).cast("string"),
                        F.lit(" "),
                    ),
                    3,
                ).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 30 == 0).select(
                (d + 2000000).alias("doc_id"),
                F.repeat(F.lit(boiler + " "), 4).alias("text"),
            )
        )
        .unionByName(
            docs.filter(d % 100 == 0).select(
                (d + 3000000).alias("doc_id"), F.lit("   ").alias("text")
            )
        )
    )
    return (
        score_quality(_spread(spark, seeded))
        .select("doc_id", "n_grams", "score_micro", "mean_score", "quality_label")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Registration-order control: the driver samples its correctness run in
# Q's insertion order (50 of N), so each round's NEW queries — the
# least-proven surface — must come FIRST (VERDICT r5 #5). Names listed
# here are moved to the front of Q; ORACLE is key-lookup only, so its
# order doesn't matter (and reordering it would force lazy resolution).
# ---------------------------------------------------------------------------

_NEWEST_FIRST: list[str] = [
    # round-6 additions, newest first
    "webtext_to_shards",
    "url_quality_filter",
    "semantic_dedup",
    "webtext_pipeline_full",
    "quality_classifier",
    "webtext_pipeline_fuzzy",
    "token_pack_shards",
    # r5 queries redefined in r6 (sf0.01 multi-table vocab + seeded
    # compound family) — least-proven surface, sample them early too
    "bpe_token_counts",
    "bpe_token_windows",
]


def _reorder_newest_first() -> None:
    head = {n: Q[n] for n in _NEWEST_FIRST if n in Q}
    tail = {k: v for k, v in Q.items() if k not in head}
    Q.clear()
    Q.update(head)
    Q.update(tail)


_reorder_newest_first()
