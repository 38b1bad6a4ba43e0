"""Physical-plan shape assertions — the scale contract, checked.

These pin the properties that matter at 100 TB: predicate pushdown to
the parquet scan, column pruning, broadcast joins for dims/anti-joins,
and whole-stage codegen coverage (the JVM-side fast path).
"""

from conftest import SF_ORACLE


def _plan(df, mode="formatted"):
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def explain_str(df):
    # public-API route: capture explain output via the analyzed plan
    from contextlib import redirect_stdout
    import io

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_and_pruning(spark):
    from downloader_spark.queries import Q

    plan = explain_str(Q["seen_antijoin"](spark, SF_ORACLE))
    assert "PushedFilters: [In(source" in plan  # predicate reached the scan
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan  # pruned


def test_broadcast_joins(spark):
    from downloader_spark.queries import Q

    plan = explain_str(Q["fetch_join"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan  # dim side broadcast, no shuffle join
    plan = explain_str(Q["seen_antijoin"](spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_whole_stage_codegen_on_agg(spark):
    from contextlib import redirect_stdout
    import io

    from downloader_spark.queries import Q

    df = Q["wave_metrics"](spark, SF_ORACLE)
    plan = explain_str(df)
    assert "HashAggregate" in plan  # partial+final hash agg, not sort-agg
    # AQE hides WSCG markers in 'formatted' until execution → use the
    # codegen explain mode, which compiles the subtrees up front
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()


def test_topk_is_take_ordered(spark):
    from downloader_spark.queries import Q

    plan = explain_str(Q["exec_history_page"](spark, SF_ORACLE))
    # global LIMIT+ORDER plans as TakeOrderedAndProject — no full sort
    assert "TakeOrderedAndProject" in plan


def test_extract_pipeline_is_arrow_eval(spark):
    from downloader_spark.queries import Q

    plan = explain_str(Q["extract_lang_profile"](spark, SF_ORACLE))
    # the only Python in the plan is the Arrow-batched UDF (no RDDs,
    # no row-at-a-time PythonUDF)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_fanout_single_arrow_eval(spark):
    from downloader_spark.queries import Q

    import re

    plan = explain_str(Q["multi_format_fanout"](spark, SF_ORACLE))
    # one scan → one Arrow UDF → explode; never a Python node per format
    # ("formatted" prints each node twice: once in the tree, once in the
    # detail section — count numbered detail entries)
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "Generate" in plan  # the format explode


def test_ivf_probe_is_kernel_scored_no_pair_join(spark):
    """The r7 float IVF probe: candidates are scored inside ONE
    mapInPandas kernel (per-batch top-k supersets), so the plan has NO
    pair join at all — no HashJoin carrying vector payloads, no
    nested-loop, no row-at-a-time Python. The only other Python node is
    the Arrow-batched centroid-assignment UDF on the candidate side
    (exactly one — the kernel reads `_c` without a join, so the old
    eqNullSafe double-eval hazard is structurally gone)."""
    import re

    from pyspark.sql import functions as F

    from downloader_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qry = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = explain_str(ivf_topk(emb, qry, k=3, n_centroids=4, nprobe=2, iters=1))
    assert "Join" not in plan  # the pair join is gone entirely
    assert "BatchEvalPython" not in plan
    assert len(re.findall(r"\(\d+\) MapInPandas", plan)) == 1
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1


def test_exact_near_dup_guard_means_lsh_default_no_nested_loop(spark):
    """The DEFAULT embedding_near_dups path must be the LSH bucket join
    — a nested-loop only appears in the opt-in exact verify path."""
    from downloader_spark.operators.similarity import embedding_near_dups

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    plan = explain_str(embedding_near_dups(emb, threshold=0.9, n_planes=8))
    assert "NestedLoop" not in plan
    assert "Join" in plan  # sig-bucket equi-join present


def test_bucketed_pages_join_skips_pages_side_shuffle(spark):
    """Co-located fetch join (SURVEY §4 / task prompt 'bucketing for
    co-located joins'): joining a url-bucketed pages table on url must
    show NO Exchange above the pages scan — only the frontier side
    shuffles to match the bucket count. At 100 TB this is the decision
    that keeps the corpus from re-shuffling every wave."""
    import re

    from pyspark.sql import functions as F

    from downloader_spark.sources.bucketed import (
        read_bucketed_pages,
        write_bucketed_pages,
    )
    from downloader_spark.sources.pagegen import pages_from_documents

    pages = pages_from_documents(spark, SF_ORACLE).select("url", "html")
    write_bucketed_pages(pages, table="t_pages_bucketed", buckets=8)
    try:
        bucketed = read_bucketed_pages(spark, "t_pages_bucketed")
        frontier = spark.range(200).select(
            F.concat(
                F.lit("http://src"), (F.col("id") % 20).cast("string"),
                (F.col("id") % 97).cast("string"), F.lit(".example/doc/"),
                F.col("id").cast("string"),
            ).alias("url")
        )
        # 'merge' hint: at a real frontier size this is a shuffle join
        # anyway (a toy frontier would get broadcast, proving nothing)
        joined = frontier.hint("merge").join(bucketed, "url")
        plan = explain_str(joined)
        # exactly ONE Exchange — the frontier side; the bucketed scan
        # feeds its join leg with no shuffle (and no sort: bucket files
        # are sortBy(url))
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 1, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() > 0  # and it actually runs
    finally:
        spark.sql("DROP TABLE IF EXISTS t_pages_bucketed")


def test_stored_ivf_index_probe_prunes_partitions(spark, tmp_path):
    """A path-stored IVF index is parquet PARTITIONED BY the inverted
    list id; a probe must only read the probed lists' files — at 100 TB
    this is what makes a probe O(probed lists), not O(index). r7: probe
    lists are derived driver-side, so the pruning is a STATIC partition
    filter on `_c` (stronger than the old dynamic pruning — resolved at
    plan time, no subquery broadcast), and the scan must show it."""
    from pyspark.sql import functions as F

    from downloader_spark.operators.similarity import build_ivf_index, ivf_probe

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    qry = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    index = build_ivf_index(
        emb, n_centroids=16, iters=1, path=str(tmp_path / "ivf_idx")
    )
    plan = explain_str(ivf_probe(index, qry, k=3, nprobe=2))
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*_c[^\]]*)\]", plan)
    assert m, plan  # the _c IN (...) filter reached the partitioned scan
    # and the quantized probe (old join path) keeps its dynamic pruning
    # eligibility: the sq8 probe still joins on the partition column
    sq8 = build_ivf_index(
        emb, n_centroids=16, iters=1, path=str(tmp_path / "ivf_sq8"),
        quantize="sq8",
    )
    plan_q = explain_str(ivf_probe(sq8, qry, k=3, nprobe=2, rerank_from=emb))
    assert "dynamicpruning" in plan_q.lower()


def test_round4_text_operators_stay_native(spark):
    """The r4 operator family (span removal, chunking, PII, gopher,
    pipeline) must contain ZERO Python eval nodes — all native
    column work — and drop_repeated_spans' frequent-line flag join
    must not be a nested loop."""
    from downloader_spark.queries import Q

    for name in (
        "drop_repeated_spans", "token_windows", "pii_redact",
        "webtext_pipeline", "doc_fingerprints",
    ):
        plan = explain_str(Q[name](spark, SF_ORACLE))
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # gopher_quality opted into the r6 Arrow repetition fast path
    # (bit-exact vs the native reference, tests/test_repetition_arrow):
    # exactly ONE ArrowEvalPython node, still no row-at-a-time Python
    # and no nested loop. (webtext_pipeline uses the same fast path in
    # its gate, but the gate is checkpoint-materialized, so its final
    # plan shows zero Python — asserted above.)
    import re

    plan = explain_str(Q["gopher_quality"](spark, SF_ORACLE))
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lm_perplexity_broadcasts_model_no_python(spark):
    """The r5 perplexity scorer's scale contract: BOTH model tables
    (pair + context) reach the bigram stream as broadcast hash joins —
    the corpus text never shuffles into the lookup — the per-doc sum
    partial-aggregates map-side, and there is zero Python in the plan.
    The only non-broadcast join is the doc_id join-back (same
    cardinality both sides at scale: correctly NOT a broadcast)."""
    import re

    from downloader_spark.queries import Q

    plan = explain_str(Q["lm_perplexity"](spark, SF_ORACLE))
    assert len(re.findall(r"BroadcastHashJoin", plan)) >= 2
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial aggregation before the exchange (map-side combine)
    assert "partial_count" in plan or "partial_sum" in plan
