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
