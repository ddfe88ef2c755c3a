"""Catalyst physical-plan audits: the 100-TB checklist from SURVEY.md §4.2
asserted against actual `executedPlan` strings — filters pushed to the
parquet scan, columns pruned before the Python boundary, small sides
broadcast, aggregations partial+final, and no cartesian products anywhere
in the query surface."""

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q3_broadcasts_dims_and_pushes_filters(spark):
    from colonnade_spark.queries import q_tpch_shipping_priority

    plan = _plan(q_tpch_shipping_priority(spark, SF))
    # both dimension joins broadcast: the fact side (lineitem) never shuffles
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    # predicate pushdown reached the scans
    assert "PushedFilters: [IsNotNull(c_mktsegment)" in plan \
        or "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan


def test_scan_prunes_columns_before_python_boundary(spark):
    from colonnade_spark.queries import registry

    fn, _ = registry()["rt_fsst_text"]
    plan = _plan(fn(spark, SF))
    # only the selected columns reach the scan (lang/source/n_chars pruned)
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan, plan


def test_aggregations_are_partial_plus_final(spark):
    from colonnade_spark.queries import q_dedup_exact, q_events_window

    for q in (q_dedup_exact, q_events_window):
        plan = _plan(q(spark, SF))
        # map-side combine: two HashAggregate levels around the exchange
        assert plan.count("HashAggregate") >= 2, plan


def test_no_cartesian_anywhere_in_query_surface(spark):
    """Every registry query except the two explicit exact-oracle baselines
    (all-pairs by definition) must plan without cartesian products."""
    from colonnade_spark.queries import registry

    allowed_cartesian = {"embedding_neardup", "ann_topk"}  # exact baselines
    for name, (fn, _sql) in registry().items():
        plan = _plan(fn(spark, SF))
        if name in allowed_cartesian:
            continue
        assert "CartesianProduct" not in plan, f"{name}: {plan[:2000]}"


def test_encode_staging_plan_shape(spark):
    """The staging plan: salt-map join is broadcast (tiny per-repo sizes
    table), the repartition is a single hash exchange on __bucket."""
    from colonnade_spark import engine
    from colonnade_spark.plan import corpus_plan
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    corpus = docs.selectExpr("source as repo",
                             "cast(doc_id as string) as path",
                             "md5(text) as commit", "lang",
                             "text as content")
    plan_obj = corpus_plan()
    bucketed = engine.assign_buckets(plan_obj.project(corpus), plan_obj, 8)
    staged = (bucketed.repartition(8, F.col("__bucket"))
              .sortWithinPartitions(*plan_obj.stage_order))
    plan = _plan(staged)
    assert "BroadcastHashJoin" in plan, plan          # salt map broadcast
    assert plan.count("Exchange") <= 3, plan           # agg + repartition
    assert "CartesianProduct" not in plan, plan
