"""Physical-plan hygiene: the properties that matter at 100 TB.

- the tier cascade and wide feature extraction are shuffle-free
  (no Exchange node)
- filters reach the parquet scan (PushedFilters)
- small dimension joins broadcast (BroadcastHashJoin), no sort-merge join
  on the dimension side
"""

import __spark_entry__ as em


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_rollup_plan_is_shuffle_free(spark):
    from tsfeatures_spark.operators.rollup import rollup_tiers
    from tsfeatures_spark.sources.generator import token_table

    plan = _plan(rollup_tiers(token_table(spark, 4, partitions=2, mean_len=200)))
    assert "Exchange" not in plan
    assert any(n in plan for n in ("MapInArrow", "PythonMapInArrow",
                                   "MapInPandas", "FlatMapGroupsInPandas"))


def test_features_wide_plan_is_shuffle_free(spark):
    from tsfeatures_spark.operators.features import features_wide
    from tsfeatures_spark.sources.generator import token_table

    plan = _plan(features_wide(token_table(spark, 4, partitions=2, mean_len=200),
                               features=["statistics"], scale=False))
    assert "Exchange" not in plan


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(em.q1_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_dim_joins_broadcast(spark):
    plan = _plan(em.q5_nation_revenue(spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region at minimum


def test_scan_prunes_columns(spark):
    # q1 projects 6 of 11 lineitem columns; the ReadSchema must not contain
    # the unused ones (column pruning reached the scan)
    plan = _plan(em.q1_pricing_summary(spark, "/root/testdata/sf0.001"))
    assert "l_partkey" not in plan and "l_suppkey" not in plan
