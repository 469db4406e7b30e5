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


def test_minhash_band_join_shuffles_narrow_rows(spark):
    """The LSH band self-join + candidate dedup must shuffle only
    (id, band) rows — the 64-long signature arrays rejoin AFTER the
    dedup (round-3 restructure: sig bytes out of the widest shuffle)."""
    import pandas as pd

    from tsfeatures_spark.operators.dedup import minhash_lsh_pairs

    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(8)],
                        "text": [f"text number {i} lorem ipsum" for i in range(8)]})
    df = spark.createDataFrame(pdf)
    plan = _plan(minhash_lsh_pairs(df))
    # find every Exchange block and assert none of them carries `sig`
    # except the ones feeding the final (post-dedup) signature rejoin:
    # the dedup (HashAggregate on id_a/id_b) must sit ABOVE band Exchanges
    # that are sig-free. Concretely: the Exchange feeding the aggregate
    # partial keys (id_a, id_b) must not list sig in its output.
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange hashpartitioning(band_id" in ln:
            assert "sig" not in ln, f"band shuffle carries sig: {ln}"


def test_tok_rollup_tiers_query_shuffle_free(spark):
    """The driver-gate tier-cascade query (all three tiers over documents)
    compiles to scan -> single mapInPandas, zero Exchange."""
    plan = _plan(em.tok_rollup_tiers(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan


def test_ivf_plan_has_no_cartesian(spark):
    """Probe-all IVF stays a cell-equi-join + broadcast — never a
    cartesian/nested-loop product."""
    plan = _plan(em.emb_ann_ivf(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
