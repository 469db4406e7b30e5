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
    # the tiny test input auto-broadcasts the band join (no band Exchange
    # at all — the r03 test passed vacuously, ADVICE r03); disable
    # auto-broadcast so the plan compiles the shuffle form this test pins
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(minhash_lsh_pairs(df))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # find every Exchange block and assert none of them carries `sig`
    # except the ones feeding the final (post-dedup) signature rejoin:
    # the dedup (HashAggregate on id_a/id_b) must sit ABOVE band Exchanges
    # that are sig-free. Concretely: the Exchange feeding the aggregate
    # partial keys (id_a, id_b) must not list sig in its output.
    lines = plan.splitlines()
    band_exchanges = [ln for ln in lines
                      if "Exchange hashpartitioning(band_id" in ln]
    # guard against vacuous passes if Spark's plan rendering changes
    # (ADVICE r03): the narrow-shuffle property is only checked if the
    # band Exchange lines were actually found
    assert band_exchanges, f"no band Exchange found in plan:\n{plan[:2000]}"
    for ln in band_exchanges:
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


def test_ivf_cell_assignment_projects_scores_once(spark):
    """The corpus-side cell argmax references the literal-centroid score
    array exactly once per centroid (single aggregate pass) — the old
    array_position(scores, array_max(scores)) form expanded the whole
    expression tree twice per row (VERDICT r03 #7)."""
    import numpy as np

    from tsfeatures_spark.operators.similarity import _cell_scores, argmax_expr

    df = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id int, embedding array<float>")
    C = np.eye(3)
    cell = df.select(argmax_expr(_cell_scores("embedding", C)).alias("_cell"))
    plan = cell._jdf.queryExecution().optimizedPlan().toString()
    # one zip_with (inside one score entry) per centroid, not two
    assert plan.count("zip_with") == len(C), plan[:2000]


def test_ann_shuffle_join_fallback_identical(spark):
    """broadcast_queries=False (oversized query set) degrades to a shuffle
    hash join on the bucket/cell key: identical rows, no BroadcastExchange
    on the query side (VERDICT r03 #4)."""
    import numpy as np

    from tsfeatures_spark.operators.similarity import ivf_topk, lsh_topk

    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(160)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.where("vec_id < 10")

    for fn, kw in ((lsh_topk, dict(bits=4, probe_bits=1)),
                   (ivf_topk, dict(n_cells=4, n_probe=2))):
        bc = fn(df, q, k=3, **kw).toPandas()
        sh_df = fn(df, q, k=3, broadcast_queries=False, **kw)
        plan = sh_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, f"{fn.__name__}: {plan[:1500]}"
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
        sh = sh_df.toPandas()
        key = ["query_id", "neighbor_id", "rank"]
        assert sorted(map(tuple, bc[key].values.tolist())) == \
            sorted(map(tuple, sh[key].values.tolist())), fn.__name__
