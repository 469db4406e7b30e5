"""Operator correctness: gap-fill, skew splitting, dedup with planted
duplicates, similarity recall, incremental rollup, retention."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_gapfill_linear_and_locf(spark):
    from tsfeatures_spark.operators.gapfill import gapfill

    pdf = pd.DataFrame(
        {
            "k": ["a"] * 3 + ["b"] * 2,
            "window_id": [0, 2, 5, 10, 13],
            "mean": [1.0, 3.0, 9.0, 4.0, 10.0],
        }
    )
    df = spark.createDataFrame(pdf)
    lin = gapfill(df, ["k"], "window_id", ["mean"], mode="linear").toPandas().sort_values(["k", "window_id"])
    a = lin[lin.k == "a"]["mean_filled"].to_numpy()
    np.testing.assert_allclose(a, [1.0, 2.0, 3.0, 5.0, 7.0, 9.0])  # exact interval interpolation
    b = lin[lin.k == "b"]["mean_filled"].to_numpy()
    np.testing.assert_allclose(b, [4.0, 6.0, 8.0, 10.0])
    assert lin[lin.k == "a"]["is_gap"].tolist() == [False, True, False, True, True, False]

    locf = gapfill(df, ["k"], "window_id", ["mean"], mode="locf").toPandas().sort_values(["k", "window_id"])
    np.testing.assert_allclose(locf[locf.k == "a"]["mean_filled"].to_numpy(), [1, 1, 3, 3, 3, 9])


def test_gapfill_pathological_span_is_bounded(spark):
    """A key with a multi-year hole must raise a clear error instead of
    materializing millions of grid rows in one explode (VERDICT r03 #6);
    keys under the cap are unaffected, and max_span=None opts out."""
    from tsfeatures_spark.operators.gapfill import gapfill

    pdf = pd.DataFrame({
        "k": ["ok", "ok", "huge", "huge"],
        "window_id": [0, 3, 0, 50_000_000],
        "mean": [1.0, 2.0, 5.0, 6.0],
    })
    df = spark.createDataFrame(pdf)
    with pytest.raises(Exception, match="max_span"):
        gapfill(df, ["k"], "window_id", ["mean"], max_span=1000).toPandas()
    ok = gapfill(df.where("k = 'ok'"), ["k"], "window_id", ["mean"],
                 max_span=1000).toPandas()
    assert len(ok) == 4


def test_split_giant_docs_preserves_windows(spark):
    from tsfeatures_spark.operators.rollup import rollup_doc
    from tsfeatures_spark.operators.skew import DAY, split_giant_docs
    from tsfeatures_spark.sources.generator import gen_pandas

    # build one giant doc (> 4 days) + small ones
    rng = np.random.default_rng(11)
    giant = rng.integers(0, 5000, size=5 * DAY + 1234).astype(np.int32)
    pdf = gen_pandas(42, np.arange(3), mean_len=500)
    pdf = pd.concat([pdf, pd.DataFrame({"doc_id": ["giant-1"], "tokens": [giant],
                                        "n_tok": [len(giant)], "source": ["web"]})], ignore_index=True)
    df = spark.createDataFrame(pdf)
    out = split_giant_docs(df, max_tok=4 * DAY).toPandas()
    g = out[out.doc_id == "giant-1"].sort_values("seg_id")
    assert len(g) == 2  # 4-day segment + remainder
    assert g.iloc[0]["seg_start"] == 0 and g.iloc[1]["seg_start"] == 4 * DAY
    rejoined = np.concatenate([np.asarray(t) for t in g["tokens"]])
    assert np.array_equal(rejoined, giant)
    # every segment boundary is day-aligned => 1d windows never straddle
    assert all(s % DAY == 0 for s in g["seg_start"])
    # small docs pass through untouched
    small = out[out.doc_id != "giant-1"]
    assert (small.seg_id == 0).all() and len(small) == 3


def test_exact_dedup_planted(spark):
    from tsfeatures_spark.operators.dedup import exact_dedup

    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c", "d", "e"],
            "text": ["same text", "same text", "unique one", "same text", "other"],
        }
    )
    out = exact_dedup(spark.createDataFrame(pdf)).toPandas()
    grp = out[out.dup_count == 3]
    assert len(grp) == 1 and grp.iloc[0]["canonical_id"] == "a"
    assert out.dup_count.sum() == 5


def test_minhash_lsh_finds_planted_near_dups(spark):
    from tsfeatures_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    near = base.replace("lazy", "sleepy")  # high jaccard
    rng = np.random.default_rng(2)
    others = [" ".join(rng.choice(list("abcdefghij"), 60)) for _ in range(20)]
    pdf = pd.DataFrame(
        {"doc_id": ["dup1", "dup2"] + [f"r{i}" for i in range(20)],
         "text": [base, near] + others}
    )
    pairs = minhash_lsh_pairs(spark.createDataFrame(pdf), num_hashes=32, bands=8).toPandas()
    hit = pairs[(pairs.id_a == "dup1") & (pairs.id_b == "dup2")]
    assert len(hit) == 1 and hit.iloc[0]["est_jaccard"] > 0.5


def test_simhash_hamming_zero_for_identical(spark):
    from tsfeatures_spark.operators.dedup import simhash_near_pairs

    pdf = pd.DataFrame({"doc_id": ["x", "y", "z"], "text": ["hello world document", "hello world document", "completely different stuff here"]})
    out = simhash_near_pairs(spark.createDataFrame(pdf), max_hamming=3).toPandas()
    assert set(zip(out.id_a, out.id_b)) == {("x", "y")}
    assert out.iloc[0]["hamming"] == 0


def test_brute_topk_exact_vs_numpy(spark):
    from tsfeatures_spark.operators.similarity import brute_topk

    rng = np.random.default_rng(9)
    V = rng.normal(size=(40, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(40), "embedding": [v for v in V]})
    df = spark.createDataFrame(pdf)
    out = brute_topk(df, df.where(F.col("vec_id") < 3), k=4).toPandas()
    Vd = V.astype(np.float64)
    sims = (Vd @ Vd.T) / (np.linalg.norm(Vd, axis=1)[:, None] * np.linalg.norm(Vd, axis=1)[None, :])
    for q in range(3):
        s = sims[q].copy()
        s[q] = -np.inf
        expect = set(np.argsort(-s)[:4])
        got = set(out[out.query_id == q].sort_values("rank")["neighbor_id"])
        assert got == expect, q


def test_lsh_topk_recall(spark):
    from tsfeatures_spark.operators.similarity import brute_topk, lsh_topk

    rng = np.random.default_rng(4)
    V = rng.normal(size=(120, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(120), "embedding": [v for v in V]})
    df = spark.createDataFrame(pdf)
    q = df.where(F.col("vec_id") < 10)
    exact = brute_topk(df, q, k=3).toPandas()
    approx = lsh_topk(df, q, k=3, bits=4).toPandas()
    # bucketed ANN trades recall; with 4 bits expect a sane fraction of
    # exact top-3 recovered, never zero
    hits = 0
    for qi in range(10):
        e = set(exact[exact.query_id == qi]["neighbor_id"])
        a = set(approx[approx.query_id == qi]["neighbor_id"])
        hits += len(e & a)
    assert hits >= 10  # >= 1/3 recall at tiny scale


def test_lsh_multiprobe_recall_monotone(spark):
    """Margin-ordered multi-probe: recall@k must be monotone in
    probe_bits and reach full recall when every bucket is probed
    (probe_bits == bits covers all single-flip neighbors; with bits=2
    that is 3 of 4 buckets — plus the own bucket's complement flip,
    every vector is within hamming 2, so use bits=2/probe=3 exhaustive)."""
    from tsfeatures_spark.operators.similarity import brute_topk, lsh_topk

    rng = np.random.default_rng(11)
    V = rng.normal(size=(150, 16)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(150), "embedding": [v for v in V]})
    df = spark.createDataFrame(pdf)
    q = df.where(F.col("vec_id") < 8)
    exact = brute_topk(df, q, k=3).toPandas()

    def recall(probe_bits):
        a = lsh_topk(df, q, k=3, bits=4, probe_bits=probe_bits).toPandas()
        hits = 0
        for qi in range(8):
            e = set(exact[exact.query_id == qi]["neighbor_id"])
            hits += len(e & set(a[a.query_id == qi]["neighbor_id"]))
        return hits / (8 * 3)

    r0, r2, r4 = recall(0), recall(2), recall(4)
    assert r0 <= r2 + 1e-9 and r2 <= r4 + 1e-9
    assert r4 > r0  # probing strictly helps on random gaussian data
    assert r2 >= 0.5  # 3 of 16 buckets scanned already recovers half


def test_incremental_rollup_and_retention(spark, tmp_path):
    from tsfeatures_spark.plans import ResumableRollupJob, bootstrap_tokens
    from tsfeatures_spark.sources.catalog import IcebergLiteCatalog
    from tsfeatures_spark.sources.generator import token_table
    from tsfeatures_spark.streaming import apply_retention, incremental_rollup

    cat = IcebergLiteCatalog(str(tmp_path / "wh"))
    bootstrap_tokens(spark, cat, "tokens", n_docs=12, n_buckets=4, mean_len=400)
    ResumableRollupJob(spark, cat, "tokens", n_buckets=4, waves=2).run()
    base_rows = cat.read(spark, "tiers").count()

    # append 5 new docs -> incremental processes ONLY them
    more = (
        token_table(spark, 5, base_seed=99, mean_len=400)
        .withColumn("doc_id", F.concat(F.lit("new-"), "doc_id"))  # avoid id collision with batch 1
        .withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4)))
    )
    cat.commit(spark, "tokens", more, mode="append", partition_by=["bucket"])
    stats = incremental_rollup(spark, cat, "tokens", "tiers")
    assert stats["processed_docs"] == 5
    after = cat.read(spark, "tiers")
    assert after.count() > base_rows
    assert after.select("doc_id").distinct().count() == 17

    # idempotent: nothing new -> no-op
    stats2 = incremental_rollup(spark, cat, "tokens", "tiers")
    assert stats2["processed_docs"] == 0

    # retention: keep only last 2 x 1m windows per doc; other tiers intact
    v = apply_retention(spark, cat, "tiers", horizon={"1m": 2})
    kept = cat.read(spark, "tiers").toPandas()
    per_doc = kept[kept.tier == "1m"].groupby("doc_id")["window_id"].count()
    assert (per_doc <= 2).all()
    # time travel still shows the pre-retention state
    pre = cat.read(spark, "tiers", snapshot_id=v - 1).count()
    assert pre > len(kept)


def test_features_long_with_freq_inference(spark):
    import pandas as pd
    from tsfeatures_spark.kernels import compute_features
    from tsfeatures_spark.kernels.fixtures import USAccDeaths
    from tsfeatures_spark.operators.features import features_long

    ds = pd.date_range("2000-01-31", periods=len(USAccDeaths), freq="ME")
    pdf = pd.DataFrame({"unique_id": "usacc", "ds": ds, "y": USAccDeaths})
    out = features_long(
        spark.createDataFrame(pdf), freq=None,
        features=["acf_features", "statistics", "crossing_points"], scale=False,
    ).toPandas().set_index("unique_id")
    exp = compute_features(USAccDeaths, 12, ["acf_features", "statistics", "crossing_points"], scale=False)
    for k, v in exp.items():
        g = out.loc["usacc", k]
        assert (np.isnan(g) and np.isnan(v)) or np.isclose(g, v, rtol=1e-12), k


def test_stream_rollup_available_now(spark, tmp_path):
    """Streaming front-end: two file drops -> two micro-batch drains; the
    checkpoint makes the second drain process only the new files."""
    from tsfeatures_spark.sources.generator import gen_pandas
    from tsfeatures_spark.streaming.stream_rollup import run_stream

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = gen_pandas(42, np.arange(4), mean_len=300)
    spark.createDataFrame(batch1).write.mode("append").parquet(landing)
    run_stream(spark, landing, out, ckpt, available_now=True)
    n1 = spark.read.parquet(out).select("doc_id").distinct().count()
    assert n1 == 4

    batch2 = gen_pandas(7, np.arange(3), mean_len=300)
    batch2["doc_id"] = "b2-" + batch2["doc_id"]
    spark.createDataFrame(batch2).write.mode("append").parquet(landing)
    run_stream(spark, landing, out, ckpt, available_now=True)
    got = spark.read.parquet(out)
    assert got.select("doc_id").distinct().count() == 7
    assert set(got.select("tier").distinct().toPandas()["tier"]) == {"1m", "1h", "1d"}


def test_rollup_split_giant_equals_unsplit(spark):
    """Skew path end-to-end: rolling up day-aligned segments of a giant doc
    yields row-identical output (features, blocks, digests) to the unsplit
    cascade."""
    from tsfeatures_spark.operators.rollup import rollup_tiers
    from tsfeatures_spark.operators.skew import DAY

    rng = np.random.default_rng(21)
    giant = rng.integers(0, 6000, size=2 * DAY + 777).astype(np.int32)
    pdf = pd.DataFrame({"doc_id": ["g"], "tokens": [giant],
                        "n_tok": [len(giant)], "source": ["web"]})
    df = spark.createDataFrame(pdf)
    cols = ["doc_id", "tier", "window_id", "n", "mean", "variance", "x_acf1",
            "entropy", "flat_spots", "block_digest"]
    plain = rollup_tiers(df).select(cols).toPandas().sort_values(["tier", "window_id"]).reset_index(drop=True)
    split = rollup_tiers(df, split_giant_tok=DAY).select(cols).toPandas().sort_values(["tier", "window_id"]).reset_index(drop=True)
    assert len(plain) == len(split)
    pd.testing.assert_frame_equal(plain, split)


def test_decode_blocks_and_reconstruct_tokens(spark):
    """Read-side compression invariants inside Spark: 1m blocks decode to
    the exact raw tokens; the full token array reassembles from blocks
    alone (raw-tier retirement is lossless)."""
    from tsfeatures_spark.operators.decode import decode_blocks, reconstruct_tokens
    from tsfeatures_spark.operators.rollup import rollup_tiers
    from tsfeatures_spark.sources.generator import gen_doc, token_table

    tiers = rollup_tiers(token_table(spark, 6, partitions=2, mean_len=700)).cache()
    dec = decode_blocks(tiers.where(F.col("tier") == "1m")).toPandas()
    # spot-check one window against the generator
    row = dec[dec.doc_id == dec.doc_id.iloc[0]].sort_values("window_id").iloc[0]
    i = int(row.doc_id.split("-")[-1])
    _, toks, _ = gen_doc(42, i, mean_len=700)
    np.testing.assert_array_equal(np.asarray(row["values"]), toks[:60].astype(float)[: len(row["values"])])

    rebuilt = reconstruct_tokens(tiers).toPandas().set_index("doc_id")
    for doc_id in rebuilt.index:
        i = int(doc_id.split("-")[-1])
        _, toks, _ = gen_doc(42, i, mean_len=700)
        np.testing.assert_array_equal(np.asarray(rebuilt.loc[doc_id, "tokens"]), toks.astype(np.int64))
    tiers.unpersist()


def test_near_dup_pipeline_end_to_end(spark):
    from tsfeatures_spark.operators.dedup import near_dup_pipeline

    base = "the quick brown fox jumps over the lazy dog and runs far away " * 6
    near = base.replace("lazy", "sleepy").replace("far", "quite far")
    rng = np.random.default_rng(3)
    noise = [" ".join(rng.choice(list("abcdefghijklmn"), 70)) for _ in range(25)]
    pdf = pd.DataFrame({"doc_id": ["d1", "d2"] + [f"n{i}" for i in range(25)],
                        "text": [base, near] + noise})
    out = near_dup_pipeline(spark.createDataFrame(pdf), min_est=0.3, min_jaccard=0.35).toPandas()
    # word repetition shrinks the distinct-gram sets: exact 3-gram jaccard
    # of the planted pair is ~0.42 despite ~0.65 char-shingle similarity
    assert set(zip(out.id_a, out.id_b)) == {("d1", "d2")}
    assert out.iloc[0]["jaccard"] > 0.35


def test_rebalance_by_cost_balances_and_avoids_global_window(spark):
    """Cost-balanced repartition: every partition's token mass stays near
    total/n, rows survive intact, and the plan contains NO unpartitioned
    full-table window (the single-task scale-killer)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tsfeatures_spark.operators.skew import rebalance_by_cost

    # skewed costs: 3 giants + 197 small docs
    rows = [(f"d{i:03d}", 100_000 if i < 3 else 500) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    n_parts = 8
    out = rebalance_by_cost(df, n_parts, "n_tok")
    assert out.count() == 200
    per = (
        out.withColumn("_p", F.spark_partition_id())
        .groupBy("_p").agg(F.sum("n_tok").alias("c")).toPandas()
    )
    total = 3 * 100_000 + 197 * 500
    per_part = total // n_parts + 1
    # no partition may exceed one quantum + the largest single row
    assert per["c"].max() <= per_part + 100_000
    # the only Window.orderBy without partitionBy acts on the B-row offset
    # aggregate, never on the full input: check the input-side window is
    # partitioned
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[.*?\]", plan)
    full_table_windows = [w for w in windows if "n_tok" in w and "partitionBy" not in w and "_bkt" not in w]
    assert not full_table_windows, f"unpartitioned window over the data: {full_table_windows}"


def test_ngram_jaccard_max_df_bounds_posting_lists(spark):
    """With a df cap, hot grams are dropped from the gram universe on BOTH
    sides of the jaccard; pairs supported only by boilerplate disappear
    while genuinely-overlapping pairs survive."""
    from tsfeatures_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "the quick brown fox jumps over the lazy dog"
    rows = [(f"d{i}", boiler) for i in range(10)]
    rows += [("x1", "alpha beta gamma delta epsilon zeta"),
             ("x2", "alpha beta gamma delta epsilon eta")]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    exact = ngram_jaccard_pairs(df, max_df=None, min_jaccard=0.1).toPandas()
    capped = ngram_jaccard_pairs(df, max_df=5, min_jaccard=0.1).toPandas()
    # boilerplate grams have df=10 > 5: the 45 boiler-boiler pairs vanish
    assert len(exact) >= 45
    boiler_pairs = capped[capped.id_a.str.startswith("d") & capped.id_b.str.startswith("d")]
    assert len(boiler_pairs) == 0
    # the informative near-dup pair survives with its exact jaccard
    xp = capped[(capped.id_a == "x1") & (capped.id_b == "x2")]
    assert len(xp) == 1
    ex = exact[(exact.id_a == "x1") & (exact.id_b == "x2")]
    assert abs(float(xp.jaccard.iloc[0]) - float(ex.jaccard.iloc[0])) < 1e-12


def test_embedding_dup_pairs_lsh_default_recall(spark):
    """The DEFAULT path must be the LSH-blocked join (no crossJoin in the
    plan) and must recover planted near-duplicates."""
    import numpy as np

    from tsfeatures_spark.operators.dedup import embedding_dup_pairs

    rng = np.random.default_rng(0)
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted near-dup: tiny perturbation -> cosine ~ 1
        rows.append((100 + i, [float(x) for x in v + rng.normal(scale=1e-3, size=16)]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = embedding_dup_pairs(df, threshold=0.99, dim=16)  # defaults: block_bits=8
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    pdf = out.toPandas()
    found = {(int(a), int(b)) for a, b in zip(pdf.id_a, pdf.id_b)}
    planted = {(i, 100 + i) for i in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_reshape_roundtrip_and_columns(spark):
    """wide->long->wide is the identity (order restored by the sorted
    collect), and the M4-CSV column layout converts with NULL tails
    trimmed."""
    from tsfeatures_spark.operators.reshape import columns_to_array, long_to_wide, wide_to_long

    rows = [("a", [1.0, 2.0, 3.0]), ("b", [5.0, 4.0])]
    wide = spark.createDataFrame(rows, "doc_id string, tokens array<double>")
    long = wide_to_long(wide)
    assert long.columns == ["doc_id", "ds", "y"]
    got = {(r.doc_id, r.ds, r.y) for r in long.collect()}
    assert got == {("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0), ("b", 1, 5.0), ("b", 2, 4.0)}
    back = long_to_wide(long.repartition(5), id_col="doc_id")
    assert {(r.doc_id, tuple(r.tokens)) for r in back.collect()} == \
        {(d, tuple(t)) for d, t in rows}
    csvish = spark.createDataFrame(
        [("x", 1.0, 2.0, None), ("y", 7.0, None, None)],
        "unique_id string, V1 double, V2 double, V3 double",
    )
    arr = columns_to_array(csvish, "unique_id", ["V1", "V2", "V3"])
    assert {(r.unique_id, tuple(r.tokens)) for r in arr.collect()} == \
        {("x", (1.0, 2.0)), ("y", (7.0,))}


def test_asof_join_matches_pandas_merge_asof(spark):
    """Semantics pinned against pandas.merge_asof on randomized panels:
    backward/forward, exact-match on/off, tolerance."""
    import numpy as np
    import pandas as pd

    from tsfeatures_spark.operators.asof import asof_join

    rng = np.random.default_rng(3)
    lpdf = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 80),
        "t": rng.choice(np.arange(0, 500), 80, replace=False).astype("int64"),
    })
    m_vals = rng.normal(size=40)
    m_vals[rng.choice(40, 8, replace=False)] = np.nan  # NULL right values:
    # the matched row's NULL must come through as NULL, never an older value
    rpdf = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], 40),
        "t": rng.choice(np.arange(0, 500), 40, replace=False).astype("int64"),
        "m": m_vals,
    })
    l = spark.createDataFrame(lpdf)
    # NaN -> true SQL NULL so the ignorenulls path is actually exercised
    r = spark.createDataFrame(rpdf).withColumn(
        "m", F.when(~F.isnan("m"), F.col("m"))
    )
    for direction in ("backward", "forward"):
        for exact in (True, False):
            for tol in (None, 50):
                got = (
                    asof_join(l, r, ["k"], "t", "t", ["m"], direction=direction,
                              tolerance=tol, allow_exact_matches=exact)
                    .toPandas().sort_values(["k", "t"]).reset_index(drop=True)
                )
                exp = pd.merge_asof(
                    lpdf.sort_values("t"), rpdf.sort_values("t"), on="t", by="k",
                    direction=direction, allow_exact_matches=exact,
                    tolerance=None if tol is None else tol,
                ).sort_values(["k", "t"]).reset_index(drop=True)
                pd.testing.assert_series_equal(
                    got["m"], exp["m"], check_names=False,
                    obj=f"asof {direction} exact={exact} tol={tol}",
                )


def test_running_stats_stream_equals_batch(spark, tmp_path):
    """applyInPandasWithState running stats: state carried ACROSS
    micro-batches must equal a from-scratch batch aggregate over all data;
    the watermarked windowed path must equal the batch windowed agg."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tsfeatures_spark.streaming.stateful import running_stats_stream, windowed_stats_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "ts", "value", "event_id"
    )
    landing = str(tmp_path / "landing")
    # two arrival waves -> at least two micro-batches worth of files
    ev.where(F.col("event_id") % 2 == 0).write.parquet(landing + "/a")
    ev.where(F.col("event_id") % 2 == 1).write.parquet(landing + "/b")
    schema = ev.drop("event_id").schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(landing + "/*")
    )
    q = (
        running_stats_stream(stream)
        .writeStream.format("memory").queryName("runstats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = spark.table("runstats").toPandas()
    # memory sink accumulates every update; the FINAL state per key is the
    # row with the largest n
    got = got.sort_values("n").groupby("event_type").last()
    exp = (
        ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_sum"),
            F.avg("value").alias("mean"), F.var_samp("value").alias("variance"),
            F.min("value").alias("vmin"), F.max("value").alias("vmax"),
        ).toPandas().set_index("event_type")
    )
    assert set(got.index) == set(exp.index)
    for c in ("n", "total_sum", "mean", "variance", "vmin", "vmax"):
        pd.testing.assert_series_equal(
            got[c].astype(float).sort_index(), exp[c].astype(float).sort_index(),
            rtol=1e-9, check_names=False, obj=c,
        )

    q2 = (
        windowed_stats_stream(stream, window="1 minute", watermark="2 hours")
        .writeStream.format("memory").queryName("winstats")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True).start()
    )
    q2.awaitTermination()
    got2 = spark.table("winstats").toPandas()
    exp2 = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("event_type", F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .count()
    )
    # append mode emits only watermark-closed windows; with a finite file
    # stream everything except the trailing watermark horizon closes
    assert len(got2) > 0.5 * exp2


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF ANN: cell join only (no crossJoin in the plan) and high recall
    vs exact top-k on clustered data."""
    import numpy as np

    from tsfeatures_spark.operators.similarity import brute_topk, ivf_topk

    rng = np.random.default_rng(4)
    centers = rng.normal(scale=5.0, size=(6, 16))
    rows = []
    for i in range(240):
        c = centers[i % 6]
        rows.append((i, [float(x) for x in c + rng.normal(scale=0.4, size=16)]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    q = df.where(F.col("vec_id") < 12)
    exact = brute_topk(df, q, k=5).toPandas()
    approx_df = ivf_topk(df, q, k=5, n_cells=8, n_probe=2)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    approx = approx_df.toPandas()
    e = {(r.query_id, r.neighbor_id) for r in exact.itertuples()}
    a = {(r.query_id, r.neighbor_id) for r in approx.itertuples()}
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"IVF recall too low: {recall}"


def test_multimodal_real_codecs_roundtrip(spark):
    """PPM and WAV codecs are REAL: byte-exact roundtrips, correct decoded
    metadata through the Spark pipeline, resize/resample primitives."""
    import numpy as np

    from tsfeatures_spark.operators.multimodal import (
        attach_synthetic_media, audio_resample_stride, decode_media,
        image_ahash, image_resize_nn, ppm_decode, ppm_encode,
        wav_decode, wav_encode,
    )

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
    assert np.array_equal(ppm_decode(ppm_encode(img)), img)
    # comment-tolerant header parse
    hdr = b"P6\n# a comment\n47 33\n255\n" + img.tobytes()
    assert np.array_equal(ppm_decode(hdr), img)
    small = image_resize_nn(img, 8, 8)
    assert small.shape == (8, 8, 3)
    assert len(image_ahash(img)) == 16

    samples = (rng.normal(scale=2000, size=777)).astype(np.int16)
    sr, back = wav_decode(wav_encode(samples, 8000))
    assert sr == 8000 and np.array_equal(back, samples)
    down = audio_resample_stride(samples, 8000, 4000)
    assert len(down) == 388 and np.array_equal(down, samples[::2][:388])

    docs = spark.createDataFrame([(f"doc-{i}",) for i in range(40)], "doc_id string")
    meta = decode_media(attach_synthetic_media(docs)).toPandas()
    assert len(meta) == 40 and meta.decode_ok.all()
    imgs = meta[meta.media_type == "image/ppm"]
    auds = meta[meta.media_type == "audio/wav"]
    assert len(imgs) > 5 and len(auds) > 5  # both modalities present
    assert imgs.width.notna().all() and imgs.ahash.notna().all()
    assert auds.sample_rate.isin([8000, 16000]).all() and auds.rms.notna().all()
    # determinism: regenerating yields identical digests
    meta2 = decode_media(attach_synthetic_media(docs)).toPandas()
    assert set(meta.digest) == set(meta2.digest)
    # undecodable format -> decode_ok=false, never a task failure
    from pyspark.sql import functions as F

    bogus = docs.select("doc_id", F.encode(F.lit("\xff\xd8jpegish"), "UTF-8").alias("media"),
                        F.lit("image/jpeg").alias("media_type"))
    bmeta = decode_media(bogus).toPandas()
    assert (~bmeta.decode_ok).all()


def test_decode_media_real_decoder_injection(spark):
    """VERDICT r03 #8: the ``real_decoder`` injection seam. A fake
    Pillow/ffmpeg-class decoder for a format the built-ins cannot handle
    must route through the SAME unified schema / Arrow batching, while
    rows it delegates keep the built-in behavior; without injection the
    unknown format comes back decode_ok=false."""
    import hashlib

    from tsfeatures_spark.operators.multimodal import (
        _decode_one, decode_media, ppm_encode)

    fake_jpeg = b"\xff\xd8\xff\xe0" + b"JPEGBODY" * 4
    ppm = ppm_encode(np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3))
    pdf = pd.DataFrame({
        "doc_id": ["jpg1", "ppm1"],
        "media": [fake_jpeg, ppm],
        "media_type": ["image/jpeg", "image/ppm"],
    })
    df = spark.createDataFrame(pdf)

    # without injection: unknown format is a clean decode_ok=false row
    base = decode_media(df).toPandas().set_index("doc_id")
    assert not base.loc["jpg1", "decode_ok"]
    assert base.loc["ppm1", "decode_ok"]

    def fake_decoder(payload: bytes, media_type: str) -> dict:
        if media_type == "image/jpeg" and payload.startswith(b"\xff\xd8"):
            meta = dict(_decode_one(b"", media_type))  # unified null template
            meta.update(
                n_bytes=len(payload),
                digest=hashlib.sha256(payload).hexdigest(),
                width=64, height=48, mean_r=1.0, mean_g=2.0, mean_b=3.0,
                ahash="f" * 16, decode_ok=True)
            return meta
        return _decode_one(payload, media_type)  # delegate to built-ins

    got = decode_media(df, real_decoder=fake_decoder).toPandas().set_index("doc_id")
    # injected row: decoded through the unified schema
    assert bool(got.loc["jpg1", "decode_ok"])
    assert int(got.loc["jpg1", "width"]) == 64
    assert got.loc["jpg1", "digest"] == hashlib.sha256(fake_jpeg).hexdigest()
    assert got.loc["jpg1", "sample_rate"] is None or np.isnan(got.loc["jpg1", "sample_rate"])
    # delegated row: byte-identical to the uninjected built-in decode
    for c in ("decode_ok", "width", "height", "ahash", "digest", "n_bytes"):
        assert got.loc["ppm1", c] == base.loc["ppm1", c], c


def test_statistics_aggs_array_percentile_matches_numpy(spark):
    """r06: the seven exact quantiles come from ONE array-argument
    percentile aggregate (shared buffer) — values must equal np.quantile
    (linear interpolation) and the per-scalar formulation exactly."""
    from tsfeatures_spark.functions import statistics_aggs

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame({
        "k": np.repeat(["a", "b"], 500),
        "y": np.concatenate([rng.normal(10, 4, 500), rng.lognormal(1, 1, 500)]),
    })
    sdf = spark.createDataFrame(pdf)
    out = (sdf.groupBy("k").agg(*statistics_aggs("y"))
           .toPandas().set_index("k").sort_index())
    qs = {"median": 0.5, "p2point5": 0.025, "p5": 0.05, "p25": 0.25,
          "p75": 0.75, "p95": 0.95, "p97point5": 0.975}
    # the invariant the r06 rewrite must preserve: EXACT equality with the
    # per-scalar percentile aggregates it replaced (numpy agrees to within
    # 1 ulp — a pre-existing interpolation-arithmetic difference absorbed
    # by the oracle rounding, asserted loosely below)
    scal = (sdf.groupBy("k").agg(*[
        F.percentile(F.col("y"), F.lit(q)).alias(c) for c, q in qs.items()])
        .toPandas().set_index("k").sort_index())
    for key, grp in pdf.groupby("k"):
        v = grp["y"].to_numpy()
        for col, q in qs.items():
            assert out.loc[key, col] == scal.loc[key, col], (key, col)
            assert out.loc[key, col] == pytest.approx(np.quantile(v, q), rel=1e-12)
        assert out.loc[key, "total_sum"] == pytest.approx(v.sum())
        assert out.loc[key, "variance"] == pytest.approx(v.var(ddof=1))


def test_features_long_composite_time_col_equals_prerank(spark):
    """r06: features_long(time_col=[a, b]) must equal the old
    materialize-a-dense-rank-first formulation (same per-series order)."""
    from pyspark.sql import Window

    from tsfeatures_spark.operators.features import features_long

    rng = np.random.default_rng(5)
    n = 400
    pdf = pd.DataFrame({
        "unique_id": np.repeat(["s1", "s2"], n // 2),
        "t1": np.tile(np.repeat(np.arange(n // 4), 2), 2),  # ties in t1
        "t2": rng.permutation(n),                            # tie-break
        "y": rng.normal(size=n),
    })
    df = spark.createDataFrame(pdf.sample(frac=1.0, random_state=0))
    feats = ["statistics", "crossing_points", "stability", "lumpiness"]
    new = features_long(df, freq=1, features=feats, scale=False,
                        time_col=["t1", "t2"]).toPandas()
    w = Window.partitionBy("unique_id").orderBy("t1", "t2")
    ranked = df.withColumn("ds", F.row_number().over(w))
    old = features_long(ranked, freq=1, features=feats, scale=False).toPandas()
    a = new.sort_values("unique_id").reset_index(drop=True)
    b = old.sort_values("unique_id").reset_index(drop=True)[new.columns]
    pd.testing.assert_frame_equal(a, b)
