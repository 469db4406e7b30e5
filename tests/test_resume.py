"""Checkpoint/resume invariant (FIXTURES.md §6c): kill the rollup job
mid-run, restart with resume=True, and the final tier table + lineage must
equal an uninterrupted run's — plus snapshot/time-travel semantics of the
Iceberg-lite catalog."""

import numpy as np
import pytest

from tsfeatures_spark.plans import ResumableRollupJob, bootstrap_tokens
from tsfeatures_spark.sources.catalog import IcebergLiteCatalog


def _table_state(spark, catalog, table):
    df = catalog.read(spark, table)
    pdf = df.select("doc_id", "tier", "window_id", "block_digest").toPandas()
    return pdf.sort_values(["doc_id", "tier", "window_id"]).reset_index(drop=True)


def test_kill_resume_equals_single_run(spark, tmp_path):
    # uninterrupted reference run
    cat_a = IcebergLiteCatalog(str(tmp_path / "wh_a"))
    bootstrap_tokens(spark, cat_a, "tokens", n_docs=40, n_buckets=8, mean_len=500)
    job_a = ResumableRollupJob(spark, cat_a, "tokens", n_buckets=8, waves=4)
    res_a = job_a.run()
    assert res_a["waves_run"] == 4

    # killed-and-resumed run over the identical input
    cat_b = IcebergLiteCatalog(str(tmp_path / "wh_b"))
    bootstrap_tokens(spark, cat_b, "tokens", n_docs=40, n_buckets=8, mean_len=500)
    job_b = ResumableRollupJob(spark, cat_b, "tokens", n_buckets=8, waves=4)
    with pytest.raises(RuntimeError, match="simulated failure"):
        job_b.run(fail_after_waves=2)
    assert len(job_b.completed_buckets()) == 4  # 2 of 4 waves committed
    res_b = job_b.run(resume=True)  # picks up the remaining waves only
    assert res_b["waves_run"] == 2

    a = _table_state(spark, cat_a, "tiers")
    b = _table_state(spark, cat_b, "tiers")
    assert a.equals(b), "resumed run diverged from uninterrupted run"

    # lineage digests identical per bucket
    lin_a = cat_a.read(spark, "lineage").select("bucket", "n_docs", "n_windows", "content_digest").toPandas().sort_values("bucket").reset_index(drop=True)
    lin_b = cat_b.read(spark, "lineage").select("bucket", "n_docs", "n_windows", "content_digest").toPandas().sort_values("bucket").reset_index(drop=True)
    assert lin_a.equals(lin_b)

    # resume on a finished job is a no-op
    res_c = job_b.run(resume=True)
    assert res_c["waves_run"] == 0


def test_snapshot_time_travel(spark, tmp_path):
    cat = IcebergLiteCatalog(str(tmp_path / "wh"))
    bootstrap_tokens(spark, cat, "tokens", n_docs=10, n_buckets=4, mean_len=300)
    v1 = cat.current_snapshot_id("tokens")
    n1 = cat.read(spark, "tokens").count()
    # append a second batch under a new snapshot
    from tsfeatures_spark.sources.generator import token_table
    from pyspark.sql import functions as F

    more = token_table(spark, 5, base_seed=7, mean_len=300).withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(4))
    )
    v2 = cat.commit(spark, "tokens", more, mode="append", partition_by=["bucket"])
    assert v2 == v1 + 1
    assert cat.read(spark, "tokens", snapshot_id=v1).count() == n1  # time travel
    assert cat.read(spark, "tokens").count() == n1 + 5
    hist = cat.history("tokens")
    assert [h["snapshot_id"] for h in hist] == [v1, v2]


def test_crash_between_data_and_lineage_commits_heals_on_resume(spark, tmp_path):
    """The crash window the lineage design must survive: wave data committed,
    lineage append lost. Resume must NOT reprocess those buckets (which would
    append duplicate tier rows); it backfills the missing lineage rows and
    continues — final state equals an uninterrupted run."""
    cat_a = IcebergLiteCatalog(str(tmp_path / "wh_a"))
    bootstrap_tokens(spark, cat_a, "tokens", n_docs=40, n_buckets=8, mean_len=500)
    ResumableRollupJob(spark, cat_a, "tokens", n_buckets=8, waves=4).run()

    cat_b = IcebergLiteCatalog(str(tmp_path / "wh_b"))
    bootstrap_tokens(spark, cat_b, "tokens", n_docs=40, n_buckets=8, mean_len=500)
    job_b = ResumableRollupJob(spark, cat_b, "tokens", n_buckets=8, waves=4)
    with pytest.raises(RuntimeError, match="between data and lineage"):
        job_b.run(fail_between_commits=2)
    # wave 2's data IS committed but its lineage rows are MISSING
    assert len(job_b.completed_buckets()) == 2
    snaps = [s for s in cat_b.history("tiers") if s.get("meta", {}).get("buckets")]
    assert len(snaps) == 2  # two data commits on disk

    res_b = job_b.run(resume=True)
    assert res_b["waves_run"] == 2  # only waves 3+4 processed — no rework

    a = _table_state(spark, cat_a, "tiers")
    b = _table_state(spark, cat_b, "tiers")
    assert a.equals(b), "healed run diverged (duplicate tier rows?)"
    lin_a = cat_a.read(spark, "lineage").select("bucket", "n_docs", "n_windows", "content_digest").toPandas().sort_values("bucket").reset_index(drop=True)
    lin_b = cat_b.read(spark, "lineage").select("bucket", "n_docs", "n_windows", "content_digest").toPandas().sort_values("bucket").reset_index(drop=True)
    assert lin_a.equals(lin_b)


def test_catalog_seam_swaps_via_config(spark, tmp_path):
    """VERDICT r03 #9: the documented IcebergLite -> real-catalog drop-in
    claim, pinned. A mock DSv2-flavored catalog (its writes routed through
    a writeTo-shaped method, its storage independent of IcebergLite's
    internals from the engine's point of view) is registered under a conf
    name; the FULL resumable rollup job runs against it untouched and
    produces bit-identical tier tables, exercising exactly the
    CatalogProtocol surface."""
    from tsfeatures_spark.sources.catalog import (
        CatalogProtocol, catalog_from_conf, register_catalog_impl)

    calls: list[str] = []

    class MockDSv2Catalog(IcebergLiteCatalog):
        """Stand-in for an Iceberg DSv2 wrapper: same protocol, its own
        commit path (as a real wrapper would call df.writeTo(...)); the
        recorded call log proves the engine drives only the protocol."""

        def commit(self, spark, table, df, mode="append",
                   partition_by=None, meta=None, row_group_bytes=None):
            calls.append(f"commit:{table}:{mode}")
            return super().commit(spark, table, df, mode=mode,
                                  partition_by=partition_by, meta=meta,
                                  row_group_bytes=row_group_bytes)

        def read(self, spark, table, snapshot_id=None):
            calls.append(f"read:{table}")
            return super().read(spark, table, snapshot_id)

        def history(self, table):
            calls.append(f"history:{table}")
            return super().history(table)

    register_catalog_impl("mock-dsv2", MockDSv2Catalog)
    spark.conf.set("spark.tsfeatures_spark.catalog.impl", "mock-dsv2")
    try:
        cat = catalog_from_conf(spark, str(tmp_path / "wh_mock"))
        assert isinstance(cat, MockDSv2Catalog)
        assert isinstance(cat, CatalogProtocol)  # runtime-checkable surface
    finally:
        spark.conf.unset("spark.tsfeatures_spark.catalog.impl")
    # default conf still resolves the lite catalog
    assert isinstance(catalog_from_conf(spark, str(tmp_path / "wh_d")),
                      IcebergLiteCatalog)

    bootstrap_tokens(spark, cat, "tokens", n_docs=20, n_buckets=4, mean_len=300)
    job = ResumableRollupJob(spark, cat, "tokens", n_buckets=4, waves=2)
    job.run()
    got = _table_state(spark, cat, "tiers")

    ref_cat = IcebergLiteCatalog(str(tmp_path / "wh_ref"))
    bootstrap_tokens(spark, ref_cat, "tokens", n_docs=20, n_buckets=4, mean_len=300)
    ResumableRollupJob(spark, ref_cat, "tokens", n_buckets=4, waves=2).run()
    assert got.equals(_table_state(spark, ref_cat, "tiers"))

    # the engine committed tiers + lineage through the seam, nothing else
    assert any(c.startswith("commit:tiers") for c in calls)
    assert any(c.startswith("commit:lineage") for c in calls)


def test_bootstrap_commit_bounds_row_groups(spark, tmp_path):
    """The raw token tier must never land as one fat row group per file:
    parquet readers cannot split a row group, so an unbounded write caps
    every downstream scan at file-count parallelism (measured 2.2x wall on
    the 60k bench table — docs/PLANS.md 'Input layout'). bootstrap_tokens
    passes row_group_bytes=2MB through catalog.commit; a doc population
    big enough to exceed 2MB/bucket must produce multi-rg files."""
    import glob

    import pyarrow.parquet as pq

    cat = IcebergLiteCatalog(str(tmp_path / "wh_rg"))
    # ~800 docs x ~2000 tokens x 4B ~= 6.4MB raw in one bucket -> the
    # bucket file must split into >1 row group at the 2MB bound
    bootstrap_tokens(spark, cat, "tokens", n_docs=800, n_buckets=1,
                     mean_len=2000.0)
    files = glob.glob(str(tmp_path / "wh_rg" / "tokens" / "data" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    n_rgs, max_rg = 0, 0
    for fn in files:
        md = pq.ParquetFile(fn).metadata
        n_rgs += md.num_row_groups
        for i in range(md.num_row_groups):
            max_rg = max(max_rg, md.row_group(i).total_byte_size)
    assert n_rgs > len(files), "each file landed as a single row group"
    # compressed rg size can exceed the uncompressed block target slightly
    # on the final flush; generous 4x bound still catches the 25MB failure
    assert max_rg < 4 * (2 << 20)
