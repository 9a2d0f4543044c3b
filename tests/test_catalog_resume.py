"""TierCatalog snapshot/commit/read-since + kill-and-resume refresh."""

import pytest
from pyspark.sql import functions as F

from adtk_spark.plans.incremental import (
    WATERMARK_KEY,
    read_tier_latest,
    refresh_tiers,
)
from adtk_spark.sources.catalog import TierCatalog
from adtk_spark.sources.tokens import token_corpus


def test_catalog_commit_read_since(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "cat"))
    df1 = spark.range(5).select(F.col("id").alias("x"))
    df2 = spark.range(5, 8).select(F.col("id").alias("x"))
    s1 = cat.commit(df1, "t")
    s2 = cat.commit(df2, "t")
    assert (s1, s2) == (1, 2)
    assert cat.read(spark, "t").count() == 8
    assert cat.read_since(spark, "t", s1).count() == 3
    assert cat.read_since(spark, "t", s2) is None
    assert cat.last_snapshot("t") == 2
    assert cat.last_snapshot("missing") is None


def test_incremental_refresh_and_resume(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "tiers"))
    c1 = token_corpus(spark, 2000, n_sources=8, seed=1, span_secs=3600)
    c2 = token_corpus(spark, 1000, n_sources=8, seed=2, span_secs=3600)

    cat.commit(c1, "raw")
    r1 = refresh_tiers(cat, spark)
    assert r1["processed"] == 1
    full_1m_a = read_tier_latest(cat, spark, "tier_1m")
    n_a = full_1m_a.count()
    assert n_a > 0

    # second ingest + refresh: restated buckets resolve latest-wins
    cat.commit(c2, "raw")
    r2 = refresh_tiers(cat, spark)
    assert r2["processed"] == 1
    merged = read_tier_latest(cat, spark, "tier_1m")
    # tier must equal a from-scratch rollup of all raw data
    from adtk_spark.plans.tiers import rollup_raw
    from adtk_spark.sources.tokens import token_series

    expected = rollup_raw(token_series(cat.read(spark, "raw").drop("snap")), "1m")
    got = {(r["source"], r["bucket_ts"], r["cnt"], r["vsum"]) for r in merged.collect()}
    want = {(r["source"], r["bucket_ts"], r["cnt"], r["vsum"]) for r in expected.collect()}
    assert got == want

    # resume semantics: nothing new -> no-op (watermark caught up)
    r3 = refresh_tiers(cat, spark)
    assert r3["processed"] == 0

    # "kill and restart": a fresh catalog object over the same root sees
    # the committed watermark and does not reprocess
    cat2 = TierCatalog(str(tmp_path / "tiers"))
    assert cat2.get_watermark(WATERMARK_KEY) == cat.get_watermark(WATERMARK_KEY)
    assert refresh_tiers(cat2, spark)["processed"] == 0

    # lineage rows recorded for every tier commit
    lin = cat.read(spark, "_lineage")
    tables = {r["table"] for r in lin.select("table").distinct().collect()}
    assert {"tier_1m", "tier_1h", "tier_1d"} <= tables
    assert lin.where(F.col("n_rows") <= 0).count() == 0


def test_bucketed_compaction_no_exchange(spark, tmp_path):
    """The read-optimized bucketed tier view: (a) same data as the plain
    snapshot read, (b) a per-source window pass over it plans ZERO
    Exchange (the bucketed scan's HashPartitioning satisfies the
    Window's distribution) vs exactly one on the plain parquet read."""
    from pyspark.sql import Window

    from adtk_spark.plans.tiers import rollup_raw
    from adtk_spark.sources.catalog import TierCatalog
    from adtk_spark.sources.tokens import token_corpus, token_series

    cat = TierCatalog(str(tmp_path / "cat"))
    t1m = rollup_raw(
        token_series(token_corpus(spark, 2000, n_sources=8, seed=9)), "1m")
    cat.commit(t1m, "tier_1m")
    name = cat.commit_bucketed(cat.read(spark, "tier_1m").drop("snap"),
                               "tier_1m", buckets=8)
    try:
        bkt = cat.read_bucketed(spark, "tier_1m")
        plain = cat.read(spark, "tier_1m").drop("snap")

        key = lambda r: (r["source"], r["bucket_ts"], r["cnt"], r["vsum"])
        assert {key(r) for r in bkt.collect()} == {key(r) for r in plain.collect()}

        w = Window.partitionBy("source").orderBy("bucket_ts").rowsBetween(-5, -1)
        proj = [F.col("source"), F.col("bucket_ts"),
                F.avg("mean").over(w).alias("r")]
        plan_bkt = bkt.select(*proj)._jdf.queryExecution() \
            .executedPlan().toString()
        plan_plain = plain.select(*proj)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan_bkt.count("Exchange") == 0
        assert "Bucketed: true" in plan_bkt
        assert plan_plain.count("Exchange") == 1

        # metastore registrations are per-session: a fresh catalog
        # object must self-register the external bucketed table from
        # the manifest (simulated by dropping the session's table)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        cat2 = TierCatalog(str(tmp_path / "cat"))
        bkt2 = cat2.read_bucketed(spark, "tier_1m")
        plan2 = bkt2.select(*proj)._jdf.queryExecution() \
            .executedPlan().toString()
        assert plan2.count("Exchange") == 0
        assert {key(r) for r in bkt2.collect()} == {key(r) for r in plain.collect()}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_partitioned_commit_prunes_retention_scan(spark, tmp_path):
    """Day-partitioned tier snapshots: a retention cutoff reaches the
    scan as a PartitionFilter (directories pruned, old files never
    opened) and the kept rows match an unpartitioned filter."""
    from adtk_spark.plans.tiers import retention_filter, rollup_raw
    from adtk_spark.sources.catalog import TierCatalog
    from adtk_spark.sources.tokens import token_corpus, token_series

    cat = TierCatalog(str(tmp_path / "cat"))
    t1m = rollup_raw(
        token_series(token_corpus(spark, 3000, n_sources=4, seed=13,
                                  span_secs=4 * 86400)), "1m"
    ).withColumn("day", F.to_date("bucket_ts"))
    cat.commit(t1m, "tier_1m", partition_by=["day"])

    stored = cat.read(spark, "tier_1m").drop("snap")
    cutoff = t1m.agg(F.max("bucket_ts")).first()[0]
    import datetime as dt

    keep_after = (cutoff - dt.timedelta(days=2)).date()
    kept = stored.where(F.col("day") >= F.lit(keep_after))
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    # the day filter must be IN the partition filters, not a data filter
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "day" in pf

    want = {(r["source"], r["bucket_ts"]) for r in retention_filter(
        t1m, dt.datetime.combine(keep_after, dt.time())).collect()}
    got = {(r["source"], r["bucket_ts"]) for r in kept.collect()}
    assert got == want and len(got) > 0


def test_manifest_zone_map_pruning(spark, tmp_path):
    """commit records min/max(bucket_ts) in the manifest; read_range
    skips whole snapshot dirs on the driver, and latest-wins restatement
    survives the pruning."""
    import datetime as dt

    from adtk_spark.plans.incremental import read_tier_latest

    cat = TierCatalog(str(tmp_path / "zm"))
    for day in (1, 2, 3):
        df = spark.createDataFrame(
            [("s", dt.datetime(2025, 3, day, h), float(h)) for h in range(4)],
            "source string, bucket_ts timestamp, mean double")
        cat.commit(df, "t")

    lo, hi = dt.datetime(2025, 3, 2), dt.datetime(2025, 3, 3)
    assert cat.snapshots_in_range("t", lo, hi) == [2]
    d2 = cat.read_range(spark, "t", lo, hi)
    files = d2.inputFiles()
    assert files and all("snap=2" in f for f in files)  # dirs 1/3 never read
    assert d2.count() == 4
    assert cat.read(spark, "t").count() == 12  # unbounded read: everything

    # snapshot 4 restates day-2 hour-0: its stats cover the range, so
    # range pruning keeps it and latest-wins returns the restated row
    cat.commit(spark.createDataFrame(
        [("s", dt.datetime(2025, 3, 2, 0), 99.0)],
        "source string, bucket_ts timestamp, mean double"), "t")
    assert cat.snapshots_in_range("t", lo, hi) == [2, 4]
    latest = read_tier_latest(cat, spark, "t", lo, hi)
    got = {r["bucket_ts"]: r["mean"] for r in latest.collect()}
    assert got[dt.datetime(2025, 3, 2, 0)] == 99.0
    assert len(got) == 4


def test_route_from_catalog_prunes_snapshots(spark, tmp_path):
    """A time-bounded routed query only scans manifest-surviving
    snapshot dirs of the serving tier."""
    import datetime as dt

    from adtk_spark.plans.router import route_from_catalog

    cat = TierCatalog(str(tmp_path / "rt"))
    for day in (1, 2):
        df = spark.createDataFrame(
            [("s", dt.datetime(2025, 4, day, 0, m), 1.0 * m, 1, 1.0 * m,
              1.0 * m, 1.0 * m)
             for m in range(30)],
            "source string, bucket_ts timestamp, mean double, cnt long,"
            " vmin double, vmax double, vsum double")
        cat.commit(df, "tier_1m")
    routed = route_from_catalog(
        spark, cat, {"1m": "tier_1m"}, 60,
        start=dt.datetime(2025, 4, 2), end=dt.datetime(2025, 4, 3))
    assert all("snap=2" in f for f in routed.inputFiles())
    assert routed.count() == 30


def test_compact_tier_and_vacuum(spark, tmp_path):
    """Many per-epoch snapshots -> one compacted snapshot: identical
    latest-wins answer, single-dir scan, vacuum removes the old dirs."""
    import datetime as dt
    import os

    from adtk_spark.plans.incremental import compact_tier, read_tier_latest

    cat = TierCatalog(str(tmp_path / "cp"))
    # 5 epochs; epochs 3..5 restate minute 0 with a new value
    for epoch in range(5):
        cat.commit(spark.createDataFrame(
            [("s", dt.datetime(2025, 5, 1, 0, min(epoch, 2)), float(epoch))],
            "source string, bucket_ts timestamp, mean double"), "tier_1m")
    before = {(r["source"], r["bucket_ts"]): r["mean"]
              for r in read_tier_latest(cat, spark, "tier_1m").collect()}
    assert before[("s", dt.datetime(2025, 5, 1, 0, 2))] == 4.0  # latest wins

    new_id = compact_tier(cat, spark, "tier_1m")
    assert new_id == 6 and cat.snapshots("tier_1m") == [6]
    after_df = read_tier_latest(cat, spark, "tier_1m")
    after = {(r["source"], r["bucket_ts"]): r["mean"]
             for r in after_df.collect()}
    assert after == before  # compaction is a pure rewrite
    assert all("snap=6" in f for f in after_df.inputFiles())  # one dir

    # old dirs survive until vacuum (in-flight reader grace), then go
    assert os.path.isdir(os.path.join(cat.root, "tier_1m", "snap=1"))
    removed = cat.vacuum("tier_1m")
    assert len(removed) == 5
    assert not os.path.isdir(os.path.join(cat.root, "tier_1m", "snap=1"))
    assert {(r["source"], r["bucket_ts"]): r["mean"]
            for r in read_tier_latest(cat, spark, "tier_1m").collect()} == before

    # idempotence: nothing left to compact
    assert compact_tier(cat, spark, "tier_1m") is None


def test_range_read_after_compact_vacuum(spark, tmp_path):
    """Regression (r03 ADVICE high): snapshots_in_range must exclude
    superseded snapshot ids like snapshots() does. Before the fix, a
    time-bounded read after compact_tier + vacuum built paths to the
    deleted snap= dirs and the parquet scan failed PATH_NOT_FOUND."""
    import datetime as dt

    from adtk_spark.plans.incremental import compact_tier, read_tier_latest

    cat = TierCatalog(str(tmp_path / "cp"))
    for epoch in range(3):
        cat.commit(spark.createDataFrame(
            [("s", dt.datetime(2025, 5, 1, 0, epoch), float(epoch))],
            "source string, bucket_ts timestamp, mean double"), "tier_1m")
    lo, hi = dt.datetime(2025, 5, 1), dt.datetime(2025, 5, 2)
    # pre-vacuum: range listing must already skip superseded ids
    compact_tier(cat, spark, "tier_1m")
    assert cat.snapshots_in_range("tier_1m", lo, hi) == [4]
    cat.vacuum("tier_1m")
    # post-vacuum: both the bare range read and the latest-wins
    # bounded read plan only against live dirs and return all rows
    ranged = cat.read_range(spark, "tier_1m", lo, hi)
    assert all("snap=4" in f for f in ranged.inputFiles())
    assert ranged.count() == 3
    latest = read_tier_latest(cat, spark, "tier_1m", lo, hi)
    assert {r["mean"] for r in latest.collect()} == {0.0, 1.0, 2.0}
