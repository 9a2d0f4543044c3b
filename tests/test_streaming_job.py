"""Structured Streaming rollup + the spark-submit job entry point."""

from pyspark.sql import functions as F


def test_streaming_rollup_matches_batch(spark, tmp_path):
    from adtk_spark.plans.tiers import salt_partials
    from adtk_spark.sources.tokens import token_corpus, token_series
    from adtk_spark.streaming.rollup_stream import (
        run_available_now,
        streaming_rollup_1m,
    )

    import datetime as dt

    src = str(tmp_path / "raw_stream")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # arrivals in event-time order (late-beyond-watermark data is
    # *dropped* by design — the batch incremental refresher owns
    # restatements); a final heartbeat advances the watermark past c2
    c1 = token_series(token_corpus(spark, 1500, n_sources=8, seed=21,
                                   span_secs=1800, start="2025-01-01 00:00:00"))
    c2 = token_series(token_corpus(spark, 800, n_sources=8, seed=22,
                                   span_secs=1800, start="2025-01-01 01:00:00"))
    hb = token_series(token_corpus(spark, 5, n_sources=1, seed=23,
                                   span_secs=60, start="2025-01-01 03:00:00"))
    for arrival in (c1, c2, hb):
        arrival.write.mode("append").parquet(src)
        run_available_now(streaming_rollup_1m(spark, src), out, ckpt)

    got = spark.read.parquet(out)
    batch = salt_partials(spark.read.parquet(src), "1m")  # algebraic reference
    g = {(r["source"], r["bucket_ts"], r["cnt"], round(r["vsum"], 6))
         for r in got.collect()}
    b = {(r["source"], r["bucket_ts"], r["cnt"], round(r["vsum"], 6))
         for r in batch.collect()}
    # every emitted bucket matches the batch rollup exactly, and all
    # buckets strictly older than the final watermark were emitted
    assert g <= b
    closed = {x for x in b if x[1] < dt.datetime(2025, 1, 1, 2, 0)}
    assert closed <= g


def test_rollup_job_cli(spark, tmp_path, capsys):
    import json

    from jobs.rollup_job import main

    cat = str(tmp_path / "cat")
    main(["--catalog", cat, "--ingest-docs", "1200", "--sources", "8",
          "--compress", "--retention-days-1m", "1", "--cores", "4"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rep = json.loads(line)
    assert rep["ingested_snapshot"] == 1
    assert rep["refresh"]["processed"] == 1
    assert rep["payload_snapshot"] >= 1
    assert rep["retention_kept_rows"] > 0
    # second run with nothing new: pure resume, no reprocessing
    main(["--catalog", cat, "--cores", "4"])
    rep2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep2["refresh"]["processed"] == 0
