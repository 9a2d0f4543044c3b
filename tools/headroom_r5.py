"""Round-5 data-size headroom readings (r4 VERDICT item #8).

The four round-4 heavy ops at a base size and at 4x, matching the
ks_drift/psi_timeline protocol (single timed run + hypervisor-steal
column so a contended window is distinguishable from a slow engine):

- ``sax_8m`` and ``event_cooccurrence`` on the standard scaling-series
  generator (2048 Zipf-skewed sources, 6-day span) at 64M and 256M raw
  rows. Co-occurrence runs on SPARSE anomaly sessions (top-value points
  sessionized), the op's real input shape — detector outputs, not
  full-coverage sessions.
- ``duplicate_spans`` and ``ngram_contamination`` on the sf0.1
  documents table (400k docs) and on a 4x union of id-shifted copies
  (1.6M docs). The copies multiply every gram's document frequency by
  4, so EVERY distinct gram passes duplicate_spans' min_df and the
  duplicated-hash broadcast set reaches its corpus-vocabulary maximum —
  exactly the broadcast-growth hazard flagged in the r4 VERDICT
  performance notes, measured instead of assumed.

Usage: python tools/headroom_r5.py [--small]   (--small: 1/100 sizes,
smoke only). Prints one JSON line per reading.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

SMALL = "--small" in sys.argv
SCALE = 100 if SMALL else 1
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_steal_sec() -> float:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return int(parts[8]) / 100.0
    except (OSError, IndexError, ValueError):
        return float("nan")


def timed(fn):
    s0, t0 = read_steal_sec(), time.time()
    out = fn()
    return out, time.time() - t0, read_steal_sec() - s0


def materialize(df) -> int:
    df.write.format("noop").mode("overwrite").save()
    return -1


def series_runs(spark):
    from adtk_spark.plans.tiers import sax_downsample
    from adtk_spark.operators.events import event_cooccurrence, sessionize
    from adtk_spark.sources.tokens import token_corpus, token_series

    import shutil
    import tempfile

    for n_rows in (64_000_000 // SCALE, 256_000_000 // SCALE):
        work = tempfile.mkdtemp(prefix="headroom_")
        try:
            token_series(
                token_corpus(spark, n_rows, n_sources=2048,
                             span_secs=6 * 86400, partitions=64)
            ).write.mode("overwrite").parquet(f"{work}/raw")
            raw = spark.read.parquet(f"{work}/raw")
            n = raw.count()

            def run_sax():
                m1 = (raw.groupBy(
                    "source",
                    F.date_trunc("minute", F.col("ts")).alias("bucket_ts"))
                    .agg((F.sum("value") / F.count("value")).alias("mean")))
                return materialize(sax_downsample(
                    m1, segment_secs=480, alphabet=4))

            _, sec, steal = timed(run_sax)
            print(json.dumps({"op": "sax_8m", "rows": n,
                              "sec": round(sec, 2),
                              "steal_sec": round(steal, 2),
                              "rows_per_sec": round(n / sec)}), flush=True)

            def run_cooc():
                # sparse anomaly sessions: top ~3% of values (the
                # detector-output shape this op consumes in production)
                hot = raw.where(F.col("value") > 150.0)
                sess = sessionize(hot, gap_secs=600)
                return materialize(event_cooccurrence(
                    sess, start_col="session_start",
                    end_col="session_end"))

            _, sec, steal = timed(run_cooc)
            print(json.dumps({"op": "event_cooccurrence", "rows": n,
                              "sec": round(sec, 2),
                              "steal_sec": round(steal, 2),
                              "rows_per_sec": round(n / sec)}), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)


def text_corpus(spark, n_docs: int, vocab: int = 5000, seed: int = 1,
                partitions: int = 32):
    """Deterministic expression-generated text corpus (the driver's
    sf0.1 documents table is only 5k rows — too small for a headroom
    curve). Zipf-skewed word draws (u^4 head-heavy) so k-grams repeat
    naturally, plus a fixed 30-word boilerplate header on ~10% of docs —
    the span structure duplicate_spans exists to cut."""
    ids = spark.range(0, n_docs, 1, partitions)

    def u(k: int):
        h = F.xxhash64(F.lit(seed * 100 + k), F.col("id"))
        return (F.pmod(h, F.lit(1_000_000_007)).cast("double") + 0.5) \
            / 1_000_000_007.0

    n_words = (F.lit(20) + F.pmod(F.xxhash64(F.lit(seed), F.col("id")),
                                  F.lit(80))).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.concat(F.lit("w"), F.floor(
            F.lit(float(vocab)) * F.pow(
                (F.pmod(F.xxhash64(F.lit(seed), F.col("id") * 7919
                                   + i.cast("long")),
                        F.lit(1_000_000_007)).cast("double") + 0.5)
                / 1_000_000_007.0,
                F.lit(4.0))).cast("long")),
    )
    header = " ".join(f"hdr{i}" for i in range(30))
    body = F.array_join(words, " ")
    text = F.when(u(9) < 0.1, F.concat(F.lit(header + " "), body)) \
        .otherwise(body)
    return ids.select(F.col("id").alias("doc_id"), text.alias("text"))


def corpus_runs(spark):
    from adtk_spark.operators.corpus import duplicate_spans, ngram_contamination

    for tag, n_docs in (("1x", 100_000 // SCALE), ("4x", 400_000 // SCALE)):
        d = text_corpus(spark, n_docs)
        n = d.count()

        _, sec, steal = timed(lambda: materialize(duplicate_spans(d, k=5)))
        print(json.dumps({"op": "duplicate_spans", "docs": n, "corpus": tag,
                          "sec": round(sec, 2), "steal_sec": round(steal, 2),
                          "docs_per_sec": round(n / sec)}), flush=True)

        bench = d.where(F.col("doc_id") % 97 == 0)
        corpus = d.where(F.col("doc_id") % 97 != 0)
        _, sec, steal = timed(
            lambda: materialize(ngram_contamination(corpus, bench, n=5)))
        print(json.dumps({"op": "ngram_contamination", "docs": n,
                          "corpus": tag, "sec": round(sec, 2),
                          "steal_sec": round(steal, 2),
                          "docs_per_sec": round(n / sec)}), flush=True)


def main():
    from adtk_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("headroom-r5", cores=cores, shuffle_partitions=2 * cores,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-local"})
    if "--series" not in sys.argv:
        corpus_runs(spark)
    if "--corpus" not in sys.argv:
        series_runs(spark)
    spark.stop()


if __name__ == "__main__":
    main()
