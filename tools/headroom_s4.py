"""Session-4 data-size headroom readings: the two heaviest new ops at
1x and 4x, matching the round-5 protocol (tools/headroom_r5.py —
single timed run + hypervisor-steal column so a contended window is
distinguishable from a slow engine):

- ``hurst_exponent`` on the standard scaling-series generator (2048
  Zipf-skewed sources, 6-day span) at 64M and 256M raw rows — the
  block-window explode is 4x the input, the quadratic hazard would be
  a per-source funnel (there is none: every stage is (source, m,
  block)-keyed).
- ``doc_novelty`` on the expression-generated text corpus at 100k and
  400k docs — the shingle-hash window is the one shuffle; the hazard
  would be hot-shingle skew in the count window (Zipf-skewed words
  make shingles repeat naturally, so this measures the real shape).

Usage: python tools/headroom_s4.py [--small]   (--small: 1/100 sizes,
smoke only). Prints one JSON line per reading.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_DRIVER_MEM", "32g")

from pyspark.sql import functions as F  # noqa: E402

from headroom_r5 import materialize, text_corpus, timed  # noqa: E402

SMALL = "--small" in sys.argv
SCALE = 100 if SMALL else 1


def main():
    from adtk_spark.operators.corpus import doc_novelty
    from adtk_spark.operators.hd import hurst_exponent
    from adtk_spark.session import get_spark
    from adtk_spark.sources.tokens import token_corpus, token_series

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))
    spark = get_spark("headroom-s4", cores=cores,
                      shuffle_partitions=2 * cores,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-local"})

    for tag, n_docs in (("1x", 100_000 // SCALE), ("4x", 400_000 // SCALE)):
        d = text_corpus(spark, n_docs)
        n = d.count()
        _, sec, steal = timed(lambda: materialize(doc_novelty(d)))
        print(json.dumps({"op": "doc_novelty", "docs": n, "corpus": tag,
                          "sec": round(sec, 2), "steal_sec": round(steal, 2),
                          "docs_per_sec": round(n / sec)}), flush=True)

    for n_rows in (64_000_000 // SCALE, 256_000_000 // SCALE):
        work = tempfile.mkdtemp(prefix="headroom_s4_")
        try:
            token_series(
                token_corpus(spark, n_rows, n_sources=2048,
                             span_secs=6 * 86400, partitions=64)
            ).write.mode("overwrite").parquet(f"{work}/raw")
            raw = spark.read.parquet(f"{work}/raw")
            n = raw.count()
            _, sec, steal = timed(lambda: materialize(hurst_exponent(raw)))
            print(json.dumps({"op": "hurst_exponent", "rows": n,
                              "sec": round(sec, 2),
                              "steal_sec": round(steal, 2),
                              "rows_per_sec": round(n / sec)}), flush=True)
        finally:
            shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
