"""SparkSession factory with scale-oriented defaults.

The same config is used by tests (local[*]) and by ``spark-submit
--py-files`` cluster jobs; only master/cores differ. AQE is on so skewed
shuffle partitions are split at runtime, Arrow is on so every pandas UDF
crosses the JVM/Python boundary in columnar batches.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "adtk_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    cores=None uses ``local[*]`` locally; on a real cluster the master
    comes from spark-submit and this builder only sets conf.
    """
    n = cores or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or max(2 * n, 32)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # pandas/numpy float semantics, not ANSI SQL: the reference's
        # kernels produce nan/inf on 0/0 instead of raising; with ANSI
        # off Spark yields NULL, which maps to adtk's "undecidable"
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cores}]" if cores else "local[*]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
