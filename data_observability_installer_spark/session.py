"""SparkSession factory tuned for the test/bench harness.

Local mode is a single JVM; on a real cluster the same settings hold
except ``spark.driver.memory`` (executors get their own memory) and
shuffle partitions, which should scale with total cores / input size
(AQE coalesces the excess at runtime either way).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "data-observability-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match local parallelism; a cluster deployment would size this to
        # ~2-3x total executor cores and let AQE coalesce
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet has carried TIMESTAMP(NANOS) in some
        # vintages; set once here so load_table never mutates a live
        # session's conf (it only falls back to a guarded set when
        # handed a foreign session, e.g. the round driver's)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter join pruning: when a selective dim side
        # is too big to broadcast, inject a bloom filter of its join
        # keys into the fact scan so non-matching rows drop BEFORE the
        # shuffle — the 100 TB lever for semi-selective big joins. The
        # default 10 GB application-side threshold keeps it out of
        # small local scans (no overhead here); plan-gated in
        # tests/test_plans.py with the threshold lowered.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # ORDER BY + large LIMIT: TakeOrderedAndProject allocates a
        # LIMIT-sized top-K buffer PER TASK (guava TopKSelector), so a
        # "give me everything, ordered" limit of 10^9 is an instant
        # executor OOM at any data size (measured: 600k rows, 16 g
        # heap). Above this threshold Spark falls back to a real
        # sort + limit, which spills. 100k keeps every sane top-k on
        # the fast path and makes the huge-limit shape merely slow
        # instead of fatal.
        .config("spark.sql.execution.topKSortFallbackThreshold", "100000")
        # Local bench files are 10s of MB; the 4 MB default file-open cost
        # caps such scans at ~3 splits, starving 32 cores. At warehouse
        # scale files are >=128 MB so this setting is inert there.
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_nanos_conf(spark: SparkSession) -> None:
    """Guarded, set-once enable of TIMESTAMP(NANOS)-as-long reads for
    sessions not built by :func:`get_spark` (e.g. the round driver's).
    Sessions from this factory already carry the setting, so this is a
    no-op for them; keeping every ``spark.conf.set`` in this module
    keeps runtime conf mutation auditable in one place."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    if spark.conf.get(key, "false") != "true":
        spark.conf.set(key, "true")
