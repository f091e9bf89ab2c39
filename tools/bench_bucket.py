#!/usr/bin/env python
"""Measured evidence for the bucketed co-located join story.

Every TPC-H-shaped docstring in the registry claims "bucket both fact
tables on orderkey at 100 TB and the join is co-located". This artifact
MEASURES that claim at bench scale instead of asserting it: lineitem
and orders (sf0.1, replicated 4x) are joined on orderkey twice —

- plain parquet reads: both sides pay a full hash-partition Exchange;
- ``bucketBy(32, key)`` saved tables (``sources/sinks.py:write_bucketed``):
  the join consumes the on-disk bucketing and the plan carries NO
  Exchange on either side.

Writes BUCKET_BENCH.json: wall-clock for both joins + a plan check that
the bucketed join really is exchange-free. Bucketed reads expose one
task per bucket, so the run also records the bucket count — at
warehouse scale buckets are sized to executor memory, here 32 matches
local cores.

Usage: python tools/bench_bucket.py  (writes BUCKET_BENCH.json)
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from pathlib import Path

import sys

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from data_observability_installer_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPL = 4
BUCKETS = 32


def join_revenue(li, o):
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"))
        .collect()
    )


def main() -> None:
    # run from a scratch cwd: bucketed saveAsTable uses the session's
    # (static) default warehouse dir, which resolves relative to cwd —
    # this keeps spark-warehouse/ and the derby metastore out of the repo
    tmp = tempfile.mkdtemp(prefix="bucket_bench_")
    os.chdir(tmp)
    spark = get_spark("bench-bucket")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    rep = F.broadcast(spark.range(REPL).withColumnRenamed("id", "rep"))
    li = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .crossJoin(rep)
        .withColumn("l_orderkey", F.col("l_orderkey") * REPL + F.col("rep"))
        .drop("rep")
    )
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .crossJoin(rep)
        .withColumn("o_orderkey", F.col("o_orderkey") * REPL + F.col("rep"))
        .drop("rep")
    )
    li.write.mode("overwrite").parquet(f"{tmp}/li_plain")
    o.write.mode("overwrite").parquet(f"{tmp}/o_plain")

    from data_observability_installer_spark.sources.sinks import write_bucketed

    write_bucketed(spark.read.parquet(f"{tmp}/li_plain"), "bb_li", "l_orderkey", BUCKETS)
    write_bucketed(spark.read.parquet(f"{tmp}/o_plain"), "bb_o", "o_orderkey", BUCKETS)

    # disable broadcast so the comparison is shuffle-join vs bucket-join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    li_p, o_p = spark.read.parquet(f"{tmp}/li_plain"), spark.read.parquet(f"{tmp}/o_plain")
    li_b, o_b = spark.table("bb_li"), spark.table("bb_o")

    join_revenue(li_p, o_p)  # codegen warm-up
    t0 = time.monotonic(); join_revenue(li_p, o_p); t_plain = round(time.monotonic() - t0, 3)
    t0 = time.monotonic(); join_revenue(li_b, o_b); t_bucket = round(time.monotonic() - t0, 3)

    plan = (
        li_b.join(o_b, li_b.l_orderkey == o_b.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    join_section = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
    exchange_free = "Exchange hashpartitioning(l_orderkey" not in plan and (
        "Exchange hashpartitioning(o_orderkey" not in plan
    )

    spark.sql("DROP TABLE IF EXISTS bb_li")
    spark.sql("DROP TABLE IF EXISTS bb_o")
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)

    out = {
        "rows_lineitem": 60000 * 10 * REPL,
        "buckets": BUCKETS,
        "unit": "sec",
        "timings": {"shuffle_join": t_plain, "bucketed_join": t_bucket},
        "bucketed_plan_exchange_free": bool(exchange_free),
        "speedup": round(t_plain / t_bucket, 2) if t_bucket else None,
    }
    Path(__file__).resolve().parent.parent.joinpath("BUCKET_BENCH.json").write_text(
        json.dumps(out, indent=2)
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
