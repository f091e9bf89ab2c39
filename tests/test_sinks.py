"""Warehouse sinks: partition pruning and bucketed co-located joins —
the plan properties the layouts exist to buy."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.sources.sinks import (
    read_partitioned,
    write_bucketed,
    write_partitioned,
)


def test_partitioned_write_prunes(spark, sf_smoke, tmp_path):
    from data_observability_installer_spark.sources.tables import load_table

    ev = load_table(spark, sf_smoke, "events").withColumn("day", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, ["day"])
    back = read_partitioned(spark, path).filter(F.col("day") == "2024-01-05")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:120]
    assert back.count() > 0
    # round-trip fidelity on the partition
    want = ev.filter(F.to_date("ts") == "2024-01-05").count()
    assert back.count() == want


def test_bucketed_join_skips_exchange(spark, sf_smoke, tmp_path):
    from data_observability_installer_spark.sources.tables import load_table

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        o = load_table(spark, sf_smoke, "orders")
        li = load_table(spark, sf_smoke, "lineitem")
        write_bucketed(o.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 8)
        write_bucketed(
            li.select("l_orderkey", "l_extendedprice"), "lineitem_b", "l_orderkey", 8
        )
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
        assert "Exchange" not in plan  # co-located: bucket layout IS the shuffle
        # and the join result matches the unbucketed baseline
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
