"""Salted join: result-identical to the plain join, hot key spread
across salt buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.functions.skew import SALT_COL, salted_join


def _frames(spark):
    # 90% of fact rows share one hot key
    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}", float(i)) for i in range(1000)],
        "row_id bigint, k string, v double",
    )
    dims = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i * 10}", f"D{i}") for i in range(100)],
        "k string, label string",
    )
    return facts, dims


def test_salted_join_equals_plain_join(spark):
    facts, dims = _frames(spark)
    plain = facts.join(dims, "k").select("row_id", "label")
    salted = salted_join(facts, dims, on="k", salt_source="row_id").select("row_id", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    facts, dims = _frames(spark)
    salted = salted_join(facts, dims, on="k", how="left", salt_source="row_id")
    assert salted.count() == facts.count()
    assert salted.filter(F.col("label").isNull()).count() == facts.join(
        dims, "k", "left"
    ).filter(F.col("label").isNull()).count()


def test_hot_key_spreads_over_salt_buckets(spark):
    facts, _ = _frames(spark)
    s = facts.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col("row_id")), F.lit(16)).cast("int")
    )
    buckets = s.filter(F.col("k") == "hot").select(SALT_COL).distinct().count()
    assert buckets >= 12  # ~900 hot rows hash across nearly all 16 salts
