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


def test_skew_diagnosis_counts_and_salt(spark):
    """Hot keys surface with exact shares; the salt factor is
    ceil(ct/target); NULL keys group together (the classic unmatched-FK
    skew)."""
    from data_observability_installer_spark.operators.relational import (
        skew_diagnosis,
    )

    rows = [("hot",)] * 70 + [("warm",)] * 20 + [(None,)] * 10
    df = spark.createDataFrame(rows, "k string")
    got = {r["key"]: r for r in skew_diagnosis(df, "k", top_k=5, target_per_key=25).collect()}
    assert got["hot"]["ct"] == 70 and got["hot"]["share_bp"] == 7000
    assert got["hot"]["suggested_salt"] == 3  # ceil(70/25)
    assert got["warm"]["suggested_salt"] == 1
    assert got[None]["ct"] == 10 and got[None]["share_bp"] == 1000
