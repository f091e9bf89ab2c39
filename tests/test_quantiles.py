"""Bit-parity gate for the distributed exact-percentile rewrite.

profile()'s exact+materialized path computes its five quantiles with
functions/quantiles.py instead of the percentile() aggregate; the
DuckDB oracle hash pins every profile value, so the rewrite must equal
the aggregate BIT FOR BIT — including the round(x, 4) that follows it.
These tests compare raw double bits (struct.pack) of
round(percentile(CAST(c AS DOUBLE), q), 4) against the rewrite's
values rounded through the same JVM round (F.round(F.lit(v), 4)
constant-folds in Catalyst), over every numeric column of the profile
tables at the smoke SF plus adversarial synthetic distributions
(ties, exact rank positions, negatives, nulls, -0.0, single row,
all-null). The standalone harness sweeping all three SFs lives in the
round log; this pytest pins the rule so refactors can't drift.
"""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from data_observability_installer_spark.functions.quantiles import (
    exact_percentiles,
    exact_percentiles_multi,
)

QS = [0.05, 0.25, 0.5, 0.75, 0.95]
NUMERIC = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}


def _bits(x):
    return None if x is None else struct.pack("<d", x)


def _jvm_round4(spark, vals):
    exprs = [
        F.round(F.lit(v), 4).alias(f"r{i}")
        if v is not None
        else F.lit(None).cast("double").alias(f"r{i}")
        for i, v in enumerate(vals)
    ]
    row = spark.range(1).select(*exprs).collect()[0]
    return [row[f"r{i}"] for i in range(len(vals))]


def _truth(df, cols):
    q_arr = "array(" + ", ".join(str(q) for q in QS) + ")"
    aggs = [
        F.expr(
            f"round(percentile(CAST({c} AS DOUBLE), {q_arr})[{i}], 4)"
        ).alias(f"{c}__{i}")
        for c in cols
        for i in range(len(QS))
    ]
    return df.agg(*aggs).collect()[0]


def _assert_parity(spark, df, cols):
    truth = _truth(df, cols)
    got = exact_percentiles_multi(df, cols, QS)
    for c in cols:
        rounded = _jvm_round4(spark, got[c])
        for i in range(len(QS)):
            assert _bits(truth[f"{c}__{i}"]) == _bits(rounded[i]), (
                f"{c} q={QS[i]}: {truth[f'{c}__{i}']!r} != {rounded[i]!r}"
            )


@pytest.mark.parametrize("table", ["lineitem", "orders", "events", "documents"])
def test_parity_real_tables(spark, sf_smoke, table):
    df = spark.read.parquet(f"{sf_smoke}/{table}.parquet")
    cols = [c for c, d in df.dtypes if d.split("(")[0] in NUMERIC]
    assert cols, f"{table} has no numeric columns"
    _assert_parity(spark, df, cols)


@pytest.mark.parametrize(
    "name,vals",
    [
        ("single", [1.5]),
        ("two", [1.0, 2.0]),
        ("all_equal", [7.0] * 100),
        ("neg", [-5.0, -1.0, 0.0, 3.5, 100.25]),
        ("exact_pos", [float(i) for i in range(21)]),
        ("negzero", [-0.0] * 10 + [0.0] * 10 + [1.0] * 5 + [-1.0] * 5),
        ("with_nulls", [None if i % 3 == 0 else float(i) for i in range(100)]),
    ],
)
def test_parity_synthetic(spark, name, vals):
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    _assert_parity(spark, df, ["x"])


def test_parity_random_ties(spark):
    rng = random.Random(42)
    vals = [float(rng.randint(0, 5)) for _ in range(10007)]
    vals += [rng.uniform(-1e6, 1e6) for _ in range(999)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    _assert_parity(spark, df, ["x"])


def test_all_null_and_empty(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    assert exact_percentiles_multi(df, ["x"], QS) == {"x": [None] * len(QS)}
    empty = df.filter(F.lit(False))
    assert exact_percentiles_multi(empty, ["x"], QS) == {"x": [None] * len(QS)}
    assert exact_percentiles(empty, "x", QS) == [None] * len(QS)


def test_single_column_matches_multi(spark):
    rng = random.Random(7)
    vals = [rng.uniform(-100, 100) for _ in range(501)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    single = exact_percentiles(
        df.select(F.col("x").cast("double").alias("x")), "x", QS
    )
    multi = exact_percentiles_multi(df, ["x"], QS)["x"]
    assert [_bits(a) for a in single] == [_bits(b) for b in multi]
