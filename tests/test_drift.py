"""PSI drift: identical data scores ~0; planted shifts register."""

from __future__ import annotations

from data_observability_installer_spark.operators.drift import (
    psi_categorical,
    psi_numeric,
)

EDGES = [10.0, 20.0, 30.0]
BASE = [25.0, 25.0, 25.0, 25.0]  # uniform quartiles


def test_numeric_psi_stable_on_same_distribution(spark):
    rows = [(float(v),) for v in range(0, 40)]  # 10 per bin
    df = spark.createDataFrame(rows, "x double")
    out = psi_numeric(df, "x", EDGES, BASE).collect()[0]
    assert out.drift == "STABLE" and abs(out.psi) < 1e-6


def test_numeric_psi_detects_shift(spark):
    rows = [(float(v),) for v in range(30, 70)]  # all mass in top bin
    df = spark.createDataFrame(rows, "x double")
    out = psi_numeric(df, "x", EDGES, BASE).collect()[0]
    assert out.drift == "MAJOR" and out.psi > 0.25


def test_numeric_psi_ignores_nulls(spark):
    rows = [(float(v),) for v in range(0, 40)] + [(None,)] * 20
    df = spark.createDataFrame(rows, "x double")
    out = psi_numeric(df, "x", EDGES, BASE).collect()[0]
    assert out.drift == "STABLE"


def test_categorical_psi_novel_category(spark):
    base = {"A": 50.0, "B": 50.0}
    same = spark.createDataFrame([("A",), ("B",)] * 20, "c string")
    assert psi_categorical(same, "c", base).collect()[0].drift == "STABLE"
    novel = spark.createDataFrame([("A",), ("Z",)] * 20, "c string")  # 50% unseen
    out = psi_categorical(novel, "c", base).collect()[0]
    assert out.drift == "MAJOR" and out.psi > 0.25
