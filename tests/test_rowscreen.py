"""Row-level DQ screen: predicate semantics per test type, null
handling parity with the aggregate suite, quarantine split/write, and
the no-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.dq.rowscreen import (
    quarantine_split,
    quarantine_write,
    row_screen,
    violation_signatures,
)
from data_observability_installer_spark.operators.dq.testtypes import TestSpec

AS_OF = "2001-12-01"


def _fixture(spark):
    rows = [
        # qty, flag, email, when
        (1, 5.0, "A", "a@b.com", "2001-01-01"),
        (2, 1.0, "R", "not-an-email", "2001-01-01"),  # Min_Val + LOV + email
        (3, None, "N", None, "2002-06-01"),  # Required + Future_Date; null email OK
        (4, 5.0, "N", "x@y.org", "2001-01-01"),  # clean
    ]
    return spark.createDataFrame(
        rows, "id int, qty double, flag string, email string, d string"
    )


_SPECS = [
    TestSpec("t", "qty", "Required"),
    TestSpec("t", "qty", "Min_Val", {"Baseline_Value": "2", "Threshold_Value": "0"}),
    TestSpec("t", "flag", "LOV_Match", {"Baseline_Value": "('A','N')"}),
    TestSpec("t", "email", "Email_Format"),
    TestSpec("t", "d", "Future_Date"),
]


def test_row_screen_tags(spark):
    out = {r["id"]: list(r["violations"]) for r in row_screen(_fixture(spark), _SPECS, AS_OF).collect()}
    assert out[1] == []
    assert out[2] == ["t.qty.Min_Val", "t.flag.LOV_Match", "t.email.Email_Format"]
    # NULL email is NOT an email violation (aggregate-suite parity);
    # NULL qty IS a Required violation but not a Min_Val one
    assert out[3] == ["t.qty.Required", "t.d.Future_Date"]
    assert out[4] == []


def test_non_row_expressible_type_rejected(spark):
    import pytest

    with pytest.raises(ValueError, match="not row-expressible"):
        row_screen(_fixture(spark), [TestSpec("t", "qty", "Avg_Shift")], AS_OF)


def test_signatures_rollup(spark):
    sig = {
        r["signature"]: r["n_rows"]
        for r in violation_signatures(_fixture(spark), _SPECS, AS_OF).collect()
    }
    assert sig[""] == 2
    assert sig["t.qty.Min_Val,t.flag.LOV_Match,t.email.Email_Format"] == 1
    assert sig["t.qty.Required,t.d.Future_Date"] == 1


def test_quarantine_split_and_write(spark, tmp_path):
    clean, bad = quarantine_split(_fixture(spark), _SPECS, AS_OF)
    assert sorted(r["id"] for r in clean.collect()) == [1, 4]
    assert "violations" not in clean.columns
    assert sorted(r["id"] for r in bad.collect()) == [2, 3]
    stats = quarantine_write(
        _fixture(spark), _SPECS, AS_OF, str(tmp_path / "clean"), str(tmp_path / "bad")
    )
    assert stats == {"clean_rows": 2, "quarantined_rows": 2}
    back = spark.read.parquet(str(tmp_path / "bad"))
    assert "violations" in back.columns


def test_screen_is_shuffle_free(spark):
    """The tag projection adds no Exchange: screening is map-only."""
    plan = (
        row_screen(_fixture(spark), _SPECS, AS_OF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_aggregate_suite_parity(spark):
    """Violation counts from the row screen equal the aggregate
    suite's measures for the shared (count-style) test types."""
    df = _fixture(spark)
    tagged = row_screen(df, _SPECS, AS_OF)
    per_test = (
        tagged.select(F.explode("violations").alias("k"))
        .groupBy("k")
        .count()
        .collect()
    )
    counts = {r["k"]: r["count"] for r in per_test}
    # independent aggregate computations
    assert counts["t.qty.Required"] == df.filter(F.col("qty").isNull()).count()
    assert counts["t.flag.LOV_Match"] == df.filter(~F.col("flag").isin(["A", "N"])).count()
    assert counts["t.qty.Min_Val"] == df.filter(F.col("qty") < 2).count()
