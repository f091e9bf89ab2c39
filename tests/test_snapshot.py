"""Snapshot-comparison operators: row-level diff, SCD2 history,
batch schema drift — micro-DataFrame boundary cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.dq.snapshot import (
    scd2_history,
    schema_drift_batch,
    snapshot_diff,
)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_snapshot_diff_all_statuses(spark):
    old = _df(
        spark,
        [(1, "a"), (2, "b"), (3, "c")],
        "k int, v string",
    )
    new = _df(
        spark,
        [(1, "a"), (2, "CHANGED"), (4, "d")],
        "k int, v string",
    )
    out = {
        r["status"]: (r["row_ct"], r["sample_key"])
        for r in snapshot_diff(old, new, ["k"], ["v"]).collect()
    }
    assert out == {
        "ADDED": (1, "4"),
        "REMOVED": (1, "3"),
        "CHANGED": (1, "2"),
        "UNCHANGED": (1, "1"),
    }


def test_snapshot_diff_null_value_is_null_safe(spark):
    old = _df(spark, [(1, None), (2, None)], "k int, v string")
    new = _df(spark, [(1, None), (2, "now-set")], "k int, v string")
    out = {r["status"]: r["row_ct"] for r in snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # NULL == NULL must count as UNCHANGED; NULL -> value as CHANGED
    assert out == {"UNCHANGED": 1, "CHANGED": 1}


def test_snapshot_diff_composite_key(spark):
    old = _df(spark, [(1, 1, "x"), (1, 2, "y")], "k1 int, k2 int, v string")
    new = _df(spark, [(1, 1, "x"), (2, 1, "z")], "k1 int, k2 int, v string")
    out = {r["status"]: r["sample_key"] for r in snapshot_diff(
        old, new, ["k1", "k2"], ["v"]).collect()}
    assert out["ADDED"] == "2:1"
    assert out["REMOVED"] == "1:2"


def test_scd2_collapses_consecutive_duplicates(spark):
    rows = [
        (1, "P", "2024-01-01", 10),
        (1, "P", "2024-01-02", 11),  # same value: merges into first interval
        (1, "F", "2024-01-03", 12),
        (1, "P", "2024-01-05", 13),  # value returns: NEW interval, not merged
        (2, "O", "2024-01-01", 14),
    ]
    df = _df(spark, rows, "k int, status string, d string, ord int").withColumn(
        "d", F.to_timestamp("d")
    )
    hist = scd2_history(df, "k", "status", "d", "ord").orderBy("k", "valid_from")
    got = [
        (r["k"], r["status"], str(r["valid_from"])[:10],
         str(r["valid_to"])[:10] if r["valid_to"] else None, r["is_current"])
        for r in hist.collect()
    ]
    assert got == [
        (1, "P", "2024-01-01", "2024-01-03", False),
        (1, "F", "2024-01-03", "2024-01-05", False),
        (1, "P", "2024-01-05", None, True),
        (2, "O", "2024-01-01", None, True),
    ]


def test_scd2_same_timestamp_tiebreak_is_deterministic(spark):
    # two status changes on the SAME day: the tiebreak column decides
    # the chain order, so the later orderkey wins the open interval
    rows = [(1, "P", "2024-01-01", 1), (1, "F", "2024-01-01", 2)]
    df = _df(spark, rows, "k int, status string, d string, ord int").withColumn(
        "d", F.to_timestamp("d")
    )
    hist = scd2_history(df, "k", "status", "d", "ord").collect()
    current = [r["status"] for r in hist if r["is_current"]]
    assert current == ["F"]


def test_schema_drift_batch_detects_all_three(spark):
    df = _df(spark, [(1, "x", 2.0)], "a int, b string, c double")
    expected = [("a", "int"), ("b", "int"), ("d", "string")]
    out = {(r["drift"], r["column"]) for r in schema_drift_batch(expected, df).collect()}
    assert out == {
        ("ADDED_COLUMN", "c"),
        ("TYPE_CHANGED", "b"),
        ("DROPPED_COLUMN", "d"),
    }


def test_schema_drift_batch_empty_when_identical(spark):
    df = _df(spark, [(1, "x")], "a int, b string")
    assert schema_drift_batch([("a", "int"), ("b", "string")], df).count() == 0


# -- distribution extras + fuzzy matching ---------------------------------

from data_observability_installer_spark.operators.llm.dedup import fuzzy_pairs
from data_observability_installer_spark.operators.profile import (
    correlations,
    histogram,
)


def test_histogram_constant_column_single_bucket(spark):
    df = spark.createDataFrame([(5.0,)] * 7 + [(None,)], "x double")
    rows = histogram(df, "x", bins=8).collect()
    assert len(rows) == 1
    assert rows[0]["bucket"] == 0 and rows[0]["ct"] == 7  # nulls excluded


def test_histogram_counts_cover_all_non_null_rows(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    rows = histogram(df, "x", bins=4).collect()
    assert sum(r["ct"] for r in rows) == 100
    assert [r["bucket"] for r in rows] == [0, 1, 2, 3]
    assert rows[-1]["ct"] == 25  # max value clamps into the last bucket


def test_correlations_perfect_and_inverse(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i, -3.0 * i) for i in range(50)], "a double, b double, c double"
    )
    out = {(r["col_a"], r["col_b"]): r["corr"] for r in correlations(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_fuzzy_pairs_finds_typo_within_block_only(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha-store-001"),
            (2, "alpha-store-002"),   # dist 1 from id 1, same block
            (3, "alpha-store-x02"),   # dist 2 from id 2
            (4, "beta-store-0001"),   # other block, never compared
        ],
        "id int, name string",
    )
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in fuzzy_pairs(df, "id", "name", block_prefix=11).collect()}
    assert got == {(1, 2): 1, (2, 3): 1}  # x02 vs 002 is dist 1; 001 vs x02 is 2


def test_scd2_null_attribute_runs_merge(spark):
    # NULL -> NULL must merge into ONE interval; NULL -> value and
    # value -> NULL are real change points
    rows = [
        (1, None, "2024-01-01", 1),
        (1, None, "2024-01-02", 2),   # same (NULL) value: merges
        (1, "P", "2024-01-03", 3),
        (1, None, "2024-01-04", 4),
    ]
    df = _df(spark, rows, "k int, status string, d string, ord int").withColumn(
        "d", F.to_timestamp("d")
    )
    hist = scd2_history(df, "k", "status", "d", "ord").orderBy("valid_from").collect()
    assert [(r["status"], str(r["valid_from"])[:10]) for r in hist] == [
        (None, "2024-01-01"),
        ("P", "2024-01-03"),
        (None, "2024-01-04"),
    ]
    assert [r["is_current"] for r in hist] == [False, False, True]


def test_apply_cdc_latest_op_wins_and_untouched_pass_through(spark):
    from data_observability_installer_spark.operators.dq.snapshot import apply_cdc

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (2, "U", 1, "b2"),   # update
            (3, "U", 1, "c2"),   # update...
            (3, "D", 2, "c2"),   # ...shadowed by a later delete
            (4, "I", 1, "d"),    # brand-new key
            (4, "D", 2, "d"),    # deleted before it ever lands
            (4, "I", 3, "d3"),   # re-inserted with the final payload
        ],
        ["k", "op", "seq", "v"],
    )
    out = {r["k"]: r["v"] for r in apply_cdc(base, changes, ["k"], ["v"]).collect()}
    assert out == {1: "a", 2: "b2", 4: "d3"}  # 3 deleted, 1 untouched
