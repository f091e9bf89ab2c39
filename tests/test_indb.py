"""In-database suite execution parity: the SAME suite runs via the
Spark compiler and via ``run_suite_indb`` on an embedded DuckDB holding
the same parquet — outcome rows must be identical."""

from __future__ import annotations

import duckdb
import pytest

from data_observability_installer_spark.operators.dq.compiler import (
    OUTCOME_COLUMNS,
    compile_suite,
)
from data_observability_installer_spark.operators.dq.indb import (
    outcomes_to_df,
    run_suite_indb,
)
from data_observability_installer_spark.plans.suites import AS_OF, DEMO_SUITES
from data_observability_installer_spark.sources.tables import TABLES, load_table

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    yield c
    c.close()


def _norm(rows):
    out = []
    for r in rows:
        r = dict(r)
        if r["measure"] is not None:
            r["measure"] = round(float(r["measure"]), 4)
        r["threshold_value"] = round(float(r["threshold_value"]), 4)
        out.append(tuple(r[c] for c in OUTCOME_COLUMNS))
    return sorted(out)


@pytest.mark.parametrize("suite_name", list(DEMO_SUITES))
def test_indb_matches_spark_path(spark, con, suite_name):
    table, specs, view_builder, table_sql = DEMO_SUITES[suite_name]
    df = load_table(spark, SF, table)
    if view_builder is not None:
        df = view_builder(df)
    spark_rows = [row.asDict() for row in compile_suite(df, specs, AS_OF).collect()]
    indb_rows = run_suite_indb(con, table_sql, specs, AS_OF)
    assert _norm(indb_rows) == _norm(spark_rows)


def test_outcomes_lift_to_dataframe(spark, con):
    table, specs, _, table_sql = DEMO_SUITES["dq_suite_lineitem"]
    outcomes = run_suite_indb(con, table_sql, specs, AS_OF)
    df = outcomes_to_df(spark, outcomes)
    assert df.columns == OUTCOME_COLUMNS
    assert df.count() == len(specs)


def test_indb_runs_on_sqlite_dialect_subset():
    """The executor itself is engine-agnostic (DB-API): a trivial
    suite whose SQL is ANSI-only runs on sqlite3 too."""
    import sqlite3

    from data_observability_installer_spark.operators.dq.testtypes import TestSpec

    c = sqlite3.connect(":memory:")
    c.execute("CREATE TABLE t (x REAL)")
    c.executemany("INSERT INTO t VALUES (?)", [(float(i),) for i in range(10)])
    specs = [
        TestSpec("t", "x", "Row_Ct", {"Baseline_Ct": "5", "Threshold_Value": "0"}),
        TestSpec("t", "x", "Min_Val", {"Baseline_Value": "0", "Threshold_Value": "0"}),
    ]
    rows = run_suite_indb(c, "t", specs, AS_OF)
    assert [r["result"] for r in rows] == ["PASSED", "PASSED"]


def test_functional_dep_indb_parity(spark, con):
    """The round-7 Functional_Dep test type runs in-database too: its
    struct-distinct measure must agree with the Spark aggregate on a
    real table (o_orderkey -> o_custkey holds; o_custkey ->
    o_orderstatus is violated at scale)."""
    from data_observability_installer_spark.operators.dq.testtypes import TestSpec

    specs = [
        TestSpec("orders", "o_orderkey", "Functional_Dep",
                 {"Dependent_Column": "o_custkey", "Threshold_Value": "0"}),
        TestSpec("orders", "o_custkey", "Functional_Dep",
                 {"Dependent_Column": "o_orderstatus", "Threshold_Value": "0"}),
    ]
    df = load_table(spark, SF, "orders")
    spark_rows = [row.asDict() for row in compile_suite(df, specs, AS_OF).collect()]
    indb_rows = run_suite_indb(con, "orders", specs, AS_OF)
    assert _norm(indb_rows) == _norm(spark_rows)
    by = {r["column_name"]: r["result"] for r in spark_rows}
    assert by["o_orderkey"] == "PASSED" and by["o_custkey"] == "WARNING"


def test_profile_indb_matches_spark(spark, con):
    """In-database profiling returns the same metric rows as the Spark
    profile (value-for-value on the long form), and the lifted frame
    drives the hygiene screens unchanged."""
    from data_observability_installer_spark.operators.dq.indb import (
        profile_to_df,
        run_profile_indb,
    )
    from data_observability_installer_spark.operators.hygiene import hygiene
    from data_observability_installer_spark.operators.profile import profile
    from data_observability_installer_spark.sources.tables import STATIC_SCHEMAS

    rows = run_profile_indb(con, "orders", "orders", STATIC_SCHEMAS["orders"], AS_OF)
    spark_rows = profile(
        load_table(spark, SF, "orders"), "orders", AS_OF
    ).collect()

    def norm(rs):
        out = []
        for r in rs:
            r = dict(r) if not isinstance(r, dict) else r
            v = r["value"]
            out.append(
                (
                    r["table_name"], r["column_name"], r["metric"],
                    None if v is None else round(float(v), 4),
                    r["value_str"],
                )
            )
        return sorted(out)

    assert norm(rows) == norm([x.asDict() for x in spark_rows])

    lifted = profile_to_df(spark, rows)
    h_indb = {
        (r["column_name"], r["detector"]) for r in hygiene(lifted, AS_OF).collect()
    }
    h_spark = {
        (r["column_name"], r["detector"])
        for r in hygiene(
            profile(load_table(spark, SF, "orders"), "orders", AS_OF), AS_OF
        ).collect()
    }
    assert h_indb == h_spark
