"""Single-pass test-suite compiler.

Groups every test targeting one table into ONE ``df.agg(...)`` (the
measures), then unpivots the single aggregate row into one outcome row
per test with a ``stack``-style explode — all inside the Spark plan, no
driver-side row loop. This mirrors the reference's "in-database SQL,
no data copies" execution claim (reference README.md:209) and keeps a
165-column × ~10-tests-per-column suite at one scan of the table.

Scale notes: the aggregate is a global (no grouping key) hash
aggregate — Spark computes partial aggregates map-side and merges a
single row, so the shuffle is O(#tests), not O(rows). Suites larger
than ``chunk_size`` are split into several agg passes and unioned to
keep the codegen constant pool bounded.

``compile_suite_sql`` emits the equivalent DuckDB SQL from the same
specs, which doubles as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .testtypes import TEST_TYPES, Lowered, TestSpec

OUTCOME_COLUMNS = ["table_name", "column_name", "test_type", "measure", "threshold_value", "result"]


def lower_spec(spec: TestSpec, as_of: str) -> Lowered:
    try:
        fn = TEST_TYPES[spec.test_type]
    except KeyError:
        raise ValueError(f"unknown test type {spec.test_type!r}") from None
    return fn(spec.column, spec.params, as_of)


def _violated(measure: Column, low: Lowered) -> Column:
    return measure < low.bound if low.op == "<" else measure > low.bound


def compile_suite(
    df: DataFrame, specs: list[TestSpec], as_of: str, chunk_size: int = 200
) -> DataFrame:
    """Compile + run a test suite against one table's DataFrame.

    Returns one row per test: OUTCOME_COLUMNS. A NULL measure (empty
    table / all-null column) is vacuously PASSED.
    """
    if not specs:
        raise ValueError("empty test suite")
    parts: list[DataFrame] = []
    for start in range(0, len(specs), chunk_size):
        batch = specs[start : start + chunk_size]
        lowered = [lower_spec(s, as_of) for s in batch]
        row = df.agg(*[low.measure().cast("double").alias(f"m{i}") for i, low in enumerate(lowered)])
        structs = []
        for i, (spec, low) in enumerate(zip(batch, lowered)):
            m = F.round(F.col(f"m{i}"), 4)
            result = (
                F.when(m.isNull(), F.lit("PASSED"))
                .when(_violated(m, low), F.lit(spec.severity))
                .otherwise(F.lit("PASSED"))
            )
            structs.append(
                F.struct(
                    F.lit(spec.table).alias("table_name"),
                    F.lit(spec.column).alias("column_name"),
                    F.lit(spec.test_type).alias("test_type"),
                    m.alias("measure"),
                    F.lit(float(low.bound)).alias("threshold_value"),
                    result.alias("result"),
                )
            )
        parts.append(
            row.select(F.explode(F.array(*structs)).alias("o")).select("o.*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compile_suite_sql(table_sql: str, specs: list[TestSpec], as_of: str) -> str:
    """Equivalent ANSI SQL (DuckDB dialect) for the same suite — the
    correctness oracle. ``table_sql`` is the FROM-clause relation."""
    if not specs:
        raise ValueError("empty test suite")
    lowered = [lower_spec(s, as_of) for s in specs]
    measures = ", ".join(f"({low.measure_sql}) AS m{i}" for i, low in enumerate(lowered))
    selects = []
    for i, (spec, low) in enumerate(zip(specs, lowered)):
        viol = f"round(m{i}, 4) {low.op} {low.bound!r}"
        selects.append(
            f"SELECT '{spec.table}' AS table_name, '{spec.column}' AS column_name, "
            f"'{spec.test_type}' AS test_type, round(m{i}, 4) AS measure, "
            f"CAST({low.bound!r} AS DOUBLE) AS threshold_value, "
            f"CASE WHEN m{i} IS NULL THEN 'PASSED' WHEN {viol} THEN '{spec.severity}' "
            f"ELSE 'PASSED' END AS result FROM m"
        )
    union = " UNION ALL ".join(selects)
    return f"WITH m AS MATERIALIZED (SELECT {measures} FROM {table_sql}) {union}"
