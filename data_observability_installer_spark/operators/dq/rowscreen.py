"""Row-level screening and quarantine: the dead-letter path of the DQ
suite.

The suite (`compiler.py`) answers "does this TABLE pass?" with one
aggregate per test (reference TestGen semantics, `README.md:209`,
`demo/input_data/data_tests.csv`). Production loads also need the
ROW-level answer — *which records* broke Required / LOV / Pattern /
range tests — so the load can land the clean rows and divert the
violators instead of failing wholesale. This module lowers the
row-expressible subset of the same test vocabulary (same `TestSpec`,
same baseline parameters, same null semantics: only `Required` treats
NULL as a violation, matching the aggregate lowerings where NULL never
enters a count) to per-row predicates, tags every row with the list of
tests it violates, and splits/writes the two streams.

Scale: the tag is one `array_compact(array(when(...)))` projection —
pure whole-stage-codegen expressions, no shuffle, no UDF; the split is
two filters over the same scan; signature rollup is one
map-side-combinable groupBy on a low-cardinality string key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .testtypes import (
    EMAIL_RE,
    US_STATES,
    TestSpec,
    _f,
    _sql_quote,
    parse_lov,
)


@dataclass(frozen=True)
class RowLowered:
    """One test lowered to a per-row violation predicate. ``cond`` is a
    thunk (lazy Column — oracle emission must not need a live
    SparkContext); ``cond_sql`` is the DuckDB twin. NULL predicate
    results mean "not a violation" in both engines (CASE WHEN NULL
    yields NULL, which the array compaction drops)."""

    cond: Callable[[], Column]
    cond_sql: str


RowFn = Callable[[str, dict, str], RowLowered]

ROW_TYPES: dict[str, RowFn] = {}


def _register(name: str):
    def deco(fn: RowFn) -> RowFn:
        ROW_TYPES[name] = fn
        return fn

    return deco


@_register("Required")
def _required(col: str, p: dict, as_of: str) -> RowLowered:
    return RowLowered(lambda: F.col(col).isNull(), f"{col} IS NULL")


@_register("Constant")
def _constant(col: str, p: dict, as_of: str) -> RowLowered:
    raw = p.get("Baseline_Value", "")
    vals = parse_lov(raw)
    const = vals[0] if vals else raw.strip()
    return RowLowered(
        lambda: F.col(col).cast("string") != F.lit(const),
        f"CAST({col} AS VARCHAR) <> {_sql_quote(const)}",
    )


@_register("LOV_Match")
def _lov_match(col: str, p: dict, as_of: str) -> RowLowered:
    lov = parse_lov(p.get("Baseline_Value", ""))
    in_sql = ", ".join(_sql_quote(v) for v in lov) or "''"
    return RowLowered(
        lambda: ~F.col(col).cast("string").isin(lov),
        f"CAST({col} AS VARCHAR) NOT IN ({in_sql})",
    )


def _regex_miss(col: str, pattern: str) -> RowLowered:
    anchored = pattern if pattern.startswith("^") else f"^{pattern}$"
    return RowLowered(
        lambda: ~F.col(col).cast("string").rlike(anchored),
        f"NOT regexp_matches(CAST({col} AS VARCHAR), {_sql_quote(anchored)})",
    )


@_register("Pattern_Match")
def _pattern_match(col: str, p: dict, as_of: str) -> RowLowered:
    return _regex_miss(col, p.get("Baseline_Value", ".*").strip().strip("'"))


@_register("Email_Format")
def _email_format(col: str, p: dict, as_of: str) -> RowLowered:
    return _regex_miss(col, EMAIL_RE)


@_register("US_State")
def _us_state(col: str, p: dict, as_of: str) -> RowLowered:
    in_sql = ", ".join(_sql_quote(v) for v in US_STATES)
    return RowLowered(
        lambda: ~F.upper(F.col(col).cast("string")).isin(US_STATES),
        f"upper(CAST({col} AS VARCHAR)) NOT IN ({in_sql})",
    )


@_register("Min_Val")
def _min_val(col: str, p: dict, as_of: str) -> RowLowered:
    bound = _f(p, "Baseline_Value") - _f(p, "Threshold_Value", 0)
    return RowLowered(
        lambda: F.col(col).cast("double") < bound,
        f"CAST({col} AS DOUBLE) < {bound!r}",
    )


@_register("Min_Date")
def _min_date(col: str, p: dict, as_of: str) -> RowLowered:
    b = p.get("Baseline_Value", as_of).strip().strip("'")[:10]
    t = _f(p, "Threshold_Value", 0)
    return RowLowered(
        lambda: F.datediff(F.lit(b).cast("date"), F.col(col).cast("date")) > t,
        f"datediff('day', CAST({col} AS DATE), DATE {_sql_quote(b)}) > {t!r}",
    )


@_register("Future_Date")
def _future_date(col: str, p: dict, as_of: str) -> RowLowered:
    return RowLowered(
        lambda: F.col(col).cast("date") > F.lit(as_of).cast("date"),
        f"CAST({col} AS DATE) > DATE {_sql_quote(as_of)}",
    )


@_register("Future_Date_1Y")
def _future_date_1y(col: str, p: dict, as_of: str) -> RowLowered:
    return RowLowered(
        lambda: F.col(col).cast("date")
        > F.add_months(F.lit(as_of).cast("date"), 12),
        f"CAST({col} AS DATE) > DATE {_sql_quote(as_of)} + INTERVAL 12 MONTH",
    )


def _lower(specs: list[TestSpec], as_of: str) -> list[tuple[TestSpec, RowLowered]]:
    out = []
    for s in specs:
        fn = ROW_TYPES.get(s.test_type)
        if fn is None:
            raise ValueError(
                f"{s.test_type} is not row-expressible; row-screenable "
                f"types: {sorted(ROW_TYPES)}"
            )
        out.append((s, fn(s.column, s.params, as_of)))
    return out


def row_screen(df: DataFrame, specs: list[TestSpec], as_of: str) -> DataFrame:
    """Original rows plus ``violations: array<string>`` — the keys of
    every violated test in spec order; empty array for clean rows. One
    codegen projection, no shuffle."""
    lowered = _lower(specs, as_of)
    tags = F.array_compact(
        F.array(*[F.when(rl.cond(), F.lit(s.key)) for s, rl in lowered])
    )
    return df.withColumn("violations", tags)


def row_screen_violations_sql(specs: list[TestSpec], as_of: str) -> str:
    """DuckDB expression for the same ``violations`` list."""
    lowered = _lower(specs, as_of)
    cases = ", ".join(
        f"CASE WHEN {rl.cond_sql} THEN {_sql_quote(s.key)} END" for s, rl in lowered
    )
    return f"list_filter([{cases}], x -> x IS NOT NULL)"


def violation_signatures(
    df: DataFrame, specs: list[TestSpec], as_of: str
) -> DataFrame:
    """Rollup of the screen: rows per violation signature (the
    comma-joined violated-test keys; '' = clean). The quarantine
    decision surface — which co-occurring failure patterns exist and
    how big each stream is."""
    return (
        row_screen(df, specs, as_of)
        .select(F.array_join("violations", ",").alias("signature"))
        .groupBy("signature")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .orderBy("signature")
    )


def violation_signatures_sql(table: str, specs: list[TestSpec], as_of: str) -> str:
    v = row_screen_violations_sql(specs, as_of)
    return f"""
    SELECT coalesce(array_to_string({v}, ','), '') AS signature,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM {table}
    GROUP BY 1 ORDER BY signature
    """


def quarantine_split(
    df: DataFrame, specs: list[TestSpec], as_of: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): clean rows with the tag column dropped,
    violators with it kept (the dead-letter payload carries WHY)."""
    tagged = row_screen(df, specs, as_of)
    clean = tagged.filter(F.size("violations") == 0).drop("violations")
    bad = tagged.filter(F.size("violations") > 0)
    return clean, bad


def quarantine_write(
    df: DataFrame,
    specs: list[TestSpec],
    as_of: str,
    clean_path: str,
    quarantine_path: str,
) -> dict:
    """Land clean rows at ``clean_path`` and violators (with their
    ``violations`` tags) at ``quarantine_path``; returns row counts.
    Two filters over one scan definition — Spark schedules two jobs but
    each is a single pass with the tag projection fused into the
    write."""
    clean, bad = quarantine_split(df, specs, as_of)
    clean.write.mode("overwrite").parquet(clean_path)
    bad.write.mode("overwrite").parquet(quarantine_path)
    spark = df.sparkSession
    n_clean = spark.read.parquet(clean_path).count()
    n_bad = spark.read.parquet(quarantine_path).count()
    return {"clean_rows": n_clean, "quarantined_rows": n_bad}
