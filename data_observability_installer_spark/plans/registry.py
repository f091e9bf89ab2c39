"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a matching DuckDB oracle SQL
string. ``__spark_entry__.py`` re-exports these for the driver.

Column names are aliased identically on both sides — the driver's
compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dq.compiler import compile_suite, compile_suite_sql
from ..operators.hygiene import hygiene, hygiene_sql
from ..operators.profile import column_metrics, profile, profile_sql
from ..sources.tables import STATIC_SCHEMAS, load_table
from .suites import AS_OF, DEMO_SUITES

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Data-quality suites (SURVEY §2.4 — all 25 test types across 3 suites)
# ---------------------------------------------------------------------------


def _make_suite_query(table: str, specs, view_builder) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        df = load_table(spark, sf_dir, table)
        if view_builder is not None:
            df = view_builder(df)
        return compile_suite(df, specs, AS_OF)

    return run


for _name, (_table, _specs, _view, _table_sql) in DEMO_SUITES.items():
    QUERIES[_name] = _make_suite_query(_table, _specs, _view)
    ORACLES[_name] = compile_suite_sql(_table_sql, _specs, AS_OF)


# ---------------------------------------------------------------------------
# Profiling (SURVEY §2.4 profiling operators — 51 characteristics per column)
# ---------------------------------------------------------------------------


def _make_profile_query(table: str) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return profile(load_table(spark, sf_dir, table), table, AS_OF)

    return run


for _table in ["lineitem", "orders", "customer", "events", "documents"]:
    _name = f"profile_{_table}"
    QUERIES[_name] = _make_profile_query(_table)
    ORACLES[_name] = profile_sql(_table, _table, STATIC_SCHEMAS[_table], AS_OF)


# ---------------------------------------------------------------------------
# Hygiene screens (TestGen task 2 — 29 detectors over the profile)
# ---------------------------------------------------------------------------


def _make_hygiene_query(table: str) -> QueryFn:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return hygiene(profile(load_table(spark, sf_dir, table), table, AS_OF), AS_OF)

    return run


def _table_metric_names(table: str) -> list[str]:
    names: list[str] = []
    for c, dtype in STATIC_SCHEMAS[table]:
        for met in column_metrics(c, dtype, AS_OF):
            if met.name not in names:
                names.append(met.name)
    return names


for _table in ["lineitem", "customer", "events", "documents"]:
    _name = f"hygiene_{_table}"
    QUERIES[_name] = _make_hygiene_query(_table)
    ORACLES[_name] = hygiene_sql(
        profile_sql(_table, _table, STATIC_SCHEMAS[_table], AS_OF),
        _table_metric_names(_table),
        AS_OF,
    )


# ---------------------------------------------------------------------------
# Relational analytics (flagship + engine-capability queries)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: single scan, map-side partial
    aggregation, 6-group result. The scan prunes to 5 columns and pushes
    the shipdate filter into parquet."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_customers_by_revenue",
    """
    SELECT c.c_custkey, any_value(c.c_name) AS c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(DISTINCT o.o_orderkey) AS order_ct
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey
    ORDER BY revenue DESC, c_custkey LIMIT 10
    """,
)
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k. customer is broadcast (small dim); the
    orders↔lineitem join shuffles on the order key — at 100 TB both fact
    tables would be bucketed by orderkey to make this a co-located join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.col("c_name")).alias("c_name"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.countDistinct("o_orderkey").alias("order_ct"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(10)
    )


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
