"""Canonical demo test suites over the driver testdata.

Mirrors the role of the reference conformance corpus
``demo/input_data/data_tests.csv`` (822 rows, 25 test types over a star
schema): a frozen suite of parameterized tests whose baselines were
captured from a designated baseline slice — here, sf0.01 of the
driver-generated TPC-H-ish tables (seed=42). All 25 test types of
SURVEY §2.4 appear across the three suites.

``AS_OF`` is the frozen "test date" (the corpus equivalent of the demo
replaying history at backdated event times) so date tests are
deterministic regardless of wall clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dq.testtypes import TestSpec, US_STATES, TABLE_LEVEL

AS_OF = "2001-12-01"

# --- lineitem: volume, numeric, date coverage (20 test types) --------------

LINEITEM_SUITE = [
    TestSpec("lineitem", TABLE_LEVEL, "Row_Ct", {"Baseline_Ct": "60000", "Threshold_Value": "58800"}),
    TestSpec("lineitem", "l_quantity", "Required", {"Threshold_Value": "0"}),
    TestSpec("lineitem", "l_quantity", "Missing_Pct",
             {"Baseline_Ct": "60000", "Baseline_Value_Ct": "60000", "Threshold_Value": "2"}),
    TestSpec("lineitem", "l_partkey", "Unique_Pct",
             {"Baseline_Unique_Ct": "2000", "Baseline_Value_Ct": "60000", "Threshold_Value": "2"}),
    TestSpec("lineitem", "l_quantity", "Min_Val", {"Baseline_Value": "1.0", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_quantity", "Avg_Shift",
             {"Baseline_Avg": "25.40225", "Baseline_SD": "14.4321175290082", "Threshold_Value": "0.5"}),
    TestSpec("lineitem", "l_quantity", "Incr_Avg_Shift",
             {"Baseline_Avg": "25.40225", "Baseline_SD": "14.4321175290082",
              "Baseline_Sum": "1270000", "Baseline_Value_Ct": "50000", "Threshold_Value": "0.5"}),
    TestSpec("lineitem", "l_extendedprice", "Dec_Trunc", {"Threshold_Value": "29000"}),
    TestSpec("lineitem", "l_quantity", "Outlier_Pct_Above",
             {"Baseline_Avg": "25.40225", "Baseline_SD": "14.4321175290082", "Threshold_Value": "5"}),
    TestSpec("lineitem", "l_quantity", "Outlier_Pct_Below",
             {"Baseline_Avg": "25.40225", "Baseline_SD": "14.4321175290082", "Threshold_Value": "5"}),
    TestSpec("lineitem", "l_returnflag", "LOV_Match",
             {"Baseline_Value": "('A','N','R')", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_returnflag", "Pattern_Match",
             {"Baseline_Value": "[ANR]", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_linestatus", "Distinct_Value_Ct",
             {"Baseline_Value_Ct": "2", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Min_Date",
             {"Baseline_Value": "1995-01-02", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Future_Date", {"Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Future_Date_1Y", {"Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Recency", {"Threshold_Value": "60"}),
    TestSpec("lineitem", "l_shipdate", "Distinct_Date_Ct",
             {"Baseline_Value": "2499", "Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Monthly_Rec_Ct", {"Threshold_Value": "0"}),
    TestSpec("lineitem", "l_shipdate", "Weekly_Rec_Ct", {"Threshold_Value": "0"}),
]

# --- customer: identity / string-format tests (remaining 5 types) ----------
# Email / US-state / constant columns don't exist in the TPC-H-ish schema, so
# the suite runs on a derived view that synthesizes them deterministically
# (the oracle SQL derives the identical view).

CUSTOMER_SUITE = [
    TestSpec("customer", TABLE_LEVEL, "Row_Ct", {"Baseline_Ct": "1500", "Threshold_Value": "1470"}),
    TestSpec("customer", "c_custkey", "Unique", {"Threshold_Value": "0"}),
    TestSpec("customer", "c_name", "Alpha_Trunc", {"Baseline_Value": "18", "Threshold_Value": "0"}),
    TestSpec("customer", "c_mktsegment", "LOV_Match",
             {"Baseline_Value": "('AUTOMOBILE','BUILDING','FURNITURE','HOUSEHOLD','MACHINERY')",
              "Threshold_Value": "0"}),
    TestSpec("customer", "email", "Email_Format", {"Threshold_Value": "0"}),
    TestSpec("customer", "state", "US_State", {"Threshold_Value": "0"}),
    TestSpec("customer", "status", "Constant", {"Baseline_Value": "ACTIVE", "Threshold_Value": "0"}),
    TestSpec("customer", "c_acctbal", "Min_Val",
             {"Baseline_Value": "-994.28", "Threshold_Value": "0"}),
]

# --- orders: reconciliation-adjacent volume/date tests ----------------------

ORDERS_SUITE = [
    TestSpec("orders", TABLE_LEVEL, "Row_Ct", {"Baseline_Ct": "15000", "Threshold_Value": "14700"}),
    TestSpec("orders", "o_orderstatus", "LOV_Match",
             {"Baseline_Value": "('F','O','P')", "Threshold_Value": "0"}),
    TestSpec("orders", "o_orderpriority", "Distinct_Value_Ct",
             {"Baseline_Value_Ct": "5", "Threshold_Value": "0"}),
    TestSpec("orders", "o_orderpriority", "Alpha_Trunc",
             {"Baseline_Value": "15", "Threshold_Value": "0"}),
    TestSpec("orders", "o_totalprice", "Avg_Shift",
             {"Baseline_Avg": "250562.6413373334", "Baseline_SD": "143990.00419416575",
              "Threshold_Value": "0.5"}),
    TestSpec("orders", "o_orderdate", "Min_Date",
             {"Baseline_Value": "1995-01-01", "Threshold_Value": "0"}),
    TestSpec("orders", "o_orderdate", "Monthly_Rec_Ct", {"Threshold_Value": "0"}),
    TestSpec("orders", "o_orderdate", "Recency", {"Threshold_Value": "180"}),
]

_STATE_BY_NATION = US_STATES[:25]  # n_nationkey / c_nationkey ∈ [0, 24]


def customer_view(df: DataFrame) -> DataFrame:
    """Derive deterministic email/state/status columns for format tests."""
    states = F.array(*[F.lit(s) for s in _STATE_BY_NATION])
    return df.select(
        "*",
        F.concat(F.regexp_replace(F.col("c_name"), "[# ]", "."), F.lit("@example.com")).alias("email"),
        F.element_at(states, F.col("c_nationkey") + 1).alias("state"),
        F.lit("ACTIVE").alias("status"),
    )


def customer_view_sql() -> str:
    states = ", ".join(f"'{s}'" for s in _STATE_BY_NATION)
    return (
        "(SELECT *, regexp_replace(c_name, '[# ]', '.', 'g') || '@example.com' AS email, "
        f"([{states}])[c_nationkey + 1] AS state, 'ACTIVE' AS status FROM customer)"
    )


# --- events: the 10 extension types (README's 32-type claim) ----------------
# Baselines frozen at sf0.01 (10000 rows, 2024-01-01..2024-01-30, value
# avg 49.6307/sd 49.1024, 5 event types). None of these types reads the
# as-of clock, so the suite is date-frozen by construction.

EVENTS_SUITE = [
    TestSpec("events", TABLE_LEVEL, "Row_Ct_Pct",
             {"Baseline_Ct": "10000", "Threshold_Value": "10"}),
    TestSpec("events", "ts", "Daily_Rec_Ct", {"Threshold_Value": "0"}),
    TestSpec("events", "event_type", "LOV_All",
             {"Baseline_Value": "('click','error','purchase','signup','view')",
              "Threshold_Value": "0"}),
    TestSpec("events", "event_type", "New_Shift",
             {"Baseline_Value": "('click','error','purchase','signup','view')",
              "Threshold_Value": "5"}),
    TestSpec("events", "user_id", "Distinct_Shift",
             {"Baseline_Unique_Ct": "150", "Baseline_Value_Ct": "10000",
              "Threshold_Value": "2"}),
    TestSpec("events", "month_str", "Valid_Month", {"Threshold_Value": "0"}),
    TestSpec("events", "zip", "Zip_Code", {"Threshold_Value": "0"}),
    TestSpec("events", "value", "Variability_Increase",
             {"Baseline_SD": "49.10235064477291", "Threshold_Value": "0.25"}),
    TestSpec("events", "value", "Variability_Decrease",
             {"Baseline_SD": "49.10235064477291", "Threshold_Value": "0.25"}),
    TestSpec("events", TABLE_LEVEL, "Condition_Flag",
             {"Baseline_Value": "value < 0 OR value > 1000", "Threshold_Value": "0"}),
]


def events_view(df: DataFrame) -> DataFrame:
    """Derive deterministic month/zip columns for the format tests."""
    return df.select(
        "*",
        F.date_format(F.col("ts"), "MMMM").alias("month_str"),
        F.lpad((F.col("user_id") * 137 % 100000).cast("string"), 5, "0").alias("zip"),
    )


def events_view_sql() -> str:
    return (
        "(SELECT *, strftime(ts, '%B') AS month_str, "
        "lpad(CAST(user_id * 137 % 100000 AS VARCHAR), 5, '0') AS zip FROM events)"
    )


# suite name -> (table, specs, view builder or None, oracle FROM-relation)
DEMO_SUITES: dict[str, tuple[str, list[TestSpec], object, str]] = {
    "dq_suite_lineitem": ("lineitem", LINEITEM_SUITE, None, "lineitem"),
    "dq_suite_customer": ("customer", CUSTOMER_SUITE, customer_view, customer_view_sql()),
    "dq_suite_orders": ("orders", ORDERS_SUITE, None, "orders"),
    "dq_suite_events": ("events", EVENTS_SUITE, events_view, events_view_sql()),
}
