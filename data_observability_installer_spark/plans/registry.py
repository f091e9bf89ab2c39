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


# ---------------------------------------------------------------------------
# Observability analytics over the generic events table (SURVEY §2.3).
# The full event grammar (A2/A3/A4/A6/A8 with catalogs, cron, DAGs) is
# exercised by the fixture tests; these queries express the same operator
# shapes over the driver's generic events.parquet so the DuckDB oracle can
# check them value-for-value.
# ---------------------------------------------------------------------------

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_STATUS_SPARK = (
    "CASE event_type WHEN 'purchase' THEN 'COMPLETED' WHEN 'error' THEN 'FAILED' "
    "ELSE 'RUNNING' END"
)


@register(
    "a1_run_rollup_events",
    """
    WITH e AS (
      SELECT 'pipeline-' || CAST(user_id % 5 AS VARCHAR) AS pipeline_key,
             CAST(user_id AS VARCHAR) || ':' || strftime(ts, '%Y-%m-%d') AS run_key,
             ts,
             CASE event_type WHEN 'purchase' THEN 'COMPLETED'
                  WHEN 'error' THEN 'FAILED' ELSE 'RUNNING' END AS status
      FROM events)
    SELECT pipeline_key, run_key,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
           CASE WHEN sum(CASE WHEN status = 'FAILED' THEN 1 ELSE 0 END) > 0 THEN 'FAILED'
                WHEN sum(CASE WHEN status = 'COMPLETED' THEN 1 ELSE 0 END) > 0 THEN 'COMPLETED'
                ELSE 'RUNNING' END AS final_status,
           count(*) AS event_ct
    FROM e GROUP BY pipeline_key, run_key
    """,
)
def a1_run_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 run-state rollup shape: map the generic stream into the run
    grammar (run = user-day), fold set-wise. One hash-agg shuffle on the
    run key; final status needs no ordering (duplicate-timestamp safe)."""
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        F.concat(F.lit("pipeline-"), (F.col("user_id") % 5).cast("string")).alias("pipeline_key"),
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), F.date_format("ts", "yyyy-MM-dd")
        ).alias("run_key"),
        F.col("ts"),
        F.expr(_STATUS_SPARK).alias("status"),
    )
    return e.groupBy("pipeline_key", "run_key").agg(
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("start_ts"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("end_ts"),
        F.when(F.sum((F.col("status") == "FAILED").cast("int")) > 0, "FAILED")
        .when(F.sum((F.col("status") == "COMPLETED").cast("int")) > 0, "COMPLETED")
        .otherwise("RUNNING")
        .alias("final_status"),
        F.count(F.lit(1)).alias("event_ct"),
    )


@register(
    "a2_user_sessions",
    """
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) + 1 AS session_id
      FROM g)
    SELECT user_id, CAST(session_id AS INT) AS session_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS event_ct
    FROM s GROUP BY user_id, session_id
    """,
)
def a2_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 instance-windowing shape: gap-based sessionization (30-min
    inactivity closes the instance). lag + running sum inside one window
    partition — a single shuffle on the session key; the batch analog of
    ``session_window`` in the streaming variant."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.when(
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) > 1800, 1
    ).otherwise(0)
    g = ev.withColumn("new_session", gap)
    s = g.withColumn(
        "session_id",
        (F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)) + 1).cast("int"),
    )
    return s.groupBy("user_id", "session_id").agg(
        F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("session_start"),
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("session_end"),
        F.count(F.lit(1)).alias("event_ct"),
    )


@register(
    "a5_metric_threshold_alerts",
    """
    SELECT user_id, count(*) AS alert_ct, round(max(value), 2) AS max_value
    FROM events WHERE event_type = 'error' AND value > 150
    GROUP BY user_id
    """,
)
def a5_metric_threshold_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 metric-threshold rule shape: {key: 'error', operator: gt,
    static_value: 150}. Filter pushes into the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 150))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("alert_ct"), F.round(F.max("value"), 2).alias("max_value"))
    )


@register(
    "a7_status_rollup_events",
    """
    SELECT 'pipeline-' || CAST(user_id % 5 AS VARCHAR) AS pipeline_key,
           count(*) AS outcome_ct,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS passed_ct,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS failed_ct
    FROM events GROUP BY pipeline_key
    """,
)
def a7_status_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 outcome-rollup shape: per-component status counts."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.concat(F.lit("pipeline-"), (F.col("user_id") % 5).cast("string")).alias("pipeline_key")
        )
        .agg(
            F.count(F.lit(1)).alias("outcome_ct"),
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("passed_ct"),
            F.sum((F.col("event_type") == "error").cast("int")).alias("failed_ct"),
        )
    )


@register(
    "a8_liveness_events",
    """
    SELECT user_id,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CASE WHEN max(ts) >= TIMESTAMP '2024-01-30 00:00:00' THEN true ELSE false END AS live
    FROM events GROUP BY user_id
    """,
)
def a8_liveness_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 liveness shape: newest heartbeat per agent vs an as-of instant."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("last_seen"),
        (F.max("ts") >= F.lit("2024-01-30 00:00:00").cast("timestamp")).alias("live"),
    )


# ---------------------------------------------------------------------------
# Reconciliation tests (SURVEY §2.5 — the "2 custom test types")
# ---------------------------------------------------------------------------


@register("reconcile_orders_lineitem")
def reconcile_orders_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dq.reconcile import ReconcileCheck, reconcile

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    checks = [
        ReconcileCheck("order_keys_match_lineitem", F.countDistinct("o_orderkey"),
                       F.countDistinct("l_orderkey"), "=="),
        ReconcileCheck("orders_not_fewer_than_10x_lines", F.count(F.lit(1)) * 10,
                       F.count(F.lit(1)), ">="),
        ReconcileCheck("total_price_covers_discounted_lines", F.round(F.sum("o_totalprice"), 2),
                       F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2), ">="),
    ]
    return reconcile(o, li, checks)


from ..operators.dq.reconcile import reconcile_sql as _reconcile_sql  # noqa: E402

ORACLES["reconcile_orders_lineitem"] = _reconcile_sql(
    "orders",
    "lineitem",
    [
        ("order_keys_match_lineitem", "CAST(count(DISTINCT o_orderkey) AS DOUBLE)",
         "CAST(count(DISTINCT l_orderkey) AS DOUBLE)", "==", "FAILED"),
        ("orders_not_fewer_than_10x_lines", "CAST(count(*) * 10 AS DOUBLE)",
         "CAST(count(*) AS DOUBLE)", ">=", "FAILED"),
        ("total_price_covers_discounted_lines", "round(CAST(sum(o_totalprice) AS DOUBLE), 2)",
         "round(sum(l_extendedprice * (1 - l_discount)), 2)", ">=", "FAILED"),
    ],
)


# ---------------------------------------------------------------------------
# LLM-training-data pipeline operators (build charter: dedup, similarity,
# text analysis over documents/embeddings). Params are chosen so the
# sf0.01 tables produce non-trivial results (probed: 25 jaccard>=0.3
# pairs, within-label cosine max 0.475).
# ---------------------------------------------------------------------------

from ..operators.llm import dedup as _dedup  # noqa: E402
from ..operators.llm import similarity as _sim  # noqa: E402
from ..operators.llm import text as _text  # noqa: E402

_JACCARD_ARGS = dict(text_col="text", id_col="doc_id", n=3, threshold=0.3, max_df=1000)
_MINHASH_ARGS = dict(
    text_col="text", id_col="doc_id", n=3, num_hashes=12, bands=4, threshold=0.3, max_df=1000
)


@register("dedup_exact_documents", _dedup.dedup_exact_sql("documents"))
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.dedup_exact(load_table(spark, sf_dir, "documents"))


@register("ngram_jaccard_documents", _dedup.ngram_jaccard_sql("documents", **_JACCARD_ARGS))
def ngram_jaccard_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), **_JACCARD_ARGS)


@register("minhash_pairs_documents", _dedup.minhash_pairs_sql("documents", **_MINHASH_ARGS))
def minhash_pairs_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.minhash_pairs(load_table(spark, sf_dir, "documents"), **_MINHASH_ARGS)


@register("simhash_documents")  # xxhash64 is Spark-native: rows-only check
def simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash_buckets(load_table(spark, sf_dir, "documents"))


@register("fingerprint_documents", _text.fingerprint_sql("documents"))
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.fingerprint(load_table(spark, sf_dir, "documents"))


@register("language_id_documents", _text.language_id_sql("documents"))
def language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.language_id(load_table(spark, sf_dir, "documents"))


@register("quality_documents", _text.quality_score_sql("documents"))
def quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.quality_score(load_table(spark, sf_dir, "documents"))


@register("token_counts_documents", _text.token_counts_sql("documents"))
def token_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.token_counts(load_table(spark, sf_dir, "documents"))


@register("topk_bruteforce_embeddings", _sim.topk_bruteforce_sql("embeddings", k=10, query_id=0))
def topk_bruteforce_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.topk_bruteforce(load_table(spark, sf_dir, "embeddings"), k=10, query_id=0)


@register("topk_lsh_embeddings", _sim.topk_lsh_sql("embeddings", k=10, query_id=0))
def topk_lsh_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.topk_lsh(load_table(spark, sf_dir, "embeddings"), k=10, query_id=0)


@register("embedding_near_dups", _sim.embedding_near_dups_sql("embeddings", threshold=0.35))
def embedding_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sim.embedding_near_dups(load_table(spark, sf_dir, "embeddings"), threshold=0.35)


def queries() -> dict[str, QueryFn]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
