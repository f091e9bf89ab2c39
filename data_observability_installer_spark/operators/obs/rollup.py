"""A1 run-state rollup, A7 test-outcome rollup, A9 entity search.

A1 (SURVEY §2.3): fold per-(pipeline_key, run_key) RunStatus events
into one run row. Task-level events carry ``task_key``; run-level
events don't (``demo/demo/demo_helper.py:313-331`` run-level,
``:355-385`` task-level, ``:493-500`` terminal). The final status is
derived SET-wise (any FAILED → FAILED, else any COMPLETED → COMPLETED,
else RUNNING) rather than by max-by-timestamp — deterministic under
duplicate timestamps and identical in any SQL dialect.

Scale: one hash aggregate shuffled on (pipeline_key, run_key); the
event stream is naturally key-partitioned so AQE handles residual
skew. No window functions, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ...functions.time import epoch_seconds


def run_state_rollup(events: DataFrame) -> DataFrame:
    """RUN_STATUS events -> one row per run."""
    rs = events.filter(F.col("event_type") == "RUN_STATUS")
    run_level = F.col("task_key").isNull()
    return (
        rs.groupBy("pipeline_key", "run_key")
        .agg(
            F.min("event_timestamp").alias("start_ts"),
            F.max("event_timestamp").alias("end_ts"),
            F.when(F.sum((run_level & (F.col("status") == "FAILED")).cast("int")) > 0, "FAILED")
            .when(F.sum((run_level & (F.col("status") == "COMPLETED")).cast("int")) > 0, "COMPLETED")
            .otherwise("RUNNING")
            .alias("final_status"),
            F.count(F.lit(1)).alias("event_ct"),
            F.countDistinct("task_key").alias("task_ct"),
            F.sum(((~run_level) & (F.col("status") == "FAILED")).cast("int")).alias("failed_task_ct"),
        )
        .withColumn(
            "duration_s",
            (F.unix_timestamp("end_ts") - F.unix_timestamp("start_ts")).cast("double"),
        )
    )


def task_rollup(events: DataFrame) -> DataFrame:
    """Task breakdown of A1: one row per (run, task)."""
    ts = events.filter((F.col("event_type") == "RUN_STATUS") & F.col("task_key").isNotNull())
    return ts.groupBy("pipeline_key", "run_key", "task_key").agg(
        F.min("event_timestamp").alias("start_ts"),
        F.max("event_timestamp").alias("end_ts"),
        F.when(F.sum((F.col("status") == "FAILED").cast("int")) > 0, "FAILED")
        .when(F.sum((F.col("status") == "COMPLETED").cast("int")) > 0, "COMPLETED")
        .otherwise("RUNNING")
        .alias("final_status"),
    )


def test_outcome_rollup(events: DataFrame, by: str = "dataset_key") -> DataFrame:
    """A7: explode TestOutcomes arrays; pass/warn/fail counts + the
    sorted failed-test list per component."""
    ex = (
        events.filter(F.col("event_type") == "TEST_OUTCOMES")
        .select(by, F.explode("test_outcomes").alias("t"))
        .select(by, F.col("t.name").alias("test_name"), F.col("t.status").alias("status"))
    )
    return ex.groupBy(by).agg(
        F.count(F.lit(1)).alias("outcome_ct"),
        F.sum((F.col("status") == "PASSED").cast("int")).alias("passed_ct"),
        F.sum((F.col("status") == "WARNING").cast("int")).alias("warning_ct"),
        F.sum((F.col("status") == "FAILED").cast("int")).alias("failed_ct"),
        F.sort_array(
            F.collect_set(F.when(F.col("status") == "FAILED", F.col("test_name")))
        ).alias("failed_tests"),
    )


def message_log_rollup(msglogs: DataFrame, by: tuple[str, ...] = ("component_key", "run_key")) -> DataFrame:
    """MessageLog analytics: per-key INFO/WARNING/ERROR counts and the
    error rate. The reference posts MessageLog events with ``log_level
    ∈ {INFO, WARNING, ERROR}`` (demo/demo/demo_helper.py:332-342); this
    is the rollup its UI surfaces per run/component.

    Input columns: ``*by``, ``log_level``. One map-side-combined hash
    aggregate on the key — no sort, no window.
    """
    return msglogs.groupBy(*by).agg(
        F.count(F.lit(1)).alias("message_ct"),
        F.sum((F.col("log_level") == "INFO").cast("int")).alias("info_ct"),
        F.sum((F.col("log_level") == "WARNING").cast("int")).alias("warning_ct"),
        F.sum((F.col("log_level") == "ERROR").cast("int")).alias("error_ct"),
        F.round(
            F.sum((F.col("log_level") == "ERROR").cast("int")) / F.count(F.lit(1)), 4
        ).alias("error_rate"),
    )


def entity_search(components: DataFrame, query: str) -> DataFrame:
    """A9: substring lookup, first match by name (GET ...?search=,
    demo_helper.py:137-143)."""
    return (
        components.filter(F.col("name").contains(query))
        .orderBy("name")
        .limit(1)
    )


def run_duration_sla(runs: DataFrame, round_to: int = 4) -> DataFrame:
    """Per-pipeline run-duration SLA rollup: count, p50/p90/p99 and max
    duration seconds — the "is this pipeline getting slower" dashboard
    over the A1 run rollup (columns pipeline_key/start_ts/end_ts).

    ``percentile`` is Spark's exact linear-interpolation aggregate
    (same semantics as ANSI/DuckDB ``quantile_cont``), computed in ONE
    group pass; per-group state is the sorted duration buffer, bounded
    by runs-per-pipeline (thousands, not corpus-scale — safe). For
    billions of runs per key switch to ``percentile_approx``, which is
    mergeable constant-state; the exact form is the oracle-checkable
    default.
    """
    # epoch_seconds keeps microseconds (unix_timestamp would truncate
    # to whole seconds and disagree with the oracle's epoch())
    dur = epoch_seconds("end_ts") - epoch_seconds("start_ts")
    d = runs.select("pipeline_key", dur.alias("dur_s"))
    return (
        d.groupBy("pipeline_key")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.round(F.percentile("dur_s", 0.5), round_to).alias("p50_s"),
            F.round(F.percentile("dur_s", 0.9), round_to).alias("p90_s"),
            F.round(F.percentile("dur_s", 0.99), round_to).alias("p99_s"),
            F.round(F.max("dur_s"), round_to).alias("max_s"),
        )
    )


def run_duration_sla_sql(runs_sql: str, round_to: int = 4) -> str:
    return f"""
    WITH r AS MATERIALIZED ({runs_sql}),
    d AS (
      SELECT pipeline_key,
             CAST(epoch(end_ts) - epoch(start_ts) AS DOUBLE) AS dur_s
      FROM r)
    SELECT pipeline_key, count(*) AS n_runs,
           round(quantile_cont(dur_s, 0.5), {round_to}) AS p50_s,
           round(quantile_cont(dur_s, 0.9), {round_to}) AS p90_s,
           round(quantile_cont(dur_s, 0.99), {round_to}) AS p99_s,
           round(max(dur_s), {round_to}) AS max_s
    FROM d GROUP BY pipeline_key
    """


def run_concurrency(runs: DataFrame) -> DataFrame:
    """Peak concurrent runs per pipeline — the capacity/contention
    metric behind "why is my pipeline queueing".

    Interval-overlap counting without a theta join: each run emits a
    +1 at start and a −1 at end; a running sum over (ts, delta) order
    within the pipeline partition IS the concurrency curve, and its max
    is the peak. Ends sort before starts at the same instant (delta
    ascending), so back-to-back runs don't count as overlapping.
    One explode (2 rows per run) + one key-partitioned window — scales
    with runs per pipeline, never pairwise.
    """
    from pyspark.sql import Window

    deltas = runs.select(
        "pipeline_key",
        F.explode(
            F.array(
                F.struct(F.col("start_ts").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("end_ts").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select("pipeline_key", "e.ts", "e.delta")
    w = (
        Window.partitionBy("pipeline_key")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        deltas.withColumn("concurrent", F.sum("delta").over(w))
        .groupBy("pipeline_key")
        .agg(
            F.max("concurrent").cast("int").alias("peak_concurrent"),
            (F.count(F.lit(1)) / 2).cast("long").alias("n_runs"),
        )
    )


def run_concurrency_sql(runs_sql: str) -> str:
    return f"""
    WITH r AS MATERIALIZED ({runs_sql}),
    deltas AS (
      SELECT pipeline_key, start_ts AS ts, 1 AS delta FROM r
      UNION ALL
      SELECT pipeline_key, end_ts, -1 FROM r),
    curve AS (
      SELECT pipeline_key,
             sum(delta) OVER (PARTITION BY pipeline_key ORDER BY ts, delta
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS concurrent
      FROM deltas)
    SELECT pipeline_key, CAST(max(concurrent) AS INT) AS peak_concurrent,
           CAST(count(*) / 2 AS BIGINT) AS n_runs
    FROM curve GROUP BY pipeline_key
    """


def pipeline_health(runs: DataFrame, alerts: DataFrame, round_to: int = 4) -> DataFrame:
    """One-row-per-pipeline health scorecard — the composition query a
    status dashboard issues: success rate, p90 duration, alert volume,
    and a blended 0-100 health score.

    ``runs``: A1 rollup (pipeline_key/start_ts/end_ts/final_status).
    ``alerts``: (subject_key, ...) alert rows, counted per pipeline.

    health = 100·(0.5·success_rate
                  + 0.3·(1 − min(p90_s/86400, 1))
                  + 0.2·(1 / (1 + alerts_per_run)))

    Two key-partitioned aggregates + one broadcast-sized join (#pipelines
    rows each side) — composing rollups costs one tiny join, never a
    second corpus pass.
    """
    dur = epoch_seconds("end_ts") - epoch_seconds("start_ts")
    per_run = runs.select(
        "pipeline_key",
        dur.alias("dur_s"),
        (F.col("final_status") == "FAILED").cast("int").alias("failed"),
    )
    agg = per_run.groupBy("pipeline_key").agg(
        F.count(F.lit(1)).alias("n_runs"),
        F.sum("failed").alias("failed_runs"),
        F.round(1 - F.sum("failed") / F.count(F.lit(1)), round_to).alias("success_rate"),
        F.round(F.percentile("dur_s", 0.9), round_to).alias("p90_s"),
    )
    al = alerts.groupBy(F.col("subject_key").alias("pipeline_key")).agg(
        F.count(F.lit(1)).alias("alert_ct")
    )
    j = agg.join(al, "pipeline_key", "left").withColumn(
        "alert_ct", F.coalesce("alert_ct", F.lit(0))
    )
    health = 100 * (
        0.5 * F.col("success_rate")
        + 0.3 * (1 - F.least(F.col("p90_s") / 86400.0, F.lit(1.0)))
        + 0.2 * (1.0 / (1.0 + F.col("alert_ct") / F.col("n_runs")))
    )
    return j.select(
        "pipeline_key",
        "n_runs",
        "failed_runs",
        "success_rate",
        "p90_s",
        "alert_ct",
        F.round(health, 2).alias("health"),
    )


def pipeline_health_sql(runs_sql: str, alerts_sql: str, round_to: int = 4) -> str:
    return f"""
    WITH r AS MATERIALIZED ({runs_sql}),
    per_run AS (
      SELECT pipeline_key,
             CAST(epoch(end_ts) - epoch(start_ts) AS DOUBLE) AS dur_s,
             CASE WHEN final_status = 'FAILED' THEN 1 ELSE 0 END AS failed
      FROM r),
    agg AS (
      SELECT pipeline_key, count(*) AS n_runs,
             CAST(sum(failed) AS BIGINT) AS failed_runs,
             round(1 - sum(failed) * 1.0 / count(*), {round_to}) AS success_rate,
             round(quantile_cont(dur_s, 0.9), {round_to}) AS p90_s
      FROM per_run GROUP BY pipeline_key),
    al AS (
      SELECT subject_key AS pipeline_key, count(*) AS alert_ct
      FROM ({alerts_sql}) GROUP BY subject_key)
    SELECT agg.pipeline_key, agg.n_runs, agg.failed_runs, agg.success_rate,
           agg.p90_s, coalesce(al.alert_ct, 0) AS alert_ct,
           round(100 * (0.5 * agg.success_rate
                        + 0.3 * (1 - least(agg.p90_s / 86400.0, 1.0))
                        + 0.2 * (1.0 / (1.0 + coalesce(al.alert_ct, 0) * 1.0 / agg.n_runs))), 2)
             AS health
    FROM agg LEFT JOIN al USING (pipeline_key)
    """
