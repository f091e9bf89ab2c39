"""Ordered-funnel conversion and retention-cohort analytics.

The reference's journey instances group events into windows
(demo/demo/demo_helper.py:662-677); a funnel asks the ORDERED version
of that question — how many entities progressed stage1 → stage2 → …
with each stage strictly after the previous — and retention asks the
longitudinal one: of the entities first seen in week W, how many came
back k weeks later. Both are staples of any event-analytics engine.

Scale shape:
- funnel: ONE scan (filtered to the stage types, pushed to the
  source) and ONE shuffle — events group to (entity, per-stage
  timestamp array) with map-side partial collect, reach times fold
  over the arrays as native array expressions (array_min/filter),
  and the final count is a single global aggregate unpivoted with
  stack(). No per-stage rescans, no chained joins. Caveat: a
  pathologically hot entity materializes its stage events as one
  array — the same rows the join formulation would shuffle for that
  key anyway; AQE skew handling does not split a single group, so
  cap per-entity event counts upstream if that matters.
- retention: two entity-keyed aggregates (first-touch, distinct
  active weeks) and one join on the entity; output is
  O(#cohorts × horizon) — dashboard-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    stages: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: an entity reaches stage i when its
    earliest qualifying stage-i event is AFTER its stage-(i-1) reach
    time. Returns (stage_idx, stage, entity_ct) — entity_ct
    monotonically non-increasing down the funnel.
    """
    if not stages:
        raise ValueError("empty funnel")
    # One scan: filter to the stage vocabulary (pushed to the source),
    # then one shuffle to (entity, ts-array per stage). collect_list
    # partial-aggregates map-side, so the shuffle carries exactly the
    # qualifying (entity, ts) pairs — the same volume a single chained
    # join stage would move, but only once for all S stages.
    per_entity = (
        events.filter(F.col(type_col).isin(stages))
        .groupBy(entity_col)
        .agg(
            *[
                F.collect_list(
                    F.when(F.col(type_col) == stage, F.col(ts_col))
                ).alias(f"ts_{i}")
                for i, stage in enumerate(stages)
            ]
        )
    )
    # Fold reach times left-to-right as array expressions: reach_0 is
    # the stage-0 min; reach_i is the min stage-i timestamp strictly
    # after reach_{i-1}. A null prior reach null-propagates through the
    # lambda comparison, so filter() drops everything and array_min
    # yields null — no explicit when() ladder needed.
    def _after(prev):
        return lambda t: t > prev

    reach = per_entity.withColumn("reach_0", F.array_min("ts_0"))
    for i in range(1, len(stages)):
        reach = reach.withColumn(
            f"reach_{i}",
            F.array_min(
                F.filter(F.col(f"ts_{i}"), _after(F.col(f"reach_{i - 1}")))
            ),
        )
    counted = reach.agg(
        *[
            F.coalesce(
                F.sum(F.col(f"reach_{i}").isNotNull().cast("long")), F.lit(0)
            ).alias(f"ct_{i}")
            for i in range(len(stages))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{stage}', ct_{i}" for i, stage in enumerate(stages)
    )
    return counted.selectExpr(
        f"stack({len(stages)}, {stack_args}) AS (stage_idx, stage, entity_ct)"
    )


def funnel_stages_sql(
    table: str,
    stages: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    ctes, prev = [], None
    for i, stage in enumerate(stages):
        name = f"s{i}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT {entity_col}, min({ts_col}) AS reach_ts "
                f"FROM {table} WHERE {type_col} = '{stage}' GROUP BY {entity_col})"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.{entity_col}, min(e.{ts_col}) AS reach_ts "
                f"FROM {table} e JOIN {prev} p USING ({entity_col}) "
                f"WHERE e.{type_col} = '{stage}' AND e.{ts_col} > p.reach_ts "
                f"GROUP BY e.{entity_col})"
            )
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage_idx, '{stage}' AS stage, count(*) AS entity_ct FROM s{i}"
        for i, stage in enumerate(stages)
    )
    return "WITH " + ", ".join(ctes) + " " + selects


def retention_cohorts(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    max_weeks: int = 12,
) -> DataFrame:
    """Weekly retention matrix: cohort = ISO week of the entity's first
    event; one row per (cohort_week, week_offset) with the count of
    entities active that week. Offset 0 equals cohort size.
    """
    first = events.groupBy(entity_col).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    active = events.select(
        entity_col, F.date_trunc("week", F.col(ts_col)).alias("active_week")
    ).distinct()
    return (
        active.join(first, entity_col)
        .withColumn(
            "week_offset",
            (F.datediff("active_week", "cohort_week") / 7).cast("int"),
        )
        .filter(F.col("week_offset") <= max_weeks)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_entities"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_entities",
        )
    )


def retention_cohorts_sql(
    table: str, entity_col: str = "user_id", ts_col: str = "ts", max_weeks: int = 12
) -> str:
    # week_offset uses DuckDB integer division (`//`, truncating for the
    # non-negative offsets here) to match Spark's `.cast("int")` truncation;
    # `CAST(x / 7 AS INT)` would ROUND (12.57 -> 13) and `x / 7 <= N` is
    # float division, excluding day offsets 85-90 that Spark includes.
    return f"""
    WITH first_touch AS (
      SELECT {entity_col}, date_trunc('week', min({ts_col})) AS cohort_week
      FROM {table} GROUP BY {entity_col}),
    active AS (
      SELECT DISTINCT {entity_col}, date_trunc('week', {ts_col}) AS active_week
      FROM {table}),
    offsets AS (
      SELECT cohort_week,
             date_diff('day', cohort_week, active_week) // 7 AS week_offset
      FROM active JOIN first_touch USING ({entity_col}))
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS INT) AS week_offset,
           count(*) AS active_entities
    FROM offsets
    WHERE week_offset <= {max_weeks}
    GROUP BY 1, 2
    """
