"""Ordered-funnel conversion and retention-cohort analytics.

The reference's journey instances group events into windows
(demo/demo/demo_helper.py:662-677); a funnel asks the ORDERED version
of that question — how many entities progressed stage1 → stage2 → …
with each stage strictly after the previous — and retention asks the
longitudinal one: of the entities first seen in week W, how many came
back k weeks later. Both are staples of any event-analytics engine.

Scale shape:
- funnel: one pre-aggregate per stage keyed on the entity (map-side
  combined min), chained with entity-keyed joins — the chain moves
  #entities rows per stage, never raw events; a first-touch filter
  per stage keeps the join inputs aggregate-sized.
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
    reached = (
        events.filter(F.col(type_col) == stages[0])
        .groupBy(entity_col)
        .agg(F.min(ts_col).alias("reach_ts"))
    )
    counts = [reached]
    for stage in stages[1:]:
        nxt = (
            events.filter(F.col(type_col) == stage)
            .select(entity_col, F.col(ts_col).alias("ev_ts"))
            .join(reached, entity_col)
            .filter(F.col("ev_ts") > F.col("reach_ts"))
            .groupBy(entity_col)
            .agg(F.min("ev_ts").alias("reach_ts"))
        )
        counts.append(nxt)
        reached = nxt
    rows = None
    for i, (stage, df) in enumerate(zip(stages, counts)):
        row = df.agg(
            F.lit(i + 1).alias("stage_idx"),
            F.lit(stage).alias("stage"),
            F.count(F.lit(1)).alias("entity_ct"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


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
    return f"""
    WITH first_touch AS (
      SELECT {entity_col}, date_trunc('week', min({ts_col})) AS cohort_week
      FROM {table} GROUP BY {entity_col}),
    active AS (
      SELECT DISTINCT {entity_col}, date_trunc('week', {ts_col}) AS active_week
      FROM {table})
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort_week, active_week) / 7 AS INT) AS week_offset,
           count(*) AS active_entities
    FROM active JOIN first_touch USING ({entity_col})
    WHERE date_diff('day', cohort_week, active_week) / 7 <= {max_weeks}
    GROUP BY 1, 2
    """
