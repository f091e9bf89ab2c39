"""A4/A5 alert-rule evaluation.

Rules are condition → action documents attached to journeys
(demo_helper.py:240-248). Observed condition grammars:

- run-state match: ``{when: all, conditions: [{run_state:
  {matches: FAILED}}]}`` → SEND_EMAIL / CALL_WEBHOOK
  (demo_helper.py:1876-1915)
- metric threshold: ``{metric_log: {key: "Cluster Capacity
  Percentage", operator: gt, static_value: 80}}`` scoped to one
  component (demo_helper.py:1917-1937)
- instance alert: ``{instance_alert: {type_matches:
  [OUT_OF_SEQUENCE, LATE_START, ...]}}`` (demo_helper.py:1939-1956)

Each rule lowers to a Column predicate over the matching source
(run rollup / metric events / instance alerts); the union of fired
rows is the action feed, which a sink (``foreachBatch`` in streaming)
delivers. Rules are metadata — evaluation is a filter per rule over an
already-computed DataFrame, no extra scans of the raw events.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ...functions.time import epoch_seconds

_METRIC_OPS = {
    "gt": lambda c, v: c > v,
    "gte": lambda c, v: c >= v,
    "lt": lambda c, v: c < v,
    "lte": lambda c, v: c <= v,
    "eq": lambda c, v: c == v,
    "ne": lambda c, v: c != v,
}

ALERT_COLUMNS = ["rule_id", "action", "subject_key", "detail_key", "alert_type", "event_ts"]


def _parse_conditions(raw) -> list[dict]:
    doc = json.loads(raw) if isinstance(raw, str) else raw
    if isinstance(doc, dict):
        return doc.get("conditions", [doc])
    return list(doc)


def evaluate_rules(
    rules: list[dict],
    run_rollup: DataFrame,
    metric_events: DataFrame | None = None,
    instance_alerts: DataFrame | None = None,
) -> DataFrame:
    """Rules (dicts: rule_id, action, component, conditions) -> fired
    alert rows, unioned across rules."""
    outs: list[DataFrame] = []
    for rule in rules:
        rid, action = rule["rule_id"], rule.get("action", "SEND_EMAIL")
        component = rule.get("component")
        for cond in _parse_conditions(rule.get("conditions", [])):
            if "run_state" in cond:
                want = cond["run_state"].get("matches", "FAILED")
                src = run_rollup
                pred: Column = F.col("final_status") == want
                if want in ("LATE_START", "LATE_END") and instance_alerts is not None:
                    src, pred = instance_alerts, F.col("alert_type") == want
                    ts_col, subj, det = "tick_ts", "component_key", "component_key"
                else:
                    ts_col, subj, det = "end_ts", "pipeline_key", "run_key"
                if component:
                    pred = pred & (F.col(subj) == component)
                outs.append(
                    src.filter(pred).select(
                        F.lit(rid).alias("rule_id"),
                        F.lit(action).alias("action"),
                        F.col(subj).alias("subject_key"),
                        F.col(det).alias("detail_key"),
                        F.lit(want).alias("alert_type"),
                        F.col(ts_col).alias("event_ts"),
                    )
                )
            elif "metric_log" in cond and metric_events is not None:
                spec = cond["metric_log"]
                op = _METRIC_OPS[spec.get("operator", "gt")]
                pred = (F.col("event_type") == "METRIC_LOG") & (
                    F.col("metric_key") == spec["key"]
                ) & op(F.col("metric_value"), float(spec["static_value"]))
                subj = F.coalesce(F.col("pipeline_key"), F.col("dataset_key"), F.col("server_key"))
                if component:
                    pred = pred & (subj == component)
                outs.append(
                    metric_events.filter(pred).select(
                        F.lit(rid).alias("rule_id"),
                        F.lit(action).alias("action"),
                        subj.alias("subject_key"),
                        F.col("metric_key").alias("detail_key"),
                        F.lit("METRIC_THRESHOLD").alias("alert_type"),
                        F.col("event_timestamp").alias("event_ts"),
                    )
                )
            elif "instance_alert" in cond and instance_alerts is not None:
                wants = cond["instance_alert"].get("type_matches", [])
                outs.append(
                    instance_alerts.filter(F.col("alert_type").isin(wants)).select(
                        F.lit(rid).alias("rule_id"),
                        F.lit(action).alias("action"),
                        F.col(instance_alerts.columns[0]).alias("subject_key"),
                        F.col("alert_type").alias("detail_key"),
                        F.col("alert_type").alias("alert_type"),
                        F.current_timestamp().alias("event_ts"),
                    )
                )
    if not outs:
        raise ValueError("no evaluable rules")
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def suppress_flapping(
    alerts: DataFrame,
    key_cols: tuple[str, ...] = ("subject_key", "alert_type"),
    ts_col: str = "event_ts",
    cooldown_s: int = 3600,
) -> DataFrame:
    """Notification debouncing: collapse bursts of identical alerts
    into one notification per burst (flap suppression).

    Semantics: alerts for the same key chain into a burst while each
    is within ``cooldown_s`` of the PREVIOUS alert; the first alert of
    each burst is emitted with the burst's size. This is gap
    sessionization (same construction as journey instance windowing):
    a lag-gap flag, a running sum for the burst id, then first/count
    per burst — two key-partitioned windows, one tiny agg; no state
    beyond the window sort.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    w = Window.partitionBy(*keys).orderBy(ts_col)
    gap = epoch_seconds(ts_col) - F.lag(epoch_seconds(ts_col)).over(w)
    new_burst = F.when(gap.isNull() | (gap > cooldown_s), 1).otherwise(0)
    wb = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(Window.unboundedPreceding, 0)
    with_burst = alerts.withColumn("burst_id", F.sum(new_burst).over(wb))
    return (
        with_burst.groupBy(*key_cols, "burst_id")
        .agg(
            F.min(ts_col).alias("first_ts"),
            F.count(F.lit(1)).alias("burst_size"),
        )
        .select(*key_cols, "first_ts", (F.col("burst_size") - 1).alias("suppressed_ct"))
    )


def suppress_flapping_sql(
    alerts_sql: str,
    key_cols: tuple[str, ...] = ("subject_key", "alert_type"),
    ts_col: str = "event_ts",
    cooldown_s: int = 3600,
) -> str:
    keys = ", ".join(key_cols)
    return f"""
    WITH a AS MATERIALIZED ({alerts_sql}),
    flagged AS (
      SELECT a.*,
             CASE WHEN epoch({ts_col}) - epoch(lag({ts_col}) OVER
                    (PARTITION BY {keys} ORDER BY {ts_col})) > {cooldown_s}
                  OR lag({ts_col}) OVER (PARTITION BY {keys} ORDER BY {ts_col}) IS NULL
                  THEN 1 ELSE 0 END AS new_burst
      FROM a),
    bursts AS (
      SELECT *, sum(new_burst) OVER (PARTITION BY {keys} ORDER BY {ts_col}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_id
      FROM flagged)
    SELECT {keys}, min({ts_col}) AS first_ts,
           count(*) - 1 AS suppressed_ct
    FROM bursts GROUP BY {keys}, burst_id
    """
