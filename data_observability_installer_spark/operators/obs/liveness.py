"""A8 agent liveness.

Agents heartbeat every 25 s (``demo/demo/heartbeat_demo.py:27-29``,
payload ``{key, tool, version, latest_event_timestamp}``,
``demo_helper.py:290-310``); liveness is heartbeat recency. Batch
shape: max timestamp per agent vs an as-of instant; an agent is live
while its newest heartbeat is younger than ``timeout_s`` (3 missed
beats by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ...functions.time import epoch_seconds


def agent_liveness(heartbeats: DataFrame, as_of_ts: str, timeout_s: int = 75) -> DataFrame:
    return (
        heartbeats.groupBy("agent_key")
        .agg(
            F.max("latest_event_timestamp").alias("last_heartbeat"),
            F.count(F.lit(1)).alias("heartbeat_ct"),
        )
        .withColumn(
            "age_s",
            (F.unix_timestamp(F.lit(as_of_ts).cast("timestamp")) - F.unix_timestamp("last_heartbeat")).cast("double"),
        )
        .withColumn("live", F.col("age_s") <= timeout_s)
    )


def event_gaps(
    events: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    min_gap_s: int = 3600,
) -> DataFrame:
    """Downtime windows per stream: maximal periods longer than
    ``min_gap_s`` with no event for a key (the gaps half of
    gaps-and-islands) — heartbeat/feed silence detection over history,
    complementing the point-in-time ``agent_liveness`` check.

    One window, PARTITIONED by the key and sorted by time — the
    per-key time ordering is inherent to the semantics, and keys
    spread the sort across the cluster; no global ordering anywhere.
    A key whose whole history fits one executor is the operating
    assumption (per-feed event counts, not corpus rows); for a
    pathological mega-key, pre-bucket by day and stitch day-boundary
    gaps in a second tiny pass.
    """
    from pyspark.sql import Window

    return (
        events.select(F.col(key_col).alias("stream_key"), F.col(ts_col).alias("ts"))
        .withColumn("prev_ts", F.lag("ts").over(Window.partitionBy("stream_key").orderBy("ts")))
        .withColumn(
            # epoch_seconds keeps microseconds (unix_timestamp
            # truncates and would mis-classify boundary gaps)
            "gap_s",
            epoch_seconds("ts") - epoch_seconds("prev_ts"),
        )
        .filter(F.col("gap_s") > min_gap_s)
        .select(
            "stream_key",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            F.round("gap_s", 3).alias("gap_s"),
        )
    )


def event_gaps_sql(
    table: str, key_col: str, ts_col: str = "ts", min_gap_s: int = 3600
) -> str:
    return f"""
    WITH g AS (
      SELECT {key_col} AS stream_key, {ts_col} AS ts,
             lag({ts_col}) OVER (PARTITION BY {key_col} ORDER BY {ts_col}) AS prev_ts
      FROM {table})
    SELECT stream_key, prev_ts AS gap_start, ts AS gap_end,
           round(epoch(ts) - epoch(prev_ts), 3) AS gap_s
    FROM g WHERE epoch(ts) - epoch(prev_ts) > {min_gap_s}
    """
