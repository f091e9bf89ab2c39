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
