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


def burstiness(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Inter-arrival burstiness per stream: coefficient of variation
    and the Goh-Barabasi burstiness index B = (sigma - mu)/(sigma + mu)
    of the gaps between consecutive events — the 'is this pipeline
    steady (B ~ -1 .. 0) or bursty (B -> 1)' fingerprint that decides
    whether a freshness SLO should be a fixed timeout or a quantile
    (event_gaps finds WHERE the holes are; this says what the stream's
    normal rhythm IS).

    Exactness: gaps are integer epoch MICROseconds (unix_micros /
    epoch_us — never float epoch sums, which are order-dependent);
    n*sum(g^2) and sum(g)^2 fold in DECIMAL(38,0)/HUGEINT, and the
    final sigma/mu ratios are floor-quantized doubles of those exact
    integers (sqrt is IEEE correctly-rounded on identical inputs).
    Ties order by the event id so the lag is deterministic.

    One key-partitioned window + one rollup; shuffle = the key."""
    w = f"(PARTITION BY k ORDER BY us, eid)"
    gaps = events.select(
        F.col(key_col).alias("k"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(id_col).alias("eid"),
    ).selectExpr(
        "k",
        f"us - lag(us) OVER {w} AS g",
    ).filter("g IS NOT NULL")
    return (
        gaps.groupBy(F.col("k").alias(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("g").cast("decimal(38,0)").alias("sg"),
            F.sum(F.expr("CAST(g AS DECIMAL(38,0)) * g")).alias("sg2"),
            F.max("g").cast("long").alias("max_gap_us"),
        )
        .selectExpr(
            key_col,
            "n_gaps",
            "CAST(sg DIV n_gaps DIV 1000000 AS BIGINT) AS mean_gap_s",
            "max_gap_us DIV 1000000 AS max_gap_s",
            # sigma^2 = (n*sg2 - sg^2) / n^2 ; cov = sigma/mu = n*sigma/sg
            """CASE WHEN n_gaps > 1 AND sg > 0 THEN CAST(floor(
                 sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE)
                 * 10000) AS BIGINT) END AS cov_bp""",
            """CASE WHEN n_gaps > 1 AND sg > 0 THEN CAST(floor(
                 (sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))
                 / (sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))
                 * 10000) AS BIGINT) END AS burstiness_bp""",
        )
        .orderBy(key_col)
    )


def burstiness_sql(
    events_sql: str, key_col: str, ts_col: str, id_col: str
) -> str:
    """DuckDB twin of :func:`burstiness` (epoch_us + HUGEINT folds)."""
    return f"""
    WITH gaps AS (
      SELECT k, us - lag(us) OVER (PARTITION BY k ORDER BY us, eid) AS g
      FROM (SELECT {key_col} AS k, epoch_us({ts_col}) AS us, {id_col} AS eid
            FROM ({events_sql}))),
    agg AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_gaps,
             CAST(sum(g) AS HUGEINT) AS sg,
             CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS sg2,
             CAST(max(g) AS BIGINT) AS max_gap_us
      FROM gaps WHERE g IS NOT NULL GROUP BY k)
    SELECT k AS {key_col}, n_gaps,
           CAST(sg // n_gaps // 1000000 AS BIGINT) AS mean_gap_s,
           max_gap_us // 1000000 AS max_gap_s,
           CASE WHEN n_gaps > 1 AND sg > 0 THEN CAST(floor(
             sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) / CAST(sg AS DOUBLE)
             * 10000) AS BIGINT) END AS cov_bp,
           CASE WHEN n_gaps > 1 AND sg > 0 THEN CAST(floor(
             (sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) - CAST(sg AS DOUBLE))
             / (sqrt(CAST(n_gaps * sg2 - sg * sg AS DOUBLE)) + CAST(sg AS DOUBLE))
             * 10000) AS BIGINT) END AS burstiness_bp
    FROM agg ORDER BY {key_col}
    """
