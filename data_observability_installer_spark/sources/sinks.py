"""Warehouse sinks — the write half of the 100 TB story.

The reference persists to Postgres/MySQL through an API; the engine
analog is columnar warehouse tables laid out so the NEXT query is
cheap:

- ``write_partitioned``: date/key-partitioned parquet — partition
  pruning turns time-scoped scans (the dominant observability access
  pattern) into touching only matching directories.
- ``write_bucketed``: ``bucketBy(key)`` saved tables — two tables
  bucketed on the same key hash-join WITHOUT a shuffle (the co-located
  join for orders⨝lineitem-shaped facts; at 100 TB the exchange this
  removes is the single largest cost in the join).
- ``write_jsonl``: event-stream export (TestOutcomes / alert feeds),
  the S4 transport format the reference's export verbs emit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed managed table. Joins/aggregations keyed on
    ``bucket_col`` between tables sharing (col, num_buckets) skip the
    exchange entirely."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def idempotent_batch_sink(stream, out_dir: str, query_name: str = "idempotent_sink"):
    """Exactly-once-style delivery for ``foreachBatch``: each
    micro-batch writes to ``out_dir/batch_id=<id>`` with mode
    ``overwrite``, so a replayed batch (restart after a sink failure,
    before the checkpoint commit) OVERWRITES its own previous partial
    output instead of appending duplicates — Structured Streaming's
    at-least-once batch redelivery plus a (batch_id-keyed, overwrite)
    sink is the standard exactly-once recipe for file targets. Readers
    see one directory per batch; the batch_id column is the replay
    audit trail."""
    from pyspark.sql import functions as F

    def _write(batch_df, batch_id: int) -> None:
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(_write)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
