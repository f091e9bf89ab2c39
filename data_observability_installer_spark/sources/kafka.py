"""Kafka event source (the reference's ingest hop).

The reference's event path is Kafka-backed — the installer creates the
topics (reference ``dk-installer.py:1721-1736``) and the Events API
publishes the four event grammars onto them; SURVEY §3.1 maps that hop
to a Structured Streaming source. Every streaming operator in this
repo is source-agnostic (they take a streaming DataFrame), so this
module is deliberately thin: build the ``format("kafka")`` reader and
turn its fixed (key, value, topic, partition, offset, timestamp) frame
into OBS_EVENT rows.

The two halves are separated for testability in a broker-less
environment (this container has neither a broker nor the
spark-sql-kafka connector jar):

- :func:`parse_kafka_events` is pure DataFrame logic over the standard
  Kafka source schema — unit-tested against synthetic binary JSON
  batches, covering the part that can actually be wrong (JSON parsing,
  corrupt-payload quarantine, event-time extraction);
- :func:`kafka_events_stream` only assembles reader options and is
  exercised end-to-end by an env-gated contract test
  (``SPARK_GRAFT_KAFKA_BOOTSTRAP``) that skips cleanly when no broker
  is configured.

At scale: one Kafka partition maps to one Spark input partition;
``maxOffsetsPerTrigger`` bounds micro-batch size (backpressure), and
the watermark downstream operators already apply bounds state. Corrupt
payloads land in a ``_corrupt`` column instead of killing the stream —
dead-letter them with ``.filter("_corrupt IS NOT NULL")`` to a sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import OBS_EVENT


def parse_kafka_events(raw: DataFrame, schema=OBS_EVENT) -> DataFrame:
    """Kafka source frame (key/value binary, timestamp, topic,
    partition, offset) -> OBS_EVENT columns + lineage columns.

    ``from_json`` yields NULL on malformed payloads; such rows keep
    their raw value in ``_corrupt`` (and NULL event columns) so the
    stream survives poison messages and a dead-letter sink can claim
    them. ``event_timestamp`` comes from the PAYLOAD (event time — the
    reference backdates events), with the broker timestamp as
    ``_ingest_ts`` for lateness telemetry."""
    parsed = raw.select(
        F.col("value").cast("string").alias("_raw"),
        F.col("timestamp").alias("_ingest_ts"),
        F.col("topic").alias("_topic"),
        F.col("partition").alias("_partition"),
        F.col("offset").alias("_offset"),
    ).withColumn("_parsed", F.from_json(F.col("_raw"), schema))
    ok = F.col("_parsed").isNotNull() & F.col("_parsed.event_id").isNotNull()
    return parsed.select(
        *[F.col(f"_parsed.{f.name}").alias(f.name) for f in schema.fields],
        F.when(~ok, F.col("_raw")).alias("_corrupt"),
        "_ingest_ts",
        "_topic",
        "_partition",
        "_offset",
    )


def kafka_events_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 1_000_000,
    schema=OBS_EVENT,
) -> DataFrame:
    """``readStream.format("kafka")`` -> parsed OBS_EVENT stream.

    Requires the spark-sql-kafka connector on the classpath and a
    reachable broker — neither exists in this container, so the
    end-to-end path is covered by the env-gated contract test and the
    parse stage by broker-less unit tests."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return parse_kafka_events(reader.load(), schema=schema)
