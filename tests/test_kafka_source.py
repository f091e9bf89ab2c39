"""Kafka ingest seam: the parse stage is unit-tested broker-less (it
is the only part with logic); the end-to-end reader runs only under an
env-gated contract test when a broker is configured."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

from data_observability_installer_spark.sources.kafka import (
    kafka_events_stream,
    parse_kafka_events,
)


def _kafka_frame(spark, values: list[bytes]):
    """Synthetic frame with the exact schema the Kafka source emits."""
    rows = [
        (b"k", v, "events", 0, i, dt.datetime(2025, 1, 1, 0, 0, i))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )


def test_parse_good_corrupt_and_lineage(spark):
    good = {
        "event_id": 7,
        "event_type": "RUN_STATUS",
        "event_timestamp": "2024-12-31T22:00:00",  # backdated event time
        "pipeline_key": "pipe_a",
        "run_key": "pipe_a:1",
        "status": "COMPLETED",
    }
    raw = _kafka_frame(
        spark,
        [json.dumps(good).encode(), b"{not json", b'{"no_event_id": true}'],
    )
    out = parse_kafka_events(raw).collect()
    by_off = {r._offset: r for r in out}
    ok = by_off[0]
    assert (ok.event_id, ok.pipeline_key, ok.status) == (7, "pipe_a", "COMPLETED")
    assert ok.event_timestamp == dt.datetime(2024, 12, 31, 22, 0)  # payload time
    assert ok._ingest_ts == dt.datetime(2025, 1, 1, 0, 0, 0)  # broker time
    assert ok._corrupt is None and ok._topic == "events"
    # poison messages survive with their raw payload quarantined
    assert by_off[1]._corrupt == "{not json" and by_off[1].event_id is None
    assert by_off[2]._corrupt == '{"no_event_id": true}'
    assert len(out) == 3  # nothing dropped


def test_parsed_stream_feeds_existing_operators(spark):
    """The parsed frame is OBS_EVENT-shaped: the batch rollup (and so
    every streaming operator, which shares its input contract) accepts
    it directly."""
    from data_observability_installer_spark.operators.obs import run_state_rollup

    ev = {
        "event_id": 1,
        "event_type": "RUN_STATUS",
        "event_timestamp": "2025-01-01T10:00:00",
        "pipeline_key": "p",
        "run_key": "p:1",
        "status": "RUNNING",
    }
    done = {**ev, "event_id": 2, "event_timestamp": "2025-01-01T10:05:00",
            "status": "COMPLETED"}
    raw = _kafka_frame(spark, [json.dumps(ev).encode(), json.dumps(done).encode()])
    parsed = parse_kafka_events(raw).filter("_corrupt IS NULL").drop(
        "_corrupt", "_ingest_ts", "_topic", "_partition", "_offset"
    )
    r = run_state_rollup(parsed).collect()
    assert len(r) == 1 and r[0].final_status == "COMPLETED"


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="no Kafka broker configured (set SPARK_GRAFT_KAFKA_BOOTSTRAP "
    "host:port and provide the spark-sql-kafka connector jar)",
)
def test_kafka_contract_end_to_end(spark, tmp_path):
    """Env-gated: with a real broker + connector jar, the reader must
    deliver parsed OBS_EVENT rows from the configured topic."""
    stream = kafka_events_stream(
        spark,
        os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"],
        os.environ.get("SPARK_GRAFT_KAFKA_TOPIC", "events"),
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("kafka_contract")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.table("kafka_contract").columns[0] == "event_id"
