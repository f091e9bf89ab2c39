"""Fixed schemas for the observability data model (SURVEY §1.1/§1.2).

One unioned event fact table carries the four event grammars the
reference demo posts through the Events API (RunStatus / MessageLog /
MetricLog / TestOutcomes — ``demo/demo/demo_helper.py:313-352,437-462``),
discriminated by ``event_type``, with per-type fields null when not
applicable (FIXTURES.md group B). ``event_timestamp`` is EVENT time —
the demo backdates up to 55 h (``demo/demo/observability_demo.py:24``),
so all analytics below sort/window by this column, never arrival time.

At scale the fact table is date-partitioned on ``event_timestamp`` and
the catalog tables are small broadcast dimensions.
"""

from __future__ import annotations

from pyspark.sql import types as T

TESTGEN_INTEGRATION = T.StructType(
    [
        T.StructField("table", T.StringType()),
        T.StructField("test_suite", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("columns", T.ArrayType(T.StringType())),
        T.StructField(
            "test_parameters",
            T.ArrayType(
                T.StructType(
                    [T.StructField("name", T.StringType()), T.StructField("value", T.StringType())]
                )
            ),
        ),
    ]
)

TEST_OUTCOME = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("status", T.StringType()),  # PASSED | WARNING | FAILED
        T.StructField("description", T.StringType()),
        T.StructField("result", T.StringType()),
        T.StructField("metric_value", T.StringType()),
        T.StructField("min_threshold", T.StringType()),
        T.StructField("max_threshold", T.StringType()),
        T.StructField(
            "integrations",
            T.StructType([T.StructField("testgen", TESTGEN_INTEGRATION)]),
        ),
    ]
)

OBS_EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),  # RUN_STATUS|MESSAGE_LOG|METRIC_LOG|TEST_OUTCOMES
        T.StructField("event_timestamp", T.TimestampType()),
        T.StructField("pipeline_key", T.StringType()),
        T.StructField("run_key", T.StringType()),  # "<name>:<backdate>:<length>"
        T.StructField("task_key", T.StringType()),  # null => run-level event
        T.StructField("task_name", T.StringType()),
        T.StructField("dataset_key", T.StringType()),
        T.StructField("server_key", T.StringType()),
        T.StructField("component_tool", T.StringType()),
        T.StructField("status", T.StringType()),  # RUNNING|COMPLETED|FAILED (RUN_STATUS)
        T.StructField("log_level", T.StringType()),  # INFO|WARNING|ERROR (MESSAGE_LOG)
        T.StructField("message", T.StringType()),
        T.StructField("metric_key", T.StringType()),
        T.StructField("metric_value", T.DoubleType()),
        T.StructField("external_url", T.StringType()),
        T.StructField("payload_keys", T.ArrayType(T.StringType())),
        T.StructField("test_outcomes", T.ArrayType(TEST_OUTCOME)),
    ]
)

COMPONENT = T.StructType(
    [
        T.StructField("component_id", T.StringType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("type", T.StringType()),  # BATCH_PIPELINE | DATASET | SERVER
        T.StructField("name", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("tool", T.StringType()),
    ]
)

JOURNEY = T.StructType(
    [
        T.StructField("journey_id", T.StringType()),
        T.StructField("project_id", T.StringType()),
        T.StructField("name", T.StringType()),
    ]
)

JOURNEY_DAG = T.StructType(
    [
        T.StructField("journey_id", T.StringType()),
        T.StructField("left_id", T.StringType()),  # either side nullable (isolated node)
        T.StructField("right_id", T.StringType()),
    ]
)

INSTANCE_CONDITION = T.StructType(
    [
        T.StructField("journey_id", T.StringType()),
        T.StructField("action", T.StringType()),  # START | END | END_PAYLOAD
        T.StructField("batch_pipeline", T.StringType()),
    ]
)

SCHEDULE = T.StructType(
    [
        T.StructField("component_id", T.StringType()),
        T.StructField("expectation", T.StringType()),  # BATCH_PIPELINE_START_TIME | ..._END_TIME
        T.StructField("schedule", T.StringType()),  # 5-field cron
        T.StructField("margin_s", T.IntegerType()),
        T.StructField("timezone", T.StringType()),
    ]
)

RULE = T.StructType(
    [
        T.StructField("rule_id", T.StringType()),
        T.StructField("journey_id", T.StringType()),
        T.StructField("action", T.StringType()),  # SEND_EMAIL | CALL_WEBHOOK
        T.StructField("component", T.StringType()),
        T.StructField("when", T.StringType()),  # all
        T.StructField("conditions", T.StringType()),  # JSON document
    ]
)

HEARTBEAT = T.StructType(
    [
        T.StructField("agent_key", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("latest_event_timestamp", T.TimestampType()),
    ]
)
