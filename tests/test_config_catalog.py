"""S2 JSON config scan + S3 entity-catalog sink/lookup."""

from __future__ import annotations

import json

from data_observability_installer_spark.sources.config import (
    FAMILY_SCHEMAS,
    load_config,
    lookup_entity,
    upsert_entities,
)


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_load_config_roundtrip(spark, tmp_path):
    _write_jsonl(tmp_path / "conditions.json", [
        {"journey_id": "j1", "action": "START", "batch_pipeline": "root"},
        {"journey_id": "j1", "action": "END", "batch_pipeline": "fin"},
    ])
    _write_jsonl(tmp_path / "schedules.json", [
        {"component_key": "root", "expectation": "BATCH_PIPELINE_START_TIME",
         "schedule": "0 23 * * *", "margin_s": 600},
    ])
    cfg = load_config(spark, str(tmp_path))
    assert set(cfg) == set(FAMILY_SCHEMAS)
    conds = cfg["conditions"].collect()
    assert {c.action for c in conds} == {"START", "END"}
    # absent families come back EMPTY but fully typed
    assert cfg["rules"].count() == 0
    assert [f.name for f in cfg["rules"].schema.fields] == [
        "rule_id", "journey_id", "action", "component", "conditions"]
    # the loaded conditions drive journey_instances directly
    from data_observability_installer_spark.operators.obs.journeys import journey_instances
    import datetime as dt
    rollup = spark.createDataFrame(
        [("root", "r1", dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 1)),
         ("fin", "f1", dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 3))],
        "pipeline_key string, run_key string, start_ts timestamp, end_ts timestamp",
    )
    inst = journey_instances(rollup, cfg["conditions"]).collect()
    assert len(inst) == 1 and inst[0].instance_end == dt.datetime(2024, 1, 1, 3)


def test_upsert_entities_get_else_post(spark):
    cat = spark.createDataFrame(
        [("a", "Pipeline A", "airflow"), ("b", "Pipeline B", "airflow")],
        "key string, name string, tool string",
    )
    incoming = spark.createDataFrame(
        [("b", "Pipeline B v2", "dbt"), ("c", "Pipeline C", "dbt")],
        "key string, name string, tool string",
    )
    merged = {r.key: r for r in upsert_entities(cat, incoming).collect()}
    assert set(merged) == {"a", "b", "c"}
    assert merged["b"].name == "Pipeline B"  # existing wins (GET-else-POST)
    assert merged["c"].tool == "dbt"

    patched = {r.key: r for r in upsert_entities(cat, incoming, prefer="incoming").collect()}
    assert patched["b"].name == "Pipeline B v2"  # PATCH-style sink
    assert patched["a"].name == "Pipeline A"


def test_lookup_entity_pushes_filter(spark):
    cat = spark.createDataFrame(
        [(f"k{i}", f"name-{i}") for i in range(100)], "key string, name string"
    )
    hit = lookup_entity(cat, "k42").collect()
    assert len(hit) == 1 and hit[0].name == "name-42"
