"""Data-quality test-corpus ingestion + TestOutcomes event export.

Re-implements, Spark-first, the reference demo's corpus-to-events ETL
(SURVEY §2.2 G4-G8 over ``demo/input_data/data_tests.csv``):

- S1  quoted-CSV scan                 (demo_helper.py:949-954)
- G6  "k=v, k=v" parameter parsing    (demo_helper.py:845-851)
- G7  Pass→PASSED / Warning→WARNING / else FAILED (demo_helper.py:839-841)
- G8  Threshold_Value→max_threshold, Baseline_Value→metric_value
      promotion                       (demo_helper.py:878-886)
- G4  chunks of 100 outcomes per TestOutcomes event (demo_helper.py:803-816)
- G5  per-dataset routing             (demo_helper.py:833)

All steps are Column expressions / window + groupBy — the 822-row
corpus and a 822-million-row corpus compile to the same plan. The
parameter grammar is parsed with per-key regexes (a naive split on
", " breaks on quoted LOV tuples like ``('No','Yes')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PARAM_KEYS = [
    "Baseline_Ct",
    "Baseline_Unique_Ct",
    "Baseline_Value_Ct",
    "Baseline_Value",
    "Baseline_Avg",
    "Baseline_SD",
    "Baseline_Sum",
    "Threshold_Value",
]

CORPUS_COLUMNS = [
    "test_runner", "table_name", "column_name", "test_type",
    "description", "result", "message", "parameters",
]


def read_test_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Quoted-CSV test corpus -> typed DataFrame with a params map."""
    raw = spark.read.csv(path, quote='"', header=False)
    named = raw.toDF(*CORPUS_COLUMNS[:-1], "param_str")
    # value = quoted tuple or up-to-comma scalar; empty when key absent
    extracts = [
        F.regexp_extract(F.col("param_str"), rf"{k}=(\([^)]*\)|[^,]*)", 1).alias(k)
        for k in PARAM_KEYS
    ]
    with_params = named.select("*", *extracts)
    entries = [
        F.when(F.trim(F.col(k)) != "", F.struct(F.lit(k).alias("key"), F.trim(F.col(k)).alias("value")))
        for k in PARAM_KEYS
    ]
    return with_params.select(
        *CORPUS_COLUMNS[:-1],
        F.map_from_entries(F.filter(F.array(*entries), lambda e: e.isNotNull())).alias("parameters"),
    )


def corpus_to_outcomes(corpus: DataFrame, chunk_size: int = 100) -> DataFrame:
    """Corpus rows -> TestOutcomes *events*: one event per (table,
    chunk-of-100), each carrying an array of outcome structs with the
    ``integrations.testgen`` sub-schema (demo_helper.py:852-886).

    The window only orders within a table partition — at scale the
    partition key is (table, day) and the chunking stays balanced.
    """
    status = (
        F.when(F.col("result") == "Pass", "PASSED")
        .when(F.col("result") == "Warning", "WARNING")
        .otherwise("FAILED")
    )
    w = Window.partitionBy("table_name").orderBy("column_name", "test_type")
    chunked = corpus.withColumn("chunk", F.floor((F.row_number().over(w) - 1) / chunk_size))
    outcome = F.struct(
        F.concat_ws(":", F.col("table_name"), F.col("column_name"), F.col("test_type")).alias("name"),
        status.alias("status"),
        F.col("description").alias("description"),
        F.col("message").alias("result"),
        F.element_at(F.col("parameters"), "Baseline_Value").alias("metric_value"),
        F.lit(None).cast("string").alias("min_threshold"),
        F.element_at(F.col("parameters"), "Threshold_Value").alias("max_threshold"),
        F.struct(
            F.struct(
                F.col("table_name").alias("table"),
                F.lit("default-suite-1").alias("test_suite"),
                F.lit(1).alias("version"),
                F.array(F.col("column_name")).alias("columns"),
                F.transform(
                    F.map_entries(F.col("parameters")),
                    lambda e: F.struct(e.key.alias("name"), e.value.alias("value")),
                ).alias("test_parameters"),
            ).alias("testgen")
        ).alias("integrations"),
    )
    return (
        chunked.groupBy("table_name", "chunk")
        .agg(
            F.collect_list(outcome).alias("test_outcomes"),
            F.count(F.lit(1)).alias("outcome_ct"),
            F.sum((status == "PASSED").cast("int")).alias("passed_ct"),
            F.sum((status == "WARNING").cast("int")).alias("warning_ct"),
            F.sum((status == "FAILED").cast("int")).alias("failed_ct"),
        )
        .withColumn("event_type", F.lit("TEST_OUTCOMES"))
        .withColumn("dataset_key", F.col("table_name"))
    )


def export_outcomes_json(outcomes: DataFrame, path: str) -> None:
    """``export-observability`` analog: TestOutcomes events as JSONL."""
    outcomes.write.mode("overwrite").json(path)
