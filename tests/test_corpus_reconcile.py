"""Conformance against the reference test corpus (822 rows) and the
§2.5 reconciliation operators."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_observability_installer_spark.operators.dq.reconcile import (
    ReconcileCheck,
    reconcile,
)
from data_observability_installer_spark.sources.dq_corpus import (
    corpus_to_outcomes,
    read_test_corpus,
)

REFERENCE_CSV = "/root/reference/demo/input_data/data_tests.csv"

needs_corpus = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CSV), reason="reference corpus not present"
)


@needs_corpus
def test_corpus_ingest_shape(spark):
    corpus = read_test_corpus(spark, REFERENCE_CSV)
    # 823 records: 822 newline-terminated + a final unterminated line
    # (DuckDB's reader agrees)
    assert corpus.count() == 823
    types = {r.test_type for r in corpus.select("test_type").distinct().collect()}
    assert len(types) == 25
    from data_observability_installer_spark.operators.dq.testtypes import TEST_TYPES

    assert types <= set(TEST_TYPES), f"unknown types: {types - set(TEST_TYPES)}"
    tables = {r.table_name for r in corpus.select("table_name").distinct().collect()}
    assert tables == {"D_Customer", "D_Order", "D_Product", "F_PT_TRTMT_Summary"}


@needs_corpus
def test_corpus_param_parsing(spark):
    corpus = read_test_corpus(spark, REFERENCE_CSV)
    lov = corpus.filter(
        (F.col("column_name") == "ama_no_contact_ind") & (F.col("test_type") == "LOV_Match")
    ).collect()[0]
    assert lov.parameters["Baseline_Value"] == "('No','Yes')"
    assert lov.parameters["Threshold_Value"] == "0"
    rc = corpus.filter(F.col("test_type") == "Row_Ct").collect()[0]
    assert float(rc.parameters["Baseline_Ct"]) > 0


@needs_corpus
def test_corpus_chunked_outcome_events(spark):
    """G4: 100 outcomes per TestOutcomes event; G7 status mapping."""
    corpus = read_test_corpus(spark, REFERENCE_CSV)
    events = corpus_to_outcomes(corpus)
    rows = events.collect()
    per_table = corpus.groupBy("table_name").count().collect()
    want_events = sum(-(-r["count"] // 100) for r in per_table)  # ceil
    assert len(rows) == want_events
    assert all(r.outcome_ct <= 100 for r in rows)
    total_warn = sum(r.warning_ct for r in rows)
    corpus_warn = corpus.filter(F.col("result") == "Warning").count()
    assert total_warn == corpus_warn and corpus_warn > 0
    assert all(r.failed_ct == 0 for r in rows)  # Fail unobserved in corpus
    # integrations sub-schema present
    one = rows[0].test_outcomes[0]
    assert one.integrations.testgen.test_suite == "default-suite-1"


def test_reconcile_checks(spark):
    stage = spark.createDataFrame([(i, 10.0) for i in range(100)], "id bigint, amt double")
    dim = spark.createDataFrame([(i, 10.0) for i in range(98)], "id bigint, amt double")
    out = reconcile(
        stage,
        dim,
        [
            ReconcileCheck("row_count_equal", F.count(F.lit(1)), F.count(F.lit(1)), "=="),
            ReconcileCheck("sum_covered", F.sum("amt"), F.sum("amt"), ">="),
            ReconcileCheck("ids_match", F.countDistinct("id"), F.countDistinct("id"), "<=",
                           severity="WARNING"),
        ],
    )
    got = {r.check_name: r.status for r in out.collect()}
    assert got == {"row_count_equal": "FAILED", "sum_covered": "PASSED", "ids_match": "WARNING"}


def test_fk_integrity_orphans_and_null_exclusion(spark):
    from data_observability_installer_spark.operators.dq.reconcile import fk_integrity

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "row_id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
    got = {r.orphan_key: r.row_ct for r in
           fk_integrity(child, parent, "fk", "pk").collect()}
    # 99 is orphaned twice; NULL FKs reference nothing (excluded);
    # valid keys and childless parents (30) don't appear
    assert got == {99: 2}


def test_join_cardinality_audit_shape(spark):
    from data_observability_installer_spark.operators.dq.reconcile import (
        join_cardinality_audit,
    )

    parent = spark.createDataFrame([(1,), (2,), (3,), (4,)], "pk bigint")
    child = spark.createDataFrame(
        [(1,)] * 12 + [(2,)] * 2 + [(9,)] * 3 + [(None,)], "fk bigint"
    )
    row = join_cardinality_audit(parent, child, "pk", "fk", fanout_warn=10).collect()[0]
    assert row.key_ct == 5            # 4 parents + orphan key 9
    assert row.childless_parent_ct == 2   # 3 and 4
    assert row.orphan_child_key_ct == 1   # 9
    assert row.max_fanout == 12
    assert row.over_warn_ct == 1          # only key 1 exceeds 10
    assert row.avg_fanout == round((12 + 2 + 3) / 3, 4)  # nulls excluded
