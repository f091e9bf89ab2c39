"""Degenerate-input behavior: empty tables, NULL text, single rows.
At 100 TB empty partitions and null-heavy columns are routine, not
exceptional — every operator must produce well-defined output."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.dq.compiler import compile_suite
from data_observability_installer_spark.operators.llm.curation import (
    curation_filter,
    deterministic_split,
    pii_screen,
)
from data_observability_installer_spark.operators.llm.dedup import (
    dedup_groups,
    ngram_jaccard_pairs,
)
from data_observability_installer_spark.operators.obs.lineage import transitive_closure
from data_observability_installer_spark.operators.profile import profile
from data_observability_installer_spark.plans.suites import AS_OF, DEMO_SUITES

LINEITEM_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_profile_empty_table_yields_full_metric_grid(spark):
    empty = spark.createDataFrame([], LINEITEM_DDL)
    rows = profile(empty, "lineitem", AS_OF).collect()
    by = {(r.column_name, r.metric): r for r in rows}
    assert len(rows) == 270  # every (column, metric) still present
    assert by[("l_quantity", "record_ct")].value == 0.0
    assert by[("l_quantity", "avg_val")].value is None  # no rows -> NULL, not crash
    assert by[("l_returnflag", "null_pct")].value is None  # 0/0 guarded


def test_dq_suite_empty_table_reports_every_test(spark):
    empty = spark.createDataFrame([], LINEITEM_DDL)
    table, specs, view, _ = DEMO_SUITES["dq_suite_lineitem"]
    out = compile_suite(empty if view is None else view(empty), specs, AS_OF).collect()
    assert len(out) == len(specs)  # one outcome per test, none dropped
    assert all(r.result in ("PASSED", "WARNING", "FAILED") for r in out)


def test_curation_null_text_drops_as_too_short(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   ")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r for r in curation_filter(docs).collect()}
    assert got[1].reason == "too_short" and not got[1].keep
    assert got[2].reason == "too_short"
    assert got[3].reason == "too_short"


def test_pii_screen_null_text_not_flagged(spark):
    docs = spark.createDataFrame([(1, None)], "doc_id bigint, text string")
    row = pii_screen(docs).collect()[0]
    assert not row.has_pii


def test_empty_frames_produce_empty_results(spark):
    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    assert curation_filter(empty_docs).count() == 0
    assert deterministic_split(empty_docs).count() == 0
    assert ngram_jaccard_pairs(empty_docs).count() == 0
    empty_edges = spark.createDataFrame([], "src string, dst string")
    assert transitive_closure(empty_edges).count() == 0
    empty_pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint, jaccard double")
    assert dedup_groups(empty_pairs).count() == 0


def test_single_doc_corpus(spark):
    one = spark.createDataFrame([(7, "just one single document here")], "doc_id bigint, text string")
    assert ngram_jaccard_pairs(one).count() == 0  # no self-pairs
    split = deterministic_split(one).collect()[0]
    assert split.split in ("train", "val", "test")
