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


def test_round3_ops_on_empty_and_degenerate_input(spark):
    """Every round-3 operator must return an empty (or all-clean)
    result on empty input rather than raising — partition-empty
    robustness is table stakes at 100 TB."""
    from data_observability_installer_spark.operators.llm.curation import (
        filter_by_quantile,
        mixture_weights,
    )
    from data_observability_installer_spark.operators.llm.decontam import decontaminate
    from data_observability_installer_spark.operators.llm.dedup import dedup_incremental
    from data_observability_installer_spark.operators.llm.packing import pack_sequences
    from data_observability_installer_spark.operators.llm.search import bm25_topk
    from data_observability_installer_spark.operators.llm.lm import (
        unigram_logprob_screen,
        vocab_topk,
    )
    from data_observability_installer_spark.operators.llm.text import repetition_screen
    from data_observability_installer_spark.operators.obs.rollup import run_concurrency
    from data_observability_installer_spark.operators.obs.rules import suppress_flapping

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    one_doc = spark.createDataFrame([(1, "only doc here")], "doc_id long, text string")

    assert decontaminate(empty_docs, one_doc).count() == 0
    # empty BENCH side: every doc is clean, none dropped
    dec = decontaminate(one_doc, empty_docs).collect()
    assert len(dec) == 1 and not dec[0]["contaminated"]
    assert repetition_screen(empty_docs).count() == 0
    assert bm25_topk(empty_docs, ["term"]).count() == 0
    assert vocab_topk(empty_docs).count() == 0
    assert unigram_logprob_screen(empty_docs).count() == 0
    assert mixture_weights(
        spark.createDataFrame([], "doc_id long, text string, source string")
    ).count() == 0

    empty_chunks = spark.createDataFrame([], "doc_id long, chunk_idx int, chunk_tokens int")
    assert pack_sequences(empty_chunks).count() == 0

    empty_fp = spark.createDataFrame([], "fingerprint string")
    kept = dedup_incremental(one_doc, empty_fp).collect()
    assert len(kept) == 1  # nothing seen yet -> everything kept

    empty_scored = spark.createDataFrame([], "doc_id long, source string, score double")
    assert filter_by_quantile(empty_scored, "score", per="source").count() == 0

    empty_runs = spark.createDataFrame(
        [], "pipeline_key string, start_ts timestamp, end_ts timestamp"
    )
    assert run_concurrency(empty_runs).count() == 0
    empty_alerts = spark.createDataFrame(
        [], "subject_key string, alert_type string, event_ts timestamp"
    )
    assert suppress_flapping(empty_alerts).count() == 0
