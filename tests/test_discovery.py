"""FD / inclusion-dependency discovery: micro-DataFrame semantics
(nulls, violations, partial containment) and the single-scan plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.dq.discovery import (
    fd_check,
    ind_check,
)


def _fd_fixture(spark):
    # a -> b holds; a -> c violated by key 2; nulls ignored both sides
    rows = [
        (1, "x", "p"),
        (1, "x", "p"),
        (2, "y", "q"),
        (2, "y", "r"),
        (None, "z", "s"),  # null determinant: ignored
        (3, None, None),  # null dependent: key exists, 0 assignments
    ]
    return spark.createDataFrame(rows, "a int, b string, c string")


def test_fd_check_semantics(spark):
    out = fd_check(_fd_fixture(spark), [("a", "b"), ("a", "c")]).collect()
    by = {(r["determinant"], r["dependent"]): r for r in out}
    ab = by[("a", "b")]
    assert (ab["n_keys"], ab["n_violating_keys"], ab["n_keypairs"]) == (3, 0, 2)
    assert ab["holds"] is True
    ac = by[("a", "c")]
    assert (ac["n_keys"], ac["n_violating_keys"], ac["n_keypairs"]) == (3, 1, 3)
    assert ac["holds"] is False


def test_fd_check_shared_determinant(spark):
    # two pairs with the SAME determinant collapse to one grouping set
    out = fd_check(_fd_fixture(spark), [("a", "b"), ("a", "c"), ("b", "c")])
    rows = {(r["determinant"], r["dependent"]): r["holds"] for r in out.collect()}
    assert rows == {("a", "b"): True, ("a", "c"): False, ("b", "c"): False}


def test_fd_single_scan_plan(spark, sf_correct):
    """The N-candidate check is ONE FileScan + ONE Expand — folding all
    pairs into a single aggregate over the GROUPING SETS frame means
    adding candidates never adds scans (executed-plan gate)."""
    from data_observability_installer_spark.sources.tables import load_table

    orders = load_table(spark, sf_correct, "orders")
    pairs = [
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderstatus", "o_orderpriority"),
    ]
    plan = (
        fd_check(orders, pairs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan
    # one Expand for the grouping sets + (at most) one more from
    # Catalyst's multi-count-distinct rewrite — never one per pair
    assert 1 <= plan.count("Expand") <= 2, plan


def test_ind_check_partial_and_full(spark):
    child = spark.createDataFrame([(1,), (2,), (3,), (None,)], "v int")
    parent = spark.createDataFrame([(1,), (2,), (9,)], "p int")
    out = ind_check(
        [
            ("c", child, "v", "p", parent, "p"),
            ("c", child, "v", "c", child, "v"),  # self: full containment
        ]
    ).collect()
    by = {(r["child"], r["parent"]): r for r in out}
    partial = by[("c.v", "p.p")]
    assert (partial["n_child_distinct"], partial["n_contained"]) == (3, 2)
    assert partial["containment_bp"] == 6666 and partial["holds"] is False
    full = by[("c.v", "c.v")]
    assert full["holds"] is True and full["containment_bp"] == 10000


def test_ind_check_empty_parent(spark):
    child = spark.createDataFrame([(1,), (2,)], "v int")
    parent = spark.createDataFrame([], "p int")
    r = ind_check([("c", child, "v", "p", parent, "p")]).collect()[0]
    assert (r["n_contained"], r["containment_bp"], r["holds"]) == (0, 0, False)


def test_ind_distinct_reduces_before_join(spark):
    """Plan gate: the containment join's inputs are aggregated
    (distinct) frames, so join width is bounded by cardinality."""
    child = spark.createDataFrame([(i % 5,) for i in range(1000)], "v int")
    parent = spark.createDataFrame([(i,) for i in range(5)], "p int")
    plan = (
        ind_check([("c", child, "v", "p", parent, "p")])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # both sides deduplicate below the join: Aggregate appears under it
    assert plan.count("Aggregate") >= 3  # child distinct, parent distinct, final agg


def test_fd_approx_mode_agrees_on_verdicts(spark, sf_correct):
    """The HLL production mode (bounded per-key state) reaches the
    same holds/violating verdicts as the exact mode on real data —
    HLL++ is exact below its sparse threshold and the predicate only
    asks nb > 1."""
    from data_observability_installer_spark.sources.tables import load_table

    pairs = [
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
    ]
    orders = load_table(spark, sf_correct, "orders")
    exact = {
        (r["determinant"], r["dependent"]): (r["holds"], r["n_violating_keys"])
        for r in fd_check(orders, pairs, exact=True).collect()
    }
    approx = {
        (r["determinant"], r["dependent"]): (r["holds"], r["n_violating_keys"])
        for r in fd_check(orders, pairs, exact=False).collect()
    }
    assert exact == approx


def test_ind_check_empty_child(spark):
    child = spark.createDataFrame([], "v int")
    parent = spark.createDataFrame([(1,)], "p int")
    r = ind_check([("c", child, "v", "p", parent, "p")]).collect()[0]
    # vacuous containment reports 0 bp and does NOT claim an FK
    assert (r["n_child_distinct"], r["n_contained"]) == (0, 0)
    assert (r["containment_bp"], r["holds"]) == (0, False)
