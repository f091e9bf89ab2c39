"""Entity footprint: zero counts are rows, linkage is caller-joined."""

from __future__ import annotations

from data_observability_installer_spark.operators.dq.governance import (
    entity_footprint,
)


def test_entity_footprint_counts_and_zero_rows(spark):
    cust = spark.createDataFrame([(1,), (2,), (3,)], "c long")
    orders = spark.createDataFrame([(1,), (1,), (3,)], "oc long")
    keys = spark.createDataFrame([(1,), (2,), (99,)], "entity_key long")
    out = {
        (r.entity_key, r.table_name): r.row_ct
        for r in entity_footprint(
            [("customer", cust, "c"), ("orders", orders, "oc")], keys
        ).collect()
    }
    assert out[(1, "customer")] == 1 and out[(1, "orders")] == 2
    assert out[(2, "orders")] == 0  # zero is a ROW (the compliance answer)
    assert out[(99, "customer")] == 0 and out[(99, "orders")] == 0
    assert len(out) == 6  # keys x tables, complete matrix


def test_entity_footprint_after_deletion_is_all_zero(spark):
    cust = spark.createDataFrame([(7,)], "c long")
    keys = spark.createDataFrame([(7,)], "entity_key long")
    before = entity_footprint([("customer", cust, "c")], keys).collect()[0]
    assert before.row_ct == 1
    after = entity_footprint(
        [("customer", cust.filter("c <> 7"), "c")], keys
    ).collect()[0]
    assert after.row_ct == 0  # the deletion evidence
