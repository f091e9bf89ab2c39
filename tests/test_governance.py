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


def test_pseudonymize_preserves_joins_and_nulls(spark):
    from data_observability_installer_spark.operators.dq.governance import pseudonymize

    a = spark.createDataFrame([("alice", 1), ("bob", 2), (None, 3)], "name string, x int")
    b = spark.createDataFrame([("alice", 10), ("carol", 20)], "name string, y int")
    pa, pb = pseudonymize(a, ["name"]), pseudonymize(b, ["name"])
    # same value -> same token across frames: the join still works
    joined = pa.join(pb, "name").collect()
    assert len(joined) == 1 and joined[0].x == 1 and joined[0].y == 10
    rows = {r.x: r.name for r in pa.collect()}
    assert rows[3] is None  # null is not an identity
    assert rows[1].startswith("tok_") and rows[1] != rows[2]
    # a different salt breaks linkage to the old tokens
    rot = {r.x: r.name for r in pseudonymize(a, ["name"], salt="v2").collect()}
    assert rot[1] != rows[1]


def test_k_anonymity_gate(spark):
    from data_observability_installer_spark.operators.dq.governance import k_anonymity

    rows = [("US", "A")] * 10 + [("US", "B")] * 5 + [("FR", "A")] * 2
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = k_anonymity(df, ["nation", "seg"], k=5).collect()[0]
    assert (out.n_rows, out.n_classes, out.min_class_size) == (17, 3, 2)
    assert out.rows_below_k == 2 and out.below_k_bp == 2 * 10000 // 17
    assert not out.k_anonymous
    ok = k_anonymity(df.filter("nation = 'US'"), ["nation", "seg"], k=5).collect()[0]
    assert ok.k_anonymous and ok.min_class_size == 5


def test_l_diversity_catches_homogeneous_class(spark):
    from data_observability_installer_spark.operators.dq.governance import l_diversity

    # class US: 10 rows but ALL share one sensitive value; FR diverse
    rows = [("US", "flu")] * 10 + [("FR", "flu"), ("FR", "cold"), ("FR", "ok")]
    df = spark.createDataFrame(rows, "nation string, dx string")
    out = l_diversity(df, ["nation"], "dx", l=2).collect()[0]
    assert out.min_diversity == 1 and not out.l_diverse
    assert out.rows_below_l == 10 and out.below_l_bp == 10 * 10000 // 13

    # null sensitive values disclose nothing -> don't count as diversity
    nul = spark.createDataFrame([("US", None), ("US", "flu")], "nation string, dx string")
    assert l_diversity(nul, ["nation"], "dx", l=2).collect()[0].min_diversity == 1


def test_pseudonymize_keep_len_preserves_widths(spark):
    from data_observability_installer_spark.operators.dq.governance import pseudonymize

    df = spark.createDataFrame(
        [("ab", 1), ("a-much-longer-identifier", 2), (None, 3)], "name string, x int"
    )
    rows = {r.x: r.name for r in pseudonymize(df, ["name"], keep_len=True).collect()}
    assert len(rows[1]) == 2 and len(rows[2]) == 24
    assert rows[3] is None


def test_pseudonymize_quoted_salt_safe(spark):
    """Round-7 ADVICE: a salt containing a single quote broke the
    keep_len=True raw-f-string expression (and could silently alter
    the token). Both paths must now parse AND produce the same md5 the
    safe Column path computes."""
    import hashlib

    from data_observability_installer_spark.operators.dq.governance import (
        pseudonymize,
        pseudonymize_sql,
    )

    salt = "o'brien's-v1"
    df = spark.createDataFrame([("alice",), (None,)], "name string")
    got = {r.name for r in pseudonymize(df, ["name"], salt=salt).collect()}
    want = "tok_" + hashlib.md5(f"{salt}:alice".encode()).hexdigest()[:16]
    assert got == {want, None}

    kl = [r.name for r in
          pseudonymize(df, ["name"], salt=salt, keep_len=True).collect()
          if r.name is not None][0]
    assert kl == want[: len("alice")] and len(kl) == len("alice")

    import duckdb

    sql = pseudonymize_sql("(SELECT 'alice' AS name)", ["name"], ["name"], salt=salt)
    assert duckdb.sql(sql).fetchone()[0] == want


def test_pseudonymize_backslash_salt_safe(spark):
    """Round-8 ADVICE: Spark SQL expr() literals are backslash-escaped
    while DuckDB literals are not, so a backslash salt diverged between
    engines and a TRAILING backslash broke Spark parsing under the old
    interpolated keep_len path. The Column-typed path must match the
    raw md5 for both, including a salt ending in a backslash."""
    import hashlib

    import duckdb

    from data_observability_installer_spark.operators.dq.governance import (
        pseudonymize,
        pseudonymize_sql,
    )

    for salt in ["back\\slash-v1", "trailing-backslash\\", "mix\\'d\\"]:
        df = spark.createDataFrame([("alice",)], "name string")
        want = "tok_" + hashlib.md5(f"{salt}:alice".encode()).hexdigest()[:16]
        assert [r.name for r in pseudonymize(df, ["name"], salt=salt).collect()] == [want]
        kl = pseudonymize(df, ["name"], salt=salt, keep_len=True).collect()[0].name
        assert kl == want[: len("alice")]
        sql = pseudonymize_sql("(SELECT 'alice' AS name)", ["name"], ["name"], salt=salt)
        assert duckdb.sql(sql).fetchone()[0] == want
