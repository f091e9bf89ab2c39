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


# --- candidate generation + generator round-trip ---------------------------


def _planted(spark):
    """Micro-schema with planted dependencies (sized so the d*10 <= n
    determinant rule fires): city -> country is a real FD; city -> zip
    is violated (zips cross cities); dim.city is a key the fact's city
    and alt columns reference (FKs); fact.country misses the dim."""
    cities = [f"c{i}" for i in range(6)]
    rows = []
    for i in range(60):
        city = cities[i % 6]
        country = "fr" if (i % 6) < 3 else "de"  # determined by city
        zipc = f"z{i % 4}"  # crosses cities -> FD violated
        alt = cities[i % 5]  # subset of dim
        rows.append((city, country, zipc, alt))
    fact = spark.createDataFrame(
        rows, "city string, country string, zip string, alt string"
    )
    dim = spark.createDataFrame(
        [(c,) for c in cities] + [("nice",), ("oslo",)], "city string"
    )
    return fact, dim


def test_discover_fds_finds_planted(spark):
    from data_observability_installer_spark.operators.dq.discovery import discover_fds

    fact, _ = _planted(spark)
    got = {
        (r["determinant"], r["dependent"]): r["holds"]
        for r in discover_fds(fact).collect()
    }
    # city (3 distinct / 20 rows) is a determinant; country holds,
    # zip is violated (paris maps to 3 zips)
    assert got[("city", "country")] is True
    assert got[("city", "zip")] is False


def test_discover_fks_finds_planted(spark):
    from data_observability_installer_spark.operators.dq.discovery import discover_fks

    fact, dim = _planted(spark)
    got = {
        (r["child"], r["parent"]): r["holds"]
        for r in discover_fks(
            {"fact": (fact, ["city", "alt"]), "dim": (dim, ["city"])}
        ).collect()
    }
    assert got[("fact.city", "dim.city")] is True
    assert got[("fact.alt", "dim.city")] is True  # alt ⊆ dim too (planted)
    # country is not among dim's values -> if proposed, it must not hold
    for (c, p), h in got.items():
        if c == "fact.country":
            assert h is False


def test_dependency_generator_round_trip(spark):
    """Discovery -> dependency_tests -> execution on the same data ->
    every generated test PASSED; a corrupted refresh flips them."""
    from data_observability_installer_spark.operators.dq.compiler import compile_suite
    from data_observability_installer_spark.operators.dq.discovery import (
        discover_fds,
        discover_fks,
    )
    from data_observability_installer_spark.operators.dq.generator import (
        dependency_tests,
        run_referential_tests,
    )

    fact, dim = _planted(spark)
    fd_rows = discover_fds(fact).collect()
    ind_rows = discover_fks(
        {"fact": (fact, ["city"]), "dim": (dim, ["city"])}
    ).collect()
    specs = dependency_tests("fact", fd_rows, ind_rows)
    fd_specs = [s for s in specs if s.test_type == "Functional_Dep"]
    fk_specs = [s for s in specs if s.test_type == "Valid_FK"]
    assert fd_specs and fk_specs

    out = compile_suite(fact, fd_specs, "2025-06-01").collect()
    assert all(r["result"] == "PASSED" for r in out)
    ref = run_referential_tests(fk_specs, {"fact": fact, "dim": dim}).collect()
    assert all(r["result"] == "PASSED" for r in ref)

    # corrupt the refresh: a city with a second country (FD break) that
    # the dim does not contain (FK break)
    bad = fact.unionByName(
        spark.createDataFrame(
            [("tokyo", "jp", "100", "paris"), ("tokyo", "fr", "101", "lyon")],
            fact.schema,
        )
    )
    out2 = {
        (r["column_name"], r["test_type"]): r["result"]
        for r in compile_suite(bad, fd_specs, "2025-06-01").collect()
    }
    assert out2[("city", "Functional_Dep")] == "WARNING"
    ref2 = run_referential_tests(fk_specs, {"fact": bad, "dim": dim}).collect()
    assert any(r["result"] == "WARNING" for r in ref2 if r["column_name"] == "city")


def test_fd_confidence_g3_exact_and_single_scan(spark, sf_correct):
    """g3 = rows to drop keeping the majority dependent per key, exact
    bp; an exact FD scores 0; the N-pair check is still ONE FileScan."""
    from data_observability_installer_spark.operators.dq.discovery import fd_confidence
    from data_observability_installer_spark.sources.tables import load_table

    rows = [("k1", "x"), ("k1", "x"), ("k1", "y"), ("k2", "z"), ("k2", "z"), (None, "q")]
    df = spark.createDataFrame(rows, "a string, b string")
    out = fd_confidence(df, [("a", "b")], tol_bp=2500).collect()[0]
    # null determinant ignored: 5 rows, keep 2+2 -> drop 1, g3 = 2000bp
    assert (out.n_rows, out.n_keys, out.drop_rows, out.g3_bp) == (5, 2, 1, 2000)
    assert out.holds_softly

    # exact FD: key -> constant scores 0 and holds softly at any tol
    exact = spark.createDataFrame([("k", "v")] * 4 + [("j", "w")], "a string, b string")
    r = fd_confidence(exact, [("a", "b")], tol_bp=0).collect()[0]
    assert r.g3_bp == 0 and r.holds_softly

    orders = load_table(spark, sf_correct, "orders")
    pairs = [
        ("o_orderkey", "o_custkey"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
    ]
    plan = (
        fd_confidence(orders, pairs)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan parquet") == 1, plan


def test_composite_key_single_scan_and_semantics(spark, sf_correct):
    """3-candidate check = ONE FileScan; the true (orderkey, linenumber)
    key is found and flagged minimal; a NULL disqualifies."""
    from data_observability_installer_spark.operators.dq.discovery import (
        composite_key_check,
    )
    from data_observability_installer_spark.sources.tables import load_table

    li = load_table(spark, sf_correct, "lineitem")
    combos = [
        ("l_orderkey", "l_linenumber"),
        ("l_orderkey", "l_partkey"),
        ("l_partkey", "l_suppkey"),
    ]
    df = composite_key_check(li, combos)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1, plan
    out = {(r.col_a, r.col_b): r for r in df.collect()}
    assert all(not r.is_key for r in out.values())  # honest negatives

    # planted minimal composite key: neither column unique alone
    planted = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "y")], "a int, b string"
    )
    k = composite_key_check(planted, [("a", "b")]).collect()[0]
    assert k.is_key and k.is_minimal_key

    nul = spark.createDataFrame([(1, "x"), (2, None)], "a int, b string")
    r = composite_key_check(nul, [("a", "b")]).collect()[0]
    assert not r.is_key and r.null_rows == 1


def test_fd_confidence_both_directions_one_call(spark):
    """Round-7 ADVICE: ('a','b') and ('b','a') share one GROUPING SET;
    the old flag-match assignment doubled the first pair's rows and
    dropped the second. Both directions in one call must now match the
    per-direction results exactly — and still plan as ONE scan."""
    from data_observability_installer_spark.operators.dq.discovery import (
        fd_confidence,
    )

    rows = [("k1", "x"), ("k1", "x"), ("k1", "y"), ("k2", "z"), ("k2", "z")]
    df = spark.createDataFrame(rows, "a string, b string")
    both = fd_confidence(df, [("a", "b"), ("b", "a")], tol_bp=2500)
    got = {(r.determinant, r.dependent): r for r in both.collect()}
    assert set(got) == {("a", "b"), ("b", "a")}
    for pair in [("a", "b"), ("b", "a")]:
        solo = fd_confidence(df, [pair], tol_bp=2500).collect()[0]
        g = got[pair]
        assert (g.n_rows, g.n_keys, g.drop_rows, g.g3_bp) == (
            solo.n_rows, solo.n_keys, solo.drop_rows, solo.g3_bp,
        ), pair
    # a->b: 5 rows, keys k1(keep 2)/k2(keep 2) -> drop 1
    assert got[("a", "b")].drop_rows == 1
    # b->a: x->k1 (2), y->k1 (1), z->k2 (2): exact FD -> drop 0
    assert got[("b", "a")].drop_rows == 0
    # one scan of the INPUT in the FINAL plan (AQE prints Initial too;
    # LocalTableScan is the broadcast name frame)
    plan = both._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Scan ExistingRDD") == 1, final
    assert final.count("Expand") == 1, final

    import pytest as _pytest

    with _pytest.raises(ValueError):
        fd_confidence(df, [("a", "b"), ("a", "b")])
    with _pytest.raises(ValueError):
        fd_confidence(df, [("a", "a")])


def test_composite_key_rejects_duplicate_unordered_combos(spark):
    """A composite key is direction-free: (a,b) and (b,a) are the SAME
    candidate, and duplicating the grouping set would double-count
    through the Expand (round-7 ADVICE) — reject loudly."""
    import pytest as _pytest

    from data_observability_installer_spark.operators.dq.discovery import (
        composite_key_check,
    )

    df = spark.createDataFrame([(1, "x")], "a int, b string")
    with _pytest.raises(ValueError):
        composite_key_check(df, [("a", "b"), ("b", "a")])
    with _pytest.raises(ValueError):
        composite_key_check(df, [("a", "a")])
