"""Incremental profiling: per-partition partial states must merge to
the same metrics as one full-table pass (the 100 TB no-rescan path)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.profile import (
    finalize_profile,
    merge_partials,
    profile,
    profile_partial,
)
from data_observability_installer_spark.plans.suites import AS_OF
from data_observability_installer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a == b
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return abs(a - b) <= tol * max(1.0, abs(a), abs(b))


def test_merged_halves_equal_full_profile(spark):
    li = load_table(spark, SF, "lineitem")
    a = li.filter(F.col("l_orderkey") % 2 == 0)
    b = li.filter(F.col("l_orderkey") % 2 != 0)
    merged = merge_partials(
        profile_partial(a, "lineitem"), profile_partial(b, "lineitem")
    )
    inc = {
        (r.column_name, r.metric): (r.value, r.value_str)
        for r in finalize_profile(merged, AS_OF).collect()
    }
    full = {
        (r.column_name, r.metric): (r.value, r.value_str)
        for r in profile(li, "lineitem", AS_OF).collect()
    }
    shared = set(inc) & set(full)
    # every incremental metric the one-pass profile also computes must agree
    assert len(shared) >= 100
    for key in sorted(shared):
        (iv, is_), (fv, fs) = inc[key], full[key]
        assert _close(iv, fv), (key, iv, fv)
        assert is_ == fs, (key, is_, fs)


def test_merge_is_associative_and_empty_safe(spark):
    li = load_table(spark, SF, "lineitem")
    thirds = [li.filter(F.col("l_orderkey") % 3 == i) for i in range(3)]
    parts = [profile_partial(t, "lineitem") for t in thirds]
    empty = profile_partial(li.filter(F.lit(False)), "lineitem")

    left = merge_partials(merge_partials(parts[0], parts[1]), parts[2], empty)
    right = merge_partials(parts[0], merge_partials(parts[1], parts[2]))
    lv = {(r.column_name, r.stat): (r.value_d, r.value_s) for r in left.collect()}
    rv = {(r.column_name, r.stat): (r.value_d, r.value_s) for r in right.collect()}
    assert set(lv) == set(rv)
    for k in lv:
        assert _close(lv[k][0], rv[k][0]), (k, lv[k], rv[k])
        assert lv[k][1] == rv[k][1]


def test_partial_state_is_metadata_sized(spark):
    li = load_table(spark, SF, "lineitem")
    state = profile_partial(li, "lineitem")
    # 11 columns x ~12 stats — state size independent of row count
    assert state.count() < 150


def test_profile_delta_flags_planted_shift(spark):
    """A snapshot whose numeric level doubled flags avg/sum/max but not
    row-count-invariant metrics; ADDED/REMOVED columns always flag."""
    from data_observability_installer_spark.operators.profile import (
        profile,
        profile_delta,
    )

    old_rows = [(i, float(10 + i % 3)) for i in range(100)]
    new_rows = [(i, float(2 * (10 + i % 3))) for i in range(100)]
    old = profile(
        spark.createDataFrame(old_rows, "id long, x double"), "t", "2026-01-01"
    )
    new = profile(
        spark.createDataFrame(new_rows, "id long, x double"), "t", "2026-01-01"
    )
    out = {(r.column_name, r.metric): r for r in profile_delta(old, new).collect()}
    avg = out[("x", "avg_val")]
    assert avg.status == "BOTH" and avg.rel_change_bp == 10000 and avg.flagged
    assert not out[("x", "null_pct")].flagged  # 0 -> 0 stays unflagged, rel 0
    assert out[("x", "null_pct")].rel_change_bp == 0
    assert not out[("id", "record_ct")].flagged

    # schema change: a column present only in the new profile
    wider = profile(
        spark.createDataFrame([(1, 1.0, "a")], "id long, x double, y string"),
        "t",
        "2026-01-01",
    )
    out2 = {(r.column_name, r.metric, r.status) for r in profile_delta(old, wider).collect()}
    assert any(c == "y" and st == "ADDED" for c, _, st in out2)


def test_profile_store_round_trip_and_latest(spark, tmp_path):
    """write_profile/read_profile: the stored baseline round-trips the
    long-form profile bit-exactly, and run_id=None selects the LATEST
    run by lexicographic run id (the write contract: zero-padded / ISO
    ids)."""
    from data_observability_installer_spark.operators.profile import (
        profile,
        read_profile,
        write_profile,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None)], "x int, s string"
    )
    prof = profile(df, "t", "2025-01-01")
    store = str(tmp_path / "store" / "t")
    write_profile(prof, store, "0001")
    back = read_profile(spark, store, "0001")
    want = sorted(map(tuple, prof.collect()))
    assert sorted(map(tuple, back.collect())) == want
    assert back.columns == prof.columns

    # second run with different data; latest == run 0002
    prof2 = profile(df.filter("x < 3"), "t", "2025-01-02")
    write_profile(prof2, store, "0002")
    latest = read_profile(spark, store)
    assert sorted(map(tuple, latest.collect())) == sorted(map(tuple, prof2.collect()))
    # pinned read still returns the original
    assert sorted(map(tuple, read_profile(spark, store, "0001").collect())) == want


def test_vacuum_profile_store_keep_last_n_and_rollup(spark, tmp_path):
    """Retention for continuous profiling: per-micro-batch partial
    partitions older than the keep window merge into ONE rollup
    partition (associative algebra -> finalize over the vacuumed store
    is bit-identical to the unvacuumed one), and the store's partition
    count stops growing with stream lifetime."""
    from data_observability_installer_spark.operators.profile import (
        list_profile_runs,
        read_profile,
        vacuum_profile_store,
        write_profile,
    )

    li = load_table(spark, SF, "lineitem")
    store = str(tmp_path / "store" / "lineitem_partials")
    fifths = [li.filter(F.col("l_orderkey") % 5 == i) for i in range(5)]
    for i, part in enumerate(fifths):
        write_profile(profile_partial(part, "lineitem"), store, f"{i:08d}")

    before = finalize_profile(
        merge_partials(*[read_profile(spark, store, f"{i:08d}") for i in range(5)]),
        AS_OF,
    )
    want = sorted(map(tuple, before.collect()))

    out = vacuum_profile_store(
        spark, store, keep_last_n=2, rollup_run_id="00000000-rollup"
    )
    assert out["dropped"] == [f"{i:08d}" for i in range(3)]
    runs = list_profile_runs(store)
    assert runs == ["00000000-rollup", "00000003", "00000004"]

    after = finalize_profile(
        merge_partials(*[read_profile(spark, store, r) for r in runs]), AS_OF
    )
    assert sorted(map(tuple, after.collect())) == want


def test_vacuum_profile_store_policies_and_guards(spark, tmp_path):
    from data_observability_installer_spark.operators.profile import (
        list_profile_runs,
        profile,
        read_profile,
        vacuum_profile_store,
        write_profile,
    )
    import pytest

    df = spark.createDataFrame([(1,), (2,)], "x int")
    store = str(tmp_path / "store" / "t")
    for rid in ["2025-01-01T00:00:00", "2025-01-02T00:00:00", "2025-01-03T00:00:00"]:
        write_profile(profile(df, "t", rid[:10]), store, rid)

    # exactly one policy required
    with pytest.raises(ValueError, match="exactly one"):
        vacuum_profile_store(spark, store, keep_last_n=1, keep_days=1)
    with pytest.raises(ValueError, match="exactly one"):
        vacuum_profile_store(spark, store)

    # finalized-profile partitions cannot roll up (schema guard)
    with pytest.raises(ValueError, match="partial-state"):
        vacuum_profile_store(
            spark, store, keep_last_n=1, rollup_run_id="2020-rollup"
        )

    # keep_before: lexicographic cutoff (== keep_days for ISO run ids)
    out = vacuum_profile_store(spark, store, keep_before="2025-01-02")
    assert out["dropped"] == ["2025-01-01T00:00:00"]
    # latest-run selection (the profile_history read path) is unchanged
    latest = read_profile(spark, store)
    assert latest.count() > 0
    assert list_profile_runs(store) == [
        "2025-01-02T00:00:00", "2025-01-03T00:00:00"
    ]

    # rollup id colliding with retained-run ordering is rejected
    with pytest.raises(ValueError, match="below every"):
        vacuum_profile_store(
            spark, store, keep_last_n=1, rollup_run_id="2025-06-01"
        )
    # no-op vacuum (nothing older than the window) returns empty drop
    assert vacuum_profile_store(spark, store, keep_last_n=5)["dropped"] == []
