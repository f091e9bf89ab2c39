"""As-of join, hierarchical rollup, rolling anomaly: semantics on
hand-built frames (boundary inclusivity, direction, subtotal levels,
spike detection and cold-start suppression)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.relational import (
    asof_join,
    interval_point_join,
    rolling_anomaly,
    time_bucket_rollup,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_backward_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [("k1", _ts(10), "probe-a"), ("k1", _ts(12), "probe-b"), ("k2", _ts(9), "probe-c")],
        "k string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [("k1", _ts(9), 1.0), ("k1", _ts(10), 2.0), ("k1", _ts(11), 3.0)],
        "k string, ts timestamp, v double",
    )
    got = {r.tag: r.v for r in asof_join(left, right, on="k").collect()}
    assert got["probe-a"] == 2.0  # equal timestamp matches (inclusive)
    assert got["probe-b"] == 3.0  # latest before 12:00
    assert got["probe-c"] is None  # no right rows for k2 -> left outer


def test_asof_forward_picks_earliest_at_or_after(spark):
    left = spark.createDataFrame(
        [("k1", _ts(10), "p")], "k string, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [("k1", _ts(9), 1.0), ("k1", _ts(10, 30), 2.0), ("k1", _ts(11), 3.0)],
        "k string, ts timestamp, v double",
    )
    got = asof_join(left, right, on="k", direction="forward").collect()
    assert got[0].v == 2.0


def test_asof_name_collision_gets_right_suffix(spark):
    left = spark.createDataFrame([("k", _ts(10), 7.0)], "k string, ts timestamp, v double")
    right = spark.createDataFrame([("k", _ts(9), 9.0)], "k string, ts timestamp, v double")
    row = asof_join(left, right, on="k").collect()[0]
    assert row.v == 7.0 and row.v_right == 9.0


def test_asof_single_shuffle_plan(spark):
    left = spark.createDataFrame([("k", _ts(10), 7.0)], "k string, ts timestamp, v double")
    right = spark.createDataFrame([("k", _ts(9), 9.0)], "k string, ts timestamp, p double")
    plan = asof_join(left, right, on="k")._jdf.queryExecution().executedPlan().toString()
    # one hashpartitioning exchange on the key (both union branches
    # repartition to it), never a range/cartesian product
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_rollup_levels(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts(1), 1.0),
            ("a", _ts(2), 2.0),
            ("b", dt.datetime(2024, 1, 2, 1), 4.0),
        ],
        "t string, ts timestamp, v double",
    )
    out = time_bucket_rollup(
        df, "ts", ["t"], [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")]
    ).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r.grouping_level, []).append(r)
    assert len(by_level[0]) == 2  # (t, day) finest
    assert len(by_level[1]) == 2  # per-t subtotal
    assert len(by_level[3]) == 1 and by_level[3][0].s == 7.0  # grand total


def test_rolling_anomaly_flags_spike_not_coldstart(spark):
    days = [(dt.datetime(2024, 1, d), 100.0 + (d % 2)) for d in range(1, 9)]
    days.append((dt.datetime(2024, 1, 9), 500.0))  # planted spike
    df = spark.createDataFrame(
        [("s", d, v) for d, v in days], "k string, day timestamp, cnt double"
    )
    out = {r.day.day: r for r in rolling_anomaly(df, ["k"], "day", "cnt").collect()}
    assert out[9].is_anomaly  # the spike
    assert out[9].z_score > 3
    assert not out[1].is_anomaly and out[1].history_ct == 0  # cold start
    assert not out[2].is_anomaly and not out[3].is_anomaly  # < min_history
    assert not any(out[d].is_anomaly for d in range(4, 9))  # steady state


def test_rolling_anomaly_constant_series_no_div_zero(spark):
    df = spark.createDataFrame(
        [("s", dt.datetime(2024, 1, d), 10.0) for d in range(1, 8)],
        "k string, day timestamp, cnt double",
    )
    rows = rolling_anomaly(df, ["k"], "day", "cnt").collect()
    assert all(not r.is_anomaly for r in rows)
    assert all(r.z_score is None for r in rows if r.history_ct >= 2)  # sd = 0


def test_interval_point_join_containment(spark):
    intervals = spark.createDataFrame(
        [
            ("i1", "k", _ts(9), _ts(11)),
            ("i2", "k", _ts(10, 30), _ts(12)),  # overlaps i1
            ("i3", "other", _ts(9), _ts(23)),   # wrong key
        ],
        "iid string, key string, start_ts timestamp, end_ts timestamp",
    )
    points = spark.createDataFrame(
        [("p1", "k", _ts(10, 45)), ("p2", "k", _ts(8)), ("p3", "k", _ts(11))],
        "pid string, key string, ts timestamp",
    )
    got = {
        (r.pid, r.iid)
        for r in interval_point_join(intervals, points, on="key").collect()
    }
    # p1 in both overlapping intervals; p2 before all; p3 at i1's
    # inclusive end and inside i2
    assert got == {("p1", "i1"), ("p1", "i2"), ("p3", "i1"), ("p3", "i2")}


def test_entity_match_multi_field_scoring(spark):
    """A planted near-duplicate (typo name, same category, close
    balance) outscores a same-name different-evidence decoy; integer
    bp arithmetic matches the hand computation."""
    from data_observability_installer_spark.operators.linkage import entity_match

    rows = [
        (1, "acme corporation", 5, 100000),
        (2, "acme corporatio", 5, 100050),   # the true dup: typo, close
        (3, "acme corporatign", 9, 900000),  # name-close, rest disagrees
        (4, "zenith labs", 5, 100000),
    ]
    df = spark.createDataFrame(rows, "id int, name string, cat int, cents long")
    got = {
        (r["id_a"], r["id_b"]): (r["name_sim_bp"], r["score_bp"])
        for r in entity_match(
            df, "id", "name", block_prefix=8,
            cat_cols=["cat"], num_cols=[("cents", 10000)],
            threshold_bp=0, limit=50,
        ).collect()
    }
    # (1,2): lev=1/len16 -> 10000-625=9375; cat 10000; num |50|*10000//10000=50 -> 9950
    # score = (4*9375 + 2*10000 + 1*9950) DIV 7 = (37500+20000+9950)//7 = 9635
    assert got[(1, 2)] == (9375, 9635)
    # (1,3): lev=1 ('o'->'g') -> 9375; cat 0; num capped 0 -> 37500//7=5357
    assert got[(1, 3)] == (9375, 5357)
    assert got[(1, 2)][1] > got[(1, 3)][1]
    # different block: (1,4) never compared
    assert (1, 4) not in got


def test_entity_match_max_block_drops_hot_blocks(spark):
    """Hot-block skew guard: a prefix shared by too many rows carries
    no linkage evidence and would cost block^2 comparisons — max_block
    excludes it from candidate generation on BOTH engines, leaving
    normal blocks untouched."""
    import duckdb

    from data_observability_installer_spark.operators.linkage import (
        entity_match,
        entity_match_sql,
    )

    hot = [(i, f"llc b{i:03d}", 1, 0) for i in range(10)]  # prefix "llc b" x10
    cold = [(100, "acme corp", 1, 0), (101, "acme core", 1, 0)]
    df = spark.createDataFrame(
        hot + cold, "id int, name string, cat int, cents long"
    )
    kw = dict(block_prefix=5, cat_cols=["cat"], num_cols=[("cents", 10000)],
              threshold_bp=0, limit=500)
    uncapped = entity_match(df, "id", "name", **kw).collect()
    capped = entity_match(df, "id", "name", max_block=5, **kw).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(100, 101)}
    assert len(uncapped) == 45 + 1  # C(10,2) hot pairs + the cold pair

    # SQL twin agrees under the same cap
    values = ", ".join(
        f"({i}, '{n}', {c}, {x})" for i, n, c, x in hot + cold
    )
    got = duckdb.sql(
        entity_match_sql(
            f"(SELECT * FROM (VALUES {values}) v(id, name, cat, cents))",
            "id", "name", max_block=5, **kw,
        )
    ).fetchall()
    assert {(a, b) for a, b, *_ in got} == {(100, 101)}
