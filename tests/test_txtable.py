"""ACID-lite transactional table format: atomic CAS commits, snapshot
isolation, time travel, compaction, vacuum, transactional CDC merge."""

from __future__ import annotations

import json
import os

import pytest

from data_observability_installer_spark.sources.txtable import (
    CommitConflict,
    _manifest_path,
    _publish,
    compact,
    history,
    merge_cdc,
    read_manifest,
    read_table,
    vacuum,
    write_table,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_append_overwrite_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    a = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b = spark.createDataFrame([(3, "c")], "k int, v string")
    assert write_table(spark, t, a) == 1
    assert write_table(spark, t, b) == 2
    assert _rows(read_table(spark, t)) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel
    assert _rows(read_table(spark, t, version=1)) == [(1, "a"), (2, "b")]
    # overwrite replaces the file list, old versions still readable
    assert write_table(spark, t, b, mode="overwrite") == 3
    assert _rows(read_table(spark, t)) == [(3, "c")]
    assert _rows(read_table(spark, t, version=2)) == [(1, "a"), (2, "b"), (3, "c")]
    assert [h["op"] for h in history(t)] == ["append", "append", "overwrite"]


def test_snapshot_isolation_across_commits(spark, tmp_path):
    """A reader pinned before a later commit keeps its snapshot: data
    files are immutable, so the pinned plan stays valid."""
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"))
    pinned = read_table(spark, t)  # planned against v1
    write_table(spark, t, spark.createDataFrame([(2,)], "k int"))
    compact(spark, t, target_partitions=1)
    assert _rows(pinned) == [(1,)]
    assert _rows(read_table(spark, t)) == [(1,), (2,)]


def test_commit_cas_rejects_lost_race(spark, tmp_path):
    """os.link publication is a true compare-and-swap: a pre-claimed
    version number forces the writer onto the NEXT number (one winner
    per version, no overwrite)."""
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"))
    # simulate a racing writer that already claimed v2
    m = read_manifest(t, 1)
    os.makedirs(os.path.dirname(_manifest_path(t, 2)), exist_ok=True)
    with open(_manifest_path(t, 2), "w") as fh:
        json.dump({**m, "version": 2, "op": "racer"}, fh)
    v = write_table(spark, t, spark.createDataFrame([(2,)], "k int"))
    assert v == 3  # lost v2, retried, won v3
    assert read_manifest(t, 2)["op"] == "racer"  # never clobbered
    # rows: v3 appended onto the RE-READ head (the racer's v2 list)
    assert (1,) in _rows(read_table(spark, t)) and (2,) in _rows(read_table(spark, t))

    # retries exhausted (every CAS attempt loses) -> loud conflict,
    # not silent corruption
    def always_lose(src, dst):
        raise FileExistsError(dst)

    import unittest.mock as mock

    with mock.patch("os.link", side_effect=always_lose):
        with pytest.raises(CommitConflict):
            _publish(t, {"op": "x", "files": [], "schema": m["schema"]}, retries=2)


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1, "a")], "k int, v string"))
    bad = spark.createDataFrame([(1.5, "a")], "k double, v string")
    with pytest.raises(ValueError, match="schema"):
        write_table(spark, t, bad)
    # overwrite may change the schema deliberately
    assert write_table(spark, t, bad, mode="overwrite") == 2


def test_compact_row_identical_and_fewer_files(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(4):
        write_table(
            spark, t,
            spark.createDataFrame([(i, i * 10)], "k int, v int").repartition(4),
        )
    before = read_manifest(t)
    want = _rows(read_table(spark, t))
    compact(spark, t, target_partitions=1)
    after = read_manifest(t)
    assert _rows(read_table(spark, t)) == want
    assert after["op"] == "compact" and len(after["files"]) < len(before["files"])


def test_vacuum_drops_only_unreferenced(spark, tmp_path):
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"))
    write_table(spark, t, spark.createDataFrame([(2,)], "k int"))
    compact(spark, t, target_partitions=1)  # v3 references only new files
    removed = vacuum(t, keep_last=1)
    assert removed >= 1
    # head still reads; vacuumed versions are gone
    assert _rows(read_table(spark, t)) == [(1,), (2,)]
    with pytest.raises(FileNotFoundError):
        read_table(spark, t, version=1)


def test_merge_cdc_atomic_upsert_delete(spark, tmp_path):
    t = str(tmp_path / "t")
    write_table(
        spark, t,
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string"),
    )
    changes = spark.createDataFrame(
        [(2, "B", False), (3, None, True), (4, "d", False)],
        "k int, v string, _deleted boolean",
    )
    v = merge_cdc(spark, t, changes, ["k"], deleted_col="_deleted")
    assert _rows(read_table(spark, t)) == [(1, "a"), (2, "B"), (4, "d")]
    # one atomic commit: the pre-merge snapshot is intact at v-1
    assert _rows(read_table(spark, t, version=v - 1)) == [
        (1, "a"), (2, "b"), (3, "c")
    ]


def test_table_changes_append_only_cdc_read(spark, tmp_path):
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"))
    write_table(spark, t, spark.createDataFrame([(2,)], "k int"))
    write_table(spark, t, spark.createDataFrame([(3,)], "k int"))
    from data_observability_installer_spark.sources.txtable import table_changes

    assert _rows(table_changes(spark, t, from_version=1)) == [(2,), (3,)]
    assert _rows(table_changes(spark, t, 1, to_version=2)) == [(2,)]
    assert _rows(table_changes(spark, t, 3)) == []  # empty delta, schema kept
    compact(spark, t, target_partitions=1)
    with pytest.raises(ValueError, match="append-only"):
        table_changes(spark, t, 1)


def test_txtable_sink_exactly_once_across_replays(spark, tmp_path):
    """foreachBatch is at-least-once; the manifest's batch_id makes the
    table exactly-once — a replayed micro-batch publishes nothing."""
    import time as _time

    from data_observability_installer_spark.sources.txtable import txtable_sink

    src = tmp_path / "src"
    src.mkdir()
    t, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")
    spark.createDataFrame([(1,)], "k int").coalesce(1).write.mode("append").json(str(src))
    _time.sleep(1.1)  # file-source order follows mtime @ 1 s
    spark.createDataFrame([(2,)], "k int").coalesce(1).write.mode("append").json(str(src))

    stream = spark.readStream.schema("k int").option("maxFilesPerTrigger", 1).json(str(src))
    q = txtable_sink(stream, t, ckpt, availableNow=True)
    q.awaitTermination(120)
    assert _rows(read_table(spark, t)) == [(1,), (2,)]
    n_versions = len(history(t))

    # simulate Spark replaying an already-committed micro-batch: drive
    # the sink's ACTUAL commit body again with a seen batch_id — it
    # must publish nothing, even with different (retried) data
    from data_observability_installer_spark.sources import txtable as _tx

    seen = {_tx.read_manifest(t, v)["batch_id"] for v in _tx._versions(t)
            if _tx.read_manifest(t, v).get("batch_id") is not None}
    replay_id = next(iter(seen))
    df = spark.createDataFrame([(99,)], "k int")
    assert _tx.commit_stream_batch(t, df, replay_id) is None
    assert _rows(read_table(spark, t)) == [(1,), (2,)]
    assert len(history(t)) == n_versions
    # an UNSEEN batch_id commits normally
    assert _tx.commit_stream_batch(t, df, max(seen) + 1000) == n_versions + 1
    assert (99,) in _rows(read_table(spark, t))


def test_txtable_random_command_sequences_match_model(spark, tmp_path):
    """Model-based check: a deterministic pseudo-random sequence of
    append/overwrite/compact/merge commands against a plain in-memory
    model — after EVERY commit, the head snapshot equals the model and
    every retained historical version still equals its recorded model
    state (snapshot immutability under later writes)."""
    import random

    from data_observability_installer_spark.sources.txtable import merge_cdc

    rng = random.Random(20250815)
    t = str(tmp_path / "t")
    model: dict[int, int] = {}  # k -> v
    snapshots: dict[int, dict[int, int]] = {}

    def df_of(d: dict[int, int]):
        return spark.createDataFrame(
            [(k, v) for k, v in d.items()] or [], "k int, v int"
        )

    write_table(spark, t, df_of({1: 10}))
    model = {1: 10}
    snapshots[1] = dict(model)

    for step in range(8):
        op = rng.choice(["append", "overwrite", "compact", "merge"])
        if op == "append":
            new = {rng.randrange(100, 200) + step * 1000: rng.randrange(9)}
            v = write_table(spark, t, df_of(new))
            model.update(new)
        elif op == "overwrite":
            new = {rng.randrange(5): rng.randrange(9) for _ in range(3)}
            v = write_table(spark, t, df_of(new), mode="overwrite")
            model = dict(new)
        elif op == "compact":
            v = compact(spark, t, target_partitions=1)
        else:
            ks = list(model) or [0]
            upd = {rng.choice(ks): rng.randrange(9), 999 + step: step}
            v = merge_cdc(spark, t, df_of(upd), ["k"])
            model.update(upd)
        snapshots[v] = dict(model)
        assert _rows(read_table(spark, t)) == sorted(model.items()), (step, op)

    # every retained version still reads as the model state it froze
    for v, m in snapshots.items():
        assert _rows(read_table(spark, t, version=v)) == sorted(m.items()), v
