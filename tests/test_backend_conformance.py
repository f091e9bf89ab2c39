"""CommitBackend conformance: every REAL backend must make the whole
commit protocol safe — the claim-semantics contract plus the four
mid-publish racer scenarios from test_txtable.py, run against each
registered backend (the point of the seam: "swap in conditional-PUT
for S3" is only credible if the suite that proves the protocol is
backend-parameterized, not written against one implementation)."""

from __future__ import annotations

import json
import threading

import pytest

from data_observability_installer_spark.sources.txtable import (
    CommitBackend,
    CommitConflict,
    LocalLinkBackend,
    LocalTmpfileBackend,
    _manifest_path,
    commit_stream_batch,
    compact,
    history,
    merge_cdc,
    read_manifest,
    read_table,
    write_table,
)

from data_observability_installer_spark.sources.objstore import (
    HTTPCASBackend,
    InMemoryCASServer,
)

BACKENDS = [LocalLinkBackend, LocalTmpfileBackend, HTTPCASBackend]


@pytest.fixture(params=BACKENDS, ids=lambda c: c.__name__)
def backend_cls(request):
    cls = request.param
    if cls is LocalTmpfileBackend and not LocalTmpfileBackend.supported():
        pytest.skip("O_TMPFILE/AT_EMPTY_PATH unsupported here")
    if cls is HTTPCASBackend:
        # object-store stand-in: a real concurrent HTTP arbiter
        # implementing the S3/GCS conditional-PUT contract — the claim
        # races in the SERVER, the local commit dir is the read cache
        srv = InMemoryCASServer()
        request.addfinalizer(srv.close)
        return lambda: HTTPCASBackend(srv.endpoint)
    return cls


def _rows(df):
    return sorted(map(tuple, df.collect()))


class _RacerWrap(CommitBackend):
    """Fires a concurrent commit in the lost-update window — AFTER the
    operation read the head and built its manifest, BEFORE its CAS
    claim — then delegates the claim to the backend under test. The
    racer itself also commits through the tested backend."""

    def __init__(self, inner: CommitBackend, racer):
        self.inner = inner
        self.racer = racer
        self.fired = False

    def claim_version(self, table_path, version, payload):
        if not self.fired:
            self.fired = True
            self.racer()
        return self.inner.claim_version(table_path, version, payload)


def test_claim_semantics(backend_cls, tmp_path):
    """The one-method contract: first claim of a version wins and the
    manifest object is the FULL payload; any later claim of the same
    version returns False and never clobbers the winner."""
    b = backend_cls()
    t = str(tmp_path / "t")
    assert b.claim_version(t, 1, '{"winner": 1}') is True
    assert b.claim_version(t, 1, '{"loser": 2}') is False
    with open(_manifest_path(t, 1)) as fh:
        assert json.load(fh) == {"winner": 1}
    assert b.claim_version(t, 2, '{"next": 3}') is True  # versions independent


def test_claim_is_atomic_under_threads(backend_cls, tmp_path):
    """N threads claim the same version concurrently: exactly one wins,
    and the surviving object is exactly that winner's payload."""
    b = backend_cls()
    t = str(tmp_path / "t")
    results: dict[int, bool] = {}
    barrier = threading.Barrier(8)

    def claim(i: int) -> None:
        barrier.wait()
        results[i] = b.claim_version(t, 5, json.dumps({"writer": i}))

    threads = [threading.Thread(target=claim, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    winners = [i for i, won in results.items() if won]
    assert len(winners) == 1
    with open(_manifest_path(t, 5)) as fh:
        assert json.load(fh) == {"writer": winners[0]}


def test_append_race_mid_publish(backend_cls, spark, tmp_path):
    b = backend_cls()
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"), backend=b)
    racer_df = spark.createDataFrame([(3,)], "k int")
    wrap = _RacerWrap(b, lambda: write_table(spark, t, racer_df, backend=b))
    v = write_table(
        spark, t, spark.createDataFrame([(2,)], "k int"), backend=wrap
    )
    assert wrap.fired and v == 3
    assert _rows(read_table(spark, t)) == [(1,), (2,), (3,)]
    assert [h["op"] for h in history(t)] == ["append"] * 3


def test_merge_race_mid_publish(backend_cls, spark, tmp_path):
    b = backend_cls()
    t = str(tmp_path / "t")
    write_table(
        spark, t,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        backend=b,
    )
    racer_df = spark.createDataFrame([(5, "e")], "k int, v string")
    wrap = _RacerWrap(b, lambda: write_table(spark, t, racer_df, backend=b))
    merge_cdc(
        spark, t, spark.createDataFrame([(2, "B")], "k int, v string"),
        ["k"], backend=wrap,
    )
    assert wrap.fired
    assert _rows(read_table(spark, t)) == [(1, "a"), (2, "B"), (5, "e")]


def test_compact_race_mid_publish(backend_cls, spark, tmp_path):
    b = backend_cls()
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"), backend=b)
    write_table(spark, t, spark.createDataFrame([(2,)], "k int"), backend=b)
    racer_df = spark.createDataFrame([(3,)], "k int")
    wrap = _RacerWrap(b, lambda: write_table(spark, t, racer_df, backend=b))
    compact(spark, t, target_partitions=1, backend=wrap)
    assert wrap.fired
    assert _rows(read_table(spark, t)) == [(1,), (2,), (3,)]
    assert read_manifest(t)["op"] == "compact"

    ow = spark.createDataFrame([(9,)], "k int")
    wrap2 = _RacerWrap(
        b, lambda: write_table(spark, t, ow, mode="overwrite", backend=b)
    )
    with pytest.raises(CommitConflict, match="overwrite"):
        compact(spark, t, target_partitions=1, backend=wrap2)
    assert _rows(read_table(spark, t)) == [(9,)]


def test_stream_commit_race_mid_publish(backend_cls, spark, tmp_path):
    b = backend_cls()
    t = str(tmp_path / "t")
    write_table(spark, t, spark.createDataFrame([(1,)], "k int"), backend=b)
    racer_df = spark.createDataFrame([(2,)], "k int")
    wrap = _RacerWrap(b, lambda: write_table(spark, t, racer_df, backend=b))
    v = commit_stream_batch(
        t, spark.createDataFrame([(10,)], "k int"), batch_id=7, backend=wrap
    )
    assert wrap.fired and v == 3
    assert _rows(read_table(spark, t)) == [(1,), (2,), (10,)]

    # racer IS a replay of the same batch_id -> this writer no-ops
    wrap2 = _RacerWrap(
        b,
        lambda: commit_stream_batch(
            t, spark.createDataFrame([(11,)], "k int"), 8, backend=b
        ),
    )
    out = commit_stream_batch(
        t, spark.createDataFrame([(12,)], "k int"), batch_id=8, backend=wrap2
    )
    assert wrap2.fired and out is None
    rows = _rows(read_table(spark, t))
    assert (11,) in rows and (12,) not in rows
