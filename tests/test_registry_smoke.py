"""Every registered query must analyze AND execute against the real
sf0.001 parquet.

Round-2 lesson: 5 registered queries failed at plan time on the real
testdata (TIMESTAMP_NTZ numeric casts) while their unit tests stayed
green, because those tests built in-memory fixtures whose types
differed from what the parquet actually loads as. This smoke runs each
``queries()`` entry against the files themselves, so any type drift in
the testdata breaks the suite immediately — the cheap local version of
the driver's correctness gate.
"""

from __future__ import annotations

import pytest

from data_observability_installer_spark.plans import registry

_NAMES = list(registry.queries())


def test_gate_order_names_resolve():
    assert len(registry.queries()) == len(registry.QUERIES)


def test_gate_window_is_stalest_first():
    """Round-6 policy: the 50-slot driver window holds the queries
    whose most recent driver CORRECTNESS evidence is OLDEST (never-
    checked == maximally stale), computed from the committed
    CORRECTNESS_r*.json artifacts — no hand-maintained list. This test
    re-derives the expected window independently and pins both the
    membership and the width."""
    names = list(registry.queries())
    last = registry._driver_evidence_rounds()
    reg_rank = {n: i for i, n in enumerate(registry.QUERIES)}
    expected = sorted(
        registry.QUERIES, key=lambda n: (last.get(n, 0), reg_rank[n])
    )[:50]
    assert names[:50] == expected
    # window must be exactly as stale as possible: every query outside
    # the window has evidence at least as fresh as the stalest inside
    max_in = max(last.get(n, 0) for n in names[:50])
    min_out = min(last.get(n, 0) for n in names[50:]) if names[50:] else 99
    assert max_in <= min_out


def test_gate_window_new_queries_enter_immediately():
    """A query with no driver row yet (anything registered this round)
    must hold a window slot — staleness 0 sorts first."""
    names = list(registry.queries())
    last = registry._driver_evidence_rounds()
    never = [n for n in registry.QUERIES if n not in last]
    outside = [n for n in never if n not in set(names[:50])]
    assert not outside, f"never-driver-checked queries outside window: {outside}"


@pytest.mark.parametrize("name", _NAMES)
def test_registry_query_executes_on_parquet(spark, sf_smoke, name):
    df = registry.queries()[name](spark, sf_smoke)
    assert df.columns  # plan analyzed
    df.limit(1).collect()  # physical execution against the real files


def test_gate_window_all_oracle_backed_or_known_rows_only():
    """Everything in the window that claims an oracle twin must have
    one; rows-only entries must be on the documented list."""
    names = list(registry.queries())
    oracles = registry.oracle_sql()
    rows_only = {
        "profile_lineitem_approx",  # approximate by design
        "simhash_documents",  # engine-specific xxhash64
    }
    assert [n for n in names[:50] if n not in oracles and n not in rows_only] == []


def test_cache_consumers_are_registered_queries():
    """bench.py double-times (cold/warm) exactly the shared-cache
    consumers; a renamed query must not silently fall out of the set."""
    missing = registry.CACHE_CONSUMERS - set(registry.QUERIES)
    assert not missing, f"CACHE_CONSUMERS not in registry: {sorted(missing)}"


def test_failed_correctness_rows_do_not_count_as_evidence():
    """A FAILED or errored driver row must leave a query maximally
    stale (back into the window for re-check); green oracle rows and
    rows-only 'ran with a row count' rows do count."""
    g = registry._evidence_row_green
    assert g({"rows_match": True, "schema_match": True, "hash_match": True, "err": None})
    assert g({"rows_match": True, "schema_match": True, "hash_match": None, "err": None})
    assert g({"err": "no_oracle", "spark_rows": 270})
    assert not g({"rows_match": True, "schema_match": True, "hash_match": False, "err": None})
    assert not g({"rows_match": False, "schema_match": True, "hash_match": None, "err": None})
    assert not g({"rows_match": None, "schema_match": None, "hash_match": None, "err": "AnalysisException: boom"})
    assert not g({"err": "no_oracle", "spark_rows": None})
    assert not g(None)


def test_rows_only_evidence_expires_when_oracle_lands():
    """A historical rows-only (no_oracle) CORRECTNESS row stops
    counting as evidence once the query HAS an oracle: freshness is
    measured against the check's current strength, so a newly-twinned
    query re-enters the window for its first value check."""
    row = {"err": "no_oracle", "spark_rows": 10}
    assert registry._evidence_row_green(row, has_oracle_now=False)
    assert not registry._evidence_row_green(row, has_oracle_now=True)


def test_rows_only_expiry_against_synthetic_artifacts(tmp_path):
    """Replay the full expiry cycle against SYNTHETIC CORRECTNESS
    fixtures (never live round state — a round-7 verdict finding: the
    previous version pinned a query name to a round-7 window slot and
    went red the moment the driver wrote the next artifact). Scenario:
    q gets a rows-only row in r1, gains a SQL twin before r2 (staleness
    resets to never → q must sort stalest), then gets a green oracle
    row in r2 (freshness == 2)."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q": {"err": "no_oracle", "spark_rows": 10},
                    "other": {"rows_match": True, "schema_match": True,
                              "hash_match": True, "err": None}})
    )
    # Before the twin lands: the rows-only row IS evidence.
    last = registry._driver_evidence_rounds(repo=str(tmp_path), oracles=set())
    assert last == {"q": 1, "other": 1}
    # Twin lands: the historical rows-only row stops counting; "other"
    # (always oracle-backed) keeps its green evidence.
    last = registry._driver_evidence_rounds(
        repo=str(tmp_path), oracles={"q", "other"}
    )
    assert last == {"other": 1}
    # Driver value-checks q in r2: fresh again, at the NEW strength.
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps({"q": {"rows_match": True, "schema_match": True,
                          "hash_match": True, "err": None}})
    )
    last = registry._driver_evidence_rounds(
        repo=str(tmp_path), oracles={"q", "other"}
    )
    assert last == {"q": 2, "other": 1}
    # Failed rows never count, at any strength.
    (tmp_path / "CORRECTNESS_r03.json").write_text(
        json.dumps({"other": {"rows_match": True, "schema_match": True,
                              "hash_match": False, "err": None}})
    )
    last = registry._driver_evidence_rounds(
        repo=str(tmp_path), oracles={"q", "other"}
    )
    assert last == {"q": 2, "other": 1}
