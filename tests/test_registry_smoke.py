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
    # queries() asserts _GATE_ORDER only names real registrations
    assert len(registry.queries()) == len(registry.QUERIES)


def test_gate_window_rotation():
    """The driver hard-checks only the first 50 registrations, so the
    window ROTATES: round 5 front-loads the 37 queries that never held
    a gate slot in rounds 2-4, back-filled with proven flagships as a
    regression tripwire. The window must stay exactly 50 wide (extra
    names silently fall outside the driver's check), and everything in
    it that claims an oracle twin must actually have one."""
    names = list(registry.queries())
    oracles = registry.oracle_sql()
    rows_only = {
        "profile_lineitem_approx",
        "simhash_documents",
        "topk_ivf_embeddings",
        "multimodal_features",
    }
    assert names[: len(registry._GATE_ORDER)] == registry._GATE_ORDER
    assert len(registry._GATE_ORDER) == 50
    assert [n for n in names[:50] if n not in oracles and n not in rows_only] == []


@pytest.mark.parametrize("name", _NAMES)
def test_registry_query_executes_on_parquet(spark, sf_smoke, name):
    df = registry.queries()[name](spark, sf_smoke)
    assert df.columns  # plan analyzed
    df.limit(1).collect()  # physical execution against the real files


def test_round5_rotation_covers_all_never_gated_queries():
    """The round-5 gate window MUST contain every query that has never
    appeared in a driver correctness gate (rounds 2-4 checked 100 of
    the then-137; the remaining 37 plus all round-5 additions need
    their driver-green row THIS round). Protects the rotation from
    accidental reordering before the driver runs."""
    import json
    import os

    names = list(registry.queries())
    window = set(names[:50])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for r in (1, 2, 3, 4):
        path = os.path.join(repo, f"CORRECTNESS_r0{r}.json")
        if os.path.exists(path):
            with open(path) as fh:
                seen |= set(json.load(fh))
    never = [n for n in names if n not in seen]
    missing = [n for n in never if n not in window]
    assert not missing, f"never-driver-checked queries outside the gate window: {missing}"
