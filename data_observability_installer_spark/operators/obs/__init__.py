from .rollup import run_state_rollup, test_outcome_rollup, entity_search
from .journeys import journey_instances, out_of_sequence, transitive_edges
from .schedules import expected_ticks, late_runs
from .rules import evaluate_rules
from .liveness import agent_liveness

__all__ = [
    "run_state_rollup",
    "test_outcome_rollup",
    "entity_search",
    "journey_instances",
    "out_of_sequence",
    "transitive_edges",
    "expected_ticks",
    "late_runs",
    "evaluate_rules",
    "agent_liveness",
]
