from .rollup import run_state_rollup, test_outcome_rollup, entity_search
from .journeys import journey_instances, out_of_sequence, transitive_edges
from .schedules import expected_ticks, late_runs
from .rules import evaluate_rules
from .liveness import agent_liveness
from .lineage import (
    dataset_edges,
    impact_downstream,
    io_records,
    pipeline_edges,
    transitive_closure,
)

__all__ = [
    "dataset_edges",
    "impact_downstream",
    "io_records",
    "pipeline_edges",
    "transitive_closure",
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
