"""Streaming heavy hitters: sharded Misra–Gries with hard-capped state.

The batch operator (operators/sketch.py) nominates candidates with one
map-only pass and verifies them exactly with a second — a two-pass
shape a stream cannot take. This is the one-pass face: items are
hash-sharded (``xxhash64(w) % n_shards`` — each distinct item lives in
exactly ONE shard), and each shard's keyed state is its Misra–Gries
summary, trimmed to ``capacity`` entries with the same mergeable rule
as the batch pass. Total state is therefore <= n_shards * capacity
rows FOREVER, independent of stream length or item cardinality — the
property that lets the monitor run unbounded.

Why the candidate guarantee carries over: a global heavy hitter with
frequency f >= n / phi also has f >= n_shard / phi within its shard
(n_shard <= n), and Misra–Gries with capacity c retains every item
whose shard-local frequency exceeds n_shard / (c + 1) — so any
``capacity >= phi_denom`` preserves the full candidate set, exactly as
in the batch module's proof. Streaming emits Misra–Gries LOWER-BOUND
estimates (true count is within n_shard/(c+1) above the counter);
when exactness is needed, the emitted candidates feed the batch
operator's broadcast-verify pass over at-rest data.

Each micro-batch every updated shard re-emits its summary (update
mode) tagged with the shard's running item count, so a downstream
consumer thresholds candidates against the global total by summing
``shard_n`` over the latest emission per shard.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "shard int, w string, est long, shard_n long"
STATE_SCHEMA = "items array<string>, cts array<long>, n long"


def _make_update(capacity: int):
    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        from ..operators.sketch import mg_summarize_partition

        if state.exists:
            items, cts, n = state.get
            summary = pd.Series(list(cts), index=list(items), dtype="int64")
        else:
            summary, n = None, 0
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                summary = mg_summarize_partition(
                    summary, pdf["w"].value_counts(), capacity
                )
        if summary is None:
            return
        state.update(
            (list(summary.index), [int(v) for v in summary.to_numpy()], int(n))
        )
        yield pd.DataFrame(
            {
                "shard": int(key[0]),
                "w": list(summary.index),
                "est": [int(v) for v in summary.to_numpy()],
                "shard_n": int(n),
            }
        )

    return update


def heavy_hitters_stream(
    items: DataFrame,
    item_col: str = "w",
    capacity: int = 4000,
    n_shards: int = 8,
) -> DataFrame:
    """Unbounded heavy-hitter monitor over an item stream. State is
    hard-capped at ``n_shards * capacity`` summary rows; any
    ``capacity >= phi_denom`` keeps every true phi-heavy hitter in the
    emitted candidate set (module docstring)."""
    src = (
        items.select(F.col(item_col).alias("w"))
        .filter(F.col("w").isNotNull())
        .withColumn(
            "shard", F.pmod(F.xxhash64("w"), F.lit(n_shards)).cast("int")
        )
    )
    return src.groupBy("shard").applyInPandasWithState(
        _make_update(capacity),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
