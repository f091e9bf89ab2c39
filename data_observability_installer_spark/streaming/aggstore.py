"""Generic MERGEABLE AGGREGATE STORE — the streaming pre-aggregation
cube the serving-side monitors read.

Every screen in the continuous-monitoring pane consumes a small keyed
aggregate (daily counts per event type, per-run min/max/status
counters), not raw events. This sink maintains exactly that: each
micro-batch reduces to its own partial aggregate under
``run_id=<batch>`` (overwrite => replay-idempotent), and the read face
folds partials by each column's declared merge op (sum | min | max —
all associative and commutative, so the folded store is identical to
the one-shot aggregate over everything ingested, for any batch split).

Replay safety of the sum fold: a replayed micro-batch (foreachBatch is
at-least-once) can only ever be the LAST uncommitted batch, whose
partition is the store's newest — never yet absorbed by retention — so
the overwrite replaces identical rows and nothing double-counts. (The
same argument the profile/CM/HLL partial stores rely on.)

State story at 100 TB: stream state is ZERO (stateless per-batch
aggregation); store size is O(distinct keys), independent of stream
length; ``retain=`` bounds the partition count through the shared
crash-safe :func:`operators.profile.retain_runs` protocol with the
same fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FOLDS = ("sum", "min", "max")


def _fold_frame(parts: list[DataFrame], keys: list[str], folds: dict):
    from pyspark.sql import functions as F

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        *[getattr(F, op)(c).alias(c) for c, op in folds.items()]
    )


def agg_sink(
    stream: DataFrame,
    store: str,
    checkpoint: str,
    keys: list[str],
    aggs: dict,
    folds: dict[str, str],
    retain: int | None = None,
    **trigger,
):
    """Start the continuous aggregate store (see module docstring).

    ``keys``: grouping columns of the cube. ``aggs``: output column ->
    aggregate Column for the per-batch partial (e.g. ``{"v":
    F.count(F.lit(1)).cast("long")}``). ``folds``: output column ->
    merge op ('sum' | 'min' | 'max') used to combine partials at read
    time and in retention rollups — the column's aggregate must be
    mergeable under it (count/sum -> sum, min -> min, max -> max).

    Returns the started StreamingQuery."""
    from ..operators.profile import retain_runs

    bad = {c: op for c, op in folds.items() if op not in _FOLDS}
    if bad or set(folds) != set(aggs):
        raise ValueError(
            f"folds must map every agg column to one of {_FOLDS}; got "
            f"{folds} for aggs {sorted(aggs)}"
        )

    def commit(df: DataFrame, batch_id: int) -> None:
        partial = df.groupBy(*keys).agg(
            *[a.alias(c) for c, a in aggs.items()]
        )
        partial.coalesce(1).write.mode("overwrite").parquet(
            f"{store}/run_id={batch_id:08d}"
        )
        if retain is not None:
            retain_runs(
                df.sparkSession, store, retain,
                f"00000000_rollup_{batch_id:08d}",
                lambda parts: _fold_frame(parts, keys, folds),
            )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def read_agg_store(
    spark, store: str, keys: list[str], folds: dict[str, str]
) -> DataFrame:
    """Fold the stored partials into the cumulative aggregate —
    identical to the one-shot groupBy over everything ingested (the
    fold ops are associative + commutative). Pass the SAME ``keys`` /
    ``folds`` the sink used."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(store)
        .groupBy(*keys)
        .agg(*[getattr(F, op)(c).alias(c) for c, op in folds.items()])
    )
