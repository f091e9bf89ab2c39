"""Continuous identity resolution over a record-ingest stream.

Entity matching is a continuous-ingest workload (new customer/vendor
records arrive forever; "is this an existing entity?" must not re-pay
the full blocked self-join per refresh — round-11 verdict, Next round
#5). This sink is the streaming face of
:func:`operators.linkage.entity_match_incremental`: each micro-batch
prefix-block-joins against the txtable-backed reference store (per-
batch cost = batch x same-block store rows, with ``max_block`` as the
hot-block bound), writes its scored pairs under
``pairs_store/run_id=<batch>`` (overwrite => replay-idempotent), and
appends its normalized rows exactly-once (batch_id-stamped commit) —
the same store/witness split as the PQ near-dup and SemDeDup sinks.

Read the cumulative result with
:func:`operators.linkage.entity_match_pairs`; it is row-identical to
batch ``entity_match`` over everything ingested (parity-tested in
test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def entity_match_sink(
    stream: DataFrame,
    store: str,
    pairs_store: str,
    checkpoint: str,
    id_col: str,
    name_col: str,
    block_prefix: int = 16,
    cat_cols: list[str] | None = None,
    num_cols: list[tuple[str, int]] | None = None,
    name_weight: int = 4,
    cat_weight: int = 2,
    num_weight: int = 1,
    threshold_bp: int = 6000,
    max_block: int | None = None,
    retain: int | None = None,
    **trigger,
):
    """Start the continuous matcher (see module docstring).

    ``retain``: bound the pairs store to that many partitions — each
    over-budget batch folds the oldest surplus into one rollup
    partition (profile.retain_runs, the same crash-safe sidecar
    protocol as the profile/CM/HLL/DSIR/SemDeDup sinks). Every
    unordered pair is generated exactly once across batches, so the
    fold is a plain concat with an (id_a, id_b) dedup that only ever
    removes replay artifacts (a batch replayed AFTER a rollup absorbed
    its partition re-creates identical rows) — the folded store reads
    row-identical to the unbounded one while ``entity_match_pairs``'s
    fan-in stays bounded instead of growing one partition per
    micro-batch forever. Without it, apply retention externally.

    Returns the started StreamingQuery."""
    from ..operators.linkage import entity_match_incremental
    from ..operators.profile import retain_runs

    def fold(parts: list[DataFrame]) -> DataFrame:
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.dropDuplicates(["id_a", "id_b"])

    def commit(df: DataFrame, batch_id: int) -> None:
        pairs = entity_match_incremental(
            df.sparkSession,
            store,
            df,
            id_col=id_col,
            name_col=name_col,
            block_prefix=block_prefix,
            cat_cols=cat_cols,
            num_cols=num_cols,
            name_weight=name_weight,
            cat_weight=cat_weight,
            num_weight=num_weight,
            threshold_bp=threshold_bp,
            max_block=max_block,
            batch_id=batch_id,
        )
        pairs.coalesce(1).write.mode("overwrite").parquet(
            f"{pairs_store}/run_id={batch_id:08d}"
        )
        if retain is not None:
            retain_runs(
                df.sparkSession, pairs_store, retain,
                f"00000000_rollup_{batch_id:08d}", fold,
            )

    writer = stream.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
