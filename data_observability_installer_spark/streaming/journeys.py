"""Streaming journey instances with EXPLICIT START/END boundaries (A2).

The batch operator (operators/obs/journeys.py:26) windows runs into
instances from the journey's declared instance conditions
``{action: START|END, batch_pipeline}`` (reference
demo/demo/demo_helper.py:279-287, :662-677). The session-window variant
in rollups.py approximates instances by inactivity gap; this module is
the faithful streaming port of the condition semantics, as a per-journey
state machine in ``applyInPandasWithState``:

- a run-level RUNNING on a START pipeline opens an instance (closing
  any open one — batch's "next START" bound);
- a run-level COMPLETED/FAILED on an END pipeline closes the open
  instance (batch's "first END after open" bound);
- an instance left open past the event-time timeout is emitted with a
  NULL end (the batch operator's still-open row); the instance COUNTER
  survives the flush so later instances keep batch-identical ids.

Event-time correctness: rows are processed sorted by timestamp within
each micro-batch, and the watermark bounds how late a boundary may
arrive; per-journey state is two scalars, so state size is
O(active journeys) regardless of stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "journey_id string, instance_id int, instance_start timestamp, "
    "instance_end timestamp"
)
STATE_SCHEMA = "instance_ct int, open_start_us long"


def _instances(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    # timestamps carried as MICROSECONDS — flooring to whole seconds
    # would shift instance boundaries vs the batch operator's exact
    # timestamps and let sub-second boundaries compare equal
    ct, open_us = state.get if state.exists else (0, None)

    if state.hasTimedOut:
        if open_us is not None:
            yield pd.DataFrame(
                [
                    {
                        "journey_id": key[0],
                        "instance_id": ct,
                        "instance_start": pd.Timestamp(open_us, unit="us"),
                        "instance_end": pd.NaT,
                    }
                ]
            )
        # keep the counter: removing state would restart instance_id at
        # 1 after a timeout, colliding with already-emitted ids and
        # diverging from batch numbering; two ints per journey is cheap
        state.update((ct, None))
        return

    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, kind in zip(
            (pdf["ts"].astype("int64") // 1_000).tolist(), pdf["kind"].tolist()
        ):
            if kind == "START":
                if open_us is not None:
                    out.append((ct, open_us, ts))
                ct += 1
                open_us = ts
            elif open_us is not None:  # END closes only an open instance
                out.append((ct, open_us, ts))
                open_us = None
    if out:
        yield pd.DataFrame(
            [
                {
                    "journey_id": key[0],
                    "instance_id": i,
                    "instance_start": pd.Timestamp(s, unit="us"),
                    "instance_end": pd.Timestamp(e, unit="us"),
                }
                for i, s, e in out
            ]
        )
    state.update((ct, open_us))
    if open_us is not None:
        # flush a dangling open instance 24 h (event time) after it opened
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(open_us // 1000 + 24 * 3600 * 1000, wm + 1))


def journey_instance_stream(
    events: DataFrame, conditions: list[dict], watermark: str = "2 hours"
) -> DataFrame:
    """RUN_STATUS stream + instance conditions -> instance rows.

    ``conditions``: metadata-sized dicts ``{journey_id, action,
    batch_pipeline}`` — compiled driver-side into a literal CASE chain,
    so the stream filter/tagging stays JVM-side and only boundary rows
    reach the Python state function.
    """
    start_of = {c["batch_pipeline"]: c["journey_id"] for c in conditions if c["action"] == "START"}
    end_of = {c["batch_pipeline"]: c["journey_id"] for c in conditions if c["action"] == "END"}

    def lookup(mapping: dict) -> F.Column:
        expr = F.lit(None).cast("string")
        for pipe, journey in mapping.items():
            expr = F.when(F.col("pipeline_key") == pipe, F.lit(journey)).otherwise(expr)
        return expr

    run_level = F.col("task_key").isNull()
    opens = (F.col("status") == "RUNNING") & run_level
    closes = F.col("status").isin("COMPLETED", "FAILED") & run_level
    tagged = (
        events.filter(F.col("event_type") == "RUN_STATUS")
        .withColumn(
            "journey_id",
            F.when(opens, lookup(start_of)).when(closes, lookup(end_of)),
        )
        .withColumn("kind", F.when(opens, F.lit("START")).otherwise(F.lit("END")))
        .filter(F.col("journey_id").isNotNull())
        .select("journey_id", "kind", F.col("event_timestamp").alias("ts"))
        .withWatermark("ts", watermark)
    )
    return tagged.groupBy("journey_id").applyInPandasWithState(
        _instances, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


# ---------------------------------------------------------------------------
# A6 out-of-sequence, streaming (operators/obs/journeys.py:229 is the
# batch twin). The DAG closure is metadata (broadcast into the state fn
# as a driver-captured set); per-(journey, instance) state is the set of
# runs seen so far — journey-DAG-sized, never stream-sized. A violation
# pair (down.start < up.end) is emitted exactly once: when its LATER-
# ARRIVING member is processed, it is checked against every stored
# earlier arrival (and intra-batch arrivals), which covers both arrival
# orders of the pair.
# ---------------------------------------------------------------------------

OOS_OUTPUT_SCHEMA = (
    "journey_id string, instance_id int, up_key string, up_run string, "
    "down_key string, down_run string, alert_type string"
)
# parallel arrays: one entry per run seen in this instance
OOS_STATE_SCHEMA = (
    "keys array<string>, runs array<string>, starts array<long>, "
    "ends array<long>, max_end_us long"
)


def out_of_sequence_stream(
    runs: DataFrame,
    closure: list[tuple[str, str, str]],
    watermark: str = "2 hours",
    gc_after_s: int = 24 * 3600,
) -> DataFrame:
    """A6 as a per-instance state machine: ``runs`` is a streaming
    frame of instance-assigned component runs (journey_id, instance_id,
    pipeline_key, run_key, start_ts, end_ts); ``closure`` is the
    metadata-sized transitive DAG closure [(journey_id, up_key,
    down_key)]. Emits the batch operator's exact alert rows. State per
    open instance is the run list (bounded by the journey's component
    count x retries); an instance is garbage-collected ``gc_after_s``
    of event time after its newest run end, so state is
    O(active instances)."""
    edge = frozenset((j, u, d) for j, u, d in closure)

    def detect(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        keys, rks, sts, ens, max_end = (
            state.get if state.exists else ([], [], [], [], 0)
        )
        keys, rks, sts, ens = list(keys), list(rks), list(sts), list(ens)
        jid = key[0]
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["start_ts", "run_key"])
            for pk, rk, s_us, e_us in zip(
                pdf["pipeline_key"].tolist(),
                pdf["run_key"].tolist(),
                (pdf["start_ts"].astype("int64") // 1_000).tolist(),
                (pdf["end_ts"].astype("int64") // 1_000).tolist(),
            ):
                for opk, ork, os_us, oe_us in zip(keys, rks, sts, ens):
                    # stored run upstream of the new one?
                    if (jid, opk, pk) in edge and s_us < oe_us:
                        out.append((opk, ork, pk, rk))
                    # new run upstream of a stored one?
                    if (jid, pk, opk) in edge and os_us < e_us:
                        out.append((pk, rk, opk, ork))
                keys.append(pk)
                rks.append(rk)
                sts.append(s_us)
                ens.append(e_us)
                max_end = max(max_end, e_us)
        state.update((keys, rks, sts, ens, max_end))
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(
            max(max_end // 1000 + gc_after_s * 1000, wm + 1)
        )
        if out:
            yield pd.DataFrame(
                [
                    {
                        "journey_id": jid,
                        "instance_id": key[1],
                        "up_key": u,
                        "up_run": ur,
                        "down_key": d,
                        "down_run": dr,
                        "alert_type": "OUT_OF_SEQUENCE",
                    }
                    for u, ur, d, dr in out
                ]
            )

    keyed = runs.withWatermark("start_ts", watermark).select(
        "journey_id", "instance_id", "pipeline_key", "run_key",
        "start_ts", "end_ts",
    )
    return keyed.groupBy("journey_id", "instance_id").applyInPandasWithState(
        detect,
        OOS_OUTPUT_SCHEMA,
        OOS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# A2 END_PAYLOAD instance conditions, streaming (the reference's third
# condition kind, demo_helper.py:1851-1875, payload keys :1106-1116;
# batch twin operators/obs/journeys.py:payload_instances). One instance
# per (journey, payload_key): opens at the first START-pipeline run
# start carrying the key, closes at the first END_PAYLOAD-pipeline run
# end strictly after it. State is two scalars per in-flight payload
# key; a closed key's state is garbage-collected on event-time timeout.
# Batch's instance_id (a per-journey row_number over instance starts)
# is presentation-layer: computing it in the stream would serialize
# every payload key of a journey through one state partition, so the
# streaming row is identified by its natural key (journey, payload)
# and the parity test matches on that.
# ---------------------------------------------------------------------------

PAYLOAD_OUTPUT_SCHEMA = (
    "journey_id string, payload_key string, instance_start timestamp, "
    "instance_end timestamp"
)
PAYLOAD_STATE_SCHEMA = "open_start_us long, closed boolean"


def _payload_instances(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
    open_us, closed = state.get if state.exists else (None, False)

    if state.hasTimedOut:
        if open_us is not None and not closed:
            # still-open payload: flush the batch operator's NULL-end row
            yield pd.DataFrame(
                [
                    {
                        "journey_id": key[0],
                        "payload_key": key[1],
                        "instance_start": pd.Timestamp(open_us, unit="us"),
                        "instance_end": pd.NaT,
                    }
                ]
            )
            state.update((open_us, True))  # tombstone: one instance per key
            # schedule the tombstone's OWN removal — without a fresh timer
            # an opened-but-never-closed key would hold state forever
            # (EventTimeTimeout fires only when a timestamp is set)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        else:
            state.remove()  # closed + timed out: nothing left to guard
        return

    emit = None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts, kind in zip(
            (pdf["ts"].astype("int64") // 1_000).tolist(), pdf["kind"].tolist()
        ):
            if closed:
                break  # one instance per (journey, payload) — batch contract
            if kind == "OPEN":
                if open_us is None:
                    open_us = ts  # event-time order => first OPEN == min start
            elif open_us is not None and ts > open_us:
                # first END_PAYLOAD run end strictly after the open
                emit = (open_us, ts)
                closed = True
    if emit is not None:
        yield pd.DataFrame(
            [
                {
                    "journey_id": key[0],
                    "payload_key": key[1],
                    "instance_start": pd.Timestamp(emit[0], unit="us"),
                    "instance_end": pd.Timestamp(emit[1], unit="us"),
                }
            ]
        )
    state.update((open_us, closed))
    wm = state.getCurrentWatermarkMs()
    anchor = (open_us or 0) // 1000
    state.setTimeoutTimestamp(max(anchor + 24 * 3600 * 1000, wm + 1))


def payload_instance_stream(
    events: DataFrame, conditions: list[dict], watermark: str = "2 hours"
) -> DataFrame:
    """OBS_EVENT stream + END_PAYLOAD instance conditions -> one
    instance row per (journey, payload_key). ``conditions`` is
    metadata-sized ``{journey_id, action: START|END_PAYLOAD,
    batch_pipeline}`` dicts, compiled driver-side into literal CASE
    chains; ``payload_keys`` (array per event) explodes JVM-side, so
    only tagged boundary rows — run-level RUNNING on a START pipeline,
    run-level COMPLETED/FAILED on an END_PAYLOAD pipeline — reach the
    Python state function."""
    start_of = {
        c["batch_pipeline"]: c["journey_id"]
        for c in conditions
        if c["action"] == "START"
    }
    endp_of = {
        c["batch_pipeline"]: c["journey_id"]
        for c in conditions
        if c["action"] == "END_PAYLOAD"
    }

    def lookup(mapping: dict) -> F.Column:
        expr = F.lit(None).cast("string")
        for pipe, journey in mapping.items():
            expr = F.when(F.col("pipeline_key") == pipe, F.lit(journey)).otherwise(expr)
        return expr

    run_level = F.col("task_key").isNull()
    opens = (F.col("status") == "RUNNING") & run_level
    closes = F.col("status").isin("COMPLETED", "FAILED") & run_level
    tagged = (
        events.filter(
            (F.col("event_type") == "RUN_STATUS")
            & F.col("payload_keys").isNotNull()
        )
        .withColumn(
            "journey_id",
            F.when(opens, lookup(start_of)).when(closes, lookup(endp_of)),
        )
        .withColumn("kind", F.when(opens, F.lit("OPEN")).otherwise(F.lit("CLOSE")))
        .filter(F.col("journey_id").isNotNull())
        .select(
            "journey_id",
            F.explode("payload_keys").alias("payload_key"),
            "kind",
            F.col("event_timestamp").alias("ts"),
        )
        .withWatermark("ts", watermark)
    )
    return tagged.groupBy("journey_id", "payload_key").applyInPandasWithState(
        _payload_instances,
        PAYLOAD_OUTPUT_SCHEMA,
        PAYLOAD_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
