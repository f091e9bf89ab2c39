"""Streaming A3: late-START / late-END detection — alerting on the
ABSENCE of an expected event.

The batch shape (operators/obs/schedules.py) anti-joins a broadcast
tick table against run starts/ends. Streaming can't anti-join the
future: "nothing arrived by tick+margin" is only decidable once event
time has passed the deadline, which is exactly what an event-time timer
gives us. ``applyInPandasWithState`` keeps per-pipeline state:

- every satisfying run-level event (RUNNING for the START expectation,
  a terminal COMPLETED/FAILED for the END expectation,
  demo_helper.py:653-659 / :1067-1073 declares both) marks the cron
  ticks it satisfies (any tick T with T <= ts <= T+margin);
- each invocation (data OR timeout) *decides* every tick whose
  deadline ``tick + margin`` is behind the current watermark: decided
  ticks with no satisfying event are emitted as LATE_START/LATE_END
  alerts;
- the timer is re-armed at the next undecided tick's deadline, so a
  pipeline that goes silent still gets its alerts on time.

State per pipeline is O(undecided ticks) — bounded by the watermark
horizon, not stream length. The tick grammar is the reference's cron
schedule (demo_helper.py:653-659), including its IANA ``timezone``
field; expansion uses the same driver-side ``Cron`` as the batch
operator, evaluated inside the state function (the cron spec ships to
executors as a tiny closure, not a join).
"""

from __future__ import annotations

import datetime as dt
from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.cron import Cron

OUTPUT_SCHEMA = "pipeline_key string, tick_ts timestamp, alert_type string"
# decided_to_s: every tick with deadline <= this has been emitted/cleared
# satisfied: undecided tick epochs that saw a timely event
STATE_SCHEMA = "decided_to_s long, satisfied array<long>"

_EPOCH = dt.datetime(1970, 1, 1)


def _ts(epoch_s: int) -> pd.Timestamp:
    return pd.Timestamp(epoch_s, unit="s")


def _expectation_stream(
    events: DataFrame,
    schedules: dict[str, tuple],
    alert_type: str,
    satisfies: Callable[[pd.DataFrame], pd.DataFrame],
    watermark: str,
    horizon_days: int,
) -> DataFrame:
    """Shared A3 absence-detection state machine; ``satisfies`` picks
    the run-level rows that discharge a tick (start vs end events —
    the only difference between the two expectations)."""
    crons = {
        k: (Cron(s[0]), int(s[1]), s[2] if len(s) > 2 else None)
        for k, s in schedules.items()
    }

    def _detect(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        pipeline = key[0]
        sched = crons.get(pipeline)
        if sched is None:
            for _ in pdfs:  # drain; no state, no timers
                pass
            return
        cron, margin, tz = sched

        decided_to_s, satisfied = (
            state.get if state.exists else (None, [])
        )
        satisfied = set(satisfied or [])

        min_event_s = None
        if not state.hasTimedOut:
            for pdf in pdfs:
                hits = satisfies(pdf[pdf["task_key"].isna()])
                for ts in hits["event_timestamp"]:
                    ts_s = int(pd.Timestamp(ts).value // 1_000_000_000)
                    min_event_s = ts_s if min_event_s is None else min(min_event_s, ts_s)
                    # ticks this event satisfies: T <= ts <= T + margin
                    for tick in cron.ticks(
                        _EPOCH + dt.timedelta(seconds=ts_s - margin),
                        _EPOCH + dt.timedelta(seconds=ts_s + 60),
                        tz=tz,
                    ):
                        tick_s = int((tick - _EPOCH).total_seconds())
                        if tick_s <= ts_s <= tick_s + margin:
                            satisfied.add(tick_s)

        wm_s = state.getCurrentWatermarkMs() // 1000
        if decided_to_s is None:
            # first sight of this pipeline: decide nothing before its
            # first event/watermark (bounded by the horizon backstop)
            base = min_event_s if min_event_s is not None else wm_s
            decided_to_s = max(0, base - 1) if base else 0
            decided_to_s = max(decided_to_s, wm_s - horizon_days * 86400)

        rows = []
        if wm_s > 0:
            # decide every tick whose deadline is now behind the watermark
            for tick in cron.ticks(
                _EPOCH + dt.timedelta(seconds=decided_to_s + 1 - margin),
                _EPOCH + dt.timedelta(seconds=wm_s),
                tz=tz,
            ):
                tick_s = int((tick - _EPOCH).total_seconds())
                deadline = tick_s + margin
                if deadline <= decided_to_s or deadline > wm_s:
                    continue
                if tick_s not in satisfied:
                    rows.append(
                        {
                            "pipeline_key": pipeline,
                            "tick_ts": _ts(tick_s),
                            "alert_type": alert_type,
                        }
                    )
                satisfied.discard(tick_s)
                decided_to_s = max(decided_to_s, deadline)

        state.update((decided_to_s, sorted(satisfied)))
        # re-arm: next undecided tick's deadline (clamped past watermark
        # — a deadline at/below the watermark would be rejected)
        nxt = cron.ticks(
            _EPOCH + dt.timedelta(seconds=max(decided_to_s + 1 - margin, 0)),
            _EPOCH + dt.timedelta(seconds=max(decided_to_s, wm_s) + horizon_days * 86400),
            tz=tz,
        )
        if nxt:
            deadline_ms = (int((nxt[0] - _EPOCH).total_seconds()) + margin) * 1000
            state.setTimeoutTimestamp(max(deadline_ms, (wm_s * 1000) + 1))
        if rows:
            yield pd.DataFrame(rows)

    rs = (
        events.filter(F.col("event_type") == "RUN_STATUS")
        .withWatermark("event_timestamp", watermark)
        .groupBy("pipeline_key")
    )
    return rs.applyInPandasWithState(
        _detect, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )


def late_start_stream(
    events: DataFrame,
    schedules: dict[str, tuple],
    watermark: str = "2 hours",
    horizon_days: int = 7,
) -> DataFrame:
    """RUN_STATUS stream -> LATE_START alert rows
    (BATCH_PIPELINE_START_TIME expectation).

    ``schedules`` maps pipeline_key -> (cron expr, margin seconds) or
    (cron expr, margin seconds, IANA timezone). Pipelines without a
    schedule pass through stateless (no state is ever allocated for
    them). ``horizon_days`` bounds how far back the first watermark can
    reach for tick enumeration.
    """
    return _expectation_stream(
        events,
        schedules,
        "LATE_START",
        lambda pdf: pdf[pdf["status"] == "RUNNING"],
        watermark,
        horizon_days,
    )


def late_end_stream(
    events: DataFrame,
    schedules: dict[str, tuple],
    watermark: str = "2 hours",
    horizon_days: int = 7,
) -> DataFrame:
    """RUN_STATUS stream -> LATE_END alert rows
    (BATCH_PIPELINE_END_TIME expectation, the reference's second
    schedule kind — demo_helper.py:1067-1073 posts ``0 22 * * *`` END
    expectations): a tick is satisfied by a run-level TERMINAL status
    (COMPLETED/FAILED — failure is still an arrival; missing the
    deadline entirely is what LATE_END flags) inside [tick,
    tick+margin]. Same timer state machine as :func:`late_start_stream`
    with end events discharging ticks, mirroring the batch operator's
    ``expectation`` column switch (operators/obs/schedules.py).
    """
    return _expectation_stream(
        events,
        schedules,
        "LATE_END",
        lambda pdf: pdf[pdf["status"].isin(["COMPLETED", "FAILED"])],
        watermark,
        horizon_days,
    )
