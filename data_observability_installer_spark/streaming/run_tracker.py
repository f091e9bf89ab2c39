"""Custom stateful run tracker (A1/A3 streaming with absence detection).

``applyInPandasWithState`` keeps one state blob per run key and fires
on an event-time timeout, which is how the two absence-shaped analytics
work in streaming (SURVEY §4 "needs custom work" items 2-3):

- a run with no terminal status after its timeout -> STUCK alert
  (streaming late-END detection, A3);
- state for terminal runs is emitted and dropped immediately, so state
  size tracks only in-flight runs.

Per-key state is tiny (a handful of scalars); Arrow batches move whole
key groups per micro-batch.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "pipeline_key string, run_key string, start_ts timestamp, end_ts timestamp, "
    "final_status string, event_ct long"
)
STATE_SCHEMA = "start_s long, end_s long, status string, event_ct long"


def _track(key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState) -> Iterable[pd.DataFrame]:
    import datetime as dt

    if state.hasTimedOut:
        start_s, end_s, status, ct = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "pipeline_key": key[0],
                    "run_key": key[1],
                    "start_ts": dt.datetime.fromtimestamp(start_s, dt.timezone.utc).replace(tzinfo=None),
                    "end_ts": dt.datetime.fromtimestamp(end_s, dt.timezone.utc).replace(tzinfo=None),
                    "final_status": "STUCK" if status == "RUNNING" else status,
                    "event_ct": ct,
                }
            ]
        )
        return

    start_s, end_s, status, ct = state.get if state.exists else (None, None, "RUNNING", 0)
    terminal = False
    for pdf in pdfs:
        ts_s = (pdf["event_timestamp"].astype("int64") // 1_000_000_000).tolist()
        run_level = pdf["task_key"].isna().tolist()
        statuses = pdf["status"].tolist()
        for t, rl, s in zip(ts_s, run_level, statuses):
            start_s = t if start_s is None else min(start_s, t)
            end_s = t if end_s is None else max(end_s, t)
            ct += 1
            if rl and s in ("COMPLETED", "FAILED"):
                # FAILED wins over COMPLETED (set-wise fold, order-free)
                status = "FAILED" if "FAILED" in (s, status) else "COMPLETED"
                terminal = True

    if terminal:
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "pipeline_key": key[0],
                    "run_key": key[1],
                    "start_ts": pd.Timestamp(start_s, unit="s"),
                    "end_ts": pd.Timestamp(end_s, unit="s"),
                    "final_status": status,
                    "event_ct": ct,
                }
            ]
        )
    else:
        state.update((start_s, end_s, status, ct))
        # absence detection: no terminal event within 2 h of event time.
        # A heavily-backdated run (the reference replays events up to
        # 55 h old) can put end_s + 2 h AT or BELOW the current
        # watermark, which setTimeoutTimestamp rejects and would kill
        # the whole streaming query — clamp to just past the watermark
        # so the stale run times out on the next micro-batch instead.
        timeout_ms = end_s * 1000 + 2 * 3600 * 1000
        wm_ms = state.getCurrentWatermarkMs()
        if wm_ms > 0:
            timeout_ms = max(timeout_ms, wm_ms + 1)
        state.setTimeoutTimestamp(timeout_ms)


def track_runs_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """RUN_STATUS stream -> completed/failed/stuck run rows."""
    rs = (
        events.filter(events.event_type == "RUN_STATUS")
        .withWatermark("event_timestamp", watermark)
        .groupBy("pipeline_key", "run_key")
    )
    return rs.applyInPandasWithState(
        _track, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.EventTimeTimeout
    )
