"""Shared time-column helpers.

Spark 4 forbids direct numeric casts on TIMESTAMP_NTZ
(``CAST(ntz AS DOUBLE/BIGINT)`` -> AnalysisException), while the same
cast is legal on TIMESTAMP (LTZ). Parquet files written without a
timezone annotation (e.g. the harness ``events.parquet``, arrow type
``timestamp[us]``) load as TIMESTAMP_NTZ, so any operator that needs
epoch arithmetic must route through TIMESTAMP first. Centralised here
so the NTZ/LTZ distinction can never silently break a plan again
(round-2 regression: 5 queries failed analysis on exactly this).

The session timezone is pinned to UTC in ``session.get_spark``, making
the NTZ->LTZ cast an identity on the epoch value.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_seconds(col: Column | str) -> Column:
    """Seconds since epoch as DOUBLE, microseconds preserved.

    ``unix_timestamp`` truncates to whole seconds and would mis-order
    boundary comparisons (gap detection, SLA percentiles); the
    timestamp->double cast keeps the fractional part. Safe on both
    TIMESTAMP and TIMESTAMP_NTZ inputs.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp").cast("double")
