"""Governance scans: where does an entity live across the warehouse.

The deletion/subject-access question ("right to be forgotten": which
tables hold rows for THESE customers, and how many") is a data-catalog
capability adjacent to the reference's component catalog + dataset
components (reference demo/demo/demo_helper.py:192-206) — before a
deletion job runs, the audit enumerates the blast surface, and after
it runs, the same scan proving zero rows IS the compliance evidence.

Scale shape: the entity key set is request-sized -> broadcast to every
table scan; each table is read ONCE with a broadcast semi-join +
key rollup (no shuffle of table data), and tables union at
metadata size. Tables whose linkage is indirect (lineitem has no
customer key) are passed pre-joined through their FK path by the
caller — the operator never guesses joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_footprint(
    frames: list[tuple[str, DataFrame, str]], keys: DataFrame
) -> DataFrame:
    """Per (entity key, table): matching row count, one broadcast
    semi-join scan per table. ``frames`` is [(table_name, df,
    key_col)]; ``keys`` has one column ``entity_key``. Entities with
    zero rows in a table still appear (count 0) — absence is the
    compliance answer, so it must be a row, not a missing row."""
    k = keys.select(F.col("entity_key").cast("long").alias("entity_key")).distinct()
    parts = []
    for name, df, key_col in frames:
        counts = (
            df.select(F.col(key_col).cast("long").alias("entity_key"))
            .join(F.broadcast(k), "entity_key")
            .groupBy("entity_key")
            .agg(F.count(F.lit(1)).cast("long").alias("row_ct"))
        )
        parts.append(
            k.join(counts, "entity_key", "left").select(
                "entity_key",
                F.lit(name).alias("table_name"),
                F.coalesce("row_ct", F.lit(0)).cast("long").alias("row_ct"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("entity_key", "table_name")


def entity_footprint_sql(
    frames_sql: list[tuple[str, str, str]], keys_sql: str
) -> str:
    """DuckDB twin; ``frames_sql`` is [(table_name, relation_sql,
    key_col)], ``keys_sql`` selects one column entity_key."""
    parts = []
    for name, rel, key_col in frames_sql:
        parts.append(
            f"""
    SELECT k.entity_key, '{name}' AS table_name,
           CAST(coalesce(c.row_ct, 0) AS BIGINT) AS row_ct
    FROM ks k LEFT JOIN (
      SELECT CAST({key_col} AS BIGINT) AS entity_key, count(*) AS row_ct
      FROM {rel} JOIN ks ON CAST({key_col} AS BIGINT) = ks.entity_key
      GROUP BY 1) c ON c.entity_key = k.entity_key"""
        )
    union = "\n    UNION ALL".join(parts)
    return f"""
    WITH ks AS MATERIALIZED (
      SELECT DISTINCT CAST(entity_key AS BIGINT) AS entity_key FROM ({keys_sql}))
    {union}
    ORDER BY entity_key, table_name
    """
