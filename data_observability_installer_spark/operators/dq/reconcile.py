"""Pipeline-validation (reconciliation) tests — SURVEY §2.5.

The reference ships 13 cross-table checks in
``demo/input_data/demo_pipeline_tests.csv`` with result expressions
like ``8256>=stage_table_order_line_count=8256`` (count equality
between stage and dim/fact tables), ``0.1937...<2`` (percent-invalid
threshold) and ``1==1`` (sum reconciliation) — emitted as TestOutcomes
by the demo at ``demo/demo/demo_helper.py:1243-1261``. These are the
reference's "2 custom test types" (README.md:209): the threshold test
and the reconciliation test.

Spark-first shape: each check is two single-row aggregates compared
scalar-wise. Each side's aggregate collapses map-side, so a
reconciliation costs one scan per side regardless of table size; the
final compare is a 1×1 cross join — no data shuffle at all.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RECONCILE_COLUMNS = ["check_name", "left_value", "right_value", "op", "status"]

_OPS = {
    "==": (lambda l, r: l == r, "="),
    ">=": (lambda l, r: l >= r, ">="),
    "<=": (lambda l, r: l <= r, "<="),
}


@dataclass(frozen=True)
class ReconcileCheck:
    name: str
    left: Column  # aggregate over the left table
    right: Column  # aggregate over the right table
    op: str = "=="  # left OP right must hold
    severity: str = "FAILED"  # result when violated


def reconcile(left_df: DataFrame, right_df: DataFrame, checks: list[ReconcileCheck]) -> DataFrame:
    """Run cross-table checks: one agg pass per side, scalar compare."""
    if not checks:
        raise ValueError("no checks")
    lrow = left_df.agg(*[c.left.cast("double").alias(f"l{i}") for i, c in enumerate(checks)])
    rrow = right_df.agg(*[c.right.cast("double").alias(f"r{i}") for i, c in enumerate(checks)])
    both = lrow.crossJoin(rrow)
    structs = []
    for i, c in enumerate(checks):
        fn, _ = _OPS[c.op]
        lv, rv = F.round(F.col(f"l{i}"), 4), F.round(F.col(f"r{i}"), 4)
        status = (
            F.when(lv.isNull() | rv.isNull(), F.lit("PASSED"))
            .when(fn(lv, rv), F.lit("PASSED"))
            .otherwise(F.lit(c.severity))
        )
        structs.append(
            F.struct(
                F.lit(c.name).alias("check_name"),
                lv.alias("left_value"),
                rv.alias("right_value"),
                F.lit(c.op).alias("op"),
                status.alias("status"),
            )
        )
    return both.select(F.explode(F.array(*structs)).alias("o")).select("o.*")


def fk_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    max_keys: int = 5000,
) -> DataFrame:
    """Referential-integrity check: child rows whose foreign key has no
    parent — the reconciliation family's per-key member (the scalar
    checks above compare totals; this one pins WHICH keys are broken).

    One row per orphaned key value with its row count, ordered by key
    and capped at ``max_keys`` distinct keys — aggregated per key, so
    output is bounded by #distinct orphan keys, never child-table rows.

    Scale: left-anti join shuffled on the key (AQE broadcasts the
    parent's distinct-key projection when small — column-pruned to the
    single pk column before the exchange); NULL FKs are excluded (SQL
    FK semantics: NULL references nothing).
    """
    orphans = child.filter(F.col(fk_col).isNotNull()).join(
        parent.select(F.col(pk_col).alias(fk_col)).distinct(),
        on=fk_col,
        how="left_anti",
    )
    return (
        orphans.groupBy(F.col(fk_col).alias("orphan_key"))
        .agg(F.count(F.lit(1)).alias("row_ct"))
        .orderBy("orphan_key")
        .limit(max_keys)  # serving-size guard; counts stay exact per key
    )


def fk_integrity_sql(
    child_sql: str, parent_sql: str, fk_col: str, pk_col: str, max_keys: int = 5000
) -> str:
    return f"""
    SELECT {fk_col} AS orphan_key, count(*) AS row_ct
    FROM {child_sql} c
    WHERE {fk_col} IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM {parent_sql} p WHERE p.{pk_col} = c.{fk_col})
    GROUP BY {fk_col} ORDER BY orphan_key LIMIT {max_keys}
    """


def join_cardinality_audit(
    parent: DataFrame,
    child: DataFrame,
    pk_col: str,
    fk_col: str,
    fanout_warn: int = 10,
) -> DataFrame:
    """Relationship-shape audit for a declared 1:N join: per-parent
    fan-out distribution plus both orphan directions, in one summary
    row. An unexpected max-fanout (duplicate keys, a bad grain change)
    is the classic silent row-explosion bug a reconciliation suite
    should catch BEFORE a downstream join does.

    Scale: child aggregates to one row per key (map-side combined)
    before any join; the parent side is a distinct-key projection. The
    joins move #distinct-keys rows, never raw child rows.
    """
    child_per_key = (
        child.filter(F.col(fk_col).isNotNull())
        .groupBy(F.col(fk_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("fanout"))
    )
    parent_keys = parent.select(F.col(pk_col).alias("k")).distinct()
    joined = parent_keys.join(child_per_key, "k", "full_outer").select(
        F.col("k"),
        F.col("fanout"),
        child_per_key["k"].isNotNull().alias("in_child"),
        parent_keys["k"].isNotNull().alias("in_parent"),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("key_ct"),
        F.sum((~F.col("in_child")).cast("long")).alias("childless_parent_ct"),
        F.sum((~F.col("in_parent")).cast("long")).alias("orphan_child_key_ct"),
        F.max("fanout").alias("max_fanout"),
        F.round(F.avg("fanout"), 4).alias("avg_fanout"),
        F.sum((F.col("fanout") > fanout_warn).cast("long")).alias("over_warn_ct"),
    )


def join_cardinality_audit_sql(
    parent_sql: str, child_sql: str, pk_col: str, fk_col: str, fanout_warn: int = 10
) -> str:
    return f"""
    WITH cpk AS (
      SELECT {fk_col} AS k, count(*) AS fanout FROM {child_sql}
      WHERE {fk_col} IS NOT NULL GROUP BY {fk_col}),
    pk AS (SELECT DISTINCT {pk_col} AS k FROM {parent_sql}),
    j AS (
      SELECT coalesce(pk.k, cpk.k) AS k, cpk.fanout,
             cpk.k IS NOT NULL AS in_child, pk.k IS NOT NULL AS in_parent
      FROM pk FULL OUTER JOIN cpk ON pk.k = cpk.k)
    SELECT CAST(count(*) AS BIGINT) AS key_ct,
           CAST(sum(CASE WHEN NOT in_child THEN 1 ELSE 0 END) AS BIGINT) AS childless_parent_ct,
           CAST(sum(CASE WHEN NOT in_parent THEN 1 ELSE 0 END) AS BIGINT) AS orphan_child_key_ct,
           max(fanout) AS max_fanout,
           round(avg(fanout), 4) AS avg_fanout,
           CAST(sum(CASE WHEN fanout > {fanout_warn} THEN 1 ELSE 0 END) AS BIGINT) AS over_warn_ct
    FROM j
    """


def reconcile_sql(
    left_sql: str,
    right_sql: str,
    checks_sql: list[tuple[str, str, str, str, str]],
) -> str:
    """DuckDB oracle: ``checks_sql`` rows are (name, left_agg_sql,
    right_agg_sql, op, severity)."""
    l_measures = ", ".join(f"({c[1]}) AS l{i}" for i, c in enumerate(checks_sql))
    r_measures = ", ".join(f"({c[2]}) AS r{i}" for i, c in enumerate(checks_sql))
    selects = []
    for i, (name, _, _, op, severity) in enumerate(checks_sql):
        sql_op = _OPS[op][1]
        selects.append(
            f"SELECT '{name}' AS check_name, round(l{i}, 4) AS left_value, "
            f"round(r{i}, 4) AS right_value, '{op}' AS op, "
            f"CASE WHEN l{i} IS NULL OR r{i} IS NULL THEN 'PASSED' "
            f"WHEN round(l{i}, 4) {sql_op} round(r{i}, 4) THEN 'PASSED' "
            f"ELSE '{severity}' END AS status FROM b"
        )
    return (
        f"WITH l AS MATERIALIZED (SELECT {l_measures} FROM {left_sql}), "
        f"r AS MATERIALIZED (SELECT {r_measures} FROM {right_sql}), "
        f"b AS (SELECT * FROM l, r) " + " UNION ALL ".join(selects)
    )
