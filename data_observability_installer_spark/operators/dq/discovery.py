"""Dependency discovery: functional dependencies and inclusion
dependencies (FK candidates) over profiled tables.

Reference parity: TestGen's profiling/test-generation loop captures
per-column baselines and emits structural tests (reference
`README.md:207-209`; FK-style reconciliation checks in
`demo/input_data/demo_pipeline_tests.csv`). Discovery is the step
before generation — *finding* the keys and foreign keys a new dataset
actually satisfies, so the generator can emit Unique / referential
tests with evidence instead of convention.

Scale design:

- :func:`fd_check` verifies N candidate FDs ``A -> B`` over one table
  in a SINGLE input scan: ``GROUPING SETS ((A1), (A2), ...)`` fans the
  scan out to one aggregation stream per determinant (Catalyst Expand,
  map-side partial ``count(distinct)`` per group), then ONE global
  aggregate folds every pair's summary into a single row (per-pair
  conditional sums keyed on the grouping flags) which ``stack()``
  unpivots to one row per candidate. The whole check is one job with
  one FileScan — pinned by an executed-plan pytest — so adding
  candidates adds columns to the aggregate, never scans. Shuffled rows
  = sum of the determinants' cardinalities — never the row count.
- :func:`ind_check` reduces both sides of each candidate to DISTINCT
  values first (shuffle bounded by cardinality, not rows), then counts
  containment with one left join per pair; dimension-sized parents are
  broadcast by AQE. The verdict columns are pure integer arithmetic,
  bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_check(
    df: DataFrame, pairs: list[tuple[str, str]], exact: bool = True
) -> DataFrame:
    """Verify candidate functional dependencies ``det -> dep`` on
    ``df``: per pair, the number of determinant keys, how many keys map
    to more than one distinct dependent value, and the total number of
    distinct (det, dep) assignments. ``holds`` iff no key violates.

    Rows where the determinant is NULL are ignored (count-distinct
    semantics); NULL dependents never count as an assignment.

    ``exact=False`` is the 100 TB production mode: per-key distinct
    counts come from ``approx_count_distinct`` (HyperLogLog++), so
    per-group state is a fixed-size sketch instead of an exact hash
    set of every dependent value — the memory bound a hot determinant
    key needs at scale. HLL++ is EXACT below its sparse-mode
    threshold (thousands of values), and the violation predicate only
    asks "is nb > 1", so verdicts in practice match the exact mode
    (pinned by a pytest); only ``n_keypairs`` on very wide keys can
    drift within the rsd. The exact mode remains the oracle twin.
    """
    dets = sorted({a for a, _ in pairs})
    nb_agg = (
        (lambda c: F.countDistinct(c))
        if exact
        else (lambda c: F.approx_count_distinct(c, rsd=0.02))
    )
    grouped = df.groupingSets(
        [[F.col(a)] for a in dets], *[F.col(a) for a in dets]
    ).agg(
        *[F.grouping(a).alias(f"_g_{a}") for a in dets],
        *[nb_agg(F.col(b)).alias(f"_nb_{i}") for i, (_, b) in enumerate(pairs)],
    )
    # Fold every pair into ONE global aggregate over the grouped frame
    # (conditional sums gated on the pair's grouping flag), then unpivot
    # with stack(): one job, one FileScan, regardless of len(pairs).
    aggs = []
    for i, (a, _) in enumerate(pairs):
        on = (F.col(f"_g_{a}") == 0) & F.col(a).isNotNull()
        nb = F.col(f"_nb_{i}")
        aggs.extend(
            [
                # coalesce: empty input still reports 0 keys (COUNT
                # semantics, matching the SQL twin's count(*) over an
                # empty subquery); the sums stay NULL there, as in SQL.
                F.coalesce(F.sum(F.when(on, 1)), F.lit(0))
                .cast("long")
                .alias(f"_nk_{i}"),
                F.sum(F.when(on, (nb > 1).cast("long")))
                .cast("long")
                .alias(f"_nv_{i}"),
                F.sum(F.when(on, nb)).cast("long").alias(f"_np_{i}"),
            ]
        )
    summary = grouped.agg(*aggs)
    cells = ", ".join(
        f"'{a}', '{b}', _nk_{i}, _nv_{i}, _np_{i}"
        for i, (a, b) in enumerate(pairs)
    )
    out = summary.selectExpr(
        f"stack({len(pairs)}, {cells}) AS "
        "(determinant, dependent, n_keys, n_violating_keys, n_keypairs)"
    )
    return out.withColumn("holds", F.col("n_violating_keys") == 0).orderBy(
        "determinant", "dependent"
    )


def fd_check_sql(table: str, pairs: list[tuple[str, str]]) -> str:
    parts = []
    for a, b in pairs:
        parts.append(
            f"""
    SELECT '{a}' AS determinant, '{b}' AS dependent,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_keys,
           CAST(sum(nb) AS BIGINT) AS n_keypairs,
           sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (SELECT {a} AS k, count(DISTINCT {b}) AS nb
          FROM {table} WHERE {a} IS NOT NULL GROUP BY {a})"""
        )
    union = "\n    UNION ALL".join(parts)
    return f"{union}\n    ORDER BY determinant, dependent"


def ind_check(
    named_pairs: list[tuple[str, DataFrame, str, str, DataFrame, str]],
) -> DataFrame:
    """Verify candidate inclusion dependencies. Each entry is
    ``(child_name, child_df, child_col, parent_name, parent_df,
    parent_col)``; the result has one row per candidate with the
    distinct child-value count, how many are contained in the parent,
    the containment in integer basis points (floor division — exact),
    and ``holds`` iff fully contained (an FK candidate).
    """
    outs = []
    for cname, child, cc, pname, parent, pc in named_pairs:
        c = (
            child.select(F.col(cc).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
        )
        p = (
            parent.select(F.col(pc).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        outs.append(
            c.join(p, "v", "left").agg(
                F.lit(f"{cname}.{cc}").alias("child"),
                F.lit(f"{pname}.{pc}").alias("parent"),
                F.count(F.lit(1)).cast("long").alias("n_child_distinct"),
                F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_contained"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return (
        out.withColumn(
            "containment_bp",
            # empty child side: containment is vacuous — report 0 bp
            # and holds=false rather than an ANSI division-by-zero
            F.expr(
                "CAST(CASE WHEN n_child_distinct = 0 THEN 0 "
                "ELSE n_contained * 10000L DIV n_child_distinct END AS BIGINT)"
            ),
        )
        .withColumn(
            "holds",
            (F.col("n_child_distinct") > 0)
            & (F.col("n_contained") == F.col("n_child_distinct")),
        )
        .orderBy("child", "parent")
    )


def ind_check_sql(named_pairs: list[tuple[str, str, str, str]]) -> str:
    """Twin for :func:`ind_check`; entries are
    ``(child_table, child_col, parent_table, parent_col)`` (table names
    double as labels, as in the Spark path when called with loaded
    tables)."""
    parts = []
    for ct, cc, pt, pc in named_pairs:
        parts.append(
            f"""
    SELECT '{ct}.{cc}' AS child, '{pt}.{pc}' AS parent,
           CAST(count(*) AS BIGINT) AS n_child_distinct,
           CAST(coalesce(sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_contained,
           CAST(CASE WHEN count(*) = 0 THEN 0
                ELSE (coalesce(sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END), 0)
                      * 10000) // count(*) END AS BIGINT) AS containment_bp,
           count(*) > 0 AND
             coalesce(sum(CASE WHEN p.v IS NOT NULL THEN 1 ELSE 0 END), 0)
               = count(*) AS holds
    FROM (SELECT DISTINCT CAST({cc} AS VARCHAR) AS v FROM {ct}
          WHERE {cc} IS NOT NULL) c
    LEFT JOIN (SELECT DISTINCT CAST({pc} AS VARCHAR) AS v FROM {pt}
               WHERE {pc} IS NOT NULL) p USING (v)"""
        )
    union = "\n    UNION ALL".join(parts)
    return f"{union}\n    ORDER BY child, parent"
