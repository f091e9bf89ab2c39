"""Mergeable frequency-sketch operators: bounded-memory heavy hitters.

Reference parity: the TestGen surface profiles "51 data characteristics"
including dominant-value / list-of-values capture (reference
`README.md:207`; LOV baselines in `demo/input_data/data_tests.csv`).
At 100 TB the exact `collect_set` / full `groupBy` route for "which
values dominate this column" needs state proportional to the column's
cardinality; this module gives the scale-safe answer: a Misra–Gries
summary per partition (hard `capacity` cap on state, Agarwal et al.,
"Mergeable Summaries", PODS 2012) to nominate candidates, then ONE
exact counting pass restricted to those candidates via a broadcast
semi-join.

Why the answer is still EXACT (and therefore oracle-able): with
per-partition capacity ``c >= phi_denom``, any item whose global
frequency ``f >= n / phi_denom`` must have, in at least one partition
``p``, local frequency ``f_p > n_p / (c + 1)`` (else summing the
per-partition bound gives ``f <= n / (c + 1) < n / phi_denom``).
Misra–Gries retains every such item, so the candidate union is a
superset of the true heavy hitters; the second pass counts candidates
exactly and applies the threshold with pure integer arithmetic. The
sketch bounds MEMORY, never the answer.

Plan shape at 100 TB: pass 1 is map-only (no shuffle — each partition
emits <= capacity candidate rows); pass 2 is ONE scan that produces
both the exact candidate counts and the grand total: a broadcast LEFT
join marks candidate rows and the groupBy folds every non-candidate
into a single NULL group, so map-side combine bounds the shuffle at
candidate-set size + one row per task and the threshold verdict never
compares counts and totals taken from different snapshots of a
recomputed source. (Candidate NOMINATION still assumes the two passes
scan the same rows — the standard multi-pass precondition; pin a
nondeterministic input with localCheckpoint before calling.)
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def mg_summarize_partition(counts, batch_counts, capacity: int):
    """Merge exact per-batch counts into a Misra–Gries summary held as
    a pandas Series (index = item, value = lower-bound counter),
    trimming to ``capacity`` entries by the mergeable-summaries rule:
    subtract the (capacity+1)-th largest counter from every counter and
    drop the non-positive ones. Returns the new summary. Split out from
    the mapInPandas closure so unit tests can drive it directly."""
    merged = counts.add(batch_counts, fill_value=0) if counts is not None else batch_counts
    if len(merged) > capacity:
        cut = merged.nlargest(capacity + 1).iloc[-1]
        merged = merged - cut
        merged = merged[merged > 0]
    return merged


def heavy_hitters(
    items: DataFrame,
    item_col: str = "w",
    phi_denom: int = 1000,
    capacity: int | None = None,
) -> DataFrame:
    """Exact heavy hitters over ``items[item_col]`` (string): every
    item with frequency >= total/``phi_denom``, as
    ``(term, ct, share_bp)`` ordered by count. ``share_bp`` is integer
    basis points ``(ct * 10000) div total`` — floor division on int64,
    bit-identical across engines.

    ``capacity`` (default ``4 * phi_denom``) is the per-partition state
    bound; any value >= phi_denom preserves exactness (module
    docstring), larger values only reduce trim churn.
    """
    import pandas as pd

    cap = capacity if capacity is not None else 4 * phi_denom
    if cap < phi_denom:
        raise ValueError(
            f"capacity {cap} < phi_denom {phi_denom} voids the exactness guarantee"
        )
    src = items.select(F.col(item_col).alias("w")).filter(F.col("w").isNotNull())

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = None
        for pdf in batches:
            if len(pdf):
                summary = mg_summarize_partition(
                    summary, pdf["w"].value_counts(), cap
                )
        if summary is None:
            yield pd.DataFrame({"w": [], "est": []})
        else:
            yield pd.DataFrame(
                {
                    "w": list(summary.index),
                    "est": [int(v) for v in summary.to_numpy()],
                }
            )

    # the sketch is metadata-sized (<= capacity x partitions rows) —
    # checkpoint it eagerly so the map-only pass 1 runs exactly once and
    # no cache entry outlives the query (dedup's label-frame idiom)
    sketch = src.mapInPandas(summarize, "w string, est long").localCheckpoint(eager=True)
    cands = sketch.filter(F.col("w").isNotNull()).select("w").distinct()
    # Pass 2 derives BOTH the exact candidate counts AND the total from
    # ONE scan: a broadcast LEFT join marks candidate rows, the groupBy
    # folds every non-candidate into a single NULL group (map-side
    # combine keeps the shuffle candidate-sized + one row per task), and
    # the pinned result feeds the threshold and the total — so the
    # verdict never mixes two snapshots of a recomputed source. The
    # Misra–Gries NOMINATION still assumes pass 1 and pass 2 scan the
    # same rows (the standard multi-pass Spark precondition — true for
    # any deterministic frame; localCheckpoint a nondeterministic input
    # before calling).
    counts = (
        src.join(F.broadcast(cands.withColumn("_hit", F.lit(1))), "w", "left")
        .groupBy(F.when(F.col("_hit") == 1, F.col("w")).alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .localCheckpoint(eager=True)
    )
    total = counts.agg(F.sum("ct").cast("long").alias("total"))
    out = (
        counts.filter(F.col("w").isNotNull())
        .crossJoin(F.broadcast(total))
        .filter(F.col("ct") * phi_denom >= F.col("total"))
        .select(
            F.col("w").alias("term"),
            F.col("ct").cast("long").alias("ct"),
            F.expr("CAST(ct * 10000L DIV total AS BIGINT)").alias("share_bp"),
        )
        .orderBy(F.col("ct").desc(), F.col("term"))
    )
    return out


def _bigrams(df: DataFrame, text_col: str) -> DataFrame:
    """Word bigrams of ``text_col`` as a single string column ``w`` —
    JVM-side: split, slice-zip, concat; no Python in the hot path."""
    ws = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return df.select(
        F.explode(
            F.zip_with(
                F.slice(ws, 1, F.greatest(F.size(ws) - 1, F.lit(0))),
                F.slice(ws, 2, F.greatest(F.size(ws) - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("w")
    )


def heavy_hitters_bigrams(
    df: DataFrame,
    phi_denom: int = 1000,
    text_col: str = "text",
    capacity: int | None = None,
) -> DataFrame:
    """Heavy-hitter word bigrams of a document corpus — the
    boilerplate-phrase detector (repeated headers/footers/templates
    show up as bigram heavy hitters long before full-document dedup
    fires)."""
    return heavy_hitters(
        _bigrams(df, text_col), "w", phi_denom=phi_denom, capacity=capacity
    )


def heavy_hitters_bigrams_sql(table: str, phi_denom: int = 1000, text_col: str = "text") -> str:
    """DuckDB twin: exact bigram frequencies + the same integer
    threshold and floor-division share. The twin may use the full
    groupBy (the oracle runs at small SF); the Spark side's sketch
    nomination provably returns the identical set."""
    return f"""
    WITH s AS (
      SELECT regexp_split_to_array(trim(lower({text_col})), '\\s+') AS ws
      FROM {table}),
    b AS (
      SELECT ws[i] || ' ' || ws[i + 1] AS w
      FROM s, unnest(range(1, len(ws))) AS t(i)),
    f AS (SELECT w, count(*) AS ct FROM b WHERE w IS NOT NULL GROUP BY w),
    n AS (SELECT CAST(sum(ct) AS BIGINT) AS total FROM f)
    SELECT w AS term, CAST(ct AS BIGINT) AS ct,
           CAST((ct * 10000) // total AS BIGINT) AS share_bp
    FROM f, n
    WHERE ct * {phi_denom} >= total
    ORDER BY ct DESC, term
    """
