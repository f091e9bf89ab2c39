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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from ..functions.pin import pin

#: Schema of a dyadic quantile sketch frame — identical to what the
#: previous all-DataFrame construction produced (level INT from the
#: explode(sequence(...)), idx/cnt BIGINT).
_QSKETCH_SCHEMA = StructType(
    [
        StructField("level", IntegerType(), True),
        StructField("idx", LongType(), True),
        StructField("cnt", LongType(), True),
    ]
)

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


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005): a d x w counter grid
# where item x increments cell (i, h_i(x)) in each of d rows; the point
# estimate min_i grid[i][h_i(x)] NEVER undercounts and overcounts by
# <= 2N/w with probability 1 - (1/2)^d. Stored as a LONG counts table
# (row_id, bucket, ct) — metadata-sized (d*w cells), mergeable by plain
# (row_id, bucket) summation, the exact algebra a partitioned /
# multi-day ingest needs. The hash family is literal-parameter
# polynomial arithmetic over the string's character codes — pure int64
# both engines can replay, so sketch CONTENT (not just its bounds) is
# oracle-checkable, unlike library sketches with engine-native hashing
# (the same determinism choice as simhash_md5's twin).
# ---------------------------------------------------------------------------

CM_P = 1_000_000_007  # prime modulus: acc stays < 1e9, acc*131 < 2^63
#: (a, b) per sketch row for h_i(x) = ((a * poly(x) + b) mod p) mod w
CM_PARAMS = [(1_299_709, 15_485_863), (492_876_847, 715_225_739),
             (179_424_673, 32_452_843), (982_451_653, 86_028_121)]


def _cm_poly_sql(col_sql: str) -> str:
    """Spark-SQL text: polynomial rolling hash of a string's character
    codes, mod CM_P — exact int64 at every step."""
    return (
        f"aggregate(sequence(1, length({col_sql})), CAST(0 AS BIGINT), "
        f"(acc, i) -> pmod(acc * 131 + ascii(substring({col_sql}, i, 1)), {CM_P}))"
    )


def cm_sketch(
    items: DataFrame, col: str = "w", width: int = 256, depth: int = 4
) -> DataFrame:
    """Build the sketch: one pass, explode each item into its ``depth``
    (row_id, bucket) cells, ONE groupBy — shuffle bounded at d*w cells
    regardless of input size. Returns (row_id, bucket, ct)."""
    poly = _cm_poly_sql(col)
    cells = ", ".join(
        f"named_struct('row_id', {i}, 'bucket', "
        f"CAST(pmod({a}L * _poly + {b}L, {CM_P}) % {width} AS INT))"
        for i, (a, b) in enumerate(CM_PARAMS[:depth])
    )
    return (
        items.selectExpr(f"{poly} AS _poly")
        .selectExpr(f"inline(array({cells}))")
        .groupBy("row_id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
    )


def cm_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth, params):
    plain summation per cell — the associative algebra that lets every
    partition/day build its own sketch independently."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("row_id", "bucket").agg(
        F.sum("ct").cast("long").alias("ct")
    )


def cm_estimate(
    sketch: DataFrame, keys: DataFrame, col: str = "w",
    width: int = 256, depth: int = 4,
) -> DataFrame:
    """Point estimates for a key frame: compute each key's d buckets,
    join the (broadcast, d*w-sized) sketch, take min over rows. Never
    undercounts; overcount <= 2N/width w.h.p."""
    poly = _cm_poly_sql(col)
    cells = ", ".join(
        f"named_struct('row_id', {i}, 'bucket', "
        f"CAST(pmod({a}L * _poly + {b}L, {CM_P}) % {width} AS INT))"
        for i, (a, b) in enumerate(CM_PARAMS[:depth])
    )
    keyed = keys.selectExpr(col, f"{poly} AS _poly").selectExpr(
        col, f"inline(array({cells}))"
    )
    return (
        keyed.join(F.broadcast(sketch), ["row_id", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("ct"), F.lit(0))).cast("long").alias("cm_ct"))
    )


def cm_sketch_report_sql(
    table: str, text_col: str = "text", width: int = 256, depth: int = 4,
    k: int = 10,
) -> str:
    """DuckDB twin of the sketch-accuracy report (build + estimate the
    true top-k): the identical polynomial hash (list_reduce with a
    prepended 0 accumulator — DuckDB's reduce seeds from the first
    element), identical cell assignment, identical min-over-rows."""
    poly = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "generate_series(CAST(1 AS BIGINT), CAST(length(w) AS BIGINT))), "
        f"(acc, i) -> (acc * 131 + ascii(substr(w, CAST(i AS INT), 1))) % {CM_P})"
    )
    build_rows = " UNION ALL ".join(
        f"SELECT {i} AS row_id, "
        f"CAST(({a} * _poly + {b}) % {CM_P} % {width} AS INT) AS bucket FROM hp"
        for i, (a, b) in enumerate(CM_PARAMS[:depth])
    )
    key_rows = " UNION ALL ".join(
        f"SELECT w, exact_ct, {i} AS row_id, "
        f"CAST(({a} * _poly + {b}) % {CM_P} % {width} AS INT) AS bucket FROM tk"
        for i, (a, b) in enumerate(CM_PARAMS[:depth])
    )
    return f"""
    WITH t AS MATERIALIZED (
      SELECT unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    hp AS MATERIALIZED (SELECT {poly} AS _poly FROM t),
    cells AS (
      SELECT row_id, bucket, CAST(count(*) AS BIGINT) AS ct
      FROM ({build_rows}) GROUP BY row_id, bucket),
    top AS (
      SELECT w, CAST(count(*) AS BIGINT) AS exact_ct
      FROM t GROUP BY w ORDER BY exact_ct DESC, w LIMIT {k}),
    tk AS (SELECT w, exact_ct, {poly} AS _poly FROM top),
    est AS (
      SELECT kr.w, any_value(kr.exact_ct) AS exact_ct,
             CAST(min(coalesce(c.ct, 0)) AS BIGINT) AS cm_ct
      FROM ({key_rows}) kr
      LEFT JOIN cells c ON c.row_id = kr.row_id AND c.bucket = kr.bucket
      GROUP BY kr.w)
    SELECT w, exact_ct, cm_ct,
           CAST(cm_ct - exact_ct AS BIGINT) AS overcount_ct
    FROM est ORDER BY w
    """


# ---------------------------------------------------------------------------
# HyperLogLog-style distinct counter (Flajolet, Fusy, Gandouet, Meunier
# 2007): m registers, each holding the max "rank" (trailing-zero run
# + 1) of the hashes routed to it; the harmonic-mean estimator turns
# the register profile into a cardinality estimate with ~1.04/sqrt(m)
# relative error, and registers merge by plain MAX — associative,
# commutative, IDEMPOTENT, so replayed/overlapping ingests cannot
# corrupt the count (strictly stronger than Count-Min's sum algebra).
# The same literal polynomial hash family as the CM sketch makes the
# register CONTENT oracle-checkable; the rank uses trailing zeros via
# the branch-free bit_count((h & -h) - 1), identical in both engines.
# ---------------------------------------------------------------------------

HLL_M = 256          # 2^8 registers -> ~6.5% standard error
HLL_RANK_CAP = 31    # h2 < 2^30, so a run can't exceed 30; 0 maps here
HLL_IDX = (413_158_511, 87_178_291)    # register router: (a*poly+b) % p % m
HLL_RANK = (961_748_941, 472_882_027)  # rank source: (a*poly+b) % p
#: bias constant alpha_m for m = 256 (the paper's alpha_infinity form)
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def _hll_cell_exprs(col_sql: str, m: int = HLL_M) -> tuple[str, str]:
    """(register, rank) Spark-SQL texts over one shared poly hash. Both
    derive from the SQUARED poly (poly^2 mod p, still < 2^63): the
    plain affine map preserves the arithmetic progressions that
    sequential-suffix vocabularies ('tok0'..'tok999') induce in the
    poly values, which skewed the trailing-zero ranks 25% high on such
    corpora; quadratic mixing measured <= 6% across structured and
    random fixtures — inside the m=256 band."""
    a1, b1 = HLL_IDX
    a2, b2 = HLL_RANK
    sq = f"pmod(_poly * _poly, {CM_P})"
    register = f"CAST(pmod({a1}L * {sq} + {b1}L, {CM_P}) % {m} AS INT)"
    h2 = f"pmod({a2}L * {sq} + {b2}L, {CM_P})"
    rank = (
        f"CAST(CASE WHEN {h2} = 0 THEN {HLL_RANK_CAP} "
        f"ELSE bit_count((({h2}) & -({h2})) - 1) + 1 END AS INT)"
    )
    return register, rank


def hll_sketch(items: DataFrame, col: str = "w", m: int = HLL_M) -> DataFrame:
    """Build the register table (register, max_rank): one map pass +
    ONE groupBy whose shuffle is bounded at m rows regardless of input
    size. Registers never seen stay absent (they read as rank 0)."""
    poly = _cm_poly_sql(col)
    register, rank = _hll_cell_exprs(col, m)
    return (
        items.selectExpr(f"{poly} AS _poly")
        .selectExpr(f"{register} AS register", f"{rank} AS rank")
        .groupBy("register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge register tables: MAX per register — idempotent, so
    double-counted input (replays, overlapping windows) changes
    nothing, the property that makes the streaming sink's store
    trivially exactly-once."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("register").agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(sketch: DataFrame, m: int = HLL_M) -> DataFrame:
    """One-row estimate from the register table. The indicator sum
    uses 1/2^rank as exact dyadic doubles (integer shift, then one
    division), so the sum is EXACT in binary — both engines agree
    bit-for-bit; the only inexact steps are the final division and the
    small-range ln correction, absorbed by the half-up floor to an
    integer count. Small-range: the paper's linear counting when the
    raw estimate <= 2.5m and empty registers remain."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            # dynamic shift must go through expr: F.shiftleft takes a
            # literal bit count only
            F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), max_rank) AS DOUBLE)")
        ).alias("s_present"),
    )
    zeros = F.lit(m) - F.col("present")
    s = zeros.cast("double") + F.coalesce(F.col("s_present"), F.lit(0.0))
    e_raw = F.lit(HLL_ALPHA * m * m) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        zeros.cast("long").alias("v_zero"),
        F.floor(est + F.lit(0.5)).cast("long").alias("est_ct"),
    )


def hll_report_sql(
    table: str, text_col: str = "text", m: int = HLL_M
) -> str:
    """DuckDB twin of the distinct-token report (sketch + estimate +
    exact comparison): identical poly hash, identical register/rank
    arithmetic, identical dyadic indicator sum and correction branch."""
    a1, b1 = HLL_IDX
    a2, b2 = HLL_RANK
    poly = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "generate_series(CAST(1 AS BIGINT), CAST(length(w) AS BIGINT))), "
        f"(acc, i) -> (acc * 131 + ascii(substr(w, CAST(i AS INT), 1))) % {CM_P})"
    )
    sq = f"((_poly * _poly) % {CM_P})"
    h2 = f"(({a2} * {sq} + {b2}) % {CM_P})"
    return f"""
    WITH t AS MATERIALIZED (
      SELECT unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    hp AS MATERIALIZED (SELECT w, {poly} AS _poly FROM t),
    cells AS (
      SELECT CAST(({a1} * {sq} + {b1}) % {CM_P} % {m} AS INT) AS register,
             CASE WHEN {h2} = 0 THEN {HLL_RANK_CAP}
                  ELSE bit_count(({h2} & -{h2}) - 1) + 1 END AS rank
      FROM hp),
    sk AS (SELECT register, max(rank) AS max_rank FROM cells GROUP BY register),
    agg AS (
      SELECT count(*) AS present,
             sum(1.0 / (CAST(1 AS BIGINT) << max_rank)) AS s_present
      FROM sk),
    est AS (
      SELECT ({m} - present) AS v_zero,
             CASE WHEN ({HLL_ALPHA * m * m!r} /
                        (({m} - present) + coalesce(s_present, 0.0)))
                       <= {2.5 * m!r}
                   AND ({m} - present) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - present))
                  ELSE {HLL_ALPHA * m * m!r} /
                       (({m} - present) + coalesce(s_present, 0.0))
             END AS e
      FROM agg),
    exact AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS exact_ct FROM t)
    SELECT CAST(v_zero AS BIGINT) AS v_zero,
           CAST(floor(e + 0.5) AS BIGINT) AS est_ct,
           exact_ct,
           CASE WHEN exact_ct = 0 THEN CAST(0 AS BIGINT) ELSE
             CAST(floor(abs(floor(e + 0.5) - exact_ct) * 10000.0 / exact_ct)
                  AS BIGINT) END AS err_bp
    FROM est CROSS JOIN exact
    """


def hll_sketch_by(
    items: DataFrame, key_col: str, col: str = "w", m: int = HLL_M
) -> DataFrame:
    """GROUPED register tables: (key, register, max_rank) in one pass —
    shuffle bounded at m rows PER KEY (the grouped approximate-distinct
    workload: distinct users per day, distinct tokens per language).
    Same merge algebra as the global sketch: MAX per (key, register),
    so per-key sketches fold across partitions/days idempotently."""
    poly = _cm_poly_sql(col)
    register, rank = _hll_cell_exprs(col, m)
    return (
        items.selectExpr(f"{key_col} AS k", f"{poly} AS _poly")
        .selectExpr("k", f"{register} AS register", f"{rank} AS rank")
        .groupBy("k", "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_estimate_by(sketch: DataFrame, m: int = HLL_M) -> DataFrame:
    """Per-key estimates from a grouped register table — the same
    harmonic-mean + linear-counting arithmetic as :func:`hll_estimate`
    applied per key; one metadata-sized aggregation (<= m rows/key)."""
    agg = sketch.groupBy("k").agg(
        F.count(F.lit(1)).alias("present"),
        F.sum(
            F.expr("1.0 / CAST(shiftleft(CAST(1 AS BIGINT), max_rank) AS DOUBLE)")
        ).alias("s_present"),
    )
    zeros = F.lit(m) - F.col("present")
    s = zeros.cast("double") + F.coalesce(F.col("s_present"), F.lit(0.0))
    e_raw = F.lit(HLL_ALPHA * m * m) / s
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        "k",
        zeros.cast("long").alias("v_zero"),
        F.floor(est + F.lit(0.5)).cast("long").alias("est_ct"),
    )


def hll_by_report_sql(
    table: str, key_col: str, text_col: str = "text", m: int = HLL_M
) -> str:
    """DuckDB twin of the per-key distinct-token report (sketch +
    estimate + exact per key)."""
    a1, b1 = HLL_IDX
    a2, b2 = HLL_RANK
    poly = (
        "list_reduce(list_prepend(CAST(0 AS BIGINT), "
        "generate_series(CAST(1 AS BIGINT), CAST(length(w) AS BIGINT))), "
        f"(acc, i) -> (acc * 131 + ascii(substr(w, CAST(i AS INT), 1))) % {CM_P})"
    )
    sq = f"((_poly * _poly) % {CM_P})"
    h2 = f"(({a2} * {sq} + {b2}) % {CM_P})"
    return f"""
    WITH t AS MATERIALIZED (
      SELECT {key_col} AS k,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    hp AS MATERIALIZED (SELECT k, w, {poly} AS _poly FROM t),
    cells AS (
      SELECT k, CAST(({a1} * {sq} + {b1}) % {CM_P} % {m} AS INT) AS register,
             CASE WHEN {h2} = 0 THEN {HLL_RANK_CAP}
                  ELSE bit_count(({h2} & -{h2}) - 1) + 1 END AS rank
      FROM hp),
    sk AS (SELECT k, register, max(rank) AS max_rank FROM cells GROUP BY k, register),
    agg AS (
      SELECT k, count(*) AS present,
             sum(1.0 / (CAST(1 AS BIGINT) << max_rank)) AS s_present
      FROM sk GROUP BY k),
    est AS (
      SELECT k, ({m} - present) AS v_zero,
             CASE WHEN ({HLL_ALPHA * m * m!r} /
                        (({m} - present) + coalesce(s_present, 0.0)))
                       <= {2.5 * m!r}
                   AND ({m} - present) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - present))
                  ELSE {HLL_ALPHA * m * m!r} /
                       (({m} - present) + coalesce(s_present, 0.0))
             END AS e
      FROM agg),
    exact AS (SELECT k, CAST(count(DISTINCT w) AS BIGINT) AS exact_ct FROM t GROUP BY k)
    SELECT est.k AS {key_col},
           CAST(v_zero AS BIGINT) AS v_zero,
           CAST(floor(e + 0.5) AS BIGINT) AS est_ct,
           exact_ct,
           CASE WHEN exact_ct = 0 THEN CAST(0 AS BIGINT) ELSE
             CAST(floor(abs(floor(e + 0.5) - exact_ct) * 10000.0 / exact_ct)
                  AS BIGINT) END AS err_bp
    FROM est JOIN exact USING (k)
    ORDER BY est.k
    """


# ---------------------------------------------------------------------------
# Dyadic quantile sketch (q-digest family, Shrivastava et al. 2004
# "Medians and Beyond") — the MERGEABLE quantile summary completing the
# sketch suite (MG = heavy hitters, CM = point frequency, HLL =
# distinct, this = rank/quantile). Unlike the classic q-digest's
# iterative bottom-up compression (and unlike randomized KLL /
# t-digest), construction here is a CLOSED FORM over exact integer
# counts, so it is order-independent, engine-independent, and
# expressible as plain SQL — the repo's oracle contract:
#
#   bucket   = dyadic-quantized value in [0, 2^log_u)
#   kept     = every tree node whose subtree count * k > n
#   sketch   = each value's count assigned to its DEEPEST kept ancestor
#
# Kept nodes number < k per level (their counts sum to n), so the
# sketch holds <= (log_u+1) * (k-1) rows no matter the data; rank
# queries err by at most ~2 * log_u * n / k (at a query point, one
# straddling node per level, each holding <= two light child subtrees).
# Merging SUMS residuals per node: each part's values only ever sit at
# ancestors of their true leaf, a property unions preserve, so the
# merged sketch obeys the same bound with n = sum(n_i) — bound-
# preserving rather than bit-identical to a one-pass build (true of
# the published q-digest merge as well, and the honest contract for
# the streaming sink).
# ---------------------------------------------------------------------------


def _q_bucket_sql(col_sql: str, lo: int, hi: int, log_u: int) -> str:
    """Integer dyadic bucket in [0, 2^log_u): exact cross-multiplied
    quantization of [lo, hi] (values outside clamp to the edges)."""
    u = 1 << log_u
    span = hi - lo + 1
    return (
        f"CAST(greatest(0, least({u - 1}, "
        f"(CAST({col_sql} AS BIGINT) - {lo}) * {u} DIV {span})) AS BIGINT)"
    )


def qsketch(
    df: DataFrame,
    col: str,
    lo: int,
    hi: int,
    k: int = 64,
    log_u: int = 16,
) -> DataFrame:
    """Build the sketch: (level, idx, cnt) rows, level 0 = root,
    ``log_u`` = leaves. ONE pass over the data (the bucket groupBy);
    every later shuffle is bounded by the 2^log_u bucket space, never
    by the row count, and the result is <= (log_u+1)*(k-1) rows — the
    shape that lets a 100 TB column ship its quantile summary as a
    broadcast table. All arithmetic is exact int64."""
    leaves = (
        df.selectExpr(f"{_q_bucket_sql(col, lo, hi, log_u)} AS bucket")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # The leaf pass is the ONLY data-sized stage; its result is bounded
    # at 2^log_u rows (65,536 at the default) BY CONSTRUCTION, so the
    # q-digest closed form over it is metadata-sized work. Running it
    # as 5 more Spark stages (node rollup, kept filter, deepest-kept
    # join, final fold — the previous shape) cost ~6 stage round-trips
    # of pure latency per sketch; assemble it DRIVER-SIDE instead with
    # exact int64 numpy arithmetic (identical values — every step is
    # integer shifts/sums/compares) and return the <= (log_u+1)*(k-1)
    # sketch rows as a local frame. This also removes the pin() the
    # multi-consumer plan needed — there is exactly one pass now.
    import numpy as np

    rows = leaves.collect()
    spark = df.sparkSession
    if not rows:
        return spark.createDataFrame([], _QSKETCH_SCHEMA)
    b = np.fromiter((r[0] for r in rows), dtype=np.int64, count=len(rows))
    c = np.fromiter((r[1] for r in rows), dtype=np.int64, count=len(rows))
    n = int(c.sum())
    best = np.full(len(rows), -1, dtype=np.int64)
    for level in range(log_u + 1):
        idx = b >> (log_u - level)
        uniq, inv = np.unique(idx, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, c)
        # same kept rule as the SQL twin: subtree total * k > n
        row_kept = (sums * k > n)[inv]
        best = np.where(row_kept, np.int64(level), best)
    # root is always kept for k > 1 (sub == n), so best >= 0 here
    out_idx = b >> (log_u - best)
    combined = (best << np.int64(log_u + 1)) | out_idx
    uniq, inv = np.unique(combined, return_inverse=True)
    cnt = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(cnt, inv, c)
    data = [
        (int(key >> (log_u + 1)), int(key & ((1 << (log_u + 1)) - 1)), int(v))
        for key, v in zip(uniq.tolist(), cnt.tolist())
    ]
    return spark.createDataFrame(data, _QSKETCH_SCHEMA)


def qsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge by per-node residual sums. Values sit at ancestors of
    their true leaves in every part, a property unions preserve, so
    the merged sketch answers rank queries within the same error bound
    at n = sum(n_i); size is bounded by the union of kept nodes
    (re-tighten with :func:`qsketch_rethin` when parts accumulate)."""
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("level", "idx").agg(F.sum("cnt").cast("long").alias("cnt"))


def qsketch_rethin(sketch: DataFrame, k: int = 64, log_u: int = 16) -> DataFrame:
    """Re-tighten an accumulated (merged) sketch to <= (log_u+1)*(k-1)
    rows with the SAME closed form used at build time: recompute each
    node's subtree total from the residuals, keep the heavy nodes, and
    push every residual up to its deepest kept ancestor (at or above
    its own level — counts only ever move UP, so the error bound is
    preserved). Runs entirely on sketch-sized inputs."""
    rows = pin(sketch.select("level", "idx", "cnt"))  # feeds 3 consumers
    total = rows.agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n"))
    anc = rows.select(
        F.explode(F.sequence(F.lit(0), F.col("level"))).alias("alevel"),
        "level",
        "idx",
        "cnt",
    ).select(
        F.col("alevel"),
        F.expr("shiftright(idx, level - alevel)").alias("aidx"),
        "cnt",
    )
    kept = (
        anc.groupBy(F.col("alevel").alias("level"), F.col("aidx").alias("idx"))
        .agg(F.sum("cnt").alias("sub"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("sub") * k > F.col("n"))
        .select("level", "idx")
    )
    deepest = (
        rows.select(
            F.explode(F.sequence(F.lit(0), F.col("level"))).alias("alevel"),
            "level",
            "idx",
            "cnt",
        )
        .select(
            "alevel",
            F.expr("shiftright(idx, level - alevel)").alias("aidx"),
            "level",
            "idx",
            "cnt",
        )
        .join(
            kept,
            (F.col("alevel") == kept["level"]) & (F.col("aidx") == kept["idx"]),
        )
        .drop(kept["level"]).drop(kept["idx"])
        .groupBy(F.col("level").alias("olevel"), F.col("idx").alias("oidx"))
        .agg(F.max("alevel").alias("dlevel"), F.max("cnt").alias("cnt"))
    )
    return (
        deepest.select(
            F.col("dlevel").alias("level"),
            F.expr("shiftright(oidx, olevel - dlevel)").alias("idx"),
            "cnt",
        )
        .groupBy("level", "idx")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def qsketch_quantiles(
    sketch: DataFrame,
    q_bps: list[int],
    lo: int,
    hi: int,
    log_u: int = 16,
) -> DataFrame:
    """Quantile estimates from the sketch alone: for each q (basis
    points), rank r = ceil(q*n/10000), nodes scanned in increasing
    range-upper-bound order (ties: deeper/smaller ranges first — the
    canonical q-digest query order), answer = the upper value edge of
    the first node where the running count reaches r. Exact integer
    arithmetic end to end; cost is sketch-sized, not data-sized."""
    u = 1 << log_u
    span = hi - lo + 1
    # A sketch is <= (log_u+1)*(k-1) rows BY BOUND (and the build now
    # returns a local frame), so the rank scan is driver-sized work:
    # collecting it and walking the canonical q-digest order in exact
    # Python integers replaces a crossJoin+window+groupBy plan (~4
    # stages of latency per query) with one metadata collect. Same
    # arithmetic: rank rule cum*10000 >= q*n, nodes in (hib asc, level
    # desc) order, est = lo + ((hib+1)*span) DIV u - 1.
    nodes = sketch.select("level", "idx", "cnt").collect()
    spark = sketch.sparkSession
    out_schema = StructType(
        [
            StructField("q_bp", IntegerType(), True),
            StructField("n", LongType(), True),
            StructField("est", LongType(), True),
        ]
    )
    if not nodes:
        return spark.createDataFrame([], out_schema)
    n = sum(r["cnt"] for r in nodes)
    ordered = sorted(
        (
            ((r["idx"] + 1) * (1 << (log_u - r["level"])) - 1, -r["level"], r["cnt"])
            for r in nodes
        ),
    )
    data = []
    for q in sorted({int(q) for q in q_bps}):
        cum = 0
        for hib, _neg_level, cnt in ordered:
            cum += cnt
            if cum * 10000 >= q * n:
                data.append((q, n, lo + ((hib + 1) * span) // u - 1))
                break
    return spark.createDataFrame(data, out_schema)


def _qsketch_nodes_sql(
    table: str, col_sql: str, lo: int, hi: int, k: int, log_u: int
) -> str:
    """Subquery producing ONE sketch's (level, idx, cnt) rows from
    ``table`` — the build half of the twin, composable so merge-path
    oracles can union several of these before the quantile scan."""
    u = 1 << log_u
    span = hi - lo + 1
    return f"""(
    WITH src AS (
      SELECT greatest(0, least({u - 1},
               (CAST({col_sql} AS BIGINT) - {lo}) * {u} // {span})) AS bucket
      FROM {table}),
    leaves AS MATERIALIZED (
      SELECT bucket, CAST(count(*) AS BIGINT) AS c FROM src GROUP BY bucket),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM leaves),
    lv AS (SELECT unnest(generate_series(0, {log_u})) AS level),
    nodes AS (
      SELECT level, bucket >> ({log_u} - level) AS idx,
             CAST(sum(c) AS BIGINT) AS sub
      FROM leaves, lv GROUP BY 1, 2),
    kept AS (
      SELECT level, idx FROM nodes, tot WHERE sub * {k} > n),
    deepest AS (
      SELECT l.bucket, max(kp.level) AS dlevel, max(l.c) AS c
      FROM leaves l JOIN kept kp
        ON kp.idx = l.bucket >> ({log_u} - kp.level)
      GROUP BY l.bucket)
    SELECT dlevel AS level, bucket >> ({log_u} - dlevel) AS idx,
           CAST(sum(c) AS BIGINT) AS cnt
    FROM deepest GROUP BY 1, 2
    )"""


def _qsketch_quantiles_sql(
    nodes_sql: str, q_bps: list[int], lo: int, hi: int, log_u: int
) -> str:
    """Quantile scan over a (level, idx, cnt) node subquery — the query
    half of the twin (same scan order as qsketch_quantiles)."""
    u = 1 << log_u
    span = hi - lo + 1
    qs_rows = ", ".join(f"({int(q)})" for q in q_bps)
    return f"""
    WITH sk AS MATERIALIZED (SELECT * FROM {nodes_sql}),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM sk),
    ordered AS (
      SELECT (idx + 1) * (CAST(1 AS BIGINT) << ({log_u} - level)) - 1 AS hib,
             level, cnt
      FROM sk),
    cum AS (
      SELECT hib, sum(cnt) OVER (ORDER BY hib ASC, level DESC) AS cum
      FROM ordered),
    qs(q_bp) AS (VALUES {qs_rows}),
    sel AS (
      SELECT q_bp, n, min(hib) AS hib
      FROM qs, cum, tot WHERE cum * 10000 >= q_bp * n GROUP BY 1, 2)
    SELECT CAST(q_bp AS INT) AS q_bp, n,
           CAST({lo} + ((hib + 1) * {span}) // {u} - 1 AS BIGINT) AS est
    FROM sel ORDER BY q_bp
    """


def qsketch_report_sql(
    table: str,
    col_sql: str,
    lo: int,
    hi: int,
    q_bps: list[int],
    k: int = 64,
    log_u: int = 16,
) -> str:
    """DuckDB twin of qsketch + qsketch_quantiles: identical integer
    quantization, identical closed-form heavy-node keep rule, identical
    deepest-kept-ancestor assignment and query scan order — the sketch
    pipeline is value-checked end to end, not just its error bound."""
    return _qsketch_quantiles_sql(
        _qsketch_nodes_sql(table, col_sql, lo, hi, k, log_u),
        q_bps, lo, hi, log_u,
    )


def qsketch_merge_report_sql(
    part_tables: list[str],
    col_sql: str,
    lo: int,
    hi: int,
    q_bps: list[int],
    k: int = 64,
    log_u: int = 16,
) -> str:
    """DuckDB twin of the MERGE path: one sketch per part, node sums,
    then the shared quantile scan — value-checks the merge algebra
    itself, not just the one-pass build."""
    parts = " UNION ALL ".join(
        f"SELECT * FROM {_qsketch_nodes_sql(t, col_sql, lo, hi, k, log_u)}"
        for t in part_tables
    )
    merged = (
        f"(SELECT level, idx, CAST(sum(cnt) AS BIGINT) AS cnt "
        f"FROM ({parts}) GROUP BY 1, 2)"
    )
    return _qsketch_quantiles_sql(merged, q_bps, lo, hi, log_u)


def qsketch_by(
    df: DataFrame,
    key_col: str,
    col: str,
    lo: int,
    hi: int,
    k: int = 64,
    log_u: int = 16,
) -> DataFrame:
    """GROUPED quantile sketches: (k_key, level, idx, cnt) — the same
    closed form as :func:`qsketch` applied per key, with the heavy-node
    rule evaluated against EACH key's own n (a hot pipeline and a quiet
    one both get <= (log_u+1)*(k-1) rows). One pass over the data; all
    later shuffles bounded by keys x the bucket space. The per-key SLA
    percentile workload (run-duration p95 per pipeline over an
    unbounded log) at bounded state."""
    u = 1 << log_u
    leaves = (
        df.selectExpr(
            f"{key_col} AS k_key",
            f"{_q_bucket_sql(col, lo, hi, log_u)} AS bucket",
        )
        .groupBy("k_key", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # NOTE (r13 A/B): a window-based single-exchange rewrite (one
    # repartition(k_key), totals and subtree sums as window columns)
    # was measured and REVERTED — it removed ~6 exchanges of bounded
    # data but replaced hash aggregation of the 17x-exploded ancestor
    # rows with two window SORTS over them, and regressed
    # qsketch_sla_events 2.1 -> 3.1 s. The groupBy shape keeps
    # map-side partial aggregation on the exploded rows, which is the
    # scale-dominant cost; the pinned leaf pass already bounds every
    # downstream shuffle.
    #
    # A second r13 A/B — pin(leaves).repartition("k_key"), which makes
    # every downstream groupBy/join/window exchange-free because
    # hashpartitioning(k_key) satisfies all their (k_key, ...)
    # ClusteredDistributions — was ALSO measured and REVERTED
    # (qsketch_sla_events ~2.8 vs ~3.2 s median, monitor pane likewise
    # ~5% slower): with a LOW-cardinality key (5 pipelines) the
    # key-only partitioning collapses the 17x-exploded ancestor
    # aggregate from 32-way to 5-way parallelism, which costs more
    # than the removed bounded exchanges saved (guide §2.5's
    # too-few-distinct-keys trap). The composite-key exchanges below
    # are what SPREADS that work. (Note: a pre-pin repartition is lost
    # entirely — localCheckpoint under AQE reports
    # UnknownPartitioning.)
    # r14 rewrite (guide §2.4, VERDICT r13 #2): the q-digest assembly
    # used to re-explode the leaves x(log_u+1) a SECOND time and join
    # them back to the kept node set to find each leaf's deepest kept
    # ancestor. That whole pass is redundant: the kept set is closed
    # under ancestors (sub(parent) >= sub(child), so sub*k > n
    # propagates upward), which makes the deepest-kept-ancestor
    # assignment computable from the kept nodes alone —
    #
    #   cnt(X) = sub(X) - sum(sub(Y) for kept CHILDREN Y of X)
    #
    # (a leaf under a kept child has its deepest kept ancestor inside
    # that child's subtree; a leaf under no kept child bottoms out at X
    # because kept is ancestor-closed), with cnt = 0 nodes dropped
    # exactly as the old shape never emitted them. All sums are the
    # same int64 leaf counts, so values are bit-identical (parity
    # pinned in test_sketch's per-key isolation test and the oracle).
    # Plan effect: the second x(log_u+1) explode of the leaves, its
    # join against kept, and the groupBy(k_key, bucket) re-aggregation
    # are gone — the only data-sized work left is the single leaf pass
    # and ONE exploded ancestor aggregate (which keeps map-side partial
    # aggregation, the scale-dominant cost the r13 notes identified);
    # everything after it is sketch-sized. The leaves pin stays: the
    # totals/kept split below re-derives the nodes aggregate per
    # consumer (AQE exchange reuse dedupes the shuffle at runtime, but
    # the pin makes the corpus pass provably-once in the static plan
    # too, and the pinned variant A/B-measured faster — sla min-of-6
    # 2.86 vs 2.31 s against the unpinned form).
    # (pinning `nodes` instead — one bigger pin, explode provably once —
    # was A/B-measured a wash at bench scale; the leaves pin is the
    # smaller executor-storage footprint at warehouse scale, so it
    # stays. The 2-3 bounded re-aggregations of `nodes` under the
    # totals/kept consumers are sketch-assembly-sized.)
    leaves = pin(leaves)
    lvl = F.explode(F.sequence(F.lit(0), F.lit(log_u))).alias("level")
    nodes = (
        leaves.select("k_key", lvl, "bucket", "c")
        .select(
            "k_key",
            "level",
            F.expr(f"shiftright(bucket, {log_u} - level)").alias("idx"),
            "c",
        )
        .groupBy("k_key", "level", "idx")
        .agg(F.sum("c").cast("long").alias("sub"))
    )
    # the level-0 root IS the per-key total (idx = 0 for every bucket)
    totals = nodes.filter(F.col("level") == 0).select(
        "k_key", F.col("sub").alias("n")
    )
    kept = (
        nodes.join(F.broadcast(totals), "k_key")
        .filter(F.col("sub") * k > F.col("n"))
        .select("k_key", "level", "idx", "sub")
    )
    child = (
        kept.filter(F.col("level") > 0)
        .select(
            "k_key",
            (F.col("level") - 1).alias("level"),
            F.expr("shiftright(idx, 1)").alias("idx"),
            "sub",
        )
        .groupBy("k_key", "level", "idx")
        .agg(F.sum("sub").cast("long").alias("csub"))
    )
    return (
        kept.join(child, ["k_key", "level", "idx"], "left")
        .select(
            "k_key",
            "level",
            "idx",
            (F.col("sub") - F.coalesce(F.col("csub"), F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def qsketch_quantiles_by(
    sketch: DataFrame,
    q_bps: list[int],
    lo: int,
    hi: int,
    log_u: int = 16,
) -> DataFrame:
    """Per-key quantile estimates from a grouped sketch: the q-digest
    scan order (range upper bound ASC, deeper first) evaluated inside
    each key's partition — sketch-sized work per key.

    NOTE (round-13 ADVICE): the shuffle-free window claim below holds
    for sketches FRESHLY BUILT by :func:`qsketch_by` (hashpartitioned
    on k_key by its final groupBy). Stored or merged sketches read
    back from parquet carry no such partitioning — there the windows
    add one sort+shuffle of the (bounded, sketch-sized) input that the
    old groupBy+broadcast-join shape also effectively paid; values are
    identical either way, and the input is bounded at keys x
    (log_u+1)(k-1) rows, so the extra exchange is metadata-sized."""
    u = 1 << log_u
    span = hi - lo + 1
    # per-key total as a window column (not groupBy + broadcast join):
    # a sketch produced by qsketch_by is already hashpartitioned on
    # k_key, so BOTH windows and the groupBy below satisfy their
    # clustering from that one partitioning — the whole scan runs
    # shuffle-free until the final ORDER BY (identical int64 sums).
    ordered = sketch.select(
        "k_key",
        "cnt",
        F.expr(f"(idx + 1) * shiftleft(1L, {log_u} - level) - 1").alias("hib"),
        "level",
    ).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("k_key")).cast("long")
    )
    w = Window.partitionBy("k_key").orderBy(
        F.col("hib").asc(), F.col("level").desc()
    )
    cum = ordered.select(
        "k_key", "hib", "n", F.sum("cnt").over(w).alias("cum")
    )
    qs = ordered.sparkSession.createDataFrame(
        [(int(q),) for q in q_bps], "q_bp int"
    )
    return (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") * 10000 >= F.col("q_bp") * F.col("n"))
        .groupBy("k_key", "q_bp", "n")
        .agg(F.min("hib").alias("hib"))
        .select(
            "k_key",
            "q_bp",
            "n",
            F.expr(
                f"CAST({lo} + ((hib + 1) * {span}) DIV {u} - 1 AS BIGINT)"
            ).alias("est"),
        )
        .orderBy("k_key", "q_bp")
    )


def qsketch_by_report_sql(
    table_sql: str,
    key_col: str,
    col_sql: str,
    lo: int,
    hi: int,
    q_bps: list[int],
    k: int = 64,
    log_u: int = 16,
) -> str:
    """DuckDB twin of qsketch_by + qsketch_quantiles_by — the grouped
    closed form, value-checked per key."""
    u = 1 << log_u
    span = hi - lo + 1
    qs_rows = ", ".join(f"({int(q)})" for q in q_bps)
    return f"""
    WITH src AS (
      SELECT {key_col} AS k_key,
             greatest(0, least({u - 1},
               (CAST({col_sql} AS BIGINT) - {lo}) * {u} // {span})) AS bucket
      FROM {table_sql}),
    leaves AS MATERIALIZED (
      SELECT k_key, bucket, CAST(count(*) AS BIGINT) AS c
      FROM src GROUP BY 1, 2),
    tot AS (SELECT k_key, CAST(sum(c) AS BIGINT) AS n FROM leaves GROUP BY 1),
    lv AS (SELECT unnest(generate_series(0, {log_u})) AS level),
    nodes AS (
      SELECT k_key, level, bucket >> ({log_u} - level) AS idx,
             CAST(sum(c) AS BIGINT) AS sub
      FROM leaves, lv GROUP BY 1, 2, 3),
    kept AS (
      SELECT nodes.k_key, level, idx
      FROM nodes JOIN tot ON nodes.k_key = tot.k_key
      WHERE sub * {k} > n),
    deepest AS (
      SELECT l.k_key, l.bucket, max(kp.level) AS dlevel, max(l.c) AS c
      FROM leaves l JOIN kept kp
        ON kp.k_key = l.k_key
       AND kp.idx = l.bucket >> ({log_u} - kp.level)
      GROUP BY 1, 2),
    sk AS (
      SELECT k_key, dlevel AS level, bucket >> ({log_u} - dlevel) AS idx,
             CAST(sum(c) AS BIGINT) AS cnt
      FROM deepest GROUP BY 1, 2, 3),
    ordered AS (
      SELECT k_key,
             (idx + 1) * (CAST(1 AS BIGINT) << ({log_u} - level)) - 1 AS hib,
             level, cnt
      FROM sk),
    cum AS (
      SELECT k_key, hib,
             sum(cnt) OVER (PARTITION BY k_key
                            ORDER BY hib ASC, level DESC) AS cum
      FROM ordered),
    qs(q_bp) AS (VALUES {qs_rows}),
    sel AS (
      SELECT cum.k_key, q_bp, n, min(hib) AS hib
      FROM qs, cum JOIN tot ON cum.k_key = tot.k_key
      WHERE cum * 10000 >= q_bp * n GROUP BY 1, 2, 3)
    SELECT k_key, CAST(q_bp AS INT) AS q_bp, n,
           CAST({lo} + ((hib + 1) * {span}) // {u} - 1 AS BIGINT) AS est
    FROM sel ORDER BY k_key, q_bp
    """
