"""Weighted multi-field entity matching (record linkage).

The dedup-grade generalization of the reference's name-substring
entity search (reference `demo/demo/demo_helper.py:137-143`) and of
:func:`operators.llm.dedup.fuzzy_pairs`' single-field typo matcher: a
Fellegi–Sunter-shaped linear score over several evidence fields —
string similarity (edit distance), categorical agreement, numeric
proximity — so "same entity?" decisions rest on MORE than one noisy
key.

All similarity arithmetic is INTEGER basis points:

- string:   ``10000 - (levenshtein(a,b) * 10000) div greatest(len(a),
  len(b), 1)``
- categorical: ``10000`` on equality else ``0``
- numeric (integer-typed, e.g. cents): ``10000 - min(|a-b| * 10000
  div scale, 10000)``
- total:    ``sum(w_i * sim_i) div sum(w_i)``

Floor division end to end, so DuckDB reproduces every score
bit-for-bit — the oracle condition. NULL on either side of a field
scores 0 but keeps its weight in the denominator (missing evidence
penalizes, never helps).

Scale: candidates come from a prefix block on the name (only rows
sharing ``block_prefix`` leading chars compare), bounding comparisons
at sum(block²) like the fuzzy matcher; production blockers layer
extra keys (phonetic, length bucket) as unions of the same one-join
shape. Scoring is pure map-side Column arithmetic on the joined
candidates.

Cost floor: with bounded block sizes, candidate pairs — and therefore
scoring work — grow EXACTLY linearly with row count; linear-in-pairs
is the floor for any blocked matcher, because every emitted candidate
must be scored (sub-linear total work would mean silently dropping
candidates). The committed 8x scale point (~7.8x, SCALE_BENCH.json)
is that floor, not a super-linear step. What CAN go quadratic is a
HOT block — a prefix shared by a large fraction of rows (think
"LLC"-style boilerplate names): ``max_block`` bounds it by excluding
blocks larger than the cap from candidate generation, the same
too-generic-key rule as the shingle index's ``max_df`` — an
over-shared blocking key carries no linkage evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def entity_match(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_prefix: int = 16,
    cat_cols: list[str] | None = None,
    num_cols: list[tuple[str, int]] | None = None,
    name_weight: int = 4,
    cat_weight: int = 2,
    num_weight: int = 1,
    threshold_bp: int = 6000,
    limit: int = 200,
    max_block: int | None = None,
) -> DataFrame:
    """Score candidate pairs of ``df`` against themselves; returns
    ``(id_a, id_b, name_sim_bp, score_bp)`` for pairs at or above
    ``threshold_bp``, deterministic head of ``limit`` (ordered by
    score DESC, then ids).

    ``num_cols`` entries are ``(column, scale)`` with INTEGER-typed
    columns (quantize floats upstream with the floor(x*k+0.5) idiom)
    — the condition for bit-stable cross-engine scores.

    ``max_block`` (optional) excludes prefix blocks with more than that
    many rows from candidate generation — the hot-block skew bound (see
    module docstring). The size count groups on the same key the
    candidate join shuffles on, so the guard rides the existing
    exchange."""
    cat_cols = cat_cols or []
    num_cols = num_cols or []
    sides = {}
    for tag in ("a", "b"):
        cols = [
            F.col(id_col).alias(f"id_{tag}"),
            F.col(name_col).alias(f"name_{tag}"),
            F.substring(F.col(name_col), 1, block_prefix).alias("blk"),
        ]
        cols += [F.col(c).alias(f"{c}_{tag}") for c in cat_cols]
        cols += [F.col(c).alias(f"{c}_{tag}") for c, _ in num_cols]
        sides[tag] = df.select(*cols)
    if max_block is not None:
        keep = (
            df.groupBy(
                F.substring(F.col(name_col), 1, block_prefix).alias("blk")
            )
            .agg(F.count(F.lit(1)).alias("_blk_ct"))
            .filter(F.col("_blk_ct") <= max_block)
            .select("blk")
        )
        sides["a"] = sides["a"].join(keep, "blk")
    j = sides["a"].join(sides["b"], "blk").filter(F.col("id_a") < F.col("id_b"))

    name_sim = (
        "coalesce(10000L - CAST(levenshtein(name_a, name_b) AS BIGINT) * 10000L"
        " DIV greatest(length(name_a), length(name_b), 1L), 0L)"
    )
    terms = [f"{name_weight}L * ({name_sim})"]
    total_w = name_weight
    for c in cat_cols:
        terms.append(
            f"{cat_weight}L * coalesce(CASE WHEN {c}_a = {c}_b"
            f" THEN 10000L ELSE 0L END, 0L)"
        )
        total_w += cat_weight
    for c, scale in num_cols:
        terms.append(
            f"{num_weight}L * coalesce(10000L - least(CAST(abs({c}_a - {c}_b)"
            f" AS BIGINT) * 10000L DIV {int(scale)}L, 10000L), 0L)"
        )
        total_w += num_weight
    score = f"({' + '.join(terms)}) DIV {total_w}L"
    return (
        j.withColumn("name_sim_bp", F.expr(name_sim))
        .withColumn("score_bp", F.expr(score))
        .filter(F.col("score_bp") >= threshold_bp)
        .select("id_a", "id_b", "name_sim_bp", "score_bp")
        .orderBy(F.desc("score_bp"), "id_a", "id_b")
        .limit(limit)
    )


def entity_match_sql(
    table: str,
    id_col: str,
    name_col: str,
    block_prefix: int = 16,
    cat_cols: list[str] | None = None,
    num_cols: list[tuple[str, int]] | None = None,
    name_weight: int = 4,
    cat_weight: int = 2,
    num_weight: int = 1,
    threshold_bp: int = 6000,
    limit: int = 200,
    max_block: int | None = None,
) -> str:
    """DuckDB twin of :func:`entity_match` — the same prefix block and
    the same integer-bp arithmetic (// is DuckDB floor division)."""
    cat_cols = cat_cols or []
    num_cols = num_cols or []
    name_sim = (
        f"coalesce(10000 - CAST(levenshtein(a.{name_col}, b.{name_col}) AS BIGINT)"
        f" * 10000 // greatest(length(a.{name_col}), length(b.{name_col}), 1), 0)"
    )
    terms = [f"{name_weight} * ({name_sim})"]
    total_w = name_weight
    for c in cat_cols:
        terms.append(
            f"{cat_weight} * coalesce(CASE WHEN a.{c} = b.{c}"
            f" THEN 10000 ELSE 0 END, 0)"
        )
        total_w += cat_weight
    for c, scale in num_cols:
        terms.append(
            f"{num_weight} * coalesce(10000 - least(CAST(abs(a.{c} - b.{c})"
            f" AS BIGINT) * 10000 // {int(scale)}, 10000), 0)"
        )
        total_w += num_weight
    score = f"({' + '.join(terms)}) // {total_w}"
    blk_guard = ""
    if max_block is not None:
        blk_guard = (
            f" JOIN (SELECT substring({name_col}, 1, {block_prefix}) AS blk"
            f" FROM {table} GROUP BY 1 HAVING count(*) <= {int(max_block)}) kb"
            f" ON substring(a.{name_col}, 1, {block_prefix}) = kb.blk"
        )
    return f"""
    SELECT id_a, id_b, name_sim_bp, score_bp FROM (
      SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
             CAST({name_sim} AS BIGINT) AS name_sim_bp,
             CAST({score} AS BIGINT) AS score_bp
      FROM {table} a JOIN {table} b
        ON substring(a.{name_col}, 1, {block_prefix})
           = substring(b.{name_col}, 1, {block_prefix})
       AND a.{id_col} < b.{id_col}{blk_guard})
    WHERE score_bp >= {threshold_bp}
    ORDER BY score_bp DESC, id_a, id_b LIMIT {limit}
    """
