"""Similarity search over an embedding column (``array<float>``).

- **brute-force top-k** — the exactness baseline: cosine against the
  query vector computed with ``zip_with`` + ``aggregate`` (JVM-side,
  no UDF), full scan, ``ORDER BY score LIMIT k``. Spark's TakeOrdered
  keeps only k rows per partition, so the shuffle is O(k × partitions).
- **random-hyperplane LSH top-k** — the scale path: 8 fixed
  hyperplanes (seeded, embedded as literals so every engine computes
  identical buckets) give a 8-bit signature; only the query's bucket
  is scanned for exact re-ranking. At 100 TB the signature is a
  partition/cluster key — the scan prunes to ~1/256 of the data.
  (An IVF variant is the same shape with k-means centroids as the
  bucketing function.)
- **embedding near-dup pairs** — blocked self-join (label as the
  block key) + cosine threshold; the block bound keeps the pair space
  from going quadratic.

All cosines cast float→double elementwise before multiplying, so the
DuckDB oracle (``::DOUBLE[]`` + list_inner_product) matches to 1e-4.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_PLANES = 8
_DIM = 64


def lsh_planes(dim: int = _DIM, n_planes: int = N_PLANES, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes, rounded so the literal text (and thus
    every engine's arithmetic) is identical."""
    rs = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rs.uniform(-1, 1, (n_planes, dim))]


def _dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def _cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _cosine_sql(a: str, b: str) -> str:
    return (
        f"list_inner_product({a}::DOUBLE[], {b}::DOUBLE[]) / "
        f"(sqrt(list_inner_product({a}::DOUBLE[], {a}::DOUBLE[])) * "
        f"sqrt(list_inner_product({b}::DOUBLE[], {b}::DOUBLE[])))"
    )


def topk_bruteforce(
    embeddings: DataFrame, k: int = 10, query_id: int = 0, id_col: str = "vec_id"
) -> DataFrame:
    """Exact cosine top-k against the stored vector ``query_id``
    (excluded from results)."""
    q = embeddings.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(id_col, F.round(_cosine(F.col("embedding"), F.col("q_emb")), 4).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_bruteforce_sql(table: str, k: int = 10, query_id: int = 0, id_col: str = "vec_id") -> str:
    cos = _cosine_sql("e.embedding", "q.q_emb")
    return f"""
    WITH q AS (SELECT embedding AS q_emb FROM {table} WHERE {id_col} = {query_id})
    SELECT e.{id_col}, round({cos}, 4) AS score
    FROM {table} e, q WHERE e.{id_col} <> {query_id}
    ORDER BY score DESC, e.{id_col} LIMIT {k}
    """


def _bucket_expr(emb: Column, planes: list[list[float]]) -> Column:
    bits = [
        F.when(_dot(emb, F.array(*[F.lit(v) for v in plane])) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def _bucket_sql(emb: str, planes: list[list[float]]) -> str:
    bits = [
        f"(CASE WHEN list_inner_product({emb}::DOUBLE[], "
        f"[{', '.join(repr(v) for v in plane)}]::DOUBLE[]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes
    ]
    return " || ".join(bits)


def topk_lsh(
    embeddings: DataFrame, k: int = 10, query_id: int = 0, id_col: str = "vec_id"
) -> DataFrame:
    """ANN top-k: scan only the query's hyperplane bucket, re-rank
    exactly. Recall < 1 by design; the bruteforce twin is the oracle
    for what the bucket DID return."""
    planes = lsh_planes()
    withb = embeddings.withColumn("bucket", _bucket_expr(F.col("embedding"), planes))
    q = withb.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    return (
        withb.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("q_bucket"))
        .select(id_col, F.round(_cosine(F.col("embedding"), F.col("q_emb")), 4).alias("score"))
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_lsh_sql(table: str, k: int = 10, query_id: int = 0, id_col: str = "vec_id") -> str:
    planes = lsh_planes()
    bucket = _bucket_sql("embedding", planes)
    cos = _cosine_sql("e.embedding", "q.q_emb")
    return f"""
    WITH b AS MATERIALIZED (SELECT {id_col}, embedding, {bucket} AS bucket FROM {table}),
    q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM b WHERE {id_col} = {query_id})
    SELECT e.{id_col}, round({cos}, 4) AS score
    FROM b e, q WHERE e.{id_col} <> {query_id} AND e.bucket = q.q_bucket
    ORDER BY score DESC, e.{id_col} LIMIT {k}
    """


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    block_col: str = "label",
    id_cap: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: block on ``block_col`` (pairs only
    form inside a block), cosine ≥ threshold. ``id_cap`` bounds the
    pair space for small-scale oracle runs."""
    e = embeddings if id_cap is None else embeddings.filter(F.col(id_col) < id_cap)
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(_cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dups_sql(
    table: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    block_col: str = "label",
    id_cap: int | None = None,
) -> str:
    cap = f"WHERE {id_col} < {id_cap}" if id_cap is not None else ""
    cos = _cosine_sql("a.embedding", "b.embedding")
    return f"""
    WITH e AS MATERIALIZED (SELECT * FROM {table} {cap})
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, round({cos}, 4) AS cosine
    FROM e a JOIN e b ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
    WHERE round({cos}, 4) >= {threshold}
    """
