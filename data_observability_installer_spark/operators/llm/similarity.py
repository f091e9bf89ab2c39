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

import math

import numpy as np
from pyspark.errors import AnalysisException
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ...functions.pin import pin

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


def _lit_arr_sql(values: list[float]) -> str:
    """Spark-SQL text for a literal double array. repr() is Python's
    shortest round-trip decimal and Catalyst's decimal->double cast is
    nearest-double, so the parsed values are bit-identical to
    ``F.array(*[F.lit(v) ...])`` — but ONE parser call instead of one
    py4j round trip per element (64-d planes/centroids were costing
    ~1-2 ms x hundreds of literals of pure driver time per query
    build; this was the round-4 ANN bench regression)."""
    return "array(" + ", ".join(f"CAST({repr(v)} AS DOUBLE)" for v in values) + ")"


def _dot_lits_sql(emb_sql: str, values: list[float]) -> str:
    """Spark-SQL text for dot(<emb col>, <literal array>) with the
    exact fold `_dot` uses (sequential acc + x*y left-to-right)."""
    return (
        f"aggregate(zip_with({emb_sql}, {_lit_arr_sql(values)}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


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
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_nrm"),
    )
    return (
        embeddings.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            # query norm comes from the broadcast row — each corpus row
            # pays 2 array-dots, not 3
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_bruteforce_sql(table: str, k: int = 10, query_id: int = 0, id_col: str = "vec_id") -> str:
    cos = _cosine_sql("e.embedding", "q.q_emb")
    return f"""
    WITH q AS (SELECT embedding AS q_emb FROM {table} WHERE {id_col} = {query_id})
    SELECT e.{id_col}, floor(({cos}) * 10000 + 0.5) / 10000 AS score
    FROM {table} e, q WHERE e.{id_col} <> {query_id}
    ORDER BY score DESC, e.{id_col} LIMIT {k}
    """


def _bucket_expr(emb_sql: str, planes: list[list[float]]) -> Column:
    """Integer hyperplane signature: bit i set iff dot(emb, plane_i) >= 0.
    Takes the embedding column's SQL name and builds ONE parsed
    expression — see `_lit_arr_sql` for why not per-literal Columns."""
    bits = [
        F.expr(
            f"CASE WHEN {_dot_lits_sql(emb_sql, plane)} >= 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
        for i, plane in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def _bucket_sql(emb: str, planes: list[list[float]]) -> str:
    bits = [
        f"(CASE WHEN list_inner_product({emb}::DOUBLE[], "
        f"[{', '.join(repr(v) for v in plane)}]::DOUBLE[]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, plane in enumerate(planes)
    ]
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def topk_lsh(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    id_col: str = "vec_id",
    max_hamming: int = 2,
) -> DataFrame:
    """ANN top-k via multi-probe hyperplane LSH: scan every bucket
    within Hamming distance ``max_hamming`` of the query's signature,
    re-rank exactly.

    A single-bucket probe (max_hamming=0) scans ~1/2^planes of the data
    but has poor recall — measured 0.0 recall@10 on the 64-d test
    corpus, because a true neighbor crossing ONE of 8 hyperplanes lands
    in a different bucket. The Hamming ball fixes that: r=2 scans
    (1+8+28)/256 ≈ 14% of rows and lifts recall@10 to ~0.8-1.0 (see
    tests/test_llm.py recall assertions).

    The probe set is enumerated driver-side (metadata: ≤2^planes ids)
    and pushed as ``bucket IN (...)`` — at warehouse scale ``bucket``
    is the table's partition/cluster key, so the probe prunes files and
    the scan touches only the ball's partitions.

    One Spark job total (plus the one-row query fetch, which rides the
    ``id = query_id`` parquet pushdown). The query's signature and norm
    are computed DRIVER-side from the fetched row with the exact
    sequential fold the Spark/DuckDB expressions use (``acc + x*y``
    left-to-right — ``F.aggregate``'s own order), so the arithmetic is
    bit-identical to an in-engine computation; the earlier version ran
    a second full-expression Spark job for the signature and a third
    broadcast scan for the query vector, ~1.4 s of constant overhead
    at any scale (the round-4 bench regression).
    """
    planes = lsh_planes()
    n_planes = len(planes)
    q_row = embeddings.filter(F.col(id_col) == query_id).select("embedding").head()
    if q_row is None:
        # missing query id (e.g. an empty refresh): empty result, same
        # as the SQL twin's empty `q` CTE — a monitor must not crash on
        # a table that has no rows yet
        return embeddings.select(
            F.col(id_col), F.lit(None).cast("double").alias("score")
        ).limit(0)
    q = [float(x) for x in q_row["embedding"]]

    def _fold_dot(xs: list[float], ys: list[float]) -> float:
        acc = 0.0
        for x, y in zip(xs, ys):
            acc = acc + x * y
        return acc

    q_bucket = sum(1 << i for i, p in enumerate(planes) if _fold_dot(q, p) >= 0)
    # math.sqrt is IEEE-754 correctly rounded (what Spark's F.sqrt and
    # DuckDB's sqrt() compute); `** 0.5` goes through libm pow, which
    # is NOT guaranteed correctly rounded and can differ by an ulp
    q_nrm = math.sqrt(_fold_dot(q, q))
    ball = [
        b for b in range(1 << n_planes) if bin(b ^ q_bucket).count("1") <= max_hamming
    ]
    q_emb = F.expr(_lit_arr_sql(q))
    withb = embeddings.withColumn("bucket", _bucket_expr("embedding", planes))
    return (
        withb.filter(F.col("bucket").isin(ball) & (F.col(id_col) != query_id))
        .select(
            id_col,
            # 2 dots per surviving row (query norm is a literal); the
            # floor(x*1e4+0.5)/1e4 idiom (same as knn_graph) because
            # the cosine is an arbitrary computed double — round(x,4)
            # rounds the decimal repr on Spark but the binary value on
            # DuckDB and can flip the last digit at a half-ulp boundary
            (
                F.floor(
                    _dot(F.col("embedding"), q_emb)
                    / (
                        F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
                        * F.lit(q_nrm)
                    )
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_lsh_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    id_col: str = "vec_id",
    max_hamming: int = 2,
) -> str:
    planes = lsh_planes()
    bucket = _bucket_sql("embedding", planes)
    cos = _cosine_sql("e.embedding", "q.q_emb")
    return f"""
    WITH b AS MATERIALIZED (SELECT {id_col}, embedding, {bucket} AS bucket FROM {table}),
    q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM b WHERE {id_col} = {query_id})
    SELECT e.{id_col}, floor(({cos}) * 10000 + 0.5) / 10000 AS score
    FROM b e, q
    WHERE e.{id_col} <> {query_id}
      AND bit_count(xor(e.bucket, q.q_bucket)) <= {max_hamming}
    ORDER BY score DESC, e.{id_col} LIMIT {k}
    """


def ivf_index(
    embeddings: DataFrame, n_clusters: int = 16, seed: int = 42, id_col: str = "vec_id"
) -> tuple[DataFrame, list[list[float]]]:
    """IVF bucketing: k-means centroids (pyspark.ml, executor-parallel
    Lloyd iterations) as the partition function. Returns (assignments
    with a ``bucket`` column, centroid list). At 100 TB the bucket id
    is the table's cluster/partition key, so a probe scans only its
    buckets' files. (:func:`topk_ivf` now trains through the
    cross-engine-deterministic :func:`train_ivf_kmeans` instead; this
    pyspark.ml path remains for callers who want Spark-ML-native
    training and don't need an engine-independent result.)"""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(
        k=n_clusters, seed=seed, featuresCol="features", predictionCol="bucket"
    ).fit(feat)
    assigned = model.transform(feat).drop("features")
    return assigned, [list(map(float, ctr)) for ctr in model.clusterCenters()]


# Quantization scale for the deterministic k-means: 1e6 keeps every
# intermediate in exact int64 (|x| <= ~2 per component -> per-dim
# squared diff <= 1.6e13, x 64 dims x 16-way tie-encode ~ 1.6e16,
# far inside int64) while 1e-6 component precision is sub-noise for
# clustering unit-scale embeddings.
IVF_SCALE = 1_000_000


def _quant_sql(emb_sql: str) -> str:
    """Engine-portable embedding quantizer: floor(x*scale + 0.5) (the
    documented bit-stable idiom — round() to integer can differ between
    Spark's shortest-decimal and DuckDB's binary rounding at half-ulp
    boundaries), as Spark-SQL text."""
    return (
        f"transform({emb_sql}, x -> "
        f"CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT))"
    )


def _int_arr_sql(values: list[int]) -> str:
    return "array(" + ", ".join(f"{v}L" for v in values) + ")"


def _sqdist_lits_sql(eq_sql: str, cq: list[int]) -> str:
    """Spark-SQL text: exact integer squared distance between a
    quantized embedding column and a literal integer centroid."""
    return (
        f"aggregate(zip_with({eq_sql}, {_int_arr_sql(cq)}, "
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


_ARGMIN_UNROLL_MAX = 24


def _argmin_bucket_sql(eq_sql: str, cents: dict[int, list[int]], n_enc: int) -> str:
    """Assignment as ONE parsed expression: the encoded argmin
    min(dist*n_enc + bucket) — pure int64 arithmetic, so the argmin
    (ties to the LOWEST bucket id) is identical on every engine, no
    floats anywhere. Two value-identical forms by K:

    - K <= _ARGMIN_UNROLL_MAX: fully unrolled least() over per-centroid
      squared distances — stays inside whole-stage codegen, the fastest
      shape for the oracle-checked small-K operators;
    - larger K: centroids become ONE constant-folded array-of-arrays
      literal and the scan is aggregate(zip_with(...)) — expression
      size is O(1) in K, because the unrolled form grows O(K*dim) and
      falls off the JIT's 64 KB method cliff around K~50-64 (measured:
      semdedup_trained 7.7 s -> 178 s between K=45 and K=64 on
      identical data; the array form removes the cliff)."""
    items = sorted(cents.items())
    if len(items) <= _ARGMIN_UNROLL_MAX:
        terms = [
            f"({_sqdist_lits_sql(eq_sql, cq)} * {n_enc} + {b})"
            for b, cq in items
        ]
        inner = terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
        return f"CAST(pmod({inner}, {n_enc}) AS INT)"
    ids = ", ".join(str(b) for b, _ in items)
    rows = ", ".join(
        "array(" + ", ".join(f"{v}L" for v in cq) + ")" for _, cq in items
    )
    # min over encoded values with strict <: ties keep the first-seen
    # (ids are sorted ascending), exactly the least() tie rule
    return (
        "CAST(pmod(aggregate("
        f"zip_with(array({ids}), array({rows}), (b, c) -> "
        f"aggregate(zip_with({eq_sql}, c, (x, y) -> (x - y) * (x - y)), "
        f"0L, (a, v) -> a + v) * {n_enc} + b), "
        f"9223372036854775807L, (m, t) -> IF(t < m, t, m)), {n_enc}) AS INT)"
    )


def train_ivf_kmeans(
    embeddings: DataFrame,
    n_clusters: int = 16,
    iters: int = 3,
    init: str = "fixed",
    id_col: str = "vec_id",
) -> dict[int, list[int]]:
    """Seeded, cross-engine-DETERMINISTIC Lloyd training: fixed literal
    init (:func:`ivf_centroids`), fixed iteration count, and every
    arithmetic step either exact int64 or a single IEEE double op —
    so a DuckDB twin unrolling the same iterations lands on bit-equal
    centroids and the learned variant is value-checkable (the gap the
    round-5 verdict flagged; same determinization idiom as the
    PageRank nano-unit accumulation).

    Per iteration: assignment = argmin exact integer squared distance
    (map-side expression, ties to lowest bucket); update = per-bucket
    per-dim mean of quantized components, int64 sums (order-independent
    — safe up to ~2^53/scale rows per bucket before the double division
    loses exactness) then floor(sum/n + 0.5) back to integer units.
    Empty clusters die (are dropped), matching the SQL twin where a
    bucket with no members simply has no centroid row. Driver state is
    n_clusters x dim integers per round — the offline-training shape:
    at 100 TB centroids are trained once and shipped to the query
    layer as constants.

    ``init``: ``"fixed"`` (default) seeds from the literal
    :func:`ivf_centroids` table — the oracle-twinnable shape every
    value-checked trained query unrolls. ``"sample"`` seeds from K
    corpus vectors picked by salted-md5 rank of their ids —
    deterministic and engine-independent, and REQUIRED at larger K:
    uniform-random literal seeds don't cover a real data manifold in
    64-d, so Lloyd collapses (measured on the rotated bench fixture:
    K=64 fixed-init left 5 live cells with one holding 80% of the
    corpus — sum(cell^2) 669M vs 36M at K=45 — while sample-init keeps
    occupancy balanced). Standard k-means practice (Forgy/k-means||
    sample the data), made deterministic.

    Returns {bucket_id: integer centroid in IVF_SCALE units}."""
    if init == "sample":
        # DISTINCT quantized vectors, each ranked by the best (minimum)
        # salted-md5 rank among its rows: identical to a plain ranked
        # limit when the top-K rows are all distinct (the common case),
        # but a corpus with duplicate vectors among the seeds no longer
        # silently yields dead duplicate centroids (round-11 advice),
        # and the count check turns an empty/too-small corpus into a
        # clear error instead of an opaque KeyError
        seeds = (
            embeddings.select(
                F.md5(
                    F.concat(F.lit("ivf-init:"), F.col(id_col).cast("string"))
                ).alias("_rk"),
                F.expr(_quant_sql("embedding")).alias("eq"),
            )
            .groupBy("eq")
            .agg(F.min("_rk").alias("_rk"))
            .orderBy("_rk")
            .limit(n_clusters)
            .collect()
        )
        if len(seeds) < n_clusters:
            raise ValueError(
                f"init='sample' needs {n_clusters} distinct embedding "
                f"vectors to seed {n_clusters} cells; corpus has "
                f"{len(seeds)}"
            )
        cents = {b: [int(v) for v in r["eq"]] for b, r in enumerate(seeds)}
        dim = len(cents[0])
    else:
        lits = ivf_centroids(n_clusters=n_clusters)
        dim = len(lits[0])
        cents = {
            b: [int(math.floor(v * IVF_SCALE + 0.5)) for v in row]
            for b, row in enumerate(lits)
        }
    # Quantize ONCE and persist across the Lloyd iterations: each
    # iteration's assignment pass otherwise re-scans the corpus and
    # re-runs the quantize transform (iters full scans instead of one
    # — guide §5: reused AND expensive to recompute). Unpersisted on
    # every exit path; driver state stays centroid-sized.
    eq = embeddings.select(F.expr(_quant_sql("embedding")).alias("eq"))
    if iters > 1:
        eq = eq.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        cents = _lloyd_iters(eq, cents, n_clusters, dim, iters)
    finally:
        if iters > 1:
            eq.unpersist()
    return cents


def _lloyd_iters(
    eq: DataFrame,
    cents: dict[int, list[int]],
    n_clusters: int,
    dim: int,
    iters: int,
) -> dict[int, list[int]]:
    for _ in range(iters):
        assigned = eq.select(
            "eq", F.expr(_argmin_bucket_sql("eq", cents, n_clusters)).alias("bucket")
        )
        rows = (
            assigned.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.element_at("eq", d + 1)).alias(f"s{d}") for d in range(dim)],
            )
            .collect()
        )
        if not rows:
            break  # empty table: nothing to train on, keep current cells
        cents = {
            int(r["bucket"]): [
                # mirror the twin's arithmetic EXACTLY: the DuckDB CTE
                # computes CAST(sum AS DOUBLE) / count(*) — int->double
                # conversion of the sum first, then a double division —
                # so convert here too rather than using Python's
                # one-rounding int/int true division (they differ by an
                # ulp once |sum| > 2^53). Bit-parity therefore holds
                # while every bucket's component sum stays within 2^53
                # (|component| <= IVF_SCALE => safe below ~9e8 rows per
                # bucket at IVF_SCALE=1e4); floor(x+0.5) is bit-stable
                int(math.floor(float(r[f"s{d}"]) / r["n"] + 0.5))
                for d in range(dim)
            ]
            for r in rows
        }
    return cents


def topk_ivf(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    iters: int = 3,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """ANN top-k via LEARNED IVF: deterministic k-means
    (:func:`train_ivf_kmeans`), probe set = the ``nprobe`` centroids
    nearest the query (exact integer distance, computed driver-side
    from the trained integer centroids — metadata, not data), exact
    cosine re-rank inside the probed buckets only. Recall grows with
    nprobe; probing every surviving bucket degrades to brute force.
    At 100 TB the bucket id is the table's cluster/partition key, so
    the probe scan prunes to ~nprobe/n_clusters of the files.
    Value-checkable against :func:`topk_ivf_sql`'s unrolled-iteration
    DuckDB twin.

    ``cents`` is the train-once/probe-many seam: pass the dict a prior
    :func:`train_ivf_kmeans` returned (pure integers — trivially
    serializable next to the table, like any offline-trained index)
    and the call runs ZERO training jobs; omitted, it trains
    in-call."""
    # resolve the query BEFORE training the index: on a missing id
    # (e.g. an empty refresh) return an empty result rather than
    # raising — and never train on a table that has no rows
    q_row = embeddings.filter(F.col(id_col) == query_id).select("embedding").head()
    if q_row is None:
        return embeddings.select(
            F.col(id_col), F.lit(None).cast("double").alias("score")
        ).limit(0)
    if cents is None:
        cents = train_ivf_kmeans(embeddings, n_clusters, iters)
    # CAST(x AS DOUBLE)*scale then floor — same two IEEE ops the
    # in-engine quantizer performs, so q_eq is bit-identical to the
    # engine's quantization of the same row
    q_eq = [int(math.floor(float(x) * IVF_SCALE + 0.5)) for x in q_row["embedding"]]
    dists = {
        b: sum((e - c) * (e - c) for e, c in zip(q_eq, cq)) for b, cq in cents.items()
    }
    probe = sorted(cents, key=lambda b: (dists[b], b))[:nprobe]
    assigned = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.expr(
            _argmin_bucket_sql(_quant_sql("embedding"), cents, n_clusters)
        ).alias("bucket"),
    )
    q_df = embeddings.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_nrm"),
    )
    return (
        assigned.filter(F.col("bucket").isin(probe) & (F.col("vid") != query_id))
        .crossJoin(F.broadcast(q_df))
        .select(
            F.col("vid").alias(id_col),
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.sqrt(_dot(F.col("embedding"), F.col("embedding"))) * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def _ivf_train_ctes(
    table: str, id_col: str, n_clusters: int, iters: int
) -> tuple[list[str], str, str]:
    """Shared trainer unrolling for the learned-centroid DuckDB twins:
    CTEs c0 (literal integer init), e (quantized + normed corpus),
    a{i}/c{i} (one Lloyd assignment/update per iteration), and af (the
    final trained assignment carrying vid/embedding/nrm/bucket).
    Returns (ctes, final_centroid_cte_name, dist_sql). Every step is
    exact int64 arithmetic or the identical IEEE double division, so
    the learned centroids match train_ivf_kmeans bit-for-bit."""
    init = ivf_centroids(n_clusters=n_clusters)
    cvalues = ", ".join(
        f"({b}, [{', '.join(str(int(math.floor(v * IVF_SCALE + 0.5))) for v in row)}]::BIGINT[])"
        for b, row in enumerate(init)
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(e.eq, c.cq), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    enc = n_clusters
    ctes = [
        f"c0(bucket, cq) AS (VALUES {cvalues})",
        f"""e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table})""",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
      SELECT e.vid, any_value(e.eq) AS eq,
             CAST(min({dist} * {enc} + c.bucket) % {enc} AS INT) AS bucket
      FROM e, {prev} c GROUP BY e.vid)"""
        )
        ctes.append(
            f"""c{i} AS (
      SELECT bucket, list(cv ORDER BY idx) AS cq FROM (
        SELECT bucket, idx, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
        FROM (SELECT bucket, unnest(eq) AS v, generate_subscripts(eq, 1) AS idx FROM a{i})
        GROUP BY bucket, idx)
      GROUP BY bucket)"""
        )
        prev = f"c{i}"
    ctes.append(
        f"""af AS (
      SELECT e.vid, any_value(e.embedding) AS embedding, any_value(e.nrm) AS nrm,
             CAST(min({dist} * {enc} + c.bucket) % {enc} AS INT) AS bucket
      FROM e, {prev} c GROUP BY e.vid)"""
    )
    return ctes, prev, dist


def topk_ivf_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    iters: int = 3,
) -> str:
    """DuckDB twin of :func:`topk_ivf`: the SAME deterministic Lloyd
    iterations, unrolled as CTE pairs via :func:`_ivf_train_ctes`, so
    the learned centroids — and therefore the probe set and result —
    match the Spark path bit-for-bit."""
    ctes, prev, dist = _ivf_train_ctes(table, id_col, n_clusters, iters)
    ctes.append(
        f"""probes AS (
      SELECT c.bucket FROM e, {prev} c WHERE e.vid = {query_id}
      ORDER BY {dist}, c.bucket LIMIT {nprobe})"""
    )
    ctes.append(
        f"q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vid = {query_id})"
    )
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) / (e.nrm * q.q_nrm)"
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT e.vid AS {id_col}, floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM af e JOIN probes USING (bucket), q
    WHERE e.vid <> {query_id}
    ORDER BY score DESC, e.vid LIMIT {k}
    """


def ivf_centroids(dim: int = _DIM, n_clusters: int = 16, seed: int = 99) -> list[list[float]]:
    """Deterministic 'pre-trained' centroids, rounded so the literal
    text (and thus every engine's arithmetic) is identical. At scale,
    IVF centroids are trained offline and shipped to the query layer
    as constants — exactly this shape; the k-means path
    (:func:`ivf_index`) learns them in-cluster instead."""
    rs = np.random.RandomState(seed)
    return [[round(float(x), 6) for x in row] for row in rs.uniform(-1, 1, (n_clusters, dim))]


def _centroid_scores(emb_sql: str, nrm_sql: str, centroids: list[list[float]]) -> Column:
    """array<struct<s,double nc,int>> of (rounded cosine-to-centroid,
    NEGATED centroid id) — sort_array desc then picks the highest
    score with ties to the LOWEST centroid id. Built as ONE parsed
    expression: the per-literal Column version cost ~1000 py4j round
    trips per call (16 centroids x 64 dims), twice per query."""
    entries = []
    for i, ctr in enumerate(centroids):
        cn = sum(v * v for v in ctr) ** 0.5
        cos = (
            f"floor({_dot_lits_sql(emb_sql, ctr)} / "
            f"({nrm_sql} * CAST({repr(cn)} AS DOUBLE)) * 1000000 + 0.5) / 1000000"
        )
        entries.append(f"named_struct('s', {cos}, 'nc', {-i})")
    return F.expr(f"sort_array(array({', '.join(entries)}), false)")


def topk_ivf_fixed(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-flat top-k with FIXED literal centroids — the value-checkable
    twin of :func:`topk_ivf` (whose k-means centroids aren't
    SQL-expressible). Fully declarative: assignment = argmax cosine to
    centroid per row; probe set = the query row's ``nprobe`` best
    centroids, joined (broadcast — nprobe rows) against the
    assignments; exact re-rank inside the probed buckets only. At
    100 TB the bucket id is the table's cluster key, so the probe scan
    prunes to nprobe/n_clusters of the files. Assignment and ranking
    use ROUNDED scores with deterministic tiebreaks in both engines.
    """
    centroids = ivf_centroids(n_clusters=n_clusters)
    e = embeddings.withColumn("nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
    assigned = e.select(
        F.col(id_col).alias("vid"),
        "embedding",
        "nrm",
        (-_centroid_scores("embedding", "nrm", centroids)[0]["nc"]).alias("bucket"),
    )
    qrow = e.filter(F.col(id_col) == query_id).select(
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.slice(
            F.transform(
                _centroid_scores("embedding", "nrm", centroids),
                lambda st: -st["nc"],
            ),
            1,
            nprobe,
        ).alias("probes"),
    )
    probed = assigned.join(
        F.broadcast(qrow), F.array_contains(F.col("probes"), F.col("bucket"))
    ).filter(F.col("vid") != query_id)
    return (
        probed.select(
            F.col("vid").alias(id_col),
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_ivf_fixed_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> str:
    centroids = ivf_centroids(n_clusters=n_clusters)
    values = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in ctr)}]::DOUBLE[])" for i, ctr in enumerate(centroids)
    )
    cos_c = "list_inner_product(e.embedding::DOUBLE[], c.vec) / (e.nrm * sqrt(list_inner_product(c.vec, c.vec)))"
    cos_q = "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]) / (e.nrm * q.q_nrm)"
    return f"""
    WITH c(cid, vec) AS (VALUES {values}),
    e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    scored AS (
      SELECT e.vid, e.embedding, e.nrm, c.cid, floor(({cos_c}) * 1000000 + 0.5) / 1000000 AS cs
      FROM e, c),
    assigned AS (
      SELECT vid, embedding, nrm, cid AS bucket
      FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
            FROM scored) WHERE rn = 1),
    probes AS (
      SELECT cid AS bucket FROM scored WHERE vid = {query_id}
      ORDER BY cs DESC, cid LIMIT {nprobe}),
    q AS (
      SELECT embedding AS q_emb, nrm AS q_nrm FROM e WHERE vid = {query_id})
    SELECT e.vid AS {id_col}, floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM assigned e JOIN probes USING (bucket), q
    WHERE e.vid <> {query_id}
    ORDER BY score DESC, e.vid LIMIT {k}
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
    # self-norms are per-ROW quantities: compute them once before the
    # self-join instead of re-deriving both sides' norms for every pair
    # (at B pairs per block that is 2B redundant O(dim) aggregations)
    e = e.withColumn("nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding"))))
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
            (
                F.floor(
                    _dot(F.col("a.embedding"), F.col("b.embedding"))
                    / (F.col("a.nrm") * F.col("b.nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-duplicate vector pairs blocked by BANDED hyperplane LSH —
    the 100 TB path: no natural block key (label) required, and the
    pair space is bounded by per-(band, signature) bucket collisions
    instead of label populations.

    ``bands`` independent plane sets each yield an integer signature;
    two vectors are candidates iff they collide in >=1 band
    (OR-amplification: P(candidate) = 1-(1-p^r)^bands for per-plane
    agreement p = 1 - angle/pi). Candidates — and only candidates —
    are verified with the exact cosine. One explode (bands rows per
    vector), one shuffle on (band, sig), no all-pairs join.
    """
    all_planes = lsh_planes(n_planes=bands * planes_per_band, seed=seed)
    e = embeddings.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    band_sigs = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                _bucket_expr(
                    "embedding",
                    all_planes[band * planes_per_band : (band + 1) * planes_per_band],
                ).alias("sig"),
            )
            for band in range(bands)
        ]
    )
    keyed = e.select(id_col, "embedding", "nrm", F.explode(band_sigs).alias("bs")).select(
        id_col, "embedding", "nrm", "bs.band", "bs.sig"
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            (
                F.floor(
                    _dot(F.col("a.embedding"), F.col("b.embedding"))
                    / (F.col("a.nrm") * F.col("b.nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_near_dups_lsh_sql(
    table: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    bands: int = 4,
    planes_per_band: int = 8,
    seed: int = 42,
) -> str:
    all_planes = lsh_planes(n_planes=bands * planes_per_band, seed=seed)
    band_selects = " UNION ALL ".join(
        f"SELECT {id_col}, embedding, nrm, {band} AS band, "
        + _bucket_sql(
            "embedding", all_planes[band * planes_per_band : (band + 1) * planes_per_band]
        )
        + " AS sig FROM e"
        for band in range(bands)
    )
    cos = "list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (a.nrm * b.nrm)"
    return f"""
    WITH e AS MATERIALIZED (
      SELECT *, sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    keyed AS MATERIALIZED ({band_selects})
    SELECT DISTINCT a.{id_col} AS id_a, b.{id_col} AS id_b, floor(({cos}) * 10000 + 0.5) / 10000 AS cosine
    FROM keyed a JOIN keyed b
      ON a.band = b.band AND a.sig = b.sig AND a.{id_col} < b.{id_col}
    WHERE floor(({cos}) * 10000 + 0.5) / 10000 >= {threshold}
    """


def embedding_near_dups_sql(
    table: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    block_col: str = "label",
    id_cap: int | None = None,
) -> str:
    cap = f"WHERE {id_col} < {id_cap}" if id_cap is not None else ""
    cos = (
        "list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / (a.nrm * b.nrm)"
    )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT *, sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table} {cap})
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, floor(({cos}) * 10000 + 0.5) / 10000 AS cosine
    FROM e a JOIN e b ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
    WHERE floor(({cos}) * 10000 + 0.5) / 10000 >= {threshold}
    """


def topk_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for a BATCH of stored query vectors in one
    job: (query_id, rank, vec_id, score).

    The per-query-loop shape re-scans the corpus per query; this scans
    ONCE. Queries broadcast (alert/batch-sized); cosine scoring is a
    JVM map stage; then top-k is two-phase: an Arrow-batched
    ``mapInPandas`` partial top-k INSIDE the map stage (each batch
    emits at most queries x k rows — nothing shuffles; a pure-JVM
    formulation would drag every scored row through the exchange,
    because ``collect_list`` partial buffers are unbounded), then one
    JVM merge over the surviving k x batches x queries rows. Shuffled
    bytes are independent of corpus size. Ranking is on the ROUNDED
    score with vec_id tiebreak in BOTH engines — raw doubles can
    differ in the last ulp between summation orders."""
    from collections.abc import Iterator

    import pandas as pd

    # norms materialize BEFORE the cross join, so each corpus row pays
    # one sqrt(dot) total instead of one per query — the naive _cosine
    # form re-derives both norms per (row, query) pair, tripling the
    # higher-order-function work in the hot scoring stage
    corpus = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    q = embeddings.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("q_nrm"),
    )
    scored = (
        corpus.crossJoin(F.broadcast(q))
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            "vid",
            # rank on the ROUNDED score (ties then break on vid): raw
            # doubles can differ in the last ulp between engines'
            # summation orders and flip the k-th row
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("cos"),
        )
    )

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield (
                pdf.sort_values(["query_id", "cos", "vid"], ascending=[True, False, True])
                .groupby("query_id", sort=False)
                .head(k)
            )

    survivors = scored.mapInPandas(local_topk, "query_id bigint, vid bigint, cos double")
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vid"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("vid").alias(id_col),
            F.col("cos").alias("score"),
        )
    )


def topk_batch_sql(
    table: str, query_ids: list[int], k: int = 10, id_col: str = "vec_id"
) -> str:
    cos = _cosine_sql("e.embedding", "q.q_emb")
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
    WITH q AS (SELECT {id_col} AS query_id, embedding AS q_emb
               FROM {table} WHERE {id_col} IN ({ids})),
    scored AS (
      SELECT q.query_id, e.{id_col}, floor(({cos}) * 10000 + 0.5) / 10000 AS cos
      FROM {table} e, q WHERE e.{id_col} <> q.query_id),
    ranked AS (
      SELECT query_id, {id_col}, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, {id_col}) AS rank
      FROM scored)
    SELECT query_id, CAST(rank AS INT) AS rank, {id_col}, cos AS score
    FROM ranked WHERE rank <= {k}
    """


def embedding_stats(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Embedding-column quality screen: one aggregate row with vector
    count, dimension bounds (mixed dims = corrupt ingest), zero/NaN
    vector counts (collapsed or failed encodes), and the norm
    distribution (a collapsing embedding model drives norms degenerate
    before cosine metrics notice). Pure zip_with/aggregate arithmetic,
    one pass, map-side partials."""
    dot = F.aggregate(
        F.zip_with("embedding", "embedding", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    has_nan = F.exists("embedding", lambda x: F.isnan(x.cast("double")))
    norm = F.sqrt(dot)
    per = embeddings.select(
        F.size("embedding").alias("dim"),
        has_nan.alias("has_nan"),
        F.when(~has_nan, norm).alias("norm"),
    )
    return per.agg(
        F.count(F.lit(1)).alias("vec_ct"),
        F.min("dim").alias("dim_min"),
        F.max("dim").alias("dim_max"),
        F.sum(F.col("has_nan").cast("int")).alias("nan_vec_ct"),
        F.sum((F.col("norm") == 0.0).cast("int")).alias("zero_vec_ct"),
        F.round(F.min("norm"), 4).alias("norm_min"),
        F.round(F.max("norm"), 4).alias("norm_max"),
        F.round(F.avg("norm"), 4).alias("norm_avg"),
        F.round(F.stddev_samp("norm"), 4).alias("norm_sd"),
    )


def embedding_stats_sql(table: str, id_col: str = "vec_id") -> str:
    dot = "list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])"
    has_nan = "len(list_filter(embedding::DOUBLE[], x -> isnan(x))) > 0"
    return f"""
    WITH per AS MATERIALIZED (
      SELECT len(embedding) AS dim, {has_nan} AS has_nan,
             CASE WHEN NOT ({has_nan}) THEN sqrt({dot}) END AS norm
      FROM {table})
    SELECT count(*) AS vec_ct, min(dim) AS dim_min, max(dim) AS dim_max,
           CAST(sum(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS nan_vec_ct,
           CAST(sum(CASE WHEN norm = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_vec_ct,
           round(min(norm), 4) AS norm_min, round(max(norm), 4) AS norm_max,
           round(avg(norm), 4) AS norm_avg, round(stddev_samp(norm), 4) AS norm_sd
    FROM per
    """


# ---------------------------------------------------------------------------
# Blocked kNN graph (the all-nodes counterpart of the single-query top-k)
# ---------------------------------------------------------------------------


def knn_graph(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    block_col: str = "label",
) -> DataFrame:
    """Top-``k`` cosine neighbors for EVERY vector, within its coarse
    block (``block_col`` — a class label here; at scale the IVF/k-means
    cluster id plays this role, exactly as in a cluster-then-link ANN
    graph build). The self-join keys on the block, so the pair space is
    sum(block_size^2), never corpus^2; the per-source ranking windows
    partition on (block-local) vec_id — no global window.

    Scores are rounded to 4 decimals BEFORE ranking on both engines
    (rank on the rounded score, tie-break on neighbor id): the
    elementwise fold order is identical in Spark's `aggregate` and
    DuckDB's list_inner_product, so the rounded scores are
    cross-engine stable and the graph is value-checkable.
    """
    from pyspark.sql.window import Window

    # norms are computed ONCE per vector before the join (the join
    # would otherwise re-derive each side's self-dot per PAIR — 3 dot
    # products per pair instead of 1, measured ~3x slower); the value
    # is identical, so the SQL twin may precompute or not
    a = embeddings.select(
        F.col(id_col).alias("src"),
        F.col(block_col).alias("blk"),
        F.col("embedding").alias("a_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("a_nrm"),
    )
    b = embeddings.select(
        F.col(id_col).alias("dst"),
        F.col(block_col).alias("b_blk"),
        F.col("embedding").alias("b_emb"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("b_nrm"),
    )
    scored = (
        a.join(b, (F.col("blk") == F.col("b_blk")) & (F.col("src") != F.col("dst")))
        .select(
            "src",
            "dst",
            # floor(x*1e4+0.5)/1e4, NOT round(x,4): Spark's round works on
            # the shortest-decimal repr while DuckDB rounds the binary
            # value, so a boundary cosine could flip the last digit (and
            # the rank order) between engines. floor of the identical
            # IEEE product is bit-stable on both.
            (
                F.floor(
                    _dot(F.col("a_emb"), F.col("b_emb"))
                    / (F.col("a_nrm") * F.col("b_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("score"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "score", "rank")
    )


def knn_graph_sql(
    table: str, k: int = 3, id_col: str = "vec_id", block_col: str = "label"
) -> str:
    cos = _cosine_sql("a.embedding", "b.embedding")
    return f"""
    WITH pairs AS (
      SELECT a.{id_col} AS src, b.{id_col} AS dst,
             floor(({cos}) * 10000 + 0.5) / 10000 AS score
      FROM {table} a JOIN {table} b
        ON a.{block_col} = b.{block_col} AND a.{id_col} <> b.{id_col}),
    r AS (
      SELECT src, dst, score,
             row_number() OVER (PARTITION BY src ORDER BY score DESC, dst) AS rnk
      FROM pairs)
    SELECT src, dst, score, CAST(rnk AS INT) AS rank FROM r WHERE rnk <= {k}
    """


# ---------------------------------------------------------------------------
# Int8 scalar quantization: the compressed-scan ANN path. IVF prunes
# WHICH rows a probe reads; quantization shrinks HOW MANY BYTES each
# read costs — a float32 64-d embedding column at 100 TB becomes
# ~25 TB as int8 at rest, and the candidate scan runs on the small
# copy. Scale factors cancel in cosine, so candidate ranking needs no
# dequantization; a final exact pass over the (tiny) candidate set
# restores full-precision scores.
# ---------------------------------------------------------------------------


def quantize_int8(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Symmetric per-vector int8 quantization: ``q_i = floor(x_i /
    max|x| * 127 + 0.5)`` as ``array<tinyint>`` (1 byte/component at
    rest vs 4 for float32) plus the quantized L2 norm. The per-vector
    scale drops out of cosine, so it is not even stored. Zero vectors
    quantize to zeros (their cosine is undefined and they never rank).
    All arithmetic is the documented cross-engine-exact idiom: int64
    dot products, one IEEE sqrt."""
    emb = F.col("embedding")
    mx = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    q = F.when(
        mx > 0,
        F.transform(
            emb,
            lambda x: F.floor(x.cast("double") / mx * 127 + F.lit(0.5)).cast("tinyint"),
        ),
    ).otherwise(F.transform(emb, lambda x: F.lit(0).cast("tinyint")))
    qd = F.aggregate(
        F.zip_with(F.col("q"), F.col("q"), lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return embeddings.select(F.col(id_col).alias("vid"), q.alias("q")).withColumn(
        "qn", F.sqrt(qd.cast("double"))
    )


def _dot_int(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("bigint") * y.cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def topk_int8(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine via the compressed scan: rank ALL rows on the
    int8-quantized cosine (int64 dot / quantized norms — the pass that
    reads 1/4 the bytes at rest), keep ``rescore * k`` candidates, then
    re-score only those against the full-precision vectors and return
    the exact-cosine top-k. Candidate selection and final ranking both
    order on the floor-rounded score with id tiebreak, so the result is
    deterministic and the DuckDB twin replays both phases bit-for-bit.

    The candidate cut is ``orderBy().limit()`` — Spark's TakeOrdered,
    a map-side partial top-m per partition followed by a driver merge
    of ``partitions x m`` rows; no global sort, no single-task window.
    The rescore join broadcasts the candidate id list back onto the
    full-precision table — at rest that is a point-lookup into the
    float copy, touching ``rescore * k`` vectors, not the corpus."""
    qz = quantize_int8(embeddings, id_col)
    # zero vectors have no cosine: drop them from both sides up front
    # (ANSI mode makes the 0-norm division an error, not a NULL)
    qv = qz.filter((F.col("vid") == query_id) & (F.col("qn") > 0)).select(
        F.col("q").alias("qq"), F.col("qn").alias("qqn")
    )
    approx = (
        qz.filter(F.col("qn") > 0)
        .crossJoin(F.broadcast(qv))
        .filter(F.col("vid") != query_id)
        .select(
            "vid",
            (
                F.floor(
                    _dot_int(F.col("q"), F.col("qq"))
                    / (F.col("qn") * F.col("qqn"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("ascore"),
        )
    )
    cands = (
        approx.orderBy(F.desc("ascore"), F.asc("vid"))
        .limit(rescore * k)
        .select("vid")
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qfull = full.filter((F.col("vid") == query_id) & (F.col("nrm") > 0)).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    exact = (
        full.join(F.broadcast(cands), "vid")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vid",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
    )
    return (
        exact.orderBy(F.desc("score"), F.asc("vid"))
        .limit(k)
        .select(F.col("vid").alias(id_col), "score")
    )


def topk_int8_sql(
    table: str, k: int = 10, query_id: int = 0, rescore: int = 4, id_col: str = "vec_id"
) -> str:
    """DuckDB twin of :func:`topk_int8`: identical quantization,
    identical two-phase ranking (rounded scores, id tiebreaks)."""
    quant = (
        "CASE WHEN mx > 0 THEN list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE) / mx * 127 + 0.5) AS TINYINT)) "
        "ELSE list_transform(embedding, x -> CAST(0 AS TINYINT)) END"
    )
    dot_int = (
        "CAST(list_sum(list_transform(list_zip({a}, {b}), "
        "z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT))) AS BIGINT)"
    )
    cos_full = _cosine_sql("f.embedding", "qf.embedding")
    return f"""
    WITH m AS (
      SELECT {id_col} AS vid, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
      FROM {table}),
    qz AS (
      SELECT vid, {quant} AS q FROM m),
    qn AS (
      SELECT vid, q,
             sqrt(CAST({dot_int.format(a="q", b="q")} AS DOUBLE)) AS qn
      FROM qz),
    qv AS (SELECT q AS qq, qn AS qqn FROM qn WHERE vid = {query_id} AND qn > 0),
    approx AS (
      SELECT e.vid,
             floor({dot_int.format(a="e.q", b="qv.qq")} / (e.qn * qv.qqn)
                   * 10000 + 0.5) / 10000 AS ascore
      FROM qn e, qv WHERE e.vid <> {query_id} AND e.qn > 0),
    cands AS (
      SELECT vid FROM (
        SELECT vid, row_number() OVER (ORDER BY ascore DESC, vid) AS rnk
        FROM approx) WHERE rnk <= {rescore * k}),
    f AS (SELECT {id_col} AS vid, embedding FROM {table}),
    qf AS (SELECT embedding FROM {table} WHERE {id_col} = {query_id})
    SELECT f.vid AS {id_col},
           floor(({cos_full}) * 10000 + 0.5) / 10000 AS score
    FROM f JOIN cands USING (vid), qf
    ORDER BY score DESC, f.vid LIMIT {k}
    """


def hard_negatives(
    embeddings: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    label_col: str = "label",
    per_anchor: int = 1,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor, its
    ``per_anchor`` most similar vectors with a DIFFERENT label — the
    pairs a contrastive/embedding trainer needs most (similar in
    space, different in class).

    Candidates must cross label boundaries, so blocking CANNOT use the
    label (knn_graph's block); instead vectors block on their fixed-IVF
    bucket — spatially coherent regardless of class — and the pair
    space is sum(bucket²), never corpus². Assignment reuses the
    literal-centroid argmax (rounded scores, deterministic ties), so
    the DuckDB twin reproduces bucket membership and ranking exactly.
    At 100 TB the bucket is the table's cluster key: each bucket's
    self-join is a co-located partition job."""
    centroids = ivf_centroids(n_clusters=n_clusters)
    e = embeddings.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    ).select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        "embedding",
        "nrm",
        (-_centroid_scores("embedding", "nrm", centroids)[0]["nc"]).alias("bucket"),
    )
    a, b = e.alias("a"), e.alias("b")
    from pyspark.sql.window import Window

    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.lbl") != F.col("b.lbl")),
        )
        .select(
            F.col("a.vid").alias("anchor"),
            F.col("b.vid").alias("negative"),
            (
                F.floor(
                    _dot(F.col("a.embedding"), F.col("b.embedding"))
                    / (F.col("a.nrm") * F.col("b.nrm"))
                    * 10000
                    + 0.5
                )
                / 10000
            ).alias("score"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("score"), "negative")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= per_anchor)
        .select("anchor", "negative", "score")
        .orderBy("anchor", F.desc("score"), "negative")
    )


def hard_negatives_sql(
    table: str,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    label_col: str = "label",
    per_anchor: int = 1,
) -> str:
    """DuckDB twin of :func:`hard_negatives` — same literal centroids,
    same rounded assignment and ranking."""
    centroids = ivf_centroids(n_clusters=n_clusters)
    values = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in ctr)}]::DOUBLE[])"
        for i, ctr in enumerate(centroids)
    )
    cos_c = (
        "list_inner_product(e.embedding::DOUBLE[], c.vec) /"
        " (e.nrm * sqrt(list_inner_product(c.vec, c.vec)))"
    )
    cos_ab = (
        "list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /"
        " (a.nrm * b.nrm)"
    )
    return f"""
    WITH c(cid, vec) AS (VALUES {values}),
    e AS MATERIALIZED (
      SELECT {id_col} AS vid, {label_col} AS lbl, embedding,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    scored_c AS (
      SELECT e.vid, e.lbl, e.embedding, e.nrm, c.cid,
             floor(({cos_c}) * 1000000 + 0.5) / 1000000 AS cs
      FROM e, c),
    assigned AS (
      SELECT vid, lbl, embedding, nrm, cid AS bucket
      FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
            FROM scored_c) WHERE rn = 1),
    pairs AS (
      SELECT a.vid AS anchor, b.vid AS negative,
             floor(({cos_ab}) * 10000 + 0.5) / 10000 AS score
      FROM assigned a JOIN assigned b
        ON a.bucket = b.bucket AND a.lbl <> b.lbl)
    SELECT anchor, negative, score FROM (
      SELECT *, row_number() OVER (PARTITION BY anchor
                                   ORDER BY score DESC, negative) AS rnk
      FROM pairs)
    WHERE rnk <= {per_anchor}
    ORDER BY anchor, score DESC, negative
    """


def cluster_profile(
    embeddings: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Corpus cartography: one row per IVF cell — size, corpus share,
    mean vector norm, dominant label and its purity. This is the map a
    curation pipeline reads before deciding which regions of embedding
    space to up/down-sample, and the balance check behind an IVF
    index (a cell holding half the corpus means the probe path
    degenerates to brute force there).

    Determinism: assignment uses the fixed literal centroids with the
    rounded-cosine/lowest-id tiebreak (same as topk_ivf_fixed); norms
    are quantized per row to integer 1e-6 units BEFORE summing so the
    mean is an exact integer floor-division, never an order-dependent
    float sum; dominant label ties break to the lowest label. One
    corpus map pass + one bucket-keyed shuffle of (bucket, label)
    counts — cell-count-sized, not corpus-sized."""
    centroids = ivf_centroids(n_clusters=n_clusters)
    e = embeddings.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    assigned = e.select(
        F.col(label_col).alias("lbl"),
        F.expr("CAST(floor(nrm * 1000000 + 0.5) AS BIGINT)").alias("nrm_q"),
        (-_centroid_scores("embedding", "nrm", centroids)[0]["nc"]).alias("bucket"),
    )
    by_bl = assigned.groupBy("bucket", "lbl").agg(
        F.count(F.lit(1)).cast("long").alias("ct"),
        F.sum("nrm_q").cast("long").alias("nrm_sum"),
    )
    per_bucket = (
        by_bl.withColumn(
            "rn",
            F.expr(
                "row_number() OVER (PARTITION BY bucket ORDER BY ct DESC, lbl ASC)"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.sum("ct").cast("long").alias("n"),
            F.sum("nrm_sum").cast("long").alias("nrm_total"),
            F.max(F.when(F.col("rn") == 1, F.col("lbl"))).cast("int").alias("top_label"),
            F.max(F.when(F.col("rn") == 1, F.col("ct"))).cast("long").alias("top_label_ct"),
        )
    )
    return per_bucket.selectExpr(
        "CAST(bucket AS INT) AS bucket",
        "n",
        f"CAST(n * 10000L DIV (sum(n) OVER ()) AS BIGINT) AS share_bp",
        "CAST(nrm_total DIV n AS BIGINT) AS mean_norm_e6",
        "top_label",
        "top_label_ct",
        "CAST(top_label_ct * 10000L DIV n AS BIGINT) AS purity_bp",
    ).orderBy("bucket")


def cluster_profile_sql(
    table: str,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`cluster_profile` (same fixed centroids,
    same rounded-cosine/lowest-id assignment, same integer norm
    quantization and floor-division reporting)."""
    centroids = ivf_centroids(n_clusters=n_clusters)
    values = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in ctr)}]::DOUBLE[])"
        for i, ctr in enumerate(centroids)
    )
    cos_c = (
        "list_inner_product(e.embedding::DOUBLE[], c.vec)"
        " / (e.nrm * sqrt(list_inner_product(c.vec, c.vec)))"
    )
    return f"""
    WITH c(cid, vec) AS (VALUES {values}),
    e AS MATERIALIZED (
      SELECT {id_col} AS vid, {label_col} AS lbl, embedding,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    scored AS (
      SELECT e.vid, e.lbl, CAST(floor(e.nrm * 1000000 + 0.5) AS BIGINT) AS nrm_q,
             c.cid, floor(({cos_c}) * 1000000 + 0.5) / 1000000 AS cs
      FROM e, c),
    assigned AS (
      SELECT lbl, nrm_q, cid AS bucket
      FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
            FROM scored) WHERE rn = 1),
    by_bl AS (
      SELECT bucket, lbl, CAST(count(*) AS BIGINT) AS ct,
             CAST(sum(nrm_q) AS BIGINT) AS nrm_sum
      FROM assigned GROUP BY bucket, lbl),
    per_bucket AS (
      SELECT bucket,
             CAST(sum(ct) AS BIGINT) AS n,
             CAST(sum(nrm_sum) AS BIGINT) AS nrm_total,
             CAST(max(CASE WHEN rn = 1 THEN lbl END) AS INT) AS top_label,
             CAST(max(CASE WHEN rn = 1 THEN ct END) AS BIGINT) AS top_label_ct
      FROM (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY ct DESC, lbl ASC) AS rn
            FROM by_bl)
      GROUP BY bucket)
    SELECT CAST(bucket AS INT) AS bucket, n,
           CAST(n * 10000 // (sum(n) OVER ()) AS BIGINT) AS share_bp,
           CAST(nrm_total // n AS BIGINT) AS mean_norm_e6,
           top_label, top_label_ct,
           CAST(top_label_ct * 10000 // n AS BIGINT) AS purity_bp
    FROM per_bucket ORDER BY bucket
    """


def embedding_drift(
    embeddings: DataFrame,
    side_expr: Column,
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-distribution drift between two slices of a corpus
    (side_expr boolean: True -> A, False -> B): the cosine between the
    slices' MEAN vectors — the standard cheap detector for 'the new
    batch embeds somewhere else' (encoder version skew, domain shift,
    silent preprocessing changes) before any expensive per-pair work.

    Determinism: components quantize per row to integer 1e-6 units,
    then sum as exact integers per (slice, position) — and since
    cosine is scale-invariant, cos(mean_A, mean_B) == cos(sum_A,
    sum_B): the row counts cancel, so the whole statistic is computed
    from two integer vectors both engines agree on bit-for-bit; the
    final cosine/norms use the floor(x*1e6+0.5) idiom on identical
    inputs. NULL when a slice is empty.

    Scale: posexplode fans each row into dim entries, but the
    groupBy(side, pos) aggregate combines map-side, so the shuffle is
    2*dim rows per partition — never corpus-sized. One scan."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * 1000000 + F.lit(0.5)).cast("long"),
    )
    comp = embeddings.select(
        side_expr.alias("is_a"), F.posexplode(q).alias("pos", "qv")
    )
    sums = comp.groupBy("is_a", "pos").agg(
        F.sum("qv").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    folded = sums.groupBy("pos").agg(
        F.max(F.when(F.col("is_a"), F.col("s"))).alias("sa"),
        F.max(F.when(~F.col("is_a"), F.col("s"))).alias("sb"),
        F.max(F.when(F.col("is_a"), F.col("ct"))).alias("na"),
        F.max(F.when(~F.col("is_a"), F.col("ct"))).alias("nb"),
    )
    return folded.agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.sum(
            F.col("sa").cast("double") * F.col("sb").cast("double")
        ).alias("_dot"),
        F.sum(F.col("sa").cast("double") * F.col("sa").cast("double")).alias("_a2"),
        F.sum(F.col("sb").cast("double") * F.col("sb").cast("double")).alias("_b2"),
    ).selectExpr(
        "n_a",
        "n_b",
        """CASE WHEN n_a > 0 AND n_b > 0 AND _a2 > 0 AND _b2 > 0 THEN
             CAST(floor(_dot / (sqrt(_a2) * sqrt(_b2)) * 1000000 + 0.5) AS BIGINT)
           END AS cos_mean_e6""",
        """CASE WHEN n_a > 0 THEN
             CAST(floor(sqrt(_a2) / n_a + 0.5) AS BIGINT) END AS norm_mean_a_e6""",
        """CASE WHEN n_b > 0 THEN
             CAST(floor(sqrt(_b2) / n_b + 0.5) AS BIGINT) END AS norm_mean_b_e6""",
    )


def embedding_drift_sql(table: str, side_sql: str, id_col: str = "vec_id") -> str:
    """DuckDB twin of :func:`embedding_drift` (same integer component
    sums, same floor-quantized cosine on identical inputs)."""
    return f"""
    WITH comp AS (
      SELECT ({side_sql}) AS is_a,
             generate_subscripts(embedding, 1) AS pos,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
                  AS BIGINT) AS qv
      FROM {table}),
    sums AS (
      SELECT is_a, pos, CAST(sum(qv) AS HUGEINT) AS s,
             CAST(count(*) AS BIGINT) AS ct
      FROM comp GROUP BY is_a, pos),
    folded AS (
      SELECT pos,
             max(CASE WHEN is_a THEN s END) AS sa,
             max(CASE WHEN NOT is_a THEN s END) AS sb,
             max(CASE WHEN is_a THEN ct END) AS na,
             max(CASE WHEN NOT is_a THEN ct END) AS nb
      FROM sums GROUP BY pos),
    tot AS (
      SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
             sum(CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)) AS dot,
             sum(CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) AS a2,
             sum(CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) AS b2
      FROM folded)
    SELECT n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 AND a2 > 0 AND b2 > 0 THEN
             CAST(floor(dot / (sqrt(a2) * sqrt(b2)) * 1000000 + 0.5) AS BIGINT)
           END AS cos_mean_e6,
           CASE WHEN n_a > 0 THEN
             CAST(floor(sqrt(a2) / n_a + 0.5) AS BIGINT) END AS norm_mean_a_e6,
           CASE WHEN n_b > 0 THEN
             CAST(floor(sqrt(b2) / n_b + 0.5) AS BIGINT) END AS norm_mean_b_e6
    FROM tot
    """


# ---------------------------------------------------------------------------
# Product quantization (PQ): the 64-dim vector splits into PQ_M
# subspaces, each encoded as the id of its nearest codebook centroid —
# PQ_M small ints per vector (4 bytes at PQ_K=16) against 256 bytes of
# float32, a 64x at-rest compression, with query-time scoring done as
# PQ_M table lookups per row (asymmetric distance computation). The
# two-phase shape mirrors topk_int8: rank everything on the compressed
# representation, then exact-rescore only rescore*k candidates.
# Codebooks are integer literals in the IVF_SCALE grid, so encode,
# LUT build, and ADC are pure int64 arithmetic — bit-equal on every
# engine (the same determinism contract as the IVF family). At 100 TB
# the codes table is the thing you scan (pq_encode is the ingest-time
# pass); the float vectors are cold storage touched only by the
# rescore point-lookups.
# ---------------------------------------------------------------------------

PQ_M = 8   # subspaces (64 dims -> 8 per subspace)
PQ_K = 16  # centroids per subspace -> 4-bit codes


def pq_codebooks(
    dim: int = _DIM, m: int = PQ_M, k: int = PQ_K, seed: int = 123
) -> list[list[list[int]]]:
    """Deterministic 'pre-trained' INTEGER codebooks (one list of k
    centroids per subspace, components in the IVF_SCALE grid). Like
    ivf_centroids, this is the shipped-constants shape real systems
    use at query time; swap in offline-trained books via the
    ``books=`` seam."""
    rs = np.random.RandomState(seed)
    d = dim // m
    return [
        [
            [int(math.floor(x * IVF_SCALE + 0.5)) for x in c]
            for c in rs.uniform(-1, 1, (k, d))
        ]
        for _ in range(m)
    ]


def _pq_books_table(spark, books: list[list[list[int]]]):
    """The codebooks as a (j, code, cvec) DataFrame — m*k rows of
    integer vectors, broadcast-sized at any configuration."""
    rows = [
        (j, c, [int(v) for v in books[j][c]])
        for j in range(len(books))
        for c in range(len(books[j]))
    ]
    return spark.createDataFrame(rows, "j int, code int, cvec array<bigint>")


def _pq_codes_rel(
    src: DataFrame,
    vec_sql: str,
    books: list[list[list[int]]],
    keep: list[str],
) -> DataFrame:
    """Per-(row, subspace) nearest-centroid codes, computed
    RELATIONALLY: subvectors inline to (keep..., j, sub), join the
    broadcast (j, code, cvec) books table, and the assignment is
    min(sqdist * k + code) per (row, j) — the exact min-encode rule
    (ties to the lowest code) of _argmin_bucket_sql, as a groupBy over
    exact int64 values. Returns (keep..., j, code).

    Why not the literal-expression form (_pq_code_exprs): m*k
    per-centroid distance expressions parse to a plan tree that costs
    ~1 s of DRIVER time per query just to build and analyze (measured
    round 14: topk_ivfpq build 1.2 s / exec 2.0 s), and its fully
    unrolled variant blew the 64 KB codegen method limit (round-12
    note below). The relational form keeps the plan O(1) in m*k, moves
    the same exact integer arithmetic into a join over m*k-row
    metadata, and at scale is the canonical shape anyway: codebooks
    are DATA (trained artifacts), not query text."""
    m, d = len(books), len(books[0][0])
    kc = len(books[0])
    bt = _pq_books_table(src.sparkSession, books)
    sub_structs = ", ".join(
        f"named_struct('j', {j}, 'sub', slice({vec_sql}, {j * d + 1}, {d}))"
        for j in range(m)
    )
    subs = src.selectExpr(*keep, f"inline(array({sub_structs}))")
    enc = (
        "aggregate(zip_with(sub, cvec, (x, y) -> (x - y) * (x - y)), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v) * {kc} + code"
    )
    return (
        subs.join(F.broadcast(bt), "j")
        .selectExpr(*keep, "j", f"{enc} AS enc")
        .groupBy(*keep, "j")
        .agg(F.min("enc").alias("enc"))
        .selectExpr(*keep, "j", f"CAST(pmod(enc, {kc}) AS INT) AS code")
    )


def _pq_lut_rel(
    qrow: DataFrame,
    vec_sql: str,
    books: list[list[list[int]]],
    keep: list[str],
) -> DataFrame:
    """The query-side ADC lookup table as ROWS: (keep..., j, code,
    qdist) from one broadcastable query frame — the relational twin of
    the literal per-(j, code) LUT arrays, same exact int64 distances."""
    d = len(books[0][0])
    bt = _pq_books_table(qrow.sparkSession, books)
    qd = (
        f"aggregate(zip_with(slice({vec_sql}, j * {d} + 1, {d}), cvec, "
        "(x, y) -> (x - y) * (x - y)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return qrow.crossJoin(F.broadcast(bt)).selectExpr(
        *keep, "j", "code", f"{qd} AS qdist"
    )


def _pq_code_exprs(eq_sql: str, books: list[list[list[int]]]) -> list[str]:
    """Per-subspace nearest-centroid assignment, each as ONE parsed
    int64 expression (the _argmin_bucket_sql min-encode idiom over the
    subvector slice). The lambda-based sqdist is the RIGHT form here:
    an experiment replacing it with fully-unrolled element_at
    arithmetic (128 sqdists x 16 element_at refs) blew the JVM 64 KB
    generated-method limit — janino compile failures, interpreted
    fallback, and a recompile attempt per execution made every PQ
    query 2-3x SLOWER. Keep expressions under the codegen method
    budget; interpreted higher-order functions on 8-element arrays are
    cheaper than broken codegen."""
    m = len(books)
    d = len(books[0][0])
    out = []
    for j in range(m):
        sub = f"slice({eq_sql}, {j * d + 1}, {d})"
        out.append(
            _argmin_bucket_sql(sub, {i: c for i, c in enumerate(books[j])}, len(books[j]))
        )
    return out


def pq_encode(
    embeddings: DataFrame,
    books: list[list[list[int]]] | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Ingest-time PQ encoding: (id, codes array<int>) — the compressed
    index a production deployment stores and scans instead of the float
    vectors. One projection pass, no shuffle."""
    books = books or pq_codebooks()
    codes = ", ".join(_pq_code_exprs("eq", books))
    return embeddings.selectExpr(
        f"{id_col} AS vid", f"{_quant_sql('embedding')} AS eq"
    ).selectExpr("vid", f"array({codes}) AS codes")


def topk_pq(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Top-k cosine via PQ + asymmetric distance computation: the
    query row builds a PQ_M x PQ_K lookup table of exact int64 squared
    distances from its quantized subvectors to every codebook centroid
    (ONE row's work, broadcast), every corpus row pays PQ_M lookups on
    its codes, and the smallest ``rescore * k`` approximate distances
    are exact-rescored against the full-precision vectors — the
    compressed-scan/point-lookup split of topk_int8, at 1/64 instead
    of 1/4 of the bytes. Candidate and final ranking use the min-int /
    rounded-score + id-tiebreak idioms, so the DuckDB twin replays
    both phases bit-for-bit."""
    books = books or pq_codebooks()
    eq = _quant_sql("embedding")
    # RELATIONAL encode + LUT (_pq_codes_rel/_pq_lut_rel): the m*k
    # literal distance expressions cost ~1 s of driver plan time per
    # query (round-14 measurement); the broadcast-table form computes
    # the identical exact int64 codes/distances, and the ADC sum is
    # the same m lookups per vector — here as a (j, code) join +
    # per-vid sum of the same integers (order-independent).
    codes = _pq_codes_rel(
        embeddings.selectExpr(f"{id_col} AS vid", f"{eq} AS eq"),
        "eq", books, ["vid"],
    )
    qlut = _pq_lut_rel(
        embeddings.filter(F.col(id_col) == query_id).selectExpr(f"{eq} AS eq"),
        "eq", books, [],
    )
    cands = (
        codes.filter(F.col("vid") != query_id)
        .join(F.broadcast(qlut), ["j", "code"])
        .groupBy("vid")
        .agg(F.sum("qdist").cast("long").alias("adist"))
        .orderBy(F.asc("adist"), F.asc("vid"))
        .limit(rescore * k)
        .select("vid")
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qfull = full.filter((F.col("vid") == query_id) & (F.col("nrm") > 0)).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    exact = (
        full.filter(F.col("nrm") > 0)
        .join(F.broadcast(cands), "vid")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vid",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
    )
    return (
        exact.orderBy(F.desc("score"), F.asc("vid"))
        .limit(k)
        .select(F.col("vid").alias(id_col), "score")
    )


def topk_pq_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> str:
    """DuckDB twin of :func:`topk_pq`: identical integer codebooks,
    min-encoded argmin assignment, LUT build on the query row, ADC
    sum, and rounded-cosine rescore."""
    books = books or pq_codebooks()
    m, d = len(books), len(books[0][0])
    kc = len(books[0])

    def lit(c: list[int]) -> str:
        return "[" + ", ".join(str(v) for v in c) + "]::BIGINT[]"

    def sqd(sub: str, c: list[int]) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sub}, {lit(c)}), "
            "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
        )

    code_cols = []
    for j in range(m):
        sub = f"eq[{j * d + 1}:{(j + 1) * d}]"
        terms = ", ".join(
            f"({sqd(sub, c)} * {kc} + {i})" for i, c in enumerate(books[j])
        )
        code_cols.append(f"CAST(least({terms}) % {kc} AS INT) AS code{j}")
    lut_cols = []
    for j in range(m):
        sub = f"eq[{j * d + 1}:{(j + 1) * d}]"
        dists = ", ".join(sqd(sub, c) for c in books[j])
        lut_cols.append(f"[{dists}] AS lut{j}")
    adist = " + ".join(f"lut.lut{j}[c.code{j} + 1]" for j in range(m))
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"
        " / (e.nrm * q.q_nrm)"
    )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    c AS (SELECT vid, {', '.join(code_cols)} FROM e),
    lut AS (SELECT {', '.join(lut_cols)} FROM e WHERE vid = {query_id}),
    cands AS (
      SELECT c.vid FROM c, lut WHERE c.vid <> {query_id}
      ORDER BY ({adist}) ASC, c.vid ASC LIMIT {rescore * k}),
    q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e
          WHERE vid = {query_id} AND nrm > 0)
    SELECT e.vid AS {id_col},
           floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM e JOIN cands USING (vid), q
    WHERE e.nrm > 0
    ORDER BY score DESC, e.vid ASC LIMIT {k}
    """


def topk_pq_batch(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> DataFrame:
    """PQ serving at scale answers query BATCHES: N query LUTs build
    from N rows' work and broadcast, the 1/64-size code table scans
    ONCE for all of them (the per-query loop re-scans it N times), and
    only the per-query ``rescore * k`` nominees touch the float
    vectors. The candidate cut reuses topk_batch's two-phase top-k —
    an Arrow-batched partial head inside the scan stage (each batch
    emits at most queries x rescore*k rows), then one window over the
    survivors — so shuffled bytes are independent of corpus size.
    Per-query results are IDENTICAL to ``topk_pq`` with the same
    budget (same min-int candidate rule, same rounded-cosine rescore;
    parity-pinned), and with an unbinding budget equal to brute force.
    Returns (query_id, rank, vec_id, score)."""
    from collections.abc import Iterator

    import pandas as pd

    books = books or pq_codebooks()
    m, d = len(books), len(books[0][0])
    eq = _quant_sql("embedding")
    code_exprs = _pq_code_exprs("eq", books)
    corpus = embeddings.selectExpr(
        f"{id_col} AS vid", f"{eq} AS eq"
    ).selectExpr(
        "vid",
        *[f"{ce} AS code{j}" for j, ce in enumerate(code_exprs)],
    )
    lut_exprs = []
    for j in range(m):
        sub = f"slice(eq, {j * d + 1}, {d})"
        dists = ", ".join(_sqdist_lits_sql(sub, c) for c in books[j])
        lut_exprs.append(f"array({dists}) AS lut{j}")
    qluts = (
        embeddings.filter(F.col(id_col).isin(query_ids))
        .selectExpr(f"{id_col} AS query_id", f"{eq} AS eq")
        .selectExpr("query_id", *lut_exprs)
    )
    adist = " + ".join(f"element_at(lut{j}, code{j} + 1)" for j in range(m))
    scored = (
        corpus.crossJoin(F.broadcast(qluts))
        .filter(F.col("vid") != F.col("query_id"))
        .selectExpr("query_id", "vid", f"({adist}) AS adist")
    )
    n_cand = rescore * k

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield (
                pdf.sort_values(["query_id", "adist", "vid"])
                .groupby("query_id", sort=False)
                .head(n_cand)
            )

    survivors = scored.mapInPandas(
        local_topk, "query_id bigint, vid bigint, adist bigint"
    )
    from pyspark.sql import Window

    wc = Window.partitionBy("query_id").orderBy(F.asc("adist"), F.asc("vid"))
    cands = (
        survivors.withColumn("_r", F.row_number().over(wc))
        .filter(F.col("_r") <= n_cand)
        .select("query_id", "vid")
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qfull = full.filter(
        F.col("vid").isin(query_ids) & (F.col("nrm") > 0)
    ).select(
        F.col("vid").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    exact = (
        full.filter(F.col("nrm") > 0)
        .join(F.broadcast(cands), "vid")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id",
            "vid",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vid"))
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("vid").alias(id_col), "score")
    )


def topk_pq_batch_sql(
    table: str,
    query_ids: list[int],
    k: int = 10,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> str:
    """DuckDB twin of :func:`topk_pq_batch`: identical codes, per-query
    LUTs, per-query min-int candidate windows, rounded-cosine rescore
    windows."""
    books = books or pq_codebooks()
    m, d = len(books), len(books[0][0])
    kc = len(books[0])

    def lit(c: list[int]) -> str:
        return "[" + ", ".join(str(v) for v in c) + "]::BIGINT[]"

    def sqd(sub: str, c: list[int]) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sub}, {lit(c)}), "
            "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
        )

    code_cols = []
    for j in range(m):
        sub = f"eq[{j * d + 1}:{(j + 1) * d}]"
        terms = ", ".join(
            f"({sqd(sub, c)} * {kc} + {i})" for i, c in enumerate(books[j])
        )
        code_cols.append(f"CAST(least({terms}) % {kc} AS INT) AS code{j}")
    lut_cols = []
    for j in range(m):
        sub = f"eq[{j * d + 1}:{(j + 1) * d}]"
        dists = ", ".join(sqd(sub, c) for c in books[j])
        lut_cols.append(f"[{dists}] AS lut{j}")
    adist = " + ".join(f"lut.lut{j}[c.code{j} + 1]" for j in range(m))
    ids = ", ".join(str(i) for i in query_ids)
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"
        " / (e.nrm * q.q_nrm)"
    )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    c AS MATERIALIZED (SELECT vid, {', '.join(code_cols)} FROM e),
    lut AS MATERIALIZED (
      SELECT vid AS query_id, {', '.join(lut_cols)}
      FROM e WHERE vid IN ({ids})),
    cands AS (
      SELECT query_id, vid FROM (
        SELECT lut.query_id, c.vid,
               row_number() OVER (PARTITION BY lut.query_id
                                  ORDER BY ({adist}) ASC, c.vid ASC) AS r
        FROM c, lut WHERE c.vid <> lut.query_id)
      WHERE r <= {rescore * k}),
    q AS (SELECT vid AS query_id, embedding AS q_emb, nrm AS q_nrm
          FROM e WHERE vid IN ({ids}) AND nrm > 0),
    rescored AS (
      SELECT q.query_id, e.vid,
             floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
      FROM e
      JOIN cands ON cands.vid = e.vid
      JOIN q ON q.query_id = cands.query_id
      WHERE e.nrm > 0)
    SELECT query_id, CAST(rank AS INT) AS rank, vid AS {id_col}, score FROM (
      SELECT query_id, vid, score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, vid ASC) AS rank
      FROM rescored)
    WHERE rank <= {k}
    """


def train_pq(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 2,
) -> list[list[list[int]]]:
    """Deterministic per-subspace Lloyd refinement of the fixed PQ
    init (:func:`pq_codebooks`) — the live half of the ``books=``
    seam. Same determinism contract as :func:`train_ivf_kmeans`
    (exact int64 assignment, int64 component sums, ONE double
    division + floor per centroid component), applied independently
    in each subspace.

    One Spark pass per ITERATION covers ALL subspaces: every row
    explodes into m (subspace, assigned-centroid, subvector) entries
    and a single groupBy((j, bucket)) folds the component sums — the
    shuffle count is `iters`, not `iters * m`. Driver state is
    m x k x d integers (the offline-trained constants a 100 TB
    deployment ships to its query layer). A centroid that loses all
    members keeps its INIT row — PQ codes index codebook POSITIONS,
    so the book must stay k-long (unlike IVF, where an empty cluster
    can simply drop)."""
    init = pq_codebooks(m=m, k=k)
    eqall = embeddings.select(F.expr(_quant_sql("embedding")).alias("eqa"))
    return _train_pq_lloyd(eqall, init, k, iters)


def _train_pq_lloyd(
    eqall: DataFrame, init: list[list[list[int]]], k: int, iters: int
) -> list[list[list[int]]]:
    """The shared per-subspace Lloyd loop over an ``eqa`` int-array
    column (raw quantized vectors for :func:`train_pq`, coarse-cell
    residuals for :func:`train_pq_residuals`). One Spark pass per
    iteration covers ALL subspaces; dead centroids keep their previous
    row (codes index codebook positions)."""
    m = len(init)
    d = len(init[0][0])
    books = [[list(c) for c in init[j]] for j in range(m)]
    # Persist the input column across iterations: for the residual
    # trainer eqa embeds quantize + coarse argmin + zip_with residual,
    # re-derived on every pass without this (guide §5). Unpersisted on
    # every exit path below.
    persisted = iters > 1
    if persisted:
        eqall = eqall.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _pq_lloyd_iters(eqall, books, m, d, k, iters)
    finally:
        if persisted:
            eqall.unpersist()


def _pq_lloyd_iters(
    eqall: DataFrame,
    books: list[list[list[int]]],
    m: int,
    d: int,
    k: int,
    iters: int,
) -> list[list[list[int]]]:
    for _ in range(iters):
        entries = []
        for j in range(m):
            sub = f"slice(eqa, {j * d + 1}, {d})"
            argmin = _argmin_bucket_sql(
                sub, {i: c for i, c in enumerate(books[j])}, k
            )
            entries.append(
                f"named_struct('j', {j}, 'bucket', {argmin}, 'sub', {sub})"
            )
        exploded = eqall.selectExpr(f"inline(array({', '.join(entries)}))")
        rows = (
            exploded.groupBy("j", "bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("sub", i + 1)).alias(f"s{i}")
                    for i in range(d)
                ],
            )
            .collect()
        )
        for r in rows:
            # mirror train_ivf_kmeans: CAST(sum AS DOUBLE)/n then
            # floor(x+0.5) — bit-stable while |sum| < 2^53
            books[int(r["j"])][int(r["bucket"])] = [
                int(math.floor(float(r[f"s{i}"]) / r["n"] + 0.5))
                for i in range(d)
            ]
    return books


def _cents_map_sql(cents: dict[int, list[int]]) -> str:
    """Spark-SQL literal MAP bucket -> integer centroid: trained cell
    sets may have holes (train_ivf_kmeans drops empty clusters), so
    positional array indexing is wrong there — key lookup is not."""
    return (
        "map("
        + ", ".join(f"{b}, {_int_arr_sql(c)}" for b, c in sorted(cents.items()))
        + ")"
    )


def train_pq_residuals(
    embeddings: DataFrame,
    cents: dict[int, list[int]],
    n_cells: int,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 2,
) -> list[list[list[int]]]:
    """Train the PQ codebooks on coarse-cell RESIDUALS — the production
    IVF-PQ configuration (the canonical billion-scale layout trains
    books on x - centroid(cell(x)), which concentrates the subvector
    distribution and buys most of PQ's accuracy at high k). ``cents``
    is a :func:`train_ivf_kmeans` result (or any integer cell dict on
    the IVF_SCALE grid). Same determinism contract as
    :func:`train_pq`: exact int64 assignment and sums, one double
    division + floor per component, so the DuckDB twin
    (:func:`topk_ivfpq_trained_sql`) unrolls to bit-equal books."""
    cbm = _cents_map_sql(cents)
    eqall = (
        embeddings.selectExpr(f"{_quant_sql('embedding')} AS eq")
        .selectExpr(
            "eq", f"{_argmin_bucket_sql('eq', cents, n_cells)} AS bucket"
        )
        .selectExpr(
            f"zip_with(eq, element_at({cbm}, bucket), (x, y) -> x - y) AS eqa"
        )
    )
    return _train_pq_lloyd(eqall, pq_codebooks(m=m, k=k, seed=321), k, iters)


def topk_pq_trained_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
    m: int = PQ_M,
    kc: int = PQ_K,
    iters: int = 2,
) -> str:
    """DuckDB twin of ``topk_pq(books=train_pq(df, iters=...))`` — the
    LEARNED-codebook PQ value-checked end to end, the same move
    topk_ivf_sql makes for the IVF trainer: the per-subspace Lloyd
    iterations unroll as CTE pairs from the identical integer init,
    every step exact int64 or the one shared double-division idiom,
    dead centroids inherited from the previous round (train_pq keeps
    them — codes index positions). ADC here is a JOIN of the code
    table against the query's (subspace, centroid) distance rows —
    set-equivalent to the Spark side's literal-LUT lookups."""
    init = pq_codebooks(m=m, k=kc)
    d = len(init[0][0])
    bvalues = ", ".join(
        f"({j}, {b}, [{', '.join(str(v) for v in c)}]::BIGINT[])"
        for j in range(m)
        for b, c in enumerate(init[j])
    )
    dist = (
        "CAST(list_sum(list_transform(list_zip(s.sub, b.cq), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    ctes = [
        f"b0(j, bucket, cq) AS (VALUES {bvalues})",
        f"""e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table})""",
        f"""s AS MATERIALIZED (
      SELECT vid, js.j, list_slice(eq, js.j * {d} + 1, (js.j + 1) * {d}) AS sub
      FROM e, (SELECT unnest(generate_series(0, {m - 1})) AS j) js)""",
    ]
    prev = "b0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""a{i} AS (
      SELECT s.vid, s.j, any_value(s.sub) AS sub,
             CAST(min({dist} * {kc} + b.bucket) % {kc} AS INT) AS bucket
      FROM s JOIN {prev} b ON b.j = s.j GROUP BY s.vid, s.j)"""
        )
        ctes.append(
            f"""u{i} AS (
      SELECT j, bucket, list(cv ORDER BY idx) AS cq FROM (
        SELECT j, bucket, idx,
               CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
        FROM (SELECT j, bucket, unnest(sub) AS v,
                     generate_subscripts(sub, 1) AS idx FROM a{i})
        GROUP BY j, bucket, idx)
      GROUP BY j, bucket)"""
        )
        ctes.append(
            f"""b{i} AS (
      SELECT * FROM u{i}
      UNION ALL
      SELECT p.* FROM {prev} p
      WHERE NOT EXISTS (SELECT 1 FROM u{i} n
                        WHERE n.j = p.j AND n.bucket = p.bucket))"""
        )
        prev = f"b{i}"
    ctes.append(
        f"""codes AS (
      SELECT s.vid, s.j,
             CAST(min({dist} * {kc} + b.bucket) % {kc} AS INT) AS bucket
      FROM s JOIN {prev} b ON b.j = s.j GROUP BY s.vid, s.j)"""
    )
    ctes.append(
        f"""lq AS (
      SELECT b.j, b.bucket, {dist} AS qdist
      FROM s JOIN {prev} b ON b.j = s.j WHERE s.vid = {query_id})"""
    )
    ctes.append(
        f"""cands AS (
      SELECT c.vid FROM codes c
      JOIN lq ON lq.j = c.j AND lq.bucket = c.bucket
      WHERE c.vid <> {query_id}
      GROUP BY c.vid
      ORDER BY CAST(sum(qdist) AS BIGINT) ASC, c.vid ASC
      LIMIT {rescore * k})"""
    )
    ctes.append(
        f"q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e"
        f" WHERE vid = {query_id} AND nrm > 0)"
    )
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"
        " / (e.nrm * q.q_nrm)"
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT e.vid AS {id_col},
           floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM e JOIN cands USING (vid), q
    WHERE e.nrm > 0
    ORDER BY score DESC, e.vid ASC LIMIT {k}
    """


def pq_near_dups(
    embeddings: DataFrame,
    min_band_matches: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via PQ-code collision blocking: each
    subspace code is an LSH band key — vectors sharing the SAME
    centroid in at least ``min_band_matches`` of the PQ_M subspaces
    become candidate pairs (a join on (subspace, code), never an
    all-pairs scan), and candidates are verified with the exact
    rounded cosine against ``threshold``. The band join runs on the
    CODE table — 1/64 of the float bytes — so at 100 TB the pair
    generation never touches the embedding column; only verified
    nominees pay the two float point-lookups. Codes are deterministic
    integer arithmetic, so the DuckDB twin replays the same blocking
    and verification bit-for-bit.

    ``max_bucket`` bounds band-bucket skew: a (subspace, code) bucket
    larger than the cap leaves candidate generation — an over-popular
    code (a degenerate/low-variance corpus region) costs bucket² pairs
    and discriminates nothing, the same too-generic-key rule as the
    shingle index's max_df and entity_match's max_block. Expected
    bucket size is n/PQ_K, so the cap only fires on true skew."""
    books = books or pq_codebooks()
    m = len(books)
    # pin the code table: it feeds BOTH sides of the band self-join
    # (and the bucket-size guard), and recomputing the 8-argmin encode
    # per consumer multiplied the corpus scans; in production the code
    # table is a PERSISTED artifact (pq_encode is the ingest pass), so
    # materializing it here mirrors the deployment shape
    codes = pq_encode(embeddings, books, id_col).localCheckpoint(eager=True)
    bands = codes.select(
        "vid",
        F.explode(
            F.arrays_zip(
                F.array(*[F.lit(j) for j in range(m)]).alias("j"),
                F.col("codes").alias("code"),
            )
        ).alias("z"),
    ).select("vid", F.col("z.j").alias("j"), F.col("z.code").alias("code"))
    if max_bucket is not None:
        keep = (
            bands.groupBy("j", "code")
            .agg(F.count(F.lit(1)).alias("_ct"))
            .filter(F.col("_ct") <= max_bucket)
            .select("j", "code")
        )
        bands = bands.join(keep, ["j", "code"])
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .groupBy(F.col("a.vid").alias("id_a"), F.col("b.vid").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
        .filter(F.col("n_bands") >= min_band_matches)
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    fa = full.select(
        F.col("vid").alias("id_a"),
        F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    fb = full.select(
        F.col("vid").alias("id_b"),
        F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    thr_bp = int(math.floor(threshold * 10000 + 0.5))
    return (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_bands",
            (
                F.floor(
                    _dot(F.col("emb_a"), F.col("emb_b"))
                    / (F.col("nrm_a") * F.col("nrm_b"))
                    * 10000
                    + F.lit(0.5)
                )
            ).cast("long").alias("score_bp"),
        )
        .filter(F.col("score_bp") >= thr_bp)
        .orderBy("id_a", "id_b")
    )


def pq_near_dups_sql(
    table: str,
    min_band_matches: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> str:
    """DuckDB twin of :func:`pq_near_dups`: identical code assignment
    (min-encode argmin on literal integer codebooks), identical band
    join + collision count, identical rounded-cosine verification."""
    books = books or pq_codebooks()
    m, kc = len(books), len(books[0])
    d = len(books[0][0])

    def lit(c: list[int]) -> str:
        return "[" + ", ".join(str(v) for v in c) + "]::BIGINT[]"

    def sqd(sub: str, c: list[int]) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sub}, {lit(c)}), "
            "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
        )

    code_cols = []
    for j in range(m):
        sub = f"eq[{j * d + 1}:{(j + 1) * d}]"
        terms = ", ".join(
            f"({sqd(sub, c)} * {kc} + {i})" for i, c in enumerate(books[j])
        )
        code_cols.append(f"CAST(least({terms}) % {kc} AS INT) AS code{j}")
    band_rows = " UNION ALL ".join(
        f"SELECT vid, {j} AS j, code{j} AS code FROM c" for j in range(m)
    )
    thr_bp = int(math.floor(threshold * 10000 + 0.5))
    cos = (
        "list_inner_product(fa.embedding::DOUBLE[], fb.embedding::DOUBLE[])"
        " / (fa.nrm * fb.nrm)"
    )
    return f"""
    WITH e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    c AS MATERIALIZED (SELECT vid, {', '.join(code_cols)} FROM e),
    bands AS MATERIALIZED ({band_rows}),
    cand AS (
      SELECT a.vid AS id_a, b.vid AS id_b, CAST(count(*) AS BIGINT) AS n_bands
      FROM bands a JOIN bands b
        ON a.j = b.j AND a.code = b.code AND a.vid < b.vid
      GROUP BY a.vid, b.vid
      HAVING count(*) >= {min_band_matches})
    SELECT id_a, id_b, n_bands,
           CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS score_bp
    FROM cand
    JOIN e fa ON fa.vid = id_a AND fa.nrm > 0
    JOIN e fb ON fb.vid = id_b AND fb.nrm > 0
    WHERE floor(({cos}) * 10000 + 0.5) >= {thr_bp}
    ORDER BY id_a, id_b
    """


# ---------------------------------------------------------------------------
# IVF-PQ: coarse inverted-file cells + product-quantized RESIDUALS —
# the canonical billion-scale ANN layout (a probe reads nprobe cells'
# code lists; vectors store as cell id + PQ_M sub-codes of the residual
# against their cell centroid). Everything is exact int64 on the
# IVF_SCALE grid: residual = quantized vector minus integer centroid,
# codes = argmin over integer residual books, ADC = a JOIN of the code
# rows against the query's per-(cell, subspace, code) distance rows —
# so the DuckDB twin replays cell routing, encoding, and scoring
# bit-for-bit, and the exact rescore fixes the final ranking.
# ---------------------------------------------------------------------------


def topk_ivfpq(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    n_cells: int = 16,
    nprobe: int = 4,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """Top-k cosine via IVF-PQ + ADC: route every vector to its nearest
    coarse cell (integer argmin over the cell centroids), PQ-encode
    the RESIDUAL against the cell centroid, probe the query's ``nprobe``
    nearest cells, score each candidate with PQ_M lookups against the
    query's per-cell residual distance table, and exact-rescore the best
    ``rescore * k``. At rest a vector is one cell id + PQ_M sub-codes;
    a probe touches nprobe/n_cells of the code table and the float
    column only for the rescore nominees.

    ``cents``/``books`` are the train-once/probe-many seam: pass a
    :func:`train_ivf_kmeans` cell dict (ids must stay < n_cells; holes
    from dropped empty clusters are fine — residual lookup is by map
    key, not array position) and :func:`train_pq_residuals` books for
    the fully TRAINED configuration; omitted, both fall back to the
    fixed shipped-constants index."""
    books = books or pq_codebooks(seed=321)
    m, d = len(books), len(books[0][0])
    kc = len(books[0])
    if cents is None:
        cents = {
            b: [int(math.floor(v * IVF_SCALE + 0.5)) for v in row]
            for b, row in enumerate(ivf_centroids(n_clusters=n_cells))
        }
    cb = _cents_map_sql(cents)
    eq = _quant_sql("embedding")
    res = f"zip_with(eq, element_at({cb}, bucket), (x, y) -> x - y)"
    # assigned feeds TWO differing subtrees (the corpus code table and
    # the query's probe rows) — pin it so the scan + coarse argmin run
    # once (guide §2.4). The PQ encode and the query LUT are the
    # RELATIONAL forms (_pq_codes_rel/_pq_lut_rel): exact same int64
    # min-encode arithmetic, but the codebooks are a broadcast TABLE
    # instead of m*k literal distance expressions — the literal plan
    # cost ~1.2 s of driver time per query just to parse/analyze
    # (measured round 14; values proven identical).
    from ...functions.pin import pin

    assigned = pin(
        embeddings.selectExpr(f"{id_col} AS vid", f"{eq} AS eq")
        .selectExpr(
            "vid", "eq", f"{_argmin_bucket_sql('eq', cents, n_cells)} AS bucket"
        )
        .selectExpr("vid", "eq", "bucket", f"{res} AS res")
    )
    codes = _pq_codes_rel(assigned, "res", books, ["vid", "bucket"])
    # query: nprobe nearest cells by exact integer distance (ties ->
    # lowest cell id via the min-encode idiom), then one residual per
    # probed cell -> (bucket, j, code, qdist) LUT rows
    cell_dists = ", ".join(
        f"named_struct('enc', {_sqdist_lits_sql('eq', cq)} * {n_cells} + {b})"
        for b, cq in sorted(cents.items())
    )
    probes = (
        assigned.filter(F.col("vid") == query_id)
        .selectExpr("eq", f"slice(array_sort(array({cell_dists})), 1, {nprobe}) AS ps")
        .selectExpr("eq", "explode(ps.enc) AS enc")
        .selectExpr("eq", f"CAST(pmod(enc, {n_cells}) AS INT) AS bucket")
        .selectExpr("bucket", f"{res} AS qres")
    )
    lut = _pq_lut_rel(probes, "qres", books, ["bucket"])
    cand = (
        codes.filter(F.col("vid") != query_id)
        .join(F.broadcast(lut), ["bucket", "j", "code"])
        .groupBy("vid")
        .agg(F.sum("qdist").cast("long").alias("adist"))
        .filter(F.col("adist").isNotNull())
        .orderBy(F.asc("adist"), F.asc("vid"))
        .limit(rescore * k)
        .select("vid")
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qfull = full.filter((F.col("vid") == query_id) & (F.col("nrm") > 0)).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    exact = (
        full.filter(F.col("nrm") > 0)
        .join(F.broadcast(cand), "vid")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vid",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
    )
    return (
        exact.orderBy(F.desc("score"), F.asc("vid"))
        .limit(k)
        .select(F.col("vid").alias(id_col), "score")
    )


def topk_ivfpq_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    n_cells: int = 16,
    nprobe: int = 4,
    rescore: int = 4,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
) -> str:
    """DuckDB twin of :func:`topk_ivfpq`: identical cell routing
    (min-encode argmin on literal integer centroids), identical
    residual PQ codes, identical (cell, subspace, code) LUT join and
    rounded-cosine rescore."""
    books = books or pq_codebooks(seed=321)
    m, d = len(books), len(books[0][0])
    kc = len(books[0])
    cents = [
        [int(math.floor(v * IVF_SCALE + 0.5)) for v in row]
        for row in ivf_centroids(n_clusters=n_cells)
    ]

    def lit(c: list[int]) -> str:
        return "[" + ", ".join(str(v) for v in c) + "]::BIGINT[]"

    def sqd(sub: str, c: list[int]) -> str:
        return (
            f"CAST(list_sum(list_transform(list_zip({sub}, {lit(c)}), "
            "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
        )

    cvalues = ", ".join(f"({b}, {lit(c)})" for b, c in enumerate(cents))
    dist_e = (
        "CAST(list_sum(list_transform(list_zip(e.eq, cb.cq), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    code_cols = []
    for j in range(m):
        sub = f"res[{j * d + 1}:{(j + 1) * d}]"
        terms = ", ".join(
            f"({sqd(sub, c)} * {kc} + {i})" for i, c in enumerate(books[j])
        )
        code_cols.append(f"CAST(least({terms}) % {kc} AS INT) AS code{j}")
    band_rows = " UNION ALL ".join(
        f"SELECT vid, bucket, {j} AS j, code{j} AS code FROM enc" for j in range(m)
    )
    lut_rows = []
    for j in range(m):
        sub = f"qres[{j * d + 1}:{(j + 1) * d}]"
        for c, cvec in enumerate(books[j]):
            lut_rows.append(
                f"SELECT bucket, {j} AS j, {c} AS code, {sqd(sub, cvec)} AS qdist"
                " FROM qr"
            )
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"
        " / (e.nrm * q.q_nrm)"
    )
    return f"""
    WITH cb(bucket, cq) AS (VALUES {cvalues}),
    e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    a AS MATERIALIZED (
      SELECT e.vid, any_value(e.eq) AS eq,
             CAST(min({dist_e} * {n_cells} + cb.bucket) % {n_cells} AS INT) AS bucket
      FROM e, cb GROUP BY e.vid),
    r AS MATERIALIZED (
      SELECT a.vid, a.bucket,
             list_transform(list_zip(a.eq, cb.cq), z -> z[1] - z[2]) AS res
      FROM a JOIN cb USING (bucket)),
    enc AS MATERIALIZED (SELECT vid, bucket, {', '.join(code_cols)} FROM r),
    bands AS ({band_rows}),
    probes AS (
      SELECT cb.bucket, a.eq FROM a, cb WHERE a.vid = {query_id}
      ORDER BY CAST(list_sum(list_transform(list_zip(a.eq, cb.cq),
                    z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT), cb.bucket
      LIMIT {nprobe}),
    qr AS MATERIALIZED (
      SELECT p.bucket,
             list_transform(list_zip(p.eq, cb.cq), z -> z[1] - z[2]) AS qres
      FROM probes p JOIN cb USING (bucket)),
    lut AS MATERIALIZED ({' UNION ALL '.join(lut_rows)}),
    cands AS (
      SELECT b.vid FROM bands b
      JOIN lut ON lut.bucket = b.bucket AND lut.j = b.j AND lut.code = b.code
      WHERE b.vid <> {query_id}
      GROUP BY b.vid
      ORDER BY CAST(sum(qdist) AS BIGINT) ASC, b.vid ASC
      LIMIT {rescore * k}),
    q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e
          WHERE vid = {query_id} AND nrm > 0)
    SELECT e.vid AS {id_col},
           floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM e JOIN cands USING (vid), q
    WHERE e.nrm > 0
    ORDER BY score DESC, e.vid ASC LIMIT {k}
    """


def topk_ivfpq_trained_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    n_cells: int = 16,
    nprobe: int = 4,
    rescore: int = 4,
    id_col: str = "vec_id",
    coarse_iters: int = 2,
    book_iters: int = 2,
    m: int = PQ_M,
    kc: int = PQ_K,
) -> str:
    """DuckDB twin of the fully TRAINED IVF-PQ — the actual production
    configuration of the canonical billion-scale layout:
    ``topk_ivfpq(cents=train_ivf_kmeans(...),
    books=train_pq_residuals(...))`` value-checked end to end. Composes
    the two unrolled-CTE trainers this module already proves
    separately: the coarse Lloyd pairs from :func:`topk_ivf_sql`
    (empty cells DROP — no centroid row) feed residual computation,
    the per-subspace residual Lloyd pairs from
    :func:`topk_pq_trained_sql` (dead book centroids INHERIT — codes
    index positions) feed a relational join-ADC (books live in a CTE,
    not literals — set-equivalent to the Spark side's literal LUT).
    Every training step is exact int64 or the one shared
    double-division idiom, so cells, books, codes, probe set and
    result all match the Spark path bit-for-bit."""
    d = _DIM // m
    coarse_init = ivf_centroids(n_clusters=n_cells)
    cvalues = ", ".join(
        f"({b}, [{', '.join(str(int(math.floor(v * IVF_SCALE + 0.5))) for v in row)}]::BIGINT[])"
        for b, row in enumerate(coarse_init)
    )
    book_init = pq_codebooks(m=m, k=kc, seed=321)
    bvalues = ", ".join(
        f"({j}, {b}, [{', '.join(str(v) for v in c)}]::BIGINT[])"
        for j in range(m)
        for b, c in enumerate(book_init[j])
    )
    dist_c = (
        "CAST(list_sum(list_transform(list_zip(e.eq, c.cq), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    dist_b = (
        "CAST(list_sum(list_transform(list_zip(s.sub, b.cq), "
        "z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    ctes = [
        f"c0(bucket, cq) AS (VALUES {cvalues})",
        f"pb0(j, bucket, cq) AS (VALUES {bvalues})",
        f"""e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table})""",
    ]
    prev_c = "c0"
    for i in range(1, coarse_iters + 1):
        ctes.append(
            f"""a{i} AS (
      SELECT e.vid, any_value(e.eq) AS eq,
             CAST(min({dist_c} * {n_cells} + c.bucket) % {n_cells} AS INT) AS bucket
      FROM e, {prev_c} c GROUP BY e.vid)"""
        )
        ctes.append(
            f"""c{i} AS (
      SELECT bucket, list(cv ORDER BY idx) AS cq FROM (
        SELECT bucket, idx, CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
        FROM (SELECT bucket, unnest(eq) AS v, generate_subscripts(eq, 1) AS idx FROM a{i})
        GROUP BY bucket, idx)
      GROUP BY bucket)"""
        )
        prev_c = f"c{i}"
    ctes.append(
        f"""af AS MATERIALIZED (
      SELECT e.vid, any_value(e.eq) AS eq,
             CAST(min({dist_c} * {n_cells} + c.bucket) % {n_cells} AS INT) AS bucket
      FROM e, {prev_c} c GROUP BY e.vid)"""
    )
    ctes.append(
        f"""r AS MATERIALIZED (
      SELECT af.vid, af.bucket AS cell,
             list_transform(list_zip(af.eq, c.cq), z -> z[1] - z[2]) AS res
      FROM af JOIN {prev_c} c USING (bucket))"""
    )
    ctes.append(
        f"""s AS MATERIALIZED (
      SELECT vid, cell, js.j,
             list_slice(res, js.j * {d} + 1, (js.j + 1) * {d}) AS sub
      FROM r, (SELECT unnest(generate_series(0, {m - 1})) AS j) js)"""
    )
    prev_b = "pb0"
    for i in range(1, book_iters + 1):
        ctes.append(
            f"""pa{i} AS (
      SELECT s.vid, s.j, any_value(s.sub) AS sub,
             CAST(min({dist_b} * {kc} + b.bucket) % {kc} AS INT) AS bucket
      FROM s JOIN {prev_b} b ON b.j = s.j GROUP BY s.vid, s.j)"""
        )
        ctes.append(
            f"""pu{i} AS (
      SELECT j, bucket, list(cv ORDER BY idx) AS cq FROM (
        SELECT j, bucket, idx,
               CAST(floor(CAST(sum(v) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS cv
        FROM (SELECT j, bucket, unnest(sub) AS v,
                     generate_subscripts(sub, 1) AS idx FROM pa{i})
        GROUP BY j, bucket, idx)
      GROUP BY j, bucket)"""
        )
        ctes.append(
            f"""pb{i} AS (
      SELECT * FROM pu{i}
      UNION ALL
      SELECT p.* FROM {prev_b} p
      WHERE NOT EXISTS (SELECT 1 FROM pu{i} n
                        WHERE n.j = p.j AND n.bucket = p.bucket))"""
        )
        prev_b = f"pb{i}"
    ctes.append(
        f"""codes AS (
      SELECT s.vid, s.j, any_value(s.cell) AS cell,
             CAST(min({dist_b} * {kc} + b.bucket) % {kc} AS INT) AS code
      FROM s JOIN {prev_b} b ON b.j = s.j GROUP BY s.vid, s.j)"""
    )
    ctes.append(
        f"""probes AS (
      SELECT c.bucket FROM e, {prev_c} c WHERE e.vid = {query_id}
      ORDER BY {dist_c}, c.bucket LIMIT {nprobe})"""
    )
    ctes.append(
        f"""qr AS MATERIALIZED (
      SELECT p.bucket AS cell,
             list_transform(list_zip(e.eq, c.cq), z -> z[1] - z[2]) AS res
      FROM probes p JOIN {prev_c} c ON c.bucket = p.bucket, e
      WHERE e.vid = {query_id})"""
    )
    ctes.append(
        f"""qs AS (
      SELECT cell, js.j,
             list_slice(res, js.j * {d} + 1, (js.j + 1) * {d}) AS sub
      FROM qr, (SELECT unnest(generate_series(0, {m - 1})) AS j) js)"""
    )
    ctes.append(
        f"""lut AS MATERIALIZED (
      SELECT s.cell, s.j, b.bucket AS code, {dist_b} AS qdist
      FROM qs s JOIN {prev_b} b ON b.j = s.j)"""
    )
    ctes.append(
        f"""cands AS (
      SELECT c.vid FROM codes c
      JOIN lut ON lut.cell = c.cell AND lut.j = c.j AND lut.code = c.code
      WHERE c.vid <> {query_id}
      GROUP BY c.vid
      ORDER BY CAST(sum(qdist) AS BIGINT) ASC, c.vid ASC
      LIMIT {rescore * k})"""
    )
    ctes.append(
        f"q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM e"
        f" WHERE vid = {query_id} AND nrm > 0)"
    )
    cos_q = (
        "list_inner_product(e.embedding::DOUBLE[], q.q_emb::DOUBLE[])"
        " / (e.nrm * q.q_nrm)"
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT e.vid AS {id_col},
           floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM e JOIN cands USING (vid), q
    WHERE e.nrm > 0
    ORDER BY score DESC, e.vid ASC LIMIT {k}
    """


def pq_near_dups_incremental(
    spark,
    code_store: str,
    batch: DataFrame,
    min_band_matches: int = 2,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    books: list[list[list[int]]] | None = None,
    batch_id: int | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup: check a NEW batch of vectors against the
    accumulated code store (a txtable of (vid, codes, embedding)) and
    append the batch's codes — per-batch work is |batch| x a band join
    against the store's code table, never a corpus self-join, so an
    unbounded ingest pays each arrival once (the PQ-code face of
    dedup_incremental). Pairs where BOTH sides are old emitted when
    their later member arrived, so the cumulative pair set equals the
    full-corpus :func:`pq_near_dups` over the union (parity-tested).

    New-new pairs appear from both join directions; grouping on the
    normalized (min, max) ids with countDistinct(subspace) folds them
    without double-counting band matches. ``batch_id`` makes the code
    append exactly-once under foreachBatch replays
    (:func:`sources.txtable.commit_stream_batch`); a replay of the LAST
    batch — the only replay foreachBatch produces, since later batches
    cannot have committed past a failed one — recomputes the SAME pairs
    even when its codes already landed (the batch's own store copy
    never pairs with itself: equal vids are excluded), so the pair
    output is replay-idempotent. Vector ids are assumed unique
    across the stream (ingest contract).

    Returns the verified pair frame (id_a, id_b, n_bands, score_bp)."""
    import os as _os

    from ...sources import txtable as _tx

    books = books or pq_codebooks()
    m = len(books)
    new = (
        pq_encode(batch, books, id_col)
        .join(
            batch.select(F.col(id_col).alias("vid"), "embedding"), "vid"
        )
        .localCheckpoint(eager=True)  # one encode; feeds join + commit
    )
    have_store = bool(_os.path.isdir(_os.path.join(code_store, "_commits")))
    # A crash-replay can present a batch whose codes ALREADY landed (crash
    # between commit_stream_batch and the sink's pairs write): the store copy
    # and the new copy of each vid are row-identical, but without dedup the
    # fa/fb verification joins below would multiply every affected pair row
    # up to 4x. dropDuplicates makes replay output ROW-identical, not just
    # set-identical (the ids are unique by ingest contract, so on a normal
    # batch this dedups nothing).
    union = (
        _tx.read_table(spark, code_store).unionByName(new).dropDuplicates(["vid"])
        if have_store
        else new
    )

    def bands(codes_df):
        return codes_df.select(
            "vid",
            F.explode(
                F.arrays_zip(
                    F.array(*[F.lit(j) for j in range(m)]).alias("j"),
                    F.col("codes").alias("code"),
                )
            ).alias("z"),
        ).select("vid", F.col("z.j").alias("j"), F.col("z.code").alias("code"))

    a, b = bands(new).alias("a"), bands(union).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.code") == F.col("b.code"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.least("a.vid", "b.vid").alias("id_a"),
            F.greatest("a.vid", "b.vid").alias("id_b"),
            F.col("a.j").alias("j"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.countDistinct("j").alias("n_bands"))
        .filter(F.col("n_bands") >= min_band_matches)
    )
    full = union.select(
        "vid",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    ).filter(F.col("nrm") > 0)
    fa = full.select(
        F.col("vid").alias("id_a"), F.col("embedding").alias("emb_a"),
        F.col("nrm").alias("nrm_a"),
    )
    fb = full.select(
        F.col("vid").alias("id_b"), F.col("embedding").alias("emb_b"),
        F.col("nrm").alias("nrm_b"),
    )
    thr_bp = int(math.floor(threshold * 10000 + 0.5))
    pairs = (
        cand.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a", "id_b", "n_bands",
            F.floor(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
                * 10000
                + F.lit(0.5)
            ).cast("long").alias("score_bp"),
        )
        .filter(F.col("score_bp") >= thr_bp)
        .orderBy("id_a", "id_b")
        .localCheckpoint(eager=True)  # pin BEFORE the commit moves the store head
    )
    if batch_id is not None:
        _tx.commit_stream_batch(code_store, new, batch_id)
    else:
        _tx.write_table(spark, code_store, new, mode="append")
    return pairs


# ---------------------------------------------------------------------------
# SemDeDup: cluster-scoped semantic deduplication
# ---------------------------------------------------------------------------


def _semdedup_assigned(
    embeddings: DataFrame,
    n_clusters: int,
    cents: dict[int, list[int]] | None,
    id_col: str,
) -> DataFrame:
    """Cell assignment shared by semdedup and semdedup_incremental:
    (vid, embedding, nrm, cell), cell = nearest centroid — exact-int L2
    argmin for trained centroids, rounded-cosine argmax for the fixed
    literal set. Deterministic and frozen per (n_clusters, cents), so
    batch and incremental assignments always agree."""
    e = embeddings.withColumn(
        "nrm", F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    )
    if cents is not None:
        # TRAINED cells (train_ivf_kmeans): exact-int L2 argmin, the
        # production assignment (same routing as topk_ivf/topk_ivfpq)
        cell_expr = F.expr(
            _argmin_bucket_sql(_quant_sql("embedding"), cents, n_clusters)
        )
    else:
        centroids = ivf_centroids(n_clusters=n_clusters)
        cell_expr = -_centroid_scores("embedding", "nrm", centroids)[0]["nc"]
    return e.select(
        F.col(id_col).alias("vid"),
        "embedding",
        "nrm",
        cell_expr.alias("cell"),
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    max_cell: int | None = None,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication scoped to embedding-space clusters. Every vector is
    assigned to its nearest centroid (the k-means cells double as the
    blocking function), pairwise cosine runs ONLY inside each cell,
    and a vector is removed when an earlier vector in its cell is
    within ``threshold`` — the paper's greedy upper-triangular rule,
    with rank = ascending id (the paper's keep-order is a free
    hyperparameter; id order makes the answer engine-independent).

    Returns one row per vector: (id, cell, keep, dup_of) where
    ``dup_of`` is the smallest-id witness inside the cell (NULL for
    kept rows). Unlike the near-dup PAIR operators this is the
    row-level verdict a curation pipeline consumes directly.

    Scale: assignment is one map pass (integer argmin against literal
    centroids — the shipped-constants shape); the pair stage shuffles
    on the cell id, so cost is sum(cell^2)·dim with cells ~n/K for
    trained centroids. At 100 TB the cell id is the table's cluster
    key and K scales with the corpus (train_ivf_kmeans); ``max_cell``
    is the skew backstop — an over-popular cell (a degenerate corpus
    region) leaves dedup entirely (all its members kept) rather than
    paying cell^2, the same too-generic-key rule as max_df/max_block/
    max_bucket. The within-cell join carries (vid, embedding) once on
    each side; the verified-pair set is never materialized corpus-wide.
    """
    # assigned feeds THREE differing subtrees (both within-cell join
    # sides and the final verdict join — different projections, so AQE
    # exchange reuse cannot dedupe them): pin it so the scan + argmin
    # assignment run once, not three times (guide §2.4; the r13 rule —
    # pin only differing subtrees). Size class: one (vid, embedding,
    # nrm, cell) row per vector — the same frame the within-cell join
    # carries on each side anyway, and the incremental variant already
    # pins its batch assignment for the witness join + store commit.
    from ...functions.pin import pin

    assigned = pin(_semdedup_assigned(embeddings, n_clusters, cents, id_col))
    pool = assigned
    if max_cell is not None:
        small = (
            assigned.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("_ct"))
            .filter(F.col("_ct") <= max_cell)
            .select("cell")
        )
        pool = assigned.join(F.broadcast(small), "cell")
    thr_bp = int(math.floor(threshold * 10000 + 0.5))
    a = pool.select(
        F.col("cell"), F.col("vid").alias("vid_a"),
        F.col("embedding").alias("emb_a"), F.col("nrm").alias("nrm_a"),
    )
    b = pool.select(
        F.col("cell"), F.col("vid").alias("vid_b"),
        F.col("embedding").alias("emb_b"), F.col("nrm").alias("nrm_b"),
    )
    witnesses = (
        a.join(b, "cell")
        .filter(F.col("vid_a") < F.col("vid_b"))
        .filter(
            F.floor(
                _dot(F.col("emb_a"), F.col("emb_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
                * 10000
                + F.lit(0.5)
            ).cast("long")
            >= thr_bp
        )
        .groupBy(F.col("vid_b").alias("vid"))
        .agg(F.min("vid_a").alias("dup_of"))
    )
    return (
        assigned.join(witnesses, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
        .orderBy(id_col)
    )


def semdedup_sql(
    table: str,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin: same literal centroids, same rounded (1e-6)
    assignment scores with ties to the lowest cell id, same rounded-bp
    pair verdicts, same keep-first rule."""
    import math as _math

    centroids = ivf_centroids(n_clusters=n_clusters)
    thr_bp = int(_math.floor(threshold * 10000 + 0.5))
    values = ", ".join(
        f"({i}, [{', '.join(repr(v) for v in ctr)}]::DOUBLE[])"
        for i, ctr in enumerate(centroids)
    )
    cos_c = (
        "list_inner_product(e.embedding::DOUBLE[], c.vec) / "
        "(e.nrm * sqrt(list_inner_product(c.vec, c.vec)))"
    )
    cos_ab = (
        "list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(a.nrm * b.nrm)"
    )
    return f"""
    WITH c(cid, vec) AS (VALUES {values}),
    e AS MATERIALIZED (
      SELECT {id_col} AS vid, embedding,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    scored AS (
      SELECT e.vid, c.cid, floor(({cos_c}) * 1000000 + 0.5) / 1000000 AS cs
      FROM e, c),
    assigned AS MATERIALIZED (
      SELECT s.vid, s.cid AS cell, e.embedding, e.nrm
      FROM (SELECT *, row_number() OVER (PARTITION BY vid ORDER BY cs DESC, cid) AS rn
            FROM scored) s JOIN e USING (vid) WHERE s.rn = 1),
    witnesses AS (
      SELECT b.vid AS vid, min(a.vid) AS dup_of
      FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vid < b.vid
      WHERE CAST(floor(({cos_ab}) * 10000 + 0.5) AS BIGINT) >= {thr_bp}
      GROUP BY b.vid)
    SELECT f.vid AS {id_col}, f.cell, (w.dup_of IS NULL) AS keep, w.dup_of
    FROM assigned f LEFT JOIN witnesses w ON f.vid = w.vid
    ORDER BY {id_col}
    """


def semdedup_incremental(
    spark,
    store: str,
    batch: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    cents: dict[int, list[int]] | None = None,
    batch_id: int | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """INCREMENTAL SemDeDup: score a NEW batch of vectors against the
    accumulated cell store (a txtable of (vid, embedding, nrm, cell))
    and append the batch — per-batch work is |batch| x the store's
    same-cell rows plus the batch's own within-cell pairs, never a
    store self-join, so an unbounded ingest pays sum(cell x batch_cell)
    per arrival instead of re-paying sum(cell^2) per batch (the
    SemDeDup face of pq_near_dups_incremental).

    Emits WITNESS rows, not final verdicts: one (vid, dup_of) per batch
    per affected vector, where dup_of is that batch's smallest same-cell
    witness below ``vid`` at >= ``threshold`` cosine. The cumulative
    verdict is min(dup_of) over all emitted rows per vid
    (:func:`semdedup_verdicts`) — min-of-mins is associative,
    commutative and IDEMPOTENT, so verdicts are exact for ANY arrival
    order (a small-id vector arriving late corrects earlier keeps) and
    replays cannot corrupt them. ``batch_id`` makes the store append
    exactly-once under foreachBatch replays
    (:func:`sources.txtable.commit_stream_batch`); a replay whose rows
    already landed recomputes ROW-identical witnesses (vid dedup keeps
    the batch's own store copy from pairing with itself).

    ``max_cell`` bounds PER-BATCH cost: cells whose cumulative pool
    (store + batch) exceeds the cap emit no witnesses this batch.
    This is PARITY-SAFE against :func:`semdedup_verdicts` at the SAME
    cap — cell counts only grow, so any cell that ever skipped is
    over-cap at read time and the read face exempts it wholesale
    (dropping whatever witnesses it had); a cell that finishes under
    cap never skipped, so its witness set is complete. Exactness per
    cell, bounded cost per batch (tested).

    Returns the witness frame (vid, dup_of), dup_of < vid always."""
    import os as _os

    from ...sources import txtable as _tx

    assigned = pin(
        _semdedup_assigned(batch, n_clusters, cents, id_col)
        .dropDuplicates(["vid"])
    )  # one assignment; feeds join + commit (functions/pin.py seam)
    have_store = bool(_os.path.isdir(_os.path.join(store, "_commits")))
    pool = (
        _tx.read_table(spark, store).unionByName(assigned)
        .dropDuplicates(["vid"])
        if have_store
        else assigned
    )
    if max_cell is not None:
        small = (
            pool.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("_ct"))
            .filter(F.col("_ct") <= max_cell)
            .select("cell")
        )
        pool = pool.join(F.broadcast(small), "cell")
    thr_bp = int(math.floor(threshold * 10000 + 0.5))
    x = assigned.select(
        "cell", F.col("vid").alias("vid_x"),
        F.col("embedding").alias("emb_x"), F.col("nrm").alias("nrm_x"),
    )
    y = pool.select(
        "cell", F.col("vid").alias("vid_y"),
        F.col("embedding").alias("emb_y"), F.col("nrm").alias("nrm_y"),
    )
    witnesses = (
        x.join(y, "cell")
        .filter(F.col("vid_x") != F.col("vid_y"))
        .filter(
            F.floor(
                _dot(F.col("emb_x"), F.col("emb_y"))
                / (F.col("nrm_x") * F.col("nrm_y"))
                * 10000
                + F.lit(0.5)
            ).cast("long")
            >= thr_bp
        )
        .select(
            F.greatest("vid_x", "vid_y").alias("vid"),
            F.least("vid_x", "vid_y").alias("dup_of"),
        )
        .groupBy("vid")
        .agg(F.min("dup_of").alias("dup_of"))
        .orderBy("vid")
    )
    # pin (materialize) BEFORE the commit moves the store head; the
    # snapshot read is manifest-pinned so even a persist-mode
    # recompute after the commit re-reads the SAME immutable files
    witnesses = pin(witnesses)
    if batch_id is not None:
        _tx.commit_stream_batch(store, assigned, batch_id)
    else:
        _tx.write_table(spark, store, assigned, mode="append")
    return witnesses


def semdedup_verdicts(
    spark,
    store: str,
    witness_store: str,
    id_col: str = "vec_id",
    max_cell: int | None = None,
) -> DataFrame:
    """Cumulative read face of the incremental SemDeDup sink: fold the
    per-batch witness rows by min(dup_of) per vid and left-join onto
    the cell store — the result is IDENTICAL (row for row) to the
    full-corpus :func:`semdedup` over everything ingested, for any
    batch split and any arrival order (parity-tested). ``max_cell``
    applies the batch operator's hot-cell exemption at READ time
    against the store's cumulative cell sizes, matching batch
    semantics exactly (a cell that crossed the cap mid-ingest is
    exempted as a whole — its witnesses are dropped, all members
    kept); the sink itself keeps emitting witnesses for such cells,
    so the cap here is the verdict rule, not the cost bound."""
    from ...sources import txtable as _tx

    pool = _tx.read_table(spark, store).select("vid", "cell")
    try:
        w = spark.read.parquet(witness_store).select("vid", "dup_of")
    except AnalysisException as e:
        # ONLY the store-not-created-yet shapes mean "no witnesses":
        # a transient IO/permission/corruption error must propagate,
        # never silently turn into keep=True for everything (round-11
        # advice)
        msg = str(e)
        if "PATH_NOT_FOUND" not in msg and "UNABLE_TO_INFER_SCHEMA" not in msg:
            raise
        w = spark.createDataFrame([], "vid long, dup_of long")
    verd = w.groupBy("vid").agg(F.min("dup_of").alias("dup_of"))
    if max_cell is not None:
        hot = (
            pool.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("_ct"))
            .filter(F.col("_ct") > max_cell)
            .select("cell")
        )
        exempt = pool.join(F.broadcast(hot), "cell").select("vid")
        verd = verd.join(exempt, "vid", "left_anti")
    return (
        pool.join(verd, "vid", "left")
        .select(
            F.col("vid").alias(id_col),
            "cell",
            F.col("dup_of").isNull().alias("keep"),
            "dup_of",
        )
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# Binary (sign) quantization: 1 bit/dim -> ONE int64 per 64-dim vector
# ---------------------------------------------------------------------------


def _bq_bits_spark(emb_sql: str, dim: int = _DIM) -> str:
    """Spark-SQL text packing sign bits (x > 0) into one BIGINT,
    OR-folded (never summed — bit 63 would overflow a sum). Unrolled
    literal terms keep the whole pack inside whole-stage codegen
    instead of an interpreted HOF lambda."""
    terms = [
        f"CASE WHEN {emb_sql}[{i}] > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
        "ELSE CAST(0 AS BIGINT) END"
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} | {t})"
    return out


def _bq_bits_duck(emb_sql: str, dim: int = _DIM) -> str:
    """DuckDB twin of :func:`_bq_bits_spark` (1-based list indexing,
    same OR fold, same sign rule). Bit 63 is the min-int64 literal:
    DuckDB range-checks ``1::BIGINT << 63`` while Spark's shiftleft
    wraps — the two's-complement value is what the OR fold needs."""
    terms = [
        "CASE WHEN ({e})[{ix}] > 0 THEN {bit} ELSE CAST(0 AS BIGINT) END".format(
            e=emb_sql,
            ix=i + 1,
            bit=(
                "(-9223372036854775807 - 1)"
                if i == 63
                else f"(CAST(1 AS BIGINT) << {i})"
            ),
        )
        for i in range(dim)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} | {t})"
    return out


def bq_encode(embeddings: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Binary quantization: each 64-dim vector packs to ONE int64 of
    sign bits — 1/256 of the float bytes, the most aggressive standard
    embedding compression (sign bits preserve cosine neighborhoods
    because cos(a,b) tracks the fraction of agreeing hyperoctant
    coordinates). The code table is the ingest-time artifact a
    Hamming scan serves from."""
    return embeddings.select(
        F.col(id_col).alias("vid"),
        F.expr(_bq_bits_spark("embedding")).alias("bits"),
    )


def topk_hamming(
    embeddings: DataFrame,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k via binary codes: candidates ranked by Hamming distance
    (bit_count(xor) on the ONE-int64 code table — at 100 TB this scan
    reads 8 bytes/vector and is the cheapest first pass that exists),
    then ``rescore * k`` nominees pay the exact rounded-bp cosine
    point-lookup. Integer end to end until the final rescore, so the
    DuckDB twin replays candidate selection bit-for-bit; ties break to
    the lowest id in both phases."""
    codes = bq_encode(embeddings, id_col)
    q = codes.filter(F.col("vid") == query_id).select(
        F.col("bits").alias("q_bits")
    )
    cand = (
        codes.filter(F.col("vid") != query_id)
        .join(F.broadcast(q))
        .select(
            "vid",
            F.bit_count(
                F.col("bits").bitwiseXOR(F.col("q_bits"))
            ).alias("hamming"),
        )
        .orderBy("hamming", "vid")
        .limit(rescore * k)
    )
    full = embeddings.select(
        F.col(id_col).alias("vid"),
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qf = full.filter(F.col("vid") == query_id).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    return (
        cand.join(full, "vid")
        .join(F.broadcast(qf))
        .select(
            F.col("vid").alias(id_col),
            "hamming",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), id_col)
        .limit(k)
    )


def topk_hamming_sql(
    table: str,
    k: int = 10,
    query_id: int = 0,
    rescore: int = 4,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin: same sign pack, same bit_count(xor) candidate rank
    with id ties, same rounded-bp rescore."""
    bits = _bq_bits_duck("embedding")
    cos_q = (
        "list_inner_product(f.embedding::DOUBLE[], q.q_emb::DOUBLE[]) / "
        "(f.nrm * q.q_nrm)"
    )
    return f"""
    WITH codes AS MATERIALIZED (
      SELECT {id_col} AS vid, {bits} AS bits FROM {table}),
    qc AS (SELECT bits AS q_bits FROM codes WHERE vid = {query_id}),
    cand AS (
      SELECT c.vid, bit_count(xor(c.bits, qc.q_bits)) AS hamming
      FROM codes c, qc WHERE c.vid <> {query_id}
      ORDER BY hamming, c.vid LIMIT {rescore * k}),
    f AS (
      SELECT {id_col} AS vid, embedding,
             sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      FROM {table}),
    q AS (SELECT embedding AS q_emb, nrm AS q_nrm FROM f WHERE vid = {query_id})
    SELECT cand.vid AS {id_col}, cand.hamming,
           floor(({cos_q}) * 10000 + 0.5) / 10000 AS score
    FROM cand JOIN f ON cand.vid = f.vid CROSS JOIN q
    ORDER BY score DESC, cand.vid LIMIT {k}
    """


def semdedup_trained_sql(
    table: str,
    threshold: float = 0.9,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    iters: int = 2,
) -> str:
    """DuckDB twin of semdedup over TRAINED cells: the shared
    :func:`_ivf_train_ctes` unrolling (bit-equal centroids), the same
    exact-int argmin assignment, then the same within-cell rounded-bp
    pair verdicts and keep-first rule as :func:`semdedup_sql`."""
    import math as _math

    thr_bp = int(_math.floor(threshold * 10000 + 0.5))
    ctes, _prev, _dist = _ivf_train_ctes(table, id_col, n_clusters, iters)
    cos_ab = (
        "list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(a.nrm * b.nrm)"
    )
    ctes.append(
        f"""witnesses AS (
      SELECT b.vid AS vid, min(a.vid) AS dup_of
      FROM af a JOIN af b ON a.bucket = b.bucket AND a.vid < b.vid
      WHERE CAST(floor(({cos_ab}) * 10000 + 0.5) AS BIGINT) >= {thr_bp}
      GROUP BY b.vid)"""
    )
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT f.vid AS {id_col}, f.bucket AS cell,
           (w.dup_of IS NULL) AS keep, w.dup_of
    FROM af f LEFT JOIN witnesses w ON f.vid = w.vid
    ORDER BY {id_col}
    """


def topk_pq_store(
    spark,
    code_store: str,
    query_id: int,
    k: int = 10,
    rescore: int = 4,
    books: list[list[list[int]]] | None = None,
) -> DataFrame:
    """Serve PQ top-k from the PERSISTED code store (the txtable the
    ingest path — pq_near_dups_incremental / pq_near_dup_sink — has
    been accumulating): the corpus is NEVER re-encoded; the only
    encode at query time is the query row's own 8x16 LUT (one row's
    work, broadcast), the ADC is PQ_M lookups on the STORED codes
    array, and only the rescore*k nominees touch the float column.
    This is the encode-once-at-ingest / serve-many split every
    docstring in the PQ family promises, as an executable operator:
    at 100 TB the store's code column is the scan (1/64 bytes) and the
    query cost is independent of ingest history shape (compactions,
    replays) because the snapshot read pins one manifest."""
    from ...sources import txtable as _tx

    books = books or pq_codebooks()
    m, d = len(books), len(books[0][0])
    store = _tx.read_table(spark, code_store)
    eq = _quant_sql("embedding")
    lut_exprs = []
    for j in range(m):
        sub = f"slice(eq, {j * d + 1}, {d})"
        dists = ", ".join(_sqdist_lits_sql(sub, c) for c in books[j])
        lut_exprs.append(f"array({dists}) AS lut{j}")
    qlut = (
        store.filter(F.col("vid") == query_id)
        .selectExpr(f"{eq} AS eq")
        .selectExpr(*lut_exprs)
    )
    adist = " + ".join(f"element_at(lut{j}, codes[{j}] + 1)" for j in range(m))
    cands = (
        store.filter(F.col("vid") != query_id)
        .crossJoin(F.broadcast(qlut))
        .selectExpr("vid", f"({adist}) AS adist")
        .orderBy(F.asc("adist"), F.asc("vid"))
        .limit(rescore * k)
        .select("vid")
    )
    full = store.select(
        "vid",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    qfull = full.filter((F.col("vid") == query_id) & (F.col("nrm") > 0)).select(
        F.col("embedding").alias("q_emb"), F.col("nrm").alias("q_nrm")
    )
    return (
        full.filter(F.col("nrm") > 0)
        .join(F.broadcast(cands), "vid")
        .crossJoin(F.broadcast(qfull))
        .select(
            "vid",
            (
                F.floor(
                    _dot(F.col("embedding"), F.col("q_emb"))
                    / (F.col("nrm") * F.col("q_nrm"))
                    * 10000
                    + F.lit(0.5)
                )
                / 10000
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("vid"))
        .limit(k)
        .select(F.col("vid").alias("vec_id"), "score")
    )


# ---------------------------------------------------------------------------
# OPQ-lite: variance-balanced dimension permutation for PQ (the
# parametric initialization of Ge et al. 2013's Optimized Product
# Quantization — full OPQ learns a rotation; the permutation variant
# balances per-subspace variance at zero query-time cost, since a
# permutation commutes with the dot product).
# ---------------------------------------------------------------------------


def train_pq_perm(
    embeddings: DataFrame, m: int = PQ_M, id_col: str = "vec_id"
) -> list[int]:
    """ONE pass computes every dimension's variance key in EXACT
    integer arithmetic over the quantized components (key =
    n*sum(v^2) - sum(v)^2 — order-independent, computed in Python
    arbitrary-precision / DuckDB HUGEINT so the key never overflows;
    the int64 aggregates beneath it stay exact while sum(v^2) fits
    int64, ~9e6 unit-scale rows at IVF_SCALE=1e6, beyond which
    production computes the key in doubles and ships the perm as a
    constant, the same shipped-constants shape as every trainer
    here). Dims argsort by (key DESC, dim ASC) and snake-assign to the
    m subspaces, so each subspace receives an even mix of high- and
    low-variance dims — the imbalance that starves some codebooks of
    signal is what the permutation removes. Returns ``perm`` where
    output position p reads input dim perm[p]; positions j*d..j*d+d-1
    form subspace j, dims ascending within a subspace."""
    stats = (
        embeddings.selectExpr(f"{_quant_sql('embedding')} AS eq")
        .selectExpr("posexplode(eq) AS (idx, v)")
        .groupBy("idx")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
        .collect()
    )
    keys = {
        int(r["idx"]): int(r["n"]) * int(r["ss"]) - int(r["s"]) * int(r["s"])
        for r in stats
    }
    order = sorted(keys, key=lambda i: (-keys[i], i))
    groups: list[list[int]] = [[] for _ in range(m)]
    for r, dim in enumerate(order):
        pas, pos = divmod(r, m)
        j = pos if pas % 2 == 0 else m - 1 - pos
        groups[j].append(dim)
    return [d for g in groups for d in sorted(g)]


def permute_embedding(
    df: DataFrame, perm: list[int], emb_col: str = "embedding"
) -> DataFrame:
    """Reorder the embedding dims by ``perm`` (a map-only projection).
    Permutations preserve every dot product and norm, so cosine
    scores — and therefore exact rescored answers — are unchanged;
    only the PQ subspace split sees a different world."""
    return df.withColumn(
        emb_col, F.array(*[F.col(emb_col).getItem(i) for i in perm])
    )


def pq_perm_table_sql(table: str, m: int = PQ_M, id_col: str = "vec_id") -> str:
    """DuckDB subquery producing ``table`` with its embedding dims
    permuted by the SAME variance-balanced training: exact-int variance
    keys, (key DESC, dim ASC) rank, snake assignment — computed in SQL
    so the learned permutation is value-checked end to end."""
    return f"""(
    WITH e0 AS MATERIALIZED (
      SELECT {id_col}, embedding,
             list_transform(embedding, x ->
               CAST(floor(CAST(x AS DOUBLE) * {IVF_SCALE}.0 + 0.5) AS BIGINT)) AS eq
      FROM {table}),
    st AS (
      SELECT idx, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s, CAST(sum(v * v) AS BIGINT) AS ss
      FROM (SELECT unnest(eq) AS v, generate_subscripts(eq, 1) - 1 AS idx FROM e0)
      GROUP BY idx),
    rk AS (
      SELECT idx,
             row_number() OVER (ORDER BY
               (CAST(n AS HUGEINT) * CAST(ss AS HUGEINT)
                - CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) DESC, idx) - 1 AS r
      FROM st),
    asg AS (
      SELECT idx,
             CASE WHEN (r // {m}) % 2 = 0 THEN r % {m}
                  ELSE {m} - 1 - (r % {m}) END AS j
      FROM rk),
    perm AS (SELECT list(idx + 1 ORDER BY j, idx) AS p FROM asg)
    SELECT e0.{id_col}, list_select(e0.embedding, perm.p) AS embedding
    FROM e0, perm
    )"""
