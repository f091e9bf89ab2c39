"""Benchmark decontamination for training corpora.

Flags training documents that share word n-grams with an evaluation /
benchmark set — the standard pre-training hygiene step (the GPT-3 and
PaLM reports both decontaminate on 8-13-gram overlap; we parameterize
``n`` and the hit threshold).

Scale story: the benchmark set is always tiny relative to the corpus
(a few MB of eval text vs 100 TB of training data), so its distinct
shingle set is **broadcast** — the corpus-side shingling stays a pure
map stage and the contamination check is a broadcast-hash semi-join
with NO shuffle of corpus data. A per-doc count then aggregates
map-side. This is the one dedup-family operator where the optimal 100
TB plan has zero corpus shuffles.

The oracle twin replicates the same truncated-slice shingle semantics
(`dedup._shingles_sql`) in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles_sql, exploded_shingles


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, hit_shingles, contaminated): distinct n-grams each
    training doc shares with ANY benchmark doc; ``contaminated`` when
    ``hit_shingles >= min_hits``.

    Every doc appears in the output (hit_shingles = 0 when clean) so
    the result can drive a keep/drop filter without an outer join.
    """
    doc_sh = exploded_shingles(docs, text_col, id_col, n)
    bench_sh = exploded_shingles(bench, text_col, id_col, n).select("sh").distinct()
    # broadcast the (tiny) benchmark shingle set: corpus never shuffles
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("hit_shingles"))
    )
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(hits, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.coalesce("hit_shingles", F.lit(0)).alias("hit_shingles"),
            (F.coalesce("hit_shingles", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def decontaminate_sql(
    docs_sql: str,
    bench_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_hits: int = 1,
) -> str:
    """DuckDB twin. ``docs_sql`` / ``bench_sql`` are table expressions
    (a table name or a parenthesized subquery)."""
    sh = _shingles_sql(text_col, n)
    return f"""
    WITH d AS MATERIALIZED (
      SELECT {id_col} AS doc, unnest({sh}) AS sh FROM {docs_sql}),
    b AS MATERIALIZED (
      SELECT DISTINCT unnest({sh}) AS sh FROM {bench_sql}),
    hits AS (
      SELECT doc, count(*) AS hit_shingles FROM d JOIN b USING (sh) GROUP BY doc)
    SELECT t.{id_col}, coalesce(h.hit_shingles, 0) AS hit_shingles,
           coalesce(h.hit_shingles, 0) >= {min_hits} AS contaminated
    FROM {docs_sql} t LEFT JOIN hits h ON h.doc = t.{id_col}
    """
