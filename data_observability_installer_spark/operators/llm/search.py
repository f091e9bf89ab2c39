"""BM25 keyword search over a document corpus.

Classic Okapi BM25 (Robertson et al., TREC-3 1994, from the
Robertson–Spärck Jones probabilistic relevance framework) expressed as
pure DataFrame aggregation — the lexical-recall
half of a retrieval pipeline next to the embedding ANN operators in
``similarity.py``.

Plan shape at 100 TB:
- tokenize + filter to the query's terms in the MAP stage — the
  explode is immediately filtered by an ``isin`` over a handful of
  terms, so virtually all corpus tokens die before any exchange,
- per-(doc, term) tf and per-doc length aggregate on the (doc, term)
  composite key (skew-proof: doc id in the key),
- corpus stats N / avgdl and per-term document frequency are tiny
  aggregates broadcast back (1×1 cross join + broadcast term join),
- final score = Σ_terms idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
  top-k via TakeOrdered (no global sort shuffle).

idf uses the +1-inside-the-log variant (Lucene's non-negative form):
ln(1 + (N − df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k docs by BM25 score for a bag-of-terms query.

    Deterministic ranking: order by score ROUNDED to 4 dp desc, then
    ascending doc id — ranking on the rounded value (not the raw
    double) keeps the top-k set identical across engines even when
    different aggregation orders perturb the last float ulp.
    """
    terms = [t.lower() for t in query_terms]
    words = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w"),
    )
    doclen = words.groupBy("doc").agg(F.count(F.lit(1)).alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        words.filter(F.col("w").isin(terms))
        .groupBy("doc", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df_ct"))
    scored = (
        tf.join(F.broadcast(dfreq), "w")
        .crossJoin(F.broadcast(stats))
        .join(doclen, "doc")
        .withColumn(
            "idf", F.log(1.0 + (F.col("n_docs") - F.col("df_ct") + 0.5) / (F.col("df_ct") + 0.5))
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc")
        .agg(F.sum("term_score").alias("score"))
    )
    return (
        scored.select(F.col("doc"), F.round("score", 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc"))
        .limit(k)
        .select(F.col("doc").alias(id_col), "score")
    )


def bm25_topk_sql(
    table: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    terms = ", ".join("'" + t.lower().replace("'", "''") + "'" for t in query_terms)
    return f"""
    WITH w AS MATERIALIZED (
      SELECT {id_col} AS doc,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    doclen AS (SELECT doc, count(*) AS dl FROM w GROUP BY doc),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
    tf AS (SELECT doc, w, count(*) AS tf FROM w WHERE w IN ({terms}) GROUP BY doc, w),
    dfreq AS (SELECT w, count(*) AS df_ct FROM tf GROUP BY w),
    scored AS (
      SELECT tf.doc,
             sum(ln(1.0 + (stats.n_docs - dfreq.df_ct + 0.5) / (dfreq.df_ct + 0.5))
                 * tf.tf * ({k1} + 1)
                 / (tf.tf + {k1} * (1 - {b} + {b} * doclen.dl / stats.avgdl))) AS score
      FROM tf JOIN dfreq USING (w) CROSS JOIN stats JOIN doclen ON doclen.doc = tf.doc
      GROUP BY tf.doc)
    SELECT doc AS {id_col}, round(score, 4) AS score
    FROM scored ORDER BY round(score, 4) DESC, doc LIMIT {k}
    """
