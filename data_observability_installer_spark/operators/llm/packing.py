"""Sequence packing: concat-and-cut chunk→pack assignment.

Training pipelines concatenate tokenized chunks in a deterministic
order and cut the stream into fixed ``seq_len`` windows. The whole
operator is a global prefix sum of token counts — which is exactly the
thing a naive Spark plan gets wrong: ``Window.orderBy(...)`` with no
partition key funnels 100 TB through ONE task.

Scale design — a two-level distributed scan, all stages key-partitioned:

1. per-doc token totals (map-side combinable groupBy),
2. docs fold into ``bucket = floor(doc_id / bucket_width)``; the
   bucket-total table is ~corpus/10⁶ rows, so its running sum may use
   an unpartitioned window (it is driver-trivial), and is broadcast,
3. each doc's offset = bucket offset + within-bucket running sum
   (window PARTITIONED by bucket),
4. each chunk's start = doc offset + within-doc running sum (window
   PARTITIONED by doc).

The SQL twin uses the plain single-window global cumsum — same math,
oracle scale — which doubles as a readable spec of the semantics.

``pack_id = floor(chunk_start / seq_len)``; ``end_pack_id`` is the
pack holding the chunk's last token, and ``crosses_pack`` marks chunks
straddling a cut (the loss-masking boundary case downstream trainers
care about).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    chunks: DataFrame,
    seq_len: int = 512,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "chunk_tokens",
    bucket_width: int = 1000,
) -> DataFrame:
    """Assign every chunk its global token offset and pack window.

    ``chunks`` must be unique on (id_col, idx_col); the global order is
    (id_col, idx_col) ascending. Returns the input keys plus
    ``chunk_start`` / ``pack_id`` / ``end_pack_id`` / ``crosses_pack``.
    """
    doc_tot = (
        chunks.groupBy(id_col)
        .agg(F.sum(tokens_col).alias("doc_tokens"))
        .withColumn("bucket", F.floor(F.col(id_col) / bucket_width))
    )
    bucket_tot = doc_tot.groupBy("bucket").agg(F.sum("doc_tokens").alias("bucket_tokens"))
    w_bucket = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_off = bucket_tot.select(
        "bucket", F.coalesce(F.sum("bucket_tokens").over(w_bucket), F.lit(0)).alias("bucket_offset")
    )
    w_doc = Window.partitionBy("bucket").orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    doc_off = (
        doc_tot.join(F.broadcast(bucket_off), "bucket")
        .withColumn(
            "doc_offset",
            F.col("bucket_offset") + F.coalesce(F.sum("doc_tokens").over(w_doc), F.lit(0)),
        )
        .select(id_col, "doc_offset")
    )
    w_chunk = Window.partitionBy(id_col).orderBy(idx_col).rowsBetween(Window.unboundedPreceding, -1)
    start = F.col("doc_offset") + F.coalesce(F.sum(tokens_col).over(w_chunk), F.lit(0))
    return (
        chunks.join(doc_off, id_col)
        .withColumn("chunk_start", start.cast("long"))
        .withColumn("pack_id", F.floor(F.col("chunk_start") / seq_len))
        .withColumn(
            "end_pack_id",
            F.floor((F.col("chunk_start") + F.greatest(F.col(tokens_col), F.lit(1)) - 1) / seq_len),
        )
        .withColumn("crosses_pack", F.col("pack_id") != F.col("end_pack_id"))
        .select(id_col, idx_col, tokens_col, "chunk_start", "pack_id", "end_pack_id", "crosses_pack")
    )


def pack_sequences_sql(
    chunks_sql: str,
    seq_len: int = 512,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tokens_col: str = "chunk_tokens",
) -> str:
    """Oracle twin: one global-window cumsum over (id, idx) order —
    equivalent to the two-level scan by associativity of +."""
    return f"""
    WITH c AS MATERIALIZED ({chunks_sql}),
    s AS (
      SELECT {id_col}, {idx_col}, {tokens_col},
             CAST(coalesce(sum({tokens_col}) OVER (
               ORDER BY {id_col}, {idx_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS chunk_start
      FROM c)
    SELECT {id_col}, {idx_col}, {tokens_col}, chunk_start,
           CAST(floor(chunk_start / {seq_len}) AS BIGINT) AS pack_id,
           CAST(floor((chunk_start + greatest({tokens_col}, 1) - 1) / {seq_len}) AS BIGINT)
             AS end_pack_id,
           CAST(floor(chunk_start / {seq_len}) AS BIGINT)
             <> CAST(floor((chunk_start + greatest({tokens_col}, 1) - 1) / {seq_len}) AS BIGINT)
             AS crosses_pack
    FROM s
    """
