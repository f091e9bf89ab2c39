"""Corpus language-model statistics: vocabulary construction and a
unigram-LM perplexity proxy.

CCNet-style pipelines (Wenzek et al. 2020, "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data") score documents with
a language model trained on a trusted corpus and drop the worst tail;
the classifier scorer follows the fastText shape (Joulin et al. 2017,
"Bag of Tricks for Efficient Text Classification") used as the quality
filter in GPT-3/PaLM-style data pipelines. The cheap in-engine surrogate
is a **unigram LM trained on the corpus itself** — a document whose
tokens are systematically rare (OCR noise, binary spew, wrong-language
text) has high average negative log-likelihood and gets filtered.

Scale design: term frequencies follow Zipf, so the term key is the
textbook skew case — "the" appears in every document and a plain
shuffle join on the term funnels df(term)≈N rows through one task. The
score join therefore splits the frequency table at ``hot_df``: the head
(a few hundred terms carrying ~half of all token mass) joins as a
BROADCAST map-side branch, the long tail (bounded df by construction)
shuffle-joins; the union is the whole LM. Per-doc aggregation keys on
the doc id and is skew-free. The oracle twin is the plain join — the
hot/cold split is a physical rewrite with identical semantics, which is
exactly what the oracle should confirm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORDS = r"\s+"


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), _WORDS)).alias("w"),
    )


def vocab_topk(
    df: DataFrame, k: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Top-``k`` vocabulary terms: corpus frequency (tf) and document
    frequency (df_ct), ties broken by term — the input stats for
    tokenizer training and stop-list construction.

    Plan: one explode, a (doc, term) pre-agg (skew-free composite key,
    map-side combinable), then a term-level agg whose input is one row
    per (doc, term) — the Zipf head's partition holds df(term) rows,
    bounded by the doc count, not the token count. TakeOrdered final.
    """
    per_doc = _tokens(df, text_col, id_col).groupBy("doc", "w").agg(
        F.count(F.lit(1)).alias("ct")
    )
    return (
        per_doc.groupBy("w")
        .agg(F.sum("ct").alias("tf"), F.count(F.lit(1)).alias("df_ct"))
        .orderBy(F.col("tf").desc(), F.col("w"))
        .limit(k)
        .select(F.col("w").alias("term"), F.col("tf").cast("long").alias("tf"), "df_ct")
    )


def vocab_topk_sql(
    table: str, k: int = 100, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    return f"""
    WITH t AS MATERIALIZED (
      SELECT {id_col} AS doc,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    per_doc AS (SELECT doc, w, count(*) AS ct FROM t GROUP BY doc, w),
    v AS (
      SELECT w, CAST(sum(ct) AS BIGINT) AS tf, count(*) AS df_ct
      FROM per_doc GROUP BY w)
    SELECT w AS term, tf, df_ct FROM v ORDER BY tf DESC, w LIMIT {k}
    """


def unigram_logprob_screen(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_df: int = 1000,
    round_to: int = 4,
) -> DataFrame:
    """Per-doc average negative log2-likelihood under the corpus's own
    unigram LM: ``avg_nll_bits = mean_w -log2(c(w)/T)`` plus the token
    count. High bits ⇒ systematically rare tokens ⇒ quality outlier.

    Every scored token exists in the LM (it was trained on the same
    corpus), so no smoothing term is needed and the score is exact.

    The LM join is skew-split on ``hot_df`` (see module docstring):
    terms in more than ``hot_df`` docs broadcast, the rest shuffle.
    """
    # NOTE (r13 A/B): a per_doc persist + freq pin was measured and
    # REVERTED (1.42 s vs 0.83 s min-of-6) — every consumer of per_doc
    # and freq is an IDENTICAL subtree, so AQE's runtime exchange reuse
    # already dedupes the tokenize+count work across the branches, and
    # the eager pins only added job latency. Pins pay off when the
    # consumers' subtrees DIFFER (see dsir_weights), not here.
    toks = _tokens(df, text_col, id_col)
    per_doc = toks.groupBy("doc", "w").agg(F.count(F.lit(1)).alias("ct"))
    freq = per_doc.groupBy("w").agg(
        F.sum("ct").alias("c_w"), F.count(F.lit(1)).alias("df_ct")
    )
    total = freq.agg(F.sum("c_w").alias("t_tokens"))
    hot = freq.filter(F.col("df_ct") > hot_df).select("w", "c_w")
    cold = freq.filter(F.col("df_ct") <= hot_df).select("w", "c_w")
    scored = per_doc.join(F.broadcast(hot), "w").unionByName(
        per_doc.join(cold, "w")
    )
    nll = -F.log2(F.col("c_w") / F.col("t_tokens"))
    return (
        scored.crossJoin(F.broadcast(total))
        .groupBy("doc")
        .agg(
            F.sum(F.col("ct") * nll).alias("bits"),
            F.sum("ct").alias("n_tokens"),
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("bits") / F.col("n_tokens"), round_to).alias("avg_nll_bits"),
        )
    )


def unigram_logprob_screen_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id", round_to: int = 4
) -> str:
    """Twin: the plain (unsplit) LM join — semantically identical to
    the hot/cold physical rewrite."""
    return f"""
    WITH t AS MATERIALIZED (
      SELECT {id_col} AS doc,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    per_doc AS MATERIALIZED (SELECT doc, w, count(*) AS ct FROM t GROUP BY doc, w),
    freq AS (SELECT w, CAST(sum(ct) AS BIGINT) AS c_w FROM per_doc GROUP BY w),
    tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS t_tokens FROM freq)
    SELECT per_doc.doc AS {id_col},
           CAST(sum(ct) AS BIGINT) AS n_tokens,
           round(sum(ct * -log2(c_w * 1.0 / t_tokens)) / sum(ct), {round_to})
             AS avg_nll_bits
    FROM per_doc JOIN freq USING (w) CROSS JOIN tot
    GROUP BY per_doc.doc
    """


# ---------------------------------------------------------------------------
# Hashed-feature linear classifier scoring (fastText-style quality filter)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def _bucket_col(token) -> "F.Column":
    """16-bit feature bucket from the first 4 hex chars of md5(token) —
    computed with arithmetic both engines share bit-for-bit."""
    h = F.md5(token)
    digit = lambda i: F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1  # noqa: E731
    return ((digit(1) * 16 + digit(2)) * 16 + digit(3)) * 16 + digit(4)


def _bucket_sql(token_sql: str) -> str:
    h = f"md5({token_sql})"
    digit = lambda i: f"(strpos('{_HEX}', substr({h}, {i}, 1)) - 1)"  # noqa: E731
    return f"((({digit(1)} * 16 + {digit(2)}) * 16 + {digit(3)}) * 16 + {digit(4)})"


def classifier_score(
    df: DataFrame,
    weights: DataFrame | None = None,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Linear text-classifier scoring over hashed bag-of-words features
    — the fastText-shaped quality/domain classifier every production
    corpus filter runs, as a pure Spark plan:

    ``score = sigmoid(bias + mean_tokens w[h16(token)])``

    with h16 = a 16-bit md5-derived feature bucket. ``weights`` is a
    (bucket, w) table — at most 65 536 rows, so it ALWAYS broadcasts
    and scoring is a map-stage join + one doc-keyed agg; swapping in
    trained weights changes no plan shape. When ``weights`` is None a
    deterministic hash-derived weight table stands in (Knuth
    multiplicative mix of the bucket id), keeping the operator
    self-contained and oracle-checkable end to end.
    """
    toks = _tokens(df, text_col, id_col)
    b = _bucket_col(F.col("w")).alias("bucket")
    feat = toks.select("doc", b)
    if weights is None:
        w_expr = ((F.col("bucket") * F.lit(2654435761)) % 1009 / 1009.0 - 0.5).alias("w")
        scored = feat.select("doc", w_expr)
    else:
        scored = feat.join(F.broadcast(weights), "bucket").select("doc", "w")
    z = F.lit(bias) + F.sum("w") / F.count(F.lit(1))
    return (
        scored.groupBy("doc")
        .agg(F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_to).alias("clf_score"))
        .select(F.col("doc").alias(id_col), "clf_score")
    )


def classifier_score_sql(
    table: str,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> str:
    """Twin of the self-contained (hash-weight) configuration."""
    bucket = _bucket_sql("w")
    return f"""
    WITH t AS MATERIALIZED (
      SELECT {id_col} AS doc,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    feat AS (
      SELECT doc, (({bucket} * 2654435761) % 1009) / 1009.0 - 0.5 AS w
      FROM t)
    SELECT doc AS {id_col},
           round(1.0 / (1.0 + exp(-({bias} + sum(w) / count(*)))), {round_to})
             AS clf_score
    FROM feat GROUP BY doc
    """


def vocab_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    head_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary health report — the numbers a tokenizer/
    stop-list decision reads first: token and type counts, hapax (and
    dis) legomena, type-token ratio, and how much of the mass the
    top-``head_k`` types hold (Zipf-head concentration; ~1.0 means
    boilerplate, ~0.2 means diverse text). One token pass + one
    type-level rollup; ratios are exact integer basis points
    (x * 10000 DIV n), so the DuckDB twin is hash-equal."""
    types = _tokens(df, text_col, id_col).groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    head = (
        types.orderBy(F.desc("ct"), F.asc("w"))
        .limit(head_k)
        .agg(F.sum("ct").cast("long").alias("head_mass"))
    )
    return (
        types.agg(
            F.sum("ct").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum((F.col("ct") == 1).cast("long")).cast("long").alias("hapax_ct"),
            F.sum((F.col("ct") == 2).cast("long")).cast("long").alias("dis_ct"),
        )
        .crossJoin(F.broadcast(head))
        .selectExpr(
            "n_tokens", "n_types", "hapax_ct", "dis_ct",
            "CAST(n_types * 10000 DIV n_tokens AS BIGINT) AS ttr_bp",
            "CAST(hapax_ct * 10000 DIV n_types AS BIGINT) AS hapax_share_bp",
            "CAST(head_mass * 10000 DIV n_tokens AS BIGINT) AS head_mass_bp",
        )
    )


def vocab_stats_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id",
    head_k: int = 100,
) -> str:
    """DuckDB twin of :func:`vocab_stats`."""
    return f"""
    WITH t AS MATERIALIZED (
      SELECT {id_col} AS doc,
             unnest(regexp_split_to_array(trim(lower({text_col})), '\\s+')) AS w
      FROM {table}),
    types AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS ct FROM t GROUP BY w),
    head AS (
      SELECT CAST(sum(ct) AS BIGINT) AS head_mass FROM (
        SELECT ct FROM types ORDER BY ct DESC, w ASC LIMIT {head_k})),
    tot AS (
      SELECT CAST(sum(ct) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN ct = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_ct,
             CAST(sum(CASE WHEN ct = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis_ct
      FROM types)
    SELECT n_tokens, n_types, hapax_ct, dis_ct,
           CAST(n_types * 10000 // n_tokens AS BIGINT) AS ttr_bp,
           CAST(hapax_ct * 10000 // n_types AS BIGINT) AS hapax_share_bp,
           CAST(head_mass * 10000 // n_tokens AS BIGINT) AS head_mass_bp
    FROM tot, head
    """
