"""Round-3 corpus-preparation operators: decontamination, repetition
screen, sequence packing, BM25 search, mixture weights, incremental
dedup — planted-fixture semantics checks (the sf0.01 value parity runs
in the driver's oracle gate via plans/registry.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_observability_installer_spark.operators.llm.decontam import decontaminate
from data_observability_installer_spark.operators.llm.dedup import dedup_incremental
from data_observability_installer_spark.operators.llm.packing import pack_sequences
from data_observability_installer_spark.operators.llm.search import bm25_topk
from data_observability_installer_spark.operators.llm.text import fingerprint, repetition_screen
from data_observability_installer_spark.operators.llm.curation import mixture_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            (1, "intro words then alpha beta gamma delta epsilon and more"),  # contaminated
            (2, "totally unrelated content nothing shared here at all"),  # clean
        ],
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=5, min_hits=1).collect()}
    assert out[1]["contaminated"] and out[1]["hit_shingles"] >= 1
    assert not out[2]["contaminated"] and out[2]["hit_shingles"] == 0


def test_decontaminate_min_hits_threshold(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    docs = _docs(spark, [(1, "x x a b c d e x x")])  # shares 2 5-grams: "a b c d e", no wait
    out = decontaminate(docs, bench, n=5, min_hits=3).collect()[0]
    # doc 1 shares "a b c d e" only (bench has "a b c d e" and "b c d e f")
    assert out["hit_shingles"] == 1 and not out["contaminated"]


def test_repetition_screen_degenerate_doc(spark):
    docs = _docs(spark, [(1, "a b a b a b"), (2, "one two three four five")])
    out = {r["doc_id"]: r for r in repetition_screen(docs, n=2).collect()}
    # doc 1 bigrams: ab ba ab ba ab -> total 5, top 3, distinct 2
    assert out[1]["total_ngrams"] == 5
    assert out[1]["top_ngram_ct"] == 3
    assert out[1]["top_ngram_frac"] == pytest.approx(0.6)
    assert out[1]["dup_ngram_frac"] == pytest.approx(0.6)
    # doc 2: no repeats
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[2]["top_ngram_ct"] == 1


def test_pack_sequences_offsets_and_boundaries(spark):
    chunks = spark.createDataFrame(
        [(1, 0, 40), (1, 1, 40), (2, 0, 30), (3, 0, 10)],
        "doc_id long, chunk_idx int, chunk_tokens int",
    )
    rows = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in pack_sequences(chunks, seq_len=64, bucket_width=1000).collect()
    }
    assert rows[(1, 0)]["chunk_start"] == 0 and rows[(1, 0)]["pack_id"] == 0
    assert rows[(1, 1)]["chunk_start"] == 40
    assert rows[(1, 1)]["crosses_pack"]  # tokens 40..79 straddle the 64 cut
    assert rows[(2, 0)]["chunk_start"] == 80 and rows[(2, 0)]["pack_id"] == 1
    assert rows[(3, 0)]["chunk_start"] == 110
    assert not rows[(3, 0)]["crosses_pack"]


def test_pack_sequences_bucketing_invariance(spark):
    """The two-level prefix sum must equal the naive global cumsum for
    ANY bucket_width (associativity is the whole trick)."""
    import random

    rng = random.Random(7)
    data = [
        (doc, idx, rng.randint(1, 90))
        for doc in range(20)
        for idx in range(rng.randint(1, 5))
    ]
    chunks = spark.createDataFrame(data, "doc_id long, chunk_idx int, chunk_tokens int")
    a = sorted(pack_sequences(chunks, seq_len=128, bucket_width=3).collect())
    b = sorted(pack_sequences(chunks, seq_len=128, bucket_width=10**6).collect())
    assert a == b
    # offsets are a permutation-free exact prefix sum
    expect = 0
    for row in sorted(a, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        assert row["chunk_start"] == expect
        expect += row["chunk_tokens"]


def test_bm25_ranks_term_dense_doc_first(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark join window"),
            (2, "spark appears once in this much longer document about other things entirely"),
            (3, "no relevant terms at all here"),
        ],
    )
    out = bm25_topk(docs, ["spark"], k=3).collect()
    assert [r["doc_id"] for r in out] == [1, 2]  # doc 3 never scores
    assert out[0]["score"] > out[1]["score"] > 0


def test_mixture_weights_alpha(spark):
    docs = spark.createDataFrame(
        [(1, "w " * 99 + "w", "big"), (2, "w w w w", "small")],
        "doc_id long, text string, source string",
    )
    out = {r["domain"]: r for r in mixture_weights(docs, alpha=0.5).collect()}
    assert out["big"]["tokens"] == 100 and out["small"]["tokens"] == 4
    # sqrt weighting: 10 vs 2 -> 10/12 and 2/12
    assert out["big"]["weight"] == pytest.approx(10 / 12, abs=1e-6)
    assert out["small"]["weight"] == pytest.approx(2 / 12, abs=1e-6)
    assert out["big"]["weight"] + out["small"]["weight"] == pytest.approx(1.0, abs=1e-5)


def test_dedup_incremental_drops_seen_and_batch_dups(spark):
    snap = _docs(spark, [(1, "Already ingested document.")])
    seen = fingerprint(snap).select("fingerprint")
    incoming = _docs(
        spark,
        [
            (10, "already ingested document"),  # dup of snapshot (normalized)
            (11, "fresh content one"),
            (12, "Fresh   CONTENT one!"),  # batch-dup of 11 (normalized)
            (13, "fresh content two"),
        ],
    )
    kept = sorted(r["doc_id"] for r in dedup_incremental(incoming, seen).collect())
    assert kept == [11, 13]


def test_event_gaps_and_sla(spark):
    from data_observability_installer_spark.operators.obs.liveness import event_gaps
    from data_observability_installer_spark.operators.obs.rollup import run_duration_sla

    ev = spark.createDataFrame(
        [
            ("feed-a", "2024-01-01 00:00:00"),
            ("feed-a", "2024-01-01 00:10:00"),
            ("feed-a", "2024-01-01 02:10:00"),  # 2h gap
            ("feed-b", "2024-01-01 00:00:00"),
        ],
        "k string, ts string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    gaps = event_gaps(ev, "k", min_gap_s=3600).collect()
    assert len(gaps) == 1
    assert gaps[0]["stream_key"] == "feed-a" and gaps[0]["gap_s"] == 7200.0

    runs = spark.createDataFrame(
        [("p", "2024-01-01 00:00:00", "2024-01-01 00:00:10"),
         ("p", "2024-01-01 00:00:00", "2024-01-01 00:00:20"),
         ("p", "2024-01-01 00:00:00", "2024-01-01 00:00:30")],
        "pipeline_key string, start_ts string, end_ts string",
    ).select(
        "pipeline_key",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    sla = run_duration_sla(runs).collect()[0]
    assert sla["n_runs"] == 3 and sla["p50_s"] == 20.0 and sla["max_s"] == 30.0
    assert sla["p90_s"] == pytest.approx(28.0)  # interpolated: 20 + 0.8*(30-20)


def test_vocab_topk_counts(spark):
    from data_observability_installer_spark.operators.llm.lm import vocab_topk

    docs = _docs(spark, [(1, "a a b"), (2, "a c")])
    out = vocab_topk(docs, k=2).collect()
    assert [(r["term"], r["tf"], r["df_ct"]) for r in out] == [("a", 3, 2), ("b", 1, 1)]
    # tie between b and c broken by term order -> b


def test_unigram_nll_rare_tokens_score_higher(spark):
    from data_observability_installer_spark.operators.llm.lm import unigram_logprob_screen

    docs = _docs(
        spark,
        [
            (1, "common common common common"),
            (2, "common common rare1 rare2"),
        ],
    )
    out = {r["doc_id"]: r for r in unigram_logprob_screen(docs).collect()}
    assert out[2]["avg_nll_bits"] > out[1]["avg_nll_bits"]
    assert out[1]["n_tokens"] == 4
    # hot/cold split is a pure physical rewrite: any hot_df gives the
    # same result
    alt = {r["doc_id"]: r for r in unigram_logprob_screen(docs, hot_df=0).collect()}
    assert alt == out


def test_corpus_funnel_stages(spark):
    from data_observability_installer_spark.operators.llm.curation import corpus_funnel

    long_en = (
        "the quick brown fox and the lazy dog are in the yard with a ball "
        "and they play all day in the sun with the other animals around"
    )
    eval_phrase = "the secret benchmark answer is forty two indeed"
    docs = _docs(
        spark,
        [
            (1, long_en),
            (2, long_en),  # exact dup of 1 (drops at stage 2)
            (3, "short text"),  # drops at quality filter
            (4, long_en + " " + eval_phrase),  # contaminated (drops at stage 3)
        ],
    )
    bench = _docs(spark, [(100, eval_phrase)])
    out = {r["stage"]: r["docs_remaining"] for r in corpus_funnel(docs, bench).collect()}
    assert out["0_input"] == 4
    assert out["1_quality_filter"] == 3  # doc 3 gone
    assert out["2_exact_dedup"] == 2  # doc 2 gone
    assert out["3_decontam"] == 1  # doc 4 shares eval 5-grams with bench


def test_filter_by_quantile_per_group(spark):
    from data_observability_installer_spark.operators.llm.curation import filter_by_quantile

    scored = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 100.0), (4, "b", 5.0), (5, "b", 6.0)],
        "doc_id long, source string, score double",
    )
    # global p50 cut would drop all of "b"; per-source keeps each
    # domain's better half
    kept = sorted(
        r["doc_id"]
        for r in filter_by_quantile(scored, "score", q=0.5, per="source").collect()
    )
    assert kept == [1, 2, 4]  # thresholds: a->2.0, b->5.5
    kept_g = sorted(
        r["doc_id"] for r in filter_by_quantile(scored, "score", q=0.5).collect()
    )
    assert kept_g == [1, 2, 4]  # global median = 5.0
    top = sorted(
        r["doc_id"]
        for r in filter_by_quantile(scored, "score", q=0.5, keep="above").collect()
    )
    assert top == [3, 4, 5]


def test_run_concurrency_overlaps(spark):
    from data_observability_installer_spark.operators.obs.rollup import run_concurrency

    runs = spark.createDataFrame(
        [
            ("p1", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
            ("p1", "2024-01-01 00:30:00", "2024-01-01 02:00:00"),  # overlaps 1st
            ("p1", "2024-01-01 02:00:00", "2024-01-01 03:00:00"),  # back-to-back: no overlap
            ("p2", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        ],
        "pipeline_key string, start_ts string, end_ts string",
    ).select(
        "pipeline_key",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
    )
    out = {r["pipeline_key"]: r for r in run_concurrency(runs).collect()}
    assert out["p1"]["peak_concurrent"] == 2 and out["p1"]["n_runs"] == 3
    assert out["p2"]["peak_concurrent"] == 1


def test_suppress_flapping_bursts(spark):
    from data_observability_installer_spark.operators.obs.rules import suppress_flapping

    alerts = spark.createDataFrame(
        [
            ("p1", "error", "2024-01-01 00:00:00"),
            ("p1", "error", "2024-01-01 00:10:00"),  # within cooldown -> suppressed
            ("p1", "error", "2024-01-01 00:20:00"),  # chains (10 min from prev)
            ("p1", "error", "2024-01-01 02:00:00"),  # new burst
            ("p2", "error", "2024-01-01 00:05:00"),
        ],
        "subject_key string, alert_type string, event_ts string",
    ).select("subject_key", "alert_type", F.col("event_ts").cast("timestamp").alias("event_ts"))
    out = sorted(
        suppress_flapping(alerts, cooldown_s=1800).collect(),
        key=lambda r: (r["subject_key"], r["first_ts"]),
    )
    assert len(out) == 3
    assert out[0]["subject_key"] == "p1" and out[0]["suppressed_ct"] == 2
    assert out[1]["subject_key"] == "p1" and out[1]["suppressed_ct"] == 0
    assert out[2]["subject_key"] == "p2" and out[2]["suppressed_ct"] == 0


def test_classifier_score_weights_table_equals_hash_weights(spark):
    """Supplying the SAME weights as an explicit (bucket, w) table must
    reproduce the self-contained hash-weight scores — proving the
    broadcast-join production path and the hash stand-in agree."""
    from data_observability_installer_spark.operators.llm.lm import classifier_score

    docs = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon")])
    base = {r["doc_id"]: r["clf_score"] for r in classifier_score(docs).collect()}
    assert all(0.0 < v < 1.0 for v in base.values())
    weights = spark.range(65536).select(
        F.col("id").cast("int").alias("bucket"),
        ((F.col("id") * F.lit(2654435761)) % 1009 / 1009.0 - 0.5).alias("w"),
    )
    via_table = {
        r["doc_id"]: r["clf_score"] for r in classifier_score(docs, weights=weights).collect()
    }
    assert via_table == base
    # bias shifts scores monotonically
    hi = {r["doc_id"]: r["clf_score"] for r in classifier_score(docs, bias=2.0).collect()}
    assert all(hi[k] > base[k] for k in base)


def test_simhash_md5_near_dup_docs_collide(spark):
    """Near-identical docs must share (or nearly share) a SimHash
    bucket; unrelated docs must not — same planted-corpus property as
    the xxhash64 variant, on the oracle-checkable md5 path."""
    from data_observability_installer_spark.operators.llm.dedup import simhash_md5

    base = "spark query engine join window aggregate shuffle partition broadcast schedule"
    docs = _docs(
        spark,
        [
            (1, base),
            (2, base + " extra"),  # one-word delta: small hamming distance
            (3, "completely different vocabulary about cooking pasta recipes tonight"),
        ],
    )
    out = {r["doc_id"]: r["simhash"] for r in simhash_md5(docs).collect()}
    ham12 = bin(out[1] ^ out[2]).count("1")
    ham13 = bin(out[1] ^ out[3]).count("1")
    assert ham12 <= 3
    assert ham13 > ham12


def test_pipeline_health_blend(spark):
    from data_observability_installer_spark.operators.obs.rollup import pipeline_health

    runs = spark.createDataFrame(
        [
            ("good", "2024-01-01 00:00:00", "2024-01-01 00:10:00", "COMPLETED"),
            ("good", "2024-01-02 00:00:00", "2024-01-02 00:10:00", "COMPLETED"),
            ("bad", "2024-01-01 00:00:00", "2024-01-02 00:00:00", "FAILED"),
            ("bad", "2024-01-02 00:00:00", "2024-01-03 00:00:00", "COMPLETED"),
        ],
        "pipeline_key string, start_ts string, end_ts string, final_status string",
    ).select(
        "pipeline_key",
        F.col("start_ts").cast("timestamp").alias("start_ts"),
        F.col("end_ts").cast("timestamp").alias("end_ts"),
        "final_status",
    )
    alerts = spark.createDataFrame([("bad",), ("bad",)], "subject_key string")
    out = {r["pipeline_key"]: r for r in pipeline_health(runs, alerts).collect()}
    assert out["good"]["health"] > out["bad"]["health"]
    assert out["good"]["alert_ct"] == 0 and out["bad"]["alert_ct"] == 2
    assert out["good"]["success_rate"] == 1.0 and out["bad"]["success_rate"] == 0.5
    # perfect pipeline: 100*(0.5 + 0.3*(1-600/86400) + 0.2) ≈ 99.79
    assert out["good"]["health"] == pytest.approx(99.79, abs=0.01)


def test_decontam_fuzzy_flags_edited_copy_only(spark):
    from data_observability_installer_spark.operators.llm.decontam import (
        decontaminate_fuzzy,
    )

    bench_text = "the quick brown fox jumps over the lazy dog near the old river bank today"
    edited = bench_text.replace("today", "tonight")  # light edit: high Jaccard
    clean = "completely unrelated text about spark physical plans and shuffle exchanges here"
    train = spark.createDataFrame(
        [(1, edited), (2, clean)], "doc_id bigint, text string"
    )
    bench = spark.createDataFrame([(100, bench_text)], "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["bench_doc"]): r["jaccard"]
        for r in decontaminate_fuzzy(train, bench, n=3, threshold=0.3).collect()
    }
    assert set(got) == {(1, 100)}  # the edited copy, and only it
    assert got[(1, 100)] > 0.5

def test_filter_by_quantile_approx_mode_tracks_exact(spark):
    """approx=True (GK-sketch threshold, the corpus-scale mode) must
    keep a document set within the sketch's rank-error bound of the
    exact cut: at accuracy=10000 on 2k docs the sketch is effectively
    exact, so the kept sets must be identical."""
    from data_observability_installer_spark.operators.llm.curation import (
        filter_by_quantile,
    )

    scored = spark.createDataFrame(
        [(i, float((i * 7919) % 2000) / 10.0) for i in range(2000)],
        "doc_id long, score double",
    )
    exact = {
        r["doc_id"] for r in filter_by_quantile(scored, "score", q=0.9).collect()
    }
    approx = {
        r["doc_id"]
        for r in filter_by_quantile(
            scored, "score", q=0.9, approx=True, accuracy=10000
        ).collect()
    }
    assert approx == exact

def test_bpe_pair_counts_hand_checked(spark):
    """Counts verified against a hand-countable corpus; single-char
    words contribute nothing; ties rank by pair text."""
    from data_observability_installer_spark.operators.llm.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [(1, "abab cd a"), (2, "Bab  cd")], "doc_id long, text string"
    )
    got = [(r.pair, r.pair_ct) for r in bpe_pair_counts(docs, top_n=10).collect()]
    # words: abab, cd, a(dropped), bab, cd
    # pairs: ab,ba,ab + cd + ba,ab -> ab:3 ba:2 cd:2
    assert got == [("ab", 3), ("ba", 2), ("cd", 2)]


def test_dedup_impact_planted(spark):
    """Exact and near methods report the right removal counts on a
    corpus with one exact dup pair and one near-dup cluster."""
    from data_observability_installer_spark.operators.llm.dedup import dedup_impact

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),        # exact dup of 1
        (3, "completely different text here"),
        (4, "unique snowflake document four"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    groups = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "doc bigint, group_id bigint"
    )  # near labels: {1,2} and {3,4} clusters
    got = {r["method"]: r for r in dedup_impact(df, groups).collect()}
    ex = got["exact"]
    assert (ex["docs_total"], ex["docs_kept"], ex["docs_removed"]) == (4, 3, 1)
    assert ex["chars_removed"] == len("alpha beta gamma delta")
    assert ex["removed_bp"] == 2500
    nr = got["near"]
    assert (nr["docs_removed"], nr["removed_bp"]) == (2, 5000)  # docs 2 and 4
    assert nr["chars_removed"] == len("alpha beta gamma delta") + len(
        "unique snowflake document four"
    )


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short excerpt of a long doc: containment ~10000 bp while
    Jaccard stays below any sane near-dup threshold — the asymmetric
    case this operator exists for. The contained doc is flagged."""
    from data_observability_installer_spark.operators.llm.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    long_words = " ".join(f"w{i}" for i in range(300))
    excerpt = " ".join(f"w{i}" for i in range(40, 70))  # 30 words inside
    other = " ".join(f"z{i}" for i in range(300))
    df = spark.createDataFrame(
        [(1, long_words), (2, excerpt), (3, other)], "doc_id bigint, text string"
    )
    cont = {
        (r["doc_a"], r["doc_b"]): r
        for r in ngram_containment_pairs(df, threshold_bp=9000).collect()
    }
    assert (1, 2) in cont
    assert cont[(1, 2)]["containment_bp"] == 10000
    assert cont[(1, 2)]["contained_doc"] == 2
    assert (1, 3) not in cont
    jac = ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {1, 2} for r in jac)


def test_decontaminate_fingerprint_equals_exact_broadcast(spark):
    """The fingerprint-nominate/exact-verify plan must produce exactly
    the decontaminate() result — nomination is a superset (same hash
    both sides), verification exact."""
    from data_observability_installer_spark.operators.llm.decontam import (
        decontaminate_fingerprint,
    )

    bench = _docs(
        spark,
        [(100, "alpha beta gamma delta epsilon zeta"), (101, "one two three four five six")],
    )
    docs = _docs(
        spark,
        [
            (1, "intro words then alpha beta gamma delta epsilon and more"),
            (2, "totally unrelated content nothing shared here at all"),
            (3, "zero one two three four five six seven"),
        ],
    )
    exact = sorted(map(tuple, decontaminate(docs, bench, n=5, min_hits=1).collect()))
    fp = sorted(map(tuple, decontaminate_fingerprint(docs, bench, n=5, min_hits=1).collect()))
    assert exact == fp
