"""Curation operators: split stability/determinism, PII detection,
stratified sampling monotonicity, filter-chain reason precedence."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_observability_installer_spark.operators.llm.curation import (
    curation_filter,
    deterministic_split,
    pii_screen,
    stratified_sample,
)
from data_observability_installer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_split_is_deterministic_and_stable_under_growth(spark):
    docs = load_table(spark, SF, "documents")
    full = {r.doc_id: r.split for r in deterministic_split(docs).collect()}
    again = {r.doc_id: r.split for r in deterministic_split(docs).collect()}
    assert full == again
    # adding rows never moves existing assignments
    half = docs.filter(F.col("doc_id") % 2 == 0)
    sub = {r.doc_id: r.split for r in deterministic_split(half).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_split_proportions_roughly_match_weights(spark):
    docs = load_table(spark, SF, "documents")
    counts = dict(
        deterministic_split(docs).groupBy("split").count().rdd.map(tuple).collect()
    )
    n = sum(counts.values())
    assert 0.8 <= counts["train"] / n <= 0.97
    assert counts.get("val", 0) > 0 and counts.get("test", 0) > 0


def test_split_salt_rerolls(spark):
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id: r.split for r in deterministic_split(docs, salt="a").collect()}
    b = {r.doc_id: r.split for r in deterministic_split(docs, salt="b").collect()}
    assert any(a[k] != b[k] for k in a)


def test_pii_screen_detects_each_category(spark):
    df = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com or bob@test.org"),
            (2, "call 555-867-5309 today"),
            (3, "ssn 123-45-6789 leaked"),
            (4, "server at 192.168.1.100 port 80"),
            (5, "clean text with no identifiers at all"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in pii_screen(df).collect()}
    assert got[1].email_ct == 2 and got[1].has_pii
    assert got[2].phone_ct == 1 and got[2].has_pii
    assert got[3].ssn_ct == 1
    # SSN pattern also matches the phone shape? keep them disjoint
    assert got[2].ssn_ct == 0
    assert got[4].ipv4_ct == 1
    assert not got[5].has_pii


def test_stratified_sample_rates_and_subset(spark):
    docs = load_table(spark, SF, "documents")
    lo = stratified_sample(docs, {"src0": 0.2}, default_rate=0.0)
    hi = stratified_sample(docs, {"src0": 0.8}, default_rate=0.0)
    lo_ids = {r.doc_id for r in lo.collect()}
    hi_ids = {r.doc_id for r in hi.collect()}
    assert lo_ids <= hi_ids  # raising the rate only adds rows
    assert all(r.source == "src0" for r in lo.collect())
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert len(hi_ids) <= n_src0


def test_curation_filter_reason_precedence(spark):
    long_en = (
        "the quick brown fox jumps over the lazy dog and the cat is in the house "
        "with a friend of the family and that is all we know about it today"
    )
    df = spark.createDataFrame(
        [
            (1, long_en),                                # kept
            (2, "too short"),                            # too_short
            (3, long_en + " email hidden@example.com"),  # pii (passes other gates)
            (4, "short text " + "mail@x.io " * 3),       # too_short wins over pii
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in curation_filter(df).collect()}
    assert got[1].keep and got[1].reason == "kept"
    assert got[2].reason == "too_short"
    assert got[3].reason == "pii" and not got[3].keep
    assert got[4].reason == "too_short"


def test_curation_filter_single_stage_plan(spark):
    docs = load_table(spark, SF, "documents")
    plan = curation_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure per-row map


def test_pii_redact_masks_in_fixed_order(spark):
    from data_observability_installer_spark.operators.llm.curation import pii_redact

    df = spark.createDataFrame(
        [
            (1, "mail a@b.co or call 555-123-4567, ssn 123-45-6789, ip 10.0.0.1"),
            (2, "nothing sensitive here"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r for r in pii_redact(df).collect()}
    assert got[1].was_redacted and not got[2].was_redacted
    assert got[2].redacted_text == "nothing sensitive here"
    red = got[1].redacted_text
    assert "<EMAIL>" in red and "<PHONE>" in red and "<SSN>" in red and "<IPV4>" in red
    assert "a@b.co" not in red and "6789" not in red and "10.0.0.1" not in red


def test_importance_sample_monotone_in_weight(spark):
    """Raising a doc's weight can only ADD it to the sample (the
    bucket threshold is monotone), and weights clamp to [0, 1]."""
    from data_observability_installer_spark.operators.llm.curation import (
        importance_sample,
    )

    rows = [(i, 0.3) for i in range(200)]
    df_lo = spark.createDataFrame(rows, ["doc_id", "w"])
    df_hi = spark.createDataFrame([(i, 0.8) for i in range(200)], ["doc_id", "w"])
    keep_lo = {r["doc_id"] for r in importance_sample(df_lo, "w").collect()}
    keep_hi = {r["doc_id"] for r in importance_sample(df_hi, "w").collect()}
    assert keep_lo <= keep_hi  # monotone
    # clamp: weight >= 1 keeps everything, <= 0 keeps nothing
    df_all = spark.createDataFrame([(i, 7.5) for i in range(50)], ["doc_id", "w"])
    df_none = spark.createDataFrame([(i, -2.0) for i in range(50)], ["doc_id", "w"])
    assert importance_sample(df_all, "w").count() == 50
    assert importance_sample(df_none, "w").count() == 0


def test_token_budget_mix_respects_budget_per_source(spark):
    from data_observability_installer_spark.operators.llm.curation import (
        token_budget_mix,
    )

    rows = [
        (1, "a", "w " * 6),   # 6 tokens
        (2, "a", "w " * 5),   # 5
        (3, "a", "w " * 4),   # 4 -> cum 15 > 12, dropped
        (4, "b", "w " * 3),   # separate budget
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["doc_id"]: r for r in token_budget_mix(df, budget=12).collect()}
    assert set(out) == {1, 2, 4}
    assert out[2]["cum_tokens"] == 11 and out[4]["cum_tokens"] == 3


def test_temperature_sample_upsamples_small_domains(spark):
    """alpha=0.5 semantics: keep RATE per domain decreases with domain
    size (sqrt scaling), so the small domain keeps a larger fraction
    of itself than the big one; a generous budget keeps everything;
    and the draw is deterministic (same rows both calls)."""
    from data_observability_installer_spark.operators.llm.curation import (
        temperature_sample,
    )

    rows = [(i, "big", "w " * 20) for i in range(900)] + [
        (1000 + i, "small", "w " * 20) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")

    kept = temperature_sample(df, budget=300).groupBy("source").count()
    counts = {r.source: r["count"] for r in kept.collect()}
    frac_big = counts.get("big", 0) / 900
    frac_small = counts.get("small", 0) / 100
    assert frac_small > frac_big  # the tail is upsampled
    # rough budget adherence (hash thinning is Bernoulli-deterministic):
    total = sum(counts.values())
    assert 200 <= total <= 420

    again = temperature_sample(df, budget=300)
    a = {r.doc_id for r in temperature_sample(df, budget=300).collect()}
    b = {r.doc_id for r in again.collect()}
    assert a == b

    everything = temperature_sample(df, budget=10_000)
    assert everything.count() == 1000  # rates clamp at 1.0


def test_calibrate_scores_group_isolated_percent_ranks(spark):
    """Each group's ranks span [0,1] independently of other groups'
    score ranges (the cross-domain comparability the operator exists
    for); ties share a rank; 'top 50% of each domain' keeps half of
    each group regardless of raw scales."""
    from data_observability_installer_spark.operators.llm.curation import (
        calibrate_scores,
    )

    rows = [(i, "lo", float(i)) for i in range(10)]  # scores 0..9
    rows += [(100 + i, "hi", float(1000 + i)) for i in range(10)]  # 1000..1009
    rows += [(200, "tied", 5.0), (201, "tied", 5.0), (202, "tied", 7.0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    out = {r.doc_id: r.calibrated for r in calibrate_scores(df, "score", "source").collect()}
    # every group's best is 1.0 and worst is 0.0, despite disjoint scales
    assert out[0] == 0.0 and out[9] == 1.0
    assert out[100] == 0.0 and out[109] == 1.0
    assert out[200] == out[201] == 0.0 and out[202] == 1.0  # ties share
    kept = {d for d, c in out.items() if c >= 0.5}
    assert len([d for d in kept if d < 100]) == 5  # half of 'lo'
    assert len([d for d in kept if 100 <= d < 200]) == 5  # half of 'hi'


def test_leakage_safe_split_coassigns_clusters(spark):
    """Near-dup clusters land whole in one split; ungrouped docs use
    their own id (identical to the plain split for them); no pair
    crosses the boundary by construction."""
    from data_observability_installer_spark.operators.llm.curation import (
        deterministic_split,
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i, f"text {i}") for i in range(200)],
                                 "doc_id bigint, text string")
    # three clusters: {0,1,2}, {10,11}, {20,21,22,23}
    groups = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10),
         (20, 20), (21, 20), (22, 20), (23, 20)],
        "doc bigint, group_id bigint",
    )
    got = {r["doc_id"]: r for r in leakage_safe_split(docs, groups).collect()}
    for cluster in [(0, 1, 2), (10, 11), (20, 21, 22, 23)]:
        splits = {got[d]["split"] for d in cluster}
        assert len(splits) == 1, cluster
    # ungrouped docs match the plain split exactly
    plain = {r["doc_id"]: r["split"] for r in deterministic_split(docs).collect()}
    grouped_ids = {0, 1, 2, 10, 11, 20, 21, 22, 23}
    for d, r in got.items():
        if d not in grouped_ids:
            assert r["split"] == plain[d]
            assert r["split_key"] == str(d)


def test_novelty_score_exact_counts_and_empty_doc(spark):
    from data_observability_installer_spark.operators.llm.curation import novelty_score

    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # fully known -> novelty 0
            (2, "completely new words entirely here"),  # fully novel -> 10000
            (3, "the quick brown cat sits"),  # mixed
            (4, ""),  # short-doc slice semantics: ONE empty-string shingle
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in novelty_score(docs, ref, n=3).collect()}
    assert out[1].novelty_bp == 0 and out[1].known_shingles == out[1].total_shingles
    assert out[2].novelty_bp == 10000 and out[2].known_shingles == 0
    # doc 3 3-grams: {the quick brown, quick brown cat, brown cat sits}:
    # 1 of 3 known -> floor(2/3 * 1e4)
    assert out[3].total_shingles == 3 and out[3].known_shingles == 1
    assert out[3].novelty_bp == 6666
    # truncated-slice semantics (same as the oracle): one "" shingle,
    # unseen in the reference -> fully novel
    assert out[4].total_shingles == 1 and out[4].novelty_bp == 10000


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    from data_observability_installer_spark.operators.llm.curation import (
        weighted_sample,
    )

    rows = [(i, 1.0 if i != 7 else 1e9) for i in range(100)] + [(200, 0.0), (201, None)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    b = [r.doc_id for r in weighted_sample(df, 10, "w").collect()]
    assert a == b and len(a) == 10  # deterministic exact-k
    assert 7 in a  # weight 1e9 vs 1: inclusion ~certain under A-ES
    assert 200 not in a and 201 not in a  # zero/null weights never sampled

    # changing the salt changes the draw (it's a seed, not a constant)
    c = [r.doc_id for r in weighted_sample(df, 10, "w", salt="aes-v2").collect()]
    assert 7 in c and set(c) != set(a)


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_weights_tilts_toward_target_ngrams(spark):
    """Docs made of target-only words must out-weigh docs made of
    raw-only words; a doc mixing both lands between."""
    from data_observability_installer_spark.operators.llm.curation import dsir_weights

    rows = [
        (1, "alpha beta alpha beta alpha", True),
        (2, "alpha beta beta alpha beta", True),
        (3, "gamma delta gamma delta gamma", False),
        (4, "gamma delta delta gamma delta", False),
        (5, "alpha beta gamma delta", False),   # mixed, raw side
        (6, "alpha beta alpha beta", False),    # target-looking, raw side
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    from pyspark.sql import functions as F

    w = {r["doc_id"]: r["logw_micro"] for r in dsir_weights(df, F.col("is_t")).collect()}
    assert w[6] > w[5] > w[3]
    assert w[1] > w[3] and w[2] > w[4]


def test_dsir_weights_per_doc_sum_is_count_weighted(spark):
    """Repeating a document's text doubles every feature count, so
    logw_micro scales (near-)exactly with the repetition — the sum is
    integer count x bucket ratio, no per-doc renormalization."""
    from pyspark.sql import functions as F

    from data_observability_installer_spark.operators.llm.curation import dsir_weights

    rows = [
        (1, "alpha beta gamma", True),
        (2, "alpha beta gamma alpha beta gamma", False),
        (3, "delta epsilon zeta", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {r["doc_id"]: r for r in dsir_weights(df, F.col("is_t")).collect()}
    # doc 2 = doc 1's text twice: unigram counts double (6 vs 3),
    # bigrams gain the seam ('gamma alpha'), so n_feats = 2*5 + 1
    assert out[1]["n_feats"] == 3 + 2
    assert out[2]["n_feats"] == 2 * 5 + 1


def test_dsir_weights_duckdb_twin_parity_inline(spark):
    """Cross-engine pin on a tiny planted corpus (the registry oracle
    pins the sf0.01 fixture; this pins the operator under direct
    construction, including the shorter-than-bigram fallback)."""
    import duckdb

    from pyspark.sql import functions as F

    from data_observability_installer_spark.operators.llm.curation import (
        dsir_weights,
        dsir_weights_sql,
    )

    rows = [
        (1, "alpha beta alpha", "en"),
        (2, "gamma delta", "de"),
        (3, "single", "en"),
        (4, "alpha gamma beta delta", "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    sp = [
        (r["doc_id"], r["n_feats"], r["logw_micro"])
        for r in dsir_weights(df, F.col("lang") == "en").collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    dk = con.execute(dsir_weights_sql("documents", "lang = 'en'")).fetchall()
    assert sp == [tuple(r) for r in dk]


def test_dsir_resample_enriches_target_like_docs(spark):
    """The selection step: sampling k of a corpus where target-like
    docs are a planted minority must overrepresent them well beyond
    their corpus share (the importance tilt is the whole point)."""
    from pyspark.sql import functions as F

    from data_observability_installer_spark.operators.llm.curation import (
        dsir_resample,
    )

    # 20 target-language seed docs, 80 target-LIKE raw docs, 320
    # off-domain raw docs: target-like share of the raw pool = 20%
    rows = []
    for i in range(20):
        rows.append((i, f"alpha beta alpha gamma beta tok{i % 7}", True))
    for i in range(80):
        rows.append((100 + i, f"alpha beta gamma alpha beta tok{i % 7}", False))
    for i in range(320):
        rows.append((1000 + i, f"omega psi chi phi upsilon tok{i % 11}", False))
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    k = 50
    picked = dsir_resample(df, F.col("is_t"), k=k).collect()
    assert len(picked) == k
    ids = {r["doc_id"] for r in picked}
    target_like = sum(1 for d in ids if d < 1000)
    # 100/420 ~ 24% of the corpus is target/target-like; the resample
    # must at least double that share (observed: ~all of the top-k)
    assert target_like >= k // 2
    # determinism: same salt, same answer
    again = {r["doc_id"] for r in dsir_resample(df, F.col("is_t"), k=k).collect()}
    assert again == ids
    # weights ride along as exact integers
    assert all(isinstance(r["logw_micro"], int) for r in picked)
