"""BPE trainer: bit-parity with a pure-Python token-wise greedy
trainer (including overlapping-run merges), determinism, and the
vocabulary-exhaustion guard."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from data_observability_installer_spark.operators.llm.text import bpe_train


def _python_bpe(texts: list[str], n_merges: int):
    """Token-wise reference: count adjacent pairs weighted by word
    frequency, merge the (count DESC, left, right) winner with a
    leftmost-greedy pass."""
    words = Counter()
    for t in texts:
        for w in t.lower().split():
            words[w] += 1
    vocab = {w: list(w) for w in words}
    out = []
    for rnd in range(1, n_merges + 1):
        pc = Counter()
        for w, toks in vocab.items():
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += words[w]
        if not pc:
            return out
        (l, r), ct = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rnd, l, r, ct))
        for w, toks in vocab.items():
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            vocab[w] = merged
    return out


def _rows(df):
    return [
        (r["merge_round"], r["left_tok"], r["right_tok"], r["pair_ct"])
        for r in df.collect()
    ]


def test_bpe_matches_reference_with_runs(spark):
    texts = [
        "the theme these then the aaaa aaa",
        "low lower lowest the them aaaa",
        "new newer newest these baaaab",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert _rows(bpe_train(df, n_merges=10)) == _python_bpe(texts, 10)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcde ", min_size=4, max_size=30).filter(
            lambda s: s.strip()
        ),
        min_size=2,
        max_size=5,
    )
)
def test_bpe_property_parity(spark, texts):
    """Random small-alphabet corpora (heavy with repeated-pair runs —
    the overlapping-merge hazard) train identically to the token-wise
    reference."""
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    n = 4
    assert _rows(bpe_train(df, n_merges=n)) == _python_bpe(texts, n)


def test_bpe_exhaustion_truncates(spark):
    # single-char vocabulary: no pairs at all -> empty merge table
    df = spark.createDataFrame([("a a a",)], "text string")
    assert _rows(bpe_train(df, n_merges=2)) == []
    # one mergeable pair, then exhausted -> one row, no raise
    df2 = spark.createDataFrame([("a a a bb",)], "text string")
    assert _rows(bpe_train(df2, n_merges=3)) == [(1, "b", "b", 1)]


def test_bpe_empty_corpus(spark):
    df = spark.createDataFrame([], "text string")
    assert _rows(bpe_train(df, n_merges=3)) == []


def test_bpe_deterministic(spark):
    texts = [("the quick brown fox jumps over the lazy dog",)] * 3
    df = spark.createDataFrame(texts, "text string").repartition(7)
    a = _rows(bpe_train(df, n_merges=6))
    b = _rows(bpe_train(df.repartition(3), n_merges=6))
    assert a == b
