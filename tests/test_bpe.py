"""BPE tokenizer tests: hand-computed merge tables, replay ==
iterative-lowest-rank equivalence, REPLACE-semantics edge cases,
partitioning invariance, and the vocab-cap guard."""

from __future__ import annotations

import pytest

from aira_spark.operators.bpe import (
    _apply_merge,
    encode_token_counts,
    train_bpe,
    train_merges_local,
)


def test_apply_merge_nonoverlapping_left_to_right():
    # 'aaaa' with merge (a,a): left-to-right non-overlap -> [aa, aa]
    assert _apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    # odd run: [aa, a]
    assert _apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    # interleaved: 'abab' merge (a,b) -> [ab, ab]
    assert _apply_merge(list("abab"), "a", "b") == ["ab", "ab"]
    # no false cross-token match: tokens [a, ba] have no (a, b) adjacency
    assert _apply_merge(["a", "ba"], "a", "b") == ["a", "ba"]


def test_hand_computed_merges():
    """wf: low=2, lower=1. Pairs: (l,o)=3 (w,e)... work it by hand:
    low x2:   (l,o) 2, (o,w) 2
    lower x1: (l,o) 1, (o,w) 1, (w,e) 1, (e,r) 1
    round 1: (l,o)=3 wins -> lo
    round 2: pairs (lo,w)=3, (w,e)=1, (e,r)=1 -> low
    round 3: (low,e)=1, (e,r)=1 -> tie on count; lexicographic: (e,r) < (low,e)
    """
    merges = train_merges_local([("low", 2), ("lower", 1)], 4)
    assert [(l, r, c) for l, r, c in merges[:3]] == [
        ("l", "o", 3),
        ("lo", "w", 3),
        ("e", "r", 1),
    ]
    # round 4: only (low, er) remains
    assert merges[3] == ("low", "er", 1)
    # round 5 would find no pairs: training stops
    assert train_merges_local([("low", 2), ("lower", 1)], 99) == merges


def test_pair_counts_are_positional_overlapping():
    # 'aaa' freq 1: (a,a) counted twice (positions 0-1, 1-2)
    merges = train_merges_local([("aaa", 1), ("bc", 1)], 1)
    # (a,a)=2 beats (b,c)=1
    assert merges[0] == ("a", "a", 2)


def test_replay_equals_iterative_lowest_rank():
    """Applying merges once each in rank order == repeatedly merging the
    lowest-rank pair present (the standard replay equivalence) — checked
    on every word of a random-ish corpus against an independent
    lowest-rank-first encoder."""
    words = [
        ("banana", 3), ("bandana", 2), ("cabana", 5), ("ananas", 1),
        ("scan", 4), ("scanner", 2), ("nab", 7),
    ]
    merges = train_merges_local(words, 12)
    ranked = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def iterative(w):
        toks = list(w)
        while True:
            best, bi = None, None
            for i in range(len(toks) - 1):
                rk = ranked.get((toks[i], toks[i + 1]))
                if rk is not None and (best is None or rk < best):
                    best, bi = rk, i
            if best is None:
                return toks
            toks = toks[:bi] + [toks[bi] + toks[bi + 1]] + toks[bi + 2 :]

    def replay(w):
        toks = list(w)
        for left, right, _ in merges:
            toks = _apply_merge(toks, left, right)
        return toks

    for w, _ in words + [("bananana", 0), ("cabanascan", 0), ("x", 0)]:
        assert replay(w) == iterative(w), w


def test_spark_end_to_end_and_partitioning_invariance(spark):
    rows = [(i, t) for i, t in enumerate(
        ["low low lower", "lowest low", "slow flow low", "lower slower"] * 6
    )]
    docs1 = spark.createDataFrame(rows, "doc_id long, text string").coalesce(1)
    docs8 = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    m1, m8 = train_bpe(docs1, 10), train_bpe(docs8, 10)
    assert m1 == m8  # merge table independent of physical partitioning
    c1 = {r["doc_id"]: r["n_bpe_tokens"] for r in encode_token_counts(docs1, m1).collect()}
    c8 = {r["doc_id"]: r["n_bpe_tokens"] for r in encode_token_counts(docs8, m8).collect()}
    assert c1 == c8
    # independent check of one doc: encode 'low low lower' by hand replay
    toks = sum(
        len(_apply_merge_all(list(w), m1)) for w in "low low lower".split()
    )
    assert c1[0] == toks


def _apply_merge_all(toks, merges):
    for left, right, _ in merges:
        toks = _apply_merge(toks, left, right)
    return toks


def test_vocab_cap_is_loud(spark):
    # 80 distinct lowercase-only words (digits would fail WORD_RE)
    docs = spark.createDataFrame(
        [(i, f"{'x' * (i + 1)} {'y' * (i + 1)}") for i in range(40)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_vocab"):
        train_bpe(docs, 5, max_vocab=10)


def test_oov_and_non_lowercase_words(spark):
    # words outside ^[a-z]+$ contribute zero tokens; OOV lowercase words
    # (unseen at training) still encode via merge replay
    docs = spark.createDataFrame([(0, "aa aa")], "doc_id long, text string")
    merges = train_bpe(docs, 2)  # learns (a,a)
    test = spark.createDataFrame(
        [(1, "aa AA 123 aaa zz")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["n_bpe_tokens"] for r in encode_token_counts(test, merges).collect()}
    # aa->1 tok, AA/123 ignored, aaa->[aa,a]=2 (OOV), zz->[z,z]=2 (unseen chars)
    assert got[1] == 1 + 2 + 2
