"""k-means tests: hand-computed Lloyd rounds, empty-cluster carry,
negative-component floor means, and partitioning invariance."""

from __future__ import annotations

import pytest

from aira_spark.operators.kmeans import kmeans_fixed, kmeans_summary


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hand_case_one_round(spark):
    # 1-D points (quantized x1024): 0, 0.001953125 (=2/1024), 10, 10.001953
    # k=2 seeds = first two points -> after 1 round centroids are the two
    # pair means; assignments split at the obvious gap
    vecs = [[0.0], [2 / 1024], [10.0], [10.0 + 2 / 1024]]
    assigned, cents = kmeans_fixed(_emb(spark, vecs), k=2, rounds=1)
    got = {r["vec_id"]: (r["cluster"], r["dist"]) for r in assigned.collect()}
    # ints: 0, 2, 10240, 10242; seeds 0 and 2
    # round-1 assignment under seeds: 0->c0 (d0), 2->c1, 10240->c1, 10242->c1
    # update: c0 = [0]; c1 = floor((2+10240+10242)/3) = floor(6828) = 6828
    assert cents == [[0], [6828]]
    # final assignment under [0, 6828]: 0->c0, 2->c0 (4 vs 46594276), rest c1
    assert got[0] == (0, 0)
    assert got[1] == (0, 4)
    assert got[2] == (1, (10240 - 6828) ** 2)
    assert got[3] == (1, (10242 - 6828) ** 2)


def test_negative_components_floor_mean(spark):
    # members -3/1024 and -4/1024 -> ints -3, -4; floor mean = floor(-3.5) = -4
    # (a truncating division would give -3)
    vecs = [[-3 / 1024], [-4 / 1024]]
    _, cents = kmeans_fixed(_emb(spark, vecs), k=1, rounds=1)
    assert cents[0] == [-4]


def test_empty_cluster_carries_previous_centroid(spark):
    # seed 1 = [1/1024] but every point is closer to seed 0 after round 1
    # pulls centroid 0 to the mass; cluster 1 keeps whatever it had when
    # it empties rather than resampling
    vecs = [[0.0], [1 / 1024], [0.0], [0.0], [0.0]]
    _, cents = kmeans_fixed(_emb(spark, vecs), k=2, rounds=3)
    # c1's only possible member is vec 1 (int 1, tie-break to c0 only when
    # equidistant); whenever it empties the previous value must persist
    assert len(cents) == 2 and cents[1] is not None


def test_partitioning_invariance(spark):
    vecs = [[float(i % 7) + (i % 3) / 1024, float(i % 5)] for i in range(60)]
    a1, c1 = kmeans_fixed(_emb(spark, vecs).coalesce(1), k=4, rounds=3)
    a8, c8 = kmeans_fixed(_emb(spark, vecs).repartition(8), k=4, rounds=3)
    assert c1 == c8
    r1 = sorted(tuple(r) for r in a1.select("vec_id", "cluster", "dist").collect())
    r8 = sorted(tuple(r) for r in a8.select("vec_id", "cluster", "dist").collect())
    assert r1 == r8


def test_k_exceeds_n_raises(spark):
    with pytest.raises(ValueError, match="exceeds"):
        kmeans_fixed(_emb(spark, [[1.0], [2.0]]), k=5, rounds=1)


def test_summary_cent_arm_consistent_with_assignments(spark):
    vecs = [[float(i % 4), float(i % 6)] for i in range(30)]
    out = kmeans_summary(_emb(spark, vecs), k=3, rounds=2).collect()
    asn = [(r["a"], r["b"]) for r in out if r["kind"] == "asn"]
    cent = {r["a"]: r["b"] for r in out if r["kind"] == "cent"}
    # n_members per cluster must equal the assignment counts
    from collections import Counter

    counts = Counter(c for _, c in asn)
    assert dict(counts) == {k: v for k, v in cent.items()}
