"""Round-4g additions: link prediction, ordered dithering, geohash,
feathered mosaic blend — brute-force python mirrors + shape pins."""

import pytest


# --------------------------------------------------------------- link_pred


def _toy_edges(spark):
    # path 1-2-3-4 plus star around 10: non-edges (1,3),(2,4),(1,4) etc.
    rows = [
        (1, 2), (2, 3), (3, 4),
        (10, 11), (10, 12), (10, 13), (11, 12),
        (2, 10), (3, 10),
    ]
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_link_pred_matches_brute_force(spark):
    from aira_spark.operators.linkpred import link_prediction

    edges = _toy_edges(spark)
    und = set()
    for a, b in edges.collect():
        und.add((a, b))
        und.add((b, a))
    nodes = sorted({a for a, _ in und})
    nbr = {n: {b for a, b in und if a == n} for n in nodes}
    want = {}
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in und:
                continue
            cn = len(nbr[u] & nbr[w])
            if cn < 2:
                continue
            du, dw = len(nbr[u]), len(nbr[w])
            want[(u, w)] = (
                cn, du, dw, cn * 1_000_000 // (du + dw - cn), du * dw
            )
    got = {
        (r["u"], r["w"]): (
            r["cn"], r["deg_u"], r["deg_w"], r["jaccard_e6"], r["pref_attach"]
        )
        for r in link_prediction(edges, min_common=2).collect()
    }
    assert got == want


def test_link_pred_excludes_existing_edges(spark):
    from aira_spark.operators.linkpred import link_prediction

    edges = _toy_edges(spark)
    und = set()
    for a, b in edges.collect():
        und.add((a, b))
        und.add((b, a))
    for r in link_prediction(edges, min_common=1).collect():
        assert (r["u"], r["w"]) not in und
        assert r["u"] < r["w"]
