"""Round-3 operators: cell-cover compaction, raster polygonize regions,
benchmark decontamination, sequence packing, semantic dedup."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from aira_spark.functions.cells import np_cell_pack
from aira_spark.operators.compact import compact_cover, expand_cover
from aira_spark.operators.packing import pack_sequences
from aira_spark.operators.regions import (
    cell_adjacency,
    threshold_cells,
)
from aira_spark.operators.similarity import semantic_dup_pairs
from aira_spark.operators.text import decontaminate


def _cells_df(spark, res, coords):
    rows = [(int(np_cell_pack(res, ix, iy)),) for ix, iy in coords]
    return spark.createDataFrame(rows, "cell long")


# ---------------------------------------------------------------- compact


def test_compact_promotes_full_blocks_across_levels(spark):
    # an 4x4 block at res 3 compacts two levels to ONE res-1 cell; one
    # stray cell stays at res 3
    coords = [(ix, iy) for ix in range(4) for iy in range(4)] + [(7, 7)]
    out = compact_cover(_cells_df(spark, 3, coords), 3, 0).collect()
    got = {(r.cell, r.res) for r in out}
    assert (int(np_cell_pack(1, 0, 0)), 1) in got
    assert (int(np_cell_pack(3, 7, 7)), 3) in got
    assert len(got) == 2


def test_compact_partial_blocks_stay(spark):
    # 3 of 4 children -> no promotion
    coords = [(0, 0), (0, 1), (1, 0)]
    out = compact_cover(_cells_df(spark, 5, coords), 5, 3).collect()
    assert {(r.cell, r.res) for r in out} == {
        (int(np_cell_pack(5, ix, iy)), 5) for ix, iy in coords
    }


def test_compact_expand_roundtrip_on_real_cover(spark, sf_dir):
    from aira_spark.operators.chunks import cell_cover, with_meta
    from aira_spark.sources.images import images_table

    cov = cell_cover(with_meta(images_table(spark, sf_dir)), 7).select("cell")
    base = {r.cell for r in cov.distinct().collect()}
    comp = compact_cover(cov, 7, 4)
    # strictly fewer rows than the distinct input unless nothing compacted
    n_comp = comp.count()
    assert n_comp <= len(base)
    # exact inverse: expansion reproduces the original distinct set
    expanded = {r.cell for r in expand_cover(comp, 7).collect()}
    assert expanded == base
    # all resolutions within the requested range
    rs = {r.res for r in comp.select("res").distinct().collect()}
    assert rs <= {4, 5, 6, 7}


def test_compact_rejects_bad_range(spark):
    with pytest.raises(ValueError):
        compact_cover(_cells_df(spark, 3, [(0, 0)]), 3, 4)


# ---------------------------------------------------------------- regions


def test_threshold_cells_integer_predicate(spark):
    df = spark.createDataFrame(
        [(1, 4, 400), (2, 4, 399), (3, 1, 100)],
        "cell long, n_px long, sum_px long",
    )
    kept = {r.cell for r in threshold_cells(df, 100, 1).collect()}
    assert kept == {1, 3}  # mean >= 100 exactly; 399/4 fails


def test_cell_adjacency_4_neighbors_only(spark):
    # plus-shape: center adjacent to all 4 arms; diagonal NOT adjacent
    coords = [(5, 5), (6, 5), (4, 5), (5, 6), (5, 4), (7, 7)]
    cells = _cells_df(spark, 4, coords)
    edges = cell_adjacency(cells).collect()
    c = lambda ix, iy: int(np_cell_pack(4, ix, iy))
    got = {(r.doc_a, r.doc_b) for r in edges}
    # east/north orientation: doc_a + delta = doc_b
    assert (c(4, 5), c(5, 5)) in got
    assert (c(5, 5), c(6, 5)) in got
    assert (c(5, 4), c(5, 5)) in got
    assert (c(5, 5), c(5, 6)) in got
    assert all(a != c(7, 7) and b != c(7, 7) for a, b in got)
    assert len(got) == 4


def test_region_labels_merge_l_shape(spark):
    # an L-shaped run of cells + an isolated cell: one 5-cell region and one
    # singleton, via the same path threshold_regions composes
    from aira_spark.operators.dedup import duplicate_clusters

    coords = [(0, 0), (1, 0), (2, 0), (2, 1), (2, 2), (9, 9)]
    cells = _cells_df(spark, 4, coords)
    stats = cells.select(
        "cell", F.lit(4).alias("n_px"), F.lit(800).alias("sum_px")
    )
    hot = threshold_cells(stats, 100, 1)
    clusters = duplicate_clusters(cell_adjacency(hot)).collect()
    c = lambda ix, iy: int(np_cell_pack(4, ix, iy))
    lab = {r.doc_id: r.cluster_id for r in clusters}
    region = {lab[c(ix, iy)] for ix, iy in coords[:5]}
    assert region == {c(0, 0)}  # min cell id labels the whole L
    assert c(9, 9) not in lab  # isolated: no edges -> singleton backfill


# ---------------------------------------------------------------- packing


def test_pack_sequences_matches_pandas_mirror(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = pack_sequences(docs, budget=512, n_shards=8).toPandas()
    # independent mirror: python tokenize + cumsum (NOT the SQL formula)
    import re

    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+")
    pdf = docs.toPandas()
    pdf["n_tok"] = pdf["text"].map(lambda t: len(pat.findall(t)))
    import hashlib

    def shard(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) % 8

    pdf["shard"] = pdf["doc_id"].map(shard)
    pdf = pdf.sort_values(["shard", "doc_id"])
    pdf["tok_start"] = pdf.groupby("shard")["n_tok"].cumsum() - pdf["n_tok"]
    pdf["pack_id"] = pdf["tok_start"] // 512
    pdf["pack_offset"] = pdf["tok_start"] % 512
    pdf["straddles"] = (pdf["tok_start"] + pdf["n_tok"] - 1) // 512 > pdf["pack_id"]
    m = got.sort_values("doc_id").reset_index(drop=True)
    e = pdf[
        ["doc_id", "shard", "n_tok", "tok_start", "pack_id", "pack_offset",
         "straddles"]
    ].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        m.astype({"straddles": bool}), e.astype(m.dtypes.to_dict())
    )


def test_pack_sequences_offsets_are_dense_within_shard(spark, sf_dir):
    # within a shard, doc k's start == doc k-1's start + its n_tok (the
    # concat-and-chunk stream has no holes)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    got = pack_sequences(docs, budget=512, n_shards=4).toPandas()
    got["start"] = got["pack_id"] * 512 + got["pack_offset"]
    for _, g in got.sort_values("doc_id").groupby("shard"):
        starts = g["start"].to_numpy()
        toks = g["n_tok"].to_numpy()
        assert (starts[1:] == starts[:-1] + toks[:-1]).all()
        assert starts[0] == 0


# ---------------------------------------------------------------- decontaminate


def test_decontaminate_flags_verbatim_overlap(spark):
    bench_text = " ".join(f"w{i}" for i in range(13))
    clean_text = " ".join(f"x{i}" for i in range(20))
    # doc 10 embeds the benchmark 13-gram inside other words; doc 11 shares
    # only 12 of the 13 words (shifted by one -> no full 13-gram)
    contaminated = "pre " + bench_text + " post"
    near_miss = " ".join(f"w{i}" for i in range(12)) + " zz"
    docs = spark.createDataFrame(
        [(10, contaminated), (11, near_miss), (12, clean_text)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(1, bench_text)], "doc_id long, text string")
    out = {r.doc_id: r for r in decontaminate(docs, bench, k=13).collect()}
    assert set(out) == {10}
    assert out[10].n_hit_grams == 1
    assert out[10].min_bench_doc == 1


def test_decontaminate_short_docs_never_flagged(spark):
    short = " ".join(f"w{i}" for i in range(12))  # < 13 words
    docs = spark.createDataFrame([(1, short)], "doc_id long, text string")
    bench = spark.createDataFrame([(2, short)], "doc_id long, text string")
    assert decontaminate(docs, bench, k=13).count() == 0


# ---------------------------------------------------------------- semantic dedup


def test_semantic_dup_pairs_finds_exact_dups(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(40, 8)).astype("float32")
    rows = [(i, [float(v) for v in base[i]]) for i in range(40)]
    rows.append((100, rows[5][1]))  # exact dup of vec 5
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dup_pairs(df, n_centroids=4, threshold=0.999).collect()
    assert {(r.vec_a, r.vec_b) for r in out} == {(5, 100)}
    assert all(abs(r.cos - 1.0) < 1e-5 for r in out)


def test_semantic_dup_pairs_respects_threshold(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.8, 0.6, 0.0, 0.0]  # cos = 0.8
    df = spark.createDataFrame(
        [(0, v), (1, w)], "vec_id long, embedding array<float>"
    )
    hi = semantic_dup_pairs(df, n_centroids=1, threshold=0.9).count()
    lo = semantic_dup_pairs(df, n_centroids=1, threshold=0.7).count()
    assert hi == 0 and lo == 1


def test_gram_hashes_udf_matches_sql(spark, sf_dir):
    """gram_hashes_arrow must be BIT-IDENTICAL to the SQL expression form
    (array_distinct over shingle_hashes) that the DuckDB oracle runs —
    values AND order AND NULL/short-doc edges."""
    from aira_spark.functions import textfns as tf
    from aira_spark.operators.text import gram_hashes_arrow

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
        .unionByName(
            spark.createDataFrame(
                [(90001, ""), (90002, "a b c"), (90003, None),
                 (90004, "a b c d e f g h i j k l m n")],
                "doc_id long, text string",
            )
        )
    )
    k = 13
    sh = tf.shingles_from_words(tf.words("text", "spark"), k, "spark")
    sql_rows = {
        r.doc_id: None if r.ghs is None else tuple(r.ghs)
        for r in docs.selectExpr(
            "doc_id", f"array_distinct({tf.shingle_hashes(sh, 'spark')}) AS ghs"
        ).collect()
    }
    gh = gram_hashes_arrow(k)
    udf_rows = {
        r.doc_id: None if r.ghs is None else tuple(r.ghs)
        for r in docs.select("doc_id", gh(F.col("text")).alias("ghs")).collect()
    }
    assert udf_rows == sql_rows
    assert udf_rows[90002] == ()          # < k words -> empty
    assert udf_rows[90003] is None        # NULL text -> NULL
    assert len(udf_rows[90004]) == 2      # 14 words -> 2 distinct 13-grams


def test_cc_pointer_jump_converges_on_long_path(spark):
    """A 300-node path (diameter 299) must converge in O(log d) rounds —
    plain hop-propagation would need 299 rounds and raise; pointer jumping
    makes max_iters=15 ample."""
    from aira_spark.operators.dedup import duplicate_clusters

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)],
        "doc_a long, doc_b long, jaccard double",
    )
    out = duplicate_clusters(pairs, max_iters=15).collect()
    assert len(out) == n
    assert {r.cluster_id for r in out} == {0}
    assert all(r.cluster_size == n for r in out)


def test_cell_adjacency_no_field_carry_at_grid_edge(spark):
    """A cell at iy = 2^29 - 1 must NOT link to (ix+1, 0) — the +1 bump
    carries into the ix field and aliases a valid same-resolution id."""
    from aira_spark.functions.cells import IX_SHIFT, RES_SHIFT
    from aira_spark.operators.regions import cell_adjacency

    res, ix = 29, 7
    top = (res << RES_SHIFT) + (ix << IX_SHIFT) + ((1 << IX_SHIFT) - 1)
    aliased = (res << RES_SHIFT) + ((ix + 1) << IX_SHIFT)  # == top + 1
    cells = spark.createDataFrame([(top,), (aliased,)], "cell long")
    edges = cell_adjacency(cells).collect()
    assert edges == []  # not adjacent: different columns


def test_stratified_sample_quota_semantics(spark, sf_dir):
    """src with ppm=1e6 keeps everything, ppm=0 keeps nothing, partial
    quotas keep a subset; assignment is deterministic across invocations
    and the split hash is independent of the sample hash."""
    from aira_spark.operators.curation import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    rates = {"src0": 1_000_000, "src1": 0}
    out = stratified_sample(docs, rates, default_ppm=500_000).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    n_src0 = docs.filter(F.col("source") == "src0").count()
    assert len(by_src.get("src0", [])) == n_src0   # full keep
    assert "src1" not in by_src                    # excluded
    rest = [r for r in out if r.source not in ("src0", "src1")]
    n_rest = docs.filter(~F.col("source").isin("src0", "src1")).count()
    assert 0 < len(rest) < n_rest                  # partial stratum
    # deterministic: second run identical
    again = stratified_sample(docs, rates, default_ppm=500_000).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # splits present and not a constant (independent uniform)
    splits = {r.split for r in out}
    assert "train" in splits and len(splits) >= 2
    # different salt reshuffles membership
    salted = stratified_sample(docs, rates, default_ppm=500_000, salt="v2").collect()
    assert {r.doc_id for r in salted} != {r.doc_id for r in out}


def test_bm25_matches_python_bruteforce(spark):
    """BM25 vs an INDEPENDENT python mirror (math.log, float arithmetic,
    integer-micro rounding) on a hand-sized corpus."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from aira_spark.operators.rank import bm25_scores

    corpus = [
        (1, "join scan join filter noise words here"),
        (2, "scan scan scan data data"),
        (3, "nothing relevant at all"),
        (4, "join"),
    ]
    queries = [(0, "join"), (0, "scan"), (1, "data")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    qdf = spark.createDataFrame(queries, "query_id long, term string")
    got = {
        (r.query_id, r.doc_id): (r.n_terms_hit, r.score_micros)
        for r in bm25_scores(docs, qdf).collect()
    }
    # python mirror
    k1, b = 1.2, 0.75
    dls = {d: len(t.split(" ")) for d, t in corpus}
    n, total = len(corpus), sum(dls.values())
    tf_ = {}
    for d, t in corpus:
        for w in t.split(" "):
            tf_[(d, w)] = tf_.get((d, w), 0) + 1
    terms = {t for _, t in queries}
    df_ = {t: sum(1 for d, _ in corpus if tf_.get((d, t))) for t in terms}
    exp = {}
    for q, t in queries:
        for d, _ in corpus:
            f = tf_.get((d, t))
            if not f:
                continue
            idf = math.log(1 + (n - df_[t] + 0.5) / (df_[t] + 0.5))
            tfn = (f * (k1 + 1)) / (f + k1 * (1 - b + b * (dls[d] * n / total)))
            mic = int(
                Decimal(repr(idf * tfn * 1_000_000)).quantize(
                    Decimal("1"), rounding=ROUND_HALF_UP
                )
            )
            hit, s = exp.get((q, d), (0, 0))
            exp[(q, d)] = (hit + 1, s + mic)
    assert got == exp
    assert (0, 3) not in got   # no shared terms -> absent, not zero


def test_grouped_compact_independent_per_group(spark):
    """A full 2x2 block in one group must NOT be promoted by siblings in
    another group; grouped output equals per-group compact_cover."""
    from aira_spark.functions.cells import np_cell_pack
    from aira_spark.operators.compact import compact_cover, compact_cover_grouped

    res = 6
    # group A: a complete 2x2 block (promotes); group B: 3 of the same 4
    a_cells = [int(np_cell_pack(res, ix, iy)) for ix in (4, 5) for iy in (8, 9)]
    b_cells = a_cells[:3]
    rows = [("A", c) for c in a_cells] + [("B", c) for c in b_cells]
    df = spark.createDataFrame(rows, "grp string, cell long")
    got = {
        (r["grp"], r["cell"], r["res"])
        for r in compact_cover_grouped(df, res, res - 1).collect()
    }
    per_group = set()
    for g, cells in (("A", a_cells), ("B", b_cells)):
        one = spark.createDataFrame([(c,) for c in cells], "cell long")
        for r in compact_cover(one, res, res - 1).collect():
            per_group.add((g, r["cell"], r["res"]))
    assert got == per_group
    # A promoted to one parent, B kept its 3 children
    assert sum(1 for g, _, rr in got if g == "A" and rr == res - 1) == 1
    assert sum(1 for g, _, rr in got if g == "B" and rr == res) == 3


def test_dissolve_melts_overlapping_polygons(spark, sf_dir):
    """Dissolved cover per category == distinct union of the per-polygon
    rasterizations, expanded back to fine resolution."""
    import __spark_entry__ as em
    from aira_spark.operators.compact import expand_cover
    from aira_spark.operators.dissolve import dissolve_covers
    from aira_spark.operators.rasterize import rasterize_to_cells
    from aira_spark.sources.vectors import polygons_table

    polys = polygons_table(spark, sf_dir)
    dis = dissolve_covers(polys, "category", em.CELL_RES)
    ras = rasterize_to_cells(polys, em.CELL_RES).join(
        polys.select("poly_id", "category"), "poly_id"
    )
    for cat in [r["category"] for r in polys.select("category").distinct().collect()]:
        fine = {
            r["cell"]
            for r in expand_cover(
                dis.filter(F.col("grp") == cat).select("cell", "res"),
                em.CELL_RES,
            ).collect()
        }
        want = {
            r["cell"]
            for r in ras.filter(F.col("category") == cat).select("cell").distinct().collect()
        }
        assert fine == want, cat
