"""Dedup / text / similarity operator semantics (fast in-process checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    ).cache()


def test_exact_dedup_finds_injected_dups(spark, docs):
    from aira_spark.operators.dedup import exact_dedup, with_duplicates

    d = with_duplicates(docs)
    res = exact_dedup(d)
    n_exact_dups = docs.filter(F.col("doc_id") % 7 == 0).count()
    assert res.filter(F.col("n_dups") >= 2).count() == n_exact_dups
    # in every real duplicate group the keeper is the original (smallest id);
    # near-dup rows have distinct text so they form their own singleton groups
    assert res.filter((F.col("n_dups") >= 2) & (F.col("keeper_id") >= 1_000_000)).count() == 0


def test_minhash_finds_exact_and_near_dups(spark, docs):
    from aira_spark.operators.dedup import minhash_lsh_pairs, with_duplicates

    pairs = minhash_lsh_pairs(with_duplicates(docs)).collect()
    by_pair = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    exact_ids = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0).collect()]
    # every exact dup pair must be found with jaccard 1.0
    for i in exact_ids:
        assert by_pair.get((i, i + 1_000_000)) == 1.0
    # near dups (appended tail) found with high-but-not-1 jaccard
    near_found = [k for k in by_pair if k[1] >= 2_000_000 and k[0] == k[1] - 2_000_000]
    assert len(near_found) > 0
    assert all(0.5 <= by_pair[k] < 1.0 for k in near_found)


def test_simhash_exact_dups_collide(spark, docs):
    from aira_spark.operators.dedup import simhash_dup_pairs, with_duplicates

    pairs = simhash_dup_pairs(with_duplicates(docs), n_bits=16, max_hamming=0).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    exact_ids = [r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0).collect()]
    for i in exact_ids:
        assert (i, i + 1_000_000) in found


def test_simhash_pairs_recall_is_exact(spark, docs):
    """Pigeonhole multi-band blocking has recall 1.0: the operator's pair set
    equals the all-pairs brute force, INCLUDING pairs whose differing bits
    all fall in the high half of the hash (the hole of the old
    single-block-on-high-half variant)."""
    from itertools import combinations

    from aira_spark.operators.dedup import simhash_dup_pairs, simhash_table

    # cache: both collects must see the SAME limit() sample
    sub = docs.limit(200).cache()
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_dup_pairs(sub, n_bits=16, max_hamming=2).collect()
    }
    hashes = {r.doc_id: int(r.simhash) for r in simhash_table(sub, 16).collect()}
    expect = {}
    for a, b in combinations(sorted(hashes), 2):
        h = bin(hashes[a] ^ hashes[b]).count("1")
        if h <= 2:
            expect[(a, b)] = h
    assert got == expect
    # the old blocking missed exactly these: qualifying pairs whose differing
    # bits are ALL in the high 8 of 16 — require the corpus to contain some
    # and the operator to have found them (verified by the set equality above)
    high_only = [
        p for p, h in expect.items()
        if h > 0 and (hashes[p[0]] ^ hashes[p[1]]) & 0xFF == 0
    ]
    assert high_only, "corpus has no high-half-only pair; enlarge the sample"


def test_simhash_pairs_64bit_bands(spark, docs):
    """The scale configuration (n_bits=64, 21-bit bands — Manku et al.) runs
    the same plan and matches brute force on a small sample."""
    from itertools import combinations

    from aira_spark.operators.dedup import simhash_dup_pairs, simhash_table

    sub = docs.limit(60).cache()
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_dup_pairs(sub, n_bits=64, max_hamming=3).collect()
    }
    hashes = {r.doc_id: int(r.simhash) for r in simhash_table(sub, 64).collect()}
    mask = (1 << 64) - 1  # bit 63 is the int64 sign bit: mask before popcount
    expect = {
        (a, b)
        for a, b in combinations(sorted(hashes), 2)
        if bin((hashes[a] ^ hashes[b]) & mask).count("1") <= 3
    }
    assert got == expect


def test_ngram_jaccard_block_guard(spark, docs):
    """An oversized (lang, source) block must raise loudly instead of running
    an O(n^2) within-block join."""
    from aira_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(RuntimeError, match="max_block"):
        ngram_jaccard_pairs(docs, max_block=5).collect()
    # bounded blocks still work with the guard enabled
    assert ngram_jaccard_pairs(docs.limit(40), max_block=40).count() >= 0


def test_duplicate_clusters_deep_path_graph(spark):
    """A path graph of diameter > 10 (worst case for label propagation)
    converges — the periodic localCheckpoint keeps the loop's lineage bounded
    instead of stacking 25+ persist generations."""
    from aira_spark.operators.dedup import duplicate_clusters

    n = 26
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "doc_a long, doc_b long, jaccard double"
    )
    out = duplicate_clusters(pairs, max_iters=40).collect()
    assert len(out) == n
    assert {r.cluster_id for r in out} == {0}
    assert all(r.cluster_size == n for r in out)


def test_text_features_ranges(spark, docs):
    from aira_spark.operators.text import text_features

    rows = text_features(docs).collect()
    assert len(rows) == docs.count()
    for r in rows:
        assert r.n_tokens > 0
        assert -0.4 <= r.quality <= 1.1
        assert r.lang_guess in ("stopwordy", "queryish", "dataish", "balanced")


def test_cosine_topk_self_similarity(spark, sf_dir):
    from aira_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))")
    )
    # duplicate vec 0 as id 9999: it must be the rank-1 neighbor with cos ~ 1
    dup = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(9999).cast("long"))
    e2 = emb.unionByName(dup)
    q = e2.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    top = cosine_topk(e2, q, k=3).collect()
    assert top[0].neighbor_id == 9999
    assert top[0].cos == pytest.approx(1.0, abs=1e-6)


def test_lsh_ann_recall_vs_bruteforce(spark, sf_dir):
    """LSH ANN must recover most true top-1 neighbors (recall sanity)."""
    from aira_spark.operators.similarity import cosine_topk, lsh_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()
    truth = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(
            emb, emb.selectExpr("vec_id AS query_id", "embedding AS qvec"), k=1
        ).collect()
    }
    approx = {}
    for r in lsh_ann_topk(emb, k=1, n_planes=4, n_tables=8).collect():
        approx[r.query_id] = r.neighbor_id
    hits = sum(1 for q, n in truth.items() if approx.get(q) == n)
    # 8 OR-amplified tables of 4 planes: collision prob per table ~0.14 for
    # random-gaussian top-1 pairs -> expected recall ~1-(1-0.14)^8 ~ 0.7
    assert hits / len(truth) >= 0.45, hits / len(truth)


def test_streaming_matches_batch(spark, sf_dir):
    import __spark_entry__ as em

    batch = {tuple(r) for r in em.q_events_hourly(spark, sf_dir).collect()}
    stream = {tuple(r) for r in em.q_streaming_hourly(spark, sf_dir).collect()}
    assert batch == stream


def test_lsh_ann_sql_recall_vs_bruteforce(spark, sf_dir):
    """SQL-exact integer LSH signatures (the oracle-backed path) give the
    same top-1 recall as the Gaussian numpy family at the same geometry
    (4 planes x 8 OR-amplified tables) — the literal splitmix integer
    hyperplanes are a valid sign-hash family, not just oracle plumbing."""
    from aira_spark.operators.similarity import cosine_topk, lsh_ann_topk_sql

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(200).cache()
    truth = {
        r.query_id: r.neighbor_id
        for r in cosine_topk(
            emb, emb.selectExpr("vec_id AS query_id", "embedding AS qvec"), k=1
        ).collect()
    }
    approx = {
        r.query_id: r.neighbor_id
        for r in lsh_ann_topk_sql(emb, k=1, n_planes=4, n_tables=8).collect()
    }
    hits = sum(1 for q, n in truth.items() if approx.get(q) == n)
    recall = hits / len(truth)
    assert recall >= 0.45, f"SQL-LSH recall {recall:.2f} too low"


def test_cosine_null_embedding_yields_null(spark):
    """NULL operands through the vectorized cosine give NULL (matching the
    expression form), and NULL vectors through the IVF assignment UDF give a
    NULL centroid — neither crashes the job (ADVICE r3 review)."""
    from aira_spark.operators.similarity import cos_arrow, cosine

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
            (3, [0.5, 0.5], None),
            (4, None, None),
        ],
        "id long, a array<double>, b array<double>",
    )
    got = {
        r.id: (r.u, r.e)
        for r in df.select(
            "id",
            cos_arrow(F.col("a"), F.col("b")).alias("u"),
            cosine(F.col("a"), F.col("b")).alias("e"),
        ).collect()
    }
    assert got[1] == (1.0, 1.0)
    for i in (2, 3, 4):
        assert got[i] == (None, None), (i, got[i])


def test_ivf_null_vec_assignment(spark, sf_dir):
    """A NULL embedding row mixed into the table must not crash IVF — it is
    simply never a candidate (NULL centroid joins nothing)."""
    from aira_spark.operators.similarity import ivf_ann_topk_seeded

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(50)
        .unionByName(
            spark.createDataFrame(
                [(99999, None)], "vec_id long, embedding array<double>"
            )
        )
    )
    queries = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    rows = ivf_ann_topk_seeded(emb, queries, k=3, n_centroids=4, nprobe=2).collect()
    assert rows and all(r.neighbor_id != 99999 for r in rows)


def test_ivf_seeded_matches_probed_bruteforce(spark, sf_dir):
    """Seeded IVF: the top-k inside the probed lists equals a pandas
    re-computation of the same probe semantics (independent cross-check of
    the literal-centroid projection argmax)."""
    import numpy as np

    from aira_spark.operators.similarity import ivf_ann_topk_seeded

    # 1/1024-quantized inputs: the operator contract (cosine computes exact
    # integer dots over round(x*1024); the brute force below mirrors it)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> round(CAST(x AS DOUBLE) * 1024.0) / 1024.0)"
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = ivf_ann_topk_seeded(emb, queries, k=5, n_centroids=8, nprobe=2).collect()

    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    qi = np.rint(
        np.vstack(pdf["embedding"].to_numpy()).astype(np.float64) * 1024.0
    ).astype(np.int64)

    from decimal import ROUND_HALF_UP, Decimal

    def cos6(a, b):
        # exact int dots, pinned op order, HALF_UP round6 — mirrors
        # operators.cosine + Spark ROUND (Python round() is half-even on the
        # binary double, which CAN differ on a 7th-digit 5)
        c = (
            float(int((a * b).sum()))
            / np.sqrt(float(int((a * a).sum())))
            / np.sqrt(float(int((b * b).sum())))
        )
        return float(
            Decimal(repr(c)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    cents = qi[:8]  # lowest 8 vec_ids are the seeds (ids are 0..n-1 sorted)
    # assignment: argmax of ROUNDED cosine, lowest index on tie (both engines)
    assign = [
        max(range(8), key=lambda c: (cos6(v, cents[c]), -c)) for v in qi
    ]
    for qid in range(5):
        q = qi[ids == qid][0]
        # operand order matters pre-rounding: the operator computes
        # cos_arrow(qvec, cvec) = dab/sqrt(q.q)/sqrt(c.c) — mirror it exactly
        probe = sorted(range(8), key=lambda c: (-cos6(q, cents[c]), c))[:2]
        cand = [
            (int(i), cos6(v, q))
            for i, v, a in zip(ids, qi, assign)
            if a in probe and i != qid
        ]
        cand.sort(key=lambda t: (-t[1], t[0]))
        expect = [c[0] for c in cand[:5]]
        mine = [r.neighbor_id for r in sorted(
            (g for g in got if g.query_id == qid), key=lambda r: r.rank
        )]
        assert mine == expect, f"query {qid}: {mine} != {expect}"


def test_winnow_fingerprints_properties(spark):
    """Winnowing guarantee: docs sharing a substring of length >= k + w - 1
    share at least one fingerprint; UDF values equal the SQL-form reference."""
    from aira_spark.functions import textfns as tf
    from aira_spark.operators.text import doc_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, f"prefix one {shared} suffix alpha"),
        (2, f"completely different start {shared} and end"),
        (3, "no overlap here at all with anything xyzzy"),
        (4, ""),  # degenerate: empty doc
        (5, "tiny"),  # shorter than k
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = doc_fingerprints(docs, k=8, w=4).toPandas()

    by_doc = {d: set(g.fp) for d, g in fp.groupby("doc_id")}
    assert by_doc[1] & by_doc[2], "docs sharing a long substring must share a fingerprint"
    assert not (by_doc[1] & by_doc[3] & by_doc[2]) or True  # doc3 may collide by chance; no assert
    assert by_doc[4] == {0}
    assert len(by_doc[5]) == 1

    # UDF output == SQL-form evaluation (the oracle's construction), per doc
    sql = docs.selectExpr(
        "doc_id",
        f"{tf.rolling_hash('text', 'spark')} AS doc_hash",
        f"{tf.kgram_hashes('text', 8, 'spark')} AS g",
    ).selectExpr("doc_id", "doc_hash", f"explode({tf.winnow_from_grams('g', 4, 'spark')}) AS fp")
    ref = sql.toPandas()
    got = fp.sort_values(["doc_id", "fp"]).reset_index(drop=True)
    want = ref.sort_values(["doc_id", "fp"]).reset_index(drop=True)
    assert got.equals(want)


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=4/16 lists must reach high recall@10 vs exact cosine."""
    from aira_spark.operators.similarity import cosine_topk, ivf_ann_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    queries = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .limit(20)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    exact = cosine_topk(emb, queries, k=10).toPandas()
    # synthetic embeddings are ~uniform — the adversarial worst case for a
    # coarse quantizer (true neighbors scatter across lists), so probe half
    # the lists; clustered real-world data needs far fewer
    approx = ivf_ann_topk(emb, queries, k=10, n_centroids=16, nprobe=8).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.7, f"recall@10 {recall}"
    # every returned pair's cosine must equal the exact computation (re-rank
    # is exact; only the candidate set is approximate)
    merged = approx.merge(exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e"))
    assert (merged["cos_a"] == merged["cos_e"]).all()


def test_repetition_stats_hand_counts(spark):
    """Exact integer repetition signals on hand-built docs."""
    from aira_spark.operators.text import repetition_filter, repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "aaa aaa aaa aaa bbb"),  # 5 words, 2 distinct, top=4; top bigram 3/4
            (2, "alpha bravo charlie delta echo foxtrot golf hotel india juliet"),
            (3, "solo"),                 # 1 word, 0 bigrams
        ],
        "doc_id long, text string",
    )
    s = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert (s[1].n_words, s[1].n_distinct, s[1].top_word_cnt) == (5, 2, 4)
    assert (s[1].n_bigrams, s[1].top_bigram_cnt) == (4, 3)
    assert (s[2].n_words, s[2].n_distinct, s[2].top_word_cnt) == (10, 10, 1)
    assert (s[3].n_words, s[3].n_bigrams, s[3].top_bigram_cnt) == (1, 0, 0)
    f = {r.doc_id: r for r in repetition_filter(docs).collect()}
    assert not f[1].keep          # top word 4/5 >> 0.2
    assert f[2].keep              # fully distinct, mean word len ~5
    assert f[3].keep is False or f[3].keep is True  # defined either way
    # doc 3: top word frac 1/1 > 0.2 -> dropped by the word rule
    assert not f[3].pass_word


def test_gopher_line_level_signals_hand_counts(spark):
    """Line-level + symbol + word-length Gopher signals on crafted docs."""
    from aira_spark.operators.text import repetition_filter, repetition_stats

    clean = "the quick brown fox jumps over the lazy sleeping dog tonight"
    bullets = "- alpha one\n- bravo two\n- charlie three"
    ellipses = "first thought...\nsecond thought...\nthird keeps going…\nfinal line stays"
    symbols = "### heading mark " + "word " * 9 + "#tag"
    longwords = "extraordinarily incomprehensible internationalization"
    docs = spark.createDataFrame(
        [(1, clean), (2, bullets), (3, ellipses), (4, symbols), (5, longwords)],
        "doc_id long, text string",
    )
    s = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert (s[1].n_lines, s[1].n_bullet_lines, s[1].n_ellipsis_lines) == (1, 0, 0)
    assert (s[2].n_lines, s[2].n_bullet_lines) == (3, 3)
    assert (s[3].n_lines, s[3].n_ellipsis_lines) == (4, 3)
    # '###' + '#tag' = 4 hash chars; no '...' or single-char ellipsis
    assert s[4].n_symbols == 4
    # clean doc: 60 chars, 11 words, 10 spaces -> 50 word chars
    assert (s[1].n_words, s[1].word_chars) == (11, 50)

    f = {r.doc_id: r for r in repetition_filter(docs).collect()}
    assert f[1].pass_bullet and f[1].pass_ellipsis and f[1].pass_symbol and f[1].pass_wordlen
    assert not f[2].pass_bullet       # 3/3 bullet lines = 100% > 90%
    assert not f[3].pass_ellipsis     # 3/4 ellipsis-ended = 75% > 30%
    assert not f[4].pass_symbol       # 4 symbols vs 13 words -> ratio > 0.1
    assert not f[5].pass_wordlen      # mean word length ~17 > 10


def test_phash_dup_pairs_recall_and_precision(spark, sf_dir):
    """phash near-dup banding: an injected 2-bit-flip pair and an exact copy
    are both found; every emitted pair is within the Hamming budget; results
    equal brute force on a sample."""
    from aira_spark.operators.dedup import phash_dup_pairs
    from aira_spark.sources.images import images_table

    imgs = images_table(spark, sf_dir, limit=120).select("image_id", "phash")
    from pyspark.sql import functions as F

    near = imgs.filter(F.col("image_id") == "img00000007").select(
        F.lit("near00000007").alias("image_id"),
        F.expr("phash ^ 5").alias("phash"),  # flips bits 0 and 2 -> hamming 2
    )
    cpy = imgs.filter(F.col("image_id") == "img00000011").select(
        F.lit("copy00000011").alias("image_id"), "phash"
    )
    allimg = imgs.unionByName(near).unionByName(cpy)
    pairs = phash_dup_pairs(allimg, max_hamming=2)
    got = {(r.img_a, r.img_b): r.hamming for r in pairs.collect()}
    assert got[("img00000007", "near00000007")] == 2
    assert got[("copy00000011", "img00000011")] == 0
    assert all(h <= 2 for h in got.values())
    # brute force over the same rows == banding output (recall 1.0)
    rows = allimg.collect()
    brute = {
        (min(a.image_id, b.image_id), max(a.image_id, b.image_id)): bin(
            a.phash ^ b.phash
        ).count("1")
        for i, a in enumerate(rows)
        for b in rows[i + 1 :]
        if bin(a.phash ^ b.phash).count("1") <= 2
    }
    assert got == brute


def test_phash64_exact_integer_rule():
    """phash64 equals an independent exact-integer recompute (block_sum*64 vs
    total on the equal-block grids) — pins the tie-stable definition the
    DuckDB oracle mirrors; a float-mean reformulation diverges on ~3% of
    images (exact block-mean == global-mean ties)."""
    import numpy as np

    from aira_spark.sources.images import derive_params, make_pixels, phash64

    for k in range(1, 600):
        a = make_pixels(derive_params(k))[:, :, 0].astype(np.int64)
        h, w = a.shape
        bs = a.reshape(8, h // 8, 8, w // 8).sum(axis=(1, 3))
        total = int(a.sum())
        bits = (bs.astype(object) * 64 > total).flatten()
        val = 0
        for b in bits[:63]:
            val = (val << 1) | int(b)
        assert val == phash64(make_pixels(derive_params(k))), k


def test_streaming_dedup_matches_batch(spark, sf_dir):
    """Streaming first-seen dedup's final state equals the batch exact_dedup
    (min/count are order-independent across microbatches)."""
    import __spark_entry__ as em
    from aira_spark.operators.dedup import exact_dedup, with_duplicates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    batch = {
        (r.text_hash, r.n_dups, r.keeper_id)
        for r in exact_dedup(with_duplicates(docs)).collect()
    }
    stream = {
        tuple(r) for r in em.q_streaming_dedup(spark, sf_dir).collect()
    }
    assert stream == batch


def test_embedding_near_dup_sql_precision_and_dup_recall(spark, sf_dir):
    """Independent check the oracle cannot make (it reproduces the same
    buckets): every emitted pair truly clears the cosine threshold
    (precision 1.0, verified in numpy), and every injected EXACT duplicate
    is found (identical vectors share every bucket — recall 1.0 on dups)."""
    import numpy as np

    from aira_spark.operators.similarity import embedding_near_dup_pairs_sql

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dup_ids = [r.vec_id for r in emb.filter(F.col("vec_id") % 9 == 0).collect()]
    bumped = emb.filter(F.col("vec_id") % 9 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1_000_000)
    )
    both = emb.unionByName(bumped)
    pairs = embedding_near_dup_pairs_sql(both, threshold=0.99).collect()

    pdf = both.toPandas()
    vecs = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in pdf.itertuples(index=False)
    }
    for r in pairs:
        a, b = vecs[r.vec_a], vecs[r.vec_b]
        # the operator's cosine DEFINITION quantizes to the 1/1024 grid
        # (exact integer dots) — verify precision against that definition,
        # and sanity-bound the raw-float cosine by the quantization error
        qa = np.rint(a * 1024.0).astype(np.int64)
        qb = np.rint(b * 1024.0).astype(np.int64)
        qcos = (
            float((qa * qb).sum())
            / np.sqrt(float((qa * qa).sum()))
            / np.sqrt(float((qb * qb).sum()))
        )
        assert qcos >= 0.99 - 5.1e-7, (r.vec_a, r.vec_b, qcos)
        raw = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert raw >= 0.99 - 2e-3, (r.vec_a, r.vec_b, raw)
    found = {(r.vec_a, r.vec_b) for r in pairs}
    for i in dup_ids:
        assert (i, i + 1_000_000) in found, f"exact dup {i} missed"

def test_simhash_udf_matches_sql_form(spark, sf_dir):
    """The Arrow-vectorized simhash must be BIT-IDENTICAL to the SQL
    expression form (which the DuckDB oracle runs) at both the oracle width
    (16) and the scale width (64) — same one-formula-two-engines contract,
    now with the fast path in numpy."""
    from aira_spark.functions import textfns as tf
    from aira_spark.operators.dedup import simhash_table

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
        # NULL and empty text must also agree (SQL yields 0 for NULL — every
        # per-bit CASE falls to ELSE 0 — and the UDF matches it)
        .unionByName(
            spark.createDataFrame([(90001, None), (90002, "")], "doc_id long, text string")
        )
    )
    for n_bits in (16, 64):
        sql_form = {
            r.doc_id: r.sh
            for r in docs.selectExpr(
                "doc_id",
                f"{tf.simhash(tf.words('text', 'spark'), n_bits, 'spark')} AS sh",
            ).collect()
        }
        udf_form = {r.doc_id: r.simhash for r in simhash_table(docs, n_bits).collect()}
        assert udf_form == sql_form, n_bits

def test_quality_filter_matches_threshold(spark, docs):
    """quality_filter (the library convenience around the quality gate —
    the driver pins the same predicate via corpus_clean.quality_pass) keeps
    exactly the docs at/above the threshold."""
    from aira_spark.operators.text import quality_filter, text_features

    feats = {r.doc_id: r.quality for r in text_features(docs).collect()}
    kept = {r.doc_id for r in quality_filter(docs, min_quality=0.5).collect()}
    assert kept == {d for d, q in feats.items() if q >= 0.5}
    assert 0 < len(kept) < len(feats)

def test_phash_keeper_selection_via_clusters(spark, sf_dir):
    """Image dedup end-to-end: phash near-dup pairs -> connected components
    -> keeper per cluster (min image_id). duplicate_clusters is type-generic
    (min-label works lexicographically on string ids)."""
    from pyspark.sql import functions as F

    from aira_spark.operators.dedup import duplicate_clusters, phash_dup_pairs
    from aira_spark.sources.images import images_table

    imgs = images_table(spark, sf_dir, limit=150).select("image_id", "phash")
    near = imgs.filter(F.col("image_id") == "img00000009").select(
        F.lit("zdup00000009").alias("image_id"), F.expr("phash ^ 1").alias("phash")
    )
    pairs = phash_dup_pairs(imgs.unionByName(near), max_hamming=2).select(
        F.col("img_a").alias("doc_a"), F.col("img_b").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    clusters = duplicate_clusters(pairs).collect()
    by_id = {r.doc_id: r for r in clusters}
    # the injected near-dup clusters with its source; keeper is the original
    # ('img...' < 'zdup...' lexicographically)
    assert "zdup00000009" in by_id
    assert by_id["zdup00000009"].cluster_id == by_id["img00000009"].cluster_id
    assert by_id["zdup00000009"].cluster_id == min(
        r.doc_id for r in clusters
        if r.cluster_id == by_id["zdup00000009"].cluster_id
    )

def test_minhash_udf_matches_sql_form(spark, sf_dir):
    """The Arrow-vectorized minhash signatures must be BIT-IDENTICAL to the
    SQL expression form (which the DuckDB oracle runs): shingle strings AND
    all 8 affine minhash values, including short-doc/empty edge cases."""
    from aira_spark.functions import textfns as tf
    from aira_spark.operators.dedup import minhash_signatures

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(150)
        .unionByName(
            spark.createDataFrame(
                [(90001, ""), (90002, "one two"), (90003, "one two three")],
                "doc_id long, text string",
            )
        )
    )
    sh = tf.shingles_from_words("ws", 3, "spark")
    sql_df = (
        docs.selectExpr("doc_id", f"{tf.words('text', 'spark')} AS ws")
        .selectExpr("doc_id", f"{sh} AS shingles")
        .selectExpr("doc_id", "shingles", f"{tf.shingle_hashes('shingles', 'spark')} AS hs")
        .selectExpr(
            "doc_id", "shingles",
            *[f"{tf.minhash_from_hashes('hs', i, 'spark')} AS mh{i}" for i in range(8)],
        )
    )
    sql_rows = {r.doc_id: (tuple(r.shingles), *[r[f"mh{i}"] for i in range(8)])
                for r in sql_df.collect()}
    udf_rows = {r.doc_id: (tuple(r.shingles), *[r[f"mh{i}"] for i in range(8)])
                for r in minhash_signatures(docs, 3, 8).collect()}
    # SQL yields empty-array shingles + NULL minhashes for short docs; so
    # does the UDF
    assert udf_rows == sql_rows
    assert udf_rows[90002][0] == ()
    assert udf_rows[90003][0] == ("one two three",)

def test_cosine_expression_equals_arrow_bitexact(spark, sf_dir):
    """cosine() (Column expression, used inside IVF's transform lambda) and
    cos_arrow (vectorized re-rank path) must produce BIT-IDENTICAL unrounded
    doubles: both compute exact integer dots then dab/sqrt(daa)/sqrt(dbb) in
    the same IEEE op order. This is the arithmetic-parity contract the DuckDB
    oracle relies on."""
    from aira_spark.operators.similarity import cos_arrow, cosine

    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .limit(300)
        .withColumn("embedding", F.expr(
            "transform(embedding, x -> round(CAST(x AS DOUBLE) * 1024.0) / 1024.0)"))
    )
    a = emb.selectExpr("vec_id AS ia", "embedding AS va")
    b = emb.selectExpr("vec_id AS ib", "embedding AS vb")
    pairs = a.join(b, F.col("ia") % 17 == F.col("ib") % 17).limit(2000)
    rows = pairs.select(
        cosine(F.col("va"), F.col("vb")).alias("ce"),
        cos_arrow(F.col("va"), F.col("vb")).alias("ca"),
    ).collect()
    assert len(rows) > 500
    for r in rows:
        assert r.ce == r.ca, (r.ce, r.ca)  # bitwise-equal doubles
