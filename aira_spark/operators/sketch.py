"""Distributed distinct-count sketching (deterministic HyperLogLog).

Exact COUNT(DISTINCT v) over a 10^12-row corpus is the classic scale trap:
it must shuffle every distinct VALUE to its reducer (the shuffle is the size
of the vocabulary). The HLL sketch replaces it with a fixed m-register state
per group — the shuffle carries at most m = 256 small integer rows per
(group x input partition) regardless of input size, and Catalyst's partial
aggregation folds the per-partition registers map-side before the exchange.

The register/estimate formulas live in functions/sketchfns.py as shared
expression text (one formula, two engines), so the DuckDB oracle reproduces
the estimate bit-for-bit — unlike approx_count_distinct, whose sketch hash
is engine-private. Registers use max (commutative/idempotent), so sketches
for the same group computed on different days or different engines merge
losslessly: persist the (grp, bucket, reg) rows and re-aggregate.

Plan shape (pinned by tests/test_plans.py): projection -> two hash
aggregations; NO join, NO Python nodes; the only exchanges are the two
agg shuffles of register-sized rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sketchfns import (
    EMPTY_TERM,
    M_REG,
    estimate_e4_expr,
    estimate_expr,
    hll_projection,
    register_term_expr,
)


def hll_registers(pairs: DataFrame, grp: str = "grp", val: str = "v") -> DataFrame:
    """(grp, bucket, reg, cnt): the persisted/mergeable sketch state — per
    (group, register) rank max plus observation count. Partial agg runs
    map-side, so at most m register rows per group leave each input
    partition. NULL values are skipped, matching COUNT(DISTINCT)."""
    bucket, rho = hll_projection(val, "spark")
    return (
        pairs.where(F.col(val).isNotNull())
        .selectExpr(f"{grp} AS grp", f"{bucket} AS bucket", f"{rho} AS rho")
        .groupBy("grp", "bucket")
        .agg(F.max("rho").alias("reg"), F.count("*").cast("long").alias("cnt"))
    )


def fold_registers(regs: DataFrame) -> DataFrame:
    """Fold (grp, bucket, reg, cnt) register rows into the exact scaled sum
    S (the hash-compared integer) and the rounded estimate. Shared by the
    batch and streaming paths — identical estimates by construction."""
    term = register_term_expr("reg", "spark")
    s = f"(SUM({term}) + ({M_REG} - COUNT(*)) * {EMPTY_TERM})"
    v_empty = f"({M_REG} - COUNT(*))"
    return regs.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n_values"),
        F.count("*").cast("long").alias("n_buckets_used"),
        F.expr(f"CAST({s} AS BIGINT)").alias("register_sum"),
        F.expr(f"CAST({v_empty} AS BIGINT)").alias("zero_registers"),
        F.expr(estimate_expr(s, v_empty)).alias("est_distinct"),
        # the driver-checked form: integer fixed-point (1e-4 units) — see
        # sketchfns.estimate_e4_expr for why the double stays out of the gate
        F.expr(estimate_e4_expr(s, v_empty)).alias("est_e4"),
    )


def hll_distinct(pairs: DataFrame, grp: str = "grp", val: str = "v") -> DataFrame:
    """(grp, n_values, n_buckets_used, register_sum, zero_registers,
    est_distinct): deterministic HLL distinct estimate of `val` per `grp`.

    `pairs` holds one row per observation (duplicates welcome — registers
    max-fold them)."""
    return fold_registers(hll_registers(pairs, grp, val))


def distinct_words_by_source(docs: DataFrame) -> DataFrame:
    """Vocabulary-size sketch per corpus source: the flagship HLL use —
    distinct whitespace tokens per `source` without shuffling the vocabulary.
    Empty-string tokens (from empty texts) are excluded in both engines."""
    pairs = docs.selectExpr(
        "source AS grp", "explode(split(text, ' ')) AS v"
    ).where(F.expr("length(v) > 0"))
    return hll_distinct(pairs, "grp", "v")


def hll_set_estimates(pairs: DataFrame, grp: str = "grp", val: str = "v") -> DataFrame:
    """(grp_a, grp_b, est_a_e4, est_b_e4, est_union_e4, est_inter_e4):
    sketch SET ALGEBRA over every group pair — the HLL union is LOSSLESS
    (elementwise register max, the same merge that makes sketches
    persistable), and the intersection estimate is inclusion-exclusion
    |A∩B| ≈ E(A) + E(B) - E(A∪B), which can go negative for disjoint
    sets (standard HLL behavior — emitted as-is, integer fixed-point).

    Scale shape: ONE corpus pass builds the per-group registers; pairing
    happens on the REGISTER table (groups x 256 rows — metadata-sized),
    never on data: each pair's union sketch is a re-aggregation of two
    groups' register rows via a broadcast pair list."""
    regs = hll_registers(pairs, grp, val).localCheckpoint(eager=True)
    groups = regs.select("grp").distinct()
    pairs_df = (
        groups.selectExpr("grp AS grp_a")
        .join(F.broadcast(groups.selectExpr("grp AS grp_b")))
        .where("grp_a < grp_b")
    )
    # per-group singles (est in fixed-point)
    singles = fold_registers(regs).selectExpr("grp", "est_e4")
    # union registers: tag each register row with every pair it belongs to
    tagged = (
        regs.join(
            F.broadcast(pairs_df),
            (F.col("grp") == F.col("grp_a")) | (F.col("grp") == F.col("grp_b")),
        )
        .groupBy("grp_a", "grp_b", "bucket")
        .agg(F.max("reg").alias("reg"), F.sum("cnt").cast("long").alias("cnt"))
        .withColumn("grp", F.concat_ws("|", "grp_a", "grp_b"))
    )
    unions = fold_registers(tagged.select("grp", "bucket", "reg", "cnt")).selectExpr(
        "grp", "est_e4 AS est_union_e4"
    )
    return (
        pairs_df.withColumn("grp", F.concat_ws("|", "grp_a", "grp_b"))
        .join(unions, "grp")
        .join(singles.selectExpr("grp AS grp_a", "est_e4 AS est_a_e4"), "grp_a")
        .join(singles.selectExpr("grp AS grp_b", "est_e4 AS est_b_e4"), "grp_b")
        .selectExpr(
            "grp_a", "grp_b", "est_a_e4", "est_b_e4", "est_union_e4",
            "est_a_e4 + est_b_e4 - est_union_e4 AS est_inter_e4",
        )
    )


def cms_counters(pairs: DataFrame, grp: str = "grp", val: str = "v") -> DataFrame:
    """(grp, row, bucket, cnt): count-min sketch counters — d x w = 4 x 1024
    bounded counter state per group, built in ONE pass. Like the HLL
    registers, counters are exact integers from shared hash formulas
    (portable across engines/runs) and merge by plain addition, and the
    shuffle carries at most d*w counter rows per (group x input partition)
    thanks to map-side partial aggregation — never the vocabulary."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    arms = ", ".join(
        f"named_struct('row', {i}, 'bucket', {cm_bucket_expr(val, i, 'spark')})"
        for i in range(CM_DEPTH)
    )
    return (
        pairs.where(F.col(val).isNotNull())
        .selectExpr(f"{grp} AS grp", f"explode(array({arms})) AS rb")
        .groupBy("grp", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_point_estimates(
    pairs: DataFrame, watchlist: DataFrame, grp: str = "grp", val: str = "v"
) -> DataFrame:
    """(grp, term, est_count, true_count): count-min frequency estimates for
    a broadcast watchlist of terms, next to the exact counts (the sketch
    guarantee est >= true is pinned by pytest; the overestimate is the price
    of d*w bounded state instead of a vocabulary-sized histogram).

    Scale shape: the counters (<= groups * 4096 rows) and the watchlist both
    broadcast; the only corpus-sized work is the one counter-building pass.
    Terms absent from a group estimate >= 0 via whatever collisions their
    buckets carry — rows are emitted for every (group, watch term), matching
    the point-query semantics of a real CMS."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    # the counter table feeds 4 row-joins AND the group list — without
    # truncation Catalyst recomputes the whole explode+agg subtree 5 times
    # in one action; counters are <= groups * d * w rows (metadata-sized),
    # so an eager localCheckpoint makes every reference a scan
    counters = cms_counters(pairs, grp, val).localCheckpoint(eager=True)
    groups = counters.select("grp").distinct()
    probes = groups.crossJoin(F.broadcast(watchlist)).selectExpr(
        "grp", "term", *[
            f"{cm_bucket_expr('term', i, 'spark')} AS b{i}"
            for i in range(CM_DEPTH)
        ]
    )
    est = probes
    for i in range(CM_DEPTH):
        ci = (
            counters.where(F.col("row") == i)
            .selectExpr("grp", f"bucket AS b{i}", f"cnt AS c{i}")
        )
        # left join: an empty counter bucket means the row saw NO collisions
        # for this term -> that row's estimate is 0
        est = est.join(F.broadcast(ci), ["grp", f"b{i}"], "left").fillna(
            0, subset=[f"c{i}"]
        )
    least = "least(" + ", ".join(f"c{i}" for i in range(CM_DEPTH)) + ")"
    exact = (
        pairs.join(F.broadcast(watchlist), F.col(val) == F.col("term"))
        .groupBy(grp, "term")
        .agg(F.count("*").cast("long").alias("true_count"))
        .withColumnRenamed(grp, "grp")
    )
    return (
        est.selectExpr("grp", "term", f"CAST({least} AS BIGINT) AS est_count")
        .join(exact, ["grp", "term"], "left")
        .fillna(0, subset=["true_count"])
    )


def cms_join_size(a: DataFrame, b: DataFrame, val: str = "v") -> DataFrame:
    """(row, inner_prod): count-min JOIN-SIZE estimation — the classic
    sketch inner product. For equi-join on the sketched key,
    |A ⋈ B| <= Σ_j cmsA[i][j]·cmsB[i][j] for EVERY row i (hash collisions
    only add), so min over rows is the estimate and the guarantee is
    one-sided, exactly like the point queries. Emitted per hash row
    (0..d-1) plus the fold row -1 = the estimate — the query optimizer's
    cardinality primitive, computed from two bounded sketches without ever
    touching the join.

    Scale shape: one counter pass per side (bounded d×w state each), then
    a (row, bucket) equi-join of two ≤4096-row tables — broadcast, free.
    Counters are exact integers from the shared hash text, so both engines
    agree bit-for-bit."""
    ca = cms_counters(a.selectExpr("'s' AS grp", f"{val} AS v"))
    cb = cms_counters(b.selectExpr("'s' AS grp", f"{val} AS v"))
    prod = (
        ca.selectExpr("row", "bucket", "cnt AS ca")
        .join(
            F.broadcast(cb.selectExpr("row", "bucket", "cnt AS cb")),
            ["row", "bucket"],
        )
        .groupBy("row")
        .agg(F.sum(F.col("ca") * F.col("cb")).cast("long").alias("inner_prod"))
    )
    est = prod.agg(
        F.min("inner_prod").cast("long").alias("inner_prod")
    ).selectExpr("CAST(-1 AS BIGINT) AS row", "inner_prod")
    return prod.selectExpr("CAST(row AS BIGINT) AS row", "inner_prod").unionByName(est)


def oracle_cms_join_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB mirror over two subqueries each yielding a key column `v`."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    def counters(src: str, name: str) -> str:
        arms = "\nUNION ALL\n".join(
            f"SELECT CAST({i} AS BIGINT) AS row, "
            f"CAST({cm_bucket_expr('v', i, 'duckdb')} AS BIGINT) AS bucket, "
            f"CAST(COUNT(*) AS BIGINT) AS cnt FROM {name}_src "
            "WHERE v IS NOT NULL GROUP BY 2"
            for i in range(CM_DEPTH)
        )
        return f"{name}_src AS ({src}),\n{name} AS (\n{arms}\n)"

    return f"""
WITH {counters(a_sql, "ca")},
{counters(b_sql, "cb")},
prod AS (
  SELECT ca.row, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS inner_prod
  FROM ca JOIN cb ON cb.row = ca.row AND cb.bucket = ca.bucket
  GROUP BY 1
)
SELECT row, inner_prod FROM prod
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(MIN(inner_prod) AS BIGINT) FROM prod
"""


def bloom_probe(build: DataFrame, probe: DataFrame, val: str = "v") -> DataFrame:
    """One row (n_bits_set, n_probed, n_hits, n_true, n_false_pos): build a
    PORTABLE Bloom filter over `build` and probe every distinct `probe`
    value — the join-pruning primitive (ship the bits, skip the shuffle for
    rows that cannot match), made engine-reproducible by reusing the
    count-min hash rows: the filter IS the CMS with counts clipped to
    presence, bits = distinct (row, bucket) over d=4 independent md5-based
    hashes x w=1024 buckets. A value hits iff all 4 of its (row, bucket)
    bits are set — one-sided like every sketch here (no false negatives;
    n_false_pos measures the rate the 4096-bit budget buys).

    Scale shape: the build side folds to <= 4096 DISTINCT bit rows (one
    pass, map-side combined) and BROADCASTS; the probe side explodes its 4
    arms and equi-joins the bits — hits are keys whose matched-arm count
    is 4. Nothing but (row, bucket) ids and probe keys move."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    arms = ", ".join(
        f"named_struct('row', {i}, 'bucket', {cm_bucket_expr('v', i, 'spark')})"
        for i in range(CM_DEPTH)
    )
    bset = build.selectExpr(f"{val} AS v").where("v IS NOT NULL").distinct()
    bits = (
        bset.selectExpr(f"explode(array({arms})) AS rb")
        .select(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .distinct()
    )
    pset = probe.selectExpr(f"{val} AS v").where("v IS NOT NULL").distinct()
    probed = pset.selectExpr(
        "v", f"explode(array({arms})) AS rb"
    ).select(
        "v", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    hits = (
        probed.join(F.broadcast(bits), ["row", "bucket"])
        .groupBy("v")
        .agg(F.count("*").alias("n_arms"))
        .where(F.col("n_arms") == CM_DEPTH)
        .select("v")
    )
    truth = pset.join(bset.withColumnRenamed("v", "v2"), F.col("v") == F.col("v2"), "left_semi")
    n_bits = bits.count()
    n_probed = pset.count()
    n_hits = hits.count()
    n_true = truth.count()
    n_fp = hits.join(truth, "v", "left_anti").count()
    return build.sparkSession.createDataFrame(
        [(n_bits, n_probed, n_hits, n_true, n_fp)],
        "n_bits_set long, n_probed long, n_hits long, n_true long, n_false_pos long",
    )


def oracle_bloom_sql(build_sql: str, probe_sql: str) -> str:
    """DuckDB mirror over subqueries each yielding a key column `v`."""
    from ..functions.sketchfns import CM_DEPTH, cm_bucket_expr

    bit_arms = "\nUNION\n".join(
        f"SELECT CAST({i} AS BIGINT) AS row, "
        f"CAST({cm_bucket_expr('v', i, 'duckdb')} AS BIGINT) AS bucket "
        "FROM bset"
        for i in range(CM_DEPTH)
    )
    probe_arms = "\nUNION ALL\n".join(
        f"SELECT v, CAST({i} AS BIGINT) AS row, "
        f"CAST({cm_bucket_expr('v', i, 'duckdb')} AS BIGINT) AS bucket "
        "FROM pset"
        for i in range(CM_DEPTH)
    )
    return f"""
WITH bset AS (SELECT DISTINCT v FROM ({build_sql}) WHERE v IS NOT NULL),
pset AS (SELECT DISTINCT v FROM ({probe_sql}) WHERE v IS NOT NULL),
bits AS ({bit_arms}),
probed AS ({probe_arms}),
hits AS (
  SELECT p.v FROM probed p JOIN bits b ON b.row = p.row AND b.bucket = p.bucket
  GROUP BY p.v HAVING COUNT(*) = {CM_DEPTH}
)
SELECT CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
  CAST((SELECT COUNT(*) FROM pset) AS BIGINT) AS n_probed,
  CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_hits,
  CAST((SELECT COUNT(*) FROM pset WHERE v IN (SELECT v FROM bset)) AS BIGINT) AS n_true,
  CAST((SELECT COUNT(*) FROM hits WHERE v NOT IN (SELECT v FROM bset)) AS BIGINT) AS n_false_pos
"""
