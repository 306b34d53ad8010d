"""Portable HyperLogLog snippet builders: one formula, two engines.

A DETERMINISTIC HLL distinct sketch (Flajolet et al. 2007, with the
linear-counting small-range correction from the HLL++ paper) whose every
intermediate is an exact integer, so the Spark query and the DuckDB oracle
agree bit-for-bit:

  - value hash    h   = h64(v)            (60-bit md5-prefix, textfns.h64)
  - bucket        j   = h % m             (m = 2^P_BITS registers)
  - remainder     w   = h // m            (W = 60 - P_BITS bits wide)
  - rank          rho = W + 1 - bitlen(w) (position of w's leftmost 1-bit,
                                           W + 1 when w = 0) — bitlen is the
                                           length of the unpadded binary
                                           string (Spark conv / DuckDB bin),
                                           so rho needs no float log2
  - register      M_j = max(rho)          over the bucket's values
  - scaled sum    S   = sum_j 2^(K - M_j) with K = W + 1; an EMPTY register
                        contributes 2^K (rho = 0). S is the hash-compared
                        integer: m * 2^K <= 2^(P_BITS + 61 - P_BITS) < 2^63.
  - estimate      E   = alpha_m * m^2 * 2^K / S, replaced by linear counting
                        m * ln(m / V) when E <= 2.5 m and V (empty
                        registers) > 0. The one double division uses the
                        exact integer S; ln differences between the two
                        engines' libm are absorbed by ROUND(.., 4).

Unlike Spark's approx_count_distinct (whose HLL hash is engine-private and
unreproducible elsewhere), this sketch is portable: any engine that can md5
recomputes the identical registers, so sketches can be persisted, merged
across runs (max is commutative), and audited.
"""

from __future__ import annotations

from .textfns import h64

P_BITS = 8
M_REG = 1 << P_BITS  # 256 registers
W_BITS = 60 - P_BITS  # remainder width (h64 yields 60-bit values)
K_SCALE = W_BITS + 1  # rho in [1, K_SCALE]; empty register rho = 0
EMPTY_TERM = 1 << K_SCALE  # an empty register's 2^(K - 0) contribution
# alpha_m for m >= 128 (Flajolet et al., Fig. 3)
ALPHA = 0.7213 / (1.0 + 1.079 / M_REG)
# E_raw numerator alpha * m^2 * 2^K, evaluated ONCE in Python and emitted as
# the same double literal into both engines' expression text
RAW_NUM = ALPHA * M_REG * M_REG * float(1 << K_SCALE)
LC_THRESHOLD = 2.5 * M_REG


def bucket_expr(h: str) -> str:
    """Register index — engine-neutral (h64 is non-negative, so % agrees)."""
    return f"({h} % {M_REG})"


def rho_expr(h: str, engine: str) -> str:
    """rho of the remainder bits: W + 1 - bit_length(h // m), exact-integer
    via the unpadded binary-string length (no float log2)."""
    if engine == "spark":
        w = f"({h} div {M_REG})"
        blen = f"length(conv({w}, 10, 2))"
    else:
        w = f"({h} // {M_REG})"
        blen = f"length(bin({w}))"
    return (
        f"CAST(CASE WHEN {w} = 0 THEN {K_SCALE} "
        f"ELSE {K_SCALE} - {blen} END AS BIGINT)"
    )


def register_term_expr(reg: str, engine: str) -> str:
    """2^(K - M_j) for a present register, as an exact BIGINT shift."""
    if engine == "spark":
        return f"shiftleft(CAST(1 AS BIGINT), {K_SCALE} - CAST({reg} AS INT))"
    return f"(CAST(1 AS BIGINT) << ({K_SCALE} - {reg}))"


def estimate_expr(s: str, v: str) -> str:
    """HLL estimate from the exact scaled register sum S and the empty
    register count V — identical text in both engines (ln/ROUND agree)."""
    raw = f"({RAW_NUM!r} / CAST({s} AS DOUBLE))"
    lc = f"({M_REG}.0 * ln({M_REG}.0 / CAST({v} AS DOUBLE)))"
    return (
        f"ROUND(CASE WHEN {raw} <= {LC_THRESHOLD!r} AND {v} > 0 "
        f"THEN {lc} ELSE {raw} END, 4)"
    )


def estimate_e4_expr(s: str, v: str) -> str:
    """The estimate as INTEGER fixed-point (units of 1e-4): the driver-safe
    form. `est_distinct` is the roster's only double that passes through
    libm `ln` + ROUND(double, n) — both engine-build-sensitive — and the
    driver's pandas canonicalizer additionally floats any non-BIGINT
    aggregate (CORRECTNESS_r03). ROUND-to-whole then CAST keeps every op in
    the deterministic IEEE subset (one literal, one division, one multiply),
    so both engines emit the identical BIGINT."""
    raw = f"({RAW_NUM!r} / CAST({s} AS DOUBLE))"
    lc = f"({M_REG}.0 * ln({M_REG}.0 / CAST({v} AS DOUBLE)))"
    est = f"(CASE WHEN {raw} <= {LC_THRESHOLD!r} AND {v} > 0 THEN {lc} ELSE {raw} END)"
    return f"CAST(ROUND({est} * 10000.0, 0) AS BIGINT)"


def hll_projection(value: str, engine: str) -> tuple[str, str]:
    """(bucket_sql, rho_sql) for one value expression."""
    h = h64(value, engine)
    return bucket_expr(h), rho_expr(h, engine)


def oracle_hll_sql(pairs_cte: str, grp: str = "grp", val: str = "v") -> str:
    """DuckDB mirror over a CTE named `pairs` with columns (grp, v)."""
    bucket, rho = hll_projection(val, "duckdb")
    term = register_term_expr("reg", "duckdb")
    s = f"(SUM({term}) + ({M_REG} - COUNT(*)) * {EMPTY_TERM})"
    v_empty = f"({M_REG} - COUNT(*))"
    return f"""
WITH {pairs_cte},
regs AS (
  SELECT {grp} AS grp, {bucket} AS bucket,
         MAX({rho}) AS reg, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY 1, 2
)
SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_values,
  CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
  CAST({s} AS BIGINT) AS register_sum,
  CAST({v_empty} AS BIGINT) AS zero_registers,
  {estimate_e4_expr(s, v_empty)} AS est_e4
FROM regs GROUP BY grp
"""


def oracle_hll_setops_sql(pairs_cte: str, grp: str = "grp", val: str = "v") -> str:
    """DuckDB mirror of operators/sketch.hll_set_estimates over a CTE named
    `pairs` with (grp, v): per-pair lossless register-max union + the
    inclusion-exclusion intersection, all in est_e4 fixed-point."""
    bucket, rho = hll_projection(val, "duckdb")
    term = register_term_expr("reg", "duckdb")
    s = f"(SUM({term}) + ({M_REG} - COUNT(*)) * {EMPTY_TERM})"
    v_empty = f"({M_REG} - COUNT(*))"
    est = estimate_e4_expr(s, v_empty)
    return f"""
WITH {pairs_cte},
regs AS MATERIALIZED (
  SELECT {grp} AS grp, {bucket} AS bucket,
         MAX({rho}) AS reg, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY 1, 2
),
singles AS (SELECT grp, {est} AS est_e4 FROM regs GROUP BY grp),
gp AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b
  FROM (SELECT DISTINCT grp FROM regs) a
  JOIN (SELECT DISTINCT grp FROM regs) b ON a.grp < b.grp
),
u AS (
  SELECT gp.grp_a, gp.grp_b, r.bucket, MAX(r.reg) AS reg
  FROM regs r JOIN gp ON r.grp IN (gp.grp_a, gp.grp_b)
  GROUP BY 1, 2, 3
),
ufold AS (
  SELECT grp_a, grp_b, {est} AS est_union_e4 FROM u GROUP BY 1, 2
)
SELECT gp.grp_a, gp.grp_b,
  sa.est_e4 AS est_a_e4, sb.est_e4 AS est_b_e4,
  uf.est_union_e4,
  CAST(sa.est_e4 + sb.est_e4 - uf.est_union_e4 AS BIGINT) AS est_inter_e4
FROM gp
JOIN ufold uf ON uf.grp_a = gp.grp_a AND uf.grp_b = gp.grp_b
JOIN singles sa ON sa.grp = gp.grp_a
JOIN singles sb ON sb.grp = gp.grp_b
"""


# ------------------------------------------------------------- count-min

CM_DEPTH = 4
CM_WIDTH = 1024


def cm_bucket_expr(value: str, row: int, engine: str) -> str:
    """Counter index of `value` in CMS row `row`: an independent md5 stream
    per row via a row-tagged hash input (the same device as the classifier's
    ':w' weight tag) — identical integers in both engines."""
    tagged = f"({value} || ':cm{row}')"
    return f"({h64(tagged, engine)} % {CM_WIDTH})"


def oracle_cms_sql(pairs_cte: str, watchlist_values: str) -> str:
    """DuckDB mirror of cms_point_estimates over a CTE named `pairs`
    (grp, v); `watchlist_values` is a VALUES list like "('data'), ('the')"."""
    counter_ctes = ",\n".join(
        f"c{i} AS (SELECT grp, {cm_bucket_expr('v', i, 'duckdb')} AS b, "
        f"CAST(COUNT(*) AS BIGINT) AS cnt FROM pairs GROUP BY 1, 2)"
        for i in range(CM_DEPTH)
    )
    probe_cols = ", ".join(
        f"{cm_bucket_expr('term', i, 'duckdb')} AS b{i}" for i in range(CM_DEPTH)
    )
    joins = "\n".join(
        f"LEFT JOIN c{i} ON c{i}.grp = p.grp AND c{i}.b = p.b{i}"
        for i in range(CM_DEPTH)
    )
    least = "LEAST(" + ", ".join(
        f"COALESCE(c{i}.cnt, 0)" for i in range(CM_DEPTH)
    ) + ")"
    return f"""
WITH {pairs_cte},
wl(term) AS (VALUES {watchlist_values}),
{counter_ctes},
probes AS (
  SELECT g.grp, wl.term, {probe_cols}
  FROM (SELECT DISTINCT grp FROM pairs) g, wl
),
est AS (
  SELECT p.grp, p.term, CAST({least} AS BIGINT) AS est_count
  FROM probes p
  {joins}
),
exact AS (
  SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM pairs JOIN wl ON v = term GROUP BY 1, 2
)
SELECT est.grp, est.term, est.est_count,
       COALESCE(exact.true_count, 0) AS true_count
FROM est LEFT JOIN exact ON est.grp = exact.grp AND est.term = exact.term
"""
