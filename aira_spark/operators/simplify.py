"""Douglas-Peucker polyline simplification as a FIXED-ROUND DataFrame
program — the map-rendering / trajectory-compression staple, re-expressed
without recursion: every round splits every active segment at its farthest
point in parallel across all users (the classic algorithm's recursion
tree, evaluated breadth-first), so `rounds` levels resolve up to
2^rounds segments per trajectory with `rounds` shuffles total.

Exactness: within one segment the anchor-floater line is FIXED, so
"farthest point" reduces to argmax |cross| with

    cross = (fx-ax)*(py-ay) - (fy-ay)*(px-ax)        (BIGINT, <= ~1.2e17)

— no division, no sqrt; ties break to the smallest index via the
lexicographic struct-MIN. The tolerance test compares cross^2 with
eps^2 * |AF|^2 ONCE per winning candidate, in 128-bit exact integers
(Spark DECIMAL(38,0) / DuckDB HUGEINT, the gi_hotspots widening;
cross^2 <= ~1.4e34 and eps^2*|AF|^2 <= ~6e31 both clear 1e38).

Bounded-depth convention (stated): after `rounds` levels, interior
points of still-active segments are DROPPED — the output is the depth-K
simplification (endpoints + every split winner). Degenerate segments
(coincident endpoints) have cross = 0 everywhere and prune their
interior, and 1-2 point trajectories keep all their points.

Scale shape: state is one row per interior point carrying its segment's
endpoint coords; each round is ONE hash-agg argmax (map-side combined)
+ one broadcast-sized join of the split table back onto the state, then
localCheckpoint pins the round (the sssp/flow_acc device). Nothing
quadratic, no point ever compares with another point directly.

Oracle: the SAME rounds unrolled as a WITH chain (the k_core device) —
ROW_NUMBER per segment mirrors the struct-MIN argmax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_EPS = 20_000_000  # 20 deg in the 1e-6-deg integer units
DEFAULT_ROUNDS = 4

_CROSS = "(fx2 - ax) * (y - ay) - (fy2 - ay) * (x - ax)"


def dp_simplify(
    pings: DataFrame,
    eps: int = DEFAULT_EPS,
    rounds: int = DEFAULT_ROUNDS,
) -> DataFrame:
    """(user_id, idx, ix, iy): the kept points of every user's
    Douglas-Peucker simplification at tolerance `eps`, depth `rounds`.
    `pings` carries (user_id, ts, event_id, ix, iy) integer coords."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = pings.select(
        "user_id",
        (F.row_number().over(w) - 1).alias("idx"),
        F.col("ix").cast("long").alias("x"),
        F.col("iy").cast("long").alias("y"),
        (F.count("*").over(Window.partitionBy("user_id")) - 1).alias("last"),
    ).localCheckpoint(eager=True)
    kept = pts.where((F.col("idx") == 0) | (F.col("idx") == F.col("last")))
    a0 = pts.where(F.col("idx") == 0).selectExpr(
        "user_id", "x AS ax", "y AS ay"
    )
    f0 = pts.where(F.col("idx") == F.col("last")).selectExpr(
        "user_id", "x AS fx2", "y AS fy2"
    )
    state = (
        pts.where((F.col("idx") > 0) & (F.col("idx") < F.col("last")))
        .join(a0, "user_id").join(f0, "user_id")
        .selectExpr(
            "user_id", "idx", "x", "y",
            "CAST(0 AS BIGINT) AS a_idx", "CAST(last AS BIGINT) AS f_idx",
            "ax", "ay", "fx2", "fy2",
        )
    )
    keep128 = "CAST({} AS DECIMAL(38,0))"
    for _ in range(rounds):
        scored = state.selectExpr("*", f"abs({_CROSS}) AS ac")
        win = (
            scored.groupBy("user_id", "a_idx", "f_idx")
            .agg(
                F.min(F.struct(
                    (-F.col("ac")).alias("nac"),
                    F.col("idx").alias("widx"),
                    F.col("x").alias("wx"),
                    F.col("y").alias("wy"),
                    F.col("ax").alias("wax"), F.col("ay").alias("way"),
                    F.col("fx2").alias("wfx"), F.col("fy2").alias("wfy"),
                )).alias("t")
            )
            .selectExpr(
                "user_id", "a_idx", "f_idx",
                "t.widx AS s_idx", "t.wx AS sx", "t.wy AS sy",
                "-t.nac AS sac",
                "(t.wfx - t.wax) * (t.wfx - t.wax)"
                " + (t.wfy - t.way) * (t.wfy - t.way) AS ab2",
            )
            .where(F.expr(
                f"{keep128.format('sac')} * sac"
                f" > {keep128.format(str(eps))} * {eps} * ab2"
            ))
            .select("user_id", "a_idx", "f_idx", "s_idx", "sx", "sy")
        )
        joined = state.join(
            F.broadcast(win), ["user_id", "a_idx", "f_idx"], "left"
        )
        kept = kept.unionByName(
            joined.where(F.col("idx") == F.col("s_idx")).select(
                "user_id", "idx", "x", "y",
                F.lit(0).cast("long").alias("last"),
            ),
            allowMissingColumns=False,
        )
        state = (
            joined.where(
                F.col("s_idx").isNotNull() & (F.col("idx") != F.col("s_idx"))
            )
            .selectExpr(
                "user_id", "idx", "x", "y",
                "CASE WHEN idx > s_idx THEN s_idx ELSE a_idx END AS a_idx",
                "CASE WHEN idx < s_idx THEN s_idx ELSE f_idx END AS f_idx",
                "CASE WHEN idx > s_idx THEN sx ELSE ax END AS ax",
                "CASE WHEN idx > s_idx THEN sy ELSE ay END AS ay",
                "CASE WHEN idx < s_idx THEN sx ELSE fx2 END AS fx2",
                "CASE WHEN idx < s_idx THEN sy ELSE fy2 END AS fy2",
            )
            .localCheckpoint(eager=True)
        )
    return kept.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("idx").cast("long").alias("idx"),
        F.col("x").alias("ix"),
        F.col("y").alias("iy"),
    )


def oracle_dp_sql(
    pings_cte: str,
    eps: int = DEFAULT_EPS,
    rounds: int = DEFAULT_ROUNDS,
) -> str:
    """DuckDB mirror: the identical rounds UNROLLED as a WITH chain over
    pings(user_id, ts, event_id, ix, iy)."""
    cr = ("(fx2 - ax) * (y - ay) - (fy2 - ay) * (x - ax)")
    parts = [f"""{pings_cte},
pts AS (
  SELECT user_id,
    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
      AS idx,
    CAST(ix AS BIGINT) AS x, CAST(iy AS BIGINT) AS y,
    COUNT(*) OVER (PARTITION BY user_id) - 1 AS last
  FROM pings
),
k0 AS (SELECT user_id, idx, x, y FROM pts WHERE idx = 0 OR idx = last),
s0 AS (
  SELECT p.user_id, p.idx, p.x, p.y,
    CAST(0 AS BIGINT) AS a_idx, CAST(p.last AS BIGINT) AS f_idx,
    a.x AS ax, a.y AS ay, f.x AS fx2, f.y AS fy2
  FROM pts p
  JOIN pts a ON a.user_id = p.user_id AND a.idx = 0
  JOIN pts f ON f.user_id = p.user_id AND f.idx = f.last
  WHERE p.idx > 0 AND p.idx < p.last
)"""]
    for k in range(rounds):
        parts.append(f""",
sc{k} AS (SELECT *, abs({cr}) AS ac FROM s{k}),
rk{k} AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id, a_idx, f_idx ORDER BY ac DESC, idx) AS rn
  FROM sc{k}
),
w{k} AS (
  SELECT user_id, a_idx, f_idx, idx AS s_idx, x AS sx, y AS sy
  FROM rk{k}
  WHERE rn = 1
    AND CAST(ac AS HUGEINT) * ac
        > CAST({eps} AS HUGEINT) * {eps}
          * ((fx2 - ax) * (fx2 - ax) + (fy2 - ay) * (fy2 - ay))
),
k{k + 1} AS (
  SELECT * FROM k{k}
  UNION ALL
  SELECT user_id, s_idx AS idx, sx AS x, sy AS y FROM w{k}
),
s{k + 1} AS (
  SELECT s.user_id, s.idx, s.x, s.y,
    CASE WHEN s.idx > w.s_idx THEN w.s_idx ELSE s.a_idx END AS a_idx,
    CASE WHEN s.idx < w.s_idx THEN w.s_idx ELSE s.f_idx END AS f_idx,
    CASE WHEN s.idx > w.s_idx THEN w.sx ELSE s.ax END AS ax,
    CASE WHEN s.idx > w.s_idx THEN w.sy ELSE s.ay END AS ay,
    CASE WHEN s.idx < w.s_idx THEN w.sx ELSE s.fx2 END AS fx2,
    CASE WHEN s.idx < w.s_idx THEN w.sy ELSE s.fy2 END AS fy2
  FROM s{k} s
  JOIN w{k} w ON w.user_id = s.user_id AND w.a_idx = s.a_idx
             AND w.f_idx = s.f_idx
  WHERE s.idx != w.s_idx
)""")
    parts.append(f"""
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(idx AS BIGINT) AS idx,
       CAST(x AS BIGINT) AS ix, CAST(y AS BIGINT) AS iy
FROM k{rounds}""")
    return "".join(parts)
