"""Geohash encoding — the base-32 interleaved lat/lon cell string
(PostGIS ST_GeoHash / Elasticsearch geohash_grid parity): bit 0 of the
key stream is the lon's MSB, bits alternate lon/lat, and every 5 bits
map to one character of the geohash alphabet. A geohash PREFIX is a cell
that contains all its refinements, so prefix-grouped layouts get the
same range-scan locality story as the Morton layout (geohash IS Morton
with lon-first bit order and base-32 text serialization — the reuse is
literal: the same bit-interleave projection, different bit roles).

Exactness: both engines compute lon/lat 15-bit integers with the same
clamped FLOOR, interleave with integer shift/mask arithmetic only, and
slice the same alphabet string — no floating point survives past the
initial grid snap, so the strings agree byte-for-byte.

Scale shape: encode is a pure integer Column projection (zero Python,
zero exchanges); the census is one hash agg keyed by the 4-char prefix.
At 100 TB the encode rides whole-stage codegen inside the scan stage and
the agg is map-side combined on ~32^4 bounded keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
BITS = 15  # per axis; 30 bits total = 6 geohash chars


def _axis_sql(col: str, lo: float, span: float) -> str:
    n = 1 << BITS
    return (
        f"CAST(LEAST(GREATEST(FLOOR(({col} - ({lo})) / {span} * {float(n)}),"
        f" 0), {n - 1}) AS BIGINT)"
    )


def _interleave_sql(lon: str, lat: str) -> str:
    # geohash bit order: MSB (bit 29) is lon bit 14, bit 28 is lat bit 14,
    # ... == morton with even bits from lat, odd bits from lon
    return " + ".join(
        f"((({lat} >> {b}) & 1) << {2 * b}) + ((({lon} >> {b}) & 1) << {2 * b + 1})"
        for b in range(BITS)
    )


def _chars_sql(key: str, n_chars: int) -> str:
    parts = [
        f"substr('{ALPHABET}', CAST((({key}) >> {5 * (6 - 1 - i)}) & 31 AS INT)"
        " + 1, 1)"
        for i in range(n_chars)
    ]
    return "concat(" + ", ".join(parts) + ")"


def geohash_col(x_name: str, y_name: str, n_chars: int = 6) -> Column:
    """Geohash string of columns (lon x_name, lat y_name) as a pure
    integer Column projection (names, not Columns — the expression is
    assembled as SQL text so both engines share it verbatim)."""
    lon = _axis_sql(x_name, -180.0, 360.0)
    lat = _axis_sql(y_name, -90.0, 180.0)
    return F.expr(_chars_sql(f"({_interleave_sql(lon, lat)})", n_chars))


def geohash_census(points: DataFrame, prefix_chars: int = 4) -> DataFrame:
    """(gh4, n_pts, min_pt, max_pt, min_gh6, max_gh6): per-prefix census
    of full 6-char geohashes over (point_id, x, y)."""
    lon = _axis_sql("x", -180.0, 360.0)
    lat = _axis_sql("y", -90.0, 180.0)
    key = f"({_interleave_sql(lon, lat)})"
    gh6 = _chars_sql(key, 6)
    return (
        points.selectExpr("point_id", f"{gh6} AS gh6")
        .selectExpr(
            f"substr(gh6, 1, {prefix_chars}) AS gh4", "point_id", "gh6"
        )
        .groupBy("gh4")
        .agg(
            F.count("*").cast("long").alias("n_pts"),
            F.min("point_id").cast("long").alias("min_pt"),
            F.max("point_id").cast("long").alias("max_pt"),
            F.min("gh6").alias("min_gh6"),
            F.max("gh6").alias("max_gh6"),
        )
    )


def oracle_geohash_sql(points_sql: str, prefix_chars: int = 4) -> str:
    """DuckDB mirror: identical integer grid snap, interleave and alphabet
    slicing in plain SQL."""
    lon = _axis_sql("x", -180.0, 360.0)
    lat = _axis_sql("y", -90.0, 180.0)
    inter = _interleave_sql("lon15", "lat15")
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST(((key >> {5 * (6 - 1 - i)}) & 31) AS INT)"
        " + 1, 1)"
        for i in range(6)
    )
    return f"""
WITH p AS ({points_sql}),
ax AS (SELECT point_id, {lon} AS lon15, {lat} AS lat15 FROM p),
ky AS (SELECT point_id, {inter} AS key FROM ax),
gh AS (SELECT point_id, {chars} AS gh6 FROM ky)
SELECT substr(gh6, 1, {prefix_chars}) AS gh4,
  CAST(COUNT(*) AS BIGINT) AS n_pts,
  CAST(MIN(point_id) AS BIGINT) AS min_pt,
  CAST(MAX(point_id) AS BIGINT) AS max_pt,
  MIN(gh6) AS min_gh6, MAX(gh6) AS max_gh6
FROM gh GROUP BY 1"""
