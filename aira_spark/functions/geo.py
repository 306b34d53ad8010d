"""Geodesic (great-circle) distance on the WGS84 mean sphere.

The grid index (functions/cells.py) is planar lat/lon; for km-accurate
semantics the distance itself must be spherical. The haversine expression is
kept textually identical between the Spark Column form and the DuckDB oracle
SQL so both engines evaluate the same IEEE double formula.

Antimeridian: the CELL GRID is the bounded plane [-180, 180) x [-90, 90)
without longitude wrapping, but the haversine itself wraps (sin^2(dlon/2)
has period 360) — so geodesic operators must cover the wrapped remainder of
any interval that crosses +-180 (within_distance_km_join does), and any
certification bound derived from planar cell separation must account for
wrapped-close points (knn_join's haversine finalization does, via the
180 - |qx| cap).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean radius


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (haversine; exact on the sphere)."""
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * F.lit(EARTH_RADIUS_KM) * F.asin(F.sqrt(h))


def sql_haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same formula as ANSI SQL text (DuckDB oracle parity)."""
    dlat = f"(RADIANS({lat2} - {lat1}) / 2.0)"
    dlon = f"(RADIANS({lon2} - {lon1}) / 2.0)"
    h = (
        f"(SIN({dlat}) * SIN({dlat}) + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * SIN({dlon}) * SIN({dlon}))"
    )
    return f"(2.0 * {EARTH_RADIUS_KM} * ASIN(SQRT({h})))"


def disk_margins_deg(qy: Column, d_km: float) -> tuple[Column, Column]:
    """Conservative (superset) lat/lon half-extents in degrees of a d_km
    great-circle disk centered at latitude qy.

    lat: central angle >= |dlat|, so |dlat| <= d/R exactly.
    lon: haversine >= 2R * cos(phi_max) * sin(dlon/2) >= (2R cos(phi_max)/pi)
         * dlon for dlon in [0, pi], so dlon <= pi*d / (2R cos(phi_max)) rad
         = 90*d / (R cos(phi_max)) deg, with phi_max = |qy| + dlat the worst
         latitude inside the band. When the band reaches past 89.9 deg the
         cos bound degenerates, so the margin switches to the FULL longitude
         range (360) — an arbitrary clamp there would silently drop
         near-pole pairs; full cover is conservative, never lossy.
    """
    import math

    dlat = math.degrees(d_km / EARTH_RADIUS_KM)
    phi_max = F.abs(qy) + F.lit(dlat)
    dlon = F.when(phi_max >= F.lit(89.9), F.lit(360.0)).otherwise(
        F.lit(90.0 * d_km / EARTH_RADIUS_KM) / F.cos(F.radians(phi_max))
    )
    return F.lit(dlat), dlon
