"""Geospatial proximity operators.

The reference's only spatial operation is equality on 0.5° grid-bin
labels (``dags/etl_crash_traffic.py:607-616`` — J2, implemented in
``pipeline/merge.py``). These operators extend that to true
radius/proximity queries ("accidents within r km of a hospital") with
the same scale discipline: a grid-cell equi-join generates candidates,
an exact great-circle filter decides — a theta-join never reaches the
planner.

Design (the standard distributed spatial-join shape):

1. Quantize every point to a grid cell sized so that any two points
   within ``r_km`` land in the same or an adjacent cell (cell size ≥
   the radius in degrees, conservatively at the widest longitude of
   the data).
2. Explode each PROBE point to its 3×3 cell neighborhood (9 rows — a
   constant fan-out on the small side).
3. Equi-join on the cell key (hash-partitionable, AQE-skew-safe), then
   filter candidates with the exact haversine distance.

Every expression is codegen (sin/cos/atan2 are JVM intrinsics); no
UDFs, no cross product. At 100 TB the big side shuffles once on the
cell key — identical cost to the existing grid-label merge.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: IUGG mean Earth radius.
EARTH_RADIUS_KM = 6371.0088
#: Kilometers per degree of latitude (and of longitude at the equator).
KM_PER_DEG = 111.32


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km — pure codegen trig, no UDF."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2.0
    dlon = F.radians(lon2 - lon1) / 2.0
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2.0 * EARTH_RADIUS_KM * F.atan2(F.sqrt(a), F.sqrt(1.0 - a))


def _cell(lat: Column, lon: Column, cell_deg: float) -> tuple[Column, Column]:
    return (
        F.floor(lat / F.lit(cell_deg)).cast("long"),
        F.floor(lon / F.lit(cell_deg)).cast("long"),
    )


def radius_join(
    points: DataFrame,
    centers: DataFrame,
    r_km: float,
    point_cols: tuple[str, str] = ("lat", "lon"),
    center_cols: tuple[str, str] = ("c_lat", "c_lon"),
    max_abs_lat: float = 75.0,
) -> DataFrame:
    """All (point, center) pairs within ``r_km`` great-circle km.

    ``centers`` is the SMALL side (hospitals, depots, POIs): each center
    explodes to its 3×3 grid neighborhood and the join runs as a plain
    equi-join on the cell key; the exact haversine predicate then
    filters candidates. Returns both relations' columns plus
    ``distance_km``.

    ``max_abs_lat`` caps the latitude band the cell size must stay
    conservative for: longitude degrees shrink by cos(lat), so the cell
    width is sized for the WORST latitude the data can contain (default
    ±75° — 3.86× the equator width; polar data wants a different
    scheme entirely). Within that band, a conservative cell size only
    generates more candidates for the exact filter to discard.

    Known limits (both inherited from flat lat/lon cell keys): pairs
    straddling the ±180° antimeridian fall in distant cells and are
    MISSED (fine for continental data like the reference's US corpus;
    dateline data needs a wrapped or S2/H3 cell scheme), and latitudes
    beyond ``max_abs_lat`` void the cell-size guarantee.
    """
    # Cell size: r_km in longitude-degrees at the worst latitude.
    cell_deg = r_km / (KM_PER_DEG * math.cos(math.radians(max_abs_lat)))
    plat, plon = point_cols
    clat, clon = center_cols

    pc_lat, pc_lon = _cell(F.col(plat), F.col(plon), cell_deg)
    pts = points.withColumn("__cell_lat", pc_lat).withColumn("__cell_lon", pc_lon)

    cc_lat, cc_lon = _cell(F.col(clat), F.col(clon), cell_deg)
    offsets = F.expr("explode(sequence(-1, 1))")
    cen = (
        centers.withColumn("__c_lat0", cc_lat)
        .withColumn("__c_lon0", cc_lon)
        .withColumn("__dy", offsets)
        .withColumn("__dx", F.expr("explode(sequence(-1, 1))"))
        .withColumn("__cell_lat", F.col("__c_lat0") + F.col("__dy"))
        .withColumn("__cell_lon", F.col("__c_lon0") + F.col("__dx"))
        .drop("__c_lat0", "__c_lon0", "__dy", "__dx")
    )
    dist = haversine_km(F.col(plat), F.col(plon), F.col(clat), F.col(clon))
    return (
        pts.join(cen, ["__cell_lat", "__cell_lon"])
        .withColumn("distance_km", F.round(dist, 6))
        .filter(F.col("distance_km") <= r_km)
        .drop("__cell_lat", "__cell_lon")
    )
