"""Radius-join semantics vs a Python haversine reference, adjacent-cell
recall, and the no-theta-join plan guarantee."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators import geo


def _hav_py(lat1, lon1, lat2, lon2):
    rlat1, rlat2 = math.radians(lat1), math.radians(lat2)
    dlat = math.radians(lat2 - lat1) / 2
    dlon = math.radians(lon2 - lon1) / 2
    a = math.sin(dlat) ** 2 + math.cos(rlat1) * math.cos(rlat2) * math.sin(dlon) ** 2
    return 2 * geo.EARTH_RADIUS_KM * math.atan2(math.sqrt(a), math.sqrt(1 - a))


def test_haversine_matches_python_reference(spark):
    rows = [
        (41.88, -87.63, 41.88, -87.63),   # identical points → 0
        (41.88, -87.63, 42.33, -83.05),   # Chicago → Detroit ≈ 382 km
        (-33.87, 151.21, 51.51, -0.13),   # Sydney → London (antipodal-ish)
        (74.9, 10.0, 74.9, 11.0),         # high latitude, 1° longitude
    ]
    df = spark.createDataFrame(rows, "lat1 double, lon1 double, lat2 double, lon2 double")
    got = df.select(
        geo.haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
    ).collect()
    for (la1, lo1, la2, lo2), r in zip(rows, got):
        assert abs(r["d"] - _hav_py(la1, lo1, la2, lo2)) < 1e-6


def test_radius_join_matches_bruteforce(spark):
    """Every (point, center) pair the exact O(N*M) haversine scan keeps
    must come back from the grid-candidate join — including pairs that
    straddle a cell boundary — and nothing else."""
    centers = [(1, 41.880, -87.630), (2, 42.000, -87.900)]
    points = [
        (10, 41.881, -87.631),   # ~0.14 km from c1
        (11, 41.925, -87.630),   # ~5.0 km north of c1
        (12, 41.970, -87.900),   # ~3.3 km south of c2
        (13, 41.500, -87.000),   # far from both
        (14, 42.043, -87.902),   # ~4.8 km north of c2 (boundary-ish)
    ]
    pdf = spark.createDataFrame(points, "pid long, lat double, lon double")
    cdf = spark.createDataFrame(centers, "cid long, c_lat double, c_lon double")
    r_km = 5.0
    got = {
        (r["pid"], r["cid"])
        for r in geo.radius_join(pdf, cdf, r_km).collect()
    }
    want = {
        (pid, cid)
        for pid, plat, plon in points
        for cid, clat, clon in centers
        if _hav_py(plat, plon, clat, clon) <= r_km
    }
    assert got == want and (10, 1) in want and (13, 1) not in want


def test_radius_join_plans_equi_join_not_theta(spark):
    pdf = spark.range(1000).select(
        "id",
        (41.0 + (F.col("id") % 100) / 100.0).alias("lat"),
        (-88.0 + (F.col("id") % 97) / 97.0).alias("lon"),
    )
    cdf = spark.range(5).select(
        F.col("id").alias("cid"),
        F.lit(41.5).alias("c_lat"),
        F.lit(-87.5).alias("c_lon"),
    )
    plan = (
        geo.radius_join(pdf, cdf, 10.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_radius_join_on_reference_osm_nodes(spark):
    """Domain integration on the reference's REAL coordinates: schools
    within 5 km of a hospital in one bbox (the nearest school-hospital
    pair there is ~2.8 km), cross-checked against a brute-force
    haversine over the same rows."""
    import os

    import pytest

    path = "/root/reference/data/raw/bbox_41.5_-88.5_osm.csv"
    if not os.path.exists(path):
        pytest.skip("reference raw data not available")
    from traffic_accidents_airflow_kafka_spark.pipeline.osm import read_osm_raw

    raw = read_osm_raw(spark, path).select(
        "category",
        F.col("latitude").cast("double").alias("latitude"),
        F.col("longitude").cast("double").alias("longitude"),
    )
    schools = raw.filter(F.col("category") == "school").select(
        F.col("latitude").alias("lat"), F.col("longitude").alias("lon")
    )
    hospitals = raw.filter(F.col("category") == "hospital").select(
        F.col("latitude").alias("c_lat"), F.col("longitude").alias("c_lon")
    )
    got = geo.radius_join(schools, hospitals, 5.0).collect()

    s_rows = [(r["lat"], r["lon"]) for r in schools.collect()]
    h_rows = [(r["c_lat"], r["c_lon"]) for r in hospitals.collect()]
    assert s_rows and h_rows, "bbox fixture lost its schools/hospitals"
    want = sum(
        1
        for sla, slo in s_rows
        for hla, hlo in h_rows
        if _hav_py(sla, slo, hla, hlo) <= 5.0
    )
    assert len(got) == want > 0
    assert all(r["distance_km"] <= 5.0 for r in got)
