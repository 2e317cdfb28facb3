"""Normative StructType schemas (SURVEY.md §1.3).

The reference inferred pandas dtypes from CSV (and got bitten:
``Start_Lat INT`` in one DDL vs ``FLOAT`` in another — SURVEY §1.2); this
engine declares every schema explicitly. Raw coordinates are DoubleType;
DecimalType(10,6) only in the location dimension.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


#: ``accidents`` source table, 27 cols (notebooks/001_extract.ipynb:593-625;
#: dags/etl_crash_traffic.py:506-559). ``crash_date`` arrives as a string in
#: the raw CSV ('%m/%d/%Y %I:%M:%S %p') — see ACCIDENTS_RAW_SCHEMA.
ACCIDENTS_SCHEMA = StructType(
    [
        _f("id", IntegerType(), False),
        _f("crash_date", TimestampType()),
        _f("traffic_control_device", StringType()),
        _f("weather_condition", StringType()),
        _f("lighting_condition", StringType()),
        _f("first_crash_type", StringType()),
        _f("trafficway_type", StringType()),
        _f("alignment", StringType()),
        _f("roadway_surface_cond", StringType()),
        _f("road_defect", StringType()),
        _f("crash_type", StringType()),
        _f("intersection_related", StringType()),  # 'Y'/'N'
        _f("damage", StringType()),
        _f("prim_contributory_cause", StringType()),
        _f("num_units", IntegerType()),
        _f("most_severe_injury", StringType()),
        _f("injuries_total", DoubleType()),
        _f("injuries_fatal", DoubleType()),
        _f("injuries_incapacitating", DoubleType()),
        _f("injuries_non_incapacitating", DoubleType()),
        _f("injuries_reported_not_evident", DoubleType()),
        _f("injuries_no_indication", DoubleType()),
        _f("crash_hour", IntegerType()),
        _f("crash_day_of_week", IntegerType()),
        _f("crash_month", IntegerType()),
        _f("start_lat", DoubleType()),
        _f("start_lng", DoubleType()),
    ]
)

#: Raw-CSV variant: crash_date still a string (parsed by the ingest step).
ACCIDENTS_RAW_SCHEMA = StructType(
    [
        _f("crash_date", StringType()) if f.name == "crash_date" else f
        for f in ACCIDENTS_SCHEMA.fields
    ]
)

#: ``osm_raw`` per-bbox extract, 5 cols (dags/etl_crash_traffic.py:213-219;
#: data/raw/bbox_*_osm.csv). ``tags`` is a stringified Python dict parsed
#: by functions.scalar.parse_tags.
OSM_RAW_SCHEMA = StructType(
    [
        _f("bbox_label", StringType()),
        _f("category", StringType()),
        _f("latitude", DoubleType()),
        _f("longitude", DoubleType()),
        _f("tags", StringType()),
    ]
)

#: The 16 pivoted infrastructure count columns, in the reference's pinned
#: order (dags/etl_crash_traffic.py:477-487).
BBOX_COUNT_COLUMNS = (
    "category_hospital",
    "category_school",
    "crossing_combinations",
    "crossing_marked",
    "crossing_uncontrolled",
    "crossing_unknown",
    "crossing_unmarked",
    "crossing_zebra",
    "traffic_signals_bridge",
    "traffic_signals_emergency",
    "traffic_signals_level_crossing",
    "traffic_signals_pedestrian_crossing",
    "traffic_signals_ramp_meter",
    "traffic_signals_signal",
    "traffic_signals_traffic_lights",
    "traffic_signals_unknown",
)

#: ``bbox_summary`` pivoted table, 21 cols (dags/etl_crash_traffic.py:477-487;
#: data/processed/combined_bbox_summary_final.csv).
BBOX_SUMMARY_SCHEMA = StructType(
    [_f("bbox_label", StringType(), False)]
    + [_f(c, IntegerType()) for c in BBOX_COUNT_COLUMNS]
    + [
        _f("city", StringType()),
        _f("county", StringType()),
        _f("state", StringType()),
        _f("postcode", StringType()),
    ]
)

#: Location dimension coordinates (dags/etl_crash_traffic.py:62-63).
LOCATION_DECIMAL = DecimalType(10, 6)
