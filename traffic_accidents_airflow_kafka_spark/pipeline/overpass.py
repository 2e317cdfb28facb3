"""Overpass (OSM) ingestion job (SURVEY.md §2.1 S8).

The reference's ``extract_bbox_osm`` (dags/etl_crash_traffic.py:163-228):
36 half-degree bboxes, one Overpass QL query each (schools, hospitals,
traffic signals, crossings), 5 s pacing, one CSV per bbox, skip-if-exists.

Per SURVEY §2.1 S8 this stays an *out-of-engine* driver-side job — a
serial, rate-limited HTTP loop has no business on executors — and the
engine consumes its file output (pipeline.osm). The HTTP transport is
injectable: production passes a real ``fetch`` (e.g. ``requests``-based);
tests pass a fake. No HTTP library is imported here.
"""

from __future__ import annotations

import csv
import os
import time
from collections.abc import Callable, Iterable, Mapping

#: The 36 target bboxes (dags/etl_crash_traffic.py:175-185) — public
#: half-degree grid cells over US metro areas.
BBOXES: tuple[tuple[float, float], ...] = (
    (35.0, -81.0), (32.5, -97.0), (34.0, -118.5), (29.5, -95.5),
    (34.5, -82.5), (37.5, -122.5), (35.5, -79.0), (33.5, -118.5),
    (40.5, -74.0), (36.0, -87.0), (41.5, -88.0), (33.5, -84.5),
    (42.0, -71.5), (25.5, -80.5), (33.5, -118.0), (34.0, -118.0),
    (40.5, -74.5), (30.0, -98.0), (26.0, -80.5), (30.0, -82.0),
    (29.5, -96.0), (40.0, -75.5), (28.5, -81.5), (41.5, -88.5),
    (30.0, -91.5), (47.5, -122.5), (37.0, -122.0), (38.5, -77.5),
    (34.5, -83.0), (34.5, -87.0), (41.0, -82.0), (42.0, -83.5),
    (34.0, -117.5), (39.5, -84.5), (27.5, -83.0), (38.5, -90.5),
)

#: A fetched OSM node: (lat, lon, tags-dict).
Node = tuple[float, float, Mapping[str, str]]
FetchFn = Callable[[str], Iterable[Node]]

CSV_HEADER = ("bbox_label", "category", "latitude", "longitude", "tags")


def overpass_query(min_lat: float, min_lon: float, size: float = 0.5) -> str:
    """The QL query per bbox (dags/etl_crash_traffic.py:198-207)."""
    max_lat, max_lon = min_lat + size, min_lon + size
    bbox = f"({min_lat},{min_lon},{max_lat},{max_lon})"
    return f"""
    [out:json][timeout:25];
    (
      node["amenity"="school"]{bbox};
      node["amenity"="hospital"]{bbox};
      node["highway"="traffic_signals"]{bbox};
      node["highway"="crossing"]{bbox};
    );
    out body;
    """


def node_category(tags: Mapping[str, str]) -> str:
    """amenity wins, then highway, else 'N/A' (:214)."""
    return tags.get("amenity", tags.get("highway", "N/A"))


def extract_bbox_osm(
    fetch: FetchFn,
    raw_folder: str,
    bboxes: Iterable[tuple[float, float]] = BBOXES,
    pacing_seconds: float = 5.0,
    sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Run the extraction: one fetch per bbox → one CSV per bbox.

    Idempotent like the reference (:170-173): skips entirely when the
    sentinel first-bbox file already exists. Tags serialize as
    ``str(dict)`` — the exact stringified-Python-dict format the
    downstream parse expects (F11). Returns the files written.
    """
    os.makedirs(raw_folder, exist_ok=True)
    bboxes = list(bboxes)
    first_lat, first_lon = bboxes[0]
    sentinel = os.path.join(raw_folder, f"bbox_{first_lat}_{first_lon}_osm.csv")
    if os.path.exists(sentinel):
        return []

    written: list[str] = []
    for min_lat, min_lon in bboxes:
        label = f"{min_lat}_{min_lon}"
        nodes = fetch(overpass_query(min_lat, min_lon))
        out_path = os.path.join(raw_folder, f"bbox_{label}_osm.csv")
        with open(out_path, "w", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(CSV_HEADER)
            for lat, lon, tags in nodes:
                w.writerow([label, node_category(tags), lat, lon, str(dict(tags))])
        written.append(out_path)
        sleep(pacing_seconds)
    return written
