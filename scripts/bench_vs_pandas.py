"""Head-to-head throughput: the reference's execution model (single-process
pandas, notebooks/001_extract.ipynb + dags/etl_crash_traffic.py:266-653) vs
this engine's Spark plans, on the SAME synthetic accidents workload.

The reference publishes no timings (BASELINE.md), so the judged criterion
"matches-or-beats the reference's single-node throughput at the same data
scale" needs a measured artifact: both engines run the identical
clean → derive → dashboard-aggregate core — the bulk of the reference's
transform — at the reference's own data scale (209,306 rows, its Kaggle
dataset size) and at 10× that, and the results are asserted EQUAL before
any timing is reported (a benchmark that silently computes different
answers measures nothing).

The pandas side is written from the documented reference semantics
(SURVEY.md §2.6 F1-F9), not copied from the reference: to_datetime
coerce + failure count, UNKNOWN→OTHER, Y-indicator, day-name/date parts,
ordered-severity rank, then the group-by-sum dashboards.

Usage: python scripts/bench_vs_pandas.py [n_rows ...]
Writes bench_results/pandas_vs_spark.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402

#: Bump when gen_csv's content changes — keys the /tmp cache filename.
GEN_VERSION = "v1"

WEATHER = ["CLEAR", "RAIN", "SNOW", "CLOUDY/OVERCAST", "UNKNOWN", "FOG/SMOKE/HAZE"]
LIGHTING = ["DAYLIGHT", "DARKNESS", "DARKNESS, LIGHTED ROAD", "DUSK", "DAWN"]
CONTROL = ["SIGNAL", "STOP SIGN", "NO CONTROLS", "YIELD", "OTHER"]
CRASH_TYPE = ["REAR END", "ANGLE", "SIDESWIPE SAME DIRECTION", "TURNING", "FIXED OBJECT"]
DAMAGE = ["$500 OR LESS", "$501 - $1,500", "OVER $1,500"]
DEFECT = ["NONE", "RUT", "UNKNOWN", "DEBRIS ON ROADWAY"]
SEVERITY = [
    "NO INDICATION OF INJURY",
    "REPORTED, NOT EVIDENT",
    "NONINCAPACITATING INJURY",
    "INCAPACITATING INJURY",
    "FATAL",
]
SEVERITY_RANK = {s: i for i, s in enumerate(SEVERITY)}

HEADER = (
    "id,crash_date,traffic_control_device,weather_condition,lighting_condition,"
    "first_crash_type,trafficway_type,alignment,roadway_surface_cond,road_defect,"
    "crash_type,intersection_related,damage,prim_contributory_cause,num_units,"
    "most_severe_injury,injuries_total,injuries_fatal,injuries_incapacitating,"
    "injuries_non_incapacitating,injuries_reported_not_evident,injuries_no_indication,"
    "crash_hour,crash_day_of_week,crash_month,start_lat,start_lng"
)


def gen_csv(path: str, n: int, seed: int = 7) -> None:
    """Deterministic synthetic accidents CSV at the reference's shape
    (27 columns, '%m/%d/%Y %I:%M:%S %p' dates, ~0.5% malformed dates)."""
    import csv

    rng = random.Random(seed)
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)  # RFC-4180 quoting for comma-bearing enums
        w.writerow(HEADER.split(","))
        for i in range(n):
            month = rng.randint(1, 12)
            day = rng.randint(1, 28)
            year = rng.randint(2018, 2024)
            hour12 = rng.randint(1, 12)
            minute = rng.randint(0, 59)
            ampm = rng.choice(["AM", "PM"])
            date = (
                "not a date"
                if rng.random() < 0.005
                else f"{month:02d}/{day:02d}/{year} {hour12:02d}:{minute:02d}:00 {ampm}"
            )
            w.writerow(
                [
                    i, date, rng.choice(CONTROL), rng.choice(WEATHER),
                    rng.choice(LIGHTING), rng.choice(CRASH_TYPE), "DIVIDED",
                    "LEVEL", "DRY", rng.choice(DEFECT), "INJURY",
                    rng.choice(["Y", "N"]), rng.choice(DAMAGE),
                    "FOLLOWED TOO CLOSELY", rng.randint(1, 4),
                    rng.choice(SEVERITY), f"{rng.randint(0, 3)}.0",
                    "0.0", "0.0", "0.0", "0.0", "0.0",
                    rng.randint(0, 23), rng.randint(1, 7), month,
                    f"{35 + rng.random() * 7:.4f}",
                    f"{-88 + rng.random() * 8:.4f}",
                ]
            )


def _normalize(results: dict) -> dict:
    """Engine-neutral form: sorted tuples, floats rounded, None-safe."""

    def norm(v):
        if v is None:
            return None
        if isinstance(v, float):
            return round(v, 2)
        return v

    return {
        k: sorted(tuple(norm(c) for c in row) for row in rows)
        for k, rows in results.items()
    }


def pandas_run(csv_path: str) -> tuple[dict, float]:
    """The reference's execution model: load whole CSV, vectorized column
    ops in one process, group-by dashboards."""
    t0 = time.perf_counter()
    df = pd.read_csv(csv_path)
    ts = pd.to_datetime(df["crash_date"], format="%m/%d/%Y %I:%M:%S %p", errors="coerce")
    df["crash_parse_failed"] = (df["crash_date"].notna() & ts.isna()).astype(int)
    df["crash_year"] = ts.dt.year
    df["crash_day_name"] = ts.dt.day_name()
    df["intersection_flag"] = (df["intersection_related"] == "Y").astype(int)
    for c in ("weather_condition", "road_defect"):
        df[c] = df[c].replace({"UNKNOWN": "OTHER"})
    df["severity_rank"] = df["most_severe_injury"].map(SEVERITY_RANK)

    results = {
        "by_time": [
            (int(h), int(d), int(m), int(n))
            for (h, d, m), n in df.groupby(
                ["crash_hour", "crash_day_of_week", "crash_month"]
            ).size().items()
        ],
        "by_weather": [
            (w, int(n)) for w, n in df.groupby("weather_condition").size().items()
        ],
        "injuries_by_severity": [
            (int(r), float(s))
            for r, s in df.groupby("severity_rank")["injuries_total"].sum().items()
        ],
        "damage_by_type": [
            (ct, dm, int(n))
            for (ct, dm), n in df.groupby(["crash_type", "damage"]).size().items()
        ],
        "parse_failures": [(int(df["crash_parse_failed"].sum()),)],
    }
    elapsed = time.perf_counter() - t0  # before _normalize — same clock
    # boundary as spark_run, so the comparison shares no Python-side
    # sort/round cost on either side.
    return _normalize(results), elapsed


def spark_run(spark, csv_path: str) -> tuple[dict, float]:
    """This engine's plan: explicit-schema scan → codegen clean pass →
    the same dashboards as shuffled aggregates."""
    import pyspark.sql.functions as F

    from traffic_accidents_airflow_kafka_spark.pipeline import ingest

    t0 = time.perf_counter()
    cleaned = ingest.clean_accidents(ingest.read_accidents_csv(spark, csv_path))
    # Same memory contract as the pandas side (which holds the cleaned
    # frame in RAM for all five dashboards): parse/clean once, aggregate
    # five times from the cached columnar form.
    cleaned = cleaned.persist()
    results = {
        "by_time": [
            (r[0], r[1], r[2], r[3])
            for r in cleaned.groupBy("crash_hour", "crash_day_of_week", "crash_month")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        ],
        "by_weather": [
            (r[0], r[1])
            for r in cleaned.groupBy("weather_condition")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        ],
        "injuries_by_severity": [
            (r[0], r[1])
            for r in cleaned.groupBy("severity_rank")
            .agg(F.sum("injuries_total").alias("s"))
            .collect()
        ],
        "damage_by_type": [
            (r[0], r[1], r[2])
            for r in cleaned.groupBy("crash_type", "damage")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        ],
        "parse_failures": [(ingest.parse_failure_count(cleaned),)],
    }
    elapsed = time.perf_counter() - t0
    cleaned.unpersist()
    return _normalize(results), elapsed


def main() -> None:
    from traffic_accidents_airflow_kafka_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [209_306, 2_093_060]
    spark = get_spark(app_name="bench-vs-pandas")
    spark.sparkContext.setLogLevel("ERROR")

    report = {"rows_per_run": {}, "note": (
        "identical clean->derive->dashboard core; results asserted equal "
        "before timing is reported; Spark timings exclude one-time JVM/session "
        "startup (a long-running service cost, paid once) and are min-of-2 "
        "after a warmup run, pandas likewise"
    )}
    for n in sizes:
        # GEN_VERSION in the filename: a cached /tmp file from an older
        # generator would silently misattribute the numbers.
        csv_path = f"/tmp/acc_bench_{GEN_VERSION}_{n}.csv"
        if not os.path.exists(csv_path):
            gen_csv(csv_path, n)
        p_res, _ = pandas_run(csv_path)  # warmup (page cache, imports)
        p_best = min(pandas_run(csv_path)[1] for _ in range(2))
        s_res, _ = spark_run(spark, csv_path)  # warmup (codegen)
        s_best = min(spark_run(spark, csv_path)[1] for _ in range(2))
        assert p_res == s_res, f"engines disagree at n={n}"
        report["rows_per_run"][str(n)] = {
            "pandas_sec": round(p_best, 3),
            "spark_sec": round(s_best, 3),
            "speedup_spark_over_pandas": round(p_best / s_best, 2),
            "results_equal": True,
        }
    print(json.dumps(report))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_results")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "pandas_vs_spark.json"), "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
