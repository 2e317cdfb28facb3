"""Automated spike adjudication (r8 VERDICT #7): re-measure, in FRESH
sessions, every catalog query whose min moved more than ``--threshold``
(default 1.5x) between two recorded bench runs, and emit the adjudication
table for the bench commit.

Why fresh sessions: bench.py's own docstring documents that queries late
in the 200+-entry shared session can read 2-3x their isolated time from
accumulated JVM/GC pressure, and the converse also happens — a query can
be FLATTERED in-catalog by page-cache and JIT state warmed by earlier
entries (unigram_hard_em read 2.6 s in-catalog through run026 while its
true fresh-session cost was ~4 s at BOTH the r7 and r8 commits; the
"regression" in run027 was the flattery ending, not a plan change —
established by this script's protocol run by hand in round 9). Isolation
is therefore the only measurement that adjudicates a cross-run delta.

Protocol per mover: one subprocess (fresh driver JVM), one untimed
warmup collect, then min-of-3 timed fresh-build collects — the same
shape bench.py uses, minus the shared session.

Usage:
    python scripts/isolate.py --base bench_results/sf0.1_run027.json \
        --new bench_results/sf0.1_run029.json \
        [--threshold 1.5] [--min-sec 0.5] [--out bench_results/isolated_r09.json]

Verdict rule (mechanical, same as the hand-run r4-r7 adjudications):
  - isolated <= threshold * base  -> "in-session noise" (catalog reading
    inflated; isolated stays in the base band)
  - isolated >  threshold * base  -> "regression confirmed" (the slowdown
    survives isolation — bisect the code)
  - movers that got FASTER are listed informationally (improvements need
    no defense, but the table shows they re-measure stable).

Sub-second floor caveat (measured, r9): a FRESH session carries ~0.7-1.1 s
of fixed per-query overhead (first-collect codegen/broadcast machinery
that a warm catalog session amortizes), so for entries whose base is
below ``--floor-sec`` (default 1.0) the isolated number cannot
distinguish regression from floor — the r9b run read corpus_prep, which
got FASTER in-catalog (0.60 -> 0.39 s), at 1.08 s isolated. Such movers
get an explicit "below the fresh-session floor" verdict: judge them by
the catalog TOTAL and cross-run history, not by isolation.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD_SNIPPET = r"""
import json, sys, time
from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY
from traffic_accidents_airflow_kafka_spark.session import get_spark

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark(app_name="isolate-" + name)
spark.sparkContext.setLogLevel("ERROR")
spec = QUERY_REGISTRY[name]
spec.fn(spark, sf_dir).collect()  # warmup: codegen/broadcast/artifacts
samples = []
for _ in range(3):
    t = time.perf_counter()
    spec.fn(spark, sf_dir).collect()
    samples.append(time.perf_counter() - t)
print("ISOLATED_JSON:" + json.dumps({"samples": samples}))
"""


def _measure_isolated(name: str, sf_dir: str, repo_root: str) -> list[float]:
    """One fresh-JVM subprocess; returns the three timed samples."""
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD_SNIPPET, name, sf_dir],
        capture_output=True,
        text=True,
        env=env,
        cwd=repo_root,
        timeout=900,
    )
    for line in out.stdout.splitlines():
        if line.startswith("ISOLATED_JSON:"):
            return json.loads(line[len("ISOLATED_JSON:"):])["samples"]
    raise RuntimeError(
        f"isolated run of {name} produced no result:\n{out.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", required=True, help="previous record run JSON")
    ap.add_argument("--new", required=True, dest="new_run", help="new run JSON")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.5,
        help="ignore movers whose larger reading is below this (pure jitter)",
    )
    ap.add_argument(
        "--floor-sec",
        type=float,
        default=1.0,
        help="bases below this get the 'below the fresh-session floor' "
        "verdict — isolation can't distinguish regression from the "
        "~0.7-1.1 s cold fixed overhead there",
    )
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = json.load(open(args.base))["queries"]
    new = json.load(open(args.new_run))["queries"]

    movers: list[tuple[str, float, float, str]] = []
    for name in sorted(set(base) & set(new)):
        b, n = base[name], new[name]
        if max(b, n) < args.min_sec:
            continue
        if n > args.threshold * b:
            movers.append((name, b, n, "slower"))
        elif b > args.threshold * n:
            movers.append((name, b, n, "faster"))

    print(f"[isolate] {len(movers)} movers >({args.threshold}x) between "
          f"{os.path.basename(args.base)} and {os.path.basename(args.new_run)}",
          file=sys.stderr)

    load_start = os.getloadavg()[0]
    table: dict[str, dict] = {}
    for name, b, n, direction in movers:
        print(f"[isolate] {name} ({direction}: {b:.2f} -> {n:.2f}) ...",
              file=sys.stderr, flush=True)
        samples = _measure_isolated(name, args.sf_dir, repo_root)
        iso = min(samples)
        if direction == "faster":
            verdict = "improvement (re-measured stable)"
        elif iso <= args.threshold * b:
            verdict = (
                "in-session noise — isolated within the base band; "
                "the catalog reading was session-state, not a plan change"
            )
        elif b < args.floor_sec:
            verdict = (
                "below the fresh-session floor — sub-second entries "
                "isolate at the ~0.7-1.1 s cold fixed overhead "
                "regardless of direction; judge by catalog total and "
                "cross-run history, not isolation"
            )
        else:
            verdict = "regression CONFIRMED in isolation — bisect the code"
        table[name] = {
            "base": round(b, 3),
            "new_catalog": round(n, 3),
            "isolated_min": round(iso, 3),
            "isolated_samples": [round(s, 3) for s in samples],
            "direction": direction,
            "verdict": verdict,
        }

    result = {
        "protocol": (
            "fresh subprocess per query (cold driver JVM), 1 warmup + "
            f"min-of-3 fresh-build collects at {args.sf_dir}; threshold "
            f"{args.threshold}x vs {os.path.basename(args.base)}"
        ),
        "loadavg_start": round(load_start, 2),
        "loadavg_end": round(os.getloadavg()[0], 2),
        "movers": table,
        "confirmed_regressions": [
            k for k, v in table.items() if v["verdict"].startswith("regression")
        ],
    }
    text = json.dumps(result, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"[isolate] wrote {args.out}", file=sys.stderr)
    print(text)


if __name__ == "__main__":
    main()
