"""Regenerate CATALOG.md from the live query registry.

Usage: python scripts/dump_catalog.py   (writes CATALOG.md at the repo root)

The table is generated, not hand-maintained — descriptions come from each
query's registered doc string, tier and oracle status from the registry,
so the file can never drift from the code.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from traffic_accidents_airflow_kafka_spark.plans import QUERY_REGISTRY  # noqa: E402
from traffic_accidents_airflow_kafka_spark.plans.registry import (  # noqa: E402
    JUDGED_WINDOW,
    _ordered_specs,
)

HEADER = """# Query catalog (generated — `python scripts/dump_catalog.py`)

One row per registered query, in registry order (the first {window} are
the driver-judged tier; every oracle is ALSO verified locally by
`scripts/verify_oracle.py` regardless of tier). "Check" is the
correctness mechanism: **oracle** = DuckDB value-hash parity, rows-only =
minimum-row-count check plus the unit tests cited in COVERAGE.md.

| # | Query | Tier | Check | What it demonstrates |
|---|---|---|---|---|
"""


def first_sentence(doc: str) -> str:
    text = " ".join(doc.split())
    # First sentence, capped for table readability.
    dot = text.find(". ")
    s = text if dot < 0 else text[: dot + 1]
    return (s[:220] + "…") if len(s) > 220 else s


def main() -> None:
    lines = [HEADER.format(window=JUDGED_WINDOW)]
    for i, spec in enumerate(_ordered_specs()):
        check = "oracle" if spec.oracle is not None else "rows-only"
        desc = first_sentence(spec.doc).replace("|", "\\|")
        lines.append(f"| {i} | `{spec.name}` | {spec.tier} | {check} | {desc} |\n")
    n = len(QUERY_REGISTRY)
    n_oracle = sum(1 for s in QUERY_REGISTRY.values() if s.oracle is not None)
    lines.append(
        f"\n{n} queries; {n_oracle} oracled; "
        f"{min(n, JUDGED_WINDOW)} inside the driver's judged window.\n"
    )
    with open("CATALOG.md", "w") as f:
        f.writelines(lines)
    print(f"CATALOG.md: {n} queries ({n_oracle} oracled)")


if __name__ == "__main__":
    main()
