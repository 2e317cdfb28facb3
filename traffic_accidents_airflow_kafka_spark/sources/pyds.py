"""Overpass REST ingestion as a Spark 4 Python DataSource (SURVEY.md
§2.1 S8, the executor-parallel variant).

The reference fetches 36 bboxes in a serial, 5s-paced driver loop
(dags/etl_crash_traffic.py:187-228) — the right shape against the
rate-limited PUBLIC Overpass endpoint, and `pipeline/overpass.py` keeps
that job. Against a self-hosted Overpass mirror (the only option at real
scale anyway), ingestion should instead be a PARALLEL scan — this module
expresses it through the Python DataSource API (SPARK-44076, 4.0+):

- ``partitions()`` → one :class:`InputPartition` per bbox, so fetches
  run concurrently across executors and a failed bbox retries alone
  (task retry = per-bbox retry, vs the driver loop's all-or-nothing).
- ``pushFilters()`` (4.1+) → ``bbox_label = …`` / ``IN`` predicates
  prune partitions BEFORE any HTTP happens: `WHERE bbox_label =
  'bbox_35.0_-81.0'` fetches exactly one bbox. Equality on the
  partition-defining column is exact, so handled filters are fully
  absorbed (not re-evaluated by Spark).
- The HTTP transport stays injectable and out of this package: the
  ``fetch`` option is a ``"module:callable"`` dotted path resolved on
  executors (tests inject a fake; production injects its HTTP client).
  The default ``synthetic`` transport generates deterministic md5-seeded
  nodes per bbox — the source works offline out of the box.

Rows come out in the canonical downstream shape: ``bbox_label`` is the
``bbox_{lat}_{lon}`` str(float)-rendered form the merge pipeline joins on
(F13 parity; pipeline/osm.py derives the same from extract filenames).
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Iterable, Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    WriterCommitMessage,
    EqualTo,
    Filter,
    In,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..pipeline.overpass import BBOXES, Node, node_category, overpass_query

OVERPASS_SCHEMA = (
    "bbox_label STRING, category STRING, latitude DOUBLE, "
    "longitude DOUBLE, tags MAP<STRING,STRING>"
)

_BBOX_RE = re.compile(r"\(([-\d.]+),([-\d.]+),([-\d.]+),([-\d.]+)\)")

_SYNTH_CATEGORIES = (
    ("amenity", "school"),
    ("amenity", "hospital"),
    ("highway", "traffic_signals"),
    ("highway", "crossing"),
)


def synthetic_fetch(query: str, nodes_per_bbox: int = 8) -> Iterable[Node]:
    """Offline stand-in transport: deterministic nodes seeded by the
    bbox embedded in the QL query (md5 → position within the bbox,
    category round-robin). Same ``FetchFn`` contract as production."""
    m = _BBOX_RE.search(query)
    if not m:
        return []
    min_lat, min_lon, max_lat, max_lon = (float(g) for g in m.groups())
    out: list[Node] = []
    for i in range(nodes_per_bbox):
        d = hashlib.md5(f"{min_lat},{min_lon}:{i}".encode()).digest()
        u_lat = int.from_bytes(d[:4], "big") / 2**32
        u_lon = int.from_bytes(d[4:8], "big") / 2**32
        key, val = _SYNTH_CATEGORIES[i % len(_SYNTH_CATEGORIES)]
        out.append(
            (
                round(min_lat + u_lat * (max_lat - min_lat), 6),
                round(min_lon + u_lon * (max_lon - min_lon), 6),
                {key: val, "name": f"node_{i}"},
            )
        )
    return out


def _resolve_fetch(spec: str):
    """'synthetic' or a picklable-by-path 'module:callable' resolved at
    read time ON THE EXECUTOR — the transport never ships through the
    plan, only its import path does."""
    if spec == "synthetic":
        return synthetic_fetch
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"fetch spec {spec!r} is not 'module:callable'")
    import importlib

    return getattr(importlib.import_module(mod_name), attr)


@dataclass
class BboxPartition(InputPartition):
    min_lat: float
    min_lon: float


def _label(min_lat: float, min_lon: float) -> str:
    return f"bbox_{min_lat}_{min_lon}"


class OverpassReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        raw = self.options.get("bboxes")
        self.bboxes: list[tuple[float, float]] = (
            [(float(a), float(b)) for a, b in json.loads(raw)] if raw else list(BBOXES)
        )
        self.size = float(self.options.get("size", "0.5"))
        #: None = no pushed predicate; else the exact label set to keep.
        self.kept_labels: set[str] | None = None

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            values = None
            if isinstance(f, EqualTo) and f.attribute == ("bbox_label",):
                values = [f.value]
            elif isinstance(f, In) and f.attribute == ("bbox_label",):
                values = list(f.value)
            if values is not None and all(isinstance(v, str) for v in values):
                new = set(values)
                # AND semantics across pushed filters → intersect.
                self.kept_labels = (
                    new if self.kept_labels is None else self.kept_labels & new
                )
            else:
                yield f  # unsupported — Spark evaluates it post-scan

    def partitions(self) -> Sequence[InputPartition]:
        return [
            BboxPartition(lat, lon)
            for lat, lon in self.bboxes
            if self.kept_labels is None or _label(lat, lon) in self.kept_labels
        ]

    def read(self, partition: BboxPartition) -> Iterator[tuple]:
        fetch = _resolve_fetch(self.options.get("fetch", "synthetic"))
        label = _label(partition.min_lat, partition.min_lon)
        query = overpass_query(partition.min_lat, partition.min_lon, self.size)
        for lat, lon, tags in fetch(query):
            yield (label, node_category(tags), float(lat), float(lon), dict(tags))


class OverpassDataSource(DataSource):
    """``spark.read.format("overpass")`` after
    ``spark.dataSource.register(OverpassDataSource)``.

    Options: ``fetch`` ('synthetic' | 'module:callable'), ``bboxes``
    (JSON ``[[lat, lon], ...]``; default: the reference's 36), ``size``
    (bbox edge degrees, default 0.5).
    """

    @classmethod
    def name(cls) -> str:
        return "overpass"

    def schema(self) -> str:
        return OVERPASS_SCHEMA

    def reader(self, schema: StructType) -> OverpassReader:
        return OverpassReader(self.options)


# ---------------------------------------------------------------------------
# Streaming Python DataSource: deterministic event replay with offsets.
# ---------------------------------------------------------------------------

#: ``ts_us`` travels as int64 epoch-micros, not TIMESTAMP (r10): the
#: simple-reader path materializes every row as Python objects on the
#: driver and pickles them out — datetime objects fetch 3.7x slower from
#: DuckDB and pickle ~3x slower than int64 (0.56 vs 0.15 s fetch,
#: 0.20 vs 0.07 s pickle for the 100k-row sf0.1 replay), and the
#: per-row TimestampType conversion repeats the cost JVM-side. The
#: consumer re-types with timestamp_micros(ts_us) — the same expression
#: the batch file-twin applies to nanos `div 1000`, so the downstream
#: plan and results are unchanged.
EVENTS_REPLAY_SCHEMA = (
    "event_id LONG, ts_us LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)

#: field name -> SQL type, in canonical schema order (drives the
#: ``columns`` projection below).
_REPLAY_FIELDS = {
    "event_id": "LONG",
    "ts_us": "LONG",
    "user_id": "LONG",
    "event_type": "STRING",
    "value": "DOUBLE",
    "props": "STRING",
}

#: per-field DuckDB select expression (ts_us is derived; the rest pass
#: through).
_REPLAY_EXPRS = {
    "ts_us": "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us",
}


def _replay_columns(options: dict) -> list[str]:
    """Resolve the ``columns`` option (comma list) to canonical-order
    field names; default = the full schema. The simple-reader path has
    no engine-side column pruning — every field crosses driver-fetch,
    pickle, AND the per-row Python→JVM conversion — so consumers that
    aggregate a few fields (the windowed twin reads 3 of 6) opt out of
    shipping the rest (guide §4: pass only the columns the function
    needs). The (ts, event_id) ORDER BY is unaffected: DuckDB sorts on
    source columns whether or not they are projected, so offset ranges
    replay identically."""
    raw = options.get("columns")
    if not raw:
        return list(_REPLAY_FIELDS)
    want = {c.strip() for c in raw.split(",") if c.strip()}
    unknown = want - set(_REPLAY_FIELDS)
    if unknown:
        raise ValueError(f"unknown replay columns: {sorted(unknown)}")
    return [c for c in _REPLAY_FIELDS if c in want]


class EventReplayStreamReader(SimpleDataSourceStreamReader):
    """Replays an events parquet file as a stream with REAL offset
    bookkeeping — ``initialOffset`` / ``read`` / ``readBetweenOffsets`` /
    ``commit`` — so checkpoint recovery and exactly-once re-delivery are
    exercised through the Python streaming source API (the simple-reader
    variant: records flow driver → executors, the rate-source idiom;
    production volumes stay on the file/Kafka readStream paths).

    Offsets are ``{"row": n}`` indexes into the (ts, event_id)-sorted
    table — a total order, so any (start, end) replay returns the exact
    same rows (the readBetweenOffsets contract after a restart).
    ``max_rows_per_read`` caps a micro-batch (0 = drain everything
    available, which is what trigger(availableNow) consumes in its one
    planned batch).
    """

    def __init__(self, options: dict):
        self.path = options["path"]
        self.cap = int(options.get("max_rows_per_read", "0"))
        self.columns = _replay_columns(options)
        self._rows: list[tuple] | None = None

    def _table(self) -> list[tuple]:
        if self._rows is None:
            import duckdb

            # ns → µs timestamp truncation matches the batch path's
            # `ts div 1000` floor; the total (ts, event_id) order makes
            # every offset range replay-identical — the sort reads the
            # SOURCE columns, so it holds under any projection. Path
            # goes through a bind parameter — quotes in paths must not
            # become SQL. epoch_us over the SAME cast keeps the
            # truncation identical while shipping int64 instead of
            # datetime (see EVENTS_REPLAY_SCHEMA); the ``columns``
            # option prunes what crosses the driver (guide §4).
            select = ", ".join(
                _REPLAY_EXPRS.get(c, c) for c in self.columns
            )
            self._rows = duckdb.execute(
                f"""
                SELECT {select}
                FROM read_parquet(?)
                ORDER BY CAST(ts AS TIMESTAMP), event_id
                """,
                [self.path],
            ).fetchall()
        return self._rows

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        rows = self._table()
        s = start["row"]
        e = len(rows) if self.cap <= 0 else min(s + self.cap, len(rows))
        return iter(rows[s:e]), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._table()[start["row"] : end["row"]])


class EventReplayDataSource(DataSource):
    """``spark.readStream.format("eventreplay").option("path", …)``."""

    @classmethod
    def name(cls) -> str:
        return "eventreplay"

    def schema(self) -> str:
        cols = _replay_columns(self.options)
        return ", ".join(f"{c} {_REPLAY_FIELDS[c]}" for c in cols)

    def simpleStreamReader(self, schema: StructType) -> EventReplayStreamReader:
        return EventReplayStreamReader(self.options)


# ---------------------------------------------------------------------------
# Python DataSource WRITE path (SPARK-45065, 4.0+): a JSONL sink with the
# two-phase staged commit every real writer needs.
# ---------------------------------------------------------------------------


@dataclass
class _StagedFile(WriterCommitMessage):
    """Per-task commit message: where the task staged its shard and how
    many rows it holds. Only files named in SOME commit message are ever
    published — output of failed/speculative attempts dies in staging."""

    staged_name: str
    n_rows: int


class AuditJsonWriter(DataSourceWriter):
    """Executor/driver halves of the two-phase protocol:

    - ``write`` (executor, per partition): serialize rows to a uniquely
      named file under ``<path>/_staging/`` — NEVER directly into the
      published directory — and return its name + row count.
    - ``commit`` (driver, once, only after every task succeeded): clear
      prior contents when overwriting, rename the staged shards to
      ``part-NNNNN.json``, and write ``_MANIFEST.json`` naming every
      published file with its row count — the atomic-enough commit point
      consumers can validate against.
    - ``abort`` (driver, on job failure): best-effort staging cleanup;
      the published directory is untouched, so a failed job leaves the
      previous dataset intact (the overwrite happens inside commit).

    Concurrency contract (r6 ADVICE): ONE writer per path at a time.
    Append-mode commit merges ``_MANIFEST.json`` read-modify-write and
    scans ``part-*.json`` for the next index without locking, so two
    concurrent append commits to the same path can pick the same start
    index and/or lose each other's manifest entries. This matches the
    single-writer-per-table discipline of every non-transactional sink
    in this repo (Derby, the bucketed saveAsTable writer); concurrent
    jobs must target distinct paths and union at read time.
    """

    def __init__(self, options: dict, schema, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("audit_jsonl writer requires a 'path' option")
        self.path = path
        self.columns = list(schema.fieldNames())
        self.overwrite = overwrite

    def write(self, rows) -> _StagedFile:
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        name = f"{uuid.uuid4().hex}.json"
        n = 0
        with open(os.path.join(staging, name), "w") as f:
            for row in rows:
                d = row.asDict()
                f.write(
                    _json.dumps({c: d[c] for c in self.columns}) + "\n"
                )
                n += 1
        return _StagedFile(staged_name=name, n_rows=n)

    def commit(self, messages) -> None:
        import json as _json
        import os

        staging = os.path.join(self.path, "_staging")
        manifest = []
        start = 0
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("part-") or f == "_MANIFEST.json":
                    os.remove(os.path.join(self.path, f))
        else:
            # Append mode: a second commit must not clobber previously
            # committed shards — offset the part index past every
            # existing part-*.json and MERGE the prior manifest instead
            # of replacing it, so earlier commits stay listed and valid.
            existing = [
                int(f[len("part-") : -len(".json")])
                for f in os.listdir(self.path)
                if f.startswith("part-")
                and f.endswith(".json")
                and f[len("part-") : -len(".json")].isdigit()
            ]
            start = max(existing, default=-1) + 1
            prior = os.path.join(self.path, "_MANIFEST.json")
            if os.path.exists(prior):
                with open(prior) as fh:
                    manifest = _json.load(fh).get("files", [])
        for i, msg in enumerate(messages):
            final = f"part-{start + i:05d}.json"
            os.rename(
                os.path.join(staging, msg.staged_name),
                os.path.join(self.path, final),
            )
            manifest.append({"file": final, "n_rows": msg.n_rows})
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            _json.dump({"files": manifest}, f)
        # Orphans of failed/speculative attempts (not in any message).
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)

    def abort(self, messages) -> None:
        import os
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class AuditJsonDataSource(DataSource):
    """``format("audit_jsonl")`` — newline-JSON sink through the Python
    DataSource WRITE path. Local-filesystem staging/rename (this repo's
    file:// deployment); an object-store deployment swaps the os calls,
    the protocol (stage → commit-rename → manifest) is unchanged."""

    @classmethod
    def name(cls) -> str:
        return "audit_jsonl"

    def writer(self, schema, overwrite: bool) -> AuditJsonWriter:
        return AuditJsonWriter(self.options, schema, overwrite)
