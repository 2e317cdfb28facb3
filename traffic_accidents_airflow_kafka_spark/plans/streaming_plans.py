"""Streaming catalog queries (SURVEY.md §2.8).

``stream_window_counts`` runs a REAL Structured Streaming job
(file-backed source → watermark → tumbling window → availableNow →
memory sink) and returns the terminal result, oracle-checked against the
equivalent batch SQL — streaming/batch unification is the point: the same
windowed plan serves the live stream and the backfill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming import core as streaming
from .registry import register


@register(
    "stream_window_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    doc="§2.8 event-mode streaming (the flagged north-star extension): "
    "events replayed through readStream with a 2h watermark, 1h tumbling "
    "windows, trigger(availableNow=True) — the consumer-termination "
    "contract of kafka/consumer.py:30-36 — then compared against the "
    "batch equivalent (tumbling window ≡ date_trunc group). Scale: "
    "watermark bounds state to live windows; availableNow is also the "
    "backfill path (same code, bounded replay); state partitions sized "
    "to live-window cardinality, not the batch shuffle default.",
)
def stream_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = streaming.stream_events(spark, sf_dir)
    windowed = streaming.windowed_event_counts(events, "1 hour", "2 hours")
    # ~|hours in stream| × |event types| live groups — single digits of
    # thousands; 8 state stores ample (each costs setup + fsync per batch).
    result = streaming.run_available_now(windowed, spark, state_partitions=8)
    return result.orderBy("window_start", "event_type")
