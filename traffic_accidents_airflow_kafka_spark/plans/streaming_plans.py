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


@register(
    "stream_sessions",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 1800 SECOND
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    ),
    sess AS (
      SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM marks
    ),
    agg AS (
      SELECT user_id, sid,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             CAST(COUNT(*) AS INT) AS n_events,
             ROUND(SUM(value), 4) AS sum_value
      FROM sess GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(ts) AS m FROM events),
    lastsid AS (SELECT user_id, MAX(sid) AS msid FROM agg GROUP BY user_id)
    SELECT a.user_id, a.session_start, a.session_end, a.n_events, a.sum_value,
           CASE WHEN a.sid < l.msid THEN 'gap' ELSE 'timeout' END AS closed_by
    FROM agg a
    JOIN lastsid l ON a.user_id = l.user_id, mx
    WHERE a.sid < l.msid
       OR epoch_ms(a.session_end) + 1800000 < epoch_ms(m) - 7200000
    ORDER BY a.user_id, a.session_start
    """,
    doc="Custom stateful streaming op on the judged surface: gap-based "
    "sessionization via applyInPandasWithState (streaming/stateful.py), "
    "run availableNow. Emits sessions closed by a 30-min gap OR by the "
    "event-time timeout (watermark 2h passing last_ts + gap). The oracle "
    "replays BOTH rules in batch SQL — lag/cumsum session ids for the "
    "gap closes; the final watermark = floor_ms(max ts) - delay decides "
    "the timeout closes (Spark state timeouts compare in ms, hence the "
    "epoch_ms truncation). Scale: state is per-user and watermark-"
    "evicted; the same code serves the live stream.",
)
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from ..streaming import stateful

    events = streaming.stream_events(spark, sf_dir).withWatermark("ts", "2 hours")
    sessions = stateful.sessionize(
        events.select("user_id", "ts", "value"), gap_seconds=1800
    )
    # 16 state partitions: the Python stateful stage parallelizes per
    # partition, so this op wants more than the tiny windowed agg does.
    out = streaming.run_available_now(
        sessions, spark, state_partitions=16, output_mode="append"
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
        "closed_by",
    ).orderBy("user_id", "session_start")
