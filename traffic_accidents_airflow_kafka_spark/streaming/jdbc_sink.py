"""Exactly-once streaming delivery into a JDBC database.

Structured Streaming has no native JDBC streaming writer; the production
recipe is ``foreachBatch`` + the transactional batch-id pattern
(the same contract as the parquet index maintenance loop in
``maintenance.py``, adapted to a database that CAN delete):

- Spark guarantees each micro-batch is delivered AT LEAST once with a
  stable ``batch_id`` (replayed after a crash from the checkpoint).
- The sink makes the delivery idempotent per batch id:

  1. If the batch's marker row exists, the batch is fully durable —
     skip (replay after a crash that happened post-commit).
  2. Otherwise DELETE any rows tagged with this batch id (half-written
     leftovers of a crashed attempt), re-append the batch's rows tagged
     with the batch id (executor-parallel batched INSERTs through
     ``sources/jdbc.py:jdbc_writer``), and only then insert the marker —
     the commit point.

  A crash before the marker insert leaves garbage that the replay's
  DELETE removes; a crash after it leaves a marker that makes the replay
  a no-op. Either way the table converges to exactly-once content.

Driver-side statements (marker probe, DELETE, marker insert) run over a
plain ``java.sql.DriverManager`` connection from Spark's own JVM — the
row payload itself never flows through the driver; only per-batch
metadata does. Works against any JDBC database; integration-tested for
real against embedded Apache Derby (in Spark's jars), including a
crash-injection replay (tests/test_jdbc_stream_sink.py).

At scale: batches append in executor-parallel ``batchsize``-row INSERT
rounds; the DELETE is indexed by the batch-id column (add an index on it
in production); marker traffic is one probe + one insert per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.jdbc import jdbc_writer

#: Column appended to every delivered row: the idempotence tag the
#: replay DELETE keys on.
BATCH_ID_COL = "sink_batch_id"


def _driver_connection(spark: SparkSession, url: str):
    """A plain JDBC connection in Spark's JVM (Derby and friends
    auto-register via the JDBC4 ServiceLoader from Spark's classpath)."""
    return spark._jvm.java.sql.DriverManager.getConnection(url)


def _execute(conn, sql: str) -> None:
    st = conn.createStatement()
    try:
        st.executeUpdate(sql)
    finally:
        st.close()


def _table_missing(exc: Exception) -> bool:
    msg = str(exc)
    return "does not exist" in msg or "42X05" in msg or "42Y55" in msg


def ensure_marker_table(
    spark: SparkSession, url: str, marker_table: str
) -> None:
    """Create the marker table if absent (idempotent)."""
    conn = _driver_connection(spark, url)
    try:
        _execute(
            conn,
            f"CREATE TABLE {marker_table} "
            "(batch_id BIGINT NOT NULL PRIMARY KEY, n_rows BIGINT)",
        )
    except Exception as exc:  # noqa: BLE001 — Derby has no IF NOT EXISTS
        if "already exists" not in str(exc) and "X0Y32" not in str(exc):
            raise
    finally:
        conn.close()


def _marker_exists(conn, marker_table: str, batch_id: int) -> bool:
    st = conn.createStatement()
    try:
        rs = st.executeQuery(
            f"SELECT 1 FROM {marker_table} WHERE batch_id = {int(batch_id)}"
        )
        try:
            return bool(rs.next())
        finally:
            rs.close()
    finally:
        st.close()


def exactly_once_jdbc_batch_fn(
    spark: SparkSession,
    url: str,
    table: str,
    marker_table: str = "stream_batch_markers",
    batch_size: int = 1_000,
    properties: dict[str, str] | None = None,
    fail_before_commit=None,
):
    """Build the ``foreachBatch`` callable delivering each micro-batch to
    ``table`` exactly-once (module docstring). ``fail_before_commit`` is
    a test hook: called with the batch id AFTER the rows are written but
    BEFORE the marker commits — raising from it simulates a crash in the
    vulnerable window.
    """
    ensure_marker_table(spark, url, marker_table)

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        conn = _driver_connection(spark, url)
        try:
            if _marker_exists(conn, marker_table, batch_id):
                return  # fully durable already — replay is a no-op
            try:
                # Spark's JDBC writer creates columns QUOTED (exact
                # case); the raw statement must quote the tag column to
                # address the same identifier.
                _execute(
                    conn,
                    f'DELETE FROM {table} '
                    f'WHERE "{BATCH_ID_COL}" = {int(batch_id)}',
                )
            except Exception as exc:  # noqa: BLE001
                if not _table_missing(exc):
                    raise  # first batch: writer auto-creates below
            tagged = batch_df.withColumn(
                BATCH_ID_COL, F.lit(int(batch_id)).cast("long")
            )
            jdbc_writer(
                tagged,
                url,
                table,
                mode="append",
                batch_size=batch_size,
                properties=properties,
            ).save()
            if fail_before_commit is not None:
                fail_before_commit(batch_id)
            n = tagged.count()
            _execute(
                conn,
                f"INSERT INTO {marker_table} (batch_id, n_rows) "
                f"VALUES ({int(batch_id)}, {int(n)})",
            )
        finally:
            conn.close()

    return fn
