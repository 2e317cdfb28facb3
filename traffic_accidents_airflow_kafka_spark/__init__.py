"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (nicothinn/Traffic-Accidents-Airflow-Kafka),
re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (AQE, UTC, tuned shuffle partitions).
- ``schemas``    : explicit StructTypes for every table (SURVEY.md §1.3).
- ``sources``    : parquet/CSV/JDBC/Kafka readers and writers.
- ``functions``  : scalar-expression library (cleaning, datetime, geo binning,
                   map parsing, text analysis, similarity math).
- ``operators``  : relational + LLM-data-pipeline operators (dedup, ANN,
                   stats, pivot, upsert, star-schema, multimodal).
- ``plans``      : end-to-end declarative pipelines and the query catalog that
                   backs ``__spark_entry__.queries()``.
- ``streaming``  : Structured Streaming jobs (event-mode windows, Kafka IO).

Everything is built on the public PySpark DataFrame/SQL API; no RDD code and
no row-at-a-time Python UDFs in hot paths.
"""

__version__ = "0.1.0"
