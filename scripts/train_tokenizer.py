"""CLI entry for distributed BPE tokenizer training — the
spark-submit-able job around operators/bpe.py.

Usage:
    python scripts/train_tokenizer.py [sf_dir] [out_dir] [n_merges]
    spark-submit scripts/train_tokenizer.py /data/corpus /data/tokenizer 1000

Writes two parquet outputs under out_dir:
    merges/         (rank, lhs, rhs, pair_count)  — the ordered merge table
    segmentations/  (word, f, n_symbols, symbols) — the encoded vocabulary

and prints a one-line JSON summary (merge count, vocab size, corpus
fertility before/after) to stdout. The trainer's cost model: ONE
corpus-sized word-count shuffle, then n_merges vocabulary-sized rounds —
see SCALE.md "Tokenizer training".
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from traffic_accidents_airflow_kafka_spark.operators import bpe  # noqa: E402
from traffic_accidents_airflow_kafka_spark.session import get_spark  # noqa: E402
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table  # noqa: E402


def train_and_export(spark, sf_dir: str, out_dir: str, n_merges: int) -> dict:
    """Train, export merges + encoded vocab, return the summary dict."""
    docs = load_table(spark, sf_dir, "documents")
    merges_df = bpe.train_bpe(docs, n_merges=n_merges, min_freq=2)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()]
    merges_df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "merges")
    )
    enc = bpe.encode_stats(docs, merges)
    enc.write.mode("overwrite").parquet(os.path.join(out_dir, "segmentations"))

    stats = (
        spark.read.parquet(os.path.join(out_dir, "segmentations"))
        .agg(
            F.count(F.lit(1)).alias("vocab_size"),
            F.sum(F.col("f") * F.length("word")).alias("chars"),
            F.sum(F.col("f") * F.col("n_symbols")).alias("symbols"),
            F.sum("f").alias("words"),
        )
        .first()
    )
    return {
        "n_merges": len(merges),
        "vocab_size": stats["vocab_size"],
        "symbols_per_word": round(stats["symbols"] / stats["words"], 4),
        "chars_per_word": round(stats["chars"] / stats["words"], 4),
        "compression_vs_chars": round(stats["chars"] / stats["symbols"], 4),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "./tokenizer_out"
    n_merges = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    spark = get_spark(app_name="train-tokenizer")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(train_and_export(spark, sf_dir, out_dir, n_merges)))
    spark.stop()


if __name__ == "__main__":
    main()
