"""End-to-end training-corpus curation pipeline — the LLM-data twin of
:mod:`pipeline.job`'s domain DAG, composing the curation operators into
one materialized, idempotent job:

    ingest → exact dedup → near-dup cluster keep → quality filter →
    surprisal (trained-LM perplexity) cut → DSIR importance selection →
    decontaminate → split → token-shard manifests → final upsert

Task semantics mirror the reference DAG's scheduler contract
(``dags/etl_crash_traffic.py:951-1005``: materialized task boundaries,
memoized extract, key-based idempotent load):

- Every stage persists to parquet under ``out_dir`` — a rerun resumes
  from materialized state (the Airflow-retry contract) instead of
  recomputing candidate pairs.
- The ingest stage is memoized (skip when output exists); intermediate
  curation stages are deterministic functions of their input and are
  rebuilt-and-overwritten (overwrite ≡ recompute, no bookkeeping).
- The final curated load is a key-based upsert (``upsert_append`` — the
  distributed ``INSERT … ON CONFLICT DO NOTHING``): replaying the whole
  job writes ZERO new rows, so the pipeline is idempotent end to end
  (test-pinned).

Scale: each stage is one declarative plan the catalog already audits
(digest-keyed exact dedup, inverted-index near-dup + iterative CC,
map-side quality expressions, broadcast benchmark-digest probe,
map-side hash split, per-split cumulative shard packing). The
orchestration layer moves no data — it sequences actions and records
row counts, exactly what an external scheduler does around
spark-submit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import decontam, dedup, sampling
from ..operators import text as text_ops
from ..sources.sinks import memoized_write, upsert_append
from ..sources.tables import load_table

#: Curated docs must clear this composite quality score (see
#: operators/text.py:quality_score — length × lexical diversity).
QUALITY_MIN = 0.35
#: Perplexity-style cut: docs whose mean bit-surprisal per unigram-LM
#: piece exceeds this (centibits) are dropped — the CCNet tail cut,
#: set gentler than the catalog audit's 760 so the pipeline sheds the
#: worst tail rather than the median.
SURPRISAL_MAX_CENTIBITS = 790
#: DSIR keep rule: per-token importance rate (centibits) vs the shipped
#: target model must clear this. Calibrated below the observed median
#: (~-178) so DSIR trims the least-target-like slice.
DSIR_KEEP_CENTIBITS = -210
#: Near-dup edge threshold (word-3-gram Jaccard).
NEARDUP_JACCARD = 0.5
#: Contamination flag threshold (8-gram overlap fraction vs the bench).
CONTAM_THRESHOLD = 0.2
#: Token budget per training shard.
SHARD_TOKENS = 4096


def run_corpus_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """Run the curation DAG over ``{sf_dir}/documents.parquet``; return
    per-stage row counts. The held-out benchmark (decontamination
    target) is the deterministic ``doc_id % 97 == 0`` slice — standing
    in for the external eval suite a production run would load."""
    report: dict = {}

    # Stage 1: ingest (memoized — the reference's os.path.exists guard).
    raw_path = f"{out_dir}/docs_raw"
    docs = load_table(spark, sf_dir, "documents")
    report["ingest_wrote"] = memoized_write(docs, raw_path)
    docs = spark.read.parquet(raw_path)
    report["ingest_rows"] = docs.count()

    # The eval benchmark is held OUT of the training corpus entirely.
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    report["bench_rows"] = bench.count()

    # Stage 2: exact dedup — digests shuffle, text never; lowest id wins.
    exact = (
        dedup.exact_dedup(corpus, "doc_id", "text")
        .filter(~F.col("is_duplicate"))
        .drop("keeper_id", "is_duplicate")
    )
    exact_path = f"{out_dir}/docs_exact"
    exact.write.mode("overwrite").parquet(exact_path)
    exact = spark.read.parquet(exact_path)
    report["exact_rows"] = exact.count()

    # Stage 3: near-dup clusters — keep each cluster's canonical
    # (minimum id); docs in no cluster are their own canonical.
    sh = dedup.word_shingle_keys(exact, "doc_id", "text", n=3)
    pairs = dedup.jaccard_pairs(sh, "doc_id").filter(
        F.col("jaccard") >= NEARDUP_JACCARD
    )
    comp = dedup.connected_components(pairs, "d1", "d2")
    non_canonical = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    neardup = exact.join(non_canonical, "doc_id", "left_anti")
    neardup_path = f"{out_dir}/docs_neardup"
    neardup.write.mode("overwrite").parquet(neardup_path)
    neardup = spark.read.parquet(neardup_path)
    report["neardup_rows"] = neardup.count()

    # Stage 4: quality gate — pure map-side codegen expressions.
    quality = neardup.withColumn(
        "quality", text_ops.quality_score("text")
    ).filter(F.col("quality") >= QUALITY_MIN)

    # Stage 4b: perplexity-style surprisal cut (CCNet idiom) with a
    # unigram LM trained ON THIS CORPUS — the catalog's
    # unigram_surprisal_filter stage as a pipeline step: every distinct
    # pretoken is Viterbi-costed once (word-vocab-sized), the (word →
    # bits, pieces) map broadcasts onto the exploded corpus, and docs
    # whose mean piece surprisal exceeds the cut are dropped.
    from ..operators import bpe, unigram

    wf = bpe.word_freq(quality)
    vc = unigram.with_costs(unigram.seed_vocab(wf, 8, 200))
    seg = unigram.viterbi_combined(
        wf.filter(F.length("word") <= unigram.MAX_WORD_LEN), vc, 8
    ).select(
        "word",
        F.col("cost").cast("long").alias("__bits"),
        F.col("n_pieces").cast("long").alias("__np"),
    )
    perdoc_surprisal = (
        quality.select(
            "doc_id", F.explode(bpe.bpe_ish_tokens("text")).alias("word")
        )
        .join(F.broadcast(seg), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce("__bits", F.lit(0))).alias("__tb"),
            F.sum(F.coalesce("__np", F.lit(0))).alias("__tp"),
        )
    )
    # LEFT join (not semi): a doc whose text yields zero pretokens has no
    # exploded rows at all, so it is absent from the aggregate — the
    # unscorable-docs-pass-through rule must keep it (NULL __tp), the
    # same outcome as the __tp == 0 branch for docs whose words are all
    # longer than MAX_WORD_LEN.
    fluent = (
        quality.join(perdoc_surprisal, "doc_id", "left")
        .filter(
            F.col("__tp").isNull()
            | (F.col("__tp") == 0)
            | (F.col("__tb") * 100 <= SURPRISAL_MAX_CENTIBITS * F.col("__tp"))
        )
        .drop("__tb", "__tp")
    )
    report["surprisal_rows"] = fluent.count()

    # Stage 4c: DSIR importance selection vs the shipped target model —
    # keep docs whose per-token importance rate clears the calibrated
    # floor (operators/dsir.py; both models are 64-row/literal tables,
    # the corpus is scored in one pass).
    from ..operators import dsir

    selected_ids = (
        dsir.importance_scores_vs_model(
            fluent.select("doc_id", "lang", "text"),
            dsir.target_cost_model(64),
            select_centibits_per_token=DSIR_KEEP_CENTIBITS,
        )
        .filter(F.col("selected"))
        .select("doc_id")
    )
    targeted = fluent.join(selected_ids, "doc_id", "left_semi")
    report["dsir_rows"] = targeted.count()

    # Stage 5: decontamination — broadcast bench-digest probe, map-side.
    contam = decontam.contamination(
        targeted, bench, "doc_id", "text", n=8, flag_threshold=CONTAM_THRESHOLD
    )
    clean = targeted.join(
        contam.filter(F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_anti",
    )

    # Stage 6: split + token accounting (map-side, id-hash stable).
    curated = sampling.hash_split(
        clean, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).withColumn("n_tokens", text_ops.token_count("text"))

    # Stage 7: idempotent curated load — ON CONFLICT DO NOTHING.
    final_path = f"{out_dir}/docs_curated"
    report["curated_new_rows"] = upsert_append(
        curated, final_path, "doc_id", spark
    )
    final = spark.read.parquet(final_path)
    report["curated_rows"] = final.count()

    # Stage 8: per-split token-shard manifests for the training loader.
    shards = sampling.token_shards(
        final, "doc_id", "n_tokens", SHARD_TOKENS, partition_col="split"
    )
    manifest = shards.groupBy("split", "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
    )
    manifest_path = f"{out_dir}/shard_manifest"
    manifest.write.mode("overwrite").parquet(manifest_path)
    report["shard_count"] = spark.read.parquet(manifest_path).count()
    return report


def curated_quality_report(spark: SparkSession, out_dir: str) -> DataFrame:
    """Datasheet read over the curated output: per split, doc count,
    token total, and quality distribution."""
    final = spark.read.parquet(f"{out_dir}/docs_curated")
    return (
        final.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.min("quality"), 4).alias("min_quality"),
        )
        .orderBy("split")
    )
