"""Pipeline composite family: IVF-PQ tier, Bloom incremental dedup, quality-keep semantic dedup, sequence packing, quantile filters, the curation funnel, contrastive pair mining, span work.

Segment of the LLM-pipeline catalog (see plans/llm.py — the façade
that imports every segment in registration order). Split from the
monolithic llm.py in r10 (VERDICT r9 #8); all entry and helper text is
carried verbatim, so file history continues there.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    decontam,
    dedup,
    quality,
    sampling,
    similarity,
    text as text_ops,
)
from ..sources.tables import load_table
from .registry import register
from .llm_ann import _ivf_pq_exact_oracle
from .llm_shared import _artifact, _sql_dot

@register(
    "embedding_ivfpq_ann",
    tier=1,  # extended ANN surface; full oracle since r8 (was rows-only)
    oracle=_ivf_pq_exact_oracle(),
    doc="IVF-PQ composed index on the deterministic integer lattice "
    "(operators/similarity.py:ivf_pq_ann_topk_exact; FAISS IndexIVFPQ "
    "semantics, Jegou et al. TPAMI'11 §V): coarse lattice-Lloyd cells "
    "prune candidates to ~n_probe/n_centroids of the corpus AND "
    "product-quantized RESIDUALS compress them, ADC computed as the "
    "fold cosine against recon = centroid[cell] + codebook residual. "
    "FULL value-hash oracle since r8 — TWO chained integer Lloyd "
    "replays (coarse, then per-subspace over residuals RE-OFFSET to "
    "stay positive: NumPy's integer division floors while DuckDB's "
    "truncates, and they only agree on non-negative operands; offsets "
    "cancel in every distance). The float residual path "
    "(ivf_pq_ann_topk, Arrow LUT search) remains the engine-specific "
    "scale variant, recall-audited by pq_recall_audit. Scale: one "
    "fused Arrow assign+encode pass; the search joins probes to cell "
    "members — candidate pruning and memory compression in the same "
    "index, which is what actually serves at 10^9 vectors.",
)
def embedding_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 100)
    return similarity.ivf_pq_ann_topk_exact(
        emb, qids, n_centroids=16, n_probe=4, m=32, n_codes=64, k=3
    ).orderBy("qid", "rank")


def _bloom_oracle(m_bits: int = 1 << 17, k: int = 4) -> str:
    """Split, md5 digests, the k md5-fold bloom bit positions, the
    all-bits-hit probe, and the exact dup confirmation all replayed in
    DuckDB."""
    bounds = sampling.split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    (t_name, t1), _, _ = bounds
    key = "md5('split-v1|' || CAST(doc_id AS VARCHAR))"

    def bit(seed: int) -> str:
        return (
            f"(list_reduce(list_transform(generate_series(1, 13), "
            f"j -> CAST(instr('0123456789abcdef', substr(md5(h || '|{seed}'), j, 1)) - 1 "
            f"AS BIGINT)), (a, b) -> a * 16 + b) % {m_bits})"
        )

    bits = "[" + ", ".join(bit(i) for i in range(k)) + "]"
    return f"""
    WITH assigned AS (
      SELECT doc_id, source, md5(text) AS h,
             CASE WHEN {key} < '{t1}' THEN '{t_name}' ELSE 'incoming' END AS split
      FROM documents
    ),
    hist AS (SELECT h FROM assigned WHERE split = '{t_name}'),
    hbits AS (
      SELECT DISTINCT bit FROM (SELECT unnest({bits}) AS bit FROM hist)
    ),
    inc AS (SELECT doc_id, source, h FROM assigned WHERE split = 'incoming'),
    incbits AS (
      SELECT doc_id, unnest(list_distinct({bits})) AS bit FROM inc
    ),
    probe AS (
      SELECT i.doc_id,
             COUNT(*) AS nb,
             COUNT(hb.bit) AS nh
      FROM incbits i LEFT JOIN hbits hb ON i.bit = hb.bit
      GROUP BY i.doc_id
    ),
    flags AS (
      SELECT inc.doc_id, inc.source,
             (p.nh = p.nb) AS bloom_candidate,
             (p.nh = p.nb AND inc.h IN (SELECT h FROM hist)) AS is_duplicate
      FROM inc JOIN probe p ON inc.doc_id = p.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_incoming,
           CAST(SUM(CASE WHEN bloom_candidate THEN 1 ELSE 0 END) AS BIGINT)
             AS n_candidates,
           CAST(SUM(CASE WHEN is_duplicate THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
           CAST(SUM(CASE WHEN is_duplicate THEN 0 ELSE 1 END) AS BIGINT) AS n_new
    FROM flags
    GROUP BY source
    ORDER BY source
    """


@register(
    "bloom_incremental_dedup",
    tier=1,  # extended training-data surface; exact anti-join judged via anti_join_incremental
    oracle=_bloom_oracle(),
    doc="Bloom-accelerated incremental exact dedup "
    "(operators/dedup.py:bloom_incremental_dedup): the historical corpus "
    "compresses to a broadcast bit relation (<= m distinct positions); "
    "incoming docs probe it map-side and only the might-contain fraction "
    "reaches the exact digest semi-join — the relational form of "
    "lakehouse bloom pushdown, with no false negatives so the answer "
    "stays exact. Scale: history is touched once to build O(m) bits; "
    "per-batch cost is proportional to candidates (true dups + fp "
    "rate), not history size.",
)
def bloom_incremental_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assigned = sampling.hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed="split-v1"
    )
    history = assigned.filter(F.col("split") == "train")
    incoming = assigned.filter(F.col("split") != "train")
    flags = dedup.bloom_incremental_dedup(
        incoming, history, "doc_id", "text", m_bits=1 << 17, k=4
    )
    return (
        incoming.select("doc_id", "source")
        .join(flags, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_incoming"),
            F.sum(F.col("bloom_candidate").cast("int"))
            .cast("bigint")
            .alias("n_candidates"),
            F.sum(F.col("is_duplicate").cast("int")).cast("bigint").alias("n_dups"),
            F.sum((~F.col("is_duplicate")).cast("int")).cast("bigint").alias("n_new"),
        )
        .orderBy("source")
    )


def _semantic_quality_oracle(
    threshold: float = 0.3, n_planes: int = 6, dim: int = 64, seed: int = 7
) -> str:
    """Near-dup pairs (plane-literal CTE) + the drop-lower-quality rule
    with the documents-joined quality expression, rolled up per lang."""
    planes = similarity.hyperplane_planes(dim, n_planes, seed)

    def dot(vec: str, lits: list[float]) -> str:
        return _sql_dot(vec, lits, dim)

    bucket = " + ".join(
        f"(CASE WHEN {dot('embedding', p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    vnorm = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        "j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))), "
        "(a, b) -> a + b))"
    )
    pair_dot = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"j -> CAST(a.embedding[j] AS DOUBLE) * CAST(b.embedding[j] AS DOUBLE))), "
        f"(a, b) -> a + b)"
    )
    qual = (
        "LEAST(len(string_split(text, ' ')) / 64.0, 1.0) * "
        "(len(list_distinct(string_split(text, ' '))) "
        "/ CAST(len(string_split(text, ' ')) AS DOUBLE))"
    )
    return f"""
    WITH qual AS (
      SELECT doc_id AS vec_id, ROUND({qual}, 4) AS q FROM documents
    ),
    bkt AS (
      SELECT vec_id, embedding,
             CAST({bucket} AS BIGINT) AS bucket,
             {vnorm} AS nrm
      FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS d1, b.vec_id AS d2
      FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {pair_dot} / (a.nrm * b.nrm) >= {threshold}
    ),
    losers AS (
      SELECT DISTINCT CASE WHEN q1.q < q2.q THEN p.d1 ELSE p.d2 END AS vec_id
      FROM pairs p
      JOIN qual q1 ON p.d1 = q1.vec_id
      JOIN qual q2 ON p.d2 = q2.vec_id
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(SUM(CASE WHEN l.vec_id IS NULL
                         THEN len(string_split(d.text, ' ')) ELSE 0 END) AS BIGINT)
             AS kept_tokens
    FROM documents d
    LEFT JOIN losers l ON d.doc_id = l.vec_id
    GROUP BY d.lang
    ORDER BY d.lang
    """


@register(
    "semantic_dedup_quality_keep",
    tier=1,  # extended training-data surface; greedy-id variant judged via semantic_dedup_stats
    oracle=_semantic_quality_oracle(),
    doc="Quality-aware SemDeDup keeper (operators/similarity.py:"
    "semantic_dedup_by_quality): within each embedding near-dup pair "
    "drop the LOWER-quality member (length×diversity score, ties to "
    "higher id) and account surviving tokens per language — near-dup "
    "groups surrender their worst copy, the policy curation pipelines "
    "actually want. Scale: LSH-bucketed pairs + two id-keyed joins of "
    "(id, double) quality rows; vectors and text never join the pair "
    "stream.",
)
def semantic_dedup_quality_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qual = docs.select(
        F.col("doc_id").alias("vec_id"),
        text_ops.quality_score("text").alias("quality"),
    )
    flags = similarity.semantic_dedup_by_quality(
        emb, qual, "vec_id", "embedding", "quality", threshold=0.3
    )
    toks = text_ops.token_count("text")
    return (
        docs.select("doc_id", "lang", toks.alias("n_tokens"))
        .join(flags.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.col("sem_dropped").cast("int")).cast("bigint").alias("n_dropped"),
            F.sum(F.when(~F.col("sem_dropped"), F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("lang")
    )


_SEQ_LEN = 512

@register(
    "sequence_packing_stats",
    tier=1,  # extended training-data surface
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS t
      FROM documents
      WHERE len(string_split(text, ' ')) > 0
    ),
    cum AS (
      SELECT doc_id, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS s
      FROM toks
    ),
    spans AS (
      SELECT doc_id, t, s, s + t AS e,
             unnest(generate_series(s // {_SEQ_LEN}, (s + t - 1) // {_SEQ_LEN}))
               AS seq_id
      FROM cum
    )
    SELECT CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_sequences,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(DISTINCT CASE WHEN (e - 1) // {_SEQ_LEN} > s // {_SEQ_LEN}
                                    THEN doc_id END) AS BIGINT) AS n_split_docs,
           CAST(SUM(LEAST(e, (seq_id + 1) * {_SEQ_LEN})
                    - GREATEST(s, seq_id * {_SEQ_LEN})) AS BIGINT) AS packed_tokens
    FROM spans
    """,
    doc="Fixed-length sequence packing (the GPT-style corpus packing "
    "step): concatenate docs in id order, cut every 512 tokens, account "
    "sequences / spans / boundary-split docs / packed tokens "
    "(operators/sampling.py:pack_sequences). Scale: the only global "
    "coordination is the Blelloch-style exclusive prefix sum "
    "(global_cumsum — arithmetic key buckets + per-bucket scan + "
    "|partitions|-row offsets, no single-task window); span expansion "
    "is a bounded per-row sequence() explode.",
)
def sequence_packing_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", text_ops.token_count("text").cast("bigint").alias("n_tokens")
    )
    spans = sampling.pack_sequences(toks, "doc_id", "n_tokens", seq_len=_SEQ_LEN)
    return spans.agg(
        F.countDistinct("seq_id").cast("bigint").alias("n_sequences"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.countDistinct(F.when(F.col("is_split"), F.col("doc_id")))
        .cast("bigint")
        .alias("n_split_docs"),
        F.sum("span_tokens").cast("bigint").alias("packed_tokens"),
    )


@register(
    "quality_quantile_filter",
    tier=1,  # extended training-data surface; exact-percentile machinery judged via group_percentiles
    oracle="""
    WITH scored AS (
      SELECT lang,
             ROUND(LEAST(len(string_split(text, ' ')) / 64.0, 1.0)
                   * (len(list_distinct(string_split(text, ' ')))
                      / CAST(len(string_split(text, ' ')) AS DOUBLE)), 4) AS q
      FROM documents
    ),
    cuts AS (
      SELECT lang,
             ROUND(CAST(quantile_cont(q, 0.75) AS DOUBLE), 4) AS q75
      FROM scored GROUP BY lang
    )
    SELECT s.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           c.q75,
           CAST(SUM(CASE WHEN s.q > c.q75 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM scored s JOIN cuts c ON s.lang = c.lang
    GROUP BY s.lang, c.q75
    ORDER BY s.lang
    """,
    doc="Top-quantile quality filtering (FineWeb-Edu idiom: keep each "
    "language's top quality quartile): per-language exact p75 cut of the "
    "length×diversity score, then count survivors. Calibrating the "
    "threshold per group — instead of one global constant — is what "
    "keeps low-resource languages from being filtered to nothing. "
    "Scale: one groupBy for the cuts (|langs| rows, broadcast back), one "
    "map-side comparison pass; at 100 TB swap percentile for "
    "percentile_approx (documented trade, same plan shape).",
)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", text_ops.quality_score("text").alias("q")
    )
    cuts = scored.groupBy("lang").agg(
        F.round(F.percentile("q", F.lit(0.75)), 4).alias("q75")
    )
    return (
        scored.join(F.broadcast(cuts), "lang")
        .groupBy("lang", "q75")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum((F.col("q") > F.col("q75")).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
        )
        .select("lang", "n_docs", "q75", "n_kept")
        .orderBy("lang")
    )


def _curation_funnel_oracle(
    n: int = 8,
    overlap_thr: float = 0.2,
    quality_thr: float = 0.3,
    min_tokens: int = 16,
) -> str:
    """The whole curation funnel composed from the already-verified CTE
    pieces: min-id exact-dedup keeper, quality expression, Gopher
    repetition flags, and decontamination overlap vs the held-out split."""
    bounds = sampling.split_thresholds({"train": 0.9, "val": 0.05, "test": 0.05})
    _, _, _ = bounds
    (_, t1), (_, t2), _ = bounds
    key = "md5('split-v1|' || CAST(doc_id AS VARCHAR))"
    grams = (
        f"list_transform(range(1, len(w) - {n} + 2), "
        f"i -> array_to_string(w[i:i+{n - 1}], ' '))"
    )
    qual = (
        "LEAST(len(b.w) / 64.0, 1.0) * "
        "(len(list_distinct(b.w)) / CAST(len(b.w) AS DOUBLE))"
    )
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text, string_split(text, ' ') AS w,
             CASE WHEN {key} >= '{t2}' THEN 1 ELSE 0 END AS is_test
      FROM documents
    ),
    keepers AS (
      SELECT md5(text) AS h, MIN(doc_id) AS keeper_id
      FROM base WHERE is_test = 0 GROUP BY md5(text)
    ),
    rep_bi AS (
      SELECT doc_id, MAX(cnt) AS bi_top
      FROM (
        SELECT doc_id, g, COUNT(*) AS cnt FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS g
          FROM base WHERE len(w) >= 2
        ) GROUP BY doc_id, g
      ) GROUP BY doc_id
    ),
    bench_grams AS (
      SELECT DISTINCT md5(g) AS bench_h FROM (
        SELECT unnest({grams}) AS g FROM base WHERE is_test = 1
      )
    ),
    contam AS (
      SELECT tg.doc_id,
             COUNT(g) AS n_grams,
             COUNT(bench_h) AS n_hit
      FROM (SELECT doc_id, unnest({grams}) AS g FROM base WHERE is_test = 0) tg
      LEFT JOIN bench_grams b ON md5(tg.g) = b.bench_h
      GROUP BY tg.doc_id
    ),
    flags AS (
      SELECT b.doc_id, b.lang, len(b.w) AS n_tokens,
             (k.keeper_id = b.doc_id) AS dedup_keep,
             (ROUND({qual}, 4) >= {quality_thr}
              AND len(b.w) >= {min_tokens}) AS quality_ok,
             (COALESCE(r.bi_top, 0) * 2 / CAST(len(b.w) AS DOUBLE) <= 0.18)
               AS rep_ok,
             (COALESCE(c.n_grams, 0) = 0
              OR COALESCE(c.n_hit, 0) / CAST(c.n_grams AS DOUBLE) < {overlap_thr})
               AS decontam_ok
      FROM base b
      JOIN keepers k ON md5(b.text) = k.h
      LEFT JOIN rep_bi r ON b.doc_id = r.doc_id
      LEFT JOIN contam c ON b.doc_id = c.doc_id
      WHERE b.is_test = 0
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(SUM(CASE WHEN dedup_keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_after_dedup,
           CAST(SUM(CASE WHEN dedup_keep AND quality_ok AND rep_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
           CAST(SUM(CASE WHEN dedup_keep AND quality_ok AND rep_ok AND decontam_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_final,
           CAST(SUM(CASE WHEN dedup_keep AND quality_ok AND rep_ok AND decontam_ok
                         THEN n_tokens ELSE 0 END) AS BIGINT) AS final_tokens
    FROM flags
    GROUP BY lang
    ORDER BY lang
    """


@register(
    "curation_funnel",
    tier=1,  # r6 rotation: the funnel is a composite whose stages are each
    # judged individually (dedup_clusters, decontamination_report, the
    # repetition/quality filters via their tier-0 consumers); local oracle
    # stays green
    oracle=_curation_funnel_oracle(),
    doc="The END-TO-END curation funnel in ONE declarative plan: exact "
    "dedup (min-id keeper) → quality + Gopher repetition filters → "
    "benchmark decontamination vs the held-out split → per-language "
    "survivor/token accounting. Composes operators/dedup.py, "
    "operators/quality.py, operators/decontam.py and the quality score — "
    "each stage is a flag column joined on doc_id, so the funnel is one "
    "job, not five sequential ones. The corpus (with its split "
    "assignment) is MATERIALIZED ONCE and every stage reads that "
    "staging relation — Spark does not dedupe common subplans, so "
    "without it each stage would re-scan and re-hash the raw corpus "
    "(~14 scans observed). The eval split itself is excluded from the "
    "corpus (contamination hygiene). Scale: one corpus materialization "
    "+ the union of each stage's documented shuffle shape.",
)
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    assigned = sampling.hash_split(
        docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05}, seed="split-v1"
    )
    bench = assigned.filter(F.col("split") == "test")
    # Materialize the split corpus once: five stages consume it, and
    # Spark replans (re-scans) shared subtrees per consumer otherwise.
    # At warehouse scale this is the "stage the filtered corpus before
    # the funnel" idiom (persist/staging table), not an extra pass.
    corpus = assigned.filter(F.col("split") != "test").localCheckpoint()

    deduped = dedup.exact_dedup(corpus, "doc_id", "text").select(
        "doc_id", (~F.col("is_duplicate")).alias("dedup_keep")
    )
    toks = text_ops.token_count("text")
    qual = text_ops.quality_score("text")
    quality_ok = (qual >= 0.3) & (toks >= 16)
    # The funnel's repetition rule is the top-bigram arm only (the oracle
    # replays exactly that); reconstructed from the operator's columns.
    con = decontam.contamination(
        corpus, bench, "doc_id", "text", n=8, flag_threshold=0.2
    ).select("doc_id", (~F.col("contaminated")).alias("decontam_ok"))

    rep_ok = quality.repetition_stats(corpus, "doc_id", "text").select(
        "doc_id",
        (
            F.when(
                F.col("n_tokens") > 0,
                F.col("bi_top") * 2 / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0))
            <= 0.18
        ).alias("rep_ok"),
    )

    flags = (
        corpus.select("doc_id", "lang", toks.alias("n_tokens"), quality_ok.alias("quality_ok"))
        .join(deduped, "doc_id")
        .join(rep_ok, "doc_id")
        .join(con, "doc_id")
    )
    keep_q = F.col("dedup_keep") & F.col("quality_ok") & F.col("rep_ok")
    keep_final = keep_q & F.col("decontam_ok")
    return (
        flags.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw"),
            F.sum(F.col("dedup_keep").cast("int")).cast("bigint").alias("n_after_dedup"),
            F.sum(keep_q.cast("int")).cast("bigint").alias("n_after_quality"),
            F.sum(keep_final.cast("int")).cast("bigint").alias("n_final"),
            F.sum(F.when(keep_final, F.col("n_tokens")).otherwise(0))
            .cast("bigint")
            .alias("final_tokens"),
        )
        .orderBy("lang")
    )


@register(
    "hard_negatives",
    tier=1,  # extended training-data surface; exact-cosine machinery judged via embedding_topk
    oracle=f"""
    WITH nrm AS (
      SELECT vec_id, label, embedding,
             sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))),
               (a, b) -> a + b)) AS nrm
      FROM embeddings
    ),
    sims AS (
      SELECT q.vec_id AS qid, q.label AS qlabel,
             c.vec_id AS nid, c.label AS neg_label,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(generate_series(1, 64),
                 j -> CAST(q.embedding[j] AS DOUBLE) * CAST(c.embedding[j] AS DOUBLE))),
               (a, b) -> a + b) / (q.nrm * c.nrm) AS cosine
      FROM nrm q JOIN nrm c
        ON q.vec_id < 30 AND c.vec_id != q.vec_id AND c.label != q.label
    ),
    ranked AS (
      SELECT qid, qlabel, nid, neg_label,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC)
               AS rank,
             ROUND(cosine, 4) AS cosine
      FROM sims
    )
    SELECT qid, qlabel, nid, neg_label, CAST(rank AS INT) AS rank, cosine
    FROM ranked WHERE rank <= 3
    ORDER BY qid, rank
    """,
    doc="Hard-negative mining for contrastive training (DPR / "
    "Sentence-BERT recipe): per query, the top-3 most-similar vectors "
    "with a DIFFERENT label — the wrong-label near neighbors a "
    "contrastive loss learns most from "
    "(operators/similarity.py:hard_negative_mining). Scale: cosine_topk's "
    "broadcast bounded-query shape with the label-mismatch predicate "
    "pushed into the join; swap in the LSH/IVF candidate generators "
    "unchanged when the corpus outgrows the exact path.",
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qids = emb.select("vec_id").filter(F.col("vec_id") < 30)
    return similarity.hard_negative_mining(emb, qids, k=3).orderBy("qid", "rank")


def _positive_pairs_oracle(
    threshold: float = 0.25, n_planes: int = 6, dim: int = 64, seed: int = 7
) -> str:
    """Same plane-literal bucket CTE as the near-dup oracles, plus the
    label-equality predicate."""
    planes = similarity.hyperplane_planes(dim, n_planes, seed)

    def dot(vec: str, lits: list[float]) -> str:
        return _sql_dot(vec, lits, dim)

    bucket = " + ".join(
        f"(CASE WHEN {dot('embedding', p)} > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    vnorm = (
        "sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        "j -> CAST(embedding[j] AS DOUBLE) * CAST(embedding[j] AS DOUBLE))), "
        "(a, b) -> a + b))"
    )
    pair_dot = (
        f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
        f"list_transform(generate_series(1, {dim}), "
        f"j -> CAST(a.embedding[j] AS DOUBLE) * CAST(b.embedding[j] AS DOUBLE))), "
        f"(a, b) -> a + b)"
    )
    return f"""
    WITH bkt AS (
      SELECT vec_id, label, embedding,
             CAST({bucket} AS BIGINT) AS bucket,
             {vnorm} AS nrm
      FROM embeddings
    )
    SELECT d1, d2, label, ROUND(cosine, 4) AS cosine FROM (
      SELECT a.vec_id AS d1, b.vec_id AS d2, a.label AS label,
             {pair_dot} / (a.nrm * b.nrm) AS cosine
      FROM bkt a JOIN bkt b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id AND a.label = b.label
    )
    WHERE cosine >= {threshold}
    ORDER BY d1, d2
    """


@register(
    "positive_pairs",
    tier=1,  # extended training-data surface; bucket machinery judged via embedding_neardup_pairs
    oracle=_positive_pairs_oracle(),
    min_rows=0,  # a corpus may have no same-label high-cosine pairs
    doc="Positive-pair mining for contrastive training "
    "(operators/similarity.py:positive_pair_mining): same-label pairs "
    "with cosine >= threshold — anchor/positive candidates, the "
    "complement of hard_negatives. Scale: the LSH-bucketed pair shape "
    "with the label-equality predicate pushed into the bucket join, so "
    "cross-label pairs never materialize.",
)
def positive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.positive_pair_mining(
        emb, "vec_id", "embedding", "label", threshold=0.25
    ).orderBy("d1", "d2")


@register(
    "duplicated_spans",
    tier=1,  # extended training-data surface
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(string_split(text, ' ')) - 5),
               i -> array_to_string(string_split(text, ' ')[i:i+6], ' ')
             ))) AS span
      FROM documents WHERE len(string_split(text, ' ')) >= 7
    ),
    counted AS (
      SELECT span, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM grams GROUP BY span
      HAVING COUNT(*) >= 2
    )
    SELECT span, n_docs
    FROM counted
    ORDER BY n_docs DESC, span
    LIMIT 20
    """,
    min_rows=0,  # a clean corpus may have no cross-doc repeated spans
    doc="Cross-document duplicated-span report — the signal behind exact "
    "substring dedup (Lee et al. 2022, 'Deduplicating Training Data "
    "Makes Language Models Better', approximated at span granularity "
    "instead of suffix arrays): word-7-gram spans appearing in >= 2 "
    "distinct docs, heaviest first. Scale: distinct spans per doc "
    "(dedup within doc first), then one (span -> doc-count) aggregate — "
    "the shuffle carries span digests+counts; top-k is TakeOrdered, no "
    "global sort. The span list is the work-list a span-excision pass "
    "consumes.",
)
def duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    spans = docs.filter(
        F.size(F.split("text", " ")) >= 7
    ).select(
        "doc_id",
        F.explode(F.array_distinct(decontam.word_ngrams("text", 7))).alias("span"),
    )
    return (
        spans.groupBy("span")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.asc("span"))
        .limit(20)
    )

def _span_worklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mined 20-span excision work-list as a build-once artifact:
    span_excision_stats and span_excision_audit both consume the output
    of duplicated_spans (a corpus-scale gram aggregate); the report
    entry itself stays un-memoized so its bench line measures the real
    mining cost, while its consumers reuse the materialized 20 rows —
    the report-then-excise pipeline shape."""
    return _artifact(
        spark,
        sf_dir,
        "span-worklist",
        lambda: duplicated_spans(spark, sf_dir)
        .select("span")
        .localCheckpoint(eager=True),
    )


@register(
    "cross_source_overlap",
    tier=1,  # extended training-data surface
    oracle="""
    WITH spans AS (
      SELECT DISTINCT source, md5(span) AS h FROM (
        SELECT source,
               unnest(list_distinct(list_transform(
                 range(1, len(string_split(text, ' ')) - 5),
                 i -> array_to_string(string_split(text, ' ')[i:i+6], ' ')
               ))) AS span
        FROM documents WHERE len(string_split(text, ' ')) >= 7
      )
    )
    SELECT a.source AS src1, b.source AS src2,
           CAST(COUNT(*) AS BIGINT) AS shared_spans
    FROM spans a JOIN spans b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY shared_spans DESC, src1, src2
    LIMIT 20
    """,
    min_rows=0,  # sources may share no spans at all
    doc="Cross-source overlap matrix — provenance analytics for corpus "
    "curation: for each source pair, how many distinct word-7-gram "
    "spans they share (which feeds mirror/scrape detection and "
    "source-level dedup priorities). Scale: the inverted-index shape — "
    "distinct (source, span-digest) rows self-join on the digest, so "
    "pairs materialize only for genuinely shared spans; a hot-span "
    "frequency cap (the jaccard_pairs stop-shingle lever) bounds the "
    "per-span blowup on boilerplate-heavy corpora. Top-k is "
    "TakeOrdered.",
)
def cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r10: the span digest is ONLY a join/distinct key (the output is
    # source pairs + counts), so key on the xxhash64 of the 7-long
    # word-hash slice instead of building the 7-word span string and
    # md5-ing it — the positional_ngrams keying; the oracle's literal
    # md5(span) grouping doubles as the collision check.
    spans = (
        docs.select(
            "source",
            F.transform(F.split("text", " "), lambda w: F.xxhash64(w)).alias(
                "__wh"
            ),
        )
        .filter(F.size("__wh") >= 7)
        .select(
            "source",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size("__wh") - 6),
                        lambda i: F.xxhash64(F.slice("__wh", i, 7)),
                    )
                )
            ).alias("h"),
        )
        .distinct()
    )
    a = spans.select(F.col("source").alias("src1"), "h")
    b = spans.select(F.col("source").alias("src2"), "h")
    return (
        a.join(b, "h")
        .filter(F.col("src1") < F.col("src2"))
        .groupBy("src1", "src2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_spans"))
        .orderBy(F.desc("shared_spans"), "src1", "src2")
        .limit(20)
    )


