"""Text dedup family: exact/normalized/keeper, CCNet line-level, n-gram Jaccard, MinHash-LSH, SimHash, SymSpell edit-distance.

Segment of the LLM-pipeline catalog (see plans/llm.py — the façade
that imports every segment in registration order). Split from the
monolithic llm.py in r10 (VERDICT r9 #8); all entry and helper text is
carried verbatim, so file history continues there.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    dedup,
    text as text_ops,
)
from ..sources.tables import load_table
from .registry import register
from .llm_shared import _NUM_HASHES, _SHINGLE_CTE

@register(
    "dedup_exact_stats",
    tier=1,  # r5 rotation: exact dedup stays judged via corpus_prep + curation_funnel
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct_texts,
           COUNT(*) - COUNT(DISTINCT md5(text)) AS n_duplicate_docs
    FROM documents
    """,
    doc="Exact dedup, corpus stats: hash-groupBy over md5(text) "
    "(operators/dedup.py:text_hash). Scale: 32-byte digests shuffle, "
    "never document bodies; count-distinct is a two-phase partial "
    "aggregate.",
)
def dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = dedup.text_hash("text")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct_texts"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_duplicate_docs"),
    )


@register(
    "dedup_exact_normalized",
    tier=1,  # exact-dedup family judged via dedup_exact_stats; adds the normalization rung
    oracle="""
    WITH norm AS (
      SELECT trim(regexp_replace(regexp_replace(lower(text),
               '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS n
      FROM documents
    )
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(n)) AS n_distinct_norm,
           COUNT(*) - COUNT(DISTINCT md5(n)) AS n_norm_duplicates
    FROM norm
    """,
    doc="Normalization-robust exact dedup (operators/text.py:"
    "normalize_text): lowercase + punctuation strip + whitespace "
    "collapse before hashing, catching the case-flip/punctuation "
    "duplicate class byte-exact md5 misses — the first rung below "
    "MinHash on the dedup ladder, at hash-groupBy cost. Oracle applies "
    "the identical RE2-safe normalization in SQL. Scale: identical "
    "shape to dedup_exact_stats — digests shuffle, never bodies.",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(text_ops.normalize_text("text").cast("binary"))
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(h).alias("n_distinct_norm"),
        (F.count(F.lit(1)) - F.countDistinct(h)).alias("n_norm_duplicates"),
    )


@register(
    "dedup_exact_keep",
    tier=1,  # exact-dedup family judged via dedup_exact_stats; keeper pinned by idempotence test + local oracle
    oracle="""
    SELECT doc_id,
           CASE WHEN doc_id <> MIN(doc_id) OVER (PARTITION BY md5(text))
                THEN TRUE ELSE FALSE END AS is_duplicate
    FROM documents
    ORDER BY doc_id
    """,
    doc="Exact dedup, keeper assignment: lowest doc_id per distinct text "
    "survives (deterministic — the distributed analog of the reference's "
    "ON CONFLICT DO NOTHING first-writer-wins, "
    "dags/etl_crash_traffic.py:693-787). Scale: groupBy-min + hash join "
    "on digest, both shuffle only (digest, id) pairs.",
)
def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        dedup.exact_dedup(docs, "doc_id", "text")
        .select("doc_id", "is_duplicate")
        .orderBy("doc_id")
    )


#: Planted boilerplate for the line-dedup entries (CCNet-style removal
#: needs a unit that genuinely repeats across docs; the synthetic corpus
#: has no newlines, so the entries synthesize lines AND plant the
#: boilerplate with pure doc_id arithmetic both engines replay). Three
#: variants (suffix doc_id % 3) prove the drop-set handles multiple
#: distinct units.
_BOILERPLATE = "subscribe to our newsletter and accept cookies variant"

#: Words per synthesized line (docs chunk into fixed 10-word units).
_LINE_W = 10


def _lined_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table re-shaped as newline-delimited docs with
    PLANTED boilerplate: text chunks into fixed 10-word lines; every
    doc with doc_id % 5 == 1 gets the boilerplate line variant
    (doc_id % 3) INSERTED at 0-based line position
    doc_id % (n_lines + 1) — varying positions prove the rewrite
    preserves surviving-line order. All arithmetic is integer-exact and
    replayed verbatim in the oracle CTEs.

    Materialized once per call (r10, guide §5): every consumer feeds
    line_dedup, whose unit relation is read by BOTH the frequency
    aggregate and the rewrite — without the checkpoint the chunk/plant
    string construction executed twice per query (interleaved warm A/B:
    line_dedup_report 1.63 → 1.19 s, collect()-identical). At warehouse
    scale this is "stage the lined corpus before the pass", not an
    extra copy."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.floor((F.size(words) + (_LINE_W - 1)) / _LINE_W).cast("int")
    lines = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(
            " ", F.slice(words, (i - 1) * _LINE_W + 1, _LINE_W)
        ),
    )
    bl = F.concat_ws(
        " ", F.lit(_BOILERPLATE), (F.col("doc_id") % 3).cast("string")
    )
    p = (F.col("doc_id") % (F.size(lines) + 1)).cast("int")
    planted = F.when(
        F.col("doc_id") % 5 == 1,
        F.concat(
            F.slice(lines, 1, p),
            F.array(bl),
            F.slice(lines, p + 1, F.size(lines) - p),
        ),
    ).otherwise(lines)
    return docs.select(
        "doc_id", F.array_join(planted, "\n").alias("text")
    ).localCheckpoint()


#: Oracle CTE chain shared by the line-dedup report and summary: the
#: planted lined corpus, its unit relation, per-unit doc frequency, and
#: the per-doc rewrite — the exact SQL replay of
#: operators/dedup.py:line_dedup over _lined_documents.
_LINE_DEDUP_CTES = f"""
    WITH words AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunked AS (
      SELECT doc_id,
             list_transform(generate_series(1, (len(w) + {_LINE_W - 1}) // {_LINE_W}),
               i -> array_to_string(w[((i-1)*{_LINE_W}+1):(i*{_LINE_W})], ' ')) AS lines
      FROM words
    ),
    lined AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 1 THEN
               lines[1:CAST(doc_id % (len(lines)+1) AS INT)]
               || ['{_BOILERPLATE} ' || CAST(doc_id % 3 AS VARCHAR)]
               || lines[CAST(doc_id % (len(lines)+1) AS INT)+1:len(lines)]
             ELSE lines END AS lines
      FROM chunked
    ),
    units AS (
      SELECT doc_id, t.i AS pos, lines[t.i] AS line
      FROM lined, UNNEST(generate_series(1, len(lines))) AS t(i)
    ),
    dfreq AS (
      SELECT md5(line) AS lh, COUNT(DISTINCT doc_id) AS line_df
      FROM units GROUP BY md5(line)
    ),
    flagged AS (
      SELECT u.doc_id, u.pos, u.line, d.line_df > 4 AS dropped
      FROM units u JOIN dfreq d ON md5(u.line) = d.lh
    ),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
             CAST(SUM(length(line)) + COUNT(*) - 1 AS BIGINT) AS chars_before,
             COALESCE(string_agg(CASE WHEN NOT dropped THEN line END,
                                 chr(10) ORDER BY pos), '') AS clean_text
      FROM flagged GROUP BY doc_id
    )
"""


@register(
    "line_dedup_report",
    tier=0,  # r10 flagship (VERDICT r9 #1): the CCNet/RefinedWeb
    # line-level boilerplate-removal idiom — the production dedup rung
    # between exact doc-dedup and MinHash — judged this round; takes the
    # slot of incremental_repeated_spans (same gram-index machinery
    # stays judged via repeated_span_report, tier 0)
    oracle=_LINE_DEDUP_CTES
    + """
    SELECT doc_id, n_lines, n_dropped, chars_before,
           CAST(length(clean_text) AS BIGINT) AS chars_after,
           ROUND(CAST(length(clean_text) AS DOUBLE) / chars_before, 4)
             AS retention,
           md5(clean_text) AS clean_md5
    FROM per_doc
    WHERE n_dropped > 0
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="Line-level exact dedup (CCNet / RefinedWeb boilerplate "
    "removal — the production idiom every web-crawl pipeline runs "
    "BEFORE MinHash, and the granularity between whole-document exact "
    "dedup and token-window repeated spans): hash each line, count "
    "per-line DOCUMENT frequency, drop every occurrence of lines "
    "appearing in > 4 distinct docs (headers, nav bars, cookie "
    "banners), and reassemble the survivors in original order "
    "(operators/dedup.py:line_dedup). The synthetic corpus has no "
    "newlines, so the entry synthesizes 10-word lines and PLANTS "
    "boilerplate the way the ANN audits plant queries: docs with "
    "doc_id % 5 == 1 carry one of three boilerplate variants inserted "
    "at line position doc_id % (n_lines+1) — pure integer arithmetic "
    "the oracle replays — and the operator must excise it everywhere "
    "while organic below-threshold lines survive. Per touched doc: "
    "line counts, exact char accounting (separator chars included), "
    "float retention, and the md5 of the REASSEMBLED text — the "
    "rewrite itself is value-hashed, not just the drop statistics. "
    "Scale: the frequency aggregate ships (md5, doc_id) pairs, never "
    "line text; the drop-set is boilerplate-vocabulary-sized and "
    "broadcast, so removal is map-side; the one corpus shuffle is the "
    "per-doc reassembly groupBy, inherent to remove-and-rewrite.",
)
def line_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.line_dedup(
        _lined_documents(spark, sf_dir),
        "doc_id",
        "text",
        sep="\n",
        max_doc_freq=4,
    )
    return (
        out.filter(F.col("n_dropped") > 0)
        .select(
            "doc_id",
            "n_lines",
            "n_dropped",
            "chars_before",
            "chars_after",
            F.round(
                F.col("chars_after").cast("double") / F.col("chars_before"), 4
            ).alias("retention"),
            F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


@register(
    "line_dedup_summary",
    tier=1,  # line-dedup family judged via line_dedup_report (tier 0);
    # full local oracle
    oracle=_LINE_DEDUP_CTES
    + """
    SELECT
      CAST(COUNT(*) AS BIGINT) AS docs_total,
      CAST(SUM(CASE WHEN n_dropped > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS docs_touched,
      CAST(SUM(n_dropped) AS BIGINT) AS units_dropped,
      CAST(SUM(chars_before - length(clean_text)) AS BIGINT) AS chars_removed,
      ROUND(CAST(SUM(length(clean_text)) AS DOUBLE) / SUM(chars_before), 4)
        AS corpus_retention
    FROM per_doc
    """,
    doc="Corpus-level rollup of the line-dedup pass: total vs touched "
    "docs, units dropped, exact chars removed (separator chars "
    "included), and overall retention — the one-row QA summary a "
    "100 TB boilerplate-removal job reports to its pipeline monitor. "
    "Same planted lined corpus and operator as line_dedup_report "
    "(operators/dedup.py:line_dedup); exact BIGINT sums keep the "
    "cross-engine hash stable, retention is the one ROUND(...,4) "
    "float. Scale: a second-phase aggregate over per-doc stats rows — "
    "one narrow row per doc into a scalar rollup, no text shuffled.",
)
def line_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.line_dedup(
        _lined_documents(spark, sf_dir),
        "doc_id",
        "text",
        sep="\n",
        max_doc_freq=4,
    )
    return out.agg(
        F.count(F.lit(1)).alias("docs_total"),
        F.sum(F.when(F.col("n_dropped") > 0, 1).otherwise(0)).alias(
            "docs_touched"
        ),
        F.sum("n_dropped").alias("units_dropped"),
        F.sum(F.col("chars_before") - F.col("chars_after")).alias(
            "chars_removed"
        ),
        F.round(
            F.sum("chars_after").cast("double") / F.sum("chars_before"), 4
        ).alias("corpus_retention"),
    )


@register(
    "incremental_line_dedup",
    tier=1,  # line-dedup family judged via line_dedup_report (tier 0);
    # full local oracle
    min_rows=0,  # an arrival batch with no over-threshold lines rewrites nothing
    oracle=_LINE_DEDUP_CTES
    + """
    SELECT doc_id, n_lines, n_dropped, chars_before,
           CAST(length(clean_text) AS BIGINT) AS chars_after,
           ROUND(CAST(length(clean_text) AS DOUBLE) / chars_before, 4)
             AS retention,
           md5(clean_text) AS clean_md5
    FROM per_doc
    WHERE doc_id % 3 = 2 AND n_dropped > 0
    ORDER BY doc_id
    LIMIT 500
    """,
    doc="Line-level dedup for the daily-ingest shape "
    "(operators/dedup.py:incremental_line_dedup — the line-granular "
    "twin of incremental_repeated_spans): the third of docs with "
    "doc_id % 3 == 2 play today's arrival batch; their lines are "
    "rewritten against a historical line-support INDEX "
    "(line_support_index — a persistable (md5, distinct-doc-count) "
    "relation) merged with the batch's own counts, sound because "
    "distinct-doc counts over disjoint doc sets ADD. The split "
    "cross-cuts the % 5 == 1 boilerplate planting, so BOTH removal "
    "mechanisms are exercised: boilerplate already indexed from "
    "history and same-batch template accumulation. Output contract "
    "and oracle semantics are EXACTLY line_dedup_report restricted to "
    "arrival docs with support counted over the full corpus — the "
    "oracle's whole-corpus frequency CTE IS the equivalence check. "
    "Scale: per-day cost is linear in the batch — the index is "
    "semi-joined down to the batch's line set before the merge, and "
    "history text is never rescanned once the index is persisted.",
)
def incremental_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    lined = _lined_documents(spark, sf_dir)
    history = lined.filter(F.col("doc_id") % 3 != 2)
    arrivals = lined.filter(F.col("doc_id") % 3 == 2)
    out = dedup.incremental_line_dedup(
        history, arrivals, "doc_id", "text", sep="\n", max_doc_freq=4
    )
    return (
        out.filter(F.col("n_dropped") > 0)
        .select(
            "doc_id",
            "n_lines",
            "n_dropped",
            "chars_before",
            "chars_after",
            F.round(
                F.col("chars_after").cast("double") / F.col("chars_before"), 4
            ).alias("retention"),
            F.md5(F.col("clean_text").cast("binary")).alias("clean_md5"),
        )
        .orderBy("doc_id")
        .limit(500)
    )


@register(
    "ngram_jaccard_pairs",
    oracle=_SHINGLE_CTE
    + """,
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT i.d1, i.d2, i.n_common,
           ROUND(i.n_common / CAST(s1.sz + s2.sz - i.n_common AS DOUBLE), 4) AS jaccard
    FROM inter i
    JOIN sizes s1 ON i.d1 = s1.doc_id
    JOIN sizes s2 ON i.d2 = s2.doc_id
    ORDER BY jaccard DESC, d1, d2
    LIMIT 50
    """,
    doc="N-gram Jaccard near-dup: word 3-gram shingles → inverted-index "
    "self-join → exact Jaccard; top-50 pairs (operators/dedup.py:"
    "word_shingles/jaccard_pairs). Scale: pairs only materialize for docs "
    "sharing a shingle; hot-shingle frequency cap (max_shingle_freq) is "
    "the skew guard at corpus scale — disabled here for oracle exactness.",
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.word_shingle_keys(docs, "doc_id", "text", n=3)
    pairs = dedup.jaccard_pairs(sh, "doc_id")
    return (
        pairs.select("d1", "d2", "n_common", F.round("jaccard", 4).alias("jaccard"))
        .orderBy(F.desc("jaccard"), "d1", "d2")
        .limit(50)
    )


def _minhash_oracle() -> str:
    mh_aggs = ",\n        ".join(
        f"min(md5('{i}|' || shingle)) AS mh{i}" for i in range(_NUM_HASHES)
    )
    band_union = "\n      UNION ALL ".join(
        f"SELECT doc_id, {i} AS band_idx, mh{i} AS band_val FROM sig"
        for i in range(_NUM_HASHES)
    )
    match_sum = " + ".join(
        f"CASE WHEN s1.mh{i} = s2.mh{i} THEN 1 ELSE 0 END" for i in range(_NUM_HASHES)
    )
    return (
        _SHINGLE_CTE
        + f""",
    sig AS (
      SELECT doc_id, {mh_aggs}
      FROM sh GROUP BY doc_id
    ),
    bands AS (
      {band_union}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                   AND a.doc_id < b.doc_id
    )
    SELECT c.d1, c.d2,
           CAST(({match_sum}) AS DOUBLE) / {_NUM_HASHES} AS est_sim
    FROM cand c
    JOIN sig s1 ON c.d1 = s1.doc_id
    JOIN sig s2 ON c.d2 = s2.doc_id
    ORDER BY est_sim DESC, d1, d2
    LIMIT 200
    """
    )


@register(
    "minhash_lsh_pairs",
    tier=1,  # r8 rotation OUT for the lattice-ANN flagships: banded
    # inverted-index candidate generation stays driver-judged via
    # ngram_jaccard_pairs (same band-join shape) and dedup_clusters
    # (consumes the shared pair-graph artifact); local oracle retained
    oracle=_minhash_oracle(),
    doc="MinHash-LSH near-dup candidates: 8 md5-seeded minhashes per doc "
    "(lexicographic string minima — a keyed crypto hash is a uniform "
    "permutation of shingle space, and md5 is engine-stable, so the whole "
    "LSH pipeline oracle-checks), banded at r=1 (high-recall OR-of-8 "
    "candidate generation), est_sim = matching minhashes / 8 "
    "(operators/dedup.py:minhash_signatures/lsh_candidate_pairs). Scale: "
    "signatures are one hash-aggregate over shingles; candidate join keys "
    "on 32-char band values — linear in docs × bands, never all-pairs.",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, "doc_id", "text", n=3)
    sigs = dedup.minhash_signatures(sh, "doc_id", _NUM_HASHES)
    pairs = dedup.lsh_candidate_pairs(sigs, "doc_id", _NUM_HASHES, rows_per_band=1)
    return pairs.orderBy(F.desc("est_sim"), "d1", "d2").limit(200)


_SIMHASH_ORACLE = """
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS t FROM documents
    ),
    h AS (SELECT doc_id, md5(t) AS hx FROM toks),
    bits AS (
      SELECT doc_id, i,
             ((instr('0123456789abcdef', substr(hx, (i // 4) + 1, 1)) - 1)
              >> (3 - (i % 4))) & 1 AS b
      FROM h, generate_series(0, 63) AS g(i)
    ),
    votes AS (SELECT doc_id, i, SUM(b * 2 - 1) AS w FROM bits GROUP BY 1, 2),
    sig AS (
      SELECT doc_id,
             SUM(CASE WHEN w > 0 THEN
                   CASE WHEN i = 63 THEN CAST(-9223372036854775808 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT) << i) END
                 ELSE 0 END) AS simhash
      FROM votes GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, simhash, i AS band_idx, (simhash >> (16 * i)) & 65535 AS band_val
      FROM sig, generate_series(0, 3) AS gb(i)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2, a.simhash AS s1, b.simhash AS s2
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                   AND a.doc_id < b.doc_id
    )
    SELECT d1, d2, CAST(bit_count(xor(s1, s2)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(s1, s2)) <= 8
    ORDER BY hamming, d1, d2
    LIMIT 500
    """


@register(
    "simhash_near_pairs",
    tier=1,  # r7 demotion: near-dup banded-join family co-judged by
    # minhash_lsh_pairs + ngram_jaccard_pairs (tier 0); oracle stays local
    oracle=_SIMHASH_ORACLE,
    min_rows=0,  # random word-salad corpus may legitimately have no Hamming-close pairs
    doc="SimHash near-dup: 64-bit signatures (md5-bit majority votes), "
    "4×16-bit band join, exact Hamming via bit_count(xor) "
    "(operators/dedup.py:simhash64/simhash_near_pairs). Fully "
    "oracle-checked: md5 is engine-stable and the bit votes / band "
    "slices are integer arithmetic in both engines (digit-wise hex "
    "parse on the DuckDB side; bit 63 spelled as min-long since 1<<63 "
    "overflows signed). Scale: single-pass vote aggregate; candidates "
    "via band equality, each pair emitted once.",
)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.simhash64(docs, "doc_id", "text")
    return (
        dedup.simhash_near_pairs(sigs, "doc_id", max_hamming=8)
        .orderBy("hamming", "d1", "d2")
        .limit(500)
    )


@register(
    "typo_edit_pairs",
    tier=0,  # rotated INTO the judged window in r10 (VERDICT r9 #2):
    # the r9 SymSpell family member should be driver-judged; takes the
    # slot of decontamination_report (decontam family stays judged via
    # span_excision_audit + semantic_decontamination_lsh, both tier 0)
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '{text_ops.BPE_ISH_PATTERN}', 0)) AS word
      FROM documents
    ),
    wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM words
      GROUP BY word
      HAVING COUNT(*) >= 2 AND length(word) BETWEEN 3 AND 20
    ),
    typos AS (
      SELECT substr(word, 1, (f % length(word))) ||
             substr(word, (f % length(word)) + 2, length(word)) AS word,
             CAST(1 AS BIGINT) AS f
      FROM wf WHERE f % 7 = 3
    ),
    vocab AS (
      SELECT word, MAX(f) AS f FROM (
        SELECT * FROM wf UNION ALL SELECT * FROM typos
      ) GROUP BY word
    ),
    keys AS (
      SELECT word, f,
             unnest(list_append(list_transform(
               generate_series(1, length(word)),
               i -> substr(word, 1, i - 1)
                    || substr(word, i + 1, length(word))), word)) AS dkey
      FROM vocab
    ),
    cand AS (
      SELECT DISTINCT a.word AS w1, b.word AS w2, a.f AS f1, b.f AS f2
      FROM keys a JOIN keys b ON a.dkey = b.dkey AND a.word < b.word
    )
    SELECT w1, w2, f1, f2
    FROM cand WHERE levenshtein(w1, w2) = 1
    ORDER BY f1 + f2 DESC, w1, w2 LIMIT 200
    """,
    doc="Edit-distance near-dup (r9, completing the dedup family's "
    "distance metrics: set-overlap Jaccard, bitwise Hamming, float "
    "cosine — and now string EDIT distance): word pairs at Levenshtein "
    "distance exactly 1, found via the SymSpell deletion-neighborhood "
    "index (operators/dedup.py:deletion_neighborhood_pairs) — each "
    "word emits its identity key plus every 1-deletion; any distance-1 "
    "pair must share a key (substitutions share the differing-position "
    "deletion; an insert/delete pair's shorter word IS a deletion of "
    "the longer), so candidates come from an inverted-index equi-join, "
    "never all-pairs, and native levenshtein verifies exactly — the "
    "typo/variant-mining pass vocabulary normalization and OCR cleanup "
    "run at corpus scale. The synthetic corpus vocabulary is "
    "well-separated (zero organic distance-1 pairs — measured), so the "
    "entry PLANTS recall targets the way the ANN audits plant queries: "
    "every frequent word with f % 7 = 3 contributes one deterministic "
    "single-deletion typo (position f % len — pure integer arithmetic, "
    "identical in SQL), and the index must recover every planted pair. "
    "Fully oracle-checked: planting, key generation, and standard "
    "unit-cost Levenshtein are engine-identical. Scale: index is "
    "vocabulary-sized (|vocab| x (len+1) keys after the frequency/"
    "length band); per-key fan-out is bounded by alphabet x positions; "
    "distance-2 extends the same shape with 2-deletions.",
)
def typo_edit_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freq(docs).filter(
        (F.col("f") >= 2)
        & (F.length("word") >= 3)
        & (F.length("word") <= 20)
    )
    # Planted recall targets (see doc): one deterministic 1-deletion
    # typo per f%7==3 word, at position f % len (1-based char dropped
    # is at (f % len) + 1) — the same integer arithmetic the oracle
    # replays. MAX(f) dedupes a planted typo that collides with a real
    # vocabulary word.
    typos = wf.filter(F.col("f") % 7 == 3).select(
        F.concat(
            F.expr("substring(word, 1, f % length(word))"),
            F.expr("substring(word, (f % length(word)) + 2, length(word))"),
        ).alias("word"),
        F.lit(1).cast("long").alias("f"),
    )
    vocab = (
        wf.select("word", "f")
        .unionByName(typos)
        .groupBy("word")
        .agg(F.max("f").alias("f"))
    )
    pairs = dedup.deletion_neighborhood_pairs(
        vocab, min_freq=1, min_len=1, max_len=20
    )
    # dist is constant 1 at max_distance=1 — keep the judged schema to
    # the informative four columns (oracle unchanged).
    return (
        pairs.select("w1", "w2", "f1", "f2")
        .orderBy(F.desc(F.col("f1") + F.col("f2")), "w1", "w2")
        .limit(200)
    )


@register(
    "typo_edit_pairs_d2",
    tier=1,  # SymSpell family judged via typo_edit_pairs (tier 0, the
    # same deletion-index machinery at depth 1); full local oracle
    oracle=f"""
    WITH words AS (
      SELECT unnest(regexp_extract_all(text, '{text_ops.BPE_ISH_PATTERN}', 0)) AS word
      FROM documents
    ),
    wf AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS f FROM words
      GROUP BY word
      HAVING COUNT(*) >= 2 AND length(word) BETWEEN 3 AND 20
    ),
    subbed AS (
      SELECT substr(word, 1, f % length(word))
             || chr(97 + (ascii(substr(word, (f % length(word)) + 1, 1)) - 97 + 1) % 26)
             || substr(word, (f % length(word)) + 2, length(word)) AS ws,
             f
      FROM wf WHERE f % 7 = 5
    ),
    typos AS (
      SELECT substr(ws, 1, (f * 3) % (length(ws) + 1))
             || chr(CAST(97 + f % 26 AS INT))
             || substr(ws, ((f * 3) % (length(ws) + 1)) + 1, length(ws)) AS word,
             CAST(1 AS BIGINT) AS f
      FROM subbed
    ),
    vocab AS (
      SELECT word, MAX(f) AS f FROM (
        SELECT * FROM wf UNION ALL SELECT * FROM typos
      ) GROUP BY word
    ),
    keys AS (
      SELECT word, f, unnest(list_distinct(
        list_append(list_transform(generate_series(1, length(word)),
          i -> substr(word, 1, i - 1) || substr(word, i + 1, length(word))), word)
        || flatten(list_transform(generate_series(1, length(word) - 1),
             i -> list_transform(generate_series(i + 1, length(word)),
               j -> substr(word, 1, i - 1) || substr(word, i + 1, j - i - 1)
                    || substr(word, j + 1, length(word)))))
      )) AS dkey
      FROM vocab
    ),
    cand AS (
      SELECT DISTINCT a.word AS w1, b.word AS w2, a.f AS f1, b.f AS f2
      FROM keys a JOIN keys b ON a.dkey = b.dkey AND a.word < b.word
    )
    SELECT w1, w2, f1, f2, CAST(levenshtein(w1, w2) AS INT) AS dist
    FROM cand WHERE levenshtein(w1, w2) <= 2
    ORDER BY dist, f1 + f2 DESC, w1, w2 LIMIT 200
    """,
    doc="SymSpell at distance 2 (r10, proving the index-size-for-"
    "precision trade the r9 docstring asserted): word pairs at "
    "Levenshtein distance <= 2 via the 0/1/2-deletion neighborhood "
    "index (operators/dedup.py:deletion_neighborhood_pairs, "
    "max_distance=2) — each unit edit consumes at most one deletion "
    "per side, so any distance-2 pair shares a key in the union of "
    "2-deletion neighborhoods, and exact native levenshtein drops the "
    "up-to-distance-4 admits the keys allow. Planted recall in the "
    "typo_edit_pairs style: every frequent word with f % 7 = 5 "
    "contributes one COMPOUND typo — substitute position f % len with "
    "the next alphabet letter, then insert chr(97 + f % 26) at "
    "position (f*3) % (len+1) — pure chr/ascii/modulo arithmetic, "
    "verified bit-identical across engines, that the depth-2 index "
    "must recover. Scale: the d2 index is |vocab| x len^2/2 keys — "
    "quadratic in WORD LENGTH, not vocabulary — and the candidate "
    "join stays an inverted-index equi-join with bounded per-key "
    "fan-out; the exact-verify filter keeps the output pair-exact.",
)
def typo_edit_pairs_d2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import bpe

    docs = load_table(spark, sf_dir, "documents")
    wf = bpe.word_freq(docs).filter(
        (F.col("f") >= 2)
        & (F.length("word") >= 3)
        & (F.length("word") <= 20)
    )
    subbed = wf.filter(F.col("f") % 7 == 5).select(
        F.expr(
            "concat(substring(word, 1, f % length(word)), "
            "chr(97 + (ascii(substring(word, (f % length(word)) + 1, 1)) - 97 + 1) % 26), "
            "substring(word, (f % length(word)) + 2, length(word)))"
        ).alias("ws"),
        "f",
    )
    typos = subbed.select(
        F.expr(
            "concat(substring(ws, 1, (f * 3) % (length(ws) + 1)), "
            "chr(97 + f % 26), "
            "substring(ws, ((f * 3) % (length(ws) + 1)) + 1, length(ws)))"
        ).alias("word"),
        F.lit(1).cast("long").alias("f"),
    )
    vocab = (
        wf.select("word", "f")
        .unionByName(typos)
        .groupBy("word")
        .agg(F.max("f").alias("f"))
    )
    pairs = dedup.deletion_neighborhood_pairs(
        vocab, min_freq=1, min_len=1, max_len=22, max_distance=2
    )
    return pairs.orderBy(
        "dist", F.desc(F.col("f1") + F.col("f2")), "w1", "w2"
    ).limit(200)


def _topk_oracle() -> str:
    return """
    WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 10),
    sims AS (
      SELECT q.qid, e.vec_id AS nid,
             list_sum(list_transform(generate_series(1, len(q.qvec)),
                      i -> CAST(q.qvec[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
             / ( sqrt(list_sum(list_transform(generate_series(1, len(q.qvec)),
                      i -> CAST(q.qvec[i] AS DOUBLE) * CAST(q.qvec[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, len(e.embedding)),
                      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) )
             AS cosine
      FROM q JOIN embeddings e ON e.vec_id <> q.qid
    )
    SELECT qid, nid, rank, ROUND(cosine, 4) AS cosine FROM (
      SELECT qid, nid, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS INT) AS rank
      FROM sims
    )
    WHERE rank <= 3
    ORDER BY qid, rank
    """


