"""Planted-fixture tests for the unigram-LM tokenizer
(operators/unigram.py): hand-computed seed vocabulary and integer
bit-surprisal costs, Viterbi segmentation incl. the fewest-pieces and
lexicographic tie-breaks, path/cost consistency, and hard-EM training
on a corpus with one dominant multi-character piece."""

from __future__ import annotations

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.operators import unigram


def _wf(spark, rows):
    return spark.createDataFrame(rows, "word string, f long")


def test_seed_vocab_and_costs_hand_computed(spark):
    # "aaaa" f=10 -> a:40, aa:30; "ab" f=5 -> a:5, b:5, ab:5.
    wf = _wf(spark, [("aaaa", 10), ("ab", 5)])
    vocab = unigram.seed_vocab(wf, max_piece_len=2, vocab_size=3)
    got = {r["piece"]: r["cnt"] for r in vocab.collect()}
    # top-3 = a(45), aa(30), ab(5; ties with b resolve to 'ab' < 'b');
    # chars rule re-adds b.
    assert got == {"a": 45, "aa": 30, "ab": 5, "b": 5}
    costs = {
        r["piece"]: (r["cost"], r["ccost"])
        for r in unigram.with_costs(vocab).collect()
    }
    # total=85: a 85//45=1 -> 1 bit; aa 85//30=2 -> 2; ab/b 17 -> 5 bits.
    assert costs["a"] == (1, 1 * 1024 + 1)
    assert costs["aa"] == (2, 2 * 1024 + 1)
    assert costs["ab"] == (5, 5 * 1024 + 1)
    assert costs["b"] == (5, 5 * 1024 + 1)


def test_viterbi_prefers_cost_then_fewest_pieces(spark):
    wf = _wf(spark, [("aaaa", 10), ("ab", 5)])
    vc = unigram.with_costs(unigram.seed_vocab(wf, 2, 3))
    out = {
        r["word"]: r
        for r in unigram.viterbi_combined(wf, vc, max_piece_len=2).collect()
    }
    # aaaa: aa+aa and aa+a+a and a*4 all cost 4 bits -> fewest pieces wins.
    assert (out["aaaa"]["cost"], out["aaaa"]["n_pieces"]) == (4, 2)
    # ab: piece 'ab' costs 5 < a+b = 6.
    assert (out["ab"]["cost"], out["ab"]["n_pieces"]) == (5, 1)

    segs = {
        r["word"]: r
        for r in unigram.viterbi_segments(wf, vc, max_piece_len=2).collect()
    }
    assert segs["aaaa"]["pieces"] == ["aa", "aa"]
    assert segs["ab"]["pieces"] == ["ab"]


def test_viterbi_path_tie_breaks_lexicographically(spark):
    # 'abc' alone: all pieces count 1 -> equal costs; a+bc and ab+c tie
    # on (cost, n_pieces) -> the lexicographically smaller piece
    # sequence ['a','bc'] must win, deterministically.
    wf = _wf(spark, [("abc", 1)])
    vc = unigram.with_costs(unigram.seed_vocab(wf, 2, 10))
    seg = unigram.viterbi_segments(wf, vc, max_piece_len=2).collect()[0]
    assert seg["pieces"] == ["a", "bc"]


def test_segments_reconstruct_and_match_combined(spark, sf_dir):
    """On real corpus words: every best path concatenates back to its
    word, and the path DP's cost equals the combined DP's cost."""
    from traffic_accidents_airflow_kafka_spark.operators import bpe
    from traffic_accidents_airflow_kafka_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    wf = (
        bpe.word_freq(docs)
        .filter(F.length("word") <= unigram.MAX_WORD_LEN)
        .orderBy(F.desc("f"), "word")
        .limit(40)
    )
    vc = unigram.with_costs(unigram.seed_vocab(bpe.word_freq(docs), 8, 200))
    seg = unigram.viterbi_segments(wf, vc, 8)
    bad = seg.filter(
        F.concat_ws("", F.col("pieces")) != F.col("word")
    ).count()
    assert bad == 0
    comb = {
        r["word"]: (r["cost"], r["n_pieces"])
        for r in unigram.viterbi_combined(wf, vc, 8).collect()
    }
    for r in seg.collect():
        assert comb[r["word"]] == (r["cost"], len(r["pieces"])), r["word"]


def test_hard_em_promotes_dominant_piece(spark):
    # One dominant word built from 'xy' repeats: EM must keep 'xy' and
    # segment the corpus with it (4 pieces x f=100, plus the singleton).
    wf = _wf(spark, [("xyxyxyxy", 100), ("q", 1)])
    costs, stats = unigram.hard_em_train(
        wf, vocab_size=4, max_piece_len=2, n_iters=3
    )
    pieces = {r["piece"] for r in costs.collect()}
    assert "xy" in pieces
    assert {"x", "y", "q"} <= pieces  # required chars never drop out
    assert [s["iteration"] for s in stats] == [0, 1, 2]
    assert all(s["corpus_words"] == 101 for s in stats)
    # With 'xy' in the vocab every iteration segments the dominant word
    # into 4 pieces: corpus_pieces = 4*100 + 1.
    assert stats[-1]["corpus_pieces"] == 401
    # Hard-EM sharpens counts onto used pieces; corpus cost must not
    # increase on this corpus.
    assert stats[-1]["corpus_cost_bits"] <= stats[0]["corpus_cost_bits"]


def test_prune_losses_redundant_piece_goes_first(spark):
    # "abab" f=100, max_piece_len=2, vocab_size=4 -> vocab a:200, b:200,
    # ab:200, ba:100; total=700 -> costs a/b/ab 2 bits (700//200=3),
    # ba 3 bits (700//100=7). Best path = [ab, ab]: 4 bits, 2 pieces
    # (combined 4*1024+2 = 4098).
    wf = _wf(spark, [("abab", 100)])
    vc = unigram.with_costs(unigram.seed_vocab(wf, 2, 4))
    losses = {
        r["piece"]: r["loss"]
        for r in unigram.prune_losses(wf, vc, max_piece_len=2).collect()
    }
    # Masking 'ab': best alternative is a+ba+b = 7 bits, 3 pieces
    # (7171); delta = 7171 - 4098 = 3073 per word, x f=100. 'ba' is off
    # the best path -> removal costs nothing.
    assert losses == {"ab": 307300, "ba": 0}
    # One pruning round keeping 1 multi-char piece: the load-bearing
    # 'ab' survives, the redundant 'ba' is pruned first.
    flags = {
        r["piece"]: r["kept"]
        for r in unigram.prune_round(
            unigram.prune_losses(wf, vc, max_piece_len=2), keep=1
        ).collect()
    }
    assert flags == {"ab": True, "ba": False}
