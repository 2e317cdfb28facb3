"""Property-based tests (Hypothesis): engine expressions vs their Python
ground truth over randomized inputs, evaluated in ONE Spark job per
property (batch the examples into a DataFrame — per-example Spark jobs
would be prohibitively slow)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from traffic_accidents_airflow_kafka_spark.functions import scalar as fn
from traffic_accidents_airflow_kafka_spark.operators import text as text_ops

FLOATS = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@settings(max_examples=10, deadline=None)
@given(st.lists(FLOATS, min_size=1, max_size=50))
def test_floor_bin_matches_python_floor_division(spark, xs):
    df = spark.createDataFrame([(i, float(x)) for i, x in enumerate(xs)], "i int, x double")
    got = {
        r["i"]: r["b"]
        for r in df.select("i", fn.floor_bin("x", 0.5).alias("b")).collect()
    }
    for i, x in enumerate(xs):
        want = (x // 0.5) * 0.5
        assert math.isclose(got[i], want, rel_tol=1e-12, abs_tol=1e-12), (x, got[i], want)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from([-89.5, -45.0, 0.0, 35.5, 71.0]),
            st.sampled_from([-179.5, -120.0, 0.0, 80.5, 179.0]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_bbox_label_roundtrip_property(spark, coords):
    df = spark.createDataFrame(
        [(i, la, ln) for i, (la, ln) in enumerate(coords)], "i int, lat double, lng double"
    )
    label = fn.bbox_label("lat", "lng")
    plat, plng = fn.bbox_label_parse(label)
    rows = df.select("i", label.alias("s"), plat.alias("la"), plng.alias("ln")).collect()
    for r in rows:
        i = r["i"]
        assert r["s"] == f"bbox_{coords[i][0]}_{coords[i][1]}"
        assert r["la"] == coords[i][0] and r["ln"] == coords[i][1]


TOKENS = st.text(alphabet=st.sampled_from("abcdefg"), min_size=1, max_size=8)


@settings(max_examples=10, deadline=None)
@given(st.lists(TOKENS, min_size=1, max_size=30))
def test_token_fingerprint_matches_python_fold(spark, tokens):
    text = " ".join(tokens)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(text_ops.token_fingerprint("text").alias("fp")).collect()[0]["fp"]
    acc = 0
    for t in tokens:
        acc = (acc * text_ops.ROLL_MULT + (len(t) * 131 + ord(t[0]))) % text_ops.ROLL_MOD
    assert got == acc


@settings(max_examples=10, deadline=None)
@given(st.lists(TOKENS, min_size=3, max_size=30))
def test_shingle_count_property(spark, tokens):
    # |distinct 3-gram shingles| computed by the operator equals Python's.
    from traffic_accidents_airflow_kafka_spark.operators import dedup

    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = dedup.word_shingles(df, "doc_id", "text", 3).count()
    want = len({" ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)})
    assert got == want


CLASSES_WITH_NOISE = st.sampled_from(
    [
        "signal", " SIGNAL ", "Traffic_Lights", "zebra", "marked;unmarked",
        "pelican", "bogus", "", "ramp_meter", "LEVEL_crossing", "puffin;zebra",
    ]
)


@settings(max_examples=10, deadline=None)
@given(st.lists(CLASSES_WITH_NOISE, min_size=1, max_size=20))
def test_enum_maps_match_reference_semantics(spark, values):
    # Python ground truth = the reference mappers' str.strip().lower()
    # membership rules (dags/etl_crash_traffic.py:383-395).
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, v string")
    got = {
        r["i"]: (r["ts"], r["cr"])
        for r in df.select(
            "i",
            fn.map_traffic_signal("v").alias("ts"),
            fn.map_crossing("v").alias("cr"),
        ).collect()
    }
    for i, v in enumerate(values):
        n = v.strip().lower()
        want_ts = n if n in fn.TRAFFIC_SIGNAL_CLASSES else "unknown"
        if ";" in n:
            want_cr = "combinations"
        elif n in fn.CROSSING_CLASSES:
            want_cr = n
        else:
            want_cr = "unknown"
        assert got[i] == (want_ts, want_cr), (v, got[i])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(fn.SEVERITY_ORDER + ("nonsense", "", "fatal")),
        min_size=1,
        max_size=20,
    )
)
def test_severity_rank_total_order(spark, values):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "i int, v string")
    got = {r["i"]: r["r"] for r in df.select("i", fn.severity_rank("v").alias("r")).collect()}
    for i, v in enumerate(values):
        want = fn.SEVERITY_ORDER.index(v) if v in fn.SEVERITY_ORDER else None
        assert got[i] == want, (v, got[i], want)  # case-sensitive, unknown → null


TEXTY = st.text(
    alphabet=st.sampled_from("abZ9 ,.!#'-\t"), min_size=0, max_size=60
)


@settings(max_examples=10, deadline=None)
@given(st.lists(TEXTY, min_size=1, max_size=20))
def test_bpe_ish_tokens_match_python_re(spark, texts):
    import re

    pat = re.compile(text_ops.BPE_ISH_PATTERN)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", text_ops.bpe_ish_tokens("t").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == pat.findall(t), (t, got[i])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
        min_size=1,
        max_size=25,
    ),
    st.lists(
        st.tuples(
            st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
            st.floats(min_value=0, max_value=50, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=10,
    ),
    st.sampled_from([0.5, 3.0, 17.0, 64.0]),
)
def test_banded_range_join_equals_naive_theta_join(spark, points, intervals, width):
    """The band rewrite is a pure plan transformation: for ANY points,
    intervals (lo = a, hi = a + span >= lo), and band width, its output
    must equal the naive crossJoin + containment filter row-for-row."""
    from traffic_accidents_airflow_kafka_spark.operators.rangejoin import (
        banded_range_join,
    )

    p = spark.createDataFrame([(float(x),) for x in points], "p double")
    iv = spark.createDataFrame(
        [(i, float(lo), float(lo) + float(span)) for i, (lo, span) in enumerate(intervals)],
        "iv long, lo double, hi double",
    )
    got = sorted(
        (r["p"], r["iv"])
        for r in banded_range_join(p, iv, "p", "lo", "hi", band_width=width).collect()
    )
    want = sorted(
        (r["p"], r["iv"])
        for r in p.crossJoin(iv)
        .filter((F.col("p") >= F.col("lo")) & (F.col("p") < F.col("hi")))
        .collect()
    )
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=700), min_size=1, max_size=30),
    st.sampled_from([16, 256, 512]),
)
def test_pack_sequences_matches_python_packer(spark, token_counts, seq_len):
    """pack_sequences vs a straight-line Python reference packer:
    identical spans, offsets, split flags for any token stream."""
    from traffic_accidents_airflow_kafka_spark.operators import sampling

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(token_counts)], "doc_id long, n_tokens long"
    )
    got = sorted(
        (r["doc_id"], r["seq_id"], r["offset"], r["span_tokens"], r["is_split"])
        for r in sampling.pack_sequences(df, "doc_id", "n_tokens", seq_len).collect()
    )
    want = []
    start = 0
    for i, n in enumerate(token_counts):
        end = start + n
        if n > 0:
            first, last = start // seq_len, (end - 1) // seq_len
            for s in range(first, last + 1):
                lo, hi = max(start, s * seq_len), min(end, (s + 1) * seq_len)
                want.append((i, s, lo - s * seq_len, hi - lo, last > first))
        start = end
    assert got == sorted(want)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=10**9), min_size=1, max_size=12, unique=True
    )
)
def test_temperature_mixture_shares_normalize(spark, token_counts):
    from traffic_accidents_airflow_kafka_spark.operators import sampling

    df = spark.createDataFrame(
        [(f"g{i}", n) for i, n in enumerate(token_counts)],
        "source string, tokens long",
    )
    rows = sampling.temperature_mixture(df, "source", "tokens", budget=10**6).collect()
    assert abs(sum(r["mix_share"] for r in rows) - 1.0) < 1e-4
    # sqrt temperature: planned share ordering follows token ordering, and
    # every group gets a nonzero plan.
    by_tok = sorted(rows, key=lambda r: r["tokens"])
    shares = [r["mix_share"] for r in by_tok]
    assert shares == sorted(shares)
    assert all(r["planned_tokens"] > 0 for r in rows)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.text(alphabet="abcd ", min_size=1, max_size=20), min_size=1, max_size=8),
    st.lists(st.text(alphabet="abcd ", min_size=1, max_size=20), min_size=1, max_size=8),
)
def test_bloom_dedup_never_false_negative(spark, hist_texts, inc_texts):
    """Any incoming text present in history MUST be flagged duplicate —
    bloom pruning can cost extra work (false positives) but can never
    change the answer, even with a pathologically tiny filter."""
    from traffic_accidents_airflow_kafka_spark.operators import dedup as dd

    hist = spark.createDataFrame(
        [(i, t) for i, t in enumerate(hist_texts)], "doc_id long, text string"
    )
    inc = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(inc_texts)], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["is_duplicate"]
        for r in dd.bloom_incremental_dedup(
            inc, hist, "doc_id", "text", m_bits=8, k=2
        ).collect()
    }
    hset = set(hist_texts)
    for i, t in enumerate(inc_texts):
        assert out[100 + i] == (t in hset)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=6,
    ),
    st.lists(
        st.lists(st.sampled_from("abc"), min_size=2, max_size=2).map(" ".join),
        min_size=0,
        max_size=3,
    ),
)
def test_excise_spans_matches_python_reference(spark, texts, flagged):
    """Greedy left-to-right 2-gram excision vs a straight-line Python
    scan over arbitrary tiny-alphabet docs and span lists."""
    from traffic_accidents_airflow_kafka_spark.operators import decontam

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(s,) for s in set(flagged)] or [("never-matches-xx",)], "span string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_excised_spans"])
        for r in decontam.excise_spans(docs, spans, "doc_id", "text", n=2).collect()
    }
    spanset = set(flagged)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        kept, j, removed = [], 0, 0
        while j < len(toks):
            if j + 2 <= len(toks) and " ".join(toks[j : j + 2]) in spanset:
                removed += 1
                j += 2
            else:
                kept.append(toks[j])
                j += 1
        assert got[i] == (" ".join(kept), removed), (t, flagged, got[i])


LATS = st.floats(min_value=25.0, max_value=49.0, allow_nan=False)
LONS = st.floats(min_value=-124.0, max_value=-67.0, allow_nan=False)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(LATS, LONS), min_size=1, max_size=20),
    st.lists(st.tuples(LATS, LONS), min_size=1, max_size=4),
    st.floats(min_value=1.0, max_value=200.0, allow_nan=False),
)
def test_radius_join_equals_bruteforce(spark, pts, cens, r_km):
    """Grid-candidate radius join returns EXACTLY the brute-force
    haversine pair set for random continental-US coordinates — the
    conservative cell sizing may only add candidates, never lose pairs."""
    from traffic_accidents_airflow_kafka_spark.operators import geo

    from .test_geo import _hav_py as hav  # single shared brute-force reference

    pdf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(pts)],
        "pid long, lat double, lon double",
    )
    cdf = spark.createDataFrame(
        [(i, la, lo) for i, (la, lo) in enumerate(cens)],
        "cid long, c_lat double, c_lon double",
    )
    got = {(r["pid"], r["cid"]) for r in geo.radius_join(pdf, cdf, r_km).collect()}
    want = {
        (i, j)
        for i, (pla, plo) in enumerate(pts)
        for j, (cla, clo) in enumerate(cens)
        if hav(pla, plo, cla, clo) <= r_km
    }
    # The operator rounds distance_km to 6 decimals before the <= r_km
    # comparison, so a pair landing within half an ulp of the boundary
    # may flip vs the unrounded brute force: any disagreement must sit
    # within 1e-5 km of the radius — everything else is a real miss.
    for pid, cid in got.symmetric_difference(want):
        d = hav(*pts[pid], *cens[cid])
        assert abs(d - r_km) < 1e-5, (pid, cid, d, r_km)


def _spans_reference(docs: list[tuple[int, str]], k: int, min_docs: int):
    """Brute-force repeated_spans: literal k-gram strings, dict support
    counting, linear gaps-and-islands merge (gap <= k fuses)."""
    from collections import defaultdict

    occ = {}
    support = defaultdict(set)
    for did, text in docs:
        words = text.split(" ")
        positions = []
        for i in range(len(words) - k + 1):
            gram = " ".join(words[i : i + k])
            support[gram].add(did)
            positions.append((i + 1, gram))
        occ[did] = positions
    out = []
    for did, positions in occ.items():
        dup = [
            (pos, len(support[g])) for pos, g in positions
            if len(support[g]) >= min_docs
        ]
        run: list[tuple[int, int]] = []
        for pos, nd in dup:
            if run and pos - run[-1][0] <= k:
                run.append((pos, nd))
            else:
                if run:
                    out.append(_close_run(did, run, k))
                run = [(pos, nd)]
        if run:
            out.append(_close_run(did, run, k))
    return sorted(out)


def _close_run(did, run, k):
    start = run[0][0]
    end = run[-1][0] + k - 1
    return (did, start, end, end - start + 1, max(nd for _, nd in run))


@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=15, deadline=None)
def test_repeated_spans_matches_python_reference(spark, texts):
    """repeated_spans over random tiny-alphabet docs (duplicate grams are
    likely) equals the brute-force string-gram reference: same docs, same
    span bounds, same coverage, same support."""
    from traffic_accidents_airflow_kafka_spark.operators import dedup

    k = 3
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (
            r["doc_id"],
            r["span_start"],
            r["span_end"],
            r["span_tokens"],
            r["max_doc_support"],
        )
        for r in dedup.repeated_spans(df, "doc_id", "text", k=k).collect()
    )
    assert got == _spans_reference(docs, k, 2)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(  # change log: (key in 0..4, value, op) with unique seqs
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.text(alphabet=st.sampled_from("xyz"), min_size=1, max_size=3),
            st.sampled_from(["u", "u", "d"]),
        ),
        min_size=1,
        max_size=12,
    ),
    st.randoms(use_true_random=False),
)
def test_versioned_cdc_merge_matches_python_lww(spark, changes, rnd):
    """apply_changes_versioned over ANY batching and ANY batch order of
    a change log converges to the Python last-writer-wins reference —
    the algebraic property (max-seq merge with tombstones is a
    commutative, idempotent monoid action) that makes the streaming CDC
    sink correct under at-least-once, unordered delivery."""
    from traffic_accidents_airflow_kafka_spark.operators.scd import (
        apply_changes_versioned,
        current_state,
    )

    schema = "k long, v string, seq long, op string"
    log = [(k, v, seq, op) for seq, (k, v, op) in enumerate(changes)]

    # Python reference: highest seq per key wins; deletes remove.
    want: dict[int, tuple[str, int]] = {}
    for k, v, seq, op in log:  # seq ascending
        if op == "d":
            want.pop(k, None)
        else:
            want[k] = (v, seq)

    # Random batching, then random application order.
    shuffled = list(log)
    rnd.shuffle(shuffled)
    n_batches = rnd.randint(1, min(4, len(shuffled)))
    batches = [shuffled[i::n_batches] for i in range(n_batches)]
    state = spark.createDataFrame([], schema)
    for b in batches:
        state = apply_changes_versioned(
            state, spark.createDataFrame(b, schema), ["k"], "seq", "op"
        )
    got = {
        r["k"]: (r["v"], r["seq"])
        for r in current_state(state, "op").collect()
    }
    assert got == want


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=16),
    pixels=st.binary(min_size=0, max_size=96),
)
def test_pixel_codec_roundtrip_property(w, h, pixels):
    """r9-r10 full pixel decode, property-tested without Spark: for ANY
    dimensions and ANY pixel source, encode (PNG filter-0, PNG with the
    varied per-row filter rotation, bottom-up palettized BMP, LZW GIF)
    → decode reproduces exactly the tiled raster, replicated to
    canonical RGB — the algebraic inverse relation the planted
    round-trip test checks at fixed sizes. Exercises every PNG filter
    type (h >= 5 rotates through all five), BMP 4-byte row padding
    (w % 4 != 0), GIF variable-width code growth, and the empty pixel
    source (zero-fill)."""
    from traffic_accidents_airflow_kafka_spark.operators import multimodal

    tiled = multimodal._tile(pixels, w * h)
    for payload in (
        multimodal.encode_png(w, h, pixels),
        multimodal.encode_png(w, h, pixels, filters="varied"),
        multimodal.encode_bmp(w, h, pixels),
        multimodal.encode_png(w, h, pixels, filters="varied", interlace=True),
        multimodal.encode_gif(w, h, pixels),
        multimodal.encode_gif(w, h, pixels, interlace=True),
    ):
        dw, dh, c, rgb = multimodal.decode_image_pixels(payload)
        assert (dw, dh, c) == (w, h, 3)
        assert rgb[0::3] == tiled
        assert rgb[1::3] == tiled
        assert rgb[2::3] == tiled


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=80),
    h=st.integers(min_value=1, max_value=40),
    level=st.integers(min_value=0, max_value=255),
)
def test_jpeg_flat_codec_roundtrip_property(w, h, level):
    """The flat-JPEG pair (r10): for ANY dims and gray level, encode →
    DC-only decode yields exactly the lossily-reconstructed constant
    raster 2*round_half_even((level-128)/2) + 128 clamped to 8 bits —
    pinning the quantizer round-trip (quant 16 ⇒ halves at odd deltas,
    resolved banker's on both sides), multi-block DC-diff chains, the
    255→256 clamp, 0xFF byte-stuffing, and non-multiple-of-8 crops."""
    from traffic_accidents_airflow_kafka_spark.operators import multimodal

    payload = multimodal.encode_jpeg_flat(w, h, level)
    dw, dh, c, rgb = multimodal.decode_image_pixels(payload)
    assert (dw, dh, c) == (w, h, 3)
    exp = min(255, max(0, 2 * round((level - 128) / 2) + 128))
    assert set(rgb) == {exp}


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=32),
    h=st.integers(min_value=1, max_value=24),
    pixels=st.binary(min_size=0, max_size=96),
)
def test_jpeg_full_codec_error_bound_property(w, h, pixels):
    """The arbitrary-content JPEG codec (r10): for ANY dims and ANY
    pixel source, encode at quant 1 → decode reconstructs every pixel
    within 5 gray levels (the analytic ceiling: 64 coefficient
    roundings of ≤ 0.5 weighted by the DCT basis column sums ≈ 3.5,
    plus the final pixel rounding ≤ 0.5 — typically ≤ 2 in practice).
    Exercises DC-diff chains across blocks, EOB/ZRL emission, size
    categories, byte stuffing, and edge-replication padding for
    non-multiple-of-8 dims."""
    from traffic_accidents_airflow_kafka_spark.operators import multimodal

    tiled = multimodal._tile(pixels, w * h)
    dw, dh, c, rgb = multimodal.decode_image_pixels(
        multimodal.encode_jpeg(w, h, pixels, quant=1)
    )
    assert (dw, dh, c) == (w, h, 3)
    assert rgb[1::3] == rgb[0::3] and rgb[2::3] == rgb[0::3]
    assert max(abs(a - b) for a, b in zip(rgb[0::3], tiled)) <= 5

    # the 4:4:4 color path on the same source bytes: BT.601 both ways
    # roughly doubles the coefficient-rounding ceiling
    ctiled = multimodal._tile(pixels, w * h * 3)
    dw, dh, c, crgb = multimodal.decode_image_pixels(
        multimodal.encode_jpeg(w, h, pixels, quant=1, color="rgb")
    )
    assert (dw, dh, c) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(crgb, ctiled)) <= 10

    # the 4:2:0 subsampled path on gray-valued RGB: constant chroma
    # makes the 2x2 decimation lossless, so ANY pixel source must
    # survive the 4-luma-blocks-per-MCU geometry within the gray bound
    gsrc = bytes(b for px in tiled for b in (px, px, px))
    dw, dh, c, srgb = multimodal.decode_image_pixels(
        multimodal.encode_jpeg(w, h, gsrc, quant=1, color="rgb420")
    )
    assert (dw, dh, c) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(srgb, gsrc)) <= 6


@settings(max_examples=20, deadline=None)
@given(data=st.binary(min_size=0, max_size=6000))
def test_gif_lzw_codec_roundtrip_property(data):
    """The GIF LZW pair in isolation, on ARBITRARY byte streams (not
    just rasters): encode → decode is the identity, including streams
    long/noisy enough to drive variable-width code growth and — for
    incompressible streams past ~3800 novel phrases — the 4096
    table-reset path. The deterministic large-random-raster test in
    test_llm_operators pins the reset path unconditionally."""
    from traffic_accidents_airflow_kafka_spark.operators import multimodal

    enc = multimodal._lzw_encode_gif(data, 8)
    assert bytes(multimodal._lzw_decode_gif(enc, 8, len(data))) == data


def _suffix_block_spans(docs: dict[int, list[str]], k: int, min_docs: int):
    """Test-only SUFFIX-ARRAY reference for repeated-span mining (r10,
    VERDICT r9 #6): sort every token suffix lexicographically; suffixes
    sharing a k-token prefix form a contiguous block (boundaries where
    the adjacent common prefix drops below k — the LCP-interval idiom);
    a block whose members span >= min_docs DISTINCT docs marks its
    members' k windows as duplicated coverage; maximal runs of covered
    token positions per doc are the spans. A different algorithm from
    the operator's hash-group (value-grouped gram counts) — sorted
    blocks vs hashes — so agreement is evidence, not tautology.

    Returns {doc: sorted list of (start, end, tokens, max_support)}
    with 1-based inclusive token positions."""
    sufs = sorted(
        (tuple(toks[p:]), d, p)
        for d, toks in docs.items()
        for p in range(len(toks) - k + 1)
    )
    # Block walk: adjacent suffixes stay in one block while their
    # common prefix is >= k tokens.
    blocks, cur = [], []
    for s in sufs:
        if cur and cur[-1][0][:k] != s[0][:k]:
            blocks.append(cur)
            cur = []
        cur.append(s)
    if cur:
        blocks.append(cur)
    covered: dict[int, dict[int, int]] = {d: {} for d in docs}  # pos -> support
    for blk in blocks:
        support = len({d for _, d, _ in blk})
        if support < min_docs:
            continue
        for _, d, p in blk:
            for t in range(p, p + k):
                covered[d][t] = max(covered[d].get(t, 0), support)
    out: dict[int, list[tuple[int, int, int, int]]] = {}
    for d, pos_sup in covered.items():
        runs, run = [], []
        for t in sorted(pos_sup):
            if run and t != run[-1] + 1:
                runs.append(run)
                run = []
            run.append(t)
        if run:
            runs.append(run)
        out[d] = [
            (r[0] + 1, r[-1] + 1, len(r), max(pos_sup[t] for t in r))
            for r in runs
        ]
    return out


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=24),
        min_size=2,
        max_size=5,
    ),
    k=st.sampled_from([2, 3, 4]),
)
def test_repeated_spans_match_suffix_array_reference(spark, data, k):
    """repeated_spans == the suffix-array reference on arbitrary small
    corpora: the k-gram union-of-windows construction reports EXACTLY
    the token positions lying inside a cross-doc repeated substring of
    length >= k (see _suffix_block_spans), with identical span
    boundaries, token counts, and max doc support. The documented miss
    class — repeats SHORTER than k — is pinned by the deterministic
    test below, not here (the reference shares the >= k floor)."""
    from traffic_accidents_airflow_kafka_spark.operators import dedup

    docs = {i: toks for i, toks in enumerate(data)}
    df = spark.createDataFrame(
        [(d, " ".join(toks)) for d, toks in docs.items()],
        "doc_id long, text string",
    )
    got: dict[int, list] = {d: [] for d in docs}
    for r in dedup.repeated_spans(df, "doc_id", "text", k=k, min_docs=2).collect():
        got[r["doc_id"]].append(
            (r["span_start"], r["span_end"], r["span_tokens"], r["max_doc_support"])
        )
    want = _suffix_block_spans(docs, k, min_docs=2)
    for d in docs:
        assert sorted(got[d]) == sorted(want[d]), (d, got[d], want[d], data, k)


def test_repeated_spans_miss_class_is_exactly_sub_k(spark):
    """The approximation bound, stated and pinned (VERDICT r9 #6): a
    cross-doc repeat of k-1 tokens is INVISIBLE to k-gram mining (no
    complete k-window repeats), while the same repeat at k tokens is
    reported in full — the under-report class is exactly repeats
    shorter than k, nothing subtler."""
    from traffic_accidents_airflow_kafka_spark.operators import dedup

    k = 4
    short = ["x1", "x2", "x3"]          # k-1 shared tokens
    exact = ["y1", "y2", "y3", "y4"]    # exactly k shared tokens
    rows = [
        (0, " ".join(["u0"] + short + ["u1"] + exact + ["u2"])),
        (1, " ".join(["v0", "v1"] + short + ["v2"] + exact)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in dedup.repeated_spans(df, "doc_id", "text", k=k, min_docs=2).collect()
    }
    # doc 0: tokens are u0(1) x1 x2 x3(4) u1(5) y1(6)..y4(9) u2(10)
    # doc 1: v0 v1(2) x1(3) x2 x3(5) v2(6) y1(7)..y4(10)
    assert spans == {(0, 6, 9), (1, 7, 10)}, spans


@settings(max_examples=12, deadline=None)
@given(
    data=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd ee", "Xx!"]),
            min_size=1,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    ),
    max_df=st.sampled_from([1, 2, 3]),
)
def test_line_dedup_matches_python_reference(spark, data, max_df):
    """line_dedup vs a straight-line Python reference on arbitrary
    small corpora: identical drop decisions (per-line document
    frequency > threshold), identical order-preserving reassembly, and
    identical char accounting — including docs reduced to the empty
    string and corpora where every line survives."""
    from collections import Counter

    from traffic_accidents_airflow_kafka_spark.operators import dedup

    docs = {i: lines for i, lines in enumerate(data)}
    df = spark.createDataFrame(
        [(d, "\n".join(ls)) for d, ls in docs.items()],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in dedup.line_dedup(
            df, "doc_id", "text", sep="\n", max_doc_freq=max_df
        ).collect()
    }
    support = Counter()
    for ls in docs.values():
        for line in set(ls):
            support[line] += 1
    for d, ls in docs.items():
        kept = [x for x in ls if support[x] <= max_df]
        clean = "\n".join(kept)
        r = got[d]
        assert r["n_lines"] == len(ls)
        assert r["n_dropped"] == len(ls) - len(kept)
        assert r["clean_text"] == clean
        assert r["chars_before"] == len("\n".join(ls))
        assert r["chars_after"] == len(clean)
