"""Out-of-fold target encoding: leakage property and row-level join
pinned against an independent pandas computation."""

from __future__ import annotations

import hashlib

import pytest

from traffic_accidents_airflow_kafka_spark.operators import encoding

ROWS = [
    # (id, cat, target)
    (1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "a", 40.0),
    (5, "b", 100.0), (6, "b", 200.0), (7, "b", 300.0),
    (8, "c", 5.0),
]
K, M, SEED = 3, 2.0, "te-test-v1"


def _ref_fold(row_id: int) -> int:
    h = hashlib.md5(f"{SEED}|{row_id}".encode()).hexdigest()
    return int(h[:13], 16) % K


def _ref_encoding():
    g = sum(t for _, _, t in ROWS) / len(ROWS)
    cells: dict[tuple[str, int], list[float]] = {}
    for rid, cat, t in ROWS:
        cells.setdefault((cat, _ref_fold(rid)), []).append(t)
    cats: dict[str, list[float]] = {}
    for rid, cat, t in ROWS:
        cats.setdefault(cat, []).append(t)
    out = {}
    for (cat, fold), vals in cells.items():
        s_c, n_c = sum(cats[cat]), len(cats[cat])
        s_cf, n_cf = sum(vals), len(vals)
        out[(cat, fold)] = (s_c - s_cf + M * g) / (n_c - n_cf + M)
    return out


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, "id LONG, cat STRING, target DOUBLE")


def test_oof_table_matches_reference(spark, df):
    got = {
        (r["category"], r["fold"]): (r["n_rows"], r["oof_encoding"])
        for r in encoding.oof_encoding_table(
            df, "cat", "target", "id", k=K, smoothing=M, seed=SEED
        ).collect()
    }
    ref = _ref_encoding()
    assert set(got) == set(ref)
    for cell, te in ref.items():
        n, got_te = got[cell]
        assert got_te == pytest.approx(te, abs=1e-12), cell
    # every encoding must EXCLUDE its own fold: a cell holding the
    # category's max value must encode strictly below the naive
    # own-fold-included mean when smoothing pulls down — spot-check 'b'
    b_cells = {f: got[("b", f)][1] for (c, f) in got if c == "b"}
    for f, te in b_cells.items():
        own = [t for rid, c, t in ROWS if c == "b" and _ref_fold(rid) == f]
        included_mean = sum(t for _, c, t in ROWS if c == "b") / 3
        if own:  # removing the fold's own values must move the mean
            assert te != pytest.approx(included_mean)


def test_encode_rows_attaches_cell_value(spark, df):
    enc_rows = encoding.encode_rows(
        df, "cat", "target", "id", k=K, smoothing=M, seed=SEED
    ).collect()
    assert len(enc_rows) == len(ROWS)
    ref = _ref_encoding()
    for r in enc_rows:
        assert r["te_cat"] == pytest.approx(
            ref[(r["cat"], _ref_fold(r["id"]))], abs=1e-12
        )


def test_folds_are_deterministic_and_in_range(spark, df):
    rows = df.select(
        "id", encoding.fold_assign("id", K, SEED).alias("fold")
    ).collect()
    for r in rows:
        assert r["fold"] == _ref_fold(r["id"])
        assert 0 <= r["fold"] < K


def test_encode_rows_null_category_falls_back_to_global_mean(spark):
    """NULL-keyed rows must survive the transform (row count preserved)
    with the smoothed-global-mean fallback, not silently drop."""
    rows = ROWS + [(9, None, 50.0)]
    df = spark.createDataFrame(rows, "id LONG, cat STRING, target DOUBLE")
    out = encoding.encode_rows(df, "cat", "target", "id", k=K, smoothing=M, seed=SEED)
    got = {r["id"]: r["te_cat"] for r in out.collect()}
    assert len(got) == len(rows)  # nothing dropped
    gmean = sum(t for _, _, t in rows) / len(rows)
    assert got[9] == pytest.approx(gmean, abs=1e-9)
    # non-null rows keep their out-of-fold cell encodings (now computed
    # over the corpus INCLUDING the null-category row's target in gmean)
    assert all(v is not None for v in got.values())
