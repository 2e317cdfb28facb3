"""Python-extension surface (plans/pyext.py): the UDTF is pinned
row-for-row against the native shingle path, the applyInArrow Gini against
a driver-side brute force, and the ORC/JSONL round-trips against the
exact rows that were written. Oracle value-hash parity for all four
queries is covered by test_catalog_oracle.py like every other entry."""

from __future__ import annotations

import pyspark.sql.functions as F

from traffic_accidents_airflow_kafka_spark.functions.udtf import register_udtfs
from traffic_accidents_airflow_kafka_spark.operators.dedup import word_shingles
from traffic_accidents_airflow_kafka_spark.plans import pyext
from traffic_accidents_airflow_kafka_spark.sources.tables import load_table


def test_udtf_matches_native_shingles(spark, sf_dir):
    """WordNGrams(_, 3) distinct == operators/dedup.py:word_shingles —
    the built-in referee for the UDTF's expansion semantics."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    register_udtfs(spark)
    docs.createOrReplaceTempView("udtf_parity_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, t.ngram AS shingle
        FROM udtf_parity_docs d, LATERAL word_ngrams(d.text, 3) t
        """
    ).distinct()
    native = word_shingles(docs, "doc_id", "text", n=3)
    assert via_udtf.exceptAll(native).count() == 0
    assert native.exceptAll(via_udtf).count() == 0


def test_udtf_positions_are_dense(spark, sf_dir):
    """Positions enumerate every window 0..len-n with no gaps — per doc,
    count == max_pos + 1 and min_pos == 0."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    register_udtfs(spark)
    docs.createOrReplaceTempView("udtf_pos_docs")
    bad = spark.sql(
        """
        SELECT d.doc_id
        FROM udtf_pos_docs d, LATERAL word_ngrams(d.text, 3) t
        GROUP BY d.doc_id
        HAVING COUNT(*) != MAX(t.pos) + 1 OR MIN(t.pos) != 0
        """
    )
    assert bad.count() == 0


def test_udtf_null_and_short_inputs(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, None), (2, "one two"), (3, "a b c d")], "id int, txt string"
    )
    df.createOrReplaceTempView("udtf_edge_docs")
    out = spark.sql(
        """
        SELECT d.id, t.ngram
        FROM udtf_edge_docs d, LATERAL word_ngrams(d.txt, 3) t
        """
    ).collect()
    # null text and a 2-token doc expand to nothing; the 4-token doc to 2.
    assert sorted((r.id, r.ngram) for r in out) == [
        (3, "a b c"),
        (3, "b c d"),
    ]


def test_gini_matches_bruteforce(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("lang", "n_chars")
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_chars)
    got = {r.lang: r for r in pyext.lang_length_gini(spark, sf_dir).collect()}
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        xs = sorted(xs)
        n, s = len(xs), sum(xs)
        w = sum((i + 1) * x for i, x in enumerate(xs))
        expect = 2.0 * w / (n * float(s)) - (n + 1.0) / n
        assert got[lang].n_docs == n
        assert got[lang].total_chars == s
        assert abs(got[lang].gini - expect) <= 1e-4, lang
        # Gini is a [0, 1) inequality index.
        assert 0.0 <= got[lang].gini < 1.0


def test_orc_roundtrip_preserves_rows(spark, sf_dir):
    """Beyond the aggregate oracle: the ORC scan returns exactly the rows
    written, column-for-column (timestamps included)."""
    pyext.orc_roundtrip_summary(spark, sf_dir).collect()  # runs the write
    events = load_table(spark, sf_dir, "events")
    derived = events.filter(
        F.col("event_type").isin("purchase", "click")
    ).select("event_id", "ts", "user_id", "event_type", "value")
    back = spark.read.orc(pyext.ORC_ROUNDTRIP_PATH).select(*derived.columns)
    assert back.exceptAll(derived).count() == 0
    assert derived.exceptAll(back).count() == 0


def test_jsonl_roundtrip_preserves_rows(spark, sf_dir):
    pyext.jsonl_roundtrip_summary(spark, sf_dir).collect()  # runs the write
    events = load_table(spark, sf_dir, "events")
    derived = events.filter(F.col("event_type") == "error").select(
        "event_id",
        "user_id",
        "event_type",
        F.col("value").cast("double").alias("value"),
        F.date_format("ts", pyext._TS_FMT_SPARK).alias("ts_str"),
    )
    back = spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, "
        "value double, ts_str string"
    ).json(pyext.JSONL_ROUNDTRIP_PATH)
    assert back.exceptAll(derived).count() == 0
    assert derived.exceptAll(back).count() == 0


def test_compaction_plan_semantics(spark):
    """Planner invariants on a hand-built manifest: every file assigned
    exactly once, groups contiguous in file order, each group under
    target + one file's overflow, group ids dense from 0."""
    from traffic_accidents_airflow_kafka_spark.operators.layout import (
        compaction_plan,
    )

    sizes = [500, 1200, 50, 50, 900, 2100, 10, 400, 800, 300]
    manifest = spark.createDataFrame(
        [(f"f{i:03d}", s) for i, s in enumerate(sizes)],
        "file string, n_rows int",
    )
    target = 1000
    plan = compaction_plan(manifest, target_rows=target).orderBy("file")
    rows = plan.collect()
    assert [r.file for r in rows] == [f"f{i:03d}" for i in range(len(sizes))]
    # Group of each file = floor(exclusive-prefix-sum / target).
    cum = 0
    for r in rows:
        assert r.grp == cum // target, r
        cum += r.n_rows
    grps = [r.grp for r in rows]
    assert grps == sorted(grps), "groups must be contiguous in file order"
    assert grps[0] == 0
    # An oversized file (2100 > target) legitimately advances the group
    # counter past intermediate ids — ids are monotone, not dense.
    # Groups holding >1 file must have started BELOW the target (a file
    # only joins a group whose prior fill is < target).
    fill: dict[int, int] = {}
    for r in rows:
        if r.grp in fill:
            assert fill[r.grp] < target, (r.grp, fill[r.grp])
        fill[r.grp] = fill.get(r.grp, 0) + r.n_rows


def test_compaction_plan_rejects_bad_target(spark):
    from traffic_accidents_airflow_kafka_spark.operators.layout import (
        compaction_plan,
    )

    manifest = spark.createDataFrame([("f", 1)], "file string, n_rows int")
    import pytest

    with pytest.raises(ValueError):
        compaction_plan(manifest, target_rows=0)


def test_file_manifest_counts_real_files(spark, sf_dir, tmp_path):
    """file_manifest's per-file counts equal the actual rows written."""
    from traffic_accidents_airflow_kafka_spark.operators.layout import (
        file_manifest,
    )

    path = str(tmp_path / "manifest_src")
    events = load_table(spark, sf_dir, "events")
    events.select("event_id", (F.col("user_id") % 3).alias("b")).write.mode(
        "overwrite"
    ).partitionBy("b").parquet(path)
    man = file_manifest(spark, path)
    total = man.agg(F.sum("n_rows")).collect()[0][0]
    assert total == events.count()
    for r in man.collect():
        assert r.file.startswith("/"), "scheme must be stripped"
        assert r.n_rows > 0


def test_pyds_writer_two_phase_protocol(spark, tmp_path):
    """Protocol-level: staged shards publish only via commit; abort and
    orphan cleanup leave the published directory consistent."""
    import json
    import os

    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from traffic_accidents_airflow_kafka_spark.sources.pyds import (
        AuditJsonWriter,
    )

    path = str(tmp_path / "sink")
    schema = StructType.fromDDL("id bigint, name string")
    w = AuditJsonWriter({"path": path}, schema, overwrite=False)

    msg1 = w.write(iter([Row(id=1, name="a"), Row(id=2, name="b")]))
    msg2 = w.write(iter([Row(id=3, name="c")]))
    orphan = w.write(iter([Row(id=99, name="zombie")]))  # "failed attempt"
    assert sorted(os.listdir(path)) == ["_staging"]  # nothing published yet

    w.commit([msg1, msg2])  # orphan's message never reaches the driver
    files = sorted(os.listdir(path))
    assert files == ["_MANIFEST.json", "part-00000.json", "part-00001.json"]
    man = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert sum(f["n_rows"] for f in man["files"]) == 3  # zombie rows gone
    lines = []
    for f in files[1:]:
        lines += open(os.path.join(path, f)).read().splitlines()
    assert sorted(json.loads(ln)["id"] for ln in lines) == [1, 2, 3]


def test_pyds_writer_append_preserves_prior_commits(spark, tmp_path):
    """Append mode (overwrite=False): a second commit offsets its part
    index past existing shards and MERGES the manifest — earlier data
    survives (the r5 ADVICE clobber bug)."""
    import json
    import os

    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from traffic_accidents_airflow_kafka_spark.sources.pyds import (
        AuditJsonWriter,
    )

    path = str(tmp_path / "sink")
    schema = StructType.fromDDL("id bigint, name string")
    w1 = AuditJsonWriter({"path": path}, schema, overwrite=False)
    w1.commit(
        [
            w1.write(iter([Row(id=1, name="a"), Row(id=2, name="b")])),
            w1.write(iter([Row(id=3, name="c")])),
        ]
    )

    w2 = AuditJsonWriter({"path": path}, schema, overwrite=False)
    w2.commit([w2.write(iter([Row(id=4, name="d")]))])

    files = sorted(os.listdir(path))
    assert files == [
        "_MANIFEST.json",
        "part-00000.json",
        "part-00001.json",
        "part-00002.json",
    ]
    man = json.load(open(os.path.join(path, "_MANIFEST.json")))
    assert [f["file"] for f in man["files"]] == [
        "part-00000.json",
        "part-00001.json",
        "part-00002.json",
    ]
    assert sum(f["n_rows"] for f in man["files"]) == 4
    ids = []
    for f in files[1:]:
        ids += [
            json.loads(ln)["id"]
            for ln in open(os.path.join(path, f)).read().splitlines()
        ]
    assert sorted(ids) == [1, 2, 3, 4]


def test_pyds_writer_abort_keeps_published(spark, tmp_path):
    import os

    from pyspark.sql import Row
    from pyspark.sql.types import StructType

    from traffic_accidents_airflow_kafka_spark.sources.pyds import (
        AuditJsonWriter,
    )

    path = str(tmp_path / "sink")
    schema = StructType.fromDDL("id bigint, name string")
    w1 = AuditJsonWriter({"path": path}, schema, overwrite=False)
    w1.commit([w1.write(iter([Row(id=1, name="a")]))])
    published = sorted(os.listdir(path))

    w2 = AuditJsonWriter({"path": path}, schema, overwrite=True)
    w2.write(iter([Row(id=2, name="b")]))
    w2.abort([])  # job failed: staging dies, prior dataset intact
    assert sorted(os.listdir(path)) == published


def test_pyds_writer_requires_path(spark):
    import pytest
    from pyspark.sql.types import StructType

    from traffic_accidents_airflow_kafka_spark.sources.pyds import (
        AuditJsonWriter,
    )

    with pytest.raises(ValueError, match="path"):
        AuditJsonWriter({}, StructType.fromDDL("id bigint"), False)
