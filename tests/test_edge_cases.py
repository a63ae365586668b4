"""Edge-case robustness: empty inputs, degenerate groups, null keys —
the operators must degrade gracefully, not throw (SURVEY §5 unit layer)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gcp_etl_spark.llm.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
)
from gcp_etl_spark.llm.similarity import cosine_topk
from gcp_etl_spark.operators.asof import asof_join
from gcp_etl_spark.operators.topk import top_k, top_k_per_group

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_minhash_empty_input(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert minhash_near_duplicates(empty, "doc_id", "text").count() == 0


def test_minhash_short_and_identical_docs(spark):
    # docs shorter than the shingle width + exact twins
    df = spark.createDataFrame(
        [(1, "one two"), (2, "one two"), (3, "x"), (4, "totally different words here")],
        DOC_SCHEMA,
    )
    pairs = minhash_near_duplicates(df, "doc_id", "text", threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}
    assert all(r["jaccard"] == 1.0 for r in pairs)


def test_simhash_empty_and_single(spark):
    empty = spark.createDataFrame([], DOC_SCHEMA)
    assert simhash_near_duplicates(empty, "doc_id", "text").count() == 0
    one = spark.createDataFrame([(1, "hello world")], DOC_SCHEMA)
    assert simhash_near_duplicates(one, "doc_id", "text").count() == 0


def test_cosine_topk_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    out = cosine_topk(emb, emb, k=10)
    # each query gets all others (2), never padded or duplicated
    assert out.count() == 6
    assert out.filter(F.col("rn") > 2).count() == 0


def test_topk_empty_and_small(spark):
    empty = spark.range(0).withColumn("v", F.col("id"))
    assert top_k(empty, [F.col("v")], 5).count() == 0
    small = spark.range(2).withColumn("v", F.col("id"))
    assert top_k(small, [F.col("v").desc()], 5).count() == 2
    assert top_k_per_group(small, ["v"], [F.col("id")], 3).count() == 2


def test_asof_join_empty_right(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1))], "lid long, k string, lts timestamp"
    )
    right = spark.createDataFrame([], "k string, rts timestamp, v double")
    out = asof_join(left, right, ["k"], ["k"], "lts", "rts", how="left")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["v"] is None


def test_asof_join_null_keys(spark):
    import datetime as dt

    left = spark.createDataFrame(
        [(1, None, dt.datetime(2024, 1, 2)), (2, "a", dt.datetime(2024, 1, 2))],
        "lid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [("a", dt.datetime(2024, 1, 1), 9.0)], "k string, rts timestamp, v double"
    )
    out = {r["lid"]: r["v"] for r in
           asof_join(left, right, ["k"], ["k"], "lts", "rts", how="left").collect()}
    # null key never matches (SQL equality semantics), row is kept
    assert out == {1: None, 2: 9.0}


def test_stateful_running_totals_batch_vs_stream(spark, tmp_path):
    """applyInPandasWithState (custom stateful op) must agree with its
    batch fallback on a single micro-batch."""
    from gcp_etl_spark.streaming.windows import stateful_running_totals
    from gcp_etl_spark.tables import t
    from tests.conftest import SF_SMALL

    ev = t(spark, SF_SMALL, "events")
    d = str(tmp_path / "ev")
    ev.coalesce(1).write.mode("overwrite").parquet(d)
    batch = stateful_running_totals(spark.read.schema(ev.schema).parquet(d))
    stream = stateful_running_totals(spark.readStream.schema(ev.schema).parquet(d))
    assert stream.isStreaming
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql(
        "SELECT user_id, max_by(n_events, n_events) AS n_events,"
        " max_by(total_cents, n_events) AS total_cents"
        " FROM stateful_out GROUP BY user_id"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_scratch_sweeps_stale_roots(tmp_path, monkeypatch):
    """r7 verdict What's-wrong #4: a SIGKILLed run strands its scratch
    root (atexit never fires); the next process's first scratch_dir
    call must sweep roots older than a day and leave young ones."""
    import os
    import time

    import gcp_etl_spark.scratch as S

    monkeypatch.setattr("tempfile.gettempdir", lambda: str(tmp_path))
    monkeypatch.setattr(
        "tempfile.mkdtemp",
        lambda prefix: os.makedirs(tmp_path / (prefix + "live")) # type: ignore[func-returns-value]
        or str(tmp_path / (prefix + "live")),
    )
    stale = tmp_path / "gcp_etl_scratch_dead"
    young = tmp_path / "gcp_etl_scratch_recent"
    other = tmp_path / "unrelated_dir"
    for d in (stale, young, other):
        d.mkdir()
    old = time.time() - 2 * 24 * 3600
    os.utime(stale, (old, old))

    monkeypatch.setattr(S, "_root", None)
    S.scratch_dir("probe")
    assert not stale.exists(), "stale root not swept"
    assert young.exists(), "young root must survive (may be live)"
    assert other.exists(), "non-scratch dirs must never be touched"
