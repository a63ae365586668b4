"""Managed (manifest-generation) storage: object-store-safe compaction
protocol — crash windows, verification, vacuum (io.py; VERDICT r2 #6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_etl_spark import io


def _dataset(spark, n=500, parts=16):
    return spark.range(n).repartition(parts).select(
        "id", (F.col("id") % 7).alias("k"), (F.col("id") * 1.5).alias("v")
    )


def test_write_read_managed_roundtrip(spark, tmp_path):
    path = str(tmp_path / "managed")
    df = _dataset(spark)
    gen = io.write_managed(df, path)
    assert gen == 0
    assert io.active_generation(path) == 0
    got = io.read_managed(spark, path)
    assert got.count() == 500
    assert got.agg(F.sum("id")).collect()[0][0] == df.agg(F.sum("id")).collect()[0][0]


def test_compact_managed_reduces_files_same_rows(spark, tmp_path):
    path = str(tmp_path / "managed")
    io.write_managed(_dataset(spark, n=2000, parts=32), path)
    before, after = io.compact_managed(spark, path, target_mb=128)
    assert before >= 32 and after < before
    assert io.active_generation(path) == 1
    assert io.read_managed(spark, path).count() == 2000
    # vacuum removed the superseded generation
    gens = [d for d in os.listdir(path) if d.startswith("gen-")]
    assert gens == ["gen-1"]


def test_crash_between_data_write_and_manifest_swap(spark, tmp_path, monkeypatch):
    """The protocol's whole point: a crash AFTER the new generation is
    fully written but BEFORE the manifest swap must leave readers on
    the old generation, and a plain rerun must recover cleanly."""
    path = str(tmp_path / "managed")
    io.write_managed(_dataset(spark, n=1000, parts=24), path)

    real_swap = io._swap_manifest

    def crash_swap(p, gen):
        raise RuntimeError("simulated crash before manifest swap")

    monkeypatch.setattr(io, "_swap_manifest", crash_swap)
    with pytest.raises(RuntimeError, match="simulated crash"):
        io.compact_managed(spark, path, target_mb=128)
    # reader is untouched: still on gen-0, full row count
    assert io.active_generation(path) == 0
    assert io.read_managed(spark, path).count() == 1000
    # the orphan gen-1 exists but is invisible to readers
    assert os.path.isdir(os.path.join(path, "gen-1"))

    # recovery: plain rerun; it rewrites gen-1, verifies, swaps, vacuums
    monkeypatch.setattr(io, "_swap_manifest", real_swap)
    io.compact_managed(spark, path, target_mb=128)
    assert io.active_generation(path) == 1
    assert io.read_managed(spark, path).count() == 1000
    gens = [d for d in os.listdir(path) if d.startswith("gen-")]
    assert gens == ["gen-1"]


def test_crash_during_new_generation_write(spark, tmp_path):
    """A crash mid-write leaves a PARTIAL gen-1 (no _SUCCESS, missing
    parts). Readers never see it (manifest still points at gen-0) and
    the next compaction run overwrites the partial dir wholesale."""
    path = str(tmp_path / "managed")
    io.write_managed(_dataset(spark, n=1000, parts=24), path)
    # fabricate the torn state: a half-written gen-1
    partial = os.path.join(path, "gen-1")
    _dataset(spark, n=1000, parts=4).write.mode("overwrite").parquet(partial)
    os.remove(os.path.join(partial, "_SUCCESS"))
    parts = [f for f in os.listdir(partial) if f.endswith(".parquet")]
    os.remove(os.path.join(partial, parts[0]))

    assert io.active_generation(path) == 0
    assert io.read_managed(spark, path).count() == 1000  # unaffected

    before, after = io.compact_managed(spark, path, target_mb=128)
    assert io.active_generation(path) == 1
    assert io.read_managed(spark, path).count() == 1000
    assert before >= 24 and after <= before


def test_compact_managed_verify_guard(spark, tmp_path, monkeypatch):
    """If the pre-swap row-count verification fails, compact_managed
    must raise, keep the manifest on the old generation, and remove
    the bad candidate dir. Corruption is injected through the
    _verify_generation seam: a part file vanishes between write and
    verify (the torn-write / lost-object case)."""
    path = str(tmp_path / "managed")
    io.write_managed(_dataset(spark, n=600, parts=8), path)

    real_verify = io._verify_generation

    def corrupting_verify(sp, src, dst):
        # the candidate silently lost rows (torn write / lost object)
        n_src, n_dst = real_verify(sp, src, dst)
        return n_src, n_dst - 1

    monkeypatch.setattr(io, "_verify_generation", corrupting_verify)
    with pytest.raises(ValueError, match="verify failed"):
        io.compact_managed(spark, path, target_mb=128)
    assert io.active_generation(path) == 0
    assert io.read_managed(spark, path).count() == 600
    assert not os.path.isdir(os.path.join(path, "gen-1"))


def test_time_travel_reads_prior_generation(spark, tmp_path):
    """VERSION-AS-OF time travel: immutable generations stay readable
    until vacuumed; the manifest only moves the ACTIVE pointer."""
    path = str(tmp_path / "managed_tt")
    g0 = io.write_managed(_dataset(spark, n=100, parts=4), path)
    g1 = io.write_managed(_dataset(spark, n=250, parts=4), path)
    assert (g0, g1) == (0, 1)
    assert io.list_generations(path) == [0, 1]
    # default read = active (gen 1); explicit generation = time travel
    assert io.read_managed(spark, path).count() == 250
    assert io.read_managed(spark, path, generation=0).count() == 100
    # vacuum collapses the horizon to the active generation only
    removed = io.vacuum_managed(path)
    assert removed == ["gen-0"]
    assert io.list_generations(path) == [1]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="generation 0"):
        io.read_managed(spark, path, generation=0)


def test_merge_managed_clauses_and_pre_merge_time_travel(spark, tmp_path):
    """merge_managed (r8 verdict ask #3) applies all three MERGE
    clauses in one generation bump — matched+delete -> gone,
    matched -> source row wins wholesale, unmatched source -> inserted,
    untouched target rows survive byte-for-byte — and the PRE-merge
    generation remains readable and row-identical via time travel."""
    path = str(tmp_path / "managed_merge")
    base = spark.createDataFrame(
        [(i, f"v{i}", 10.0 * i) for i in range(8)],
        "k long, tag string, val double",
    )
    g0 = io.write_managed(base, path)
    cdc = spark.createDataFrame(
        [
            (1, "upd", -1.0, False),   # matched -> update
            (2, "del", 0.0, True),     # matched -> delete
            (100, "new", 5.0, False),  # unmatched -> insert
            (200, "gone", 0.0, True),  # unmatched delete -> no-op
        ],
        "k long, tag string, val double, del boolean",
    )
    g1 = io.merge_managed(spark, path, cdc, ["k"], delete_col="del")
    assert (g0, g1) == (0, 1)
    got = {
        r["k"]: (r["tag"], r["val"])
        for r in io.read_managed(spark, path).collect()
    }
    want = {i: (f"v{i}", 10.0 * i) for i in range(8) if i not in (1, 2)}
    want[1] = ("upd", -1.0)
    want[100] = ("new", 5.0)
    assert got == want
    # pre-merge generation: intact, row-identical (not just a count)
    pre = sorted(
        map(tuple, io.read_managed(spark, path, generation=g0).collect())
    )
    assert pre == sorted(map(tuple, base.collect()))


def test_merge_managed_without_delete_col(spark, tmp_path):
    """delete_col=None degrades to pure upsert: every source row lands,
    no row can be deleted."""
    path = str(tmp_path / "managed_upsert")
    io.write_managed(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), path
    )
    io.merge_managed(
        spark,
        path,
        spark.createDataFrame([(2, "B"), (3, "c")], "k long, v string"),
        ["k"],
    )
    got = sorted(map(tuple, io.read_managed(spark, path).collect()))
    assert got == [(1, "a"), (2, "B"), (3, "c")]
