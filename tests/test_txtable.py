"""Commit-log table format: snapshot isolation, optimistic
concurrency, crash invisibility, time travel, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nyc_landmarks_datalake_spark.sources import txtable


def _mk(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_create_append_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    v0 = txtable.commit(spark, path, _mk(spark, 5, "a"), "create", None)
    assert v0 == 0 and txtable.current_version(path) == 0
    # next snapshot = old ∪ new rows (full-snapshot manifest)
    snap0 = txtable.read_snapshot(spark, path, 0)
    v1 = txtable.commit(
        spark, path, snap0.unionByName(_mk(spark, 3, "b")), "append", 0
    )
    assert v1 == 1
    assert txtable.read_snapshot(spark, path).count() == 8
    # time travel: v0 still reads exactly the original 5 rows
    assert txtable.read_snapshot(spark, path, 0).count() == 5
    tags = {r["tag"] for r in txtable.read_snapshot(spark, path, 0).collect()}
    assert tags == {"a"}


def test_commit_conflict_detected(spark, tmp_path):
    path = str(tmp_path / "t")
    txtable.commit(spark, path, _mk(spark, 4, "a"), "create", None)
    # two writers both base on v0; the second publish must fail
    txtable.commit(spark, path, _mk(spark, 4, "w1"), "overwrite", 0)
    with pytest.raises(txtable.CommitConflict):
        txtable.commit(spark, path, _mk(spark, 4, "w2"), "overwrite", 0)
    # the loser's staged files are orphans: latest snapshot is w1 only
    tags = {r["tag"] for r in txtable.read_snapshot(spark, path).collect()}
    assert tags == {"w1"}
    # creating over an existing table is a conflict too
    with pytest.raises(txtable.CommitConflict):
        txtable.commit(spark, path, _mk(spark, 1, "x"), "create", None)


def test_crashed_writer_invisible_and_vacuumed(spark, tmp_path):
    path = str(tmp_path / "t")
    txtable.commit(spark, path, _mk(spark, 4, "a"), "create", None)
    # simulate a crash: data staged but manifest never published
    orphaned = txtable._stage_data(_mk(spark, 9, "crash"), path, 1)
    assert txtable.read_snapshot(spark, path).count() == 4  # invisible
    deleted = txtable.vacuum(path, keep_versions=1)
    assert sorted(deleted) == sorted(orphaned)
    assert txtable.read_snapshot(spark, path).count() == 4
    # live files survived vacuum
    live = txtable.referenced_files(path)
    assert all(os.path.exists(os.path.join(path, f)) for f in live)


def test_merge_upsert_tx_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "old"), (2, "old"), (3, "old")], ["k", "tag"]
    )
    updates = spark.createDataFrame([(2, "new"), (4, "new")], ["k", "tag"])
    txtable.commit(spark, path, base, "create", None)
    v = txtable.merge_upsert_tx(spark, path, updates, ["k"])
    assert v == 1
    got = {r["k"]: r["tag"] for r in txtable.read_snapshot(spark, path).collect()}
    assert got == {1: "old", 2: "new", 3: "old", 4: "new"}
    # vacuum keeping only the latest drops v0's manifest and files
    txtable.vacuum(path, keep_versions=1)
    assert txtable._versions(path) == [1]
    assert {r["k"] for r in txtable.read_snapshot(spark, path).collect()} == {
        1, 2, 3, 4,
    }
