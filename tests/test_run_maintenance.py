"""run_maintenance (round-12 verdict ask #5): the execution half of
the maintenance advisor. Dirty table -> advisor -> runner -> advisor
reports clean; a clean table is a commit-free no-op; actions are
re-planned before each step so an earlier action mooting a later one
skips it."""

import os
import time

from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources.snapshots import (
    SnapshotTable,
    delete_where,
    plan_maintenance,
    run_maintenance,
)


def _small_table(spark, path, n_appends=3):
    t = SnapshotTable(spark, path)
    for i in range(n_appends):
        t.append(
            spark.range(i * 100, i * 100 + 100)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartition(1)
        )
    return t


def test_dirty_table_comes_back_clean(spark, tmp_path):
    t = _small_table(spark, str(tmp_path / "dirty"), n_appends=4)
    # pending MOR delete -> compact_deletes
    delete_where(t, ["k"], spark.range(0, 10).select(F.col("id").alias("k")))
    # an aged orphan -> vacuum_orphans
    orphan = os.path.join(t._data, "stray-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"PAR1 not really parquet PAR1")
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))

    before = plan_maintenance(t, min_age_sec=3600)
    assert "compact_deletes" in before["recommended"]
    assert "rewrite_small_files" in before["recommended"]
    assert "vacuum_orphans" in before["recommended"]

    report = run_maintenance(t, min_age_sec=3600)
    assert set(report["applied"]) >= {
        "compact_deletes",
        "rewrite_small_files",
        "vacuum_orphans",
    }
    assert report["after"]["recommended"] == []
    assert not os.path.exists(orphan)
    # rows intact minus the deleted keys
    assert t.read().count() == 4 * 100 - 10

    # second run: clean table, no commits minted
    head = t.current_snapshot_id()
    again = run_maintenance(t, min_age_sec=3600)
    assert again["applied"] == {}
    assert t.current_snapshot_id() == head


def test_deep_manifest_chain_triggers_rewrite_manifests(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "deep"))
    # a wide base keeps the accumulated delta weight far under the
    # file count, so the 10 one-file appends stay delta-encoded and
    # the chain actually deepens past the advisor's threshold
    t.append(
        spark.range(0, 24_000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(100, "k")
    )
    for i in range(10):  # 10 one-file delta commits: depth > 8
        t.append(
            spark.range(30_000 + i * 10, 30_000 + i * 10 + 10)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartition(1)
        )
    # small_file_bytes=1: nothing counts as small, so ONLY the manifest
    # chain is dirty — rewrite_manifests must run and reset the depth
    before = plan_maintenance(t, small_file_bytes=1)
    assert before["recommended"] == ["rewrite_manifests"]
    report = run_maintenance(t, small_file_bytes=1)
    assert "rewrite_manifests" in report["applied"]
    assert report["after"]["manifest_delta_depth"] == 0
    assert report["after"]["recommended"] == []


def test_action_subset_and_explicit_expiry(spark, tmp_path):
    t = _small_table(spark, str(tmp_path / "subset"), n_appends=5)
    n_before = len(t.history_ids())
    assert n_before == 5
    report = run_maintenance(
        t, actions=["rewrite_small_files"], expire_keep_last=1
    )
    assert list(report["applied"]) == ["rewrite_small_files", "expire_snapshots"]
    assert len(t.history_ids()) == 1  # expiry is explicit-only, but applied
    assert t.read().count() == 5 * 100


def test_mooted_action_is_skipped(spark, tmp_path):
    """rewrite_small_files writes a FULL-form manifest, so a deep chain
    it coexisted with is mooted — the re-plan must skip
    rewrite_manifests instead of spending a commit."""
    t = SnapshotTable(spark, str(tmp_path / "moot"))
    t.append(
        spark.range(0, 24_000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(100, "k")
    )
    for i in range(10):
        t.append(
            spark.range(30_000 + i * 10, 30_000 + i * 10 + 10)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartition(1)
        )
    before = plan_maintenance(t)
    assert "rewrite_small_files" in before["recommended"]
    assert "rewrite_manifests" in before["recommended"]
    report = run_maintenance(t)
    assert "rewrite_small_files" in report["applied"]
    assert "rewrite_manifests" not in report["applied"]
    assert report["after"]["recommended"] == []
