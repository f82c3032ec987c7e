"""Catalog-arbitrated commits: the snapshot-table head swap routed
through a pointer catalog's compare-and-swap, so commit safety rests on
the catalog's transactional store — the reference's model
(`CatalogMigrator.java:208-224` delegates commit atomicity to the
catalog) — instead of POSIX flock/O_EXCL semantics."""

import pytest
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.catalog import SqlCatalog, TableIdentifier
from iceberg_catalog_migrator_spark.catalog.base import CatalogError
from iceberg_catalog_migrator_spark.sources import load_table
from iceberg_catalog_migrator_spark.sources.snapshots import (
    CatalogArbitratedTable,
    CommitConflictError,
    SnapshotError,
    SnapshotTable,
)

SF = "/root/testdata/sf0.001"
IDENT = TableIdentifier.of("lake", "orders_cas")


@pytest.fixture()
def catalog(tmp_path):
    cat = SqlCatalog("arbiter", str(tmp_path / "cat.db"))
    cat.create_namespace(("lake",))
    yield cat
    cat.close()


def halves(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    return (
        orders.filter(F.col("o_orderkey") % 2 == 0),
        orders.filter(F.col("o_orderkey") % 2 == 1),
    )


def test_cas_commit_roundtrip(spark, catalog, tmp_path):
    even, odd = halves(spark)
    tbl = CatalogArbitratedTable.create(
        spark, catalog, IDENT, str(tmp_path / "tbl")
    )
    assert tbl.current_snapshot_id() is None
    s1 = tbl.append(even)
    s2 = tbl.append(odd)
    assert tbl.current_snapshot_id() == s2
    assert tbl.read().count() == even.count() + odd.count()
    assert tbl.read(s1).count() == even.count()
    # the catalog pointer moved with each commit and records the head
    from iceberg_catalog_migrator_spark.catalog.base import read_table_metadata

    doc = read_table_metadata(catalog.load_table_metadata_location(IDENT))
    assert doc["properties"]["snapshot-id"] == str(s2)
    # a plain reader of the same path sees the committed state too
    # (hint refreshed best-effort after the CAS win)
    plain = SnapshotTable(spark, tbl.path)
    assert plain.read().count() == tbl.read().count()


def test_cas_commit_detects_stale_parent(spark, catalog, tmp_path):
    even, odd = halves(spark)
    tbl = CatalogArbitratedTable.create(
        spark, catalog, IDENT, str(tmp_path / "tbl")
    )
    tbl.append(even)
    stale_parent = tbl.current_snapshot_id()
    tbl.append(odd)  # someone else advances the pointer
    files = tbl._load_snap(stale_parent)["files"]
    with pytest.raises(CommitConflictError, match="advanced past"):
        tbl._commit(files, "append", stale_parent)


def test_cas_loser_swap_leaves_no_trace(spark, catalog, tmp_path):
    """Force the CAS itself to lose (pointer moves between the parent
    check and the swap): the staged manifest and doc are cleaned up and
    the winner's state is untouched."""
    even, odd = halves(spark)
    tbl = CatalogArbitratedTable.create(
        spark, catalog, IDENT, str(tmp_path / "tbl")
    )
    tbl.append(even)
    parent = tbl.current_snapshot_id()
    files = tbl._load_snap(parent)["files"]

    real_swap = catalog.swap_table_metadata_location
    winner = CatalogArbitratedTable(spark, catalog, IDENT)

    def hijack(identifier, expected, new):
        # another writer wins right before our swap
        catalog.swap_table_metadata_location = real_swap
        winner.append(odd.limit(5))
        return real_swap(identifier, expected, new)

    catalog.swap_table_metadata_location = hijack
    with pytest.raises(CommitConflictError, match="pointer swap"):
        tbl._commit(files, "append", parent)
    # loser's staged manifest gone; history = [parent, winner's commit]
    assert tbl.history_ids() == [parent, winner.current_snapshot_id()]
    assert tbl.current_snapshot_id() == winner.current_snapshot_id()


def test_cas_commit_rejects_branch_refs(spark, catalog, tmp_path):
    even, _ = halves(spark)
    tbl = CatalogArbitratedTable.create(
        spark, catalog, IDENT, str(tmp_path / "tbl")
    )
    tbl.append(even)
    tbl.create_branch("audit")
    with pytest.raises(SnapshotError, match="registered pointer"):
        tbl.append(even.limit(1), ref="audit")
    # ...but the same path is branch-writable through a plain table
    plain = SnapshotTable(spark, tbl.path)
    plain.append(even.limit(1), ref="audit")
    assert plain.read(ref="audit").count() == even.count() + 1


def test_swap_refused_on_immutable_tag(tmp_path):
    from iceberg_catalog_migrator_spark.catalog.service import NessieCatalog

    cat = NessieCatalog("nessie", {"uri": str(tmp_path / "n.db")})
    cat.create_namespace(("lake",))
    cat.register_table(IDENT, "/loc/v1.metadata.json")
    cat.create_tag("rel-1")
    tagged = cat.with_ref("rel-1")
    with pytest.raises(CatalogError, match="immutable"):
        tagged.swap_table_metadata_location(IDENT, "/loc/v1.metadata.json", "/x")
    cat.close()


def _cas_commit_worker(args):
    """Separate OS process: own sqlite connection, own table handle —
    nothing shared but the catalog file and the table directory."""
    cat_uri, path, parent, files, tag = args
    from iceberg_catalog_migrator_spark.catalog import SqlCatalog, TableIdentifier
    from iceberg_catalog_migrator_spark.sources.snapshots import (
        CatalogArbitratedTable,
        CommitConflictError,
    )

    cat = SqlCatalog("arbiter", cat_uri)
    tbl = CatalogArbitratedTable(None, cat, TableIdentifier.of("lake", "orders_cas"))
    try:
        return ("ok", tbl._commit(files, f"append-{tag}", parent))
    except CommitConflictError:
        return ("conflict", None)
    finally:
        cat.close()


def test_cas_race_across_processes_exactly_one_wins(spark, catalog, tmp_path):
    """Six OS processes race the SAME parent through the catalog CAS:
    the sqlite store admits exactly one; five get CommitConflictError
    and leave no manifests behind. This is the object-store-shaped
    guarantee — no flock is taken anywhere on this path."""
    import multiprocessing as mp

    even, odd = halves(spark)
    tbl = CatalogArbitratedTable.create(
        spark, catalog, IDENT, str(tmp_path / "tbl")
    )
    tbl.append(even)
    parent = tbl.current_snapshot_id()
    files = tbl._load_snap(parent)["files"]
    staged = tbl._write_data_files(odd.limit(3))
    jobs = [
        (catalog.uri, tbl.path, parent, files + staged, i) for i in range(6)
    ]
    with mp.get_context("spawn").Pool(6) as pool:
        results = pool.map(_cas_commit_worker, jobs)
    outcomes = [r[0] for r in results]
    assert outcomes.count("ok") == 1
    assert outcomes.count("conflict") == 5
    winner = next(r[1] for r in results if r[0] == "ok")
    assert tbl.current_snapshot_id() == winner
    assert tbl.history_ids() == [parent, winner]
    assert tbl.read().count() == even.count() + 3
