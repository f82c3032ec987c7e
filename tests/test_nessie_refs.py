"""Nessie branch semantics at the catalog level: per-ref isolation of
namespaces and table pointers, branch create/drop, and branch-to-branch
promotion through the migration plane (two refs of one store)."""

import pytest

from iceberg_catalog_migrator_spark.catalog.base import (
    CatalogError,
    write_table_metadata,
)
from iceberg_catalog_migrator_spark.catalog.identifiers import TableIdentifier
from iceberg_catalog_migrator_spark.catalog.migrator import CatalogMigrator
from iceberg_catalog_migrator_spark.catalog.service import NessieCatalog


def _nessie(tmp_path, ref="main"):
    return NessieCatalog("nessie", {"uri": str(tmp_path / "nessie.db"), "ref": ref})


def _register(cat, ns, name, tmp_path):
    ident = TableIdentifier.of(*ns, name)
    meta = write_table_metadata(
        str(tmp_path / "wh" / "_".join(ns) / name), "struct<id:bigint>", version=1
    )
    cat.register_table(ident, meta)
    return ident


def test_branch_isolation(tmp_path):
    main = _nessie(tmp_path)
    main.create_namespace(("db",))
    _register(main, ("db",), "t1", tmp_path)
    main.create_branch("dev")
    dev = main.with_ref("dev")
    # branch carries main's state at branch time
    assert [i.name for i in dev.list_tables(("db",))] == ["t1"]
    # new registrations on dev stay on dev
    _register(dev, ("db",), "t2", tmp_path)
    assert [i.name for i in dev.list_tables(("db",))] == ["t1", "t2"]
    assert [i.name for i in main.list_tables(("db",))] == ["t1"]
    # and main's later changes don't leak into dev
    _register(main, ("db",), "t3", tmp_path)
    assert [i.name for i in dev.list_tables(("db",))] == ["t1", "t2"]
    dev.close()
    main.close()


def test_unknown_ref_rejected(tmp_path):
    main = _nessie(tmp_path)
    with pytest.raises(CatalogError, match="does not exist"):
        _nessie(tmp_path, ref="ghost")
    main.close()


def test_branch_lifecycle(tmp_path):
    main = _nessie(tmp_path)
    main.create_branch("dev")
    assert main.list_refs() == ["dev", "main"]
    with pytest.raises(CatalogError, match="already exists"):
        main.create_branch("dev")
    main.drop_branch("dev")
    assert main.list_refs() == ["main"]
    with pytest.raises(CatalogError, match="cannot drop the main branch"):
        main.drop_branch("main")
    main.close()


def test_promote_branch_tables_to_main_via_migration(tmp_path):
    """The Nessie merge-by-migration workflow: tables registered on a
    dev branch are promoted to main by running the migrator with the
    SAME store uri as both source (ref=dev) and target (ref=main)."""
    main = _nessie(tmp_path)
    main.create_namespace(("db",))
    _register(main, ("db",), "base", tmp_path)
    main.create_branch("dev")
    dev = main.with_ref("dev")
    staged = _register(dev, ("db",), "staged", tmp_path)

    result = (
        CatalogMigrator(source_catalog=dev, target_catalog=main)
        .register_tables([staged])
        .result()
    )
    assert [str(i) for i in result.registered_table_identifiers] == ["db.staged"]
    assert [i.name for i in main.list_tables(("db",))] == ["base", "staged"]
    # the pointer moved, not the data: both refs resolve the same doc
    assert main.load_table_metadata_location(staged) == dev.load_table_metadata_location(staged)
    dev.close()
    main.close()
