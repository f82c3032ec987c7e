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


def test_merge_branch_three_way(tmp_path):
    main = _nessie(tmp_path)
    main.create_namespace(("db",))
    kept = _register(main, ("db",), "kept", tmp_path)
    changed = _register(main, ("db",), "changed", tmp_path)
    doomed = _register(main, ("db",), "doomed", tmp_path)
    main.create_branch("dev")
    dev = main.with_ref("dev")
    # branch work: add one, repoint one, drop one
    _register(dev, ("db",), "added", tmp_path)
    dev.drop_table(changed)
    new_meta = write_table_metadata(
        str(tmp_path / "wh" / "db" / "changed_v2"), "struct<id:bigint>", version=2
    )
    dev.register_table(changed, new_meta)
    dev.drop_table(doomed)

    out = main.merge_branch("dev")
    assert out == {"added": ["db.added"], "updated": ["db.changed"], "deleted": ["db.doomed"]}
    assert {i.name for i in main.list_tables(("db",))} == {"kept", "changed", "added"}
    assert main.load_table_metadata_location(changed) == new_meta
    assert main.load_table_metadata_location(kept)  # untouched
    # base advanced: an immediate re-merge is a no-op
    assert main.merge_branch("dev") == {"added": [], "updated": [], "deleted": []}
    dev.close()
    main.close()


def test_merge_branch_conflict_aborts_whole_merge(tmp_path):
    main = _nessie(tmp_path)
    main.create_namespace(("db",))
    both = _register(main, ("db",), "both", tmp_path)
    main.create_branch("dev")
    dev = main.with_ref("dev")
    # diverge: both sides repoint the same table to different docs
    for cat, v in ((dev, 2), (main, 3)):
        cat.drop_table(both)
        cat.register_table(
            both,
            write_table_metadata(
                str(tmp_path / "wh" / "db" / f"both_v{v}"), "struct<id:bigint>", version=v
            ),
        )
    _register(dev, ("db",), "clean_add", tmp_path)
    with pytest.raises(CatalogError, match="conflicts.*db.both"):
        main.merge_branch("dev")
    # no partial writes: the clean add did NOT land
    assert {i.name for i in main.list_tables(("db",))} == {"both"}
    dev.close()
    main.close()


def test_merge_branch_namespace_created_on_target(tmp_path):
    main = _nessie(tmp_path)
    main.create_branch("dev")
    dev = main.with_ref("dev")
    dev.create_namespace(("newns",))
    _register(dev, ("newns",), "t", tmp_path)
    out = main.merge_branch("dev")
    assert out["added"] == ["newns.t"]
    assert main.namespace_exists(("newns",))
    assert [i.name for i in main.list_tables(("newns",))] == ["t"]
    dev.close()
    main.close()


def test_catalog_tags_are_immutable(tmp_path):
    main = _nessie(tmp_path)
    main.create_namespace(("db",))
    _register(main, ("db",), "t1", tmp_path)
    main.create_tag("release-1")
    assert main.list_refs_with_kind() == {"main": "branch", "release-1": "tag"}

    tag = main.with_ref("release-1")
    # reads work and see the tagged state
    assert [i.name for i in tag.list_tables(("db",))] == ["t1"]
    # later main changes are invisible through the tag
    _register(main, ("db",), "t2", tmp_path)
    assert [i.name for i in tag.list_tables(("db",))] == ["t1"]
    # every mutation through the tag is rejected
    with pytest.raises(CatalogError, match="immutable"):
        _register(tag, ("db",), "nope", tmp_path)
    with pytest.raises(CatalogError, match="immutable"):
        tag.drop_table(TableIdentifier.of("db", "t1"))
    with pytest.raises(CatalogError, match="immutable"):
        tag.create_namespace(("other",))
    # and merging into a tag is refused
    main.create_branch("dev")
    with pytest.raises(CatalogError, match="cannot merge into tag"):
        main.merge_branch("dev", into_ref="release-1")
    tag.close()
    main.close()


def _legacy_store(path):
    """A pre-scope catalog file: the flat (ns[, name]) layout every
    store had before per-ref scoping existed."""
    import sqlite3

    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE namespaces (ns TEXT PRIMARY KEY)")
    conn.execute(
        "CREATE TABLE tables (ns TEXT NOT NULL, name TEXT NOT NULL,"
        " metadata_location TEXT NOT NULL, PRIMARY KEY (ns, name))"
    )
    conn.execute("INSERT INTO namespaces (ns) VALUES ('db')")
    conn.execute(
        "INSERT INTO tables (ns, name, metadata_location)"
        " VALUES ('db', 'legacy_t', '/wh/db/legacy_t/metadata/v1.metadata.json')"
    )
    conn.commit()
    conn.close()


def test_legacy_store_adopted_into_main(tmp_path):
    """A pre-upgrade Nessie store (all rows unscoped) must surface its
    previously registered tables on main — and branch/tag creation must
    not trip the legacy (ns, name) unique constraint."""
    db = str(tmp_path / "nessie.db")
    _legacy_store(db)
    cat = NessieCatalog("nessie", {"uri": db})
    assert [i.name for i in cat.list_tables(("db",))] == ["legacy_t"]
    assert cat.namespace_exists(("db",))
    # cross-scope row copies used to raise sqlite IntegrityError
    # against the legacy PK; the rebuilt store accepts them
    cat.create_branch("dev")
    cat.create_tag("v1")
    dev = cat.with_ref("dev")
    assert [i.name for i in dev.list_tables(("db",))] == ["legacy_t"]
    dev.close()
    cat.close()
    # reopening keeps the adopted state (migration is one-shot)
    again = NessieCatalog("nessie", {"uri": db})
    assert [i.name for i in again.list_tables(("db",))] == ["legacy_t"]
    # adoption COPIED, never moved: a plain catalog sharing the uri
    # still sees its unscoped rows
    import sqlite3

    conn = sqlite3.connect(db)
    assert conn.execute(
        "SELECT COUNT(*) FROM tables WHERE scope = ''"
    ).fetchone()[0] == 1
    conn.close()
    # and the one-shot marker prevents resurrection: dropping on main
    # then reopening must NOT re-adopt the '' row
    from iceberg_catalog_migrator_spark.catalog.identifiers import (
        TableIdentifier as TI,
    )

    again.drop_table(TI.of("db", "legacy_t"))
    again.close()
    third = NessieCatalog("nessie", {"uri": db})
    assert [i.name for i in third.list_tables(("db",))] == []
    third.close()


def test_legacy_store_stays_unscoped_for_jdbc(tmp_path):
    """The same legacy file opened by a NON-Nessie catalog keeps its
    rows at the unscoped default — adoption is Nessie-only."""
    from iceberg_catalog_migrator_spark.catalog.service import JdbcCatalog

    db = str(tmp_path / "jdbc.db")
    _legacy_store(db)
    cat = JdbcCatalog("jdbc", {"uri": db})
    assert [i.name for i in cat.list_tables(("db",))] == ["legacy_t"]
    assert cat.namespace_exists(("db",))
    cat.close()
