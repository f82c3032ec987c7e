"""End-to-end parity core: a table written by Spark through the source
catalog, migrated by pointer only, reads back identically through the
target catalog (SURVEY §7 phase 2 — the minimum end-to-end slice)."""

import os

from iceberg_catalog_migrator_spark.catalog import (
    CatalogMigrator,
    SqlCatalog,
    TableIdentifier,
)
from iceberg_catalog_migrator_spark.catalog.spark_io import read_table, write_table


def test_migrate_preserves_rows_without_copying_data(spark, tmp_path, sf_dir):
    src = SqlCatalog("source", str(tmp_path / "src.db"))
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    src.create_namespace(("db1",))
    tid = TableIdentifier.of("db1", "nation")

    df = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    location = str(tmp_path / "wh" / "db1" / "nation")
    write_table(src, tid, df, location)

    before = {tuple(r) for r in read_table(spark, src, tid).collect()}

    m = CatalogMigrator(src, tgt, delete_entries_from_source_catalog=True)
    m.register_tables(m.get_matching_table_identifiers(None))
    result = m.result()
    assert result.registered_table_identifiers == [tid]

    # pointer moved: source entry gone, target resolves the SAME metadata
    assert not src.table_exists(tid)
    after = {tuple(r) for r in read_table(spark, tgt, tid).collect()}
    assert after == before
    # zero data copies: exactly one data directory exists
    assert os.path.isdir(os.path.join(location, "data"))
