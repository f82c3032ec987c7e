"""Swap-path adapter tests.

The SQL renderers are pure and pinned unconditionally — they define the
exact statements the migrator issues against a real Iceberg catalog.
The live path (procedure calls against SparkCatalog) is skip-gated on
the Iceberg runtime jar, which this container does not ship.
"""

import pytest

from iceberg_catalog_migrator_spark.catalog.iceberg_spark import (
    IcebergSparkCatalog,
    create_namespace_sql,
    current_metadata_location_sql,
    drop_table_sql,
    parse_identifier,
    register_table_sql,
    resolve_child_namespace,
    show_namespaces_sql,
    show_tables_sql,
)
from iceberg_catalog_migrator_spark.catalog.identifiers import TableIdentifier

TID = TableIdentifier.of("ns1", "tbl")


def test_register_table_renders_system_procedure():
    sql = register_table_sql("tgt", TID, "s3://wh/ns1/tbl/metadata/v3.metadata.json")
    assert sql == (
        "CALL `tgt`.system.register_table("
        "table => 'ns1.tbl', "
        "metadata_file => 's3://wh/ns1/tbl/metadata/v3.metadata.json')"
    )


def test_register_table_escapes_quotes():
    sql = register_table_sql("tgt", TID, "/path/with'quote.json")
    assert "'/path/with''quote.json'" in sql


def test_metadata_location_reads_latest_log_entry():
    sql = current_metadata_location_sql("src", TID)
    assert sql == (
        "SELECT file FROM `src`.`ns1`.`tbl`.metadata_log_entries "
        "ORDER BY timestamp DESC LIMIT 1"
    )


def test_namespace_and_listing_sql():
    assert show_namespaces_sql("src") == "SHOW NAMESPACES IN `src`"
    assert show_namespaces_sql("src", ("a",)) == "SHOW NAMESPACES IN `src`.`a`"
    assert create_namespace_sql("tgt", ("a", "b")) == "CREATE NAMESPACE `tgt`.`a`.`b`"
    assert show_tables_sql("src", ("a",)) == "SHOW TABLES IN `src`.`a`"


def test_drop_table_is_entry_only_without_purge():
    assert drop_table_sql("src", TID) == "DROP TABLE `src`.`ns1`.`tbl`"
    assert drop_table_sql("src", TID, purge=True) == "DROP TABLE `src`.`ns1`.`tbl` PURGE"


def test_quoting_handles_backticks():
    weird = TableIdentifier.of("na`me", "t")
    assert "`na``me`" in drop_table_sql("c", weird)


def test_parse_identifier_plain_and_quoted():
    assert parse_identifier("a.b.c") == ("a", "b", "c")
    assert parse_identifier("a.`b.c`.d") == ("a", "b.c", "d")
    assert parse_identifier("`we``ird`") == ("we`ird",)
    assert parse_identifier("solo") == ("solo",)


def test_resolve_child_namespace_strips_full_path():
    # Spark's SHOW NAMESPACES IN cat.a returns the FULL path 'a.b' —
    # must not become ('a', 'a', 'b')
    assert resolve_child_namespace(("a",), "a.b") == ("a", "b")
    assert resolve_child_namespace(("a", "b"), "a.b.c") == ("a", "b", "c")


def test_resolve_child_namespace_accepts_relative_and_dotted():
    # catalogs that return child-relative names still resolve correctly
    assert resolve_child_namespace(("a",), "b") == ("a", "b")
    assert resolve_child_namespace((), "top") == ("top",)
    # quoted part containing a dot is one namespace level, not two
    assert resolve_child_namespace(("a",), "a.`b.c`") == ("a", "b.c")


# ------------------------------------------------------- live (gated)
def test_live_register_roundtrip(spark, tmp_path):
    if not IcebergSparkCatalog.is_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on the classpath")
    # Runs only on a deployment with iceberg-spark-runtime configured:
    # spark.sql.catalog.it_src / it_tgt as SparkCatalog (hadoop type).
    src = IcebergSparkCatalog("it_src", spark)
    tgt = IcebergSparkCatalog("it_tgt", spark)
    tid = TableIdentifier.of("smoke", "t1")
    src.create_namespace(("smoke",))
    spark.sql("CREATE TABLE `it_src`.`smoke`.`t1` (id BIGINT) USING iceberg")
    loc = src.load_table_metadata_location(tid)
    tgt.create_namespace(("smoke",))
    tgt.register_table(tid, loc)
    assert tgt.table_exists(tid)
    assert tgt.load_table_metadata_location(tid) == loc
