"""Per-type catalog construction contracts.

The shape of the reference's ``CatalogMigrationUtilTest.java:54-93``:
every catalog type builds a distinct implementation class, and missing
required properties fail with the implementation's own error text (the
texts mirror the public Apache Iceberg catalog impls the reference
dispatches to in ``CatalogMigrationUtil.java:70-96``).
"""

import pytest

from iceberg_catalog_migrator_spark.catalog.factory import CatalogType, build_catalog
from iceberg_catalog_migrator_spark.catalog.hadoop import HadoopCatalog
from iceberg_catalog_migrator_spark.catalog.service import (
    DynamoDbCatalog,
    EcsCatalog,
    GlueCatalog,
    JdbcCatalog,
    NessieCatalog,
    RestCatalog,
)
from iceberg_catalog_migrator_spark.catalog.identifiers import TableIdentifier


def test_each_type_builds_distinct_class(tmp_path):
    built = {
        "HADOOP": build_catalog("HADOOP", "c", {"warehouse": str(tmp_path / "wh")}),
        "JDBC": build_catalog("JDBC", "c", {"uri": str(tmp_path / "jdbc.db")}),
        "NESSIE": build_catalog("NESSIE", "c", {"uri": str(tmp_path / "nessie.db")}),
        "REST": build_catalog("REST", "c", {"uri": str(tmp_path / "rest.db")}),
        "GLUE": build_catalog("GLUE", "c", {"warehouse": str(tmp_path / "glue")}),
        "DYNAMODB": build_catalog("DYNAMODB", "c", {"warehouse": str(tmp_path / "ddb")}),
        "ECS": build_catalog("ECS", "c", {"warehouse": str(tmp_path / "ecs")}),
    }
    expected = {
        "HADOOP": HadoopCatalog,
        "JDBC": JdbcCatalog,
        "NESSIE": NessieCatalog,
        "REST": RestCatalog,
        "GLUE": GlueCatalog,
        "DYNAMODB": DynamoDbCatalog,
        "ECS": EcsCatalog,
    }
    try:
        for t, cat in built.items():
            assert type(cat) is expected[t], t
            assert cat.name == "c"
    finally:
        for cat in built.values():
            cat.close()


@pytest.mark.parametrize("missing", ["", " ", None])
@pytest.mark.parametrize(
    ("ctype", "prop", "text"),
    [
        ("JDBC", "uri", "JDBC connection URI is required"),
        ("NESSIE", "uri", "Nessie URI cannot be null"),
        ("REST", "uri", "Invalid uri for http client"),
        ("GLUE", "warehouse",
         "Cannot initialize GlueCatalog because warehousePath must not be null or empty"),
        ("DYNAMODB", "warehouse",
         "Cannot initialize DynamoDbCatalog because warehousePath must not be null or empty"),
        ("ECS", "warehouse",
         "Cannot initialize EcsCatalog because warehousePath must not be null or empty"),
    ],
)
def test_missing_required_property_error_texts(ctype, prop, text, missing):
    props = {} if missing is None else {prop: missing}
    with pytest.raises(ValueError, match=text):
        build_catalog(ctype, "c", props)


def test_nessie_ref_defaults_to_main_and_overrides(tmp_path):
    from iceberg_catalog_migrator_spark.catalog.base import CatalogError

    cat = build_catalog("NESSIE", "c", {"uri": str(tmp_path / "n.db")})
    assert cat.ref == "main"
    # a ref override resolves once the branch exists on the server …
    cat.create_branch("dev")
    cat.close()
    cat = build_catalog("NESSIE", "c", {"uri": str(tmp_path / "n.db"), "ref": "dev"})
    assert cat.ref == "dev"
    cat.close()
    # … and fails like a Nessie client against a missing branch otherwise
    with pytest.raises(CatalogError, match="does not exist"):
        build_catalog("NESSIE", "c", {"uri": str(tmp_path / "n2.db"), "ref": "ghost"})


def test_glue_namespaces_are_flat(tmp_path):
    cat = build_catalog("GLUE", "c", {"warehouse": str(tmp_path / "glue")})
    try:
        cat.create_namespace(("db1",))
        with pytest.raises(Exception):
            cat.create_namespace(("db1", "nested"))
        with pytest.raises(Exception):
            cat.register_table(TableIdentifier.of("t_no_ns"), "/meta/v1.metadata.json")
    finally:
        cat.close()


def test_glue_roundtrip_register_and_entry_only_drop(tmp_path):
    cat = build_catalog("GLUE", "c", {"warehouse": str(tmp_path / "glue")})
    try:
        cat.create_namespace(("db1",))
        tid = TableIdentifier.of("db1", "t1")
        cat.register_table(tid, "/meta/v1.metadata.json")
        assert cat.load_table_metadata_location(tid) == "/meta/v1.metadata.json"
        assert cat.supports_entry_only_delete
        assert cat.drop_table(tid)
        assert not cat.table_exists(tid)
    finally:
        cat.close()


def test_name_override_via_properties_still_applies(tmp_path):
    # the reference's JDBC quirk (CatalogMigrationUtil.java:48-68):
    # properties["name"] overrides the constructor name
    cat = build_catalog("JDBC", "ignored", {"uri": str(tmp_path / "j.db"), "name": "real"})
    assert cat.name == "real"
    cat.close()


def test_hive_requires_uri():
    with pytest.raises(ValueError, match="HIVE catalog requires a `uri` property"):
        build_catalog("HIVE", "c", {})
