"""Catalog factory: the 9-way type dispatch of the reference
(``api/.../CatalogMigrationUtil.java:36-46`` enum, impl map ``:70-96``).

Each of the 9 types dispatches to a distinct class with its own
required-property validation and namespace semantics (see
``service.py`` for the six service-catalog types), mirroring how the
reference's per-impl ``initialize()`` contracts differ. Types whose
backing service cannot exist in this container execute against the
local SQL store that reproduces their *catalog semantics* (explicit
namespaces + entry-only drop for the service catalogs; implicit
namespaces for HADOOP). On a real cluster each type becomes a
``spark.sql.catalog.<name>`` SparkCatalog config block instead; the
dispatch table is the same.
"""

from __future__ import annotations

import importlib
from enum import Enum

from . import service
from .base import Catalog
from .hadoop import HadoopCatalog
from .sql import SqlCatalog


class CatalogType(Enum):
    CUSTOM = "CUSTOM"
    DYNAMODB = "DYNAMODB"
    ECS = "ECS"
    GLUE = "GLUE"
    HADOOP = "HADOOP"
    HIVE = "HIVE"
    JDBC = "JDBC"
    NESSIE = "NESSIE"
    REST = "REST"


def build_catalog(
    catalog_type: CatalogType | str,
    name: str,
    properties: dict[str, str] | None = None,
) -> Catalog:
    """Build a catalog from a type + properties map.

    Properties (mirroring Iceberg config keys where applicable):
    - ``warehouse``: root path (HADOOP)
    - ``uri``: backing-store path/uri (JDBC/HIVE/NESSIE/REST/...)
    - ``catalog-impl``: ``module:ClassName`` for CUSTOM
    The catalog ``name`` may be overridden via properties["name"]
    (reference JDBC quirk, ``CatalogMigrationUtil.java:48-68``).
    """
    props = dict(properties or {})
    if isinstance(catalog_type, str):
        catalog_type = CatalogType(catalog_type.upper())
    name = props.pop("name", name)

    if catalog_type is CatalogType.CUSTOM:
        impl = props.pop("catalog-impl", None)
        if not impl:
            raise ValueError("CUSTOM catalog requires a `catalog-impl` property")
        module_name, _, class_name = impl.partition(":")
        cls = getattr(importlib.import_module(module_name), class_name)
        return cls(name=name, **props)

    if catalog_type is CatalogType.HADOOP:
        # message pinned by the reference's CLIOptionsTest.invalidArgs
        # (Iceberg HadoopCatalog init text)
        if not props.get("warehouse"):
            raise ValueError(
                "Cannot initialize HadoopCatalog because warehousePath must not be null or empty"
            )
        return HadoopCatalog(name=name, warehouse=props["warehouse"])

    if catalog_type is CatalogType.HIVE:
        # Hive metastore semantics: single-level namespaces only, no
        # empty namespace (reference IT tests pin both).
        if not props.get("uri"):
            raise ValueError("HIVE catalog requires a `uri` property (metastore uri)")
        return SqlCatalog(
            name=name,
            uri=props["uri"],
            max_namespace_levels=1,
            allow_empty_namespace=False,
        )

    # one distinct class per remaining type, each validating its own
    # required properties — the shape of the reference's per-impl
    # initialize() contracts (CatalogMigrationUtil.java:70-96)
    service_impls = {
        CatalogType.JDBC: service.JdbcCatalog,
        CatalogType.NESSIE: service.NessieCatalog,
        CatalogType.REST: service.RestCatalog,
        CatalogType.GLUE: service.GlueCatalog,
        CatalogType.DYNAMODB: service.DynamoDbCatalog,
        CatalogType.ECS: service.EcsCatalog,
    }
    impl = service_impls.get(catalog_type)
    if impl is None:
        raise ValueError(f"Unsupported catalog type: {catalog_type}")
    return impl(name=name, properties=props)
