"""Per-type service-catalog classes with distinct construction contracts.

The reference dispatches each ``CatalogType`` to a distinct Iceberg
implementation class (``api/.../CatalogMigrationUtil.java:70-96``), and
each implementation validates its own required properties at
``initialize()`` time. The *execution* plane here is the local
:class:`~.sql.SqlCatalog` store (no cloud service exists in this
container), but the construction contract — which properties are
required, the error text when they are missing, and the namespace
semantics — is type-specific, mirroring the public Apache Iceberg
implementations:

- ``JdbcCatalog``: requires ``uri`` ("JDBC connection URI is required");
- ``NessieCatalog``: requires ``uri``; ``ref`` defaults to ``main``;
- ``RestCatalog``: requires ``uri`` (the REST endpoint);
- ``GlueCatalog`` / ``DynamoDbCatalog`` / ``EcsCatalog``: require a
  non-blank ``warehouse`` path ("Cannot initialize <X> because
  warehousePath must not be null or empty");
- Glue databases are flat, so ``GlueCatalog`` rejects nested and empty
  namespaces (same restriction shape the reference pins for Hive in
  ``ITHadoopToHiveCatalogMigrator.java:49-66``).

In the simulation the store path is derived from ``uri`` (JDBC-like
types) or ``warehouse`` (path-rooted types); on a real deployment each
class is replaced by the Iceberg impl the reference names, with the
same properties passed through.
"""

from __future__ import annotations

import os

from .sql import SqlCatalog


def _require(properties: dict[str, str], key: str, message: str) -> str:
    value = properties.get(key)
    if value is None or not str(value).strip():
        raise ValueError(message)
    return value


class JdbcCatalog(SqlCatalog):
    """JDBC-backed catalog (reference impl: ``org.apache.iceberg.jdbc.JdbcCatalog``)."""

    catalog_type = "JDBC"

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "JDBC connection URI is required")
        super().__init__(name=name, uri=uri)


class NessieCatalog(SqlCatalog):
    """Nessie-backed catalog (reference impl:
    ``org.apache.iceberg.nessie.NessieCatalog``). ``ref`` names the
    Nessie branch/tag and defaults to ``main``, as in the public impl."""

    catalog_type = "NESSIE"

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "Nessie URI cannot be null")
        self.ref = properties.get("ref") or "main"
        super().__init__(name=name, uri=uri)


class RestCatalog(SqlCatalog):
    """REST-protocol catalog (reference impl:
    ``org.apache.iceberg.rest.RESTCatalog``)."""

    catalog_type = "REST"

    def __init__(self, name: str, properties: dict[str, str]):
        uri = _require(properties, "uri", "Invalid uri for http client: null")
        super().__init__(name=name, uri=uri)


class GlueCatalog(SqlCatalog):
    """AWS Glue catalog (reference impl:
    ``org.apache.iceberg.aws.glue.GlueCatalog``). Glue databases are a
    flat list, so nested and empty namespaces are rejected."""

    catalog_type = "GLUE"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize GlueCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(
            name=name,
            uri=os.path.join(warehouse, "glue-catalog.db"),
            max_namespace_levels=1,
            allow_empty_namespace=False,
        )


class DynamoDbCatalog(SqlCatalog):
    """AWS DynamoDB catalog (reference impl:
    ``org.apache.iceberg.aws.dynamodb.DynamoDbCatalog``)."""

    catalog_type = "DYNAMODB"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize DynamoDbCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(name=name, uri=os.path.join(warehouse, "dynamodb-catalog.db"))


class EcsCatalog(SqlCatalog):
    """Dell ECS catalog (reference impl:
    ``org.apache.iceberg.dell.ecs.EcsCatalog``)."""

    catalog_type = "ECS"

    def __init__(self, name: str, properties: dict[str, str]):
        warehouse = _require(
            properties,
            "warehouse",
            "Cannot initialize EcsCatalog because warehousePath must not be null or empty",
        )
        self.warehouse = warehouse
        super().__init__(name=name, uri=os.path.join(warehouse, "ecs-catalog.db"))
