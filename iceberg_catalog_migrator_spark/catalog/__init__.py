from .base import (
    Catalog,
    CatalogError,
    NamespaceAlreadyExistsError,
    NamespaceNotEmptyError,
    NoSuchNamespaceError,
    NoSuchTableError,
    TableAlreadyExistsError,
    UnprocessableError,
)
from .factory import CatalogType, build_catalog
from .hadoop import HadoopCatalog
from .identifiers import TableIdentifier, identifiers_from_csv, identifiers_from_file
from .migrator import CatalogMigrationResult, CatalogMigrator
from .sql import SqlCatalog

__all__ = [
    "Catalog",
    "CatalogError",
    "CatalogMigrationResult",
    "CatalogMigrator",
    "CatalogType",
    "HadoopCatalog",
    "NamespaceAlreadyExistsError",
    "NamespaceNotEmptyError",
    "NoSuchNamespaceError",
    "NoSuchTableError",
    "UnprocessableError",
    "SqlCatalog",
    "TableAlreadyExistsError",
    "TableIdentifier",
    "build_catalog",
    "identifiers_from_csv",
    "identifiers_from_file",
]
