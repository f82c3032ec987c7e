"""Catalog-pair integration matrix, driven through the CLI.

The reference runs one shared scenario suite against real catalog pairs
(``ITHadoopToNessieCatalogMigrator.java``, ``ITHiveToNessieCLIMigrationTest
.java``, ...). This mirrors that matrix over the local catalog-semantics
implementations: HADOOP (implicit namespaces, no entry-only delete),
HIVE (single-level namespaces, no empty namespace), JDBC (generic
service catalog). Scenarios per pair, from
``AbstractCLIMigrationTest.java``:

- full register: every table lands in the target, exit 0;
- partial failure (conflicting table pre-exists in target): the rest
  succeed, exit 1, ``failed_identifiers.txt`` written — then the
  retry-from-file round trip re-runs exactly the failed set (:366-388);
- multipart-namespace rejection mid-migration for HIVE targets: the
  multipart table fails, single-level tables still register.
"""

import logging
import os

import pytest

from iceberg_catalog_migrator_spark.catalog import (
    HadoopCatalog,
    SqlCatalog,
    TableIdentifier,
)
from iceberg_catalog_migrator_spark.catalog.base import write_table_metadata
from iceberg_catalog_migrator_spark.cli.main import FAILED_IDENTIFIERS_FILE, run

ID_SCHEMA = "struct<id:bigint>"

TABLES = [("foo", "tbl1"), ("foo", "tbl2"), ("bar", "tbl3"), ("bar", "tbl4")]

PAIRS = [
    ("HADOOP", "HIVE"),
    ("HIVE", "HADOOP"),
    ("JDBC", "JDBC"),
    ("HADOOP", "JDBC"),
    ("JDBC", "HIVE"),
    # typed service catalogs (distinct impl classes, see catalog/service.py)
    ("NESSIE", "GLUE"),
    ("GLUE", "REST"),
    ("DYNAMODB", "NESSIE"),
    ("ECS", "JDBC"),
    # wire-real REST on BOTH roles (catalog/rest_server.py): every
    # scenario below travels the public REST-catalog protocol twice
    ("REST", "REST"),
    ("REST", "HADOOP"),
]


def _open_catalog(cli_type, tmp_path, role):
    """(catalog object, CLI --*-catalog-properties value) for a type."""
    from iceberg_catalog_migrator_spark.catalog.factory import build_catalog

    if cli_type == "HADOOP":
        wh = str(tmp_path / f"{role}_wh")
        return HadoopCatalog(role, wh), f"warehouse={wh}"
    if cli_type in ("GLUE", "DYNAMODB", "ECS"):
        wh = str(tmp_path / f"{role}_{cli_type.lower()}")
        return build_catalog(cli_type, role, {"warehouse": wh}), f"warehouse={wh}"
    uri = str(tmp_path / f"{role}_{cli_type.lower()}.db")
    if cli_type == "HIVE":
        return (
            SqlCatalog(role, uri, max_namespace_levels=1, allow_empty_namespace=False),
            f"uri={uri}",
        )
    if cli_type in ("NESSIE", "REST"):
        return build_catalog(cli_type, role, {"uri": uri}), f"uri={uri}"
    return SqlCatalog(role, uri), f"uri={uri}"


def _seed_source(cat, tmp_path):
    for ns, tbl in TABLES:
        if not cat.namespace_exists((ns,)):
            cat.create_namespace((ns,))
        meta = write_table_metadata(str(tmp_path / "meta" / ns / tbl), ID_SCHEMA, version=1)
        cat.register_table(TableIdentifier.of(ns, tbl), meta)


def _args(src_type, src_props, tgt_type, tgt_props, out_dir, *extra):
    return [
        "register",
        "--source-catalog-type", src_type,
        "--source-catalog-properties", src_props,
        "--target-catalog-type", tgt_type,
        "--target-catalog-properties", tgt_props,
        "--output-dir", str(out_dir),
        "--disable-safety-prompts",
        *extra,
    ]


@pytest.fixture(params=PAIRS, ids=[f"{s}->{t}" for s, t in PAIRS])
def pair(request, tmp_path):
    src_type, tgt_type = request.param
    src, src_props = _open_catalog(src_type, tmp_path, "source")
    _seed_source(src, tmp_path)
    src.close()
    tgt, tgt_props = _open_catalog(tgt_type, tmp_path, "target")
    return {
        "src_type": src_type,
        "tgt_type": tgt_type,
        "src_props": src_props,
        "tgt_props": tgt_props,
        "tgt": tgt,
        "out": tmp_path / "out",
        "tmp": tmp_path,
    }


def test_full_register_all_pairs(pair, caplog):
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(_args(pair["src_type"], pair["src_props"],
                       pair["tgt_type"], pair["tgt_props"], pair["out"]))
    assert rc == 0
    assert (
        f"Successfully registered 4 tables from {pair['src_type']} catalog "
        f"to {pair['tgt_type']} catalog." in caplog.text
    )
    for ns, tbl in TABLES:
        assert pair["tgt"].table_exists(TableIdentifier.of(ns, tbl))


def test_partial_failure_then_retry_from_file(pair, caplog):
    # plant a conflict: foo.tbl2 already exists in the target
    tgt = pair["tgt"]
    tgt.create_namespace(("foo",))
    meta = write_table_metadata(str(pair["tmp"] / "conflict"), ID_SCHEMA, version=1)
    tgt.register_table(TableIdentifier.of("foo", "tbl2"), meta)

    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(_args(pair["src_type"], pair["src_props"],
                       pair["tgt_type"], pair["tgt_props"], pair["out"]))
    assert rc == 1
    assert (
        f"Failed to register 1 tables from {pair['src_type']} catalog "
        f"to {pair['tgt_type']} catalog." in caplog.text
    )
    assert "Successfully registered 3 tables" in caplog.text
    failed_file = os.path.join(pair["out"], FAILED_IDENTIFIERS_FILE)
    assert open(failed_file).read().splitlines() == ["foo.tbl2"]

    # retry-from-file round trip (AbstractCLIMigrationTest.java:366-388):
    # the conflict still exists, so exactly that table fails again
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(_args(pair["src_type"], pair["src_props"],
                       pair["tgt_type"], pair["tgt_props"], pair["out"],
                       "--identifiers-from-file", failed_file))
    assert rc == 1
    assert "Failed to register these tables:\n[foo.tbl2]" in caplog.text
    assert open(failed_file).read().splitlines() == ["foo.tbl2"]


def test_multipart_namespace_rejected_mid_run(pair, caplog):
    if pair["tgt_type"] not in ("HIVE", "GLUE"):
        pytest.skip("multipart rejection is a flat-namespace-target behavior (HIVE/GLUE)")
    if pair["src_type"] in ("HIVE", "GLUE"):
        pytest.skip("flat-namespace source cannot hold a multipart namespace")
    # add a table under a multipart namespace in the source
    src, _ = _open_catalog(pair["src_type"], pair["tmp"], "source")
    if not src.namespace_exists(("a",)):
        src.create_namespace(("a",))
    src.create_namespace(("a", "b"))
    meta = write_table_metadata(str(pair["tmp"] / "meta" / "a" / "b" / "t1"), ID_SCHEMA, version=1)
    src.register_table(TableIdentifier.of("a", "b", "t1"), meta)
    src.close()

    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(_args(pair["src_type"], pair["src_props"],
                       pair["tgt_type"], pair["tgt_props"], pair["out"]))
    assert rc == 1
    # the four single-level tables still registered; only a.b.t1 failed
    assert "Successfully registered 4 tables" in caplog.text
    assert "Failed to register these tables:\n[a.b.t1]" in caplog.text
    for ns, tbl in TABLES:
        assert pair["tgt"].table_exists(TableIdentifier.of(ns, tbl))
    failed_file = os.path.join(pair["out"], FAILED_IDENTIFIERS_FILE)
    assert open(failed_file).read().splitlines() == ["a.b.t1"]
