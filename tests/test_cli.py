"""CLI contract tests — exit codes, output files, console phrasing
(reference ``cli/src/test/.../AbstractCLIMigrationTest.java:127-467``,
``CLIOptionsTest.java``)."""

import logging

import pytest

from iceberg_catalog_migrator_spark.catalog import SqlCatalog, TableIdentifier
from iceberg_catalog_migrator_spark.catalog.base import write_table_metadata
from iceberg_catalog_migrator_spark.cli.main import run

ID_SCHEMA = "struct<id:bigint>"


@pytest.fixture()
def source_db(tmp_path):
    src = SqlCatalog("source", str(tmp_path / "src.db"))
    for ns, tbl in [("foo", "tbl1"), ("foo", "tbl2"), ("bar", "tbl3"), ("bar", "tbl4")]:
        if not src.namespace_exists((ns,)):
            src.create_namespace((ns,))
        meta = write_table_metadata(str(tmp_path / "wh" / ns / tbl), ID_SCHEMA, version=1)
        src.register_table(TableIdentifier.of(ns, tbl), meta)
    src.close()
    return str(tmp_path / "src.db")


def args(cmd, source_db, tmp_path, *extra):
    return [
        cmd,
        "--source-catalog-type", "JDBC",
        "--source-catalog-properties", f"uri={source_db}",
        "--target-catalog-type", "JDBC",
        "--target-catalog-properties", f"uri={tmp_path / 'tgt.db'}",
        "--output-dir", str(tmp_path / "out"),
        "--disable-safety-prompts",
        *extra,
    ]


def test_register_all_exit_0(source_db, tmp_path, caplog):
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(args("register", source_db, tmp_path))
    assert rc == 0
    text = caplog.text
    assert "Successfully registered 4 tables from JDBC catalog to JDBC catalog." in text
    assert "Identified 4 tables for registration." in text
    # register leaves source entries in place
    src = SqlCatalog("source", source_db)
    assert src.table_exists(TableIdentifier.of("foo", "tbl1"))


def test_migrate_all_removes_source_entries(source_db, tmp_path, caplog):
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(args("migrate", source_db, tmp_path))
    assert rc == 0
    assert "Successfully migrated 4 tables from JDBC catalog to JDBC catalog." in caplog.text
    src = SqlCatalog("source", source_db)
    assert not src.table_exists(TableIdentifier.of("foo", "tbl1"))
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    assert tgt.table_exists(TableIdentifier.of("foo", "tbl1"))


def test_dry_run_writes_file_exit_0(source_db, tmp_path, caplog):
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(args("register", source_db, tmp_path, "--dry-run"))
    assert rc == 0
    assert "Dry run is completed." in caplog.text
    dry = (tmp_path / "out" / "dry_run_identifiers.txt").read_text().splitlines()
    assert sorted(dry) == ["bar.tbl3", "bar.tbl4", "foo.tbl1", "foo.tbl2"]
    # dry-run registers nothing
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    assert tgt.list_namespaces() == []


def test_selective_identifiers(source_db, tmp_path):
    rc = run(args("register", source_db, tmp_path, "--identifiers", "foo.tbl1,bar.tbl3"))
    assert rc == 0
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    assert tgt.table_exists(TableIdentifier.of("foo", "tbl1"))
    assert not tgt.table_exists(TableIdentifier.of("foo", "tbl2"))


def test_regex_full_match(source_db, tmp_path):
    rc = run(args("register", source_db, tmp_path, "--identifiers-regex", r"bar\..*"))
    assert rc == 0
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    assert tgt.table_exists(TableIdentifier.of("bar", "tbl3"))
    assert not tgt.table_exists(TableIdentifier.of("foo", "tbl1"))


def test_identifiers_from_file(source_db, tmp_path):
    f = tmp_path / "ids.txt"
    f.write_text("foo.tbl2\n\n foo.tbl2 \nbar.tbl4\n")
    rc = run(args("register", source_db, tmp_path, "--identifiers-from-file", str(f)))
    assert rc == 0
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    assert tgt.table_exists(TableIdentifier.of("foo", "tbl2"))
    assert tgt.table_exists(TableIdentifier.of("bar", "tbl4"))
    assert not tgt.table_exists(TableIdentifier.of("foo", "tbl1"))


def test_missing_identifier_file_exit_1(source_db, tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run(args("register", source_db, tmp_path, "--identifiers-from-file", "/nope.txt"))
    assert rc == 1
    # prefixed by the execution handler (CLIOptionsTest.invalidArgs)
    assert (
        "Error during CLI execution: File specified in `--identifiers-from-file` "
        "option does not exist" in caplog.text
    )


def test_bad_regex_exit_1(source_db, tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run(args("register", source_db, tmp_path, "--identifiers-regex", "[unclosed"))
    assert rc == 1
    assert "Error during CLI execution: --identifiers-regex pattern is not compilable" in caplog.text


def test_empty_regex_exit_1(source_db, tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run(args("register", source_db, tmp_path, "--identifiers-regex", "  "))
    assert rc == 1
    assert "--identifiers-regex should not be empty" in caplog.text


def test_hadoop_without_warehouse_pinned_message(tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run([
            "register",
            "--source-catalog-type", "HADOOP",
            "--target-catalog-type", "JDBC",
            "--target-catalog-properties", f"uri={tmp_path / 'tgt.db'}",
            "--output-dir", str(tmp_path / "out"),
            "--disable-safety-prompts",
        ])
    assert rc == 1
    assert (
        "Error during CLI execution: Cannot initialize HadoopCatalog because "
        "warehousePath must not be null or empty" in caplog.text
    )


def test_mutually_exclusive_identifier_options_exit_2(source_db, tmp_path):
    rc = run(
        args(
            "register", source_db, tmp_path,
            "--identifiers", "a.b",
            "--identifiers-regex", ".*",
        )
    )
    assert rc == 2


def test_missing_required_args_exit_2():
    assert run(["register"]) == 2


def test_empty_source_exit_1(tmp_path, caplog):
    empty = SqlCatalog("source", str(tmp_path / "empty.db"))
    empty.close()
    with caplog.at_level(logging.WARNING, logger="console-log"):
        rc = run(args("register", str(tmp_path / "empty.db"), tmp_path))
    assert rc == 1
    assert "No tables were identified for registration." in caplog.text


def test_migrate_hadoop_source_exit_1(tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run(
            [
                "migrate",
                "--source-catalog-type", "HADOOP",
                "--source-catalog-properties", f"warehouse={tmp_path / 'wh'}",
                "--target-catalog-type", "JDBC",
                "--target-catalog-properties", f"uri={tmp_path / 'tgt.db'}",
                "--disable-safety-prompts",
            ]
        )
    assert rc == 1
    assert "Please use 'register' command instead." in caplog.text


def test_partial_failure_writes_failed_file_exit_1(source_db, tmp_path, caplog):
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(
            args("register", source_db, tmp_path, "--identifiers", "foo.tbl1,foo.ghost")
        )
    assert rc == 1
    failed = (tmp_path / "out" / "failed_identifiers.txt").read_text().splitlines()
    assert failed == ["foo.ghost"]
    assert "Failed to register 1 tables from JDBC catalog to JDBC catalog." in caplog.text
    assert "Successfully registered 1 tables from JDBC catalog to JDBC catalog." in caplog.text


def test_prompt_abort_exit_1(source_db, tmp_path, caplog):
    argv = [a for a in args("register", source_db, tmp_path) if a != "--disable-safety-prompts"]
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(argv, input_fn=lambda: "no")
    assert rc == 1
    assert "Aborting..." in caplog.text


def test_prompt_yes_proceeds(source_db, tmp_path, caplog):
    argv = [a for a in args("register", source_db, tmp_path) if a != "--disable-safety-prompts"]
    answers = iter(["bogus", "yes"])
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(argv, input_fn=lambda: next(answers))
    assert rc == 0
    assert "Invalid input. Please enter 'yes' or 'no'." in caplog.text
    assert "Continuing..." in caplog.text


def test_register_with_parallelism_flag(source_db, tmp_path, caplog):
    """--parallelism fans the per-table work out but preserves the
    sequential contract: same registrations, summary text, exit 0."""
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(args("register", source_db, tmp_path, "--parallelism", "4"))
    assert rc == 0
    assert "Successfully registered 4 tables from JDBC catalog to JDBC catalog." in caplog.text
    tgt = SqlCatalog("target", str(tmp_path / "tgt.db"))
    for ns, tbl in [("foo", "tbl1"), ("foo", "tbl2"), ("bar", "tbl3"), ("bar", "tbl4")]:
        assert tgt.table_exists(TableIdentifier.of(ns, tbl))


def test_stacktrace_toggle(source_db, tmp_path, caplog):
    """Without --stacktrace: message-only ': <msg>' suffix; with it: the
    exception's traceback in the log (reference
    AbstractTestCatalogMigrator.java:291-327)."""
    with caplog.at_level(logging.INFO):
        rc = run(args("register", source_db, tmp_path, "--identifiers", "foo.ghost"))
    assert rc == 1
    assert "Unable to register the table foo.ghost :" in caplog.text
    assert "Traceback" not in caplog.text

    caplog.clear()
    with caplog.at_level(logging.INFO):
        rc = run(
            args(
                "register", source_db, tmp_path,
                "--identifiers", "foo.ghost", "--stacktrace",
            )
        )
    assert rc == 1
    assert any(r.exc_info for r in caplog.records if "foo.ghost" in r.getMessage())


def test_output_dir_not_creatable_exit_1(source_db, tmp_path, caplog):
    blocker = tmp_path / "blocker"
    blocker.write_text("a file where a directory is needed")
    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run(
            args("register", source_db, tmp_path, "--output-dir", str(blocker / "out"))
        )
    assert rc == 1
    assert (
        "Error during CLI execution: Failed to create the output directory "
        "from the path specified in `--output-dir`" in caplog.text
    )


def test_output_dir_created_if_missing(source_db, tmp_path):
    out = tmp_path / "deep" / "nested" / "out"
    rc = run(args("register", source_db, tmp_path, "--dry-run", "--output-dir", str(out)))
    assert rc == 0
    assert (out / "dry_run_identifiers.txt").exists()


# ---------------------------------------------------------------- version
# reference: CLIVersionProvider.java:35, pinned by CLIOptionsTest.java:245
def test_version_exit_0(capsys):
    from iceberg_catalog_migrator_spark import __version__

    rc = run(["--version"])
    assert rc == 0
    assert capsys.readouterr().out.startswith(__version__)


def test_help_exit_0(capsys):
    rc = run(["--help"])
    assert rc == 0
    assert "register" in capsys.readouterr().out


# ------------------------------------------- execution exception handler
# reference: CatalogMigrationCLI.java:36-46 executionExceptionHandler
def test_unknown_catalog_type_handled_exit_1(source_db, tmp_path, caplog):
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run([
            "register",
            "--source-catalog-type", "BOGUS",
            "--target-catalog-type", "JDBC",
            "--target-catalog-properties", f"uri={tmp_path / 'tgt.db'}",
            "--output-dir", str(tmp_path / "out"),
            "--disable-safety-prompts",
        ])
    assert rc == 1
    assert "Error during CLI execution:" in caplog.text
    assert "catalog_migration.log" in caplog.text


def test_missing_catalog_property_handled_exit_1(source_db, tmp_path, caplog):
    # JDBC catalog requires a uri property; its absence must not escape
    # as a raw KeyError traceback
    with caplog.at_level(logging.ERROR, logger="console-log"):
        rc = run([
            "register",
            "--source-catalog-type", "JDBC",
            "--target-catalog-type", "JDBC",
            "--output-dir", str(tmp_path / "out"),
            "--disable-safety-prompts",
        ])
    assert rc == 1
    assert "Error during CLI execution:" in caplog.text


def test_execution_error_with_stacktrace_prints_traceback(source_db, tmp_path, capsys):
    rc = run([
        "register",
        "--source-catalog-type", "BOGUS",
        "--target-catalog-type", "JDBC",
        "--target-catalog-properties", f"uri={tmp_path / 'tgt.db'}",
        "--output-dir", str(tmp_path / "out"),
        "--disable-safety-prompts",
        "--stacktrace",
    ])
    assert rc == 1
    assert "Traceback" in capsys.readouterr().err


def test_comma_separated_properties_and_nessie_branch_promotion(tmp_path, caplog):
    """The reference passes catalog properties as ONE comma-separated
    argument (picocli split=",", README.md:72 `uri=...,ref=main,...`);
    pin that parsing, driving a dev→main Nessie branch promotion."""
    from iceberg_catalog_migrator_spark.catalog.service import NessieCatalog

    uri = str(tmp_path / "nessie.db")
    main = NessieCatalog("nessie", {"uri": uri})
    main.create_namespace(("foo",))
    main.create_branch("dev")
    dev = main.with_ref("dev")
    meta = write_table_metadata(str(tmp_path / "wh" / "foo" / "t1"), ID_SCHEMA, version=1)
    dev.register_table(TableIdentifier.of("foo", "t1"), meta)
    dev.close()
    main.close()

    with caplog.at_level(logging.INFO, logger="console-log"):
        rc = run([
            "register",
            "--source-catalog-type", "NESSIE",
            "--source-catalog-properties", f"uri={uri},ref=dev",
            "--target-catalog-type", "NESSIE",
            "--target-catalog-properties", f"uri={uri},ref=main",
            "--output-dir", str(tmp_path / "out"),
            "--disable-safety-prompts",
        ])
    assert rc == 0
    assert "Successfully registered 1 tables from NESSIE catalog to NESSIE catalog." in caplog.text
    promoted = NessieCatalog("nessie", {"uri": uri})
    assert promoted.table_exists(TableIdentifier.of("foo", "t1"))
    promoted.close()
