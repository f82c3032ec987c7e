"""``register`` / ``migrate`` CLI with the reference's behavioral contract.

Console phrasing, output files, prompts, and exit codes reproduce the
reference CLI (``cli/.../BaseRegisterCommand.java``,
``MigrateCommand.java``, ``RegisterCommand.java``) — the wording is
test-pinned there (``AbstractCLIMigrationTest.java:127-467``), so it is
matched verbatim. Exit-code policy (``BaseRegisterCommand.java:137-182``):
0 only if ≥1 registered and 0 failures; 1 on any failure / nothing
found / prompt abort; 2 on argument errors.
"""

from __future__ import annotations

import argparse
import logging
import os
import re
import sys

from .. import __version__
from ..catalog.base import Catalog
from ..catalog.factory import CatalogType, build_catalog
from ..catalog.identifiers import TableIdentifier, identifiers_from_csv, identifiers_from_file
from ..catalog.migrator import CatalogMigrationResult, CatalogMigrator

FAILED_IDENTIFIERS_FILE = "failed_identifiers.txt"
FAILED_TO_DELETE_AT_SOURCE_FILE = "failed_to_delete_at_source.txt"
DRY_RUN_FILE = "dry_run_identifiers.txt"
BATCH_SIZE = 100

console = logging.getLogger("console-log")
LOG = logging.getLogger("catalog_migration")


def _parse_properties(pairs: list[str]) -> dict[str, str]:
    """k=v pairs, space- or comma-separated: the reference declares the
    option with picocli ``split=","`` and its README passes
    ``uri=http://...,ref=main,warehouse=/tmp/wh`` as ONE argument
    (`/root/reference/README.md:72`), so a comma inside an argument
    separates properties, exactly as there."""
    props: dict[str, str] = {}
    for arg in pairs or []:
        for pair in arg.split(","):
            if not pair.strip():
                continue
            key, _, value = pair.partition("=")
            props[key.strip()] = value.strip()
    return props


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="iceberg-catalog-migrator",
        description=(
            "Bulk register/migrate Apache Iceberg tables between catalogs "
            "without copying data."
        ),
    )
    # top-level --version mirrors the reference's CLIVersionProvider
    # (cli/.../CLIVersionProvider.java:35, pinned by CLIOptionsTest.java:245:
    # exit 0, stdout starts with the project version)
    parser.add_argument("--version", action="version", version=__version__)
    sub = parser.add_subparsers(dest="command", required=True)
    for cmd in ("register", "migrate"):
        p = sub.add_parser(cmd)
        p.add_argument("--source-catalog-type", required=True)
        p.add_argument("--source-catalog-properties", nargs="*", default=[])
        p.add_argument("--target-catalog-type", required=True)
        p.add_argument("--target-catalog-properties", nargs="*", default=[])
        group = p.add_mutually_exclusive_group()
        group.add_argument("--identifiers")
        group.add_argument("--identifiers-from-file")
        group.add_argument("--identifiers-regex")
        p.add_argument("--output-dir", default="")
        p.add_argument("--dry-run", action="store_true")
        p.add_argument("--disable-safety-prompts", action="store_true")
        p.add_argument("--stacktrace", action="store_true")
        # engine improvement over the reference's sequential loop
        # (BaseRegisterCommand.java:158): fan per-table register RPCs
        # across N workers; per-table independence is implied by the
        # reference's retry-from-file design (README.md:286,298)
        p.add_argument("--parallelism", type=int, default=1)
    return parser


def _operation(cmd: str) -> str:
    return "migration" if cmd == "migrate" else "registration"


def _operated(cmd: str) -> str:
    return "migrated" if cmd == "migrate" else "registered"


def _operate(cmd: str) -> str:
    return "migrate" if cmd == "migrate" else "register"


def _proceed(input_fn=input) -> bool:
    while True:
        console.info(
            "Are you certain that you wish to proceed, after reading the above warnings? (yes/no):"
        )
        answer = input_fn()
        if answer.lower() == "yes":
            console.info("Continuing...")
            return True
        if answer.lower() == "no":
            console.info("Aborting...")
            return False
        console.info("Invalid input. Please enter 'yes' or 'no'.")


def _warn(cmd: str) -> None:
    common = (
        "\n\ta) Executing catalog migration when the source catalog has some in-progress commits "
        "\n\tcan lead to a data loss as the in-progress commits will not be considered for migration. "
        "\n\tSo, while using this tool please make sure there are no in-progress commits for the source "
        "catalog.\n"
    )
    if cmd == "migrate":
        console.warning(
            common
            + "\n\tb) After the migration, successfully migrated tables will be deleted from the source catalog "
            "\n\tand can only be accessed from the target catalog."
        )
    else:
        console.warning(
            common
            + "\n\tb) After the registration, successfully registered tables will be present in both source and "
            "target catalog. "
            "\n\tHaving the same metadata.json registered in more than one catalog can lead to missing updates, "
            "loss of data, and table corruption. "
            "\n\tUse `migrate` command to automatically delete the table from source catalog after migration."
        )


def _write_identifiers(path: str, identifiers: list[TableIdentifier]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for identifier in identifiers:
            f.write(f"{identifier}\n")


def _print_summary(
    cmd: str, result: CatalogMigrationResult, source_type: str, target_type: str
) -> None:
    console.info("Summary: ")
    if result.registered_table_identifiers:
        console.info(
            "Successfully %s %d tables from %s catalog to %s catalog.",
            _operated(cmd),
            len(result.registered_table_identifiers),
            source_type,
            target_type,
        )
    if result.failed_to_register_table_identifiers:
        console.error(
            "Failed to %s %d tables from %s catalog to %s catalog. "
            "Please check the `catalog_migration.log` file for the failure reason. "
            "Failed identifiers are written into `%s`. "
            "Retry with that file using `--identifiers-from-file` option "
            "if the failure is because of network/connection timeouts.",
            _operate(cmd),
            len(result.failed_to_register_table_identifiers),
            source_type,
            target_type,
            FAILED_IDENTIFIERS_FILE,
        )
    if result.failed_to_delete_table_identifiers:
        console.error(
            "Failed to delete %d tables from %s catalog. "
            "Please check the `catalog_migration.log` file for the failure reason. "
            "\nFailed to delete identifiers are written into `%s`.",
            len(result.failed_to_delete_table_identifiers),
            source_type,
            FAILED_TO_DELETE_AT_SOURCE_FILE,
        )


def _fmt_ids(identifiers: list[TableIdentifier]) -> str:
    return "[" + ", ".join(str(i) for i in identifiers) + "]"


def _print_details(cmd: str, result: CatalogMigrationResult) -> None:
    console.info("Details: ")
    if result.registered_table_identifiers:
        console.info(
            "Successfully %s these tables:\n%s",
            _operated(cmd),
            _fmt_ids(result.registered_table_identifiers),
        )
    if result.failed_to_register_table_identifiers:
        console.error(
            "Failed to %s these tables:\n%s",
            _operate(cmd),
            _fmt_ids(result.failed_to_register_table_identifiers),
        )
    if result.failed_to_delete_table_identifiers:
        console.error(
            "Failed to delete these tables from source catalog:\n%s",
            _fmt_ids(result.failed_to_delete_table_identifiers),
        )


def run(argv: list[str], input_fn=input) -> int:
    """Parse + execute, never letting an exception escape as a traceback.

    Mirrors the reference's executionExceptionHandler
    (``CatalogMigrationCLI.java:36-46``): unless ``--stacktrace`` is set,
    any execution failure logs one console line and exits 1. The flag is
    scanned from raw argv exactly like ``enableStacktrace`` there, so it
    works even when the failure happens during argument handling.
    """
    try:
        return _run(argv, input_fn)
    except SystemExit:
        raise
    except Exception as ex:
        # full traceback goes to the log file (DEBUG handler); the console
        # only ever sees the one-line message unless --stacktrace is set
        LOG.debug("Error during CLI execution", exc_info=True)
        if any(a.lower() == "--stacktrace" for a in argv):
            import traceback

            traceback.print_exc(file=sys.stderr)
        else:
            console.error(
                "Error during CLI execution: %s. Please check `catalog_migration.log` "
                "file for more info.",
                ex,
            )
        return 1


def _run(argv: list[str], input_fn=input) -> int:
    parser = build_parser()
    try:
        args = parser.parse_args(argv)
    except SystemExit as ex:
        # argparse exits 0 for --version/--help and 2 for argument errors;
        # preserve that split (picocli does the same)
        return ex.code if isinstance(ex.code, int) else 2

    cmd = args.command

    # identifier selection (mutual exclusion is enforced by argparse)
    # Validation failures below RAISE so they surface through the
    # execution-exception handler with the reference's pinned prefix
    # (IdentifierOptions.java:75-97, BaseRegisterCommand.java:216-227
    # throw; CLIOptionsTest.invalidArgs pins the prefixed text, exit 1).
    identifiers: list[TableIdentifier] = []
    identifier_regex = args.identifiers_regex
    if args.identifiers:
        identifiers = identifiers_from_csv(args.identifiers)
    elif args.identifiers_from_file:
        if not os.path.isfile(args.identifiers_from_file):
            raise ValueError(
                "File specified in `--identifiers-from-file` option does not exist"
            )
        console.info("Collecting identifiers from the file %s ...", args.identifiers_from_file)
        identifiers = identifiers_from_file(args.identifiers_from_file)
    elif identifier_regex:
        if not identifier_regex.strip():
            raise ValueError("--identifiers-regex should not be empty")
        try:
            re.compile(identifier_regex)
        except re.error as ex:
            raise ValueError("--identifiers-regex pattern is not compilable") from ex

    if not identifiers:
        if identifier_regex:
            LOG.warning(
                "User has not specified the table identifiers. Will be selecting all the tables "
                "from all the namespaces from the source catalog which matches the regex "
                "pattern:%s",
                identifier_regex,
            )
        else:
            LOG.warning(
                "User has not specified the table identifiers. Will be selecting all the tables "
                "from all the namespaces from the source catalog."
            )

    # output dir (O18)
    output_dir = args.output_dir or os.getcwd()
    try:
        os.makedirs(output_dir, exist_ok=True)
    except OSError as ex:
        raise ValueError(
            "Failed to create the output directory from the path specified in `--output-dir`"
        ) from ex
    if not os.access(output_dir, os.W_OK):
        raise ValueError("Path specified in `--output-dir` is not writable")

    source_catalog: Catalog | None = None
    target_catalog: Catalog | None = None
    try:
        source_type = CatalogType(args.source_catalog_type.upper())
        if cmd == "migrate" and source_type is CatalogType.HADOOP:
            console.error(
                "Source catalog is a Hadoop catalog and it doesn't support deleting the table "
                "entries just from the catalog. Please use 'register' command instead."
            )
            return 1

        source_catalog = build_catalog(
            source_type, "source", _parse_properties(args.source_catalog_properties)
        )
        console.info("Configured source catalog: %s", source_catalog.name)
        target_catalog = build_catalog(
            args.target_catalog_type, "target", _parse_properties(args.target_catalog_properties)
        )
        console.info("Configured target catalog: %s", target_catalog.name)

        if not args.dry_run and not args.disable_safety_prompts:
            _warn(cmd)
            if not _proceed(input_fn):
                return 1

        migrator = CatalogMigrator(
            source_catalog=source_catalog,
            target_catalog=target_catalog,
            delete_entries_from_source_catalog=(cmd == "migrate"),
            enable_stacktrace=args.stacktrace,
        )

        if not identifiers:
            console.info("Identifying tables for %s ...", _operation(cmd))
            identifiers = migrator.get_matching_table_identifiers(identifier_regex)
            if not identifiers:
                console.warning(
                    "No tables were identified for %s. Please check `catalog_migration.log` "
                    "file for more info.",
                    _operation(cmd),
                )
                return 1

        if args.dry_run:
            console.info("Dry run is completed.")
            _write_identifiers(os.path.join(output_dir, DRY_RUN_FILE), identifiers)
            console.info("Summary: ")
            console.info(
                "Identified %d tables for %s by dry-run. These identifiers are also written into "
                "%s. This file can be used with `--identifiers-from-file` option for an actual run.",
                len(identifiers),
                _operation(cmd),
                DRY_RUN_FILE,
            )
            console.info(
                "Details: \nIdentified these tables for %s by dry-run:\n%s",
                _operation(cmd),
                _fmt_ids(identifiers),
            )
            return 0

        console.info("Identified %d tables for %s.", len(identifiers), _operation(cmd))
        console.info("Started %s ...", _operation(cmd))

        def progress(done: int, total: int) -> None:
            console.info(
                "Attempted %s for %d tables out of %d tables.", _operation(cmd), done, total
            )

        try:
            migrator.register_tables(
                identifiers,
                progress=progress,
                progress_batch_size=BATCH_SIZE,
                parallelism=max(1, args.parallelism),
            )
        finally:
            console.info("Finished %s ...", _operation(cmd))
            result = migrator.result()
            if result.failed_to_register_table_identifiers:
                _write_identifiers(
                    os.path.join(output_dir, FAILED_IDENTIFIERS_FILE),
                    result.failed_to_register_table_identifiers,
                )
            if result.failed_to_delete_table_identifiers:
                _write_identifiers(
                    os.path.join(output_dir, FAILED_TO_DELETE_AT_SOURCE_FILE),
                    result.failed_to_delete_table_identifiers,
                )
            _print_summary(cmd, result, args.source_catalog_type.upper(), args.target_catalog_type.upper())
            _print_details(cmd, result)

        if (
            result.failed_to_register_table_identifiers
            or result.failed_to_delete_table_identifiers
            or not result.registered_table_identifiers
        ):
            return 1
        return 0
    finally:
        for cat in (source_catalog, target_catalog):
            if cat is not None:
                cat.close()


def main() -> None:
    # console shows INFO+ one-liners; catalog_migration.log gets DEBUG
    # detail (incl. execution-failure tracebacks), like the reference's
    # console-log vs file-log appender split
    console_handler = logging.StreamHandler()
    console_handler.setLevel(logging.INFO)
    console_handler.setFormatter(logging.Formatter("%(message)s"))
    logging.basicConfig(level=logging.DEBUG, handlers=[console_handler])
    file_handler = logging.FileHandler("catalog_migration.log")
    file_handler.setLevel(logging.DEBUG)
    logging.getLogger("catalog_migration").addHandler(file_handler)
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
