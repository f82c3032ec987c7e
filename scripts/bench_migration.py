"""Migration throughput at the reference's documented operating scale.

The reference migrates ~1,000 tables per run with a single-threaded
loop of ≈3 catalog RPCs per table (`BaseRegisterCommand.java:158-169`,
`README.md:215`). This benchmark builds a 1,000-table source catalog
across nested namespaces, registers everything into a fresh target, and
reports tables/sec sequential vs parallel (the engine's improvement).

Usage: python scripts/bench_migration.py [n_tables]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_catalog_migrator_spark.catalog import (  # noqa: E402
    CatalogMigrator,
    SqlCatalog,
    TableIdentifier,
)
from iceberg_catalog_migrator_spark.catalog.base import write_table_metadata  # noqa: E402

N_TABLES = int(sys.argv[1]) if len(sys.argv) > 1 else 1000


def build_source(root: str, n: int) -> SqlCatalog:
    src = SqlCatalog("source", os.path.join(root, "src.db"))
    namespaces = [("foo",), ("bar",), ("a", "b", "c")]
    for ns in namespaces:
        for i in range(1, len(ns) + 1):
            if not src.namespace_exists(ns[:i]):
                src.create_namespace(ns[:i])
    for i in range(n):
        ns = namespaces[i % len(namespaces)]
        tid = TableIdentifier.of(*ns, f"tbl{i}")
        meta = write_table_metadata(
            os.path.join(root, "wh", *ns, f"tbl{i}"), "struct<id:bigint>", version=1
        )
        src.register_table(tid, meta)
    return src


def run_once(root: str, parallelism: int) -> float:
    src = SqlCatalog("source", os.path.join(root, "src.db"))
    tgt = SqlCatalog("target", os.path.join(root, f"tgt_p{parallelism}.db"))
    m = CatalogMigrator(src, tgt)
    ids = m.get_matching_table_identifiers(None)
    assert len(ids) == N_TABLES, f"expected {N_TABLES}, discovered {len(ids)}"
    t0 = time.time()
    m.register_tables(ids, parallelism=parallelism)
    dt = time.time() - t0
    result = m.result()
    assert len(result.registered_table_identifiers) == N_TABLES
    src.close()
    tgt.close()
    return dt


def main() -> None:
    root = tempfile.mkdtemp(prefix="migration-bench-")
    try:
        t0 = time.time()
        build_source(root, N_TABLES).close()
        setup_s = time.time() - t0
        seq_s = run_once(root, parallelism=1)
        par_s = run_once(root, parallelism=8)
        print(
            json.dumps(
                {
                    "metric": f"migrate {N_TABLES} tables (register, JDBC->JDBC pointer catalogs)",
                    "value": round(seq_s, 3),
                    "unit": "sec",
                    "tables_per_sec_sequential": round(N_TABLES / seq_s, 1),
                    "tables_per_sec_parallel8": round(N_TABLES / par_s, 1),
                    "setup_sec": round(setup_s, 3),
                    "n_tables": N_TABLES,
                    "note": "local sqlite serializes writes, so parallelism shows no gain here; the parallel path targets network catalogs where per-table RPC latency dominates (reference: ~3 sequential RPCs/table)",
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
