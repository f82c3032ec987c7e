"""PySpark-native engine with the capabilities of
projectnessie/iceberg-catalog-migrator, plus a stock-Catalyst analytics
surface and partition-scalable LLM-data-pipeline operators.

Structure:

- ``catalog``   — metadata-pointer catalogs (filesystem / sqlite) and the
                  ``CatalogMigrator`` bulk register/migrate API
                  (parity with ``api/.../CatalogMigrator.java``).
- ``cli``       — ``register`` / ``migrate`` subcommands with the reference
                  CLI contract (prompts, dry-run, reports, exit codes).
- ``queries``   — the SURVEY §2b analytics surface: TPC-H-style relational
                  queries expressed DataFrame-first, each with a DuckDB
                  oracle.
- ``operators`` — LLM-data-pipeline operators: dedup (exact/MinHash-LSH/
                  SimHash/n-gram Jaccard), similarity search, text analysis,
                  multimodal column plumbing.
- ``sources``   — parquet/text/table loaders for the testdata star schema.
- ``functions`` — reusable column expressions (portable hashing, cosine,
                  deterministic decimal aggregation helpers).
- ``streaming`` — Structured Streaming slice over the ``events`` table.
- ``plans``     — plan-inspection helpers (explain capture, shuffle audit).
"""

__version__ = "0.1.0"
