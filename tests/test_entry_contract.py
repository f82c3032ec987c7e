"""Driver-contract invariants for __spark_entry__ and the registry."""

import __spark_entry__ as entry

from iceberg_catalog_migrator_spark.queries import all_queries
from iceberg_catalog_migrator_spark.queries.registry import _EXTERNALLY_VERIFIED_R1


def test_every_query_has_an_oracle():
    # the correctness gate is only as strong as its coverage: every
    # registered query must carry a DuckDB oracle (none are rows-only)
    missing = [n for n, qd in all_queries().items() if not qd.oracle]
    assert missing == []


def test_entry_maps_mirror_registry():
    q = entry.queries()
    o = entry.oracle_sql()
    reg = all_queries()
    assert set(q) == set(reg)
    assert set(o) == {n for n, qd in reg.items() if qd.oracle}
    assert list(q) == list(reg)  # driver sees the same order


def test_unverified_queries_register_first():
    names = list(all_queries())
    unverified = [n for n in names if n not in _EXTERNALLY_VERIFIED_R1]
    # every not-yet-externally-verified query must sit in the first 50
    # registrations (the window an external prefix-sampling gate checks)
    window = set(names[:50])
    assert [n for n in unverified if n not in window] == []


def test_verified_list_names_exist():
    # the rotation list must not drift from the registry (a rename would
    # silently demote a query's window priority)
    names = set(all_queries())
    assert _EXTERNALLY_VERIFIED_R1 - names == set()
