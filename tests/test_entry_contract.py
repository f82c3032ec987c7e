"""Driver-contract invariants for __spark_entry__ and the registry."""

import __spark_entry__ as entry

from iceberg_catalog_migrator_spark.queries import all_queries
from iceberg_catalog_migrator_spark.queries.registry import _driver_verified_rounds


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


def test_stalest_queries_register_first():
    # the external gate samples the first-50 prefix of the registry, so
    # ordering must be non-decreasing in last-driver-verified round:
    # never-verified first, then least-recently-verified
    names = list(all_queries())
    verified = _driver_verified_rounds()
    rounds = [verified.get(n, 0) for n in names]
    assert rounds == sorted(rounds)


def test_unverified_and_stalest_fit_the_window():
    # everything never driver-verified, plus everything whose evidence is
    # older than the latest round, must fit inside the 50-query window —
    # otherwise some query's correctness evidence can go permanently stale
    names = list(all_queries())
    verified = _driver_verified_rounds()
    latest_round = max(verified.values(), default=0)
    stale = [n for n in names if verified.get(n, 0) < latest_round]
    window = set(names[:50])
    assert len(stale) <= 50, "too many stale queries for one driver window"
    assert [n for n in stale if n not in window] == []


def test_verified_artifacts_cover_registry():
    # every registered query must have been driver-verified green in at
    # least one recorded round OR be newer than the newest artifact; a
    # verified name that no longer exists signals an unintended rename
    names = set(all_queries())
    verified = _driver_verified_rounds()
    missing_from_registry = set(verified) - names
    assert missing_from_registry == set()
