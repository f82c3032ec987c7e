"""Property-based MERGE semantics: hypothesis-generated clause lists
(random kinds, conditions, assignments, order) replayed against a pure
Python reference executor of the ANSI MERGE contract — first clause
wins, unmatched-target rows kept, unmatched-source rows take the first
insert clause or drop, MOR-hidden rows count as NOT MATCHED.

Same style as the QOI and identifier property tests; the per-example
Spark round trip caps max_examples."""

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_catalog_migrator_spark.sources.snapshots import (
    MergeClause,
    SnapshotTable,
    merge_into,
)

# conditions over the joined row: target columns bare, source as src_*.
# Insert-clause conditions may reference SOURCE columns only (SQL null
# semantics would make a target reference vacuously false anyway).
_CONDS = {
    None: lambda v, sv: True,
    "v % 2 = 0": lambda v, sv: v % 2 == 0,
    "src_v > 50": lambda v, sv: sv > 50,
    "v < src_v": lambda v, sv: v < sv,
}
_INS_CONDS = {
    None: lambda sv: True,
    "src_v % 2 = 1": lambda sv: sv % 2 == 1,
    "src_v > 50": lambda sv: sv > 50,
}
_ASSIGNS = {
    "*": lambda k, v, sv: (k, sv),
    "bump": lambda k, v, sv: (k, sv + 100),
    "keep_v": lambda k, v, sv: (k, v + 1),
}
_ASSIGN_SQL = {
    "*": "*",
    "bump": {"v": "src_v + 100"},
    "keep_v": {"v": "v + 1"},
}

matched_clauses = st.lists(
    st.one_of(
        st.tuples(
            st.just("update"),
            st.sampled_from(sorted(_CONDS, key=str)),
            st.sampled_from(sorted(_ASSIGNS)),
        ),
        st.tuples(
            st.just("delete"), st.sampled_from(sorted(_CONDS, key=str)), st.none()
        ),
    ),
    max_size=3,
)
insert_clauses = st.lists(
    st.tuples(st.just("insert"), st.sampled_from(sorted(_INS_CONDS, key=str))),
    max_size=2,
)
target_rows = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 100)), min_size=1, max_size=12
)
source_rows = st.dictionaries(st.integers(0, 12), st.integers(0, 100), max_size=8)


def _reference_merge(target, source, matched, inserts):
    """Pure-Python ANSI MERGE: the expected (k, v) multiset."""
    out = []
    for k, v in target:
        sv = source.get(k)
        if sv is None:
            out.append((k, v))
            continue
        for kind, cond, assign in matched:
            if _CONDS[cond](v, sv):
                if kind == "update":
                    out.append(_ASSIGNS[assign](k, v, sv))
                break  # delete: row dropped; either way first clause won
        else:
            out.append((k, v))
    tkeys = {k for k, _ in target}
    for k, sv in sorted(source.items()):
        if k in tkeys:
            continue
        for _, cond in inserts:
            if _INS_CONDS[cond](sv):
                out.append((k, sv))
                break
    return Counter(out)


@pytest.mark.slow
@settings(max_examples=12, deadline=None)
@given(target_rows, source_rows, matched_clauses, insert_clauses)
def test_merge_into_matches_reference_executor(
    spark, tmp_path_factory, target, source, matched, inserts
):
    table = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("merge_prop") / "tbl")
    )
    table.append(spark.createDataFrame(target, "k long, v long"))
    src_df = spark.createDataFrame(
        sorted(source.items()) or [(None, None)], "k long, v long"
    ).filter(F.col("k").isNotNull())
    clauses = [
        MergeClause(kind, cond, _ASSIGN_SQL[assign] if assign else None)
        for kind, cond, assign in matched
    ] + [MergeClause("insert", cond) for _, cond in inserts]
    merge_into(table, src_df, ["k"], clauses)
    got = Counter((r["k"], r["v"]) for r in table.read().collect())
    assert got == _reference_merge(target, source, matched, inserts)
